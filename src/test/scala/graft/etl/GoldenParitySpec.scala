package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Reference-job config against the reference's own raw CSV; parameter
  * values per /root/reference/config.yaml (semantics, not structure).
  */
object ReferenceJob {
  def config(inputPath: String, outputBase: String): EtlConfig = EtlConfig(
    run = RunConf(
      environment = "PROD",
      startDate = "2024-12-01", endDate = "2025-07-30",
      dateColumn = "fecha_proceso", dateFormat = "yyyyMMdd",
      countryColumn = "pais", countryValue = "TODOS"),
    input = InputConf(
      path = inputPath, format = "csv",
      options = Map("header" -> "true"),
      fields = Seq(
        FieldSpec("pais", "string", nullable = true),
        FieldSpec("fecha_proceso", "string", nullable = true),
        FieldSpec("transporte", "integer", nullable = true),
        FieldSpec("ruta", "integer", nullable = true),
        FieldSpec("tipo_entrega", "string", nullable = true),
        FieldSpec("material", "string", nullable = true),
        FieldSpec("precio", "double", nullable = true),
        FieldSpec("cantidad", "double", nullable = true),
        FieldSpec("unidad", "string", nullable = true)),
      lineageColumn = "filename"),
    quality = QualityConf(
      minRows = 10,
      requiredColumns = Seq("pais", "fecha_proceso", "precio", "material"),
      // pre-rename names checked post-rename — the V3 parity quirk
      notNullColumns = Seq("precio", "material")),
    indicators = Seq(
      IndicatorConf("entrega_rutina", "tipo_entrega", Seq("ZPRE", "ZVE1")),
      IndicatorConf("entrega_bonificada", "tipo_entrega", Seq("Z04", "Z05"))),
    fill = FillConf("NOT INFO", Seq("material"), 0.0, Seq("precio")),
    units = UnitConf(
      unitColumn = "unidad", quantityColumn = "cantidad", priceColumn = "precio",
      fromUnit = "CS", factor = 20.0, standardUnit = "ST",
      outQuantity = "cantidad_estandar", outPrice = "precio_estandar",
      outUnit = "unidad_estandar"),
    renames = Map("precio" -> "precio_origen", "cantidad" -> "cantidad_origen",
      "unidad" -> "unidad_origen"),
    columnOrder = Seq("fecha_proceso", "pais", "material", "transporte", "ruta",
      "tipo_entrega", "entrega_rutina", "entrega_bonificada", "precio_origen",
      "cantidad_origen", "unidad_origen", "precio_estandar", "cantidad_estandar",
      "unidad_estandar", "total_estandar", "filename"),
    output = OutputConf(outputBase, Seq("fecha_proceso", "pais"), "total_estandar"),
    logging = LoggingConf(
      Some("/tmp/graft_etl_out/pipeline_execution.log"), "INFO"))
}

/** Golden-parity gate: the rebuilt pipeline must reproduce the
  * reference's committed PROD parquet byte-for-value (SURVEY.md §5.2).
  */
class GoldenParitySpec extends SparkTestBase {

  private val rawDir = "/root/reference/data/raw"
  private val goldenDir = "/root/reference/data/processed/PROD"

  test("pipeline reproduces the reference's committed PROD output") {
    val out = Files.createTempDirectory("graft_golden").toString
    val conf = ReferenceJob.config(rawDir, out)
    val report = EtlRunner.run(spark, conf)

    assert(report.inputGate.forall(_.passed), report.inputGate.mkString("; "))
    assert(report.outputGate.forall(_.passed), report.outputGate.mkString("; "))
    assert(report.written.nonEmpty, "write was gated off")
    assert(report.rowsOut === 129L)

    val cols = conf.columnOrder
    val mine = spark.read.parquet(report.written.get).select(cols.map(col): _*)
    val golden = spark.read.parquet(goldenDir).select(cols.map(col): _*)

    assert(mine.schema.map(f => (f.name, f.dataType)) ===
      golden.schema.map(f => (f.name, f.dataType)))

    val sortCols = cols.map(col)
    val m = mine.orderBy(sortCols: _*).collect().toSeq
    val g = golden.orderBy(sortCols: _*).collect().toSeq
    assert(m.size === g.size)
    m.zip(g).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"row $i differs")
    }
  }

  test("partition layout and known invariants match the reference") {
    val out = Files.createTempDirectory("graft_golden2").toString
    val report = EtlRunner.run(spark, ReferenceJob.config(rawDir, out))
    val mine = spark.read.parquet(report.written.get)

    // 6 (fecha_proceso, pais) partitions with the documented counts
    val parts = mine.groupBy("fecha_proceso", "pais").count()
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(parts === Set(
      ("2025-01-14", "PE", 2L), ("2025-02-17", "EC", 20L),
      ("2025-03-14", "HN", 26L), ("2025-03-25", "SV", 57L),
      ("2025-05-13", "GT", 12L), ("2025-06-02", "JM", 12L)))

    // 6 null materials filled; filename keeps the URL-encoded basename
    assert(mine.filter(col("material") === "NOT INFO").count() === 6L)
    val names = mine.select("filename").distinct().collect().map(_.getString(0)).toSeq
    assert(names === Seq("global_mobility_data_entrega_productos%20(15-12).csv"))
  }

  test("quality gates block the write on bad input") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_dq").toString
    val fewRows = Files.createTempDirectory("graft_few")
    Files.writeString(fewRows.resolve("few.csv"),
      "pais,fecha_proceso,transporte,ruta,tipo_entrega,material,precio,cantidad,unidad\n" +
      "GT,20250513,1,2,ZPRE,AA,1.0,2.0,CS\n")
    val conf = ReferenceJob.config(fewRows.toString, out)
    val report = EtlRunner.run(spark, conf)
    assert(report.written.isEmpty)
    assert(report.inputGate.exists(r => !r.passed && r.check.startsWith("min_rows")))
  }
}
