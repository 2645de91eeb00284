package graft.etl

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/** End-to-end DQ-gate failure paths through [[EtlMain.runLogged]]: each
  * adversarial input must BLOCK the write and emit the reference's exact
  * error lines (data_process.py:278, 288, 307, 357-359). The gate logic
  * itself is unit-tested elsewhere; this exercises the full blocked-write
  * path — config → read → gates → (no) write → log stream.
  */
class EtlGateFailureSpec extends SparkTestBase {

  private val rawDir = "/root/reference/data/raw"

  /** run and capture (report, log lines without timestamps) */
  private def run(conf: EtlConfig): (EtlRunner.EtlReport, Seq[String]) = {
    val logFile = Files.createTempFile("graft_gate", ".log").toString
    PipeLog.init(LoggingConf(Some(logFile), "INFO"))
    val report =
      try EtlMain.runLogged(spark, conf)
      finally PipeLog.close()
    val lines = Files.readAllLines(Paths.get(logFile)).asScala.toSeq
      .filter(_.nonEmpty).map(_.split(" \\| ", 2)(1))
    (report, lines)
  }

  private def freshOut(): String =
    Files.createTempDirectory("graft_gate_out").toString + "/processed"

  test("low row-count blocks the write with the reference's error lines") {
    val out = freshOut()
    val conf = ReferenceJob.config(rawDir, out)
      .copy(quality = ReferenceJob.config(rawDir, out).quality.copy(minRows = 1000))
    val (report, lines) = run(conf)
    assert(report.written.isEmpty && report.outputGate.isEmpty)
    assert(lines.contains(
      "ERROR | data_quality_input | [DQ INPUT FALLIDA] Conteo bajo: 379 filas. Se esperaban al menos 1000"))
    assert(lines.contains(
      "ERROR | main | ERROR: Se encontró una falla en la Calidad de Datos de entrada"))
    assert(!lines.exists(_.contains("Escribiendo datos en")))
    assert(!Files.exists(Paths.get(out, "PROD")))
  }

  test("missing required column blocks the write with the reference's error lines") {
    val out = freshOut()
    val base = ReferenceJob.config(rawDir, out)
    val conf = base.copy(quality = base.quality.copy(
      requiredColumns = base.quality.requiredColumns :+ "no_existe"))
    val (report, lines) = run(conf)
    assert(report.written.isEmpty && report.outputGate.isEmpty)
    assert(lines.contains(
      "ERROR | data_quality_input | [DQ INPUT FALLIDA] Columnas faltantes: {'no_existe'}"))
    assert(lines.contains(
      "ERROR | main | ERROR: Se encontró una falla en la Calidad de Datos de entrada"))
    assert(!Files.exists(Paths.get(out, "PROD")))
  }

  test("injected nulls in a gated column block the write post-transform") {
    // two surviving rows with a NULL transporte (integer, not covered by
    // the fill step), gated by notNull(transporte)
    val dir = Files.createTempDirectory("graft_gate_csv")
    Files.write(dir.resolve("nulls.csv"), Seq(
      "pais,fecha_proceso,transporte,ruta,tipo_entrega,material,precio,cantidad,unidad",
      "GT,20250513,,919885,ZPRE,AA004003,3195.54,100.0,CS",
      "GT,20250514,,919885,ZVE1,BA018426,529.99,20.0,CS",
      "GT,20250514,1,919885,ZVE1,BA018427,52.99,2.0,ST").asJava)
    val out = freshOut()
    val base = ReferenceJob.config(dir.toString, out)
    val conf = base.copy(quality = base.quality.copy(
      minRows = 1, notNullColumns = Seq("precio", "transporte")))
    val (report, lines) = run(conf)
    assert(report.written.isEmpty)
    assert(report.outputGate.exists(r => !r.passed && r.check == "not_null(transporte)"))
    assert(lines.contains(
      "ERROR | data_quality_output | [DQ OUTPUT FALLIDA]: La columna 'transporte' contiene 2 valores nulos."))
    assert(lines.contains(
      "ERROR | main | ERROR: Se encontró una falla en la Calidad de Datos de salida"))
    assert(!lines.exists(_.contains("Escritura exitosa.")))
    assert(!Files.exists(Paths.get(out, "PROD")))
  }
}
