package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class EtlConfigSpec extends AnyFunSuite {

  private def fixture: String =
    getClass.getResource("/etl-reference.yaml").getPath

  test("YAML config loads into the typed model") {
    val c = EtlConfig.load(fixture)
    assert(c.run.environment === "PROD")
    assert(c.run.startDate === "2024-12-01" && c.run.endDate === "2025-07-30")
    assert(c.input.fields.size === 9)
    assert(c.input.fields.head === FieldSpec("pais", "string", nullable = true))
    assert(c.indicators.map(_.name) === Seq("entrega_rutina", "entrega_bonificada"))
    assert(c.indicators.head.values === Seq("ZPRE", "ZVE1"))
    assert(c.fill.textValue === "NOT INFO" && c.fill.numericValue === 0.0)
    assert(c.units.factor === 20.0)
    assert(c.renames("precio") === "precio_origen")
    assert(c.columnOrder.size === 16)
    assert(c.quality.notNullColumns === Seq("precio", "material"))
    assert(c.logging === LoggingConf(
      Some("/tmp/graft_etl_out/pipeline_execution.log"), "INFO"))
  }

  test("loader matches YAML-loaded config against the in-code reference config") {
    val fromYaml = EtlConfig.load(fixture)
    val inCode = ReferenceJob.config("/root/reference/data/raw", "/tmp/graft_etl_out")
    assert(fromYaml === inCode)
  }

  test("a present-but-empty YAML key fails with the key name, not an NPE") {
    import scala.jdk.CollectionConverters._
    val base = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    // blank out the renames mapping: "renames:" with no value loads as null
    val patched = base.replaceAll("(?s)renames:.*?column_order", "renames:\ncolumn_order")
    val m = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](patched).asScala.toMap
    val e = intercept[IllegalArgumentException](EtlConfig.fromMap(m))
    assert(e.getMessage.contains("renames"))
  }

  test("indicator condition values are deduplicated at load") {
    val c = EtlConfig.fromMap(rawMapWithDupValues)
    assert(c.indicators.head.values === Seq("A", "B"))
  }

  private def rawMapWithDupValues: Map[String, Object] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val base = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    val patched = base.replace("values: [ZPRE, ZVE1]", "values: [A, B, A]")
    import scala.jdk.CollectionConverters._
    yaml.load[java.util.Map[String, Object]](patched).asScala.toMap
  }
}
