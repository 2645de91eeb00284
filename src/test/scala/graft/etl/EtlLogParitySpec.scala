package graft.etl

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/** Log-stream parity with the reference's committed run log
  * (/root/reference/logs/pipeline_execution.log, format
  * `%(asctime)s | %(levelname)s | %(funcName)s | %(message)s`,
  * data_process.py:23).
  *
  * Two gates: every committed line matches the 4-field shape our
  * [[PipeLog]] emits, and a replay of the PROD run over the reference's
  * own raw CSVs produces a (level, funcName, message) stream
  * byte-identical to the committed PROD block — python-runtime noise
  * (`_init_num_threads`, py4j `close`) excluded, filesystem paths
  * normalized since the test writes to a temp dir.
  */
class EtlLogParitySpec extends SparkTestBase {

  private val refLog = "/root/reference/logs/pipeline_execution.log"
  private val lineShape =
    """^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} \| (DEBUG|INFO|WARNING|ERROR|CRITICAL) \| \w+ \| .*$""".r

  private def refLines: Seq[String] =
    Files.readAllLines(Paths.get(refLog)).asScala.toSeq.filter(_.nonEmpty)

  /** timestamp-stripped `LEVEL | func | message`, paths normalized */
  private def canon(line: String): String = {
    val body = line.split(" \\| ", 2)(1) match {
      case b => b
    }
    body
      .replaceAll("(desde: ).*$", "$1<path>")
      .replaceAll("(Escribiendo datos en: ).*$", "$1<path>")
  }

  test("every committed reference log line matches the 4-field pipe shape") {
    val lines = refLines
    assert(lines.nonEmpty)
    val bad = lines.filterNot(l => lineShape.matches(l))
    assert(bad.isEmpty, s"shape mismatches:\n${bad.mkString("\n")}")
  }

  test("PROD replay emits the reference's exact log stream") {
    // The committed log holds one block per environment run; the PROD
    // block is everything before the second start banner.
    val banner = "Pipeline de procesamiento de datos iniciado"
    val all = refLines
    val second = all.indexWhere(_.contains(banner), all.indexWhere(_.contains(banner)) + 1)
    val pythonNoise = Set("_init_num_threads", "close")
    val expected = all.take(second)
      .filterNot(l => pythonNoise.contains(l.split(" \\| ")(2)))
      .dropRight(1) // "Sesion Spark detenida" is emitted by main() post-stop
      .map(canon)

    val out = Files.createTempDirectory("graft_logparity").toString
    val logFile = s"$out/pipeline.log"
    val conf = ReferenceJob.config("/root/reference/data/raw", s"$out/processed")
      .copy(logging = LoggingConf(Some(logFile), "INFO"))
    PipeLog.init(conf.logging)
    try EtlMain.runLogged(spark, conf)
    finally PipeLog.close()

    val ours = Files.readAllLines(Paths.get(logFile)).asScala.toSeq
      .filter(_.nonEmpty)
    ours.foreach(l => assert(lineShape.matches(l), s"our line off-shape: $l"))
    assert(ours.map(canon) === expected)
  }
}
