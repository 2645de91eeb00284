package graft.etl

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's log-line shape:
  * `%(asctime)s | %(levelname)s | %(funcName)s | %(message)s` with
  * python-style asctime (comma millis), appended to the configured file
  * (/root/reference/data_process.py:11-33).
  */
class PipeLogSpec extends AnyFunSuite {

  private val LineRe =
    """^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} \| (INFO|ERROR|CRITICAL) \| \w+ \| .*$""".r

  test("log lines are byte-shaped like the reference and append to the file") {
    val f = Files.createTempFile("pipelog", ".log")
    PipeLog.init(LoggingConf(Some(f.toString), "INFO"))
    PipeLog.info("read_data", "Datos cargados exitosamente desde: /tmp/in.csv")
    PipeLog.error("run_dq_checks", "[DQ INPUT FALLIDA] Conteo bajo: 0 filas")
    PipeLog.close()
    // append mode: a second init must not truncate
    PipeLog.init(LoggingConf(Some(f.toString), "INFO"))
    PipeLog.info("main", "Sesion Spark detenida")
    PipeLog.close()
    val lines = Files.readAllLines(f).asScala.toSeq
    assert(lines.size === 3)
    lines.foreach(l => assert(LineRe.matches(l), s"line not reference-shaped: $l"))
    assert(lines(0).endsWith("| INFO | read_data | Datos cargados exitosamente desde: /tmp/in.csv"))
    assert(lines(1).contains("| ERROR | run_dq_checks | [DQ INPUT FALLIDA]"))
  }

  test("level aliases and unknown names resolve like the reference's getattr fallback") {
    val f = Files.createTempFile("pipelog", ".log")
    // WARN is a python logging alias for WARNING → filters INFO out
    PipeLog.init(LoggingConf(Some(f.toString), "WARN"))
    PipeLog.info("main", "suppressed")
    PipeLog.error("main", "kept-warnlevel")
    PipeLog.close()
    // unknown names fall back to INFO (reference: getattr(..., logging.INFO),
    // data_process.py:26 — never raises)
    PipeLog.init(LoggingConf(Some(f.toString), "VERBOSE"))
    PipeLog.info("main", "kept-fallback")
    PipeLog.close()
    val lines = Files.readAllLines(f).asScala.toSeq
    assert(lines.size === 2)
    assert(lines(0).contains("kept-warnlevel") && lines(1).contains("kept-fallback"))
  }

  test("log level filters below-threshold lines like python logging") {
    val f = Files.createTempFile("pipelog", ".log")
    PipeLog.init(LoggingConf(Some(f.toString), "ERROR"))
    PipeLog.info("main", "suppressed")
    PipeLog.error("main", "kept")
    PipeLog.close()
    val lines = Files.readAllLines(f).asScala.toSeq
    assert(lines.size === 1 && lines.head.contains("| ERROR | main | kept"))
  }
}
