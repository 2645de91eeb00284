package graft.etl

import java.io.{File, PrintWriter}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Reference-shaped pipeline logging: lines formatted as
  * `asctime | LEVEL | funcName | message` to console + optional append
  * file, byte-comparable to the reference's Python logging setup
  * (`%(asctime)s | %(levelname)s | %(funcName)s | %(message)s`,
  * /root/reference/data_process.py:11-33; file handler in append mode,
  * directory auto-created). Self-contained on purpose — no log4j config
  * coupling, deterministic format.
  */
object PipeLog {
  // python logging's name→level table including its WARN/FATAL aliases
  private val levels = Map("DEBUG" -> 10, "INFO" -> 20, "WARNING" -> 30,
    "WARN" -> 30, "ERROR" -> 40, "CRITICAL" -> 50, "FATAL" -> 50)
  // python asctime default: "2026-08-12 10:30:59,123"
  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS")

  private var out: Option[PrintWriter] = None
  private var minLevel: Int = 20

  /** Configure from the pipeline's logging conf: open (append) the log
    * file, creating its directory like the reference does. Level-name
    * resolution mirrors the reference EXACTLY
    * (`getattr(logging, log_level, logging.INFO)`,
    * /root/reference/data_process.py:26): python's WARN/FATAL aliases
    * resolve, and an unknown name silently falls back to INFO — the
    * reference never raises here, so neither do we.
    */
  def init(conf: LoggingConf): Unit = synchronized {
    minLevel = levels.getOrElse(conf.logLevel, 20)
    close()
    out = conf.logFile.map { f =>
      Option(new File(f).getParentFile).foreach(_.mkdirs())
      // explicit UTF-8: the parity messages carry accented characters and
      // must not depend on the platform charset
      new PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(f, true), java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  def close(): Unit = synchronized { out.foreach(_.close()); out = None }

  def info(func: String, msg: String): Unit = log("INFO", func, msg)
  def error(func: String, msg: String): Unit = log("ERROR", func, msg)
  def critical(func: String, msg: String): Unit = log("CRITICAL", func, msg)

  private def log(level: String, func: String, msg: String): Unit = synchronized {
    if (levels.getOrElse(level, 20) >= minLevel) {
      val line = s"${LocalDateTime.now.format(ts)} | $level | $func | $msg"
      println(line)
      out.foreach { w => w.println(line); w.flush() }
    }
  }
}
