package graft.etl

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** CSV-directory reader with explicit schema + basename lineage column
  * (reference read_data, /root/reference/data_process.py:48-89).
  *
  * Lineage uses input_file_name(), which yields a URL-encoded URI — the
  * reference's committed output contains `%20` for spaces, so parity
  * requires exactly this function (not `_metadata.file_name`).
  */
object Reader {
  def read(spark: SparkSession, conf: InputConf): DataFrame =
    spark.read.format(conf.format)
      .options(conf.options)
      .schema(SchemaBuilder.build(conf.fields))
      .load(conf.path)
      .withColumn(conf.lineageColumn,
        regexp_extract(input_file_name(), "[^/]+$", 0))
}

/** Static-overwrite partitioned parquet sink under base/<ENV>
  * (reference write_data, /root/reference/data_process.py:315-330).
  */
object Writer {
  def write(df: DataFrame, conf: OutputConf, environment: String): String = {
    val path = Paths.get(conf.basePath, environment).toString
    df.write.mode("overwrite").partitionBy(conf.partitionBy: _*).parquet(path)
    path
  }
}

/** Config-driven data-quality gates (reference :267-313). */
object DataQuality {
  final case class CheckResult(check: String, passed: Boolean, detail: String)

  sealed trait Check { def run(df: DataFrame): CheckResult }

  /** V1 — minimum row count. */
  final case class MinRows(min: Long) extends Check {
    def run(df: DataFrame): CheckResult = {
      val n = df.count()
      CheckResult(s"min_rows>=$min", n >= min, s"rows=$n")
    }
  }

  /** V2 — required columns; metadata-only, no Spark job. */
  final case class RequiredColumns(required: Seq[String]) extends Check {
    def run(df: DataFrame): CheckResult = {
      val missing = required.toSet -- df.columns.toSet
      CheckResult("required_columns", missing.isEmpty, s"missing=${missing.mkString(",")}")
    }
  }

  /** V3 — per-column not-null. Load-bearing parity quirk: the reference
    * checks PRE-RENAME names against the POST-RENAME frame and succeeds
    * via Catalyst's ResolveMissingReferences (a Filter atop a Project may
    * reference a dropped column) — see SURVEY.md §2.6. The literal
    * translation inherits that behavior; do not "fix" to output-schema
    * validation.
    */
  final case class NotNull(column: String) extends Check {
    def run(df: DataFrame): CheckResult = {
      val n = df.filter(col(column).isNull).count()
      CheckResult(s"not_null($column)", n == 0, s"nulls=$n")
    }
  }

  /** Run all checks; the gate passes only if every check passes. */
  def gate(df: DataFrame, checks: Seq[Check]): (Boolean, Seq[CheckResult]) = {
    val results = checks.map(_.run(df))
    (results.forall(_.passed), results)
  }
}

/** End-to-end pipeline: read → input gate → transform → output gate →
  * write (reference main, /root/reference/data_process.py:332-366).
  *
  * One deliberate deviation from the reference, flagged per SURVEY §7.1:
  * the transformed frame is persisted before the DQ/write action fan-out.
  * The reference recomputes the full upstream plan for every action (5×);
  * a single persist changes nothing semantically and removes the
  * recompute amplification that dominates its runtime.
  */
object EtlRunner {
  final case class EtlReport(
      inputGate: Seq[DataQuality.CheckResult],
      outputGate: Seq[DataQuality.CheckResult],
      written: Option[String],
      rowsOut: Long)

  def run(spark: SparkSession, conf: EtlConfig): EtlReport = {
    import DataQuality._
    val raw = Reader.read(spark, conf.input)

    val (inOk, inResults) = gate(raw, Seq(
      MinRows(conf.quality.minRows),
      RequiredColumns(conf.quality.requiredColumns)))
    if (!inOk) return EtlReport(inResults, Nil, None, 0L)

    val transformed = Transforms(raw, conf).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (outOk, outResults) =
        gate(transformed, conf.quality.notNullColumns.map(NotNull))
      if (!outOk) EtlReport(inResults, outResults, None, transformed.count())
      else {
        val path = Writer.write(transformed, conf.output, conf.run.environment)
        EtlReport(inResults, outResults, Some(path), transformed.count())
      }
    } finally {
      transformed.unpersist()
      ()
    }
  }
}

/** CLI: run the pipeline from a YAML config path. Logging follows the
  * reference's file+console shape (`asctime | LEVEL | funcName | msg`,
  * /root/reference/data_process.py:11-33, 332-366) via [[PipeLog]].
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val configPath = args.headOption.getOrElse(
      sys.error("usage: EtlMain <config.yaml> [master]"))
    val conf = EtlConfig.load(configPath)
    PipeLog.init(conf.logging)
    val spark = SparkSession.builder()
      .master(args.lift(1).getOrElse("local[*]"))
      .appName(s"graft_etl_${conf.run.environment}")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    PipeLog.info("main",
      s"--- Sesion Spark iniciada en entorno: ${conf.run.environment} ---")
    PipeLog.info("main", "Pipeline de procesamiento de datos iniciado")
    try {
      val report = EtlRunner.run(spark, conf)
      report.inputGate.foreach { r =>
        if (r.passed) PipeLog.info("run_dq_checks", s"[DQ INPUT APROBADA] ${r.check}: ${r.detail}")
        else PipeLog.error("run_dq_checks", s"[DQ INPUT FALLIDA] ${r.check}: ${r.detail}")
      }
      report.outputGate.foreach { r =>
        if (r.passed) PipeLog.info("run_dq_checks", s"[DQ OUTPUT APROBADA] ${r.check}: ${r.detail}")
        else PipeLog.error("run_dq_checks", s"[DQ OUTPUT FALLIDA] ${r.check}: ${r.detail}")
      }
      report.written match {
        case Some(p) =>
          PipeLog.info("write_data", s"Escribiendo datos en: $p")
          PipeLog.info("write_data", "Escritura exitosa.")
          PipeLog.info("main", s"wrote ${report.rowsOut} rows to $p")
        case None =>
          PipeLog.error("main", "ERROR: Se encontró una falla en la Calidad de Datos")
      }
    } catch { case e: Throwable =>
      PipeLog.critical("main", s"ERROR FATAL en el pipeline: ${e.getMessage}")
      throw e
    } finally {
      spark.stop()
      PipeLog.info("main", "Sesion Spark detenida")
      PipeLog.info("main",
        f"pipeline wall clock incl. session start/stop: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      PipeLog.close()
    }
  }
}
