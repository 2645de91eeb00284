package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Extensions, Parity, StreamingQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module query maps; each entry has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.pipelineComposite(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Analytics.queries ++ Extensions.queries ++ StreamingQ.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Parity.oracle ++ Analytics.oracle ++ Extensions.oracle ++ StreamingQ.oracle
}
