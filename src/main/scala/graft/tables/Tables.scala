package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * Every query entry in [[graft.SparkEntry]] reads through here so the
  * scan shape (schema pruning, filter pushdown) is uniform. At cluster
  * scale these would be catalog tables; locally they are bare parquet
  * directories, which exercises the identical DataSource V2 scan path.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  /** The events table's `ts` physical type has varied across driver
    * testdata generations: TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read the raw nanos as long via the legacy conf
    * and rebuild a micros timestamp; driver data is micro-precision, so
    * the floor-division is lossless) vs TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ — cast
    * to the session-zone TimestampType; the session zone is pinned UTC
    * everywhere, so the cast is value-identity and downstream window /
    * unix_timestamp arithmetic matches the DuckDB oracle's naive
    * reading). Branch on the inferred schema so both generations load
    * to the same TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case other =>
        // fail fast: a silent cast of an unexpected physical type (e.g.
        // string) would surface as null timestamps rows away from here
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other in $dir")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

/** Cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running the oracle SQL on the same tables. Floating point must
  * therefore be bit-identical, not merely close:
  *
  *  - Aggregating doubles directly is order-dependent; we route money-like
  *    columns through DECIMAL(12,2) (exact) and cast the final result to
  *    double — both engines then produce the identical IEEE value.
  *  - `round()` implementations differ at representation boundaries
  *    (Java BigDecimal-of-shortest-string vs C-style); `floor(x*s+0.5)/s`
  *    is pure IEEE arithmetic and bit-identical in both engines.
  */
object Exact {
  /** Deterministic half-up rounding to 2 decimal places (see above).
    *
    * NOTE: `floor(x*s+0.5)/s` rounds halves toward +infinity. For the
    * non-negative money/quantity columns this equals HALF_UP (away from
    * zero). [[round6]] is also applied to cosine similarity (Similarity /
    * Dedup), which can be negative: there a half lands toward +infinity
    * rather than away from zero — still deterministic and matched by the
    * identical floor formula on the DuckDB oracle side, just not HALF_UP
    * in the BigDecimal sense. Use a sign-aware form if HALF_UP semantics
    * ever matter for negative inputs.
    */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** Deterministic half-up rounding to 6 decimal places (halves of
    * negative inputs round toward +infinity — see [[round2]]). */
  def round6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000

  /** Exact decimal view of a 2-decimal money column stored as double. */
  def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
