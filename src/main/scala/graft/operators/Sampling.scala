package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * `TABLESAMPLE`/`df.sample` draw from an RNG whose stream depends on
  * partitioning and task scheduling — re-running the pipeline (or
  * changing the partition count) changes the sample. Keying the
  * decision on `hash(id)` instead makes the sample a pure function of
  * the data: reproducible across runs, clusters, and engines,
  * join-stable (the same ids are in-sample everywhere), and
  * incremental (new rows don't reshuffle old decisions — the property
  * that makes hash-sampling the standard for train/eval splits).
  *
  * 100 TB: a scan-side codegen'd filter — no shuffle, no state; the
  * sample rate prunes every downstream operator proportionally.
  */
object Sampling {
  /** Unsigned-32 murmur3 bucket of `id` in [0, buckets). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    hash(id).cast("bigint").bitwiseAND(lit(4294967295L)) % buckets

  /** Keep rows whose hash bucket falls below `pct` (a pct% sample). */
  def hashSample(df: DataFrame, id: Column, pct: Int,
                 buckets: Int = 100): DataFrame =
    df.filter(hashBucket(id, buckets) < pct)

  /** Stratified variant: per-stratum rates (e.g. oversample a rare
    * language), `defaultPct` elsewhere. `rates` is evaluated as a
    * chained when/otherwise — strata count is expected to be small.
    */
  def stratifiedHashSample(df: DataFrame, id: Column, stratum: Column,
                           rates: Seq[(String, Int)], defaultPct: Int,
                           buckets: Int = 100): DataFrame = {
    val rate = rates.foldRight(lit(defaultPct): Column) {
      case ((value, pct), acc) => when(stratum === value, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(id, buckets) < rate)
  }

  /** Deterministic mixture balancing: downsample every stratum to the
    * rarest stratum's size, so the output mixture is uniform over
    * `stratumCol` (the data-mixing step before training: no domain or
    * language dominates the batch stream). The per-stratum rate is
    * derived from the data (target / n_stratum) and applied as a pure
    * integer predicate on the hash bucket —
    * `bucket · n_stratum < target · buckets` — so acceptance stays
    * reproducible, join-stable, and monotone (a larger target keeps a
    * superset). `weight` (target / n_stratum, one IEEE division)
    * reports the realized rate for loss re-weighting instead of
    * dropping, if the caller prefers.
    *
    * 100 TB: the stratum-count aggregate is partial-aggregatable and
    * tiny (strata-sized); it is broadcast back onto the scan, so the
    * accept filter stays scan-side with no extra shuffle of the data.
    */
  def mixtureBalance(df: DataFrame, id: Column, stratumCol: String,
                     buckets: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_stratum"))
    // global-window min instead of a second aggregate: the counts
    // subtree (and its scan) is computed once; the window runs on the
    // strata-sized table, so the single partition is trivial
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts.withColumn("target_n", min(col("n_stratum")).over(w))
    df.join(broadcast(rates), stratumCol)
      .withColumn("samp_bucket", hashBucket(id, buckets).cast("long"))
      .filter(col("samp_bucket") * col("n_stratum") <
              col("target_n") * lit(buckets.toLong))
      .withColumn("weight", col("target_n").cast("double") / col("n_stratum"))
  }

  /** Deterministic negative sampling for contrastive training: each
    * item draws `k` pseudo-random partners by hashing (id·k + i) into
    * the id space — a pure function of the id, so the pairing is
    * reproducible across runs, partitionings, and engines (no RNG
    * stream). Self-draws are dropped; `true_negative` flags whether
    * the partner's label actually differs (callers filter or re-draw
    * on it).
    *
    * 100 TB: the corpus-count aggregate is one tiny broadcast; the
    * k-way expansion is scan-side metadata; the only real shuffle is
    * the partner equi-join, keyed on the hash-uniform neg_id — no
    * skew, no cartesian.
    */
  def negativeSamples(items: DataFrame, idCol: String, labelCol: String,
                      k: Int = 4): DataFrame = {
    val n = broadcast(items.agg(count(lit(1)).as("n")))
    val cand = items.select(col(idCol).as("vec_id"), col(labelCol).as("label"))
      .crossJoin(n)
      .select(col("vec_id"), col("label"), col("n"),
        explode(array((0 until k).map(lit(_)): _*)).as("i"))
      .withColumn("neg_id",
        hash(col("vec_id") * k + col("i")).cast("bigint")
          .bitwiseAND(lit(4294967295L)) % col("n"))
      .filter(col("neg_id") =!= col("vec_id"))
    cand
      .join(items.select(col(idCol).as("neg_id"), col(labelCol).as("neg_label")),
        Seq("neg_id"))
      .select(col("vec_id"), col("i"), col("neg_id"), col("label"), col("neg_label"))
      .withColumn("true_negative", col("label") =!= col("neg_label"))
  }
}
