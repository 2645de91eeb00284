package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter for incremental dedup.
  *
  * [[Dedup.dedupAgainst]] anti-joins every ingest batch against the
  * historical digest table — correct, but the join touches the full
  * batch. A bloom filter built from the historical digests turns that
  * into a two-stage check: a broadcast, scan-side membership test
  * prunes the (typically overwhelming) majority of rows that are
  * certainly new, and only the "maybe duplicate" survivors pay the
  * exact digest join. Bloom filters have no false negatives, so the
  * combined answer is exact; false positives only cost redundant
  * verify work, never wrong output.
  *
  * The k hash functions are disjoint 48-bit hex slices of the
  * sha256 content digest — cryptographically uniform, independent by
  * construction, and reproducible in ANSI SQL (`CAST('0x…' AS BIGINT)`),
  * so the oracle replays every bit of the filter. No seeds to manage:
  * the digest IS the entropy source.
  *
  * 100 TB: the filter is `mBits` of state total (not per row) built by
  * one partial-aggregatable distinct over the historical side, then
  * broadcast; the membership test is a broadcast join on bit position,
  * so the batch never shuffles until the (much smaller) verify step.
  * Sizing: false-positive rate ≈ (1-e^(-kn/m))^k — at the classic
  * m/n = 16, k = 4 it is ~0.2 %; the x31 query deliberately runs an
  * undersized filter at sf0.1 so the FP → extra-verify path is
  * exercised, not just theorized.
  */
object Bloom {
  /** Bit positions of digest `h` (sha256 hex): k disjoint 12-hex-char
    * (48-bit) slices, each mod `mBits`. k ≤ 5 fits one sha256.
    */
  def digestPositions(h: Column, k: Int, mBits: Int): Seq[Column] = {
    require(k >= 1 && k <= 5, s"k=$k needs 12k hex chars; sha256 has 64")
    (0 until k).map { i =>
      conv(substring(h, 1 + 12 * i, 12), 16, 10).cast("long") % mBits
    }
  }

  /** The filter's occupied-bit set (≤ mBits rows of one int — the
    * relational stand-in for the bitmap an executor would hold).
    */
  def build(corpus: DataFrame, textCol: String,
            k: Int = 4, mBits: Int = 1 << 14): DataFrame =
    corpus.select(sha2(col(textCol), 256).as("h")).distinct()
      .select(explode(array(digestPositions(col("h"), k, mBits): _*)).as("pos"))
      .distinct()

  /** Incremental dedup with the bloom prefilter: one row per distinct
    * batch digest — `(doc_id, h, bloom_maybe, is_dup)`, doc_id = min id
    * with that content. `bloom_maybe ≥ is_dup` always (no false
    * negatives); rows with `bloom_maybe = 1, is_dup = 0` are the false
    * positives the exact verify caught. Downstream keeps `is_dup = 0`.
    */
  def dedupPrefiltered(batch: DataFrame, historical: DataFrame,
                       textCol: String, idCol: String,
                       k: Int = 4, mBits: Int = 1 << 14): DataFrame = {
    val bloom = build(historical, textCol, k, mBits)
      .withColumn("present", lit(1))
    val b = batch
      .select(col(idCol).as("doc_id"), sha2(col(textCol), 256).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
    val maybe = b
      .select(col("doc_id"), col("h"),
        explode(array(digestPositions(col("h"), k, mBits): _*)).as("pos"))
      .join(broadcast(bloom), Seq("pos"), "left")
      .groupBy("doc_id", "h")
      .agg(min(coalesce(col("present"), lit(0))).as("bloom_maybe"))
    // Exact verify ONLY for bloom-positive digests: at a healthy m/n
    // this join sees the duplicates plus a ~0.2 % FP tail, not the batch.
    val hist = historical.select(sha2(col(textCol), 256).as("h")).distinct()
      .withColumn("confirmed", lit(1))
    val positives = maybe.filter(col("bloom_maybe") === 1)
      .join(hist, Seq("h"), "left")
      .select(col("doc_id"), col("h"), col("bloom_maybe"),
        coalesce(col("confirmed"), lit(0)).as("is_dup"))
    val negatives = maybe.filter(col("bloom_maybe") === 0)
      .select(col("doc_id"), col("h"), col("bloom_maybe"),
        lit(0).as("is_dup"))
    positives.unionByName(negatives)
  }
}
