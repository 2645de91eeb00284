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

  /** Bloom RUNTIME-FILTER join pruning report — the "ship a filter of
    * the dimension's keys to the fact scan" story every lakehouse
    * engine implements (Spark's own runtime row-group filters do this
    * opaquely; here every bit is replayable): build the filter from
    * the SMALL side's join keys, probe the BIG side's key DOMAIN (one
    * partial-aggregatable key rollup — never the raw fact rows), and
    * report what block-level semi-join pruning would save plus the
    * false-positive tail the exact verify catches. No false negatives
    * by construction, so `maybe = 0 ⇒ matched = 0` and the exact
    * verify join runs ONLY over bloom-positive keys.
    *
    * One output row: big-side rows and keys, bloom-positive keys,
    * exact-match keys, FP keys, rows a bloom-negative scan skips, and
    * the basis-point prune/FP rates (integer div — no libm).
    *
    * 100 TB: the filter is ≤ mBits rows built by one distinct over
    * the (already filtered, dimension-sized) small side and broadcast;
    * the fact side pays one key-domain rollup — the shuffle carries
    * (key, count), never fact rows; the verify semi-join touches only
    * the bloom-positive key slice.
    */
  def joinPruneReport(big: DataFrame, bigKey: Column,
                      small: DataFrame, smallKey: Column,
                      k: Int = 4, mBits: Int = 1 << 14): DataFrame = {
    require(k >= 1 && k <= 5, s"k=$k needs 12k hex chars; sha256 has 64")
    require(mBits >= 2 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits must be a power of two")
    val sk = small.select(smallKey.cast("string").as("sk")).distinct()
    val bloom = sk
      .select(explode(array(
        digestPositions(sha2(col("sk"), 256), k, mBits): _*)).as("pos"))
      .distinct().withColumn("present", lit(1))
    val keys = graft.Caches.persistOnce(
      big.select(bigKey.cast("string").as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("n_rows")))
    // persisted: both the maybe=1 verify arm and the maybe=0 arm read
    // this frame — without the pin the positions-explode + broadcast
    // probe + min aggregate would run twice per report
    val probed = graft.Caches.persistOnce(keys
      .select(col("bk"), col("n_rows"), explode(array(
        digestPositions(sha2(col("bk"), 256), k, mBits): _*)).as("pos"))
      .join(broadcast(bloom), Seq("pos"), "left")
      .groupBy("bk", "n_rows")
      .agg(min(coalesce(col("present"), lit(0))).as("maybe")))
    // exact verify over the bloom-positive slice only (no false
    // negatives — a maybe=0 key cannot match)
    val matched = probed.filter(col("maybe") === 1)
      .join(sk.withColumn("m", lit(1)),
        probed("bk") === col("sk"), "left")
      .select(col("bk"), col("n_rows"), col("maybe"),
        coalesce(col("m"), lit(0)).as("matched"))
    val rep = matched.unionByName(
      probed.filter(col("maybe") === 0)
        .select(col("bk"), col("n_rows"), col("maybe"),
          lit(0).as("matched")))
    rep.agg(
      sum(col("n_rows")).as("n_big_rows"),
      count(lit(1)).as("n_keys"),
      sum(col("maybe")).cast("bigint").as("n_maybe_keys"),
      sum(col("matched")).cast("bigint").as("n_match_keys"),
      (sum(col("maybe")) - sum(col("matched"))).cast("bigint")
        .as("n_fp_keys"),
      sum(when(col("maybe") === 0, col("n_rows")).otherwise(0L))
        .as("pruned_rows"))
      .withColumn("prune_bp", call_function("div",
        col("pruned_rows") * 10000L, col("n_big_rows")))
      .withColumn("fp_bp", call_function("div",
        col("n_fp_keys") * 10000L,
        greatest(col("n_keys") - col("n_match_keys"), lit(1L))))
  }
}
