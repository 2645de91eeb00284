package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Skewed-corpus guard: one hot shingle shared by every document makes
  * the direct shingle self-join quadratic (Σdf² blowup), while the
  * banded path's candidate volume stays bounded by actual similarity.
  * Count-only assertions — this pins the scale story, no timing.
  */
class DedupSkewSpec extends SparkTestBase {
  import spark.implicits._

  // 120 docs sharing the trigram "alpha beta gamma"; everything else
  // unique per doc, so NO pair is a real near-dup (jaccard ≈ 1/17).
  private lazy val hotDocs = (0 until 120).map { i =>
    (i.toLong, s"alpha beta gamma u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
  }.toDF("doc_id", "text")

  test("hot shingle: all-pairs shingle join explodes quadratically; banded candidates stay bounded") {
    val flat = Dedup.shingleFlat(hotDocs, "text", "doc_id", n = 3)
    val naivePairs = flat.select(col("doc_id").as("d1"), col("s"))
      .join(flat.select(col("doc_id").as("d2"), col("s")), Seq("s"))
      .filter(col("d1") < col("d2"))
      .count()
    // the hot shingle alone contributes 120·119/2 = 7140 candidate rows
    assert(naivePairs >= 7140L, s"fixture lost its hot shingle: $naivePairs")

    val bandedPairs = Dedup.minhashBandPairs(hotDocs, "text", "doc_id",
      n = 3, numHashes = 16, bands = 8).count()
    info(s"candidate volume: naive=$naivePairs banded=$bandedPairs")
    assert(bandedPairs <= naivePairs / 10,
      s"banding failed to prune the hot-shingle skew: $bandedPairs vs $naivePairs")

    // and the verified output is empty — none of these are near-dups
    assert(Dedup.bandedJaccardMinhash(hotDocs, "text", "doc_id",
      n = 3, threshold = 0.5, numHashes = 16, bands = 8).count() === 0L)
  }
}
