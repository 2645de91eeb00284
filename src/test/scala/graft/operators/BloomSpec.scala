package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bloom-prefilter semantics: exactness of the combined answer, the
  * no-false-negative guarantee, and the false-positive → extra-verify
  * path under a deliberately undersized filter.
  */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("no false negatives: every true duplicate is bloom-positive and confirmed") {
    val hist = docs((0L to 49L).map(i => (i, s"historical doc $i")): _*)
    val batch = docs(
      (100L, "historical doc 7"),   // dup
      (101L, "historical doc 23"),  // dup
      (102L, "genuinely new text"))
    val out = Bloom.dedupPrefiltered(batch, hist, "text", "doc_id")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(byId(100L) == ((1, 1)) && byId(101L) == ((1, 1)))
    assert(byId(102L)._2 == 0)
    // invariant: bloom_maybe >= is_dup on every row
    assert(out.forall(r => r.getInt(2) >= r.getInt(3)))
  }

  test("undersized filter produces false positives that exact verify rejects") {
    // 400 distinct docs into m=64 bits with k=2 → filter saturates;
    // new content collides with occupied bits but is never confirmed
    val hist = docs((0L until 400L).map(i => (i, s"hist $i")): _*)
    val batch = docs((1000L until 1100L).map(i => (i, s"new $i")): _*)
    val out = Bloom.dedupPrefiltered(batch, hist, "text", "doc_id",
        k = 2, mBits = 64).collect()
    val fps = out.count(r => r.getInt(2) == 1 && r.getInt(3) == 0)
    assert(fps > 0, "undersized filter should show false positives")
    assert(out.forall(_.getInt(3) == 0), "none of the new docs may be confirmed")
  }

  test("adequately sized filter prunes nearly all new content before the verify join") {
    val hist = docs((0L until 200L).map(i => (i, s"hist $i")): _*)
    val batch = docs((1000L until 1200L).map(i => (i, s"new $i")): _*)
    val out = Bloom.dedupPrefiltered(batch, hist, "text", "doc_id",
        k = 4, mBits = 1 << 14).collect()
    // FP expectation ≈ (kn/m)^k ≈ (800/16384)^4 ≈ 6e-6 → essentially none
    assert(out.count(_.getInt(2) == 1) <= 2)
  }

  test("batch-internal duplicates collapse to the min doc_id before the filter") {
    val hist = docs((0L, "h0"))
    val batch = docs((5L, "same text"), (3L, "same text"), (9L, "h0"))
    val out = Bloom.dedupPrefiltered(batch, hist, "text", "doc_id").collect()
    assert(out.length == 2) // one row per distinct digest
    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(3L, 9L)) // min id wins for the duplicated content
  }
}
