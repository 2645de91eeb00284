package graft.operators

import graft.SparkTestBase

/** x67 bpePairCandidates: the first BPE merge step. */
class BpePairsSpec extends SparkTestBase {
  import spark.implicits._

  test("pair counts are exact; ranking is (count desc, pair asc); " +
       "single-token and empty docs contribute nothing") {
    val docs = Seq(
      (1L, "a b a b c"),     // pairs: (a,b)×2, (b,a), (b,c)
      (2L, "a b"),           // (a,b)
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpePairCandidates(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.head === (("a", "b", 3L)), s"top pair: ${rows.head}")
    assert(rows.toSet === Set(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L)))
    // ties at count 1 ordered by (w1, w2)
    assert(rows.drop(1).toSeq === Seq(("b", "a", 1L), ("b", "c", 1L)))
  }

  test("plan: scan-side pair stream, partial aggregation, TakeOrdered " +
       "top-k — no join, no global sort of the pair vocabulary") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val s = TextAnalysis.bpePairCandidates(docs, "text", k = 50)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.contains("partial_count") || s.contains("HashAggregate"), s)
    assert(!s.contains("Join"), s"unexpected join:\n$s")
  }
}
