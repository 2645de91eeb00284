package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.tables.{Tables => T}

/** Semantics + blocking-exactness tests for the round-6 operators:
  * word-boundary containment dedup and BM25 retrieval scoring.
  */
class Round6OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- x51

  test("containmentPairs: word-run containment found; char-substring " +
       "without word boundary rejected; strict-shorter orientation") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "yesterday the quick brown fox jumped over the fence"),
      // "he quick brown fo" is a char substring of doc 0 but not a word
      // run; "thequick brownfox" shares no word boundary either
      (2L, "catalog of thequick brownfox entries and more padding words"),
      (3L, "the quick brown fox"), // identical to 0 → not strictly shorter
      (4L, "an unrelated page about spark adaptive query execution"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (3L, 1L)),
      s"expected exactly the two word-run containments, got $got")
  }

  test("containmentPairs: whitespace + case normalization, and docs under " +
       "n words never pair (the shingle-less convention)") {
    val docs = Seq(
      (0L, "  The   Quick\tBrown FOX  "),
      (1L, "prefix the quick brown fox suffix words here"),
      (2L, "tiny doc"), // 2 words < n=3: no head shingle, never pairs
      (3L, "prefix tiny doc suffix with several more words"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L)), s"got $got")
  }

  test("containmentPairs: head-shingle blocking EQUALS the unblocked " +
       "all-pairs definition on the sf0.001 corpus") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val norm = docs.select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
    val d = norm.collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      a <- d; b <- d
      if a._1 != b._1 && a._2.length < b._2.length
      if a._2.split(" ").length >= 3
      if (" " + b._2 + " ").contains(" " + a._2 + " ")
    } yield (a._1, b._1)).toSet
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth,
      s"blocking lost/invented pairs: missing=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty, "fixture has no containment pairs — test is vacuous")
  }

  test("containmentPairs plan: equi-join on the shingle anchor, no " +
       "cartesian node") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val plan = Dedup.containmentPairs(docs, "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"containment blocking degenerated to all-pairs:\n$plan")
  }

  // ---------------------------------------------------------------- x52

  test("bm25: more hits of a rarer term outranks fewer; n_terms counts " +
       "distinct matched terms; k bounds rows") {
    // "rare" df=1, "common" df=3 → idf(rare) >> idf(common); equal dl
    // across docs so length normalization cancels.
    val docs = Seq(
      (0L, "rare rare common pad1 pad2 pad3"),
      (1L, "common common common pad1 pad2 pad3"),
      (2L, "common pad0 pad1 pad2 pad3 pad4"),
      (3L, "pad0 pad1 pad2 pad3 pad4 pad5"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "text", "doc_id",
        terms = Seq("rare", "common"), k = 2)
      .orderBy("rank").collect()
    assert(out.length === 2, "k must bound the row count")
    assert(out(0).getLong(0) === 0L,
      "doc hitting the rare term must outrank the common-only docs")
    assert(out(0).getLong(2) === 2L, "doc 0 hits both terms")
    assert(out(1).getLong(0) === 1L,
      "among common-only docs, higher tf wins")
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("bm25: length normalization — same tf scores lower in a longer doc") {
    val docs = Seq(
      (0L, "term pad1 pad2 pad3"),
      (1L, "term " + (1 to 40).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "text", "doc_id",
        terms = Seq("term"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0L) > out(1L),
      s"b=0.75 must penalize the longer doc: $out")
  }

  test("bm25 plan: token explode filtered to query terms before the " +
       "aggregation, top-k via TakeOrderedAndProject (no global window)") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val q = TextAnalysis.bm25(docs, "text", "doc_id",
      terms = Seq("query", "join"), k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be sort+limit, not a one-partition window:\n$plan")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("query") && optimized.contains("join"),
      "the isin(term) literal filter should appear in the optimized plan")
  }
}
