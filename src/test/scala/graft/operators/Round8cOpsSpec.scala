package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.tables.{Tables => T}

/** Round-8 late additions: blocked record linkage (x81), the ordered
  * conversion funnel (a55), and cluster-then-balance mixing (x82) —
  * semantics on constructed fixtures, an independent-formulation
  * equivalence on real data, and the scale-shape plan pins.
  */
class Round8cOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- x81

  test("entityPairs: collapse-first linkage equals the row-level blocked " +
       "join projected to entity level (duplication changes counts, " +
       "never the pair set)") {
    val recs = Seq(
      "red widget", "red widget", "red widget", // 3 rows, one entity
      "red widgets",                            // dist 1 from above
      "red gadget",                             // dist 3/4 from widgets
      "blue widget"                             // different block
    ).toDF("name")
    val out = Linkage.entityPairs(recs, "name", maxDist = 4)
      .orderBy("name1", "name2").collect()
    // within block "red": (gadget,widget)=2 (two substitutions),
    // (gadget,widgets)=3, (widget,widgets)=1 — all ≤ 4; "blue widget"
    // is alone in its block
    assert(out.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq ===
      Seq(("red gadget", "red widget", 2),
          ("red gadget", "red widgets", 3),
          ("red widget", "red widgets", 1)))
    // row counts ride along: "red widget" appears 3×
    val n = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(3), r.getLong(4))).toMap
    assert(n(("red gadget", "red widget")) === (1L, 3L))
    assert(n(("red widget", "red widgets")) === (3L, 1L))
  }

  test("entityPairs: maxDist bounds the pair set and cross-block pairs " +
       "never appear, regardless of distance") {
    val recs = Seq("aa x", "aa y", "bb x", "bb y").toDF("name")
    // blocks {aa x, aa y} and {bb x, bb y}: within-block dist 1 pairs
    // only; cross-block (e.g. "aa x"/"bb x", dist 2) must not appear
    val out = Linkage.entityPairs(recs, "name", maxDist = 4).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("aa x", "aa y"), ("bb x", "bb y")))
    val strict = Linkage.entityPairs(recs, "name", maxDist = 0).collect()
    assert(strict.isEmpty)
  }

  test("entityPairs plan: no cartesian product — the self-join is keyed " +
       "on the block column") {
    val plan = Linkage.entityPairs(T.part(spark, sf), "p_name", maxDist = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"blocked linkage must never plan a cartesian:\n$plan")
  }

  // ---------------------------------------------------------------- a55

  test("funnelTimes: ordering is enforced — a step-2 event BEFORE step 1 " +
       "does not count, later steps chain strictly") {
    def ts(m: Int) = new Timestamp(m * 60000L)
    val ev = Seq(
      // reaches all 3 in order
      (1L, "signup", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // click BEFORE signup: stops at stage 1
      (2L, "click", ts(5)), (2L, "signup", ts(10)),
      // no signup at all: stage 0
      (3L, "click", ts(1)), (3L, "purchase", ts(2)),
      // signup → purchase → click: click counts (after signup), but no
      // purchase after the click → stops at stage 2
      (4L, "signup", ts(1)), (4L, "purchase", ts(2)), (4L, "click", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.queries.Analytics.funnelTimes(ev, "signup", "click", "purchase")
      .orderBy("user_id").collect()
    def reached(r: org.apache.spark.sql.Row): Int =
      Seq(1, 2, 3).takeWhile(i => !r.isNullAt(i)).size
    assert(out.map(r => r.getLong(0) -> reached(r)).toMap ===
      Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 2))
    // user 1's times are the expected ones
    val u1 = out.find(_.getLong(0) == 1L).get
    assert(u1.getTimestamp(1) === ts(10) && u1.getTimestamp(2) === ts(20) &&
      u1.getTimestamp(3) === ts(30))
  }

  test("a55 funnel: the window-chain formulation equals an independent " +
       "join-chain formulation on the real events table") {
    val q = graft.queries.Analytics.queries("a55_funnel")(spark, sf)
      .orderBy("step").collect()
    val ev = T.events(spark, sf).select("user_id", "event_type", "ts")
    val u1 = ev.filter($"event_type" === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val u2 = ev.join(u1, "user_id")
      .filter($"event_type" === "click" && $"ts" > $"t1")
      .groupBy("user_id").agg(min("ts").as("t2"))
    val u3 = ev.join(u2, "user_id")
      .filter($"event_type" === "purchase" && $"ts" > $"t2")
      .groupBy("user_id").agg(min("ts").as("t3"))
    val expected = Seq(u1.count(), u2.count(), u3.count())
    assert(q.map(_.getLong(2)).toSeq === expected)
    // funnel counts are monotone non-increasing by construction
    assert(expected === expected.sorted.reverse)
  }

  // ---------------------------------------------------------------- x83

  test("x83 score calibration: per-stratum ranks are contiguous from 1, " +
       "scores are non-increasing within a stratum, and keep == " +
       "(pct_rank <= 0.5)") {
    val out = graft.queries.Extensions.queries("x83_score_calibrate")(spark, sf)
      .collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to rows.length),
        s"ranks must be 1..n for $lang")
      sorted.foreach { r =>
        val pr = r.getDouble(3)
        assert(pr >= 0.0 && pr <= 1.0)
        assert((r.getInt(4) == 1) === (pr <= 0.5), s"keep rule broken: $r")
      }
      // roughly half of each stratum survives the 0.5 cutoff
      val kept = rows.count(_.getInt(4) == 1)
      assert(kept >= rows.length / 2,
        s"$lang: pct_rank <= 0.5 must keep at least the top half")
    }
  }

  // ---------------------------------------------------------------- x84

  test("x84 source overlap: matrix equals the one computed from the " +
       "EXACT all-pairs jaccard join, and pairs are unordered-normalized") {
    val docs = T.documents(spark, sf)
    val out = graft.queries.Extensions.queries("x84_source_overlap")(spark, sf)
      .collect()
    out.foreach(r => assert(r.getString(0) <= r.getString(1),
      s"source pair must be least/greatest normalized: $r"))
    // independent truth: the exact O(n²)-within-shingle-block jaccard
    // join (x02's machinery), sources attached and counted the same way
    val exact = Dedup.ngramJaccard(docs, "text", "doc_id", n = 3,
        threshold = 0.2)
      .select("d1", "d2")
    val src = docs.select(col("doc_id"), col("source"))
    val truth = exact
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      truth.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
  }

  // ---------------------------------------------------------------- a56

  test("a56 basket affinity: every reported pair replays against direct " +
       "basket counts and the lift formula") {
    val out = graft.queries.Analytics.queries("a56_basket_affinity")(spark, sf)
      .collect()
    assert(out.nonEmpty, "sf0.001 must produce at least one supported pair")
    val li = T.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select("ok").distinct().count()
    // spot-check the first and last reported pairs end to end
    Seq(out.head, out.last).foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      val aOrders = li.filter(col("pk") === p1).select("ok")
      val bOrders = li.filter(col("pk") === p2).select("ok")
      val nab = aOrders.intersect(bOrders).count()
      assert(r.getLong(2) === nab && nab >= 3, s"support mismatch: $r")
      assert(r.getLong(3) === aOrders.count() && r.getLong(4) === bOrders.count())
      val lift = nab.toDouble * nOrders / (r.getLong(3) * r.getLong(4))
      assert(r.getDouble(5) === lift, s"lift mismatch: $r")
      assert(p1 < p2)
    }
  }

  // ---------------------------------------------------------------- x85

  test("ngramNovelty: first doc is all-novel, a verbatim copy is " +
       "zero-novel, partial overlap counts exactly the new grams") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: "a b c", "b c d" — both novel
      (2L, "a b c d"),        // exact copy → novelty 0
      (3L, "b c d e f")       // "b c d" seen, "c d e"/"d e f" new → 2/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 0L), (3L, 3L, 2L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 0.0, 2.0 / 3))
  }

  // ---------------------------------------------------------------- a57

  test("a57 retention cohorts: week-0 row counts every cohort member, " +
       "offsets are non-negative, and per-cohort user counts never " +
       "exceed the cohort size") {
    val out = graft.queries.Analytics.queries("a57_retention_cohorts")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val byCohort = out.groupBy(_.getTimestamp(0))
    // independent cohort sizes: distinct users whose first week is wk
    val ev = T.events(spark, sf)
    val firstWk = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("wk"))
      .groupBy("user_id").agg(min("wk").as("cohort_wk"))
      .groupBy("cohort_wk").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    byCohort.foreach { case (wk, rows) =>
      val offsets = rows.map(_.getInt(1))
      assert(offsets.forall(_ >= 0) && offsets.contains(0),
        s"cohort $wk must include its own week 0")
      val w0 = rows.find(_.getInt(1) == 0).get.getLong(2)
      assert(w0 === firstWk(wk),
        s"week-0 count must equal the cohort size for $wk")
      rows.foreach(r => assert(r.getLong(2) <= w0,
        s"retention can never exceed the cohort size: $r"))
    }
  }

  // ---------------------------------------------------------------- x82

  test("x82 cluster mixture: one row per populated cell, kept ≤ in, " +
       "thresholds in [0, buckets], and rare cells keep a HIGHER " +
       "fraction than the dominant cell (the α=0.5 point)") {
    val out = graft.queries.Extensions.queries("x82_cluster_mixture")(spark, sf)
      .collect()
    assert(out.nonEmpty && out.length <= 8, s"at most k=8 cells: ${out.length}")
    out.foreach { r =>
      val (nIn, nKept, thr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nIn, s"kept must not exceed in: $r")
      assert(thr >= 0 && thr <= 10000, s"threshold out of range: $r")
    }
    val byN = out.sortBy(_.getLong(1))
    if (byN.length >= 2 && byN.head.getLong(1) * 2 <= byN.last.getLong(1)) {
      // keep-rate = thr/buckets; sqrt-share gives the rarer stratum the
      // larger keep rate whenever sizes genuinely differ
      assert(byN.head.getLong(3) >= byN.last.getLong(3),
        s"rare cell must keep at a rate ≥ the dominant cell: " +
          s"${byN.head} vs ${byN.last}")
    }
  }
}
