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
