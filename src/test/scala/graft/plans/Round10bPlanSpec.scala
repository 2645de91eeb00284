package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-10 late additions (a67-a69, x104,
  * x105, st22): the shuffle/broadcast structure each scaladoc claims,
  * asserted on the real sf fixture.
  */
class Round10bPlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a67 changelog compact: ONE hash exchange on the key — the " +
       "last-op window and the per-key op count share the user_id " +
       "partitioning") {
    val s = planString(
      graft.queries.Analytics.queries("a67_changelog_compact")(spark, sf))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(hashEx == 1, s"expected exactly 1 hash exchange:\n$s")
    assert(s.contains("Window"), s)
  }

  test("a68 attribution compare: no cartesian — the interval join keys " +
       "on user_id and the three report arms aggregate over the ranked " +
       "pid domain") {
    val s = planString(
      graft.queries.Analytics.queries("a68_attribution_compare")(spark, sf))
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay keyed on user_id:\n$s")
    assert(s.contains("Window"), s)
  }

  test("a69 k-core peel rides the session-memoized repeat-edge frame " +
       "(fourth consumer — object identity holds across the build)") {
    graft.queries.Analytics.releaseRepeatEdges(spark)
    val e = graft.queries.Analytics.repeatEdges(spark, sf)
    graft.queries.Analytics.queries("a69_kcore_peel")(spark, sf).collect()
    assert(graft.queries.Analytics.repeatEdges(spark, sf) eq e)
  }

  test("a69 k-core peel: CONSTRUCTION runs zero Spark jobs — the " +
       "per-round stats are lazy single-row aggregates unioned into " +
       "the result frame (one action at the caller, not 2·(rounds+1) " +
       "eager driver round-trips)") {
    val sc = spark.sparkContext
    // pre-materialize the session-memoized edge frame outside the window
    graft.queries.Analytics.repeatEdges(spark, sf).count()
    sc.setJobGroup("a69lazy", "a69 lazy-construction pin")
    val df = try {
      val d = graft.queries.Analytics.queries("a69_kcore_peel")(spark, sf)
      // sentinel job: listener events arrive in order, so once this one
      // is visible any construction-time job would be visible too
      // (RDD count — exactly ONE job; a Dataset count is 2 under AQE)
      sc.parallelize(Seq(1)).count()
      d
    } finally sc.clearJobGroup()
    var ids = Array.empty[Int]
    val deadline = System.currentTimeMillis + 15000
    while (ids.length < 1 && System.currentTimeMillis < deadline) {
      Thread.sleep(50)
      ids = sc.statusTracker.getJobIdsForGroup("a69lazy")
    }
    assert(ids.length == 1,
      s"kCorePeel construction ran ${ids.length - 1} eager job(s); " +
      "expected none (only the sentinel)")
    assert(df.collect().length == 4) // rounds 0..3 still evaluate
  }

  test("kCorePeel / minLabelPropagation stay construction-lazy for ALL " +
       "rounds below the checkpoint cadence (rounds=5 < 6), and a " +
       "rounds=9 run past the cadence is CORRECT (the deliberate eager " +
       "checkpoint truncates the exponentially-printed plan — r11 " +
       "ADVICE adjudicated: eager=false is not lazy under AQE, and no " +
       "checkpoint hangs explainString)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))
      .toDF("a", "b")
    edges.count() // settle any scan-side work outside the window
    sc.setJobGroup("cklazy", "checkpoint-cadence lazy pin")
    val (peel, lp) = try {
      val p = graft.operators.Graph.kCorePeel(edges, "a", "b", k = 2,
        rounds = 5)
      val l = graft.operators.Graph.minLabelPropagation(edges, "a", "b",
        rounds = 5)
      sc.parallelize(Seq(1)).count() // sentinel
      (p, l)
    } finally sc.clearJobGroup()
    var ids = Array.empty[Int]
    val deadline = System.currentTimeMillis + 15000
    while (ids.length < 1 && System.currentTimeMillis < deadline) {
      Thread.sleep(50)
      ids = sc.statusTracker.getJobIdsForGroup("cklazy")
    }
    assert(ids.length == 1,
      s"construction ran ${ids.length - 1} eager job(s) at rounds=5; " +
      "expected none (only the sentinel)")
    assert(peel.collect().length == 6) // rounds 0..5 still evaluate
    assert(lp.collect().map(r => r.getLong(1)).forall(_ == 1L)) // one CC
    // past the cadence: construction fires the truncating checkpoint
    // jobs by design; results stay correct and the plan stays printable
    val lp9 = graft.operators.Graph
      .minLabelPropagation(edges, "a", "b", rounds = 9).collect()
    assert(lp9.map(r => r.getLong(1)).forall(_ == 1L))
    val p9 = graft.operators.Graph
      .kCorePeel(edges, "a", "b", k = 2, rounds = 9).collect()
    assert(p9.length == 10)
  }

  test("x104 filtered ann: the label side joins as a BROADCAST onto the " +
       "probed candidates — the index is never re-shuffled for the " +
       "post-filter") {
    val s = planString(
      graft.queries.Extensions.queries("x104_filtered_ann")(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      s"label filter must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x105 feature hash: hashing is scan-side — no exchange carries " +
       "the document text, and the rollup runs over the compressed " +
       "(doc, bucket) domain") {
    val s = planString(
      graft.queries.Extensions.queries("x105_feature_hash")(spark, sf))
    val exLines = s.split('\n').filter(_.contains("Exchange"))
    exLines.foreach { l =>
      assert(!l.contains("text#") && !l.contains(" t#"),
        s"document text crossed an exchange: $l")
    }
    val hashEx = "Exchange hashpartitioning".r.findAllIn(s).size
    // (doc_id, bucket) partial agg + doc_id rollup
    assert(hashEx <= 2, s"expected <=2 hash exchanges:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("st22 outer interval join (batch form): a LEFT OUTER join keyed " +
       "on user_id with the range condition — no cartesian, no " +
       "broadcast nested loop") {
    val s = planString(
      graft.queries.StreamingQ.queries("st22_stream_outer_join")(spark, sf))
    assert(s.contains("LeftOuter"), s"expected left outer join:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }
}
