package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-11 additions: the quantile sketch
  * query pair (x109/st24) — the shuffle carries the compact (source,
  * hash, id, len) projection, never document text, and the sketch
  * build bounds per-key state to k rows before any collect.
  */
class Round11PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertNoTextInExchanges(s: String): Unit =
    s.split('\n').filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("text#") && !l.contains(" t#"),
        s"document text crossed an exchange: $l")
    }

  test("x109 quantile sketch: text never crosses an exchange (tokenize-" +
       "count runs scan-side), no cartesian, and the sketch build is the " +
       "round-12 partial+final typed aggregate (no rank window anywhere)") {
    val s = planString(
      graft.queries.Extensions.queries("x109_quantile_sketch")(spark, sf))
    assertNoTextInExchanges(s)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("partial_quantilesketchagg"),
      s"map-side sketch combine missing:\n$s")
    assert(!s.contains("row_number"), s"rank window resurfaced:\n$s")
  }

  test("x110 skipping report: no cartesian, and each layout's bin-stats " +
       "frame is BUILT ONCE and cache-shared across its three predicate " +
       "arms (persistOnce on the footer-stats aggregate)") {
    val df =
      graft.queries.Extensions.queries("x110_skipping_report")(spark, sf)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    // 9 report arms over 3 layouts: the stats subtrees resolve to
    // InMemoryRelation scans, not 9 re-computed window+agg chains
    // (each InMemoryTableScan prints its cached child — including the
    // ntile window — so count the cache scans, not raw Window hits)
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 9, s"expected >=9 cached stats scans, got $imr:\n$s")
  }

  test("st24 stream quantile (batch form): the stateful operator sees " +
       "only the compact projection — hashing and token counts are " +
       "computed BEFORE the keyed shuffle") {
    val s = planString(
      graft.queries.StreamingQ.queries("st24_stream_quantile")(spark, sf))
    assertNoTextInExchanges(s)
    assert(s.contains("TransformWithState"),
      s"expected the modern stateful operator:\n$s")
    // the keyed shuffle is the compact projection, not the document
    assert(s.contains("REQUIRED_BY_STATEFUL_OPERATOR"), s)
  }

  test("a73 rolling anomaly: exactly ONE user_id exchange (the ordered " +
       "window), the event_type rollup is partial-aggregatable, no " +
       "cartesian") {
    val s = planString(
      graft.queries.Analytics.queries("a73_anomaly_zscore")(spark, sf))
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(s).size
    assert(userEx === 1, s"expected 1 user_id exchange, got $userEx:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("partial_count") || s.contains("HashAggregate"), s)
  }

  test("a74 drift: nothing shuffles at event cardinality — the bounds " +
       "pass broadcasts, the count pass exchanges only the |types|-" +
       "sized rollup (no user_id/event_id partitioning anywhere)") {
    val s = planString(
      graft.queries.Analytics.queries("a74_dist_drift")(spark, sf))
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastExchange"), s"bounds must broadcast:\n$s")
    assert(!s.contains("hashpartitioning(user_id") &&
      !s.contains("hashpartitioning(event_id"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a75 top paths: the rank window and the per-user path agg share " +
       "ONE user_id exchange; the path rollup is its own (bounded-" +
       "domain) exchange") {
    val s = planString(
      graft.queries.Analytics.queries("a75_top_paths")(spark, sf))
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(s).size
    assert(userEx === 1, s"expected 1 user_id exchange, got $userEx:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x111 CMS join size: the tagged (user, side) projection is " +
       "BUILT ONCE (persistOnce) and feeds both the grid pass and the " +
       "exact arm; the 2·d·w grid join broadcasts") {
    val df =
      graft.queries.Extensions.queries("x111_join_size_cms")(spark, sf)
    val s = planString(df)
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"expected the tagged frame cached for both arms:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"grid join must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x112 typo pairs: document text never crosses an exchange (the " +
       "corpus collapses to its vocabulary scan-side), the vocabulary " +
       "is cached for both join sides, and the candidate join is an " +
       "equi-join — no cartesian") {
    val df = graft.queries.Extensions.queries("x112_typo_dedup")(spark, sf)
    val s = planString(df)
    assertNoTextInExchanges(s)
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"vocab must be cached for both variant sides:\n$s")
  }

  test("x113 outlier fences: the catalog-sized fence frame BROADCASTS " +
       "onto the corpus scan (the corpus is never re-shuffled for the " +
       "flag), and the sketch build carries one source exchange") {
    val df =
      graft.queries.Extensions.queries("x113_outlier_fences")(spark, sf)
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s"fence join must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("st25 stream anomaly (batch form): runs on TransformWithState " +
       "with the compact five-column projection keyed on the user") {
    val s = planString(
      graft.queries.StreamingQ.queries("st25_stream_anomaly")(spark, sf))
    assert(s.contains("TransformWithState"), s)
    assert(s.contains("REQUIRED_BY_STATEFUL_OPERATOR"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a77 inter-arrival quantiles: the gaps frame is BUILT ONCE " +
       "(persistOnce) and feeds both the sketch and the exact count; " +
       "no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a77_interarrival_quantiles")(spark, sf))
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"gaps frame must be cached for both arms:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x115 cluster profile: rides the session-memoized clusterLabels " +
       "+ bandedPairs frames — the rollup adds NO new corpus scan " +
       "(every leaf is a cache read), no cartesian") {
    val df = graft.queries.Extensions
      .queries("x115_cluster_profile")(spark, sf)
    val s = planString(df)
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"expected memoized label+pair scans:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // (InMemoryTableScan nodes print their cached BUILD subtree, so
    // FileScan lines appear in the text — the profile's own leaves are
    // the two cache reads above.)
  }

  test("a78 funnel latency: the funnelTimes frame is BUILT ONCE " +
       "(persistOnce) under both hop projections and both arms; no " +
       "cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a78_funnel_latency_quantiles")(spark, sf))
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 4, s"funnelTimes must be cached for all 4 reads:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x116 threshold sweep: the verified-pair frame is the memoized " +
       "bandedPairs cache, the 8-row threshold spine broadcasts, and " +
       "no corpus-shaped join appears") {
    val s = planString(graft.queries.Extensions
      .queries("x116_threshold_sensitivity")(spark, sf))
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"expected the memoized pair cache:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastExchange"), s"spine must broadcast:\n$s")
  }

  test("a76 Gini: exactly TWO hash exchanges — the (type, user) count " +
       "agg and the type-keyed rank window; the final rollup reuses " +
       "the window's partitioning") {
    val s = planString(
      graft.queries.Analytics.queries("a76_activity_gini")(spark, sf))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(hashEx === 2, s"expected 2 hash exchanges, got $hashEx:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x114 KS drift: document text never enters the plan (3-column " +
       "scan), the global sketch BROADCASTS onto the source spine, and " +
       "everything past the sketch build is catalog-sized") {
    val df = graft.queries.Extensions.queries("x114_ks_drift")(spark, sf)
    val s = planString(df)
    assertNoTextInExchanges(s)
    assert(s.contains("BroadcastExchange"),
      s"global sketch must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("st26 CMS grid (batch form): TransformWithState keyed on the " +
       "grid CELL — the keyed shuffle carries (r, pos, side), never " +
       "the raw user key (cmsSlices runs scan-side); the tagged frame " +
       "is cache-shared with the exact arm") {
    val df = graft.queries.StreamingQ.queries("st26_stream_cms")(spark, sf)
    val s = planString(df)
    assert(s.contains("TransformWithState"), s)
    // the STATEFUL operator's keyed shuffle is on the grid cell, not
    // the raw user key (the exact arm's own user_id agg exchange is
    // legitimate and separate)
    val statefulEx = s.split('\n')
      .filter(l => l.contains("Exchange hashpartitioning") &&
        l.contains("REQUIRED_BY_STATEFUL_OPERATOR"))
    assert(statefulEx.nonEmpty, s"stateful exchange missing:\n$s")
    statefulEx.foreach { l =>
      assert(!l.contains("user_id#"),
        s"raw key crossed the stateful exchange: $l")
    }
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"tagged frame must be cached for both arms:\n$s")
  }
}
