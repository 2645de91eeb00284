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
       "count runs scan-side), no cartesian, and the rank window bounds " +
       "the sample before the collect_list") {
    val s = planString(
      graft.queries.Extensions.queries("x109_quantile_sketch")(spark, sf))
    assertNoTextInExchanges(s)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("Window"), s"rank window missing:\n$s")
    // the bounded collect happens AFTER the rank filter: the window's
    // row_number filter appears below the sketch aggregate
    assert(s.contains("row_number"), s)
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
}
