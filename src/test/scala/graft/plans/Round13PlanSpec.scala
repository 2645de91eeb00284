package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-13 queries: the session/skyline/
  * seasonality/trend family must keep riding single keyed exchanges,
  * and the novelty/int8 reports must never put raw text or embedding
  * arrays on the wire.
  */
class Round13PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(s: String): Int =
    "Exchange hashpartitioning".r.findAllIn(s).size

  test("a83 sessionize: both session windows AND the session rollup " +
       "ride ONE user_id exchange (the rollup's clustering is satisfied " +
       "by the window partitioning); only the day rollup adds a second") {
    val s = planString(graft.queries.Analytics
      .queries("a83_sessionize")(spark, sf))
    assert("Window".r.findAllIn(s).size >= 2, s"two windows expected:\n$s")
    assert(hashExchanges(s) === 2,
      s"expected exactly 2 hash exchanges (user_id + day):\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a84 pareto frontier: the sweep window and the frontier rank " +
       "share the brand exchange above the distinct-point rollup; no " +
       "cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a84_pareto_frontier")(spark, sf))
    assert("Window".r.findAllIn(s).size >= 2, s)
    // distinct-point agg (brand, price, size) + brand window = 2
    assert(hashExchanges(s) <= 2, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a85 dow seasonality: one 42-cell rollup exchange + one type " +
       "window exchange, nothing else") {
    val s = planString(graft.queries.Analytics
      .queries("a85_dow_seasonality")(spark, sf))
    assert(hashExchanges(s) <= 2, s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a86 daily trend: two partial-aggregatable rollups (calendar " +
       "cells, then per-type OLS sums) — no window, no join") {
    val s = planString(graft.queries.Analytics
      .queries("a86_daily_trend")(spark, sf))
    assert(hashExchanges(s) <= 2, s)
    assert(!s.contains("Window"), s"windowless by design:\n$s")
    assert(!s.contains("Join"), s"no join of any kind expected:\n$s")
  }

  test("x118 novelty curve: shingle text never crosses an exchange — " +
       "the wire carries md5 fingerprints; the max-id frame broadcasts") {
    val s = planString(graft.queries.Extensions
      .queries("x118_novelty_curve")(spark, sf))
    assert(!s.contains("CartesianProduct"), s)
    s.split('\n').filter(_.contains("Exchange")).foreach { l =>
      assert(!l.matches(".*\\bs#\\d.*"),
        s"raw shingle crossed an exchange: $l")
      assert(!l.contains("text#"),
        s"document text crossed an exchange: $l")
    }
  }

  test("x119 int8 recall: both rank windows ride ONE query_id exchange " +
       "and no exchange carries an embedding or quantized array — the " +
       "scored frame drops to 4 scalars before the shuffle") {
    val s = planString(graft.queries.Extensions
      .queries("x119_int8_recall")(spark, sf))
    assert(!s.contains("CartesianProduct"), s)
    assert("Window".r.findAllIn(s).size >= 2, s)
    s.split('\n')
      .filter(l => l.contains("Exchange hashpartitioning") &&
        l.contains("query_id"))
      .foreach { l =>
        assert(!l.contains("embedding#") && !l.contains("qv#") &&
          !l.contains("cv#") && !l.contains("qq#") && !l.contains("cq#"),
          s"vector array crossed the rank exchange: $l")
      }
  }
}
