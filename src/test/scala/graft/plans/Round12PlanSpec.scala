package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-12 sketch-build rework: both
  * bottom-k sketch builders (KMV and quantile) are now typed
  * partial+final aggregates, so the ONLY exchange in a sketch build
  * carries ≤ k rows per key per map task — never the corpus's raw or
  * distinct rows. The former rank-window formulation (whose exchange
  * shipped every (key, h, …) row) must not resurface.
  */
class Round12PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("quantileSketch: partial aggregation below the keyed exchange " +
       "(map-side k-row combine), no rank window, no distinct pass") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val sk = graft.operators.Sketches.quantileSketch(
      df, Seq("source"), col("n_chars"), col("doc_id"))
    val s = planString(sk)
    assert(s.contains("partial_quantilesketchagg"),
      s"partial sketch aggregate missing:\n$s")
    assert(!s.contains("Window") && !s.contains("row_number"),
      s"rank window resurfaced:\n$s")
    // exactly one exchange: the partial→final hash exchange on the key
    val ex = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(ex === 1, s"expected 1 exchange, got $ex:\n$s")
  }

  test("kmvSketch: partial aggregation below the keyed exchange, no " +
       "rank window, and no separate distinct exchange (dedup happens " +
       "inside the k-long buffer)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val sk = graft.operators.Sketches.kmvSketch(
      df, Seq("source"), col("doc_id"))
    val s = planString(sk)
    assert(s.contains("partial_kmvsketchagg"),
      s"partial sketch aggregate missing:\n$s")
    assert(!s.contains("Window") && !s.contains("row_number"), s)
    val ex = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(ex === 1,
      s"expected 1 exchange (no distinct pass), got $ex:\n$s")
  }

  test("a77 inter-arrival quantiles: the sketch arm adds a partial " +
       "aggregate above the cached gaps frame — the only non-cache " +
       "exchanges are the catalog-sized type rollups") {
    val s = planString(graft.queries.Analytics
      .queries("a77_interarrival_quantiles")(spark, sf))
    assert(s.contains("partial_quantilesketchagg"),
      s"map-side sketch combine missing:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a70 rolling KMV: the daily sketch build inside the cache is " +
       "the typed aggregate (partial combine), not distinct + window") {
    val df = graft.queries.Analytics
      .queries("a70_rolling_active_kmv")(spark, sf)
    val s = planString(df)
    // the persistOnce cache prints its build subtree — the typed
    // aggregate must be what's cached
    assert(s.contains("kmvsketchagg"),
      s"typed KMV sketch aggregate missing:\n$s")
    assert(!s.contains("row_number"), s"rank window resurfaced:\n$s")
  }

  test("a79 RFM: the customer rollup is BUILT ONCE (persistOnce) and " +
       "feeds the three sketch arms and the bucket pass; the sketch " +
       "arms are the typed partial aggregate; the 6 edge scalars " +
       "broadcast — no cartesian, no rank window") {
    val df = graft.queries.Analytics
      .queries("a79_rfm_segments")(spark, sf)
    val s = planString(df)
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 4, s"customer rollup must be cached for 4 reads:\n$s")
    assert(s.contains("partial_quantilesketchagg"),
      s"typed sketch arms missing:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastExchange"), s"edges must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("row_number"), s)
  }

  test("a80 CUSUM: exactly TWO hash exchanges — the (type, day) daily " +
       "rollup and the type-keyed windows; the final rollup reuses the " +
       "window partitioning; no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a80_changepoint")(spark, sf))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(hashEx === 2, s"expected 2 hash exchanges, got $hashEx:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a81 rolling quantiles: the daily sketch frame is BUILT ONCE " +
       "(persistOnce, typed partial agg inside) and feeds both the day " +
       "spine and the x7 contribution explode; no cartesian, no rank " +
       "window — the merge explode is calendar-sized") {
    val s = planString(graft.queries.Analytics
      .queries("a81_rolling_quantiles")(spark, sf))
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 2, s"daily sketches must be cached for both reads:\n$s")
    assert(s.contains("quantilesketchagg"),
      s"typed sketch build missing from the cached subtree:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("row_number"), s)
  }

  test("a82 cohort revenue: the orders projection is BUILT ONCE " +
       "(persistOnce) for the cohort min and the join; the triangle is " +
       "cached for the month-0 self-join; no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a82_cohort_revenue")(spark, sf))
    val imr = "InMemoryTableScan".r.findAllIn(s).size
    assert(imr >= 3, s"orders + triangle caches expected:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x117 bloom join prune: the filter BROADCASTS onto the key-" +
       "domain probe (the fact side never shuffles raw rows — its only " +
       "exchange is the key rollup), and the verify join touches the " +
       "bloom-positive slice; no cartesian") {
    val s = planString(graft.queries.Extensions
      .queries("x117_bloom_join_prune")(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      s"bloom filter must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // the only lineitem-derived exchange is the (key, count) rollup —
    // no exchange line carries a lineitem payload column
    s.split('\n').filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("l_quantity") && !l.contains("l_extendedprice"),
        s"fact payload crossed an exchange: $l")
    }
  }

  test("st27 stream CUSUM (batch form): TransformWithState keyed on " +
       "the event type — the keyed shuffle carries (type, epoch-day), " +
       "never the raw timestamp; the CUSUM readout runs above it") {
    val s = planString(graft.queries.StreamingQ
      .queries("st27_stream_cusum")(spark, sf))
    assert(s.contains("TransformWithState"), s)
    val statefulEx = s.split('\n').filter(l =>
      l.contains("Exchange hashpartitioning") &&
      l.contains("REQUIRED_BY_STATEFUL_OPERATOR"))
    assert(statefulEx.nonEmpty, s"stateful exchange missing:\n$s")
    statefulEx.foreach { l =>
      assert(!l.contains("ts#"), s"raw timestamp crossed the keyed shuffle: $l")
    }
    assert(s.contains("Window"), s"CUSUM readout windows missing:\n$s")
  }
}
