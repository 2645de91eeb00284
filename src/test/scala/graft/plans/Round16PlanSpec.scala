package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-16 queries: the watermark audit's
  * frontier must broadcast (never shuffle the fact side) with its
  * running-max window over the BATCH rollup only, the concentration
  * readout must ride one nation exchange for window + rollup, the
  * redundancy histogram must keep its map-side pair-dedup, and the
  * streaming dedup audit must stay banded (no cartesian).
  */
class Round16PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(s: String): Int =
    "Exchange hashpartitioning".r.findAllIn(s).size

  test("st32 watermark audit: the frontier BROADCASTS back to the fact " +
       "scan (BroadcastHashJoin — the orders side never shuffles for " +
       "it); the running-max window sits over the per-batch rollup, " +
       "not the fact table; 2 hash exchanges (batch rollup + priority " +
       "rollup)") {
    val s = planString(graft.queries.StreamingQ
      .queries("st32_watermark_audit")(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      s"frontier should broadcast into the fact scan:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
    assert(hashExchanges(s) === 2,
      s"expected exactly 2 hash exchanges (batch + priority rollups):\n$s")
    // the window's input is the b-keyed aggregate — the single
    // partition it needs holds #batches rows, never the fact table
    assert("Window .*\n.*Sort".r.findFirstIn(s).isDefined ||
      s.contains("Window"), s)
  }

  test("st33 streaming dedup audit: banded candidates (no cartesian, " +
       "no all-pairs) — every join is band-key, content-hash or doc_id " +
       "keyed; the rollup is partial+final") {
    val s = planString(graft.queries.StreamingQ
      .queries("st33_dedup_audit")(spark, sf))
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"an unkeyed join would be the all-pairs smell:\n$s")
    assert(hashExchanges(s) <= 6, s"unexpected extra exchange:\n$s")
  }

  test("a91 supplier concentration: supplier + nation dims broadcast; " +
       "the rank window AND the nation rollup ride ONE nation exchange " +
       "(subset clustering) on top of the suppkey rollup — 2 hash " +
       "exchanges total") {
    val s = planString(graft.queries.Analytics
      .queries("a91_supplier_concentration")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(s).size === 2,
      s"both dims should broadcast:\n$s")
    assert(hashExchanges(s) === 2,
      s"expected exactly 2 hash exchanges (suppkey rollup + nation " +
        s"window/rollup):\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("a93 trade matrix: no window anywhere; dims broadcast (5 " +
       "broadcast joins at this SF); the matrix rollup is the only " +
       "hash exchange; no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a93_trade_matrix")(spark, sf))
    assert(!s.contains("Window"), s"no window expected:\n$s")
    assert("BroadcastHashJoin".r.findAllIn(s).size === 5,
      s"all five joins should broadcast at sf0.001:\n$s")
    assert(hashExchanges(s) === 1,
      s"the matrix rollup should be the only hash exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a94 repeat purchase: ONE (custkey, partkey) window exchange — " +
       "fine-grained keys, never a priority-sized partition — plus the " +
       "brand rollup; part dim broadcasts; no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a94_repeat_purchase")(spark, sf))
    assert(s.contains("Window"), s)
    assert("Exchange hashpartitioning\\(o_custkey".r.findFirstIn(s)
      .isDefined, s"window should shuffle on (custkey, partkey):\n$s")
    assert(hashExchanges(s) <= 2, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x128 code detect / x129 numeric density: pure scan-side " +
       "counting — ONE source rollup exchange, no join, no HOF-free " +
       "regression to UDFs") {
    for (q <- Seq("x128_code_detect", "x129_numeric_density")) {
      val s = planString(graft.queries.Extensions.queries(q)(spark, sf))
      assert(hashExchanges(s) === 1,
        s"$q: the source rollup should be the only hash exchange:\n$s")
      assert(!s.contains("Join"), s"$q: no join expected:\n$s")
      assert(!s.toLowerCase.contains("batchevalpython") &&
        !s.contains("ScalaUDF"), s"$q: no UDF expected:\n$s")
    }
  }

  test("x130 dedup token savings: rides the session-memoized cluster-" +
       "label cache (InMemoryTableScan); scan-side token counts; no " +
       "cartesian") {
    val s = planString(graft.queries.Extensions
      .queries("x130_dedup_token_savings")(spark, sf))
    assert(s.contains("InMemoryTableScan"),
      s"the shared clusterLabels cache should feed the rollup:\n$s")
    assert(hashExchanges(s) <= 3, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x131 langid margin: pure scan-side hit counting — ONE source " +
       "rollup exchange, no join") {
    val s = planString(graft.queries.Extensions
      .queries("x131_langid_margin")(spark, sf))
    assert(hashExchanges(s) === 1,
      s"the source rollup should be the only hash exchange:\n$s")
    assert(!s.contains("Join"), s"no join expected:\n$s")
  }

  test("x132 dedup quality bias: rides the cluster-label cache " +
       "(InMemoryTableScan); quality flags scan-side; no cartesian") {
    val s = planString(graft.queries.Extensions
      .queries("x132_dedup_quality_bias")(spark, sf))
    assert(s.contains("InMemoryTableScan"),
      s"the shared clusterLabels cache should feed the cross-tab:\n$s")
    assert(hashExchanges(s) <= 3, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a95 trade balance: ONE pass over the a93 join tree (exactly 5 " +
       "broadcast joins — the flow split is a scan-side explode, never " +
       "a second join branch), one nation rollup, no window") {
    val s = planString(graft.queries.Analytics
      .queries("a95_trade_balance")(spark, sf))
    assert(!s.contains("Window"), s)
    assert(!s.contains("CartesianProduct"), s)
    assert("BroadcastHashJoin".r.findAllIn(s).size === 5,
      s"the join tree must appear ONCE (a doubled branch would show " +
        s"10 broadcast joins):\n$s")
    assert(s.contains("Generate"), s"flow split should be an explode:\n$s")
    assert(hashExchanges(s) === 1,
      s"the nation rollup should be the only hash exchange:\n$s")
  }

  test("a92 supplier redundancy: the pair-dedup is a MAP-SIDE partial " +
       "before its exchange (repeat shipments never hit the wire); " +
       "keyed exchanges only, part join off the dim base") {
    val df = graft.queries.Analytics
      .queries("a92_supplier_redundancy")(spark, sf)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(hashExchanges(s) <= 4, s"unexpected extra exchange:\n$s")
    // partial-aggregate BELOW the first exchange = the map-side dedup
    val firstExchange = s.indexOf("Exchange hashpartitioning")
    assert(s.indexOf("HashAggregate", firstExchange) > 0, s)
  }
}
