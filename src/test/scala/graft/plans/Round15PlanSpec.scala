package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-15 queries: the temporal enrichment
  * must stay a single keyed shuffle into bounded state, the vocabulary
  * and ABC readouts must ride ONE partition-key exchange for all their
  * window frames plus the rollup, and the chi-square drift must keep
  * its TopK cut and broadcast totals.
  */
class Round15PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(s: String): Int =
    "Exchange hashpartitioning".r.findAllIn(s).size

  test("st29 temporal enrich: ONE user_id keyed exchange feeds the " +
       "stateful operator — no join, no cartesian (the dim side is " +
       "state, not a build table)") {
    val s = planString(graft.queries.StreamingQ
      .queries("st29_temporal_enrich")(spark, sf))
    assert(s.contains("TransformWithState"), s"keyed-state op expected:\n$s")
    assert(hashExchanges(s) === 1,
      s"expected exactly 1 hash exchange (the user_id shuffle):\n$s")
    assert(!s.contains("Join"), s"no join of any kind expected:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x122 vocab concentration: the (source, token) rollup plus ONE " +
       "source exchange carrying rank, cumulative, totals AND the " +
       "final rollup (subset clustering)") {
    val s = planString(graft.queries.Extensions
      .queries("x122_vocab_concentration")(spark, sf))
    assert(hashExchanges(s) === 2,
      s"expected exactly 2 hash exchanges (token rollup + source " +
        s"window/rollup):\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x123 token chi-square: one token rollup exchange (the cached " +
       "vocab cut feeds BOTH consumers); the cut is a TopK " +
       "(TakeOrderedAndProject), never a full sort; the slice totals " +
       "broadcast as a 1-row frame") {
    val df = graft.queries.Extensions
      .queries("x123_token_chisq")(spark, sf)
    val s = planString(df)
    // both consumers read the cached vocab cut; the ONLY shuffle
    // anywhere in the tree (incl. the cache's build plan, which the
    // string prints once per consuming InMemoryTableScan) is the
    // token-keyed rollup
    assert(s.contains("InMemoryTableScan"),
      s"vocab cut should be the shared cache boundary:\n$s")
    val exchanges = s.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("token")),
      s"every hash exchange must carry the token key:\n$s")
    assert(hashExchanges(s) <= 2, // the cache's build plan, printed twice
      s"unexpected extra exchange:\n$s")
    assert(s.contains("TakeOrderedAndProject"),
      s"top-V cut should be a TopK, not a global sort:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"1-row totals should broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("st30 windowed first dedup: ONE keyed exchange (user, type, " +
       "window start — computed scan-side BEFORE the shuffle) feeds " +
       "the stateful operator; no join") {
    val s = planString(graft.queries.StreamingQ
      .queries("st30_window_first_dedup")(spark, sf))
    assert(s.contains("TransformWithState"), s"keyed-state op expected:\n$s")
    assert(hashExchanges(s) === 1,
      s"expected exactly 1 hash exchange (the keyed shuffle):\n$s")
    assert(!s.contains("Join"), s"no join of any kind expected:\n$s")
  }

  test("x124 dedup audit: rides the session-memoized cluster-label " +
       "cache (InMemoryTableScan); content-hash rollup + source rollup " +
       "are the only hash exchanges; no cartesian") {
    val s = planString(graft.queries.Extensions
      .queries("x124_dedup_audit")(spark, sf))
    assert(s.contains("InMemoryTableScan"),
      s"the shared clusterLabels cache should feed the audit:\n$s")
    assert(hashExchanges(s) <= 3, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x125 spearman: both rank windows AND the rollup ride ONE " +
       "source exchange; the metrics are scan-side (no token shuffle)") {
    val s = planString(graft.queries.Extensions
      .queries("x125_spearman")(spark, sf))
    assert(hashExchanges(s) === 1,
      s"expected exactly 1 hash exchange (the source window/rollup):\n$s")
    assert(!s.contains("Generate"),
      s"metrics are array-level, no explode expected:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a89 segment migration: both ntile windows partition by nation; " +
       "the dim joins broadcast at this SF; five hash exchanges (two " +
       "period rollups, two nation windows, the matrix rollup)") {
    val s = planString(graft.queries.Analytics
      .queries("a89_segment_migration")(spark, sf))
    assert("hashpartitioning\\(nk".r.findAllIn(s).size >= 2,
      s"both ntile windows should partition by nk:\n$s")
    assert(hashExchanges(s) <= 5, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("st31 gap profile: ONE user_id keyed exchange into the " +
       "stateful operator; no join") {
    val s = planString(graft.queries.StreamingQ
      .queries("st31_gap_profile")(spark, sf))
    assert(s.contains("TransformWithState"), s"keyed-state op expected:\n$s")
    assert(hashExchanges(s) === 1,
      s"expected exactly 1 hash exchange (the user_id shuffle):\n$s")
    assert(!s.contains("Join"), s"no join of any kind expected:\n$s")
  }

  test("a90 reconciliation: one orderkey-partial rollup, one order-key " +
       "join, one priority rollup — no window, no cartesian") {
    val s = planString(graft.queries.Analytics
      .queries("a90_order_reconciliation")(spark, sf))
    assert(hashExchanges(s) <= 4, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("Window"), s)
  }

  test("x126 bpe compression: the encode is a scan-side fold (no " +
       "explode of the stream), one doc_id join, one source rollup") {
    val s = planString(graft.queries.Extensions
      .queries("x126_bpe_compression")(spark, sf))
    assert(hashExchanges(s) <= 4, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x127 minhash calibration: rides the session-cached signature " +
       "and shingle-set frames; banding-bounded candidates, never " +
       "all-pairs (no cartesian)") {
    val s = planString(graft.queries.Extensions
      .queries("x127_minhash_calibration")(spark, sf))
    assert(s.contains("InMemoryTableScan"),
      s"the shared signature/set caches should feed the audit:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a88 ABC pareto: the parts dim broadcasts into the lineitem " +
       "scan; rank, cumulative, brand totals and the class rollup ride " +
       "the (brand, part) rollup + ONE brand exchange") {
    val s = planString(graft.queries.Analytics
      .queries("a88_abc_pareto")(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      s"parts dim should broadcast:\n$s")
    assert(hashExchanges(s) === 2,
      s"expected exactly 2 hash exchanges ((brand, part) rollup + " +
        s"brand window/rollup):\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }
}
