package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-9 query surface: the shuffle/
  * broadcast structure each scaladoc claims, asserted on the real sf
  * fixture so a regression (a dropped broadcast, a surprise exchange
  * of text payloads) fails CI instead of only showing up in a bench
  * delta.
  */
class Round9PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a59 last-touch: exactly one hash exchange feeds the window " +
       "(user_id), and the channel rollup partial-aggregates") {
    val s = planString(graft.queries.Analytics.queries("a59_last_touch")(spark, sf))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(s).size
    // one user_id exchange for the window + one channel exchange for
    // the final agg — nothing else
    assert(hashEx <= 2, s"expected <=2 hash exchanges:\n$s")
    assert(s.contains("Window"), s"expected a window operator:\n$s")
  }

  test("a60 triangles: under the edge limit the closing join is a " +
       "BroadcastHashJoin and NO cartesian product appears") {
    val s = planString(
      graft.queries.Analytics.queries("a60_basket_triangles")(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      s"expected broadcast closing/degree joins:\n$s")
    assert(!s.contains("CartesianProduct"), s"cartesian in triangle plan:\n$s")
  }

  test("x88 token-budget mix: the allocation joins as a broadcast and " +
       "the per-source window exchange carries ids+counts, never text") {
    val s = planString(
      graft.queries.Extensions.queries("x88_token_budget_mix")(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast alloc join:\n$s")
    // the window exchange must not ship the raw text column
    val exLines = s.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(exLines.nonEmpty)
    exLines.foreach { l =>
      assert(!l.contains("text"), s"text column crossed an exchange: $l")
    }
  }

  test("st16 bloom probes: position hashing runs below the stateful " +
       "operator (the shuffle carries (doc, pos), not text)") {
    val ds = graft.streaming.DocStreams.bloomFirstSeenProbes(
      graft.tables.Tables.documents(spark, sf), "text", "doc_id")
    val s = planString(ds.toDF())
    // batch lowering of flatMapGroupsWithState is MapGroups
    assert(s.contains("MapGroups") || s.contains("FlatMapGroupsWithState"),
      s"expected keyed state op:\n$s")
    val exLines = s.split('\n').filter(_.contains("Exchange hashpartitioning"))
    exLines.foreach { l =>
      assert(!l.contains("text"), s"text crossed the state shuffle: $l")
    }
  }

  test("st17 streaming KMV: murmur3 hashing is computed before the " +
       "keyed shuffle — the state op sees (type, hash) pairs only") {
    val ds = graft.streaming.EventStreams.statefulKmvDistinct(
      graft.tables.Tables.events(spark, sf))
    val s = planString(ds.toDF())
    assert(s.contains("MapGroups") || s.contains("FlatMapGroupsWithState"),
      s"expected keyed state op:\n$s")
    assert(s.contains("hash(user_id"),
      s"expected scan-side murmur3 below the state op:\n$s")
  }

  test("x89 ann recall: the report join adds no exchange of the " +
       "embedding payloads (arms end in k-row-per-query frames)") {
    val s = planString(
      graft.queries.Extensions.queries("x89_ann_recall")(spark, sf))
    // the final left join runs over (query_id, cand_id) pairs — the
    // embedding column must not appear in any exchange above the arms
    val exLines = s.split('\n').filter(_.contains("Exchange hashpartitioning"))
    exLines.foreach { l =>
      assert(!l.contains("embedding"),
        s"embedding payload crossed a report exchange: $l")
    }
  }
}
