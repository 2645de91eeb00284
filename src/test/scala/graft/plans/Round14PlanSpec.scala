package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Physical-plan pins for the round-14 queries: the streaming
  * sessionization dual must keep its bounded keyed-state shape, and
  * the one-pass minhash signature build must stay shuffle-free below
  * the banding self-join.
  */
class Round14PlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(s: String): Int =
    "Exchange hashpartitioning".r.findAllIn(s).size

  test("st28 stream sessionize: ONE keyed exchange feeds the stateful " +
       "assignment; the shared daily rollup adds its two aggregation " +
       "exchanges — nothing else, no cartesian") {
    val s = planString(graft.queries.StreamingQ
      .queries("st28_stream_sessionize")(spark, sf))
    assert(s.contains("TransformWithState"), s"keyed-state op expected:\n$s")
    assert(hashExchanges(s) === 3,
      s"expected exactly 3 hash exchanges (user_id keyed shuffle + " +
        s"(user_id, sid) rollup + day rollup):\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("minhash signature build is a scan-side projection: no explode, " +
       "no aggregation, no exchange below the signature table") {
    val docs = graft.tables.Tables.documents(spark, sf)
    val s = planString(graft.operators.Dedup
      .minhashSignatures(docs, "text", "doc_id"))
    assert(hashExchanges(s) === 0,
      s"one-pass build must not shuffle:\n$s")
    assert(!s.contains("Generate"), s"no explode expected:\n$s")
    assert(!s.contains("HashAggregate"), s"no per-lane min agg expected:\n$s")
    assert(s.toLowerCase.contains("minhashsignature"),
      s"the fused expression should appear in the plan:\n$s")
  }
}
