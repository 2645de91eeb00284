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
}
