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

  test("x120 pii scan: pure scan-side regexes — zero hash exchanges, " +
       "no join (the broadcastless shape); only the dump orderBy " +
       "range-partitions") {
    val s = planString(graft.queries.Extensions
      .queries("x120_pii_scan")(spark, sf))
    assert(hashExchanges(s) === 0, s"scan-side only:\n$s")
    assert(!s.contains("Join"), s"no join of any kind expected:\n$s")
  }

  test("x121 boilerplate: every exchange carries md5 fingerprints or " +
       "doc ids, never shingle text — and the df build + join + doc " +
       "rollup stay within 3 hash exchanges") {
    val df = graft.queries.Extensions
      .queries("x121_boilerplate_ngrams")(spark, sf)
    val s = planString(df)
    assert(hashExchanges(s) <= 3, s"unexpected extra exchange:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // the raw shingle column 's' must not appear in any exchange row
    // (md5 happens before the first shuffle)
    val exchanges = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    exchanges.foreach { line =>
      assert(!line.matches(".*hashpartitioning\\(s#.*"),
        s"shingle text on the wire:\n$line")
    }
  }

  test("a87 rfm: all three ntile windows share ONE nationkey exchange; " +
       "the segment rollup rides the nk clustering (subset " +
       "partitioning) — custkey agg + dim join + window = 3 exchanges") {
    val s = planString(graft.queries.Analytics
      .queries("a87_rfm_segments")(spark, sf))
    assert("Window".r.findAllIn(s).size >= 3, s"three window specs:\n$s")
    // 2 at dim-broadcast SFs (o_custkey rollup + nk window); a shuffled
    // customer join adds at most one more at scale
    assert(hashExchanges(s) <= 3,
      s"expected ≤3 hash exchanges (o_custkey rollup + optional " +
        s"customer join side + ONE shared nk window):\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }
}
