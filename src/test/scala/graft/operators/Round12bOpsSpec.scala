package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12 wave-2 semantics pins: the CUSUM closed form against the
  * textbook recursion, the Bloom pruning no-false-negative law, and
  * the rolling-quantile sketch's error band in the genuine sampling
  * regime (the QueryBoundsSpec x109/x114 discipline applied to a81).
  */
class Round12bOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("CUSUM closed form (prefix sums - running min) equals the " +
       "textbook recursion S_t = max(0, S_{t-1} + n*x_t - T) on random " +
       "series at every step") {
    val rnd = new scala.util.Random(99)
    (1 to 20).foreach { trial =>
      val nDays = 3 + rnd.nextInt(30)
      val xs = Seq.fill(nDays)(1L + rnd.nextInt(50).toLong)
      val total = xs.sum
      // textbook one-sided CUSUM on the n-scaled deviations
      val sRef = xs.scanLeft(0L) { (s, x) =>
        math.max(0L, s + x * nDays - total)
      }.tail
      val daily = xs.zipWithIndex
        .map { case (x, i) =>
          ("t", java.sql.Date.valueOf(java.time.LocalDate
            .ofEpochDay(19000L + i)), x)
        }.toDF("event_type", "d", "x")
      // replicate the query's closed form at per-day granularity
      val wo = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val got = daily
        .withColumn("p", sum(col("x") * lit(nDays) - lit(total)).over(wo))
        .withColumn("s", col("p") - least(min(col("p")).over(wo), lit(0L)))
        .orderBy("d").select("s").as[Long].collect().toSeq
      assert(got == sRef, s"trial $trial: $got vs $sRef (xs=$xs)")
    }
  }

  test("bloom joinPruneReport never false-negatives: on random key " +
       "sets, every true match is bloom-positive (n_match == the exact " +
       "semi-join size) and the counts reconcile") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val smallKeys = Seq.fill(30)(rnd.nextInt(500).toLong).distinct
      val bigRows = Seq.fill(400)(rnd.nextInt(600).toLong)
      val small = smallKeys.toDF("sk")
      val big = bigRows.toDF("bk")
      val r = Bloom.joinPruneReport(big, col("bk"), small, col("sk"),
        k = 2, mBits = 256).collect()(0)
      val trueMatchKeys = bigRows.distinct.toSet
        .intersect(smallKeys.toSet).size.toLong
      assert(r.getAs[Long]("n_match_keys") == trueMatchKeys,
        s"trial $trial: verify must find every true match")
      assert(r.getAs[Long]("n_maybe_keys") >= trueMatchKeys,
        "bloom positives must cover every match (no false negatives)")
      assert(r.getAs[Long]("n_keys") == bigRows.distinct.size.toLong)
      assert(r.getAs[Long]("n_big_rows") == bigRows.size.toLong)
      assert(r.getAs[Long]("n_fp_keys") ==
        r.getAs[Long]("n_maybe_keys") - trueMatchKeys)
    }
  }

  test("bloom joinPruneReport with an EMPTY dimension side: every key " +
       "is bloom-negative, pruning is total, matches and FPs are zero") {
    val big = (1L to 100L).toDF("bk")
    val small = Seq.empty[Long].toDF("sk")
    val r = Bloom.joinPruneReport(big, col("bk"), small, col("sk"),
      k = 2, mBits = 256).collect()(0)
    assert(r.getAs[Long]("n_maybe_keys") == 0L)
    assert(r.getAs[Long]("n_match_keys") == 0L)
    assert(r.getAs[Long]("n_fp_keys") == 0L)
    assert(r.getAs[Long]("pruned_rows") == 100L)
    assert(r.getAs[Long]("prune_bp") == 10000L)
  }

  test("a81-shape rolling sketch quantiles stay within the O(1/sqrt(k)) " +
       "rank band of the exact window percentile in the genuine " +
       "sampling regime (5000 rows/window vs k=256)") {
    import graft.operators.Sketches
    // two 'days', 5000 rows each; window = both days
    val n = 5000
    val d = ((1 to n).map(i => (0, i.toLong, (i % 997).toLong)) ++
      (1 to n).map(i => (1, n + i.toLong, 300L + (i % 997))))
      .toDF("day", "id", "v")
    val daily = Sketches.quantileSketch(d, Seq("day"), col("v"), col("id"))
    val merged = daily.agg(Sketches.quantileMergeSketches(
      collect_list(col("qsketch"))).as("sk"))
    val est = merged.select(
      Sketches.quantileEstimate(col("sk"), 50).as("p50"),
      Sketches.quantileEstimate(col("sk"), 90).as("p90")).head()
    val all = d.select("v").as[Long].collect().sorted
    def exactPct(p: Int): Long = all((all.length * p + 99) / 100 - 1)
    // rank error O(1/sqrt(k)): the value at the estimated rank must sit
    // within 3/sqrt(k) of the target rank's value-CDF position
    Seq((50, est.getLong(0)), (90, est.getLong(1))).foreach {
      case (p, v) =>
        val rankOfV = all.count(_ <= v).toDouble / all.length
        assert(math.abs(rankOfV - p / 100.0) <= 3.0 / math.sqrt(256.0),
          s"p$p: est $v sits at rank $rankOfV (exact ${exactPct(p)})")
    }
  }
}
