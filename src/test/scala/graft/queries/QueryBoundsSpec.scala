package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Error-bound assertions for approximate queries whose exact value
  * rides along in the same result.
  */
class QueryBoundsSpec extends SparkTestBase {

  private def a23(sfDir: String) =
    Analytics.queries("a23_approx_distinct")(spark, sfDir).collect()

  test("a23 KMV is exact below k distinct values (sf0.001)") {
    // sf0.001 has 200 distinct partkeys per flag < k=256, so the KMV
    // sketch degenerates to the exact distinct count by construction.
    val rows = a23("/root/testdata/sf0.001")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("kmv_parts")) ==
        r.getLong(r.fieldIndex("exact_parts")))
    }
  }

  test("a23 sketches are within their error bounds in estimation regime (sf0.01)") {
    // sf0.01: ~2000 distinct partkeys per flag — KMV estimates with
    // rsd ≈ 1/sqrt(k-2) ≈ 6 % and HLL (m=256, n ≈ 8m) is past its raw-
    // estimate bias zone with rsd ≈ 1.04/sqrt(m) ≈ 6.5 %. 3·rsd bounds.
    val rows = a23("/root/testdata/sf0.01")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      val hll = r.getLong(r.fieldIndex("hll_parts")).toDouble
      val kmv = r.getLong(r.fieldIndex("kmv_parts")).toDouble
      val hllErr = math.abs(hll - exact) / exact
      val kmvErr = math.abs(kmv - exact) / exact
      info(f"rflag=${r.get(0)} exact=$exact%.0f hll=$hll%.0f ($hllErr%.4f) kmv=$kmv%.0f ($kmvErr%.4f)")
      assert(hllErr <= 0.20, f"HLL estimate off by $hllErr%.4f")
      assert(kmvErr <= 0.20, f"KMV estimate off by $kmvErr%.4f")
    }
  }

  test("a41 histogram quantiles are within one grid unit of exact percentiles") {
    val hist = Analytics.queries("a41_quantile_hist")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.tables.Tables.orders(spark, "/root/testdata/sf0.01")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (status, er) =>
      val hr = hist(status)
      // the histogram picks the bucket whose cumulative count reaches
      // rank ceil(q·n) — i.e. the 100-unit bucket CONTAINING the
      // discrete percentile, so it must equal floor(pd/100) exactly
      assert(hr.getLong(1) == math.floor(er.getDouble(1) / 100).toLong,
        s"$status p50: ${hr.getLong(1)} vs ${er.getDouble(1)}")
      assert(hr.getLong(2) == math.floor(er.getDouble(2) / 100).toLong,
        s"$status p90: ${hr.getLong(2)} vs ${er.getDouble(2)}")
    }
  }

  test("a40 exact-moment statistics match Spark's native aggregates") {
    // the closed-form estimators from exact decimal sums must agree
    // with var_samp/stddev_samp/corr (streaming implementations) to
    // float tolerance — the difference is accumulation error only
    val rows = Analytics.queries("a40_stats_agg")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val native = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy(col("l_returnflag").as("rflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    native.foreach { case (flag, nr) =>
      val gr = rows(flag)
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
      assert(close(gr.getDouble(gr.fieldIndex("var_qty")), nr.getDouble(nr.fieldIndex("v"))))
      assert(close(gr.getDouble(gr.fieldIndex("std_qty")), nr.getDouble(nr.fieldIndex("s"))))
      assert(close(gr.getDouble(gr.fieldIndex("corr_qty_price")), nr.getDouble(nr.fieldIndex("c"))))
    }
  }

  test("x109 quantile sketch vs x93 exact quantiles: EQUAL per source " +
       "in the exact regime (sf0.1: 250 docs/source < k=256), the " +
       "error-band companion to a23's exact-below-k") {
    val sf = "/root/testdata/sf0.1"
    val est = graft.queries.Extensions
      .queries("x109_quantile_sketch")(spark, sf)
      .collect().map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    val exact = graft.queries.Extensions
      .queries("x93_length_quantiles")(spark, sf)
      .collect().map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (src, e) =>
      val x = exact(src)
      // below k the sample IS the group, so the sketch percentile is
      // the same order statistic x93 computes exactly
      assert(e.getLong(e.fieldIndex("sample_n")) ==
        e.getLong(e.fieldIndex("n_docs")), s"$src should be exact regime")
      Seq("p25", "p50", "p90", "p99").foreach { p =>
        assert(e.getLong(e.fieldIndex(s"${p}_est")) ==
          x.getLong(x.fieldIndex(p)), s"$src $p")
      }
    }
  }

  test("quantileEstimate boundary pcts (1, 100) match percentile_disc " +
       "in the exact regime — the ⌈n·pct/100⌉ upper-rank convention " +
       "pinned so a refactor can't drift it") {
    import spark.implicits._
    // 100 distinct values in one group, n < k so the sketch IS the
    // group: the estimate must equal the discrete percentile exactly,
    // including both endpoints (pct=1 → first value, pct=100 → max).
    val d = (1 to 100).map(i => (i.toLong, "g", i.toLong * 10))
      .toDF("id", "g", "v")
    val sk = graft.operators.Sketches.quantileSketch(
      d, Seq("g"), col("v"), col("id"))
    val got = sk.select(
      graft.operators.Sketches.quantileEstimate(col("qsketch"), 1).as("p1"),
      graft.operators.Sketches.quantileEstimate(col("qsketch"), 50).as("p50"),
      graft.operators.Sketches.quantileEstimate(col("qsketch"), 100).as("p100"))
      .head()
    // percentile_disc returns double; on discrete long inputs the value
    // is an exact order statistic, so the cast back to long is lossless
    val disc = d.agg(
      expr("CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p1"),
      expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p50"),
      expr("CAST(percentile_disc(1.00) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p100"))
      .head()
    Seq(0, 1, 2).foreach { i =>
      assert(got.getLong(i) == disc.getLong(i),
        s"field $i: sketch ${got.getLong(i)} vs disc ${disc.getLong(i)}")
    }
  }

  test("x114 sketch-KS tracks the exact two-sample KS within the " +
       "sampling-regime band (3/√k) on a genuinely sampled input") {
    import spark.implicits._
    // two sources, 5 000 rows each, shifted distributions: the sketch
    // samples k=256 of each, so this exercises the estimation regime.
    // Exact KS(src, global) is computed in-test from the raw values.
    val n = 5000
    val d = ((1 to n).map(i => (i.toLong, "a", (i % 997).toLong)) ++
      (1 to n).map(i => (n + i.toLong, "b", 400L + (i % 997))))
      .toDF("doc_id", "source", "nc")
    val sk = graft.operators.Sketches.quantileSketch(d, Seq("source"),
      col("nc"), col("doc_id"))
    val glob = sk.agg(graft.operators.Sketches.quantileMergeSketches(
      collect_list(col("qsketch"))).as("gsk"))
    def vals(c: org.apache.spark.sql.Column) =
      transform(c, x => x.getField("v"))
    val gv = glob.select(explode(vals(col("gsk")))).as[Long].collect().sorted
    val all = d.select("nc").as[Long].collect().sorted
    Seq("a", "b").foreach { src =>
      val sv = sk.filter(col("source") === src)
        .select(explode(vals(col("qsketch")))).as[Long].collect().sorted
      val raw = d.filter(col("source") === src)
        .select("nc").as[Long].collect().sorted
      def ks(s1: Array[Long], s2: Array[Long]): Double = {
        val pts = (s1 ++ s2).distinct.sorted
        pts.map { v =>
          val f1 = s1.count(_ <= v).toDouble / s1.length
          val f2 = s2.count(_ <= v).toDouble / s2.length
          math.abs(f1 - f2)
        }.max
      }
      val est = ks(sv, gv)
      val exact = ks(raw, all)
      assert(math.abs(est - exact) <= 3.0 / math.sqrt(256.0),
        s"$src: est $est vs exact $exact")
    }
  }

  test("a23 graft sketches agree with Spark's native HLL++ within combined error") {
    // Cross-check against approx_count_distinct (rsd 0.05 default):
    // native and graft estimates must bracket the same ground truth.
    val li = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag").as("rflag"), col("l_partkey"))
    val native = li.groupBy("rflag")
      .agg(approx_count_distinct(col("l_partkey")).as("native_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    native.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      val nat = r.getLong(r.fieldIndex("native_parts")).toDouble
      assert(math.abs(nat - exact) / exact <= 0.15)
    }
  }
}
