package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-9 operator pins: the estimate-grade KMV profiler (x78b). */
class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("profileApprox is exact below k and carries the plain stats") {
    val df = (1 to 100).map(i => (i.toLong, (i % 10).toLong))
      .toDF("id", "tens")
    val out = Profile.profileApprox(df, Seq(
      "id" -> col("id"), "tens" -> col("tens")), k = 256)
      .orderBy("col_name").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("id", "tens"))
    val id = out(0)
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) === ((100L, 0L, 100L)))
    assert((id.getString(4), id.getString(5)) === (("1", "100")))
    val tens = out(1)
    assert(tens.getLong(3) === 10L, "NDV below k must be exact")
  }

  test("profileApprox counts nulls and keeps them out of min/max") {
    val df = Seq[java.lang.Long](1L, null, 3L, null, 5L).toDF("v")
    val out = Profile.profileApprox(df, Seq("v" -> col("v"))).collect()
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getLong(2) === 2L)
    assert((out(0).getString(4), out(0).getString(5)) === (("1", "5")))
  }

  test("profileApprox estimate lands within the KMV error band above k") {
    val n = 20000L
    val df = spark.range(n).select((col("id") * 2654435761L % 1000003L).as("v"))
    val exact = df.select(countDistinct("v")).head.getLong(0)
    val out = Profile.profileApprox(df, Seq("v" -> col("v")), k = 256).collect()
    val est = out(0).getLong(3)
    // rsd ≈ 1/sqrt(k-2) ≈ 6.3 %; assert a generous 4σ band
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"est=$est exact=$exact")
  }

  test("x87 embedding audit: hand-checked norms, zero flag, min/max") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq(3.0f, 4.0f, 0.0f)),
      (3L, Seq(-2.0f, 0.5f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingAudit(df, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(3, 3, 3))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.0, 25.0, 5.25))
    assert(out.map(_.getBoolean(3)).toSeq === Seq(true, false, false))
    assert(out.map(r => (r.getDouble(4), r.getDouble(5))).toSeq ===
      Seq((0.0, 0.0), (0.0, 4.0), (-2.0, 1.0)))
  }

  test("a58 rolling 7-day active equals the brute-force window on real data") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.Analytics.queries("a58_rolling_active")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // brute force: for every observed day, distinct users with any
    // event in [d-6, d]
    val ud = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val expect = days.map { d =>
      d.toString -> ud.filter { case (_, ed) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
    }.toMap
    assert(got === expect)
  }

  test("profileApprox plans one aggregate pass with NO Expand") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("m"))
    val plan = Profile.profileApprox(df, Seq(
      "id" -> col("id"), "m" -> col("m")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    // the exact profiler DOES expand on multi-NDV specs — the cost x78b exists to avoid
    val exactPlan = Profile.profile(df, Seq(
      "id" -> col("id"), "m" -> col("m")))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }
}
