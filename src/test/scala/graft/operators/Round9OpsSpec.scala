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
