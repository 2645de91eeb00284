package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-13 fences and fixes: the a82 month-0 divisor guard on a
  * crafted zero-revenue cohort (impossible on the TPC-H-style fixture,
  * where o_totalprice is strictly positive).
  */
class Round13OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cohortRevenueTriangle: a zero-revenue month-0 cohort reads bp " +
       "vs 1 cent instead of dividing by zero") {
    // cohort 2024-01: customer 1 joins with a 0.00 order, spends 5.00
    // in month 1 → rev0 = 0 cents, fenced divisor = 1 → rev_bp = 500*10^4.
    // cohort 2024-02: ordinary positive cohort as the control.
    val orders = Seq(
      (1L, "2024-01-15", 0.0),
      (1L, "2024-02-10", 5.0),
      (2L, "2024-02-03", 10.0),
      (2L, "2024-03-03", 2.5)
    ).toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d")))
    val out = graft.queries.Analytics.cohortRevenueTriangle(orders)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort_m").toString.take(7),
        r.getAs[Int]("offset_m")) ->
        (r.getAs[Long]("rev_cents"), r.getAs[Long]("rev_bp"))).toMap

    // zero-revenue month 0: no exception, bp measured against 1 cent
    assert(out(("2024-01", 0)) === (0L, 0L))
    assert(out(("2024-01", 1)) === (500L, 5000000L))
    // control cohort: ordinary month-0 = 10000 bp, month-1 = 2500 bp
    assert(out(("2024-02", 0)) === (1000L, 10000L))
    assert(out(("2024-02", 1)) === (250L, 2500L))
  }
}
