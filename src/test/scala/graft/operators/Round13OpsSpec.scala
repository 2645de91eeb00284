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

  test("paretoFrontier: dominated points drop, equal-price larger-size " +
       "dominates, duplicate points collapse with a count, and an " +
       "incomparable point survives") {
    val pts = Seq(
      ("B", 100L, 10),  // frontier rk 1 (cheapest, biggest at that price)
      ("B", 100L, 10),  // duplicate of the above → n_parts = 2
      ("B", 100L, 8),   // dominated: same price, smaller size
      ("B", 150L, 9),   // dominated: pricier AND smaller than (100, 10)
      ("B", 200L, 15),  // frontier rk 2: pricier but strictly bigger
      ("B", 250L, 15),  // dominated: same size as rk 2, pricier
      ("C", 999L, 1)    // other group: trivially on its own frontier
    ).toDF("brand", "price_cents", "size")
    val out = graft.queries.Analytics.paretoFrontier(pts).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(out.size === 3)
    assert(out(("B", 1)) === (100L, 10, 2L))
    assert(out(("B", 2)) === (200L, 15, 1L))
    assert(out(("C", 1)) === (999L, 1, 1L))
  }

  test("sessionAssign: a gap of exactly SessionGapUs stays in-session, " +
       "one microsecond more opens a new one; duplicate timestamps " +
       "order by event_id") {
    import graft.queries.Analytics.{sessionAssign, SessionGapUs}
    val base = 1700000000000000L // µs
    val rows = Seq(
      (1L, base, 10L, "view"),
      (1L, base + SessionGapUs, 11L, "view"),          // same session (<=)
      (1L, base + 2 * SessionGapUs + 1, 12L, "purchase"), // new session (>)
      (2L, base, 20L, "view"),
      (2L, base, 21L, "view")                          // same ts: ties on id
    ).toDF("user_id", "tu0", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("tu0")))
      .drop("tu0")
    val out = sessionAssign(rows).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tu")) ->
        r.getAs[Long]("sid"))
    val u1 = out.filter(_._1._1 == 1L).toMap
    assert(u1((1L, base)) === 1L && u1((1L, base + SessionGapUs)) === 1L,
      "gap == SessionGapUs must NOT split the session")
    assert(u1((1L, base + 2 * SessionGapUs + 1)) === 2L,
      "gap > SessionGapUs must split")
    val u2 = out.filter(_._1._1 == 2L).map(_._2)
    assert(u2.length === 2 && u2.forall(_ === 1L),
      "duplicate timestamps stay one session, deterministically ordered")
  }

  test("a86 trend math: the integer OLS slope is exact on a crafted " +
       "series, including a negative trend (div truncates toward zero " +
       "on both engines — measured)") {
    // y = 10 - 2x on days x = 0,1,2 → slope exactly -2 → slope_q = -2·2^20
    val daily = Seq((0L, 10L), (1L, 8L), (2L, 6L))
    val n = daily.size.toLong
    val (sx, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val sxy = daily.map(p => p._1 * p._2).sum
    val sxx = daily.map(p => p._1 * p._1).sum
    val num = (n * sxy - sx * sy) * 1048576L
    val den = n * sxx - sx * sx
    assert(den > 0 && num / den === -2L * 1048576L)
  }
}
