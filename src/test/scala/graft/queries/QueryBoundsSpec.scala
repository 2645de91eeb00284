package graft.queries

import graft.SparkTestBase

/** Error-bound assertions for approximate queries whose exact value
  * rides along in the same result.
  */
class QueryBoundsSpec extends SparkTestBase {

  test("a23 approx_count_distinct is within the configured HLL error of the exact count") {
    // approx_count_distinct's default relative standard deviation is 0.05;
    // 3·rsd is a conservative deterministic bound for a fixed input.
    val rows = Analytics.queries("a23_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      val relErr = math.abs(approx - exact) / exact
      info(f"rflag=${r.get(0)} approx=$approx%.0f exact=$exact%.0f relErr=$relErr%.4f")
      assert(relErr <= 0.15, f"HLL estimate off by $relErr%.4f (> 3·rsd)")
    }
  }
}
