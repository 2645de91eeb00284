package graft.queries

import graft.SparkTestBase
import org.apache.spark.storage.StorageLevel

/** The session-memoized banded-pair frame shared by x20, x84, and the
  * cluster-label chain (r8 verdict ask 5): the sharing used to be two
  * textually identical `bandedJaccardMinhash` call sites converging via
  * canonical-plan caching — load-bearing for the bench but silently
  * breakable by a parameter drift at either site. `Extensions.bandedPairs`
  * makes it an object identity; these pins keep it one.
  */
class SharedSubtreeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bandedPairs memoizes per (session, dir) and persists") {
    Extensions.releaseBandedPairs(spark)
    val a = Extensions.bandedPairs(spark, sf)
    val b = Extensions.bandedPairs(spark, sf)
    assert(a eq b, "second call must return the memoized frame")
    assert(a.storageLevel != StorageLevel.NONE, "pair frame must be persisted")
    assert(a.columns.contains("d1") && a.columns.contains("d2"))
  }

  test("x20 and x84 consume the one frame and stay mutually consistent") {
    val pairs = Extensions.bandedPairs(spark, sf)
    val x20 = Extensions.queries("x20_banded_jaccard")(spark, sf).collect()
    val x84 = Extensions.queries("x84_source_overlap")(spark, sf).collect()
    assert(x20.length === pairs.count())
    // every x20 pair lands in exactly one unordered source bucket
    assert(x84.map(_.getLong(2)).sum === x20.length.toLong)
  }

  test("releaseBandedPairs unpersists and drops the memo") {
    val a = Extensions.bandedPairs(spark, sf)
    Extensions.releaseBandedPairs(spark)
    assert(a.storageLevel === StorageLevel.NONE, "release must unpersist")
    val c = Extensions.bandedPairs(spark, sf)
    assert(!(a eq c), "release must drop the memo so the next call rebuilds")
    Extensions.releaseBandedPairs(spark)
  }
}
