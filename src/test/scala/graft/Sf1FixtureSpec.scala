package graft

/** Pins the sf1 fixture's measured scan fan-out: the whole point of the
  * multi-file layout is that scans stop being 1-task (the sf0.1
  * single-row-group artifact, PERF.md) — assert it, don't assume it.
  */
class Sf1FixtureSpec extends SparkTestBase {

  test("multi-file sf1 fixture scans fan out to >=8 tasks per table") {
    val dir = Fixtures.ensureSf1(spark)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    // same files-per-task ratio a 128 MB-file / 128 MB-split cluster
    // layout gives; see BenchSf1
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    try {
      for (t <- Seq("documents", "embeddings", "lineitem")) {
        val parts = spark.read.parquet(s"$dir/$t.parquet").rdd.getNumPartitions
        assert(parts >= 8, s"$t fanned out to only $parts scan tasks")
      }
      val srcDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
      assert(spark.read.parquet(s"$dir/documents.parquet").count() === srcDocs * 10)
      // FK consistency survives the key shift: every lineitem row still
      // resolves its order in the same copy
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      val dangling = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
      assert(dangling === 0L)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
