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

  test("scale-sensitive plan choices hold at sf1 (broadcasts, scan fan-out in-query)") {
    val dir = Fixtures.ensureSf1(spark)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    try {
      // a03's dimension joins must STILL broadcast at 10x data — a
      // broadcast that silently flips to sort-merge is the classic
      // scale-up regression
      val a03 = SparkEntry.queries("a03_join_star")(spark, dir)
      assert(a03.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // x25's eval side is a broadcast too (decontamination's whole
      // scale story: the corpus never shuffles for the semi join)
      val x25 = SparkEntry.queries("x25_decontaminate")(spark, dir)
      assert(x25.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // the x21 pipeline's own scans fan out (not just a bare read):
      // every leaf in the executed plan plans >1 partition. AQE off for
      // this assertion only — AdaptiveSparkPlanExec is itself a leaf
      // node and hides the scans until execution.
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val leafParts =
        try {
          val x21 = queries.Extensions.pipelineDocs(spark, dir, mineSurvivorsOnly = true)
          x21.queryExecution.executedPlan.collectLeaves()
            .map(l => l.nodeName -> l.execute().getNumPartitions)
        } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      assert(leafParts.nonEmpty && leafParts.forall(_._2 > 1),
        s"x21 leaf scans planned $leafParts partitions")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
