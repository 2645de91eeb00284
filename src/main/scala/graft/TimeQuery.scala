package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc timing harness for individual queries:
  * `runMain graft.TimeQuery <sfDir> <reps> <name> [<name> ...]`.
  *
  * Names resolve from SparkEntry.queries, plus two pseudo-queries for
  * the x21 mining-strategy A/B (`x21_full`, `x21_survivors`) so the
  * variant trade can be re-measured without editing the query map.
  * Each rep runs in a FRESH session-state (cleared cache) so reps are
  * comparable cold runs; per-rep seconds print one line per query.
  * Pass `--no-clear` as the first name to keep caches across queries
  * and reps — that measures the in-session shared-cache regime the
  * bench suite runs in (query order then matters, by design).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQuery <sfDir> <reps> [--no-clear] <name>...")
    val (sfDir, reps) = (args(0), args(1).toInt)
    val noClear = args(2) == "--no-clear"
    val names = args.drop(if (noClear) 3 else 2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    def resolve(name: String): (SparkSession, String) => DataFrame = name match {
      case "x21_full" => (s, d) => queries.Extensions.pipelineDocs(s, d, mineSurvivorsOnly = false)
      case "x21_survivors" => (s, d) => queries.Extensions.pipelineDocs(s, d, mineSurvivorsOnly = true)
      // collapse-vs-direct A/B handles (builder-side; the driver surface
      // always runs the collapsed defaults)
      case "x37_direct" => (s, d) => operators.Dedup.fuzzyPairs(
        graft.tables.Tables.documents(s, d), "text", "doc_id",
        collapseExactDups = false)
      case "x19_direct" => (s, d) => operators.Dedup.simhashCandidates(
        graft.tables.Tables.documents(s, d), "text", "doc_id",
        collapseExactDups = false)
      case "x02_direct" => (s, d) => operators.Dedup.ngramJaccard(
        graft.tables.Tables.documents(s, d), "text", "doc_id",
        n = 3, threshold = 0.2, collapseExactDups = false)
      case "x20_direct" => (s, d) => operators.Dedup.bandedJaccardMinhash(
        graft.tables.Tables.documents(s, d), "text", "doc_id",
        n = 3, threshold = 0.2, numHashes = 16, bands = 8,
        collapseExactDups = false)
      case q => SparkEntry.queries(q)
    }
    // warmup codegen/classloading on the flagship
    SparkEntry.entry(spark).count()
    names.foreach { name =>
      val fn = resolve(name)
      val times = (1 to reps).map { _ =>
        if (!noClear) Caches.clearAll(spark) // cold per rep by default
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"TIMEQ $name " + times.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
