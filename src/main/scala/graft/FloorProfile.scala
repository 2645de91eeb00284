package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r16 optimization round): split a query's bench-visible cost
  * into (relation resolve, DataFrame build, planning, execution) so the
  * per-query fixed floor is attributed before optimizing it.
  * Usage: runMain graft.FloorProfile [sfDir] [reps] [name...]
  */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val names = if (args.length > 2 && args(2) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 2) args.drop(2).toSeq
      else Seq("x128_length_filter", "a01_agg_pricing", "p07_count_rows")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    SparkEntry.entry(spark).count() // warmup

    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1. bare relation resolve (footer read + file index)
    val tRead = (1 to reps).map(_ => time(spark.read.parquet(s"$sfDir/documents.parquet")))
    println(f"[floor] read.parquet resolve: med ${med(tRead)}%.4f s")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val tBuild = (1 to reps).map(_ => time(fn(spark, sfDir)))
      val df = fn(spark, sfDir)
      val tPlan = (1 to reps).map { _ =>
        val fresh = fn(spark, sfDir)
        time(fresh.queryExecution.executedPlan)
      }
      val tExec = (1 to reps).map(_ => time(df.count()))
      val tFull = (1 to reps).map(_ => time(fn(spark, sfDir).count()))
      println(f"[floor] $name: build ${med(tBuild)}%.4f  plan ${med(tPlan)}%.4f  " +
        f"execOnPrebuilt ${med(tExec)}%.4f  full ${med(tFull)}%.4f s")
    }
    spark.stop()
  }
}
