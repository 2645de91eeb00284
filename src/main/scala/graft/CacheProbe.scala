package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val name = sys.env.getOrElse("PROBE_QUERY", "x42_trigram_model")
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(f"warmup run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val df = fn(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    df.count()
    println(f"measured run: ${(System.nanoTime()-t0)/1e9}%.2f s")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }
        .filter(s => !s.endsWith("=0")).take(6).mkString(" ")
      println("  " * depth + p.nodeName + "  " + m)
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      kids.foreach(walk(_, depth + 1))
      p match {
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(im.relation.cachedPlan, depth + 1)
        case _ => ()
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
