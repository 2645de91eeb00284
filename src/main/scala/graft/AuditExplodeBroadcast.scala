package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Dev audit: find queries whose STATIC plan broadcasts an explode output.
  *
  * Catalyst's size estimate for `Generate` (explode) reuses the child's
  * estimate — it does not scale by fan-out — so a shingle/band table that
  * is really 10-100x its parent can sneak under
  * `autoBroadcastJoinThreshold`. A static BroadcastHashJoin never reaches
  * AQE's runtime size check (no shuffle exchange to replan around), so at
  * 100 TB the driver would try to collect-and-broadcast a corpus-sized
  * table. This is the trap fixed for x51 (`Dedup.containmentPairs`); this
  * tool sweeps every query for the same shape.
  *
  * Runs with AQE off to expose the static planner's join choice.
  * Usage: runMain graft.AuditExplodeBroadcast [sfDir]
  */
object AuditExplodeBroadcast {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)

    def hasGenerate(p: SparkPlan): Boolean =
      p.collectFirst { case g: GenerateExec => g }.isDefined

    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        plan.foreach {
          case j: BroadcastHashJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left; case BuildRight => j.right
            }
            if (hasGenerate(build)) {
              hits += 1
              println(s"HIT  $name  BroadcastHashJoin builds an explode side:")
              println(build.treeString.linesIterator.take(12).mkString("  ", "\n  ", "\n"))
            }
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left; case BuildRight => j.right
            }
            if (hasGenerate(build)) {
              hits += 1
              println(s"HIT  $name  BroadcastNestedLoopJoin builds an explode side:")
              println(build.treeString.linesIterator.take(12).mkString("  ", "\n  ", "\n"))
            }
          case _ =>
        }
        spark.sharedState.cacheManager.clearCache()
      } catch {
        case e: Throwable =>
          println(s"ERR  $name: ${Option(e.getMessage).getOrElse(e.toString).take(120)}")
      }
    }
    println(s"audit done: $hits broadcast-of-explode sites")
    spark.stop()
  }
}
