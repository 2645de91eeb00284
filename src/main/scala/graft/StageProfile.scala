package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r16): per-stage wall/CPU attribution for one query run.
  * Prints each completed stage's duration, task time, shuffle bytes and
  * the first line of its name/details so hot stages map back to
  * operators. Usage: runMain graft.StageProfile <name> [sfDir] [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: StageProfile <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
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

    case class St(id: Int, dur: Long, taskMs: Long, shufRead: Long,
                  shufWrite: Long, input: Long, nameLine: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          i.name.takeWhile(_ != '\n'))
      }
    })
    // comma-separated names profile several queries in ONE session (the
    // bench's warm regime: earlier queries materialize the shared caches)
    name.split(',').foreach { qn =>
      val fn = SparkEntry.queries(qn)
      (1 to reps).foreach { rep =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener drain
        println(f"== $qn rep$rep total $total%.2f s, ${stages.size} stages ==")
        stages.sortBy(-_.dur).take(15).foreach { s =>
          println(f"  stage ${s.id}%4d  wall ${s.dur / 1e3}%6.2f s  task ${s.taskMs / 1e3}%7.2f s  " +
            f"in ${s.input / 1e6}%7.1f MB  sr ${s.shufRead / 1e6}%7.1f MB  sw ${s.shufWrite / 1e6}%7.1f MB  ${s.nameLine.take(70)}")
        }
      }
    }
    spark.stop()
  }
}
