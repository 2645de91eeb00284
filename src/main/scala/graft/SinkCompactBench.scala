package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the fresh-tail double read in `Sinks.compactIncremental`
  * (r15 verdict task 3): the tail is consumed twice — the
  * touched-partition distinct and the union write. This main built the
  * adjudication that KEPT the double read: the distinct's scan is
  * column-pruned to the partition expression's inputs, while a
  * persist() materializes the full-width tail — measured ~18% SLOWER
  * at the 100 k-row 4-batch shape (see the comment at the
  * compactIncremental call site for the numbers). It builds a
  * sink-shaped tail from the events table (N batch dirs,
  * date-partitioned compaction grain), then times (a) the full
  * `compactIncremental` and (b) the bare double-read sequence replayed
  * with the same public calls — the gap between them is the
  * compactor's own bookkeeping. One JSON line with both timings.
  *
  * Usage: `runMain graft.SinkCompactBench [sfDir] [batches]`
  */
object SinkCompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("sinkbench").toString
    val (out, tgtA, tgtB) = (s"$root/out", s"$root/incA", s"$root/incB")
    val ev = graft.tables.Tables.events(spark, sfDir)
    val n = ev.count()
    // N committed batch dirs, row-sliced by event_id (arrival-shaped)
    (0 until nBatches).foreach { b =>
      ev.filter(pmod(col("event_id"), lit(nBatches.toLong)) === b)
        .write.mode("overwrite").parquet(s"$out/data/batch_id=$b")
      val hfs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$out/_commits"))
      hfs.createNewFile(new org.apache.hadoop.fs.Path(s"$out/_commits/$b"))
    }
    val part = to_date(col("ts")).cast("string")
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // two iterations of [persisted, double-read] on fresh targets; the
    // FIRST iteration is the warmup (JVM, page cache, codegen) and the
    // second is the reported steady state — order bias removed
    def runPersisted(tgt: String): Double = {
      val t0 = System.nanoTime()
      graft.streaming.Sinks.compactIncremental(spark, out, tgt, part)
      (System.nanoTime() - t0) / 1e9
    }
    var touchedN = 0
    def runDoubleRead(tgt: String): Double = {
      val t1 = System.nanoTime()
      val ids = (0 until nBatches).map(_.toLong)
      val fresh = spark.read
        .parquet(ids.map(id => s"$out/data/batch_id=$id"): _*)
        .withColumn("__part", part.cast("string"))
      val touched = fresh.select("__part").distinct()
        .collect().map(_.getString(0))
      touchedN = touched.length
      fresh.write.mode("overwrite").partitionBy("__part")
        .parquet(s"$tgt/pdata/v=${nBatches - 1}")
      (System.nanoTime() - t1) / 1e9
    }
    runPersisted(s"$tgtA-warm"); runDoubleRead(s"$tgtB-warm")
    val persisted = runPersisted(tgtA)
    val doubled = runDoubleRead(tgtB)

    println(s"""{"metric":"sink_compact_tail","rows":$n,"batches":$nBatches,"touched_partitions":$touchedN,"compact_incremental_sec":${fmt(persisted)},"raw_double_read_sec":${fmt(doubled)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
