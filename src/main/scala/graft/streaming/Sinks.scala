package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed exactly-once micro-batch sinks — the write-side half of
  * the streaming story (st01–st27 are read/transform surfaces; this is
  * how their outputs land durably).
  *
  * Structured Streaming's contract with `foreachBatch` is AT-LEAST-once:
  * after a crash between a batch's execution and its commit-log write,
  * restart re-executes that batch with the SAME `batchId` and (for
  * replayable sources + versioned state stores) the same rows. Exactly-
  * once therefore needs an idempotent sink: this one keys every write
  * by `batchId` and commits it with a create-if-absent marker, so a
  * replayed batch is either skipped (marker present — the crash was
  * after commit) or deterministically overwritten (marker absent — the
  * crash was mid-write), never appended twice.
  *
  * Layout under `outDir`:
  *   data/batch_id=<id>/...parquet   (static-partition overwrite per batch)
  *   _commits/<id>                   (empty marker; atomic create)
  * Readers consume ONLY manifest-committed partitions
  * ([[readCommitted]]), so a half-written batch directory is invisible.
  *
  * 100 TB: one directory per micro-batch is the standard streaming-
  * ingest layout (compaction is a downstream batch job —
  * [[compactCommitted]]); the manifest
  * is O(batches) empty files, listable in one RPC per poll. On object
  * stores without atomic directory rename, pair this with a cloud
  * committer for the data write — the marker commit is a single-file
  * create, atomic on S3/GCS/HDFS alike.
  */
object Sinks {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitMarker(outDir: String, batchId: Long) =
    new Path(s"$outDir/_commits/$batchId")

  /** The `foreachBatch` function: idempotent per-batch parquet write.
    * Pass as `.writeStream.foreachBatch(Sinks.exactlyOnceParquet(dir) _)`
    * with a `checkpointLocation` — the checkpoint provides replay, this
    * sink provides idempotence; exactly-once is the pair.
    */
  def exactlyOnceParquet(outDir: String)(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val hfs = fs(spark, outDir)
    val marker = commitMarker(outDir, batchId)
    if (hfs.exists(marker)) {
      // Replayed batch, crash was AFTER commit: emit nothing — but
      // still DRAIN every partition. Stateful queries commit their
      // state stores through the batch job foreachBatch runs, and
      // Spark 4 validates that all partitions committed
      // (STATE_STORE_COMMIT_VALIDATION_FAILED on an early return).
      System.err.println(s"[sink] batch $batchId already committed — drop")
      df.foreach(_ => ())
      return
    }
    // crash was mid-write (or first attempt): overwrite is idempotent
    df.write.mode("overwrite").parquet(s"$outDir/data/batch_id=$batchId")
    hfs.mkdirs(marker.getParent)
    // atomic create-if-absent; a concurrent committer losing this race
    // would have written identical data (same batchId, same rows)
    hfs.createNewFile(marker)
    ()
  }

  /** Batch ids the manifest records as committed (empty set before the
    * first commit).
    */
  def committedBatches(spark: SparkSession, outDir: String): Set[Long] = {
    val hfs = fs(spark, outDir)
    val dir = new Path(s"$outDir/_commits")
    if (!hfs.exists(dir)) Set.empty
    // tolerate non-marker names (stray temp files, object-store
    // checksum twins): only all-digit names are batch markers
    else hfs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d+")).map(_.toLong).toSet
  }

  /** The exactly-once view: union of manifest-committed batch
    * directories only — a batch directory without its marker (crash
    * mid-write) is invisible until its replay commits it.
    */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val ids = committedBatches(spark, outDir).toSeq.sorted
    require(ids.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(ids.map(id => s"$outDir/data/batch_id=$id"): _*)
  }

  /** Partition directory key a compaction snapshot is laid out by;
    * dropped again on read, so the compacted view's schema equals the
    * sink's.
    */
  private[streaming] val CompactPartCol = "__part"

  /** Batch id the latest compaction snapshot covers through (None
    * before the first compaction). Same all-digit-name discipline as
    * [[committedBatches]].
    */
  def latestCompaction(spark: SparkSession, targetDir: String): Option[Long] = {
    val hfs = fs(spark, targetDir)
    val dir = new Path(s"$targetDir/_manifests")
    if (!hfs.exists(dir)) None
    else hfs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d+")).map(_.toLong)
      .reduceOption(_ max _)
  }

  /** The downstream compaction job [[exactlyOnceParquet]]'s scaladoc
    * defers: rewrite every manifest-committed `batch_id=` partition
    * into ONE partitioned snapshot (typically date-partitioned — pass
    * `to_date(col("ts"))` — so readers prune on time instead of
    * listing O(batches) micro-batch directories), committed by an
    * atomic manifest swap.
    *
    * Restart-safety is the sink's own discipline, one level up:
    *   snapshots/<cut>/__part=<v>/...parquet  (cut = max batch id covered)
    *   _manifests/<cut>                       (empty marker; atomic create)
    * The snapshot directory is keyed by `cut`, so a re-run after a
    * crash mid-compaction overwrites it deterministically and then
    * commits the same marker — convergent; a snapshot without its
    * manifest is invisible to readers (they fall back to the previous
    * manifest, or to the raw committed view before the first one), so
    * a crash mid-compaction never degrades readability. Source batch
    * directories are retained (they are the recovery input and the
    * incremental tail); orphaned manifest-less snapshot directories
    * are dead and GC-able.
    *
    * 100 TB: the swap is a single-file atomic create (object-store
    * safe); readers of an old snapshot keep a consistent view while a
    * new one builds (nothing is rewritten in place). This job rewrites
    * the full committed prefix per run — the bounded-rewrite variant
    * (dynamic partition overwrite of only the dates the new batches
    * touch, with a file-granular manifest) is the Delta/Iceberg design
    * and out of scope here; run compaction on a cadence where full
    * rewrite is acceptable, or cap the source's retained batch count.
    *
    * Returns the cut compacted through (None when nothing is
    * committed); already-compacted-through-cut re-runs are no-ops.
    */
  def compactCommitted(spark: SparkSession, outDir: String,
                       targetDir: String,
                       partition: org.apache.spark.sql.Column): Option[Long] = {
    val ids = committedBatches(spark, outDir)
    if (ids.isEmpty) return None
    val cut = ids.max
    val hfs = fs(spark, targetDir)
    val manifest = new Path(s"$targetDir/_manifests/$cut")
    if (hfs.exists(manifest)) return Some(cut)
    spark.read
      .parquet(ids.toSeq.sorted.map(id => s"$outDir/data/batch_id=$id"): _*)
      .withColumn(CompactPartCol, partition)
      .write.mode("overwrite")
      .partitionBy(CompactPartCol)
      .parquet(s"$targetDir/snapshots/$cut")
    hfs.mkdirs(manifest.getParent)
    hfs.createNewFile(manifest)
    Some(cut)
  }

  /** The reader over a compacted sink: the latest manifest-committed
    * snapshot plus every committed batch directory NEWER than its cut
    * (the incremental tail) — before the first compaction, exactly
    * [[readCommitted]]. Equal to [[readCommitted]] at every point in
    * the compaction lifecycle (certified in SinksSpec, including a
    * crash mid-compaction).
    */
  def readCompactedView(spark: SparkSession, outDir: String,
                        targetDir: String): DataFrame =
    latestCompaction(spark, targetDir) match {
      case None => readCommitted(spark, outDir)
      case Some(cut) =>
        val snap = spark.read.parquet(s"$targetDir/snapshots/$cut")
          .drop(CompactPartCol)
        val newer = committedBatches(spark, outDir).filter(_ > cut).toSeq.sorted
        if (newer.isEmpty) snap
        else snap.unionByName(spark.read.parquet(
          newer.map(id => s"$outDir/data/batch_id=$id"): _*))
    }
}
