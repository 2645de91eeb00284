package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions

/** Document-ingest streaming: near-dup filtering of a document stream
  * against accumulating state — the "dedup the crawl as it arrives"
  * half of the batch dedup family (x19's SimHash banding made
  * streaming). The state split follows [[EventStreams.windowQuantiles]]:
  * the part that must see unbounded input (per-band fingerprint state)
  * runs IN the stream as ONE stateful operator; the cross-band combine
  * is a bounded batch pass over the sink — the hand-off point Spark's
  * single-stateful-operator-per-Update-query rule forces, and the one
  * a production ingest uses anyway (flags land in the bronze table,
  * the combine is the silver view).
  */
object DocStreams {
  /** Per-band dup flags via keyed state: each document's 64-bit SimHash
    * splits into four 16-bit band keys (exactly x19's banding — near-dup
    * fingerprints, Hamming ≤ 3, agree on ≥ 1 whole band by pigeonhole);
    * per (band, key) group the state carries every fingerprint seen, and
    * an arriving doc is flagged against the earliest prior doc within
    * `maxHamming`. Docs enter state whether or not they are dups (a dup
    * of a dup still flags — standard streaming-dedup chaining). In batch
    * each group processes once with rows sorted by doc_id, so "earlier"
    * = smaller id; in a stream it is arrival order, equal whenever the
    * stream arrives in id order (DocStreamsSpec certifies).
    *
    * 100 TB: state is per-(band, bucket) fingerprint lists — 65536·4
    * buckets partition horizontally, each holding only the docs that
    * hashed there (the banding's candidate-volume bound); no all-pairs
    * anything. Output is one row per (doc, band).
    */
  def nearDupBandFlags(docs: DataFrame, textCol: String, idCol: String,
                       maxHamming: Int = 3): Dataset[BandFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val fps = docs.select(col(idCol).cast("long").as("doc_id"),
      GraftFunctions.simhash64(split(lower(col(textCol)), "\\s+")).as("simhash"))
    val banded = fps.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("doc_id"), col("simhash"), col("band").cast("int").as("band"),
        expr("(simhash >>> (band * 16)) & 65535").as("bkey"))
      .as[(Long, Long, Int, Long)]
    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BandBucketState, BandFlag](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[(Long, Long, Int, Long)],
         state: org.apache.spark.sql.streaming.GroupState[BandBucketState]) =>
          val sorted = rows.toSeq.sortBy(_._1)
          var seen = state.getOption.getOrElse(BandBucketState(Vector.empty)).fps
          val out = scala.collection.mutable.ArrayBuffer.empty[BandFlag]
          sorted.foreach { case (id, fp, band, _) =>
            val hits = seen.iterator
              .filter { case (sid, sfp) =>
                sid < id && java.lang.Long.bitCount(sfp ^ fp) <= maxHamming }
              .map(_._1)
            out += BandFlag(id, band,
              if (hits.isEmpty) None else Some(hits.min))
            seen = seen :+ ((id, fp))
          }
          state.update(BandBucketState(seen))
          out.iterator
      }
  }

  /** Cross-band combine of [[nearDupBandFlags]]: one row per doc with
    * the earliest dup partner over any band (`dup_of`, null if unique)
    * and the 0/1 flag. Batch composition; in a streaming deployment
    * this is the bounded pass over the flag sink.
    */
  def nearDupFlags(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame =
    combineBandFlags(nearDupBandFlags(docs, textCol, idCol, maxHamming).toDF())

  /** The combine alone — runs over a live [[nearDupBandFlags]] result or
    * its sink table (same schema).
    */
  def combineBandFlags(flags: DataFrame): DataFrame =
    flags
      .groupBy("doc_id")
      .agg(min(col("dup_of")).as("dup_of"))
      .withColumn("is_dup",
        when(col("dup_of").isNotNull, lit(1)).otherwise(lit(0)))
      .select("doc_id", "dup_of", "is_dup")
}

final case class BandFlag(doc_id: Long, band: Int, dup_of: Option[Long])

final case class BandBucketState(fps: Vector[(Long, Long)])
