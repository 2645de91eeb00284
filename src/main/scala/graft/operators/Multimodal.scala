package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque binary
  * columns with typed metadata; decode / feature-extraction runs as a
  * typed mapPartitions stage (one decoder instantiation per partition,
  * batched iteration — the Scala analog of an arrow-batched UDF).
  *
  * The actual byte decoding is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] derives deterministic fake features from
  * the payload bytes. The Spark-side contract — schema, binary transport,
  * per-partition batching, feature schema — is real and tested; swapping
  * in a real decoder is a one-class change.
  *
  * Scale notes: payload columns are only scanned when selected (parquet
  * column pruning keeps blobs untouched for metadata-only queries);
  * decode parallelism is the scan partitioning — control batch size with
  * spark.sql.files.maxPartitionBytes, not code.
  */
object Multimodal {

  /** A media row: opaque payload + routing metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; fields a real image/audio decoder would emit. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      n_frames: Int,
      sample_rate: Int,
      checksum: Long)

  /** Per-partition decoder contract (instantiated once per partition —
    * the place a real implementation would open codecs / native handles).
    */
  trait Decoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Partial
  }

  object MediaFeatures {
    /** Decoder output before ids are re-attached. */
    case class Partial(byteLen: Int, nFrames: Int, sampleRate: Int, checksum: Long)
  }

  /** Deterministic stand-in for a real codec: features derived from the
    * bytes themselves. A real decoder (JPEG dims, PCM sample rate, video
    * frame sampling) plugs in here.
    */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Partial = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      MediaFeatures.Partial(
        byteLen = payload.length,
        nFrames = payload.length / 1024 + 1,
        sampleRate = 16000,
        checksum = sum)
    }
  }

  /** A sampled "frame": offset into the payload + a deterministic
    * checksum of its bytes (a real video pipeline would emit decoded
    * frame tensors; the Spark-side shape — explode to one row per
    * sampled frame — is the real contract).
    */
  case class FrameSample(doc_id: Long, frame_idx: Int, offset: Int, checksum: Long)

  /** STUB frame sampling: every `frameBytes` window of the payload is a
    * "frame"; sample every `everyN`-th. Deterministic from the bytes.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int = 256,
                   everyN: Int = 4): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val n = math.max(1, r.payload.length / frameBytes)
      (0 until n by everyN).map { i =>
        val from = i * frameBytes
        val until = math.min(r.payload.length, from + frameBytes)
        var sum = 0L
        var j = from
        while (j < until) { sum += (r.payload(j) & 0xff); j += 1 }
        FrameSample(r.doc_id, i, from, sum)
      }
    }
  }

  /** STUB resize: shrink a payload by an integer factor via strided byte
    * sampling (a real image pipeline would do pixel-space resampling).
    * Preserves determinism and the binary-in/binary-out plumbing.
    */
  def resizeStub(records: Dataset[MediaRecord], factor: Int = 4): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val out = r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }.toArray
      MediaRecord(r.doc_id, r.media_type, out)
    }
  }

  /** Decode + featurize a media dataset; one decoder per partition. */
  def extractFeatures(records: Dataset[MediaRecord],
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val p = decoder.decode(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, p.byteLen, p.nFrames, p.sampleRate, p.checksum)
      }
    }
  }

  /** Adapter: treat the documents table's text as a binary payload so the
    * full plumbing (binary transport → typed decode → features) runs on
    * the driver test data.
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
