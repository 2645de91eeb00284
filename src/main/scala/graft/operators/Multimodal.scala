package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque binary
  * columns with typed metadata; decode / feature-extraction runs as a
  * typed mapPartitions stage (one decoder instantiation per partition,
  * batched iteration — the Scala analog of an arrow-batched UDF).
  *
  * Decoding: [[ImageDecoder]] REALLY decodes `image/`-typed payloads with the
  * JDK's javax.imageio (PNG/BMP/GIF — no external deps, satisfies the
  * offline build), emitting true width/height and a pixel-level RGB
  * checksum; non-image types (audio/video codecs are not in this
  * container) fall back to [[StubDecoder]]'s deterministic byte-derived
  * features, honestly labeled as such.
  *
  * Scale notes: payload columns are only scanned when selected (parquet
  * column pruning keeps blobs untouched for metadata-only queries);
  * decode parallelism is the scan partitioning — control batch size with
  * spark.sql.files.maxPartitionBytes, not code.
  */
object Multimodal {

  /** A media row: opaque payload + routing metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; width/height are real decoded dimensions for
    * images, 0 for non-image payloads. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      n_frames: Int,
      sample_rate: Int,
      checksum: Long,
      width: Int,
      height: Int)

  /** Per-partition decoder contract (instantiated once per partition —
    * the place a real implementation would open codecs / native handles).
    */
  trait Decoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Partial
  }

  object MediaFeatures {
    /** Decoder output before ids are re-attached. */
    case class Partial(byteLen: Int, nFrames: Int, sampleRate: Int, checksum: Long,
                       width: Int = 0, height: Int = 0)
  }

  /** Deterministic stand-in for codecs this container lacks (audio/video):
    * features derived from the bytes themselves.
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

  /** Decode an image payload to pixels, or null when it is not one:
    * wrong media type, unrecognized format (ImageIO.read returns null),
    * or corrupt data behind a valid image signature (ImageIO.read
    * THROWS IIOException there — a distributed decode stage must treat
    * that as a bad row, not a task-killing error). The single routing
    * point for every image operator below.
    */
  private def decodeImage(mediaType: String,
                          payload: Array[Byte]): java.awt.image.BufferedImage =
    if (!mediaType.startsWith("image/")) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }

  /** REAL image decode via the JDK's javax.imageio: `image/`-typed payloads
    * are decoded to pixels; checksum is the sum of 8-bit R+G+B over all
    * pixels (deterministic across platforms for PNG/BMP, which are
    * lossless). Undecodable image bytes → negative checksum sentinel so
    * corrupt inputs are visible, not silently stubbed. Non-image types
    * route to [[StubDecoder]].
    */
  object ImageDecoder extends Decoder {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Partial = {
      if (!mediaType.startsWith("image/")) StubDecoder.decode(mediaType, payload)
      else {
        val img = decodeImage(mediaType, payload)
        if (img == null)
          MediaFeatures.Partial(payload.length, 0, 0, checksum = -1L)
        else {
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          MediaFeatures.Partial(
            byteLen = payload.length,
            nFrames = 1,
            sampleRate = 0,
            checksum = sum,
            width = img.getWidth,
            height = img.getHeight)
        }
      }
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
    * sampling — kept for NON-image payloads (no audio/video codecs in
    * this container); images go through [[resizeImage]].
    */
  def resizeStub(records: Dataset[MediaRecord], factor: Int = 4): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val out = r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }.toArray
      MediaRecord(r.doc_id, r.media_type, out)
    }
  }

  /** REAL image resize: decode, nearest-neighbor resample in pixel
    * space, re-encode as PNG. Resampling is hand-rolled integer
    * arithmetic (out(x,y) = in(x·w/W, y·h/H)) rather than Graphics2D so
    * the output pixels — and the PNG bytes — are bit-deterministic,
    * which keeps the operator oracle-able. Non-image or undecodable
    * payloads pass through unchanged (media pipelines drop or route
    * such rows downstream; silently emitting garbage would hide them).
    */
  def resizeImage(records: Dataset[MediaRecord],
                  targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val img = decodeImage(r.media_type, r.payload)
      if (img == null) r
      else {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          val sy = y * img.getHeight / targetH
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y, img.getRGB(x * img.getWidth / targetW, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRecord(r.doc_id, "image/png", bos.toByteArray)
      }
    }
  }

  /** Decode + featurize a media dataset; one decoder per partition.
    * [[ImageDecoder]] routes by media type: real pixel decode for
    * `image/`-typed, byte-derived features otherwise.
    */
  def extractFeatures(records: Dataset[MediaRecord],
                      decoder: Decoder = ImageDecoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val p = decoder.decode(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, p.byteLen, p.nFrames, p.sampleRate,
          p.checksum, p.width, p.height)
      }
    }
  }

  /** REAL image frame sampling: decode the payload and emit every
    * `everyN`-th pixel ROW as a frame — frame_idx is the row index,
    * offset the row's first-pixel linear offset, checksum the row's
    * R+G+B sum. The Spark-side shape (flatMap explode to one row per
    * sampled frame) is identical to [[sampleFrames]]; only the window
    * source differs (decoded pixels vs raw bytes). Undecodable payloads
    * yield no frames.
    */
  def sampleImageRows(records: Dataset[MediaRecord],
                      everyN: Int = 2): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val img = decodeImage(r.media_type, r.payload)
      if (img == null) Seq.empty[FrameSample]
      else (0 until img.getHeight by everyN).map { y =>
        var sum = 0L
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        FrameSample(r.doc_id, y, y * img.getWidth, sum)
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
