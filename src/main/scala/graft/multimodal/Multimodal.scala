package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (north-star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed by
  * per-partition batch kernels.
  *
  * The Spark-side plumbing is real — schema, typed Dataset encoders,
  * partition-wise batch processing (`mapPartitions`, the JVM analogue of
  * arrow-batched UDF execution), deterministic outputs — while the
  * actual codecs are STUBS (this environment ships no image/audio
  * libraries): `decodeStub` derives "decoded" properties deterministically
  * from the payload bytes, so tests can assert exact values end-to-end.
  * Swapping in a real codec changes only the marked function bodies; the
  * operator shapes (schema in/out, batching, partitioning) are final.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Decoded feature vector per media item. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** One sampled frame (video) / window (audio). */
  case class Frame(media_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** Build a media table from any (id, bytes) source — e.g. documents as
    * stand-in blobs. Demonstrates the binary-column schema contract.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String = "image"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
      .as[MediaRow]
  }

  // ---- STUB KERNELS ------------------------------------------------------
  // Real implementations would call an image/audio codec here. The stubs
  // are deterministic functions of the payload so the pipeline is testable.

  /** STUB decode: real version would decode the image/audio and emit an
    * embedding; this derives an 8-dim feature deterministically from
    * payload bytes.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    f
  }

  /** STUB resize: real version returns re-encoded bytes at (w, h); this
    * truncates/pads the payload to w*h bytes (deterministic size change).
    */
  private def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, w * h)

  // -----------------------------------------------------------------------

  /** Feature extraction as a partition-wise batch kernel: each task
    * processes its partition's rows in one pass (the batch shape a real
    * codec needs for model/codec reuse), no shuffle, no driver collect.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (a real codec would init once here)
      rows.map { r =>
        var crc = 0L
        var i = 0
        while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xFF); i += 1 }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, crc,
          decodeStub(r.payload))
      }
    }
  }

  /** Resize all payloads to (w, h) — shape-preserving map, stub codec. */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(payload = resizeStub(r.payload, w, h), width = w, height = h)))
  }

  /** Frame sampling: every `stride` bytes emit a `frameLen`-byte frame —
    * the flatMap (1 → N rows) shape of video-frame extraction, with
    * offsets preserved for downstream alignment.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameLen: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      (0 until r.payload.length by stride).iterator.zipWithIndex.map {
        case (off, idx) =>
          val end = math.min(off + frameLen, r.payload.length)
          Frame(r.media_id, idx, off.toLong, java.util.Arrays.copyOfRange(r.payload, off, end))
      }
    }
  }
}
