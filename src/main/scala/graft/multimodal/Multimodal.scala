package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (north-star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed by
  * per-partition batch kernels.
  *
  * The Spark-side plumbing is real — schema, typed Dataset encoders,
  * partition-wise batch processing (`mapPartitions`, the JVM analogue of
  * arrow-batched UDF execution), deterministic outputs. The IMAGE codec
  * is real too: `javax.imageio` ships with the JDK, so [[imageMeta]] and
  * [[resizeImages]] decode/re-encode PNG/JPEG/BMP/GIF with zero external
  * dependencies. Audio/video codecs are STUBS (no such library in this
  * environment): `decodeStub` derives "decoded" properties
  * deterministically from the payload bytes so those pipelines stay
  * testable end-to-end; swapping in a real codec changes only the marked
  * function bodies — the operator shapes (schema in/out, batching,
  * partitioning) are final.
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

  /** Real decoded-image metadata + pixel stats. `decoded = false` rows
    * (payload is not a parseable image) carry -1 dims and NaN stats
    * instead of killing the batch — at 100 TB some blobs are always
    * corrupt, and a kernel that throws on the first one loses the task.
    */
  case class ImageMeta(media_id: Long, decoded: Boolean, width: Int, height: Int,
                       mean_luma: Double, min_luma: Double, max_luma: Double)

  // ---- REAL IMAGE KERNEL (JDK javax.imageio — no external deps) ----------

  /** Deterministic solid-gray PNG (the encode half of the JDK codec
    * path); used by the oracle-checked decode query (q39) and specs.
    */
  def renderSolidPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Decode every payload and extract dimensions + luma statistics — the
    * real-codec version of the feature kernel: one pass per partition,
    * no shuffle, no driver collect, corrupt rows flagged not thrown.
    */
  def imageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            var sum = 0.0; var mn = Double.MaxValue; var mx = Double.MinValue
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                // ITU-R BT.601 luma from the sRGB channels
                val l = 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                sum += l; if (l < mn) mn = l; if (l > mx) mx = l
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            ImageMeta(r.media_id, decoded = true, w, h,
              if (n == 0) Double.NaN else sum / n,
              if (n == 0) Double.NaN else mn, if (n == 0) Double.NaN else mx)
          case None =>
            ImageMeta(r.media_id, decoded = false, -1, -1,
              Double.NaN, Double.NaN, Double.NaN)
        }
      }
    }
  }

  /** Real resize: decode, bilinear-rescale to (w, h), re-encode as PNG.
    * Rows that do not decode pass through unchanged (flagged by their
    * untouched width/height) rather than failing the task.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeImage(r.payload) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(payload = bos.toByteArray, width = w, height = h)
        case None => r
      }
    })
  }

  // ---- STUB KERNELS (audio/video — no codec library in this env) ---------
  // Real implementations would call an audio/video codec here. The stubs
  // are deterministic functions of the payload so the pipeline is testable.

  /** STUB decode: real version would decode the audio/video stream and
    * emit an embedding; this derives an 8-dim feature deterministically
    * from payload bytes. (Images have the real path: [[imageMeta]].)
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
