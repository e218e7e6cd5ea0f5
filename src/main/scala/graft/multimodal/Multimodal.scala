package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` payload column plus a
  * typed metadata struct; decode / feature-extraction run per-partition
  * so a real codec would amortize its init cost across a batch.
  *
  * The IMAGE decode path is REAL: `extractFeatures` feeds the payload to
  * `javax.imageio` (JDK-built-in, headless-safe — BMP/PNG/JPEG/GIF) and,
  * when a reader accepts it, derives checksum/embedding from the DECODED
  * PIXELS. Payloads no reader accepts (this container has no audio/video
  * codec libs, and the synthetic text corpus is not an image) fall back
  * to a deterministic byte fold — the documented stub for the codecs the
  * JDK does not ship. Everything around the decode is identical either
  * way: the schema contract, the mapPartitions batch shape, partition
  * sizing, and the feature-vector plumbing into the similarity stack
  * (`graft.similarity.Similarity` consumes the output embedding column
  * unchanged).
  *
  * Scale notes: payloads dominate row size, so partition counts must be
  * sized by BYTES not rows (`spark.sql.files.maxPartitionBytes`); the
  * feature extractor emits fixed-width vectors → downstream shuffles
  * carry ~256 B/row instead of the media payload — project the payload
  * away BEFORE any shuffle.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
                           width: Int, height: Int, n_pixels: Long,
                           embedding: Array[Float])

  /** Deterministic synthetic media table derived from the documents table
    * (the testdata has no real media; payload = utf-8 bytes, kind cycles
    * image/audio/video). Stands in for `spark.read.format("binaryFile")`. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        element_at(typedlit(Seq("image", "audio", "video")),
          (col(idCol) % 3 + 1).cast("int")).as("kind"),
        (col(idCol) % 64 + 1).cast("int").as("width"),
        (col(idCol) % 48 + 1).cast("int").as("height"),
        (col(idCol) * 40 % 10000).as("durationMs")).as("meta"))

  /** Closed-form pixel value: channel c (0=R,1=G,2=B) of pixel (x, y) of
    * image `id`. Shared by the encoder, the spec's ground truth, and the
    * generated DuckDB oracle — decode(encode(formula)) == formula is the
    * roundtrip the `multimodal_decode` key hash-checks end to end. */
  private[graft] def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
    ((id + x * 7L + y * 13L + c * 29L) % 256L).toInt

  /** 24-bit BMP bytes for the formula image (BMP: lossless, zero JDK
    * compression knobs — the roundtrip is bit-exact by construction). */
  private[graft] def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelValue(id, x, y, 0) << 16) |
          (pixelValue(id, x, y, 1) << 8) |
          pixelValue(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic IMAGE table: one real BMP payload per doc,
    * pixels from [[pixelValue]], sizes cycling 1..16 × 1..12. The typed
    * map is a source generator (the stand-in for a binaryFile scan of an
    * image bucket), not a hot-path UDF. */
  def syntheticImages(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 12 + 1).toInt
      MediaRow(id, encodeBmp(id, w, h), MediaMeta("image", w, h, 0L))
    }.toDF()
  }

  /** Fallback for payloads no ImageIO reader accepts (non-image media —
    * the JDK ships no audio/video codecs — and opaque blobs): a
    * deterministic byte fold, so tests and oracles can still assert
    * exact values for the non-decodable branch. */
  private def byteFold(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    val dim = 16
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) % 1000000007L
      acc(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (checksum, acc)
  }

  /** REAL image decode: pixels out of `javax.imageio`, folded in row-major
    * (y, x, then R,G,B) order with the same (acc·31 + v) mod 1e9+7 fold
    * as the byte path; embedding pools channel values into 16 dims. */
  private def decodePixels(img: java.awt.image.BufferedImage): (Long, Int, Int, Array[Float]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var checksum = 0L
    val dim = 16
    val acc = new Array[Float](dim)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val v = (rgb >> (16 - 8 * c)) & 0xff
          checksum = (checksum * 31 + v) % 1000000007L
          acc(i % dim) += v / 255.0f
          i += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (checksum, w, h, acc)
  }

  /** Per-partition decode + feature extraction. mapPartitions (not a
    * per-row UDF) is the contract a real codec needs: init once per
    * partition, stream the rows, release at the end. Decodable payloads
    * get pixel-derived features; the rest take the byte-fold branch. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real impl would acquire heavier codec/model handles HERE,
        // once; ImageIO's reader registry is static and headless-safe
        rows.map { case (id, payload) =>
          // NonFatal, not just IOException: an opaque payload that happens
          // to start with an image magic makes the sniffed reader throw
          // format-specific errors — any decode failure means "not an
          // image here", i.e. the fallback branch, never a task failure
          val img =
            try ImageIO.read(new ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val (checksum, w, h, emb) = decodePixels(img)
            MediaFeatures(id, payload.length.toLong, checksum, w, h,
              w.toLong * h, emb)
          } else {
            val (checksum, emb) = byteFold(payload)
            MediaFeatures(id, payload.length.toLong, checksum, 0, 0, 0L, emb)
          }
        }
      }
  }

  /** Metadata-only transforms (resize / frame-sample plans): pure column
    * ops over the meta struct — no payload touch, so they stay codegen'd
    * and never deserialize the media. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height"), lit(1.0))
    media.withColumn("resize",
      struct((col("meta.width") * scale).cast("int").as("w"),
             (col("meta.height") * scale).cast("int").as("h")))
  }

  /** Frame-sample plan for video rows: every `everyMs` milliseconds. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("meta.kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs))))
}
