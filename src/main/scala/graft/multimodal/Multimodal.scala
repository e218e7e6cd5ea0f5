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
  * PIXELS. AUDIO is real through `javax.sound.sampled` (WAV PCM), and
  * VIDEO frame extraction is real per-frame ImageIO decode over a simple
  * frame container (the JDK ships no H.264-class codec — only the
  * container format is synthetic). Payloads nothing accepts fall back to
  * a deterministic byte fold. Everything around the decodes is identical
  * either way: the schema contract, the mapPartitions batch shape,
  * partition sizing, and the feature-vector plumbing into the similarity
  * stack (`graft.similarity.Similarity` consumes the output embedding
  * column unchanged).
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

  // -------------------------------------------------------------------
  // AUDIO: real decode through javax.sound.sampled (JDK-built-in WAV/
  // AIFF/AU parsing — no external codec needed for PCM). Mirrors the
  // image path: synthesize payloads whose samples are a closed form of
  // (id, i), decode REAL bytes back through the JDK codec, and fold the
  // decoded samples — so the oracle hash certifies decode(encode(f))==f.
  // Video remains the only stubbed decode (the JDK ships no video codec).
  // -------------------------------------------------------------------

  case class AudioFeatures(media_id: Long, n_bytes: Long, sample_rate: Long,
                           n_samples: Long, checksum: Long,
                           embedding: Array[Float])

  /** Closed-form UNSIGNED 16-bit sample value u(id, i) ∈ [0, 65536); the
    * encoded PCM sample is the signed u − 32768. Shared by the encoder,
    * the spec ground truth, and the generated DuckDB oracle. */
  private[graft] def sampleValue(id: Long, i: Int): Int =
    ((id * 31L + i * 17L) % 65536L).toInt

  /** Mono 16-bit little-endian PCM WAV at 8 kHz for the formula signal. */
  private[graft] def encodeWav(id: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sampleValue(id, i) - 32768 // signed
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic AUDIO table: one real WAV payload per doc,
    * samples from [[sampleValue]], lengths cycling 10..59. */
  def syntheticAudio(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = (id % 50 + 10).toInt
      MediaRow(id, encodeWav(id, n), MediaMeta("audio", 0, 0, n * 1000L / 8000L))
    }.toDF()
  }

  /** Per-partition audio decode; payloads the JDK can't parse as
    * 16-bit signed PCM take the byte-fold branch (n_samples = 0) — the
    * same "decode failure is data, not a task failure" contract as the
    * image path. Checksum folds the UNSIGNED samples (s + 32768) with
    * the engine-wide (acc·31 + v) mod 1e9+7 fold. */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val decoded =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                  || fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
                None
              else {
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                val dim = 16
                val acc = new Array[Float](dim)
                var checksum = 0L
                var i = 0
                while (i < n) {
                  val b0 = bytes(2 * i)
                  val b1 = bytes(2 * i + 1)
                  // sign lives in the HIGH byte (first if big-endian)
                  val s = if (fmt.isBigEndian) (b0.toInt << 8) | (b1 & 0xff)
                          else (b1.toInt << 8) | (b0 & 0xff)
                  val u = s + 32768 // unsigned form, matches sampleValue
                  checksum = (checksum * 31 + u) % 1000000007L
                  acc(i % dim) += u / 65535.0f
                  i += 1
                }
                Some(AudioFeatures(id, payload.length.toLong,
                  fmt.getSampleRate.toLong, n.toLong, checksum, acc))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded.getOrElse {
            val (checksum, emb) = byteFold(payload)
            AudioFeatures(id, payload.length.toLong, 0L, 0L, checksum, emb)
          }
        }
      }
  }

  // -------------------------------------------------------------------
  // VIDEO: the JDK ships no video codec, so H.264-style payloads stay
  // out of reach — but the frame-extraction PIPELINE is fully real over
  // a simple frame container (magic + frame count + lengths + one BMP
  // per frame). Sampled frames are decoded through javax.imageio — real
  // pixels out of a real image codec per frame — and the checksum of
  // DECODED sampled pixels is oracle-checked against the closed form.
  // What remains synthetic is only the container format, not the
  // decode, sampling, batching, or feature plumbing.
  // -------------------------------------------------------------------

  case class VideoFeatures(media_id: Long, n_bytes: Long, n_frames: Long,
                           n_sampled: Long, checksum: Long)

  /** Frame f's pixels come from [[pixelValue]] with a frame-mixed id. */
  private[graft] def framePixelId(id: Long, frame: Int): Long =
    id + 1000000L * frame

  /** GFTV container: magic, frame count, per-frame byte lengths, then
    * the concatenated BMP payloads. */
  private[graft] def encodeVideo(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map(f => encodeBmp(framePixelId(id, f), w, h))
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47465456) // "GFTV"
    out.writeInt(nFrames)
    frames.foreach(f => out.writeInt(f.length))
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** Deterministic synthetic VIDEO table: sizes cycle 1..8 × 1..6,
    * frame counts 2..6. */
  def syntheticVideos(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 8 + 1).toInt
      val h = (id % 6 + 1).toInt
      val nf = (id % 5 + 2).toInt
      MediaRow(id, encodeVideo(id, w, h, nf),
        MediaMeta("video", w, h, nf * 40L))
    }.toDF()
  }

  /** Per-partition frame-sampled video decode: every `everyN`-th frame
    * is decoded through ImageIO and its pixels fold into ONE running
    * checksum (row-major within a frame, frames in sample order).
    * Unparseable payloads → byte-fold fallback with n_frames = 0. */
  def extractVideoFeatures(media: DataFrame, everyN: Int = 2): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val decoded =
            try {
              val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
              if (in.readInt() != 0x47465456) None
              else {
                val nf = in.readInt()
                val lens = Array.fill(nf)(in.readInt())
                var checksum = 0L
                var sampled = 0L
                var f = 0
                while (f < nf) {
                  val buf = new Array[Byte](lens(f))
                  in.readFully(buf)
                  if (f % everyN == 0) {
                    val img = ImageIO.read(new ByteArrayInputStream(buf))
                    require(img != null, s"frame $f undecodable")
                    var y = 0
                    while (y < img.getHeight) {
                      var x = 0
                      while (x < img.getWidth) {
                        val rgb = img.getRGB(x, y)
                        var c = 0
                        while (c < 3) {
                          val v = (rgb >> (16 - 8 * c)) & 0xff
                          checksum = (checksum * 31 + v) % 1000000007L
                          c += 1
                        }
                        x += 1
                      }
                      y += 1
                    }
                    sampled += 1
                  }
                  f += 1
                }
                Some(VideoFeatures(id, payload.length.toLong, nf.toLong,
                  sampled, checksum))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded.getOrElse {
            val (checksum, _) = byteFold(payload)
            VideoFeatures(id, payload.length.toLong, 0L, 0L, checksum)
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
