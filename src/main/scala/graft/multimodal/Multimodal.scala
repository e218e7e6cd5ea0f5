package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` payload column plus a
  * typed metadata struct; decode / feature-extraction run per-partition
  * so a real codec would amortize its init cost across a batch.
  *
  * The DECODERS ARE STUBS — this container has no image/audio libraries,
  * so `decodeStub` derives deterministic fake pixels/samples from the
  * payload bytes (clearly marked below). Everything AROUND the decode is
  * real and tested: the schema contract, the mapPartitions batch shape,
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

  /** ??? REAL DECODE GOES HERE ??? — a production build would call the
    * codec (e.g. javax.imageio / ffmpeg bindings) on `payload`. The stub
    * is a deterministic byte-fold so tests can assert exact values. */
  private def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
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

  /** Per-partition decode + feature extraction. mapPartitions (not a
    * per-row UDF) is the contract a real codec needs: init once per
    * partition, stream the rows, release at the end. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real impl would acquire the codec/model handle HERE, once
        rows.map { case (id, payload) =>
          val (checksum, emb) = decodeStub(payload)
          MediaFeatures(id, payload.length.toLong, checksum, emb)
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
