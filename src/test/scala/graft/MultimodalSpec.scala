package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.text.TextAnalysis

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val media = Multimodal.syntheticMedia(
    Tables.documents(spark, sf), "doc_id", "text")

  test("schema contract: opaque payload + typed metadata struct") {
    val f = media.schema
    assert(f("payload").dataType.typeName == "binary")
    assert(f("meta").dataType.typeName == "struct")
  }

  test("per-partition feature extraction: sizes, checksum, embedding shape") {
    val feats = Multimodal.extractFeatures(media)
    val docs = Tables.documents(spark, sf)
    // payload is the utf-8 text (pure ASCII) → n_bytes == n_chars
    val joined = feats.toDF().join(docs, col("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() == 0)
    // the stub checksum folds bytes exactly like the text fingerprint
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
    val cmp = feats.toDF().join(fp, col("media_id") === col("doc_id"))
    assert(cmp.filter(col("checksum") =!= col("fp")).count() == 0)
    assert(feats.head().embedding.length == 16)
  }

  test("resize plan never upsizes and preserves aspect ratio direction") {
    val r = Multimodal.resizePlan(media, 32, 32)
      .select(col("meta.width"), col("meta.height"), col("resize.w"), col("resize.h"))
      .as[(Int, Int, Int, Int)].collect()
    r.foreach { case (w, h, rw, rh) =>
      assert(rw <= 32 && rh <= 32)
      assert(rw <= w && rh <= h)
    }
  }

  test("frame sampling emits one row per interval for video rows only") {
    val f = Multimodal.frameSamplePlan(media, everyMs = 1000L)
    val kinds = f.select("meta.kind").distinct().as[String].collect()
    assert(kinds.sameElements(Array("video")))
    val perMedia = f.groupBy("media_id").agg(count(lit(1)).as("n"),
        first(col("meta.durationMs")).as("dur"))
      .as[(Long, Long, Long)].collect()
    perMedia.foreach { case (_, n, dur) => assert(n == dur / 1000 + 1) }
  }
}
