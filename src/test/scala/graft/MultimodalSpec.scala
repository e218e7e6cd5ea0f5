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

  test("BMP roundtrip: ImageIO decode returns the exact formula pixels") {
    // no Spark in the loop — encode, decode, compare pixel by pixel
    for (id <- Seq(0L, 1L, 7L, 255L, 1000L)) {
      val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeBmp(id, w, h)))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == Multimodal.pixelValue(id, x, y, 0))
        assert(((rgb >> 8) & 0xff) == Multimodal.pixelValue(id, x, y, 1))
        assert((rgb & 0xff) == Multimodal.pixelValue(id, x, y, 2))
      }
    }
  }

  test("PNG payloads decode through the same format-agnostic reader path") {
    // a second real JDK codec (PNG is lossless like BMP): the extractor
    // never looks at the format — ImageIO's reader registry dispatches —
    // so pixel features must be identical to the BMP formula fold
    import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
    val id = 42L
    val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (Multimodal.pixelValue(id, x, y, 0) << 16) |
        (Multimodal.pixelValue(id, x, y, 1) << 8) |
        Multimodal.pixelValue(id, x, y, 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq(MediaRow(id, bos.toByteArray, MediaMeta("image", w, h, 0L))).toDF()
    val (gw, gh, cs) = Multimodal.extractFeatures(df)
      .toDF().select("width", "height", "checksum")
      .as[(Int, Int, Long)].head()
    var want = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      want = (want * 31 + Multimodal.pixelValue(id, x, y, c)) % 1000000007L
    assert(gw == w && gh == h && cs == want)
  }

  test("decoded-pixel features match an independent fold of the formula") {
    val feats = Multimodal.extractFeatures(
        Multimodal.syntheticImages(Tables.documents(spark, sf), "doc_id"))
      .toDF().select("media_id", "width", "height", "n_pixels", "checksum")
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(feats.nonEmpty)
    feats.foreach { case (id, w, h, np, cs) =>
      assert(w == (id % 16 + 1).toInt && h == (id % 12 + 1).toInt)
      assert(np == w.toLong * h)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        want = (want * 31 + Multimodal.pixelValue(id, x, y, c)) % 1000000007L
      assert(cs == want, s"id=$id")
    }
  }

  test("non-image payloads fall back to the byte fold (width 0)") {
    val row = Multimodal.extractFeatures(media).filter(_.media_id >= 0).head()
    assert(row.width == 0 && row.height == 0 && row.n_pixels == 0L)
  }

  test("WAV roundtrip: javax.sound decode returns the exact formula samples") {
    // encode → AudioSystem decode must recover sampleValue bit for bit
    val id = 42L
    val n = 25
    val bytes = Multimodal.encodeWav(id, n)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.getFormat.getChannels == 1)
    val pcm = ais.readAllBytes()
    assert(pcm.length == n * 2)
    for (i <- 0 until n) {
      val s = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
      assert(s + 32768 == Multimodal.sampleValue(id, i), s"sample $i")
    }
  }

  test("decoded-sample audio features match an independent fold of the formula") {
    val sf = "/root/testdata/sf0.001"
    val feats = Multimodal.extractAudioFeatures(
        Multimodal.syntheticAudio(Tables.documents(spark, sf), "doc_id"))
      .toDF().select("media_id", "sample_rate", "n_samples", "checksum")
      .as[(Long, Long, Long, Long)].collect()
    assert(feats.nonEmpty)
    feats.foreach { case (id, sr, n, cs) =>
      assert(sr == 8000L && n == id % 50 + 10)
      var want = 0L
      for (i <- 0 until n.toInt)
        want = (want * 31 + Multimodal.sampleValue(id, i)) % 1000000007L
      assert(cs == want, s"id=$id")
    }
  }

  test("video container roundtrip: sampled frames decode to the formula pixels") {
    val id = 7L
    val (w, h, nf) = (3, 2, 5)
    val bytes = Multimodal.encodeVideo(id, w, h, nf)
    val feats = Multimodal.extractVideoFeatures(
        Seq((id, bytes)).toDF("media_id", "payload"), everyN = 2)
      .collect().head
    assert(feats.n_frames == nf && feats.n_sampled == 3) // frames 0, 2, 4
    var want = 0L
    for (f <- Seq(0, 2, 4); y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      want = (want * 31 +
        Multimodal.pixelValue(Multimodal.framePixelId(id, f), x, y, c)) % 1000000007L
    assert(feats.checksum == want)
  }

  test("non-video payloads fall back to the byte fold (n_frames 0)") {
    val feats = Multimodal.extractVideoFeatures(
      Seq((1L, "not a container".getBytes("UTF-8"))).toDF("media_id", "payload"))
      .collect().head
    assert(feats.n_frames == 0L && feats.n_sampled == 0L)
  }

  test("non-audio payloads fall back to the byte fold (n_samples 0)") {
    val row = Multimodal.extractAudioFeatures(media).filter(_.media_id >= 0).head()
    assert(row.n_samples == 0L && row.sample_rate == 0L)
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
