package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventStream

/** Streaming ≡ batch: run the streaming transforms over a bounded file
  * stream (memory sink, synchronous processAllAvailable) and compare with
  * the same transform applied in batch. */
class StreamingSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // every temp dir is registered here and removed in afterAll — the
  // suite used to leak its seed/stream/checkpoint dirs for the JVM's
  // lifetime (ADVICE r5)
  private val tmpDirs =
    scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
  private def tmpDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.synchronized { tmpDirs += d }
    d
  }
  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmpDirs.foreach { d =>
      try scala.util.Using.resource(java.nio.file.Files.walk(d)) { st =>
        st.iterator().asScala.toSeq.reverseIterator
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: java.io.IOException => () }
    }
    super.afterAll()
  }
  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def withEventTime(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("t", timestamp_micros(expr("ts div 1000")))

  // One normalized seed file (ts as epoch-nanos BIGINT via Tables.events —
  // the raw testdata file now carries TIMESTAMP micros, which would clash
  // with the LongType stream schema above). Tests copy THIS file wherever
  // they previously copied the raw one.
  private lazy val seedFile: java.nio.file.Path = {
    val seed = tmpDir("graft-seed")
    Tables.events(spark, sf).coalesce(1).write.mode("overwrite").parquet(seed.toString)
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory handle until closed — find() inside
    // the resource scope, result is just a Path (safe after close)
    scala.util.Using.resource(java.nio.file.Files.list(seed)) { st =>
      st.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
  }

  // file streams need a DIRECTORY source
  private lazy val streamDir: String = {
    val dir = tmpDir("graft-stream")
    java.nio.file.Files.copy(seedFile, dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly window equals the batch result") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.hourlyTypeCounts(withEventTime(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly")
      .select("hour_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = EventStream.hourlyTypeCounts(withEventTime(Tables.events(spark, sf)))
      .select("hour_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming session windows equal the batch session_window key exactly") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.sessionCounts(withEventTime(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    // the batch twin (the events_session_window oracle key) must agree
    // session for session — same splits, same starts, same counts
    val batch = SparkEntry.queries("events_session_window")(spark, sf)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("streaming OHLC bars equal the batch events_ohlc aggregation") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.ohlcBars(withEventTime(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ohlc")
      .select(unix_micros(col("bar_start")).as("bar_us"), col("event_type"),
        col("open"), col("close"), col("high"), col("low"), col("n"))
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    val want = graft.ops.TimeSeries.ohlc(
        Tables.events(spark, sf).withColumn("t_us", expr("ts div 1000")),
        "event_type", "event_id", "t_us", "value", barUs = 3600L * 1000000L)
      .select(col("bar_us"), col("event_type"), col("open"), col("close"),
        col("high"), col("low"), col("n"))
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming CDC compaction equals the batch cdcCompact fixpoint") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    def asOps(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        round(col("value") * 100).cast("long").as("v_cents"))
    val q = EventStream.cdcLatest(asOps(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cdc").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cdc")
      .select("user_id", "n_ops", "last_seq", "v_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.ops.Relational.cdcCompact(
        asOps(Tables.events(spark, sf)), "user_id", "event_id", "op")
      .select("user_id", "n_ops", "last_seq", "v_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming dedup emits each event once despite a replayed input file") {
    // at-least-once delivery simulated by the same file arriving twice
    val dir = tmpDir("graft-dedup-stream")
    for (name <- Seq("events_a.parquet", "events_b.parquet"))
      java.nio.file.Files.copy(seedFile, dir.resolve(name))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = EventStream.dedupEvents(withEventTime(stream))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_ev").start()
    try q.processAllAvailable() finally q.stop()
    val n = Tables.events(spark, sf).count()
    assert(spark.table("dedup_ev").count() === n)
    assert(spark.table("dedup_ev").select("event_id").distinct().count() === n)
  }

  test("session_window MERGES an event at exactly the gap (strict > split)") {
    // Pins the boundary the events_session_window oracle mirrors: an
    // event at exactly window-end (t+30min, window [t, t+30min]) MERGES
    // into the session; only a gap strictly greater than 30min splits.
    // Written because the sf data has no exact-microsecond-gap pair —
    // a wrong >= mirror in the oracle would pass the key silently
    // (and did, until this fixture flushed it out).
    val gapUs = 1800L * 1000000L
    val base = 1600000000L * 1000000L
    val rows = Seq(
      (1L, base), (1L, base + gapUs), (1L, base + gapUs + 1L),
      (1L, base + 3 * gapUs)).toDF("user_id", "t_us")
      .select(col("user_id"), timestamp_micros(col("t_us")).as("t"))
    val got = rows
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("s"), col("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set(
      (base, 3L),             // exact-gap event and its +1us follower merge
      (base + 3 * gapUs, 1L)))
  }

  test("dedup state survives a query RESTART from its checkpoint") {
    // run 1 consumes the events file and stops; the same file is then
    // delivered AGAIN (at-least-once redelivery across process death)
    // and a NEW query object restarts from the same checkpoint — the
    // recovered state store must suppress every replayed key, proving
    // the exactly-once contract holds across restarts, not just within
    // one run
    val in = tmpDir("graft-restart-in")
    val ckpt = tmpDir("graft-restart-ck")
    val out = tmpDir("graft-restart-out")
    java.nio.file.Files.copy(seedFile, in.resolve("events_run1.parquet"))
    def start() = EventStream.dedupEvents(withEventTime(
        spark.readStream.schema(schema).parquet(in.toString)))
      .select("event_id", "user_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", out.toString).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    java.nio.file.Files.copy(seedFile, in.resolve("events_run2.parquet"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out.toString)
    val n = Tables.events(spark, sf).count()
    assert(got.count() === n, "replayed keys leaked through the restart")
    assert(got.select("event_id").distinct().count() === n)
  }

  test("stream-stream interval join matches the batch range join") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.purchaseClickJoin(withEventTime(stream))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssjoin")
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch reference: identical predicate, no watermarks
    val ev = withEventTime(Tables.events(spark, sf))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("t").as("click_t"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("t").as("purchase_t"))
    val want = p.join(c,
        col("click_user") === col("user_id") &&
        col("click_t") <= col("purchase_t") &&
        col("click_t") >= col("purchase_t") - expr("INTERVAL 1 hour"))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("foreachBatch sink: per-batch transform lands in queryable parquet") {
    val outDir = tmpDir("graft-febatch").toString
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.hourlyTypeCounts(withEventTime(stream))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the arbitrary-sink escape hatch: full batch DataFrame API
        // available per micro-batch (complete mode → overwrite = upsert)
        batch.write.mode("overwrite").parquet(outDir)
      }.start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(outDir)
      .select("hour_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = EventStream.hourlyTypeCounts(withEventTime(Tables.events(spark, sf)))
      .select("hour_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming curation metrics equal the batch metrics exactly") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("text", StringType)))
    val dir = tmpDir("graft-docstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val q = graft.streaming.TextStream.metrics(stream, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_metrics").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("doc_metrics").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val want = graft.streaming.TextStream
      .metrics(Tables.documents(spark, sf), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming curation dedups by content within the watermark") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("text", StringType)))
    val dir = tmpDir("graft-docstream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    // replay the same file: at-least-once delivery of every document
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents_replayed.parquet"))
    // +1s offset: epoch-0 event time equals Spark's INITIAL watermark and
    // the row would be discarded as late before any data arrived
    val withT = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("t", timestamp_micros(col("doc_id") + 1000000L))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val q = graft.streaming.TextStream.curateStream(withT(stream), "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_curated").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("doc_curated").collect()
      .map(r => (r.getString(4), r.getLong(1), r.getDouble(2), r.getString(3)))
    // exactly one row per surviving content hash despite full replay...
    assert(got.map(_._1).distinct.length == got.length)
    // ...and the kept content set + metrics equal the batch curation's
    // (keeper CHOICE may differ — identical text ⇒ identical metrics)
    val want = graft.text.TextAnalysis.curate(Tables.documents(spark, sf), "doc_id", "text")
      .filter(col("is_keeper") && col("n_tokens") >= 10 &&
        col("stop_ratio") > 0 && col("lang_pred") === "en")
      .join(Tables.documents(spark, sf), "doc_id")
      .select(md5(col("text")), col("n_tokens"), col("stop_ratio"), col("lang_pred"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.toSet == want.toSet)
    assert(got.nonEmpty)
  }

  test("streaming source cap admits exactly the batch operator's k per source") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val dir = tmpDir("graft-docstream3")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(docSchema).parquet(dir.toString)
    val q = graft.streaming.TextStream.sourceCapStream(stream, "doc_id", "source", k = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_capped").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("doc_capped").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // one ordered delivery → identical to the batch k-lowest-ids cap
    val want = graft.text.TextAnalysis
      .sourceCap(Tables.documents(spark, sf), "doc_id", "source", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the cap held per source
    assert(got.groupBy(_._2).values.forall(_.size <= 5))
  }

  test("stream-static enrichment joins every event to the broadcast dim") {
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val dim = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("cohort", (col("user_id") % 2).cast("string"))
    val q = EventStream.enrich(withEventTime(stream), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("enriched")
    assert(out.count() === Tables.events(spark, sf).count())
    // every user is in the dim, so the left join never null-pads
    assert(out.filter(col("cohort").isNull).count() === 0L)
  }

  test("transformWithState running totals equal the batch groupBy (RocksDB store)") {
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two source files -> at least two micro-batches exercising state
      // carry-over (maxFilesPerTrigger pins one file per batch)
      val dir = tmpDir("graft-tws")
      val ev = Tables.events(spark, sf)
      ev.filter(col("event_id") % 2 === 0).coalesce(1).write
        .parquet(dir.resolve("b0").toString)
      ev.filter(col("event_id") % 2 =!= 0).coalesce(1).write
        .parquet(dir.resolve("b1").toString)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString + "/*/")
      val q = graft.streaming.StateStream.userTotals(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_totals").start()
      try q.processAllAvailable() finally q.stop()
      // update mode appends one row per (user, batch); the LATEST row
      // per user (max n_events — monotone) is the running total
      val got = spark.table("tws_totals")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("cents"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.cents"))
        .as[(Long, Long, Long)].collect().toSet
      val want = ev
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }
}
