package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.TxLog

/** The DSv2 `StreamingWrite` sink (`writeStream.format("txlog")
  * .option("streamApi", "v2")`) — the v1 [[TxLogStreamSinkSpec]]
  * contract re-run on the v2 API, plus the v2-only surfaces: the
  * task-staged segment layout, checkpoint interchange with the v1
  * sink, governance (constraints + default fill) on the staged path,
  * and the documented Update/Append divergence (the engine's
  * update-as-append marker makes the two indistinguishable at the
  * builder, so mergeKey alone selects the upsert). */
class TxLogStreamSinkV2Spec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def feedDir(parts: Int = 4): String = {
    val dir = freshDir("graft-sinkfeed")
    (0 until parts).foreach(i =>
      spark.range(i * 10L, (i + 1) * 10L)
        .select(col("id"), (col("id") % 4).as("k"), (col("id") * 10L).as("v"))
        .coalesce(1).write.mode("append").parquet(dir))
    dir
  }

  private def feed(dir: String) =
    spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*.parquet")

  /** The v2-engagement pin: the sink's staged segments are named
    * `seg-<uuid>-<epochId>` (writers derive the name from the epoch),
    * while every v1/newSegment segment is `seg-<uuid>` — a trailing
    * `-<digits>` group after a full 36-char uuid is the v2 layout. */
  private def v2Segs(dir: String): Seq[String] =
    TxLog.liveSegments(dir).filter(_.matches(
      "seg-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}-\\d+"))

  test("the sink DEFAULT is v2 (r15 flip): no option → task-staged segments") {
    val src = feedDir()
    val out = freshDir("graft-sinkout")
    val q = feed(src).writeStream.format("txlog")
      .option("path", out)
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(TxLog.read(spark, out).count() == 40)
    assert(v2Segs(out).size == 4,
      s"default writeStream must stage v2, got ${TxLog.liveSegments(out)}")
    // the narrow escape hatch still selects the v1 Sink
    val out1 = freshDir("graft-sinkout")
    val q1 = feed(src).writeStream.format("txlog")
      .option("path", out1).option("streamApi", "v1")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    assert(TxLog.read(spark, out1).count() == 40)
    assert(v2Segs(out1).isEmpty,
      s"streamApi=v1 must stage v1 segments, got ${TxLog.liveSegments(out1)}")
  }

  test("v2 append: one idempotent commit per micro-batch, replay skipped") {
    val src = feedDir()
    val out = freshDir("graft-sinkout")
    val q = feed(src).writeStream.format("txlog")
      .option("path", out).option("streamApi", "v2")
      .option("statsCols", "id")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").start()
    val qid = q.id.toString
    try q.processAllAvailable() finally q.stop()
    assert(TxLog.headVersion(out) == 3, "4 micro-batches → 4 commits")
    assert((0 to 3).forall(v => TxLog.commitOp(out, v).startsWith("stream-")))
    assert(TxLog.read(spark, out).count() == 40)
    assert(v2Segs(out).size == 4,
      s"v2 task-staged segments expected, got ${TxLog.liveSegments(out)}")
    // the at-least-once failure mode: a replayed batch of the SAME
    // query must be skipped
    assert(TxLog.appendStream(
      TxLog.readCommit(spark, out, 0), out, batchId = 0L,
      txnAppId = Some(qid)).isEmpty)
    assert(TxLog.headVersion(out) == 3)
    // statsCols recorded at ingest (driver-side over the staged bytes)
    val (_, pruned) = TxLog.pruneRange(out, "id", Some("0"), Some("3"))
    assert(pruned.nonEmpty,
      "streamed segments must carry prunable stats via statsCols")
  }

  test("v1 checkpoint restarts onto v2 (and back) without duplicates") {
    val src = feedDir()
    val out = freshDir("graft-sinkout")
    val ckpt = freshDir("graft-sinkckpt")
    def run(api: Option[String]): Unit = {
      var w = feed(src).writeStream.format("txlog")
        .option("path", out).option("checkpointLocation", ckpt)
      api.foreach(v => w = w.option("streamApi", v))
      val q = w.outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(Some("v1")) // v1 (explicit since the r15 default flip) drains the 4 seed batches
    assert(TxLog.headVersion(out) == 3)
    // two more feed files land while the query is down; v2 resumes
    (4 until 6).foreach(i =>
      spark.range(i * 10L, (i + 1) * 10L)
        .select(col("id"), (col("id") % 4).as("k"), (col("id") * 10L).as("v"))
        .coalesce(1).write.mode("append").parquet(src))
    run(Some("v2"))
    assert(TxLog.headVersion(out) == 5, "v2 must deliver exactly batches 4-5")
    assert(v2Segs(out).size == 2, "the two resumed batches are v2-staged")
    // and back to v1
    (6 until 7).foreach(i =>
      spark.range(i * 10L, (i + 1) * 10L)
        .select(col("id"), (col("id") % 4).as("k"), (col("id") * 10L).as("v"))
        .coalesce(1).write.mode("append").parquet(src))
    run(Some("v1"))
    val rows = TxLog.read(spark, out)
    assert(rows.count() == 70 && rows.select("id").distinct().count() == 70,
      "cross-API restarts must deliver exactly-once")
  }

  test("v2 update mode + mergeKey: per-batch MoR upsert, last writer wins") {
    val src = feedDir()
    val out = freshDir("graft-sinkout")
    TxLog.append(spark.range(0L, 20L)
      .select(col("id"), (col("id") % 4).as("k"), lit(-1L).as("v")), out)
    val q = feed(src).writeStream.format("txlog")
      .option("path", out).option("streamApi", "v2")
      .option("mergeKey", "id")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("update").start()
    val qid = q.id.toString
    try q.processAllAvailable() finally q.stop()
    val rows = TxLog.read(spark, out).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 40, "upsert must dedup on the merge key")
    assert((0L until 40L).forall(i => rows(i) == i * 10L),
      "every seeded stale value must be replaced by the stream's")
    // MoR shape: the seed segment was never rewritten, only tombstoned
    assert(TxLog.liveSegments(out, 0).forall(
      TxLog.liveSegments(out).contains(_)),
      "update mode must merge-on-read, not rewrite the seed segment")
    val head = TxLog.headVersion(out)
    assert(TxLog.mergeStreamMoR(spark, out,
      TxLog.readCommit(spark, out, 1), "id", batchId = 0L,
      txnAppId = Some(qid)).isEmpty)
    assert(TxLog.headVersion(out) == head)
  }

  test("v2 complete mode replaces per trigger and records statsCols") {
    val src = feedDir()
    val out = freshDir("graft-sinkout")
    val q = feed(src)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("v_sum"))
      .writeStream.format("txlog")
      .option("path", out).option("streamApi", "v2")
      .option("statsCols", "k")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = TxLog.read(spark, out).select("k", "n", "v_sum")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = spark.read.parquet(src)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("v_sum"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == expect.toSeq)
    assert(TxLog.headVersion(out) >= 1, "multiple triggers must commit")
    val (kept, pruned) = TxLog.pruneRange(out, "k", Some("10"), Some("99"))
    assert(kept.isEmpty && pruned.nonEmpty,
      s"statsCols must be recorded in Complete mode: kept=$kept")
  }

  test("v2 staged path enforces constraints and fills defaults") {
    val src = feedDir(2)
    val out = freshDir("graft-sinkout")
    // seed + governance BEFORE the stream: a CHECK constraint the feed
    // satisfies, and a DEFAULT column the feed lacks entirely
    TxLog.append(spark.range(0L, 1L)
      .select(col("id"), (col("id") % 4).as("k"), (col("id") * 10L).as("v")),
      out)
    TxLog.addConstraint(spark, out, "v_nonneg", "v >= 0")
    TxLog.setColumnDefault(out, "src", "'stream'")
    val q = feed(src).writeStream.format("txlog")
      .option("path", out).option("streamApi", "v2")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = TxLog.read(spark, out, mergeSchema = true)
    assert(got.count() == 21)
    // the defaults-fill rewrite ran: streamed rows carry the default
    assert(got.filter(col("src") === "stream").count() == 20,
      "DEFAULT column must be materialized on the staged path")
    // a violating batch fails loud and commits nothing
    val bad = freshDir("graft-badfeed") + "/feed"
    spark.range(0L, 5L).select(col("id"), (col("id") % 4).as("k"),
      (lit(-7L)).as("v")).coalesce(1).write.parquet(bad)
    val head = TxLog.headVersion(out)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = spark.readStream.schema(spark.read.parquet(bad).schema)
        .parquet(bad + "/*.parquet").writeStream.format("txlog")
        .option("path", out).option("streamApi", "v2")
        .option("checkpointLocation", freshDir("graft-sinkckpt"))
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q2.awaitTermination(60000) finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("constraint")),
      s"wrong failure: $e")
    assert(TxLog.headVersion(out) == head, "violating batch must not commit")
  }

  test("v2 schema drift fails loud by default and reclaims the staging") {
    val src = feedDir(2)
    val out = freshDir("graft-sinkout")
    TxLog.append(spark.read.parquet(src).limit(1), out)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = feed(src).withColumn("tag", concat(lit("t"), col("k")))
        .writeStream.format("txlog")
        .option("path", out).option("streamApi", "v2")
        .option("checkpointLocation", freshDir("graft-sinkckpt"))
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(60000) finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("mergeSchema")),
      s"wrong failure: $e")
    assert(TxLog.read(spark, out).count() == 1, "drifted batch must not commit")
    // the guard fired AFTER task staging — the staged dir must be gone
    val stray = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg-"))
      .map(_.getName).filterNot(TxLog.liveSegments(out).contains)
    assert(stray.isEmpty, s"guard failure must reclaim staging: ${stray.toSeq}")
    // and mergeSchema=true evolves additively through the v2 path
    val q2 = feed(src).withColumn("tag", concat(lit("t"), col("k")))
      .writeStream.format("txlog")
      .option("path", out).option("streamApi", "v2")
      .option("mergeSchema", "true")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination(60000) finally q2.stop()
    val evolved = TxLog.read(spark, out, mergeSchema = true)
    assert(evolved.count() == 21 &&
      evolved.schema.fieldNames.contains("tag"))
  }

  test("v2 mode guards: Complete+mergeKey loud; Append+mergeKey upserts (documented)") {
    val src = feedDir(2)
    val out = freshDir("graft-sinkout")
    val e = intercept[Exception] {
      val q = feed(src).groupBy("k").agg(sum("v").as("v"))
        .writeStream.format("txlog")
        .option("path", out).option("streamApi", "v2")
        .option("mergeKey", "k")
        .option("checkpointLocation", freshDir("graft-sinkckpt"))
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage != null && e.getMessage.contains("mergeKey"),
      s"wrong error: $e")
    // Append + mergeKey: the engine's update-as-append marker makes
    // Update and Append the SAME builder call, so mergeKey selects the
    // upsert in both — the v1 "Append rejects mergeKey" check is not
    // expressible on this API (scaladoc-documented); pin the behavior
    val out2 = freshDir("graft-sinkout")
    TxLog.append(spark.range(0L, 20L)
      .select(col("id"), (col("id") % 4).as("k"), lit(-1L).as("v")), out2)
    val q2 = feed(src).writeStream.format("txlog")
      .option("path", out2).option("streamApi", "v2")
      .option("mergeKey", "id")
      .option("checkpointLocation", freshDir("graft-sinkckpt"))
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = TxLog.read(spark, out2).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 20 && (0L until 20L).forall(i => rows(i) == i * 10L),
      "mergeKey upserts on the v2 path regardless of declared mode")
  }

  test("v2 native pipeline: v2 source -> v2 sink relays exactly-once") {
    val srcTable = freshDir("graft-sinksrc")
    val dstTable = freshDir("graft-sinkdst")
    val ckpt = freshDir("graft-sinkckpt")
    (0 until 6).foreach(i => TxLog.append(
      spark.range(i * 10L, i * 10L + 10L).select(col("id"),
        (col("id") % 5).as("k")), srcTable))
    def relay() = spark.readStream.format("txlog")
      .option("path", srcTable).option("streamApi", "v2")
      .option("maxCommitsPerTrigger", "2").load()
      .drop("_commit_version", "_commit_op")
      .writeStream.format("txlog")
      .option("path", dstTable).option("streamApi", "v2")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = relay()
    try q.processAllAvailable() finally q.stop()
    assert(TxLog.headVersion(dstTable) == 2, "6 commits / cap 2 → 3 batches")
    assert(TxLog.read(spark, dstTable).count() == 60)
    TxLog.append(spark.range(60L, 70L).select(col("id"),
      (col("id") % 5).as("k")), srcTable)
    val q2 = relay()
    try q2.processAllAvailable() finally q2.stop()
    val got = TxLog.read(spark, dstTable)
    assert(got.count() == 70 && got.select("id").distinct().count() == 70,
      "restart must deliver exactly the downtime commit, no duplicates")
  }
}
