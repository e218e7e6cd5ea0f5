package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.TxLog

/** The DSv2 `MicroBatchStream` streaming source
  * (`.option("streamApi", "v2")`) — every v1-Source behavior the
  * engine-driven specs pin, re-proven on the v2 path, plus the two
  * contracts only v2 can offer: checkpoint interchange with v1 (same
  * offsets, same floor file) and the UNCONDITIONAL plan-time vacuum
  * interlock (v2 never re-plans a committed range, so the v1 lazy
  * throwing-frame design — and its no-op-sink gap — is gone). */
class TxLogStreamV2Spec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sample(lo: Int, hi: Int) =
    spark.range(lo.toLong, hi.toLong).select(col("id"),
      (col("id") % 5).as("k"))

  private def v2Reader(dir: String) =
    spark.readStream.format("txlog").option("path", dir)
      .option("streamApi", "v2")

  private def rootMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e => e.getMessage +: rootMessages(e.getCause))

  /** The engagement pin: lastProgress.sources.head.description is the
    * stream's toString on the v2 path. */
  private def assertV2(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val d = Option(q.lastProgress).map(_.sources.head.description).getOrElse("")
    assert(d.startsWith("TxLogMicroBatchStream"),
      s"expected the DSv2 MicroBatchStream to drive this query, got '$d'")
  }

  test("v2 engages and delivers the full history, tagged by commit — v1-identical rows and schema") {
    val dir = freshDir("graft-txv2")
    TxLog.append(sample(0, 10), dir)
    TxLog.append(sample(10, 30), dir)
    def run(name: String, v2: Boolean) = {
      val r = spark.readStream.format("txlog").option("path", dir)
      val q = (if (v2) r.option("streamApi", "v2") else r).load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try { q.processAllAvailable(); q } finally q.stop()
    }
    val qv2 = run("txv2_full", v2 = true)
    assertV2(qv2)
    val q1 = run("txv1_full", v2 = false)
    assert(!Option(q1.lastProgress).map(_.sources.head.description)
      .getOrElse("").startsWith("TxLogMicroBatchStream"),
      "the bare read must stay on the spec-pinned v1 Source")
    val (a, b) = (spark.table("txv2_full"), spark.table("txv1_full"))
    assert(a.schema == b.schema,
      s"v2 schema ${a.schema} must equal v1's ${b.schema}")
    val key = Seq("_commit_version", "id")
    assert(a.orderBy(key.map(col): _*).collect().toSeq ==
           b.orderBy(key.map(col): _*).collect().toSeq,
      "v2 and v1 must deliver identical tagged rows")
    assert(a.count() == 30)
  }

  test("v2 restart from checkpoint resumes at the first unprocessed commit, exactly once") {
    val dir = freshDir("graft-txv2")
    val sink = freshDir("graft-txv2sink")
    val ckpt = freshDir("graft-txv2ck")
    TxLog.append(sample(0, 10), dir)
    def runOnce(): Unit = {
      val q = v2Reader(dir).load()
        .select("id", "k", "_commit_version")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable(); assertV2(q) } finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 10)
    TxLog.append(sample(10, 15), dir)
    TxLog.append(sample(15, 25), dir)
    runOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() == 25 && out.select("id").distinct().count() == 25)
    assert(out.groupBy("_commit_version").count().as[(Long, Long)]
      .collect().toMap == Map(0L -> 10L, 1L -> 5L, 2L -> 10L))
  }

  test("a v1 checkpoint restarts on v2 (and back) — offsets are the same commit versions") {
    val dir = freshDir("graft-txv2x")
    val sink = freshDir("graft-txv2xsink")
    val ckpt = freshDir("graft-txv2xck")
    def runOnce(v2: Boolean): Unit = {
      val r = spark.readStream.format("txlog").option("path", dir)
      val q = (if (v2) r.option("streamApi", "v2") else r).load()
        .select("id", "_commit_version")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    TxLog.append(sample(0, 10), dir)       // v0
    runOnce(v2 = false)                    // delivered by the v1 Source
    TxLog.append(sample(10, 15), dir)      // v1: lands while "down"
    runOnce(v2 = true)                     // SAME checkpoint, v2 engine
    TxLog.append(sample(15, 18), dir)      // v2
    runOnce(v2 = false)                    // and back
    val out = spark.read.parquet(sink)
    // exactly-once across the api switches: no re-delivery, no skip
    assert(out.count() == 18 && out.select("id").distinct().count() == 18)
    assert(out.groupBy("_commit_version").count().as[(Long, Long)]
      .collect().toMap == Map(0L -> 10L, 1L -> 5L, 2L -> 3L))
  }

  test("v2 startingVersion=latest binds at FIRST start and persists the v1-compatible floor") {
    val dir = freshDir("graft-txv2l")
    val sink = freshDir("graft-txv2lsink")
    val ckpt = freshDir("graft-txv2lck")
    TxLog.append(sample(0, 10), dir)       // pre-start history: excluded
    def runOnce(): Unit = {
      val q = v2Reader(dir).option("startingVersion", "latest").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // resolves and persists floor = 1
    TxLog.append(sample(10, 15), dir)
    TxLog.append(sample(15, 25), dir)
    runOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() == 15, "downtime commits were skipped on restart")
    assert(out.filter("id < 10").count() == 0,
      "pre-start history must stay excluded")
  }

  test("v2 maxCommitsPerTrigger bounds each micro-batch and survives a restart") {
    val dir = freshDir("graft-txv2c")
    (0 until 5).foreach(i => TxLog.append(sample(i * 10, i * 10 + 10), dir))
    val sink = freshDir("graft-txv2csink")
    val ckpt = freshDir("graft-txv2cck")
    def runOnce(): Int = {
      val q = v2Reader(dir).option("maxCommitsPerTrigger", "2").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    }
    val batches = runOnce()
    assert(batches == 3, s"expected 3 admission-controlled batches, got $batches")
    assert(spark.read.parquet(sink).count() == 50)
    TxLog.append(sample(50, 53), dir)
    TxLog.append(sample(53, 55), dir)
    TxLog.append(sample(55, 60), dir)
    val batches2 = runOnce()
    assert(batches2 == 2, s"expected 2 post-restart batches, got $batches2")
    val out = spark.read.parquet(sink)
    assert(out.count() == 60 && out.select("id").distinct().count() == 60)
  }

  test("v2 Trigger.AvailableNow drains the backlog in bounded batches, then terminates") {
    val dir = freshDir("graft-txv2an")
    (0 until 5).foreach(i => TxLog.append(sample(i * 10, i * 10 + 10), dir))
    val sink = freshDir("graft-txv2ansink")
    val ckpt = freshDir("graft-txv2anck")
    def runAvailableNow(): Int = {
      val q = v2Reader(dir).option("maxCommitsPerTrigger", "2").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow run must self-terminate")
      q.recentProgress.count(_.numInputRows > 0)
    }
    val batches = runAvailableNow()
    assert(batches == 3, s"expected 3 bounded batches, got $batches")
    assert(spark.read.parquet(sink).count() == 50)
    // commits landing AFTER the run wait for the next one
    TxLog.append(sample(50, 55), dir)
    assert(runAvailableNow() == 1)
    assert(spark.read.parquet(sink).count() == 55)
  }

  test("v2 rewrite posture: rearrangements advance rowlessly, content rewrites fail loud, skipRewrites opts out") {
    val dir = freshDir("graft-txv2rw")
    TxLog.append(sample(0, 10), dir)
    TxLog.append(sample(10, 20), dir)
    val sink = freshDir("graft-txv2rwsink")
    val ckpt = freshDir("graft-txv2rwck")
    def start() = v2Reader(dir).load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      TxLog.optimize(spark, dir, Seq("id"), 2) // row-neutral: rowless advance
      TxLog.append(sample(20, 25), dir)
      q.processAllAvailable()
      assert(spark.read.parquet(sink).count() == 25,
        "optimize must advance rowlessly, appends keep flowing")
      TxLog.delete(spark, dir, "id < 3")       // CoW rewrite: loud
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(rootMessages(failed).exists(m => m != null &&
          m.contains("content-changing rewrite") && m.contains("skipRewrites")),
        s"wrong failure: ${failed.getMessage}")
    } finally q.stop()
    assert(spark.read.parquet(sink).count() == 25)
    // skipRewrites=true advances past the rewrite and keeps delivering
    val ckpt2 = freshDir("graft-txv2rwck2")
    val sink2 = freshDir("graft-txv2rwsink2")
    TxLog.append(sample(30, 34), dir)
    val q2 = v2Reader(dir).option("skipRewrites", "true").load()
      .writeStream.format("parquet")
      .option("path", sink2).option("checkpointLocation", ckpt2).start()
    try { q2.processAllAvailable(); assertV2(q2) } finally q2.stop()
    // 25 pre-delete rows re-read? No: full history MINUS the rewrite's
    // re-materialized adds — the three original appends (25) + the
    // post-delete append (4); the delete commit's add set is skipped
    assert(spark.read.parquet(sink2).count() == 29,
      s"got ${spark.read.parquet(sink2).count()}")
  }

  test("v2 vacuum past an unprocessed offset fails PLAN-TIME loud — even a no-op sink cannot commit past it") {
    val dir = freshDir("graft-txv2vac")
    val ckpt = freshDir("graft-txv2vacck")
    TxLog.append(sample(0, 10), dir)                   // v0
    // a no-op foreachBatch sink: never touches the frame. On v1's
    // lazy interlock this silently commits past the vacuumed range
    // (the documented gap); v2 throws in planInputPartitions, which
    // no sink behavior can bypass.
    def runNoop(): Unit = {
      val q = v2Reader(dir).option("skipRewrites", "true").load()
        .writeStream.foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => ())
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    runNoop()                                          // v0 committed
    TxLog.append(sample(10, 15), dir)                  // v1: never delivered
    TxLog.delete(spark, dir, "id >= 10")               // v2 supersedes v1
    TxLog.vacuum(dir, keepVersions = 1)                // reclaims v1's bytes
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runNoop()
    }
    assert(rootMessages(failed).exists(m => m != null &&
        m.contains("vacuumed") && m.contains("retention")),
      s"wrong failure: ${failed.getMessage}")
  }

  test("v2 restart over an already-committed (then vacuumed) range does not wedge") {
    val dir = freshDir("graft-txv2vr")
    val sink = freshDir("graft-txv2vrsink")
    val ckpt = freshDir("graft-txv2vrck")
    def runOnce(): Unit = {
      val q = v2Reader(dir).option("skipRewrites", "true").load()
        .select("id", "k", "_commit_version")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    TxLog.append(sample(0, 10), dir)          // v0
    TxLog.append(sample(10, 15), dir)         // v1
    runOnce()                                 // both delivered + committed
    // retention passes the DELIVERED v1: the v2 engine never re-plans
    // a committed range, so the restart proceeds naturally — no lazy
    // frame needed
    TxLog.delete(spark, dir, "id >= 10")      // v2: supersedes v1's segment
    TxLog.vacuum(dir, keepVersions = 1)
    TxLog.append(sample(20, 23), dir)         // v3: new rows
    runOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() == 18, s"got ${out.count()}")
    assert(out.groupBy("_commit_version").count().as[(Long, Long)]
      .collect().toMap == Map(0L -> 10L, 1L -> 5L, 3L -> 3L))
  }

  test("v2 drift guards: a column added or dropped mid-stream fails the stream loud") {
    val dir = freshDir("graft-txv2dr")
    TxLog.append(sample(0, 10), dir)
    val ckpt = freshDir("graft-txv2drck")
    val sink = freshDir("graft-txv2drsink")
    def start() = v2Reader(dir).load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      // ADD side: an evolved append mid-stream
      TxLog.append(sample(10, 15, extra = true), dir)
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(rootMessages(failed).exists(m => m != null &&
          m.contains("schema changed mid-stream")), failed.getMessage)
    } finally q.stop()
    // DROP side, fresh table/stream
    val dir2 = freshDir("graft-txv2dr2")
    TxLog.append(sample(0, 10), dir2)
    val ckpt2 = freshDir("graft-txv2dr2ck")
    val sink2 = freshDir("graft-txv2dr2sink")
    val q2 = v2Reader(dir2).load()
      .writeStream.format("parquet")
      .option("path", sink2).option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      TxLog.dropColumn(spark, dir2, "k")
      TxLog.append(spark.range(10, 14).select(col("id")), dir2)
      val failed2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(rootMessages(failed2).exists(m => m != null &&
          m.contains("dropped mid-stream")), failed2.getMessage)
    } finally q2.stop()
  }

  private def sample(lo: Int, hi: Int, extra: Boolean)
      : org.apache.spark.sql.DataFrame =
    if (!extra) sample(lo, hi)
    else spark.range(lo.toLong, hi.toLong).select(col("id"),
      (col("id") % 5).as("k"), lit("x").as("tag"))

  test("v2 add-empty commits advance the offset rowlessly (MoR delete)") {
    val dir = freshDir("graft-txv2mor")
    TxLog.append(sample(0, 20), dir)                     // v0
    val q = v2Reader(dir).load()
      .groupBy("_commit_version", "_commit_op")
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("txv2_mor").start()
    try {
      q.processAllAvailable()
      TxLog.deleteMoR(spark, dir, "k = 1")               // v1: add-empty
      TxLog.append(sample(20, 24), dir)                  // v2: new data
      q.processAllAvailable()
      assertV2(q)
      val rows = spark.table("txv2_mor")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(rows == Seq((0L, "append", 20L), (2L, "append", 4L)),
        s"got $rows")
    } finally q.stop()
  }

  test("v2 streams a column-mapped (renamed) table under its logical labels") {
    val dir = freshDir("graft-txv2map")
    TxLog.append(sample(0, 10), dir)
    TxLog.renameColumn(spark, dir, "k", "bucket")
    val q = v2Reader(dir).load()
      .writeStream.format("memory").queryName("txv2_map").start()
    try { q.processAllAvailable(); assertV2(q) } finally q.stop()
    val out = spark.table("txv2_map")
    assert(out.columns.toSeq ==
      Seq("id", "bucket", "_commit_version", "_commit_op"))
    assert(out.agg(sum(col("bucket"))).as[Long].head ==
      (0 until 10).map(_ % 5).sum)
  }

  test("v2 changeFeed streams the row-level feed: stream ≡ batch readChangeFeed ≡ v1 stream") {
    val dir = freshDir("graft-txv2cdf")
    TxLog.append(sample(0, 20), dir)                                 // v0
    TxLog.deleteMoR(spark, dir, "id % 5 = 0")                        // v1
    TxLog.updateMoR(spark, dir, "id % 5 = 1", Map("k" -> "k + 100")) // v2
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "k", "_commit_version", "_commit_op", "_change_type")
      .as[(Long, Long, Long, String, String)].collect().sorted.toSeq
    def runOnce(v2: Boolean): Seq[(Long, Long, Long, String, String)] = {
      val sink = freshDir("graft-txv2cdfsink")
      val ckpt = freshDir("graft-txv2cdfck")
      var r = spark.readStream.format("txlog")
        .option("path", dir).option("changeFeed", "true")
      if (v2) r = r.option("streamApi", "v2")
      val q = r.load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        val d = Option(q.lastProgress).map(_.sources.head.description)
          .getOrElse("")
        assert(d.startsWith("TxLogMicroBatchStream") == v2,
          s"wrong engine for v2=$v2: '$d'")
      } finally q.stop()
      canon(spark.read.parquet(sink))
    }
    val streamed = runOnce(v2 = true)
    assert(streamed == canon(TxLog.readChangeFeed(spark, dir, fromVersion = -1)),
      "v2 streamed change feed must equal the batch change feed")
    assert(streamed == runOnce(v2 = false),
      "v2 streamed change feed must equal the v1 streamed feed")
    assert(streamed.count(_._5 == "delete") == 4)
    assert(streamed.filter(_._5 == "delete").map(_._1).toSet ==
      Set(0L, 5L, 10L, 15L))
    assert(streamed.count(_._5 == "update_preimage") == 4)
    assert(streamed.filter(_._5 == "update_postimage").forall(_._2 >= 100),
      "post-images must carry the updated value")
  }

  test("v2 changeFeed restart delivers only the downtime DML; rearrangements emit zero rows") {
    val dir = freshDir("graft-txv2cdfr")
    TxLog.append(sample(0, 10), dir)                 // v0
    val sink = freshDir("graft-txv2cdfrsink")
    val ckpt = freshDir("graft-txv2cdfrck")
    def runOnce(): Unit = {
      val q = v2Reader(dir).option("changeFeed", "true").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 10)
    TxLog.deleteMoR(spark, dir, "id >= 7")           // v1: while down
    TxLog.optimize(spark, dir, Seq("id"), 2)         // v2: rearrangement
    TxLog.append(sample(10, 12), dir)                // v3
    runOnce()
    val out = spark.read.parquet(sink)
    val byType = out.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 12L, "delete" -> 3L), s"got $byType")
    assert(out.filter(col("_commit_op") === "optimize").count() == 0,
      "a pure rearrangement must contribute no change rows")
  }

  test("v2 changeFeed fails PLAN-TIME loud on unrecorded content rewrites; coarseRewrites opts in") {
    val dir = freshDir("graft-txv2coarse")
    TxLog.append(sample(0, 10), dir)       // v0
    TxLog.delete(spark, dir, "id < 2")     // v1: PRE-flag coarse rewrite
    TxLog.enableChangeDataFeed(dir)        // v2: head flag on
    TxLog.append(sample(10, 12), dir)      // v3
    def start(opts: Map[String, String], name: String) = {
      var r = v2Reader(dir).option("changeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().writeStream.format("memory").queryName(name).start()
    }
    // on v2 the guard throws at PLAN time (no lazy frame needed —
    // the engine never re-plans committed ranges), same typed message
    val q0 = start(Map.empty, "txv2_coarse_dead")
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q0.processAllAvailable() finally q0.stop()
    }
    assert(rootMessages(failed).exists(m => m != null &&
        m.contains("changes content") && m.contains("coarseRewrites")),
      s"wrong failure: ${failed.getMessage}")
    val q = start(Map("coarseRewrites" -> "true"), "txv2_coarse_ok")
    try { q.processAllAvailable(); assertV2(q) } finally q.stop()
    val out = spark.table("txv2_coarse_ok")
    assert(out.filter(col("_commit_version") === 1L).count() == 8)
    assert(out.filter(col("_commit_version") === 3L).count() == 2)
  }

  test("streamApi is validated strictly; v2 is a readStream-only option") {
    val dir = freshDir("graft-txv2bad")
    TxLog.append(sample(0, 5), dir)
    // bad value → loud at resolution
    val e1 = intercept[Exception] {
      spark.readStream.format("txlog").option("path", dir)
        .option("streamApi", "v3").load()
    }
    assert(rootMessages(e1).exists(_.contains("streamApi must be v1 or v2")),
      e1.getMessage)
    // batch read with the option → loud at execution (toBatch)
    val e2 = intercept[Exception] {
      spark.read.format("txlog").option("streamApi", "v2").load(dir).collect()
    }
    assert(rootMessages(e2).exists(_.contains("readStream option")),
      e2.getMessage)
    // coarseRewrites without changeFeed: the v1-identical rejection
    val e3 = intercept[Exception] {
      val q = v2Reader(dir).option("coarseRewrites", "true").load()
        .writeStream.format("memory").queryName("txv2_coarse").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(rootMessages(e3).exists(_.contains("coarseRewrites applies to")),
      e3.getMessage)
    // a catalog-registered table resolved its relation BEFORE any
    // per-read option could reach schema()/capabilities — a per-read
    // streamApi there must fail loud, not build a scan whose schema
    // disagrees with the relation's
    spark.sql("DROP TABLE IF EXISTS txv2_cat")
    spark.sql(s"CREATE TABLE txv2_cat USING txlog LOCATION '$dir'")
    try {
      val e4 = intercept[Exception] {
        spark.read.option("streamApi", "v2").table("txv2_cat").collect()
      }
      assert(rootMessages(e4).exists(_.contains(
        "must be passed where the table resolves")), e4.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS txv2_cat")
  }

  test("a streamApi=v2 TABLE PROPERTY registers a STREAM-ONLY table: readStream works, batch SELECT fails loud") {
    val dir = freshDir("graft-txv2prop")
    TxLog.append(sample(0, 10), dir)
    spark.sql("DROP TABLE IF EXISTS txv2_prop")
    // the option in CREATE TABLE OPTIONS is the schema authority for
    // EVERY resolution of this registration — the documented
    // stream-only trade (batch consumers read the log via its path or
    // a second registration)
    spark.sql("CREATE TABLE txv2_prop USING txlog " +
      s"OPTIONS (path '$dir', streamApi 'v2')")
    try {
      val q = spark.readStream.table("txv2_prop")
        .writeStream.outputMode("append")
        .format("memory").queryName("txv2_prop_out").start()
      try { q.processAllAvailable(); assertV2(q) } finally q.stop()
      val got = spark.table("txv2_prop_out")
      assert(got.schema.fieldNames.toSeq ==
        Seq("id", "k", "_commit_version", "_commit_op"),
        s"catalog stream must carry the meta columns: ${got.schema}")
      assert(got.count() == 10)
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM txv2_prop").collect()
      }
      assert(rootMessages(e).exists(_.contains("STREAM-ONLY")),
        s"batch SELECT of the stream-only registration must say so: " +
          rootMessages(e).mkString(" | "))
    } finally spark.sql("DROP TABLE IF EXISTS txv2_prop")
  }
}
