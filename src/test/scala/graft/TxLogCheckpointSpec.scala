package graft

import org.apache.spark.sql.functions._
import graft.sources.{LogStore, TxLog}

/** Checkpointed log replay (O(checkpoint + tail) reads, never
  * O(versions)) and the Hadoop-FileSystem-backed log I/O path. */
class TxLogCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txcp").toString

  /** Metadata-file reads issued while running `body`. */
  private def metaReads[T](body: => T): (T, Long) = {
    val before = LogStore.metaReads.get()
    val r = body
    (r, LogStore.metaReads.get() - before)
  }

  test("a 500-commit table is read in O(checkpoint + tail) file opens") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    TxLog.append(Seq((2L, "b")).toDF("id", "v"), dir)
    // 500 metadata-only commits (no segments — the log length is what's
    // under test, not the data volume)
    (0 until 500).foreach(_ => TxLog.commit(dir, "noop", Seq.empty, Seq.empty))
    assert(TxLog.headVersion(dir) == 501)
    val (live, reads) = metaReads(TxLog.liveSegments(dir))
    assert(live.size == 2)
    // pointer (1) + checkpoint (1) + tail entries (< interval)
    val bound = 2 + TxLog.CheckpointInterval
    assert(reads <= bound,
      s"head read cost $reads metadata file reads (O(versions) replay?); " +
        s"expected <= $bound with checkpointing")
    val (_, headReads) = metaReads(TxLog.headVersion(dir))
    assert(headReads <= 2, s"headVersion read $headReads files; expected <= 2")
  }

  test("reads and time travel stay exact across checkpoint boundaries") {
    val dir = freshDir()
    // 23 segment commits → checkpoints at v9 and v19, 3-entry tail
    (0 until 23).foreach(i => TxLog.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir))
    assert(TxLog.read(spark, dir).count() == 23)
    // time travel BEFORE the first checkpoint (full replay fallback)
    assert(TxLog.read(spark, dir, asOf = 3).count() == 4)
    // time travel BETWEEN checkpoints (scan finds the v9 checkpoint)
    assert(TxLog.read(spark, dir, asOf = 14).count() == 15)
    // history is per-commit by definition and must still see everything
    assert(TxLog.history(spark, dir).count() == 23)
    // CDF across the checkpointed region
    val cdf = TxLog.readChangesSince(spark, dir, fromVersion = 18)
    assert(cdf.select("_commit_version").distinct().count() == 4)
    // vacuum across the checkpointed region: nothing dead (append-only)
    assert(TxLog.vacuum(dir).isEmpty)
  }

  test("a deleted checkpoint or pointer degrades to full replay, never wrong answers") {
    val dir = freshDir()
    (0 until 12).foreach(i => TxLog.append(Seq((i.toLong, "x")).toDF("id", "v"), dir))
    val ld = java.nio.file.Paths.get(dir, "_txlog")
    import scala.jdk.CollectionConverters._
    val l = java.nio.file.Files.list(ld)
    val cps = try l.iterator.asScala
      .filter(p => p.getFileName.toString.endsWith(".checkpoint") ||
        p.getFileName.toString == "_last_checkpoint").toList
    finally l.close()
    assert(cps.nonEmpty, "12 commits must have produced a checkpoint + pointer")
    cps.foreach(java.nio.file.Files.delete(_))
    assert(TxLog.read(spark, dir).count() == 12)
    assert(TxLog.headVersion(dir) == 11)
  }

  test("restore past a checkpoint re-records the resurrected segments' stats") {
    val dir = freshDir()
    // v0..v3: 4 stats-bearing segments with disjoint id ranges
    (0 until 4).foreach(i =>
      TxLog.appendWithStats(spark,
        Seq((i * 10L, "a"), (i * 10L + 9L, "b")).toDF("id", "v"), dir, Seq("id")))
    // v4: overwrite drops them all (live = 1 statless segment)
    TxLog.overwrite(Seq((999L, "z")).toDF("id", "v"), dir)
    // v5..v9: metadata commits so the v9 checkpoint sees ONLY the
    // overwrite segment (live-only metadata: old stats not in it)
    (0 until 5).foreach(_ => TxLog.commit(dir, "noop", Seq.empty, Seq.empty))
    // restore to v3: the 4 old segments come back; their stats must
    // ride in the restore entry or the layout turns unprunable
    TxLog.restore(dir, toVersion = 3)
    val (kept, pruned) = TxLog.pruneRange(dir, "id", Some("30"), Some("39"))
    assert(kept.size == 1 && pruned.size == 3,
      s"restored segments lost their stats: kept=$kept pruned=$pruned")
    assert(TxLog.read(spark, dir).count() == 8)
  }

  test("appendStream stays exactly-once across a checkpoint boundary") {
    val dir = freshDir()
    (0 until 12).foreach(i =>
      TxLog.appendStream(Seq((i.toLong, "e")).toDF("id", "v"), dir, batchId = i.toLong))
    // batch 0's op is now ONLY in the checkpoint fold, not the tail
    assert(TxLog.appendStream(Seq((0L, "dup")).toDF("id", "v"), dir, batchId = 0L).isEmpty,
      "replayed batch id must be skipped via the checkpointed streamop set")
    assert(TxLog.appendStream(Seq((12L, "e")).toDF("id", "v"), dir, batchId = 12L).nonEmpty)
    assert(TxLog.read(spark, dir).count() == 13)
  }

  test("FS-backed path: the full DML surface works against a file:/ table") {
    val dir = "file:" + java.nio.file.Files.createTempDirectory("graft-txfs").toString
    assert(graft.sources.LogStore.forPath(dir).getClass.getSimpleName
      == "HadoopLogStore", "a file: URI must route through the Hadoop FileSystem API")
    val v0 = TxLog.appendWithStats(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, Seq("id"),
      bloomCols = Seq("id"))
    val v1 = TxLog.appendWithStats(spark,
      Seq((10L, "x"), (19L, "y")).toDF("id", "v"), dir, Seq("id"),
      bloomCols = Seq("id"))
    assert(Seq(v0, v1) == Seq(0, 1))
    // stats pruning from log metadata through the Hadoop store
    val (kept, pruned) = TxLog.pruneRange(dir, "id", Some("10"), Some("19"))
    assert(kept.size == 1 && pruned.size == 1,
      s"unexpected prune split: kept=$kept pruned=$pruned")
    // bloom sidecar probe through the Hadoop store
    val (bk, bp) = TxLog.prunePoint(dir, "id", "10")
    assert(bk.size == 1, s"bloom+stats must isolate one segment: kept=$bk pruned=$bp")
    // CoW delete, snapshot isolation, time travel
    TxLog.delete(spark, dir, "id = 2")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((1L, "a"), (10L, "x"), (19L, "y")))
    assert(TxLog.read(spark, dir, asOf = 0).count() == 2)
    // conflict detection through the Hadoop CAS
    val stale = TxLog.headVersion(dir)
    TxLog.append(Seq((30L, "c")).toDF("id", "v"), dir)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.commit(dir, "delete", Seq.empty, Seq.empty, Some(stale))
    }
    // update + merge + optimize exercise staging renames via the store
    TxLog.update(spark, dir, "id = 30", Map("v" -> "'c2'"))
    TxLog.merge(spark, dir, Seq((1L, "a2"), (40L, "d")).toDF("id", "v"), "id")
    TxLog.optimize(spark, dir, Seq("id"), 2, statsCols = Seq("id"))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((1L, "a2"), (10L, "x"), (19L, "y"), (30L, "c2"), (40L, "d")))
    // vacuum reclaims superseded segments through the store
    val dead = TxLog.vacuum(dir, keepVersions = 1)
    assert(dead.nonEmpty)
    assert(TxLog.read(spark, dir).count() == 5)
    assert(TxLog.history(spark, dir).count() == TxLog.headVersion(dir) + 1)
  }

  test("coordinator strategy: a registered scheme commits through CoordinatedLogStore") {
    // opt the file: scheme into external-coordinator commits — the
    // object-store deployment shape (the FS below the coordinator only
    // needs read-after-write of complete objects, which file:/ has);
    // the full TxLog surface must behave identically through it
    LogStore.registerCoordinated("file")
    try {
      val dir = "file:" + java.nio.file.Files.createTempDirectory("graft-txcoord").toString
      assert(LogStore.forPath(dir).getClass.getSimpleName == "CoordinatedLogStore")
      TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
      TxLog.append(Seq((3L, "c")).toDF("id", "v"), dir)
      // optimistic concurrency is now arbitrated by the coordinator
      val stale = TxLog.headVersion(dir)
      TxLog.append(Seq((4L, "d")).toDF("id", "v"), dir)
      intercept[java.util.ConcurrentModificationException] {
        TxLog.commit(dir, "delete", Seq.empty, Seq.empty, Some(stale))
      }
      TxLog.delete(spark, dir, "id = 2")
      assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
        .toList == List((1L, "a"), (3L, "c"), (4L, "d")))
      assert(TxLog.read(spark, dir, asOf = 1).count() == 3) // time travel intact
      // racing writers on one slot: exactly one wins the claim
      val store = LogStore.forPath(dir)
      val slot = s"$dir/_txlog/race.txt"
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (0 until 8).map(i => new Thread(() =>
        if (store.putIfAbsent(slot, s"w$i".getBytes)) wins.incrementAndGet()))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(wins.get() == 1, s"${wins.get()} writers won one slot")
      // a file written OUTSIDE the coordinator's knowledge counts as
      // taken (claim-then-check, never blind trust in the claim table)
      val pre = s"$dir/_txlog/preexisting.txt"
      // write below the coordinator: straight through the FileSystem
      val fs = new org.apache.hadoop.fs.Path(pre)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(pre), true)
      try out.write("old".getBytes) finally out.close()
      assert(!store.putIfAbsent(pre, "new".getBytes))
      assert(new String(store.readBytes(pre), "UTF-8") == "old")
    } finally LogStore.unregisterCoordinated("file")
  }

  test("multi-driver coordinator stress: interleaved claimants across store instances, one winner per slot") {
    // Simulates the multi-process deployment the in-JVM default cannot
    // cover from a single store instance: each "driver" constructs its
    // OWN CoordinatedLogStore (separate store state, as separate JVMs
    // would) over a SHARED coordinator — the pluggable seam
    // registerCoordinated accepts. The inner store is NioLogStore,
    // whose rename is POSIX ATOMIC_MOVE and therefore silently
    // REPLACES: if the coordinator's claim arbitration has a hole, a
    // lost race overwrites the winner's bytes and the content check
    // below catches it — the protocol, not the filesystem, must win.
    import graft.sources.{CoordinatedLogStore, LogCoordinator, NioLogStore}
    class MapCoordinator extends LogCoordinator {
      private val m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
      def claim(path: String): Boolean =
        m.putIfAbsent(path, java.lang.Boolean.TRUE) == null
      def release(path: String): Unit = { m.remove(path); () }
      def releaseUnder(path: String): Unit = {
        val prefix = if (path.endsWith("/")) path else path + "/"
        val it = m.keySet.iterator
        while (it.hasNext) {
          val k = it.next
          if (k == path || k.startsWith(prefix)) it.remove()
        }
      }
    }
    val coord = new MapCoordinator
    val base = java.nio.file.Files.createTempDirectory("graft-coordstress").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/_txlog"))
    val nDrivers = 4; val nSlots = 40
    val drivers = (0 until nDrivers).map(_ =>
      new CoordinatedLogStore(NioLogStore, coord))
    val slots = (0 until nSlots).map(v => f"$base/_txlog/$v%08d.txt")
    val winners = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val doubleWins = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(nDrivers * 2)
    val threads = for (d <- 0 until nDrivers; t <- 0 until 2) yield new Thread(() =>
      try {
        barrier.await()
        val order = new scala.util.Random(d * 31 + t).shuffle(slots.toList)
        order.foreach { slot =>
          val id = s"d$d-t$t"
          if (drivers(d).putIfAbsent(slot, id.getBytes("UTF-8")))
            if (winners.putIfAbsent(slot, id) != null) doubleWins.add(slot)
        }
      } catch { case e: Throwable => errs.add(e); () })
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"claimant failures: ${errs.toArray.toSeq}")
    assert(doubleWins.isEmpty, s"slots with two winners: ${doubleWins.toArray.toSeq}")
    assert(winners.size == nSlots, s"unclaimed slots: ${winners.size}/$nSlots")
    // the bytes on disk are the CLAIM WINNER's — a replace-through-rename
    // by any loser would fail this
    slots.foreach { slot =>
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(slot)), "UTF-8")
      assert(content == winners.get(slot),
        s"slot $slot holds '$content' but the claim winner was '${winners.get(slot)}'")
    }
  }

  test("two-JVM coordinator race: FileClaimCoordinator arbitrates across processes") {
    // The race the in-process stress CANNOT run: separate JVMs share
    // nothing but the claims directory, so the only thing arbitrating
    // slot ownership is FileClaimCoordinator's hard-link claim publish.
    // This process and two child `java` processes (ClaimRaceChild, the
    // forked test JVM's own classpath) each race putIfAbsent over the
    // same 60 slots through their own CoordinatedLogStore; exactly one
    // claimant per slot may win, and the bytes on disk must be that
    // winner's — NioLogStore's rename would silently REPLACE, so any
    // arbitration hole shows up as content from a loser.
    import graft.sources.{CoordinatedLogStore, FileClaimCoordinator, NioLogStore}
    val root = java.nio.file.Files.createTempDirectory("graft-claimrace")
    val claims = root.resolve("_claims"); val base = root.resolve("slots")
    java.nio.file.Files.createDirectories(base)
    val nSlots = 60
    val slots = (0 until nSlots).map(v => f"$base/$v%08d.txt")
    def spawn(id: String): (Process, java.nio.file.Path) = {
      val wonFile = root.resolve(s"won-$id.txt")
      val pb = new ProcessBuilder(
        s"${System.getProperty("java.home")}/bin/java",
        "-cp", System.getProperty("java.class.path"),
        "graft.ClaimRaceChild",
        claims.toString, base.toString, nSlots.toString, id,
        wonFile.toString)
      pb.redirectErrorStream(true)
      pb.redirectOutput(root.resolve(s"child-$id.log").toFile)
      (pb.start(), wonFile)
    }
    val children = Seq(spawn("jvm-a"), spawn("jvm-b"))
    // the parent races too, through its own store instance
    val mine = new scala.util.Random(7).shuffle(slots.toList).filter { slot =>
      new CoordinatedLogStore(NioLogStore, new FileClaimCoordinator(claims))
        .putIfAbsent(slot, "parent".getBytes("UTF-8"))
    }
    children.foreach { case (proc, _) =>
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(proc.exitValue() == 0,
        s"child JVM failed (exit ${proc.exitValue()}) — see $root/child-*.log")
    }
    val childWins = children.map { case (_, wonFile) =>
      new String(java.nio.file.Files.readAllBytes(wonFile), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
    }
    val byClaimant = Map("parent" -> mine.toSeq,
      "jvm-a" -> childWins(0), "jvm-b" -> childWins(1))
    val all = byClaimant.values.flatten.toSeq
    assert(all.size == all.distinct.size,
      s"a slot was won twice across JVMs: ${all.diff(all.distinct)}")
    assert(all.toSet == slots.toSet,
      s"unwon slots: ${slots.toSet -- all.toSet}")
    // disk bytes are the claim winner's, for every slot
    byClaimant.foreach { case (id, won) =>
      won.foreach { slot =>
        val content = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(slot)), "UTF-8")
        assert(content == id,
          s"slot $slot holds '$content' but the cross-process winner was '$id'")
      }
    }
    // directory-deletion cleanup releases every claim under the table
    new FileClaimCoordinator(claims).releaseUnder(base.toString)
    assert(new FileClaimCoordinator(claims).claim(slots.head),
      "releaseUnder must free claims for re-arbitration")
  }
}
