package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transaction-log table format over parquet — the log/ACID
  * layer the Warehouse sinks stop short of (Delta/Iceberg's core
  * mechanics, reduced to what a filesystem offers):
  *
  *  - A table is a directory: data SEGMENTS (each a parquet directory
  *    written once, never mutated) plus an append-only commit log
  *    `_txlog/%08d.txt` of add/remove segment sets.
  *  - COMMIT = write the entry to a temp name, then HARD-LINK it into
  *    the next version slot: `createLink` is the filesystem's true
  *    put-if-absent (POSIX rename silently replaces, so a move-based
  *    CAS would lose races). Appends retry onto the next free slot;
  *    snapshot-dependent ops (delete/overwrite/compact) are
  *    CONDITIONAL on the head they read and fail with
  *    ConcurrentModificationException if any commit intervened — the
  *    Delta protocol's commit-conflict rule, since their remove sets
  *    would otherwise double-apply.
  *  - READ = replay the log up to a version (default: head) into the
  *    live segment set, then scan exactly those parquet dirs. Readers
  *    never see a half-committed state (the entry appears atomically)
  *    and a snapshot pinned at version v is immutable forever —
  *    segments are never rewritten in place, only superseded.
  *  - TIME TRAVEL = replay to an older version: free, because remove
  *    entries only drop segments from the LIVE set; the bytes stay
  *    until a retention vacuum (not modeled) reclaims them.
  *  - DELETE = copy-on-write at segment granularity: only segments
  *    that actually contain matching rows are rewritten (the file-stats
  *    pruning of a real format, with a per-segment probe standing in
  *    for min/max stats); untouched segments carry over by reference.
  *  - COMPACT = read live set, write one consolidated segment, commit
  *    remove(live)+add(new): a metadata-only swap for readers, no
  *    logical change — the small-files answer under a log.
  *
  * Scale shape: the log is O(commits) tiny text files read by the
  * DRIVER (like Delta's JSON actions); data moves only through normal
  * distributed parquet jobs over the affected segments. Nothing here
  * holds rows on the driver.
  */
object TxLog {

  private def logDir(dir: String): Path = Paths.get(dir, "_txlog")

  private case class Entry(version: Int, op: String,
                           add: Seq[String], remove: Seq[String])

  private def entryPath(dir: String, v: Int): Path =
    logDir(dir).resolve(f"$v%08d.txt")

  private def parse(v: Int, lines: Seq[String]): Entry = {
    def vals(k: String) = lines.filter(_.startsWith(s"$k=")).map(_.drop(k.length + 1))
    Entry(v, vals("op").headOption.getOrElse("?"), vals("add"), vals("remove"))
  }

  /** All committed entries in version order (driver-side, O(commits)). */
  private def entries(dir: String): Seq[Entry] = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) return Seq.empty
    Iterator.from(0)
      .map(v => (v, entryPath(dir, v)))
      .takeWhile { case (_, p) => Files.exists(p) }
      .map { case (v, p) =>
        parse(v, new String(Files.readAllBytes(p), "UTF-8").linesIterator.toSeq)
      }
      .toSeq
  }

  /** Latest committed version, -1 for an empty/new table. */
  def headVersion(dir: String): Int = entries(dir).lastOption.map(_.version).getOrElse(-1)

  /** Live segment set as of `asOf` (-1 = head). */
  def liveSegments(dir: String, asOf: Int = -1): Seq[String] = {
    val upTo = entries(dir).filter(e => asOf < 0 || e.version <= asOf)
    require(asOf < 0 || upTo.exists(_.version == asOf),
      s"version $asOf does not exist in $dir (head=${headVersion(dir)})")
    val live = scala.collection.mutable.LinkedHashSet[String]()
    upTo.foreach { e => live --= e.remove; live ++= e.add }
    live.toSeq
  }

  /** Optimistic-concurrency commit: claims the next free version slot
    * via a HARD-LINK put-if-absent (`Files.createLink` fails with
    * FileAlreadyExists if the slot is taken — POSIX `rename(2)`, and
    * therefore ATOMIC_MOVE, silently REPLACES an existing target, so a
    * move-based CAS would let two racing writers claim the same slot
    * and lose a commit). Returns the committed version.
    *
    * `expectedHead` (>= -1) makes the commit CONDITIONAL: if any other
    * commit landed after the caller's snapshot, the claim lands on a
    * later slot and the commit is aborted (entry removed) with
    * ConcurrentModificationException — required for ops whose
    * remove set was computed from that snapshot (delete/overwrite/
    * compact); a blind append passes `None` and retries onto the next
    * free slot. */
  private[graft] def commit(dir: String, op: String,
                            add: Seq[String], remove: Seq[String],
                            expectedHead: Option[Int] = None): Int = {
    val ld = logDir(dir); Files.createDirectories(ld)
    val body = (Seq(s"op=$op") ++ add.map("add=" + _) ++ remove.map("remove=" + _))
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(ld, ".commit", ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    try {
      expectedHead match {
        case Some(eh) =>
          // conditional: only the snapshot's successor slot is
          // acceptable — claiming a later slot would validate a stale
          // remove set, and claim-then-withdraw would leave a GAP that
          // hides every later entry from the dense-scan replay
          val v = eh + 1
          try { Files.createLink(entryPath(dir, v), tmp); v }
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new java.util.ConcurrentModificationException(
                s"$op against stale snapshot of $dir: expected head $eh, " +
                  s"found ${headVersion(dir)} — recompute and retry")
          }
        case None =>
          var v = headVersion(dir) + 1
          while (true) {
            try { Files.createLink(entryPath(dir, v), tmp); return v }
            catch {
              case _: java.nio.file.FileAlreadyExistsException => v += 1
            }
          }
          v
      }
    } finally Files.deleteIfExists(tmp)
  }

  private def newSegment(dir: String, df: DataFrame): String = {
    val name = s"seg-${java.util.UUID.randomUUID}"
    df.write.mode("overwrite").parquet(s"$dir/$name")
    name
  }

  /** Append `df` as a new segment. */
  def append(df: DataFrame, dir: String): Int =
    commit(dir, "append", Seq(newSegment(dir, df)), Seq.empty)

  /** Replace the table contents with `df`. Conflicts (fails) if any
    * commit lands between the snapshot and this commit — the replaced
    * set would be stale. */
  def overwrite(df: DataFrame, dir: String): Int = {
    val snap = headVersion(dir)
    val live = liveSegments(dir, snap)
    commit(dir, "overwrite", Seq(newSegment(dir, df)), live, Some(snap))
  }

  /** Copy-on-write delete of rows matching `predicate`: rewrites ONLY
    * the segments that contain matches (per-segment probe ≈ file-stats
    * pruning); clean segments carry over untouched. */
  def delete(spark: SparkSession, dir: String, predicate: String): Int = {
    val snap = headVersion(dir)
    val live = liveSegments(dir, snap)
    val (dirty, clean) = live.partition { seg =>
      !spark.read.parquet(s"$dir/$seg").filter(predicate).isEmpty
    }
    if (dirty.isEmpty)
      return commit(dir, "delete", Seq.empty, Seq.empty, Some(snap))
    val kept = dirty.map(seg =>
      spark.read.parquet(s"$dir/$seg").filter(s"NOT ($predicate)"))
      .reduce(_ unionByName _)
    val _ = clean // clean segments survive by reference
    commit(dir, "delete", Seq(newSegment(dir, kept)), dirty, Some(snap))
  }

  /** Consolidate the live set into one segment — no logical change.
    * Conflicts (fails) on any concurrent commit, like [[delete]]. */
  def compact(spark: SparkSession, dir: String): Int = {
    val snap = headVersion(dir)
    val live = liveSegments(dir, snap)
    require(live.nonEmpty, s"compact of empty table $dir")
    val all = spark.read.parquet(live.map(s => s"$dir/$s"): _*).coalesce(1)
    commit(dir, "compact", Seq(newSegment(dir, all)), live, Some(snap))
  }

  /** Incremental read: ONLY the segments commit `version` ADDED — the
    * commit-by-commit consumption pattern of a downstream pipeline
    * (for an append-only table this is change-data-capture; a delete/
    * compact commit's add set is its rewrite output, so consumers that
    * must distinguish logical changes check the entry's `op`). */
  def readCommit(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val e = entries(dir).find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(
        s"version $version does not exist in $dir (head=${headVersion(dir)})"))
    require(e.add.nonEmpty, s"commit $version of $dir added no segments")
    spark.read.parquet(e.add.map(s => s"$dir/$s"): _*)
  }

  /** Retention vacuum: physically deletes segments that are not live
    * in ANY version newer than `head - keepVersions` (the retention
    * horizon). Time travel to vacuumed versions stops working — the
    * Delta VACUUM trade — but every retained version still replays
    * exactly, because a segment referenced by any retained snapshot is
    * kept. Returns the deleted segment names. Driver-side O(commits +
    * segments) metadata work; data deletion is per-directory. */
  def vacuum(dir: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the head version")
    val head = headVersion(dir)
    if (head < 0) return Seq.empty
    val horizon = math.max(0, head - keepVersions + 1)
    val retained = (horizon to head).flatMap(v => liveSegments(dir, v)).toSet
    val all = entries(dir).flatMap(_.add).toSet
    val doomed = (all -- retained).toSeq.sorted
    doomed.foreach { seg =>
      val p = Paths.get(dir, seg)
      if (Files.isDirectory(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator.asScala.foreach(Files.deleteIfExists(_))
      }
    }
    doomed
  }

  /** The op recorded by commit `version` (append/overwrite/delete/compact). */
  def commitOp(dir: String, version: Int): String =
    entries(dir).find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(s"no version $version"))
      .op

  /** Snapshot-isolated read as of `asOf` (-1 = head). The segment list
    * is resolved once, here; later commits cannot change what this
    * DataFrame reads. `mergeSchema = true` unions segment schemas
    * (schema EVOLUTION: an append may carry new columns; old segments
    * stay untouched and read as null for the added columns — the
    * add-column semantics of the log formats, without a rewrite). */
  def read(spark: SparkSession, dir: String, asOf: Int = -1,
           mergeSchema: Boolean = false): DataFrame = {
    val segs = liveSegments(dir, asOf)
    require(segs.nonEmpty, s"table $dir is empty as of version $asOf")
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(segs.map(s => s"$dir/$s"): _*)
  }
}
