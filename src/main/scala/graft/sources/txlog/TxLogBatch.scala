package graft.sources.txlog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graftshim.{CatalystPushdownScanBuilder, ParquetDelegate}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.TxLog

/** DSv2 BATCH read half of the `txlog` format —
  * `spark.read.format("txlog").load(dir)` (and SQL over a view of it)
  * with PLAN-INTEGRATED segment pruning: the optimizer pushes the
  * query's resolved filters into [[TxLogScanBuilder]], which routes
  * them through the same stats+bloom triage every other
  * arbitrary-predicate surface uses ([[TxLog.dsv2ScanInfo]] →
  * `triageByBounds`), so a `WHERE day = X` opens only X's segments —
  * no `readWhere` string routing needed. The scan itself DELEGATES to
  * Spark's own vectorized v2 parquet scan over the surviving segment
  * paths ([[ParquetDelegate.scan]]), with the filters re-pushed
  * (row-group/page skipping) and columns pruned — execution is exactly
  * a native parquet read of what survived, nothing reimplemented.
  *
  * Pruning is strictly CONSERVATIVE: every filter is also returned as
  * residual, so Spark re-applies it above the scan (the
  * FileScanBuilder contract) — a pruned segment is provably matchless,
  * a kept one is re-filtered exactly. Tables whose snapshot a plain
  * parquet delegate cannot express fail LOUD at scan build (deletion
  * vectors would resurrect tombstoned rows; column mapping would leak
  * physical names) with a pointer at [[TxLog.read]]/readWhere.
  * `option("asOf", v)` time-travels with the usual retention check. */
class TxLogTable(dir: String, asOf: Int)
    extends Table with SupportsRead {
  override def name(): String = s"txlog($dir)"
  /** LAZY shared snapshot (mapping-applied, evolution-merged schema +
    * the replayed state the scan build reuses): the streaming fallback
    * probe constructs this Table but consumes only capabilities, so
    * the replay+footer cost must not run until the BATCH path actually
    * asks — then ONE replay serves both schema() and build(), and the
    * snapshot is PINNED for this Table's lifetime (Delta pins at
    * relation creation for the same reason): a self-join/union of one
    * DataFrame plans two scans, and re-resolving per build would let a
    * commit between them make the two sides see different table
    * versions — results matching no single snapshot. A fresh load()
    * (or catalog resolution) constructs a fresh Table and sees the new
    * head. Loud on an empty table. */
  @volatile private var snapRef: TxLog.Dsv2Snapshot = null
  private[txlog] def resolved(): TxLog.Dsv2Snapshot = {
    var r = snapRef
    if (r == null) {
      r = TxLog.dsv2Resolve(SparkSession.active, dir, asOf)
      snapRef = r
    }
    r
  }
  override def schema(): StructType = resolved().schema
  override def capabilities(): java.util.Set[TableCapability] =
    // BATCH_READ only: streaming stays on the spec-pinned v1
    // Source/Sink halves (DataStreamReader falls back to them when the
    // table declares no MICRO_BATCH_READ)
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TxLogScanBuilder(SparkSession.active, dir, asOf, this)
}

class TxLogScanBuilder(spark: SparkSession, dir: String, asOf: Int,
                       table: TxLogTable)
    extends CatalystPushdownScanBuilder {
  private var exprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None

  /** Keep the resolved filters for segment triage and the delegate's
    * parquet pushdown; return ALL of them as residual — Spark
    * re-applies them above the scan, so the triage can only ever skip
    * provably matchless segments. */
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    exprs = filters
    filters
  }

  /** Plan metadata only (the residual contract above already keeps
    * correctness); the delegate scan node's own PushedFilters show the
    * parquet-level pushdown in explain. */
  override def pushedFilters: Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    val resolved = table.resolved() // pinned: one snapshot per Table
    val paths = TxLog.dsv2ScanInfo(spark, dir, asOf, exprs, resolved)
    if (paths.isEmpty) new TxLogEmptyScan(required.getOrElse(resolved.schema))
    else ParquetDelegate.scan(spark, paths, resolved.schema, exprs, required)
  }
}

/** Every segment pruned: a zero-partition scan carrying the pruned
  * schema (the planner still resolves the relation's output from it).
  * The reader factory is unreachable by construction — zero
  * partitions — and throws rather than fabricate rows. */
object TxLogBatch {
  /** Segment dirs among a frame's ACTUAL planned scan files — the
    * exact pin for "pruning reached the plan" assertions. Neither of
    * the obvious surfaces works: the executed-plan STRING truncates
    * long path lists (a regex over it can count one segment while the
    * scan holds two), and `Dataset.inputFiles` is empty for a
    * non-FileTable DSv2 relation. So walk to the delegate FileScan's
    * file index, unwrapping AQE (whose node is a childless leaf that
    * hides the scan from collect). */
  def plannedSegments(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def files(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => files(a.executedPlan)
      case other => other.collect {
        case b: BatchScanExec => b.scan match {
          case f: FileScan => f.fileIndex.inputFiles.toSeq
          case _           => Seq.empty[String]
        }
      }.flatten
    }
    // parent-anchored, like TxLog.segOfFile: matching `seg-` ANYWHERE
    // in the path would attribute every file to a `seg-`-shaped
    // ancestor directory and collapse the count to a vacuous 1
    files(df.queryExecution.executedPlan)
      .flatMap(f => "/(seg-[0-9a-fA-F-]+)/[^/]*$".r
        .findFirstMatchIn(f).map(_.group(1)))
      .distinct
  }
}

class TxLogEmptyScan(schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        throw new IllegalStateException("empty txlog scan has no partitions")
    }
}
