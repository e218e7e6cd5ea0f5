package graft.sources.kv

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's `key \t value` text
  * format (ref: PageRankAlgorithm.java:67 TextOutputFormat defaults,
  * re-parsed positionally at :326-341) — `spark.read.format("graftkv")`.
  *
  * [[graft.sources.TextKV.readKV]] already serves the format through
  * `spark.read.text` + expressions; this connector is the ENGINE-NATIVE
  * integration of the same byte contract, demonstrating the full V2
  * surface on a format Spark does not ship:
  *
  *  - '''splittable planning''': each file fans out into byte-range
  *    [[KVRange]] partitions (`maxSplitBytes` option, default 64 MB) —
  *    the contract a 100 TB corpus needs; a range owns exactly the
  *    lines that START inside it, the classic TextInputFormat rule, so
  *    a line straddling a boundary is read once and skipped once
  *    (boundary-sweep spec-pinned);
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): a
  *    key-only projection never materializes values (the tab scan
  *    stops at the first separator) — visible as the narrowed
  *    `ReadSchema` in explain;
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): `key = x` /
  *    `key LIKE 'x%'` evaluate inside the reader before any row
  *    reaches the exec — surfaced as `PushedFilters`, the same
  *    contract the parquet scan shows.
  *
  * Lines split on the FIRST tab; a line with no tab yields (line,
  * NULL) — faithful to the reference's `split("\t")[0]` treatment.
  * Reads go through the Hadoop FileSystem API, so any scheme Hadoop
  * resolves (file:, hdfs:, s3a:) works unchanged.
  */
class KVSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftkv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KVSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new KVTable(KVSource.paths(properties), KVSource.maxSplit(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object KVSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** `.load(p)` lands in `paths` as a JSON array (or `path` singular);
    * minimal parse — keys here are filesystem paths, not arbitrary
    * JSON (no embedded quotes/commas). */
  private[kv] def paths(props: JMap[String, String]): Seq[String] = {
    val single = Option(props.get("path")).toSeq
    val multi = Option(props.get("paths")).toSeq.flatMap { js =>
      js.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val all = single ++ multi
    require(all.nonEmpty, "graftkv needs a path — spark.read.format(\"graftkv\").load(p)")
    all
  }

  private[kv] def maxSplit(props: JMap[String, String]): Long = {
    val v = Option(props.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(64L * 1024 * 1024)
    require(v > 0, "maxSplitBytes must be positive")
    v
  }
}

class KVTable(paths: Seq[String], maxSplitBytes: Long)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graftkv(${paths.mkString(",")})"
  override def schema(): StructType = KVSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KVScanBuilder(paths, maxSplitBytes,
      Option(options.get("filesPerTrigger")).map(_.toInt)
        .getOrElse(Int.MaxValue))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new KVWriteBuilder(paths.head, info)
}

class KVScanBuilder(paths: Seq[String], maxSplitBytes: Long,
                    filesPerTrigger: Int = Int.MaxValue)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = KVSource.fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept key-equality and key-prefix; everything else stays with
    * Spark. The reader evaluates accepted filters, but Spark ALSO
    * re-evaluates them (we do not claim exactness via pushedFilters
    * returning empty) — conservative and always correct. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ EqualTo("key", _: String) => f
      case f @ StringStartsWith("key", _) => f
    }
    filters // residual: Spark keeps them all (re-check is cheap)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new KVScan(paths, maxSplitBytes, required, pushed, filesPerTrigger)
}

/** One byte range of one file. */
case class KVRange(file: String, start: Long, length: Long) extends InputPartition

class KVScan(paths: Seq[String], maxSplitBytes: Long,
             required: StructType, filters: Array[Filter],
             filesPerTrigger: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftkv ${paths.mkString(",")} PushedFilters: ${filters.mkString("[", ", ", "]")}"

  /** Deterministically ordered (path, length) list — shared by the batch
    * planner and the micro-batch offset space (an offset IS an index
    * into this list, so ordering must be stable). */
  private[kv] def listFiles(): Seq[(String, Long)] = {
    val conf = new Configuration()
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val files = fs.globStatus(path) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case st => st.flatMap { s =>
          if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile)
          else Array(s)
        }
      }
      files.filter(f => f.getLen > 0 && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.endsWith(".inprogress"))
        .map(f => (f.getPath.toString, f.getLen))
    }.sortBy(_._1)
  }

  private[kv] def ranges(files: Seq[(String, Long)]): Array[InputPartition] =
    files.flatMap { case (p, len) =>
      (0L until len by maxSplitBytes).map { off =>
        KVRange(p, off, math.min(maxSplitBytes, len - off))
      }
    }.toArray

  override def planInputPartitions(): Array[InputPartition] = ranges(listFiles())

  override def createReaderFactory(): PartitionReaderFactory = {
    val needKey = required.fieldNames.contains("key")
    val needValue = required.fieldNames.contains("value")
    val eq = filters.collectFirst { case EqualTo("key", v: String) => v }
    val prefix = filters.collectFirst { case StringStartsWith("key", v) => v }
    KVReaderFactory(needKey, needValue, eq, prefix)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KVMicroBatchStream(this, filesPerTrigger)
}

/** File-granular micro-batch streaming over the SAME byte contract:
  * the offset space is an index into the stable sorted file list, and
  * each trigger admits at most `filesPerTrigger` new files (so a
  * bounded directory replays as a multi-batch stream — the shape the
  * stream ≡ batch spec needs to exercise real batch boundaries). Files
  * must be immutable once listed, the standard file-stream contract.
  */
class KVMicroBatchStream(scan: KVScan, filesPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}

  // snapshot once: a stable offset space for the run
  private lazy val files = scan.listFiles()
  private var lastEnd = 0

  override def initialOffset(): SOffset = KVOffset(0)
  override def latestOffset(): SOffset = {
    // LONG arithmetic: the default filesPerTrigger is Int.MaxValue and
    // `lastEnd + Int.MaxValue` would wrap negative, emitting bogus
    // offsets and a stream that never quiesces (review r4)
    lastEnd = math.min(files.size.toLong,
      lastEnd.toLong + math.max(1, filesPerTrigger).toLong).toInt
    KVOffset(lastEnd)
  }
  override def deserializeOffset(json: String): SOffset = {
    // restart path: Spark replays the checkpointed offset through here —
    // advance the admission cursor so already-committed files are never
    // re-admitted (lastEnd would otherwise restart at 0 and re-emit)
    val n = json.trim.toInt
    lastEnd = math.max(lastEnd, n)
    KVOffset(n)
  }
  override def commit(end: SOffset): Unit =
    lastEnd = math.max(lastEnd, end.asInstanceOf[KVOffset].n)
  override def stop(): Unit = ()

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] =
    scan.ranges(files.slice(start.asInstanceOf[KVOffset].n,
      end.asInstanceOf[KVOffset].n))

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()
}

case class KVOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

case class KVReaderFactory(needKey: Boolean, needValue: Boolean,
                           keyEquals: Option[String], keyPrefix: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KVRangeReader(partition.asInstanceOf[KVRange], needKey, needValue,
      keyEquals, keyPrefix)
}

/** Reads the lines STARTING in [start, start+length); the line running
  * past the range end is completed here and skipped by the next range
  * (which begins mid-line and discards up to its first newline). */
class KVRangeReader(range: KVRange, needKey: Boolean, needValue: Boolean,
                    keyEquals: Option[String], keyPrefix: Option[String])
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val path = new Path(range.file)
  private val in = path.getFileSystem(conf).open(path)
  private val end = range.start + range.length
  private var pos: Long = range.start
  private var done = false
  private var row: InternalRow = _
  private val buf = new java.io.ByteArrayOutputStream(256)

  // A range at offset 0 owns the first line; any other range begins
  // mid-line (or exactly at a boundary — indistinguishable, and the
  // convention stays consistent because the PREVIOUS range always reads
  // through its final newline) and skips to its first line start.
  if (range.start > 0) {
    in.seek(range.start - 1)
    pos = range.start - 1
    skipToNewline()
  } else in.seek(0L)

  private def skipToNewline(): Unit = {
    var b = in.read(); pos += 1
    while (b != -1 && b != '\n') { b = in.read(); pos += 1 }
    if (b == -1) done = true
  }

  /** Reads one full line (however far past `end` it runs); returns null
    * at EOF. Strips a trailing \r. */
  private def readLine(): Array[Byte] = {
    buf.reset()
    var b = in.read(); pos += 1
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); b = in.read(); pos += 1 }
    val arr = buf.toByteArray
    if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.dropRight(1) else arr
  }

  override def next(): Boolean = {
    while (!done) {
      // the NEXT line starts at `pos`; only lines starting before `end`
      // belong to this range
      if (pos >= end) { done = true; return false }
      val line = readLine()
      if (line == null) { done = true; return false }
      val tab = line.indexOf('\t'.toByte)
      val keyBytes = if (tab < 0) line else java.util.Arrays.copyOfRange(line, 0, tab)
      val key = UTF8String.fromBytes(keyBytes)
      val keep =
        keyEquals.forall(v => key != null && key.toString == v) &&
          keyPrefix.forall(v => key != null && key.toString.startsWith(v))
      if (keep) {
        val value =
          if (!needValue) null
          else if (tab < 0) null
          else UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(line, tab + 1, line.length))
        val vals = (needKey, needValue) match {
          case (true, true) => Array[Any](key, value)
          case (true, false) => Array[Any](key)
          case (false, true) => Array[Any](value)
          case (false, false) => Array.empty[Any]
        }
        row = InternalRow.fromSeq(vals.toSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
