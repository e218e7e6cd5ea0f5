package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Base class giving a connector OUTSIDE the sql package the
  * catalyst-expression filter pushdown channel — the one Spark's own
  * file sources speak (`SupportsPushDownCatalystFilters` is
  * `private[sql]`): `V2ScanRelationPushDown` hands the ScanBuilder the
  * optimizer's RESOLVED data filters, richer than the public v1
  * `Filter` translation and exactly what a parquet delegate needs to
  * re-push verbatim. Same shim discipline as [[ColumnShim]]: no Spark
  * internals modified, only visibility re-exported. */
abstract class CatalystPushdownScanBuilder extends ScanBuilder
    with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns

object ParquetDelegate {
  /** Spark's own vectorized v2 parquet Scan over explicit `paths` with
    * a known `schema`: `exprs` are re-pushed through the standard
    * FileScanBuilder path (v1 translation → parquet row-group/page
    * skipping, surfaced as PushedFilters in explain) and `required`
    * prunes the read schema — so a log-format connector that has
    * already segment-pruned executes EXACTLY as a native parquet read
    * of the surviving segments (whole-stage codegen, vectorization,
    * and all). */
  def scan(spark: SparkSession, paths: Seq[String], schema: StructType,
           exprs: Seq[Expression], required: Option[StructType]): Scan = {
    val opts = new CaseInsensitiveStringMap(
      java.util.Collections.emptyMap[String, String]())
    val b = ParquetTable("txlog-delegate", spark, opts, paths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(opts)
    b.pushFilters(exprs)
    required.foreach(b.pruneColumns)
    b.build()
  }
}
