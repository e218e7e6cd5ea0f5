package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality primitives for pipeline gating: a one-pass column
  * profiler and a one-pass declarative constraint checker (the
  * Deequ-style pre-training sanity gate, re-expressed as plain Catalyst
  * aggregates).
  *
  * Scale shape: BOTH surfaces are a single aggregation over a single
  * scan — the profile's per-column distinct counts ride Spark's
  * Expand-based multi-distinct (one shuffle of (expand_id, value)
  * pairs, map-side partials), and every check is a conditional
  * aggregate, so adding a check adds zero I/O. At 100 TB the profile
  * costs exactly one pass regardless of column count; referential
  * checks pre-join a broadcast key set so the scan stays single.
  */
object DataQuality {

  /** Column profile: one output row per profiled column with null
    * count, exact distinct count, and min/max rendered to strings.
    *
    * `cols` maps output name → an ORDERABLE, ENGINE-PORTABLE
    * normalization of the column (money → integer cents, timestamp →
    * epoch millis) — normalization happens before profiling so the
    * min/max string renderings can't drift between engines (a raw
    * double's shortest-round-trip text differs across runtimes).
    *
    * Single aggregate over a single scan; the per-column struct stack
    * explodes map-side from the 1-row aggregate.
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val aggExprs = cols.flatMap { case (n, c) => Seq(
      (count(lit(1)) - count(c)).as(s"${n}__nn"),
      countDistinct(c).as(s"${n}__nd"),
      min(c).cast("string").as(s"${n}__mn"),
      max(c).cast("string").as(s"${n}__mx"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stacked = cols.map { case (n, _) =>
      struct(lit(n).as("col_name"),
        col(s"${n}__nn").as("n_null"),
        col(s"${n}__nd").as("n_distinct"),
        col(s"${n}__mn").as("min_s"),
        col(s"${n}__mx").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Order-independent dataset fingerprint: exact row count + the sum
    * of a 32-bit md5-derived hash of each row's canonical string. Sum
    * is commutative, so ANY engine, partitioning, or row order
    * reproduces the same value — two pipelines can assert they
    * produced the SAME dataset without sorting or shuffling anything
    * (the reproducibility receipt next to a training-data drop). Pure
    * map-side hash + one 1-row aggregate; headroom: 2^32 per row keeps
    * the sum exact in a BIGINT to ~2×10⁹ rows per fingerprinted
    * partition — fingerprint per date-partition at 100 TB, then hash
    * the partition fingerprints. */
  /** Median/MAD robust outliers: flag rows where
    * |v − median(v)| > (numHalf/2)·MAD(v) within each group. Unlike
    * mean/stddev z-scores, a handful of extreme values cannot inflate
    * the spread estimate and mask each other (breakdown point 50%).
    *
    * Exactness contract: `centsCol` must be integer-scaled (e.g. money
    * cents). Interpolated medians of integers land on the 0.5 grid, so
    * 2·median and 2·MAD are exact longs and the flag comparison is pure
    * integer math — bit-reproducible on any engine, any partitioning.
    *
    * Shape: two tiny grouped percentiles (one row per group) broadcast
    * back onto the rows — the data shuffles only into those grouped
    * aggregates, never for a window.
    */
  def robustOutliers(rows: DataFrame, groupCol: String, idCol: String,
                     centsCol: String, numHalf: Int = 5): DataFrame = {
    val med = rows.groupBy(groupCol)
      .agg(round(expr(s"percentile($centsCol, 0.5)") * 2).cast("long").as("m2"))
    val dev = rows.join(broadcast(med), groupCol)
      .withColumn("dev2", abs(col(centsCol) * 2 - col("m2")))
    val mad = dev.groupBy(groupCol)
      .agg(round(expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), groupCol)
      .filter(col("dev2") * 2 > col("mad4") * numHalf)
      .select(col(idCol), col(groupCol), col(centsCol), col("dev2"))
  }

  def datasetHash(df: DataFrame, rowCanon: Column): DataFrame =
    df.select(
        conv(substring(md5(rowCanon), 1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("fingerprint"))

  /** Declarative constraint validation: one row per check with its
    * violation count and a 0/1 `ok` flag.
    *
    *  - `rowViolations`: name → per-row violation predicate (null
    *    checks, range checks, referential checks against a pre-joined
    *    broadcast key set).
    *  - `uniqueKeys`: name → expression that must be unique; violations
    *    = rows − distinct values (0 nulls assumed counted as rows).
    *
    * All checks fold into ONE aggregation: predicates as conditional
    * sums, uniqueness via the same multi-distinct Expand as
    * [[profile]]. Adding a check never adds a scan.
    */
  def checks(df: DataFrame,
             rowViolations: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Column)]): DataFrame = {
    val aggExprs =
      rowViolations.map { case (n, p) =>
        sum(when(p, 1L).otherwise(0L)).as(s"${n}__v") } ++
      uniqueKeys.map { case (n, c) =>
        (count(lit(1)) - countDistinct(c)).as(s"${n}__v") }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val names = rowViolations.map(_._1) ++ uniqueKeys.map(_._1)
    val stacked = names.map { n =>
      struct(lit(n).as("check_name"),
        col(s"${n}__v").as("n_violations"),
        when(col(s"${n}__v") === 0L, 1L).otherwise(0L).as("ok"))
    }
    one.select(explode(array(stacked: _*)).as("c")).select("c.*")
  }
}
