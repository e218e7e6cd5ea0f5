package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.BloomMightContain

/** Sketch-shaped operators whose COMPOSED results are exact — the 100 TB
  * replacements for the two queries that melt down naively:
  *
  *  - `COUNT(DISTINCT k)` per group: the naive plan shuffles every
  *    (group, k) occurrence. [[bitmapDistinct]] reduces each
  *    (group, 32k-value bucket) to a fixed 4 KB bitmap ON THE MAP SIDE
  *    (partial `bitmap_construct_agg`), so the shuffle carries
  *    #groups × #buckets bitmaps instead of the raw key stream, and the
  *    final count is exact — unlike HLL (`approx_distinct`), which stays
  *    the right tool only when the key domain is unbounded.
  *
  *  - fact ⋈ filtered-dim semi join: the naive plan shuffles the whole
  *    fact table. [[bloomPrunedSemi]] probes a Bloom filter of the dim
  *    keys inside the fact scan's WholeStageCodegen (fpp-bounded survivor
  *    set), then exact-verifies ONLY the survivors with a real semi join —
  *    false negatives cannot occur, so the composition is exact. This is
  *    Spark's own InjectRuntimeFilter shape, made explicit and available
  *    to every pipeline (the built-in rewrite fires only on its internal
  *    heuristics and its functions are not public).
  */
object Sketches {

  /** Exact per-group distinct count via two-level bitmap aggregation.
    *
    * Level 1 groups by (group, `bitmap_bucket_number(k)`) — each bucket
    * covers 32768 adjacent key values, so a bitmap is ≤ 4 KB regardless
    * of row count; partial aggregation ORs bitmaps map-side. Level 2
    * sums exact per-bucket popcounts. Both levels are plain hash
    * aggregates: no expand, no per-key shuffle rows, and adding more
    * groups/keys grows the shuffle by bitmap count only.
    *
    * Requires a non-null integral key (bit positions need a bounded
    * offset within a bucket; negative keys are fine — bucket numbers go
    * negative symmetrically).
    */
  def bitmapDistinct(df: DataFrame, groupCol: String, keyCol: String,
                     outCol: String = "n_distinct"): DataFrame =
    df.select(col(groupCol), col(keyCol))
      .groupBy(col(groupCol), expr(s"bitmap_bucket_number($keyCol)").as("__bkt"))
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($keyCol))").as("__bm"))
      .groupBy(col(groupCol))
      .agg(sum(expr("bitmap_count(__bm)")).cast("long").as(outCol))

  /** Exact semi join of `fact` against `dim`'s key set, with a Bloom
    * pre-filter on the fact scan.
    *
    * `dim` is counted once (bounded side — the same side a broadcast
    * join would materialize anyway) to size the filter, built with the
    * public distributed `stat.bloomFilter` treeAggregate, and probed via
    * [[BloomMightContain]] before any shuffle of `fact`. Survivors
    * (true matches + ~fpp false positives) are then exact-verified by a
    * regular left-semi join, which now shuffles `selectivity + fpp` of
    * the fact instead of all of it. At 100 TB with a 1% match rate this
    * is a ~50× shuffle reduction for a ~4 MB filter broadcast.
    */
  def bloomPrunedSemi(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey).cast("long").as(dimKey))
    val n = math.max(1L, keys.count())
    val bloom = keys.stat.bloomFilter(dimKey, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe: Column = ColumnShim.column(
      BloomMightContain(bos.toByteArray,
        ColumnShim.expression(col(factKey).cast("long"))))
    // No broadcast hint: when the dim fits, AQE broadcasts anyway; when
    // it doesn't (the case this operator exists for), the shuffle pair
    // is survivor-sized on the fact side. The dim key is re-aliased to
    // an internal name so factKey == dimKey (the common fact/dim case)
    // cannot trip AMBIGUOUS_REFERENCE in the join condition.
    fact.filter(probe)
      .join(keys.distinct().withColumnRenamed(dimKey, "__graft_dimkey"),
        col(factKey) === col("__graft_dimkey"), "left_semi")
  }

  /** Exact heavy hitters via per-partition Misra–Gries candidate
    * generation + exact verification — frequent items WITHOUT a full
    * (key → count) shuffle.
    *
    * Pass 1 (mapPartitions, `k` counters per task, the genuine
    * per-partition-imperative case): each partition's MG summary
    * over-approximates its frequent items; any key with GLOBAL count
    * > N/(k+1) exceeds n_p/(k+1) in at least one partition (pigeonhole),
    * so the union of summaries is a SOUND candidate superset
    * (property-tested). Partition row counts ride along as sentinel
    * rows, so N needs no second job. Pass 2 re-scans counting ONLY
    * candidate keys — the shuffle carries ≤ #partitions·k groups
    * instead of every distinct key. The final filter
    * `count·(k+1) > N` is exact integer math; the result is identical
    * to the full groupBy (which is what the oracle computes).
    *
    * vs [[bitmapDistinct]]: same philosophy (bound the shuffle by a
    * fixed-size per-task summary), different aggregate.
    */
  def misraGriesHeavy(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "need at least one counter")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL keys are EXCLUDED (like count(col)): the partition-count
    // sentinel rides the null slot of the summary tuples, so a null
    // key would be indistinguishable from it — and the oracle
    // equivalence below is against the groupBy over non-null keys.
    val keys = df.select(col(keyCol).cast("string"))
      .filter(col(keyCol).isNotNull).as[String]
    // (key, 0) = candidate marker; (null, n) = partition row count
    val summary: Array[(String, Long)] = keys.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      var n = 0L
      it.foreach { w =>
        n += 1
        if (m.containsKey(w)) m.put(w, m.get(w) + 1)
        else if (m.size < k) m.put(w, 1L)
        else {
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val x = e.next()
            if (x.getValue == 1L) e.remove() else x.setValue(x.getValue - 1)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      (m.keySet().asScala.iterator.map(w => (w, 0L)) ++ Iterator((null: String, n)))
    }.collect()
    val n = summary.collect { case (null, c) => c }.sum
    val cands = summary.collect { case (w, _) if w != null => w }.distinct.toSeq
    df.filter(col(keyCol).isInCollection(cands))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > n)
  }
}
