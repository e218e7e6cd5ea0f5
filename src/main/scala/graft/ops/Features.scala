package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature preparation — the last mile between a curated corpus and a
  * training job: fixed-dimension text featurization (the hashing trick),
  * deterministic categorical indexing, and exact-integer feature scaling.
  *
  * The reference pipeline stops at ranked pages
  * (PageRankAlgorithm.java:98-120 — rank is its only "feature"); a
  * training-data engine must also hand the model numeric tensors. All
  * three operators here are engine-portable by construction: hashing via
  * md5 (the [[Sampling.hashBucket]] convention), indexing by an explicit
  * (frequency desc, value asc) total order, scaling in pure long math —
  * no RNG, no float accumulation, no partition-order dependence.
  */
object Features {

  /** Hashing-trick bag of words: token → md5-derived bucket in [0, dim).
    *
    * The fixed-dimension sparse featurizer (Weinberger et al. 2009):
    * collisions are accepted by design, so there is NO vocabulary build,
    * no dictionary broadcast, no second pass — at 100 TB that removes
    * both a full-corpus distinct() and a driver-sized vocab. One
    * Generate (tokenize) + one hash-agg per (doc, bucket); the sparse
    * vector surfaces as a sorted "bucket:count" string so the comparator
    * (and any parquet consumer) needs no array support.
    */
  def hashFeatures(docs: DataFrame, idCol: String, textCol: String,
                   dim: Int): DataFrame = {
    require(dim > 0 && dim <= 256, s"dim must be in (0, 256], got $dim")
    val tok = docs
      .select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("tok"))
      .select(col(idCol), (Sampling.hashBucket(col("tok")) % dim).as("bucket"))
    tok.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(
          sort_array(collect_list(struct(col("bucket"), col("cnt")))),
          p => concat(p("bucket").cast("string"), lit(":"),
            p("cnt").cast("string")))).as("features"))
  }

  /** Deterministic categorical index: distinct values ranked by
    * (frequency desc, value asc) — StringIndexer's frequencyDesc order
    * made total (the value tie-break) so every engine and every run
    * agrees. The mapping relation is |distinct(cat)| rows (tiny for real
    * categorical columns) and broadcasts back onto the fact rows; the
    * unpartitioned ranking window sorts only that tiny relation, never
    * the input. Returns the input plus `idxCol` (0-based long).
    */
  def indexLabels(df: DataFrame, catCol: String, idxCol: String): DataFrame = {
    val mapping = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("freq"))
      .select(col(catCol),
        (row_number().over(
          Window.orderBy(desc("freq"), asc(catCol))) - 1)
          .cast("long").as(idxCol))
    df.join(broadcast(mapping), catCol)
  }

  /** Min–max scaling to parts-per-million, in exact long arithmetic:
    * ppm = (v − min) · 1e6 div (max − min), with a constant-column guard
    * (max = min → 0). Inputs must already be on an integer grid (cents,
    * counts — the engine-wide money convention, Relational.scala:22-28);
    * the one global (min, max) row broadcasts back, so scaling is a
    * map-side projection with no second shuffle. Truncating `div` on
    * non-negative operands is floor on every engine — no float rounding
    * anywhere, which is what makes the result bit-identical at any
    * partitioning and in any engine.
    */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "minMaxScale needs at least one column")
    val statCols = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val scaled = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      val (lo, hi) = (col(s"__min_$c"), col(s"__max_$c"))
      acc.withColumn(s"${c}_ppm",
        when(hi > lo,
          expr(s"(($c - __min_$c) * 1000000) div (__max_$c - __min_$c)"))
          .otherwise(lit(0L)))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }
}
