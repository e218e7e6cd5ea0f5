package graft.pagerank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative PageRank with the REFERENCE's exact semantics
  * (ref: PageRankAlgorithm.java:97-114, :323-399; SURVEY.md §2.10):
  *
  *  - `rank₀ = 1/N` (ref: :302);
  *  - fixed iteration count, default 10 (ref: :98, README.md:70);
  *  - `rankᵢ₊₁(p) = d · Σ_{q→p} rankᵢ(q)/outDeg(q) + (1−d)` with d = 0.85
  *    (ref: :395) — the UNNORMALIZED variant: no (1−d)/N, so total mass
  *    is not conserved;
  *  - contributions to red links (targets that are not pages) are DROPPED
  *    — the reference's marker-join `return` (ref: :392-394) is our
  *    left-join from the vertex set;
  *  - a page with no inbound contributions survives with rank = 1−d
  *    (accumulator init, ref: :369);
  *  - dangling pages (no outlinks) contribute nothing — their mass
  *    evaporates (explode of an empty array emits no rows);
  *  - self-loops and duplicate links kept: out-degree counts occurrences
  *    (ref: :339 `links.length`; README.md:62).
  *
  * Spark-first mechanics replacing the reference's 10 HDFS-materialized
  * MR jobs (SURVEY.md §4.3): one driver loop over immutable DataFrames;
  * the static vertex relation is persisted once and reused every
  * iteration (the reference re-reads + re-parses it from disk each job);
  * `localCheckpoint` every `checkpointEvery` iterations truncates the
  * logical plan (otherwise analysis time doubles per iteration); the
  * previous iteration unpersists eagerly — the in-memory analog of the
  * reference's delete-behind (ref: :112-113).
  *
  * At cluster scale the join and groupBy both shuffle on `title`;
  * hash-partitioning is stable across iterations so AQE reuses the
  * exchange layout, and the vertex side stays cached in executor memory.
  */
object PageRank {

  /** @param vertices (title: String, outlinks: Array[String]) — one row
    *                 per page; outlinks may repeat and may self-reference.
    * @return (title, rank), one row per page. */
  def run(vertices: DataFrame, iters: Int = 10, d: Double = 0.85,
          checkpointEvery: Int = 5): DataFrame = {
    val verts = vertices.select(col("title"), col("outlinks"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count() // also materializes the cache (ref job 1's counter)

    var ranks = verts.select(col("title"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contribs = ranks.join(verts, "title")
        .filter(size(col("outlinks")) > 0)
        .select(explode(col("outlinks")).as("title"),
          (col("rank") / size(col("outlinks"))).as("c"))
      val summed = contribs.groupBy("title").agg(sum("c").as("s"))
      val next = verts.select("title")
        .join(summed, Seq("title"), "left")
        .select(col("title"),
          (lit(d) * coalesce(col("s"), lit(0.0)) + lit(1.0 - d)).as("rank"))
      ranks =
        if (i % checkpointEvery == 0 && i < iters) next.localCheckpoint()
        else next
    }
    ranks
  }

  /** Ranked output in the reference's sort-job shape (ref: :407-436) with
    * the deterministic title tie-break (SURVEY.md §7.5). */
  def ranked(vertices: DataFrame, iters: Int = 10, d: Double = 0.85): DataFrame =
    run(vertices, iters, d).orderBy(desc("rank"), asc("title"))
}
