package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS (unit-weight shortest paths) over a directed edge
  * relation — the third iterative-dataflow operator next to PageRank and
  * connected components, sharing their loop discipline.
  *
  * Frontier-based, not Bellman-Ford: each hop expands ONLY the vertices
  * first reached on the previous hop (join), drops the already-settled
  * ones (left_anti against the dist relation), and appends the rest.
  * Per-hop work is |edges ⋉ frontier|, so total work is O(E) across the
  * whole traversal instead of O(E · hops) for the relax-everything form.
  * An empty frontier short-circuits the loop (the `isEmpty` action per
  * hop is one tiny job on an already-checkpointed relation).
  *
  * Every hop localCheckpoints both relations: dist is self-referenced by
  * the next hop's anti-join, so the plan would otherwise double per hop
  * (the PageRank plan-growth lesson, SURVEY.md §4.3). All state is
  * (title, dist) rows — bounded by vertices, never by paths; determinism
  * is structural (min hop count is unique), so any engine agrees.
  */
object ShortestPaths {

  /** @param edges   (src, dst) directed edges
    * @param sources seed vertex relation, column `title` (dist 0)
    * @param maxHops inclusive hop bound
    * @return (title, dist) for every vertex within maxHops of a source */
  def run(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var frontier = sources.select(col("title")).distinct().localCheckpoint()
    var dist = frontier.select(col("title"), lit(0L).as("dist"))
      .localCheckpoint()
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val reached = e.join(frontier.withColumnRenamed("title", "src"), "src")
        .select(col("dst").as("title")).distinct()
      frontier = reached.join(dist, Seq("title"), "left_anti")
        .localCheckpoint()
      if (frontier.isEmpty) done = true
      else {
        dist = dist
          .unionByName(frontier.select(col("title"), lit(h.toLong).as("dist")))
          .localCheckpoint()
        h += 1
      }
    }
    dist
  }
}
