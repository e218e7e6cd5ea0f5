package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle counting over an undirected graph.
  *
  * Classic two-join enumeration over ID-ORIENTED edges: every undirected
  * edge is stored once as (a < b), so each triangle {x < y < z} is
  * produced exactly once as the wedge x→y→z closed by (x, z) — no
  * ×6 overcount to divide away, and the orientation bounds the wedge
  * relation by Σ_v out-deg(v)² with out-deg averaging half the true
  * degree. (The further refinement — orienting by degree instead of id —
  * drops the bound to O(E^1.5); id-orientation keeps the oracle trivially
  * mirrorable and is the standard compromise.)
  *
  * Scale shape: two equi-joins + one explode-aggregate, all on the edge
  * relation — no vertex-indexed adjacency structure to build or hold in
  * memory. The canonical edge set is localCheckpointed once because all
  * three join legs scan it.
  */
object Triangles {

  /** @param pairs undirected pair relation (any orientation, dups ok)
    * @return (node, n_tri) for every vertex in ≥1 triangle */
  def perVertex(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") < col("b")) // drops self-loops; < also drops a=b ties
      .distinct()
      .localCheckpoint()
    val wedges = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), "y")
    val tris = wedges.join(
      e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
