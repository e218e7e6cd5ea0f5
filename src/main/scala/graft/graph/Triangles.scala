package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Per-vertex triangle counting over an undirected graph.
  *
  * Intersection form: canonicalize edges to (a < b) once, build each
  * vertex's SORTED neighbor array, and count each edge's common
  * neighbors with an allocation-free merge
  * ([[graft.functions.SortedIntersectCount]]). Every triangle through
  * edge (a,b) is exactly one common neighbor of a and b, and each
  * triangle at vertex v is seen by exactly two of v's incident edges,
  * so n_tri(v) = Σ_{edges at v} common(edge) / 2.
  *
  * Why not the classic two-join wedge enumeration: on a co-purchase
  * graph (avg degree ~100 at sf0.1) the wedge relation is Σ out-deg²
  * ≈ 10⁸ rows that must be materialized and shuffled into the closing
  * join — measured 12 s at sf0.1 vs ~2.5 s for this shape, whose heavy
  * work (Σ_edges deg(a)+deg(b) element visits) happens inside
  * whole-stage codegen with zero allocation. `size(array_intersect)`
  * has the same asymptotics but builds a hash set + result array per
  * row and measured 2-3× slower.
  *
  * Scale shape: two shuffles total (edge distinct, adjacency build)
  * plus the final count aggregation; the join legs re-use the edge
  * relation (localCheckpointed once). The per-vertex neighbor array is
  * the only memory bound — a hub of degree d holds d longs (8 MB at
  * d=10⁶); beyond that a degree-capped hybrid (wedge enumeration for
  * hub edges only) would bolt on without changing the contract.
  */
object Triangles {

  /** @param pairs undirected pair relation (any orientation, dups ok)
    * @return (node, n_tri) for every vertex in ≥1 triangle; `node`
    *         keeps the input column type */
  def perVertex(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") < col("b")) // drops self-loops; < also drops a=b ties
      .distinct()
      .localCheckpoint()
    val adj = e.select(col("a").as("n"), col("b").as("nb"))
      .union(e.select(col("b").as("n"), col("a").as("nb")))
      .groupBy("n")
      .agg(sort_array(collect_list(col("nb").cast("long"))).as("adj"))
    val common = ColumnShim.column(graft.functions.SortedIntersectCount(
      ColumnShim.expression(col("na")), ColumnShim.expression(col("nb"))))
    e.join(adj.select(col("n").as("a"), col("adj").as("na")), "a")
      .join(adj.select(col("n").as("b"), col("adj").as("nb")), "b")
      .select(col("a"), col("b"), common.as("common"))
      .select(explode(array(col("a"), col("b"))).as("node"), col("common"))
      .groupBy("node")
      .agg((sum(col("common")) / 2).cast("long").as("n_tri"))
      .filter(col("n_tri") > 0)
  }

  /** Per-edge neighbor-set Jaccard similarity — the classic
    * link-prediction / "related items" score:
    * `|N(a) ∩ N(b)| / |N(a) ∪ N(b)|` for every undirected edge (a, b).
    *
    * Same machinery as [[perVertex]]: canonical distinct edges, sorted
    * adjacency arrays, the allocation-free [[graft.functions.SortedIntersectCount]]
    * merge inside whole-stage codegen. The union size needs no second
    * pass — `|∪| = deg(a) + deg(b) − common` — and it is never zero on
    * an edge (b ∈ N(a) by definition). The score emits as ppm via
    * INTEGER floor division: counts are exact, so the whole result is
    * float-free and engine-exact.
    */
  def edgeJaccard(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint()
    val adj = e.select(col("a").as("n"), col("b").as("nb"))
      .union(e.select(col("b").as("n"), col("a").as("nb")))
      .groupBy("n")
      .agg(sort_array(collect_list(col("nb").cast("long"))).as("adj"))
    val common = ColumnShim.column(graft.functions.SortedIntersectCount(
      ColumnShim.expression(col("na")), ColumnShim.expression(col("nb"))))
    e.join(adj.select(col("n").as("a"), col("adj").as("na")), "a")
      .join(adj.select(col("n").as("b"), col("adj").as("nb")), "b")
      .select(col("a"), col("b"), common.as("common"),
        size(col("na")).cast("long").as("da"),
        size(col("nb")).cast("long").as("db"))
      .select(col("a"), col("b"), col("common"),
        expr("common * 1000000 DIV (da + db - common)").as("jac_ppm"))
  }
}
