package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — the
  * near-linear community detector: every vertex starts as its own
  * label; each round EVERY vertex simultaneously adopts the most
  * frequent label among its neighbors, ties broken by the SMALLEST
  * label. A fixed round count with deterministic tie-breaks makes the
  * operator a pure function of the graph — no RNG, no visit order, no
  * engine dependence — so "R rounds of synchronous min-tie LPA" is the
  * contract both tiers and the unrolled DuckDB oracle compute exactly.
  * (Synchronous LPA can oscillate on bipartite-ish structure, which is
  * why the contract is fixed-round, not fixpoint: both engines land on
  * the identical round-R labeling either way.)
  *
  * Distributed tier — per round: one join flows each neighbor's label
  * across the edges, one hash-agg counts (node, label) votes, and ONE
  * more hash-agg picks the winner as max(struct(cnt, −label)) — the
  * (freq desc, label asc) argmax as a commutative monoid, partial
  * map-side, so no per-node window sort ever touches the vote relation.
  * Labels localCheckpoint per round (self-referencing lineage — the
  * PageRank plan-growth lesson). Work per round is O(E) votes.
  *
  * Fast tier (≤5M edges, the shared PageRank/HITS/BFS/k-core gate):
  * the same synchronous rounds over int-indexed adjacency in ONE task,
  * votes counted in a per-vertex hash map.
  *
  * Input edges are UNDIRECTED, one row per pair (u < v), no self-loops
  * — the co-purchase pair relation shape (same as [[KCore]]).
  */
object LabelPropagation {

  /** Test seam: force the distributed tier (mirrors PageRank/KCore). */
  @volatile private[graft] var fastPathEnabled: Boolean = true

  /** @param pairs  (a, b) long vertex ids, one row per undirected edge
    * @param rounds synchronous update rounds
    * @return (node, label) after exactly `rounds` rounds */
  def run(pairs: DataFrame, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p0 = pairs.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val nEdges = p0.count()
    if (fastPathEnabled && nEdges <= 5000000L) {
      p0.as[(Long, Long)].rdd.coalesce(1).mapPartitions { it =>
        val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        it.foreach { case (a, b) =>
          adj.computeIfAbsent(a, _ => new scala.collection.mutable.ArrayBuffer[Long]()) += b
          adj.computeIfAbsent(b, _ => new scala.collection.mutable.ArrayBuffer[Long]()) += a
        }
        var labels = new java.util.HashMap[Long, Long]()
        adj.keySet().forEach(v => labels.put(v, v))
        for (_ <- 1 to rounds) {
          val next = new java.util.HashMap[Long, Long]()
          adj.forEach { (v, ns) =>
            val votes = new java.util.HashMap[Long, Long]()
            ns.foreach { n =>
              val l = labels.get(n)
              votes.put(l, votes.getOrDefault(l, 0L) + 1L)
            }
            var bestLabel = Long.MaxValue; var bestCnt = 0L
            votes.forEach { (l, c) =>
              if (c > bestCnt || (c == bestCnt && l < bestLabel)) {
                bestLabel = l; bestCnt = c
              }
            }
            next.put(v, bestLabel)
          }
          labels = next
        }
        import scala.jdk.CollectionConverters._
        labels.entrySet().iterator().asScala.map(en => (en.getKey.toLong, en.getValue.toLong))
      }.toDF("node", "label")
    } else {
      // symmetric vote flow: each undirected pair votes in both directions
      val e = p0.select(col("a").as("u"), col("b").as("v"))
        .unionByName(p0.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint()
      var labels = e.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label")).localCheckpoint()
      for (_ <- 1 to rounds) {
        labels = e
          .join(labels.select(col("node").as("v"), col("label")), "v")
          .groupBy(col("u"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("u").as("node"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
          .select(col("node"), (-col("best.nl")).as("label"))
          .localCheckpoint()
      }
      labels
    }
  }
}
