package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._
import graft.pagerank.PageRank

/** SURVEY.md §5.3(c): ordering agreement with GraphX's PageRank on the
  * same graph. GraphX computes the NORMALIZED variant ((1-d)/N, different
  * dangling handling), so VALUES are incomparable — but the rank ORDERING
  * must correlate strongly (Spearman ρ) if our unnormalized loop is
  * computing the same structural quantity. */
class GraphXCrossCheckSpec extends SparkTestBase {
  import spark.implicits._

  test("rank ordering agrees with GraphX (Spearman rho)") {
    val sf = "/root/testdata/sf0.001"
    val vertices = SparkEntry.pagerankGraph(spark, sf)
    val ours = PageRank.run(vertices, iters = 10)
      .as[(String, Double)].collect().toMap

    val titles = ours.keySet
    // KEEP red-link edges: dropping them would change source out-degrees
    // (our formula divides by the FULL degree incl. red targets). GraphX
    // materializes red targets as sink vertices; we just don't compare
    // them. Only the shared vertices' orderings are checked.
    val rawEdges = vertices.select(col("title"), explode(col("outlinks")).as("dst"))
      .as[(String, String)].collect()
    val allNames = (titles ++ rawEdges.map(_._2)).toSeq.sorted
    val idOf = allNames.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    val edges = rawEdges.map { case (s, d) => Edge(idOf(s), idOf(d), 1.0) }
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 0.0)
    val gx = org.apache.spark.graphx.lib.PageRank.run(g, numIter = 10, resetProb = 0.15)
      .vertices.collect().toMap

    val common = idOf.toSeq.collect {
      case (t, id) if titles(t) && gx.contains(id) => (ours(t), gx(id))
    }
    assert(common.size > 100)
    def ranksOf(xs: Seq[Double]): Map[Double, Double] = {
      val sorted = xs.sorted.zipWithIndex
      sorted.groupBy(_._1).map { case (v, g) => v -> g.map(_._2.toDouble).sum / g.size }
    }
    val (a, b) = common.unzip
    val ra = ranksOf(a); val rb = ranksOf(b)
    val xs = a.map(ra); val ys = b.map(rb)
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val rho = cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
                              ys.map(y => (y - my) * (y - my)).sum)
    info(f"Spearman rho = $rho%.4f over ${common.size} vertices")
    assert(rho > 0.99, f"rho $rho%.4f too low vs GraphX") // measured 0.9999
  }
}
