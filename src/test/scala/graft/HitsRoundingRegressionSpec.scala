package graft

/** Pinned regression for the rounding-semantics bug scalacheck caught in
  * round 4: on this graph, iteration 3 produces the double
  * 0.0833333334999…95 — whose SHORTEST decimal repr ("0.0833333335")
  * sits exactly on the 1e-9 halfway while its exact binary expansion is
  * just below it. `new java.math.BigDecimal(double)` (exact binary)
  * rounds DOWN; `BigDecimal.valueOf` / Spark `round()` / DuckDB
  * `round()` all round UP. The engine loops must use valueOf semantics
  * or the fast tier diverges from the distributed tier and the oracle.
  */
class HitsRoundingRegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("shortest-repr grid-halfway value rounds like Spark/DuckDB round()") {
    val edges = List(("v4", "v6"), ("v7", "v6"), ("v5", "v7"),
      ("v7", "v7"), ("v3", "v2"))
    val got = graft.graph.Hits.run(edges.toDF("src", "dst"), iters = 3)
      .as[(String, Double, Double)].collect()
      .map { case (t, h, a) => t -> ((h, a)) }.toMap
    val want = HitsReference.interpret(edges, 3)
    val diff = (got.keySet ++ want.keySet)
      .filter(k => got.get(k) != want.get(k))
    assert(diff.isEmpty,
      diff.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; "))
    // the contested values themselves
    assert(got("v2")._2 === 0.083333334)
    assert(got("v3")._1 === 0.055555556)
  }
}
