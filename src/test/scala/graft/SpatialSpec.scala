package graft

import graft.ops.Spatial

class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  test("radiusSelfJoin equals the naive quadratic scan; boundary is inclusive") {
    val rnd = new scala.util.Random(5)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)) ++
      // exact-boundary pair: d = radius exactly (30² = 18² + 24²)
      Seq((1000L, 0L, 0L), (1001L, 18L, 24L),
        // just outside
        (1002L, 100L, 100L), (1003L, 100L, 131L))
    val r = 30L
    val naive = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
      if d2 <= r * r
    } yield (i, j, d2)).sorted
    val got = Spatial.radiusSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.contains((1000L, 1001L, 900L)))   // inclusive boundary kept
    assert(!got.exists(p => p._1 == 1002L && p._2 == 1003L)) // 31 > 30 out
  }
}
