package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("intervalOverlap equals the naive predicate join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val as = Seq.tabulate(300) { i =>
      val lo = rnd.nextInt(500).toLong - 100; (i.toLong, lo, lo + rnd.nextInt(40))
    }
    val bs = Seq.tabulate(120) { j =>
      val lo = rnd.nextInt(500).toLong - 100; (j.toLong, lo, lo + rnd.nextInt(40))
    }
    val naive = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).sorted
    // width much smaller than interval length -> multi-bucket intervals,
    // exercising the unique-claim rule
    val got = RangeJoin.intervalOverlap(
        as.toDF("ai", "a_lo", "a_hi"), bs.toDF("bi", "b_lo", "b_hi"),
        "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 10.0)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got === naive)
    assert(got.distinct.size === got.size)
  }
}
