package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** mergeUpsert / scd2 edge cases the sf0.01 oracle can't reach (the
  * injected testdata carries no nulls and no same-timestamp ties). */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeUpsert: matched rows are replaced ATOMICALLY (null fields stick)") {
    val cur = Seq((1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)))
      .toDF("k", "name", "price")
    // change for key 1 sets name to NULL — the output row must carry
    // (null, 11.0), never a stitched ("a", 11.0) from the old version
    val chg = Seq((1L, None: Option[String], Some(11.0)),
                  (3L, Some("c"), Some(30.0)))
      .toDF("k", "name", "price")
    val got = Relational.mergeUpsert(cur, chg, "k")
      .as[(Long, Option[String], Option[Double], String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, None, Some(11.0), "update"),
      (2L, Some("b"), Some(20.0), "keep"),
      (3L, Some("c"), Some(30.0), "insert")))
  }

  test("mergeUpsert rejects schema drift between snapshot and batch") {
    val cur = Seq((1L, "a")).toDF("k", "name")
    val chg = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Relational.mergeUpsert(cur, chg, "k")
    }
  }

  test("cdcCompact: tombstones, reinsert after delete, arrival-order invariance") {
    // key 1: U,U -> lives with last value; key 2: U,D -> vanishes;
    // key 3: U,D,U -> reinserted; key 4: lone D -> vanishes
    val ops = Seq(
      (1L, 10L, "U", 100L), (1L, 20L, "U", 110L),
      (2L, 11L, "U", 200L), (2L, 21L, "D", 0L),
      (3L, 12L, "U", 300L), (3L, 22L, "D", 0L), (3L, 32L, "U", 330L),
      (4L, 13L, "D", 0L))
    def run(rows: Seq[(Long, Long, String, Long)]) =
      Relational.cdcCompact(rows.toDF("k", "seq", "op", "v"), "k", "seq", "op")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq((1L, 2L, 20L, 110L), (3L, 3L, 32L, 330L))
    assert(run(ops) === expected)
    // compaction must commute with arrival order and partition layout
    val shuffled = scala.util.Random.shuffle(ops)
    assert(run(shuffled) === expected)
    val got = Relational.cdcCompact(
      shuffled.toDF("k", "seq", "op", "v").repartition(7), "k", "seq", "op")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("scd2 collapses runs and leaves the last interval open") {
    // user 7: A A B A  → intervals A[10,30) B[30,40) A[40,null)
    val events = Seq(
      (7L, 100L, "A", 10L * 1000), (7L, 101L, "A", 20L * 1000),
      (7L, 102L, "B", 30L * 1000), (7L, 103L, "A", 40L * 1000),
      (8L, 200L, "X", 5L * 1000))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Relational.scd2(events, "user_id", "event_type", "event_id", "ts")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (7L, "A", 10L, Some(30L), false),
      (7L, "B", 30L, Some(40L), false),
      (7L, "A", 40L, None, true),
      (8L, "X", 5L, None, true)))
  }

  test("scd2Apply: close/open, no-op, passthrough and insert paths") {
    val dim = Seq(
      (1L, "A", 10L, Some(20L), false), (1L, "B", 20L, None: Option[Long], true),
      (2L, "X", 5L, None: Option[Long], true),
      (3L, "Z", 7L, None: Option[Long], true))
      .toDF("user_id", "attr", "valid_from", "valid_to", "is_current")
    val chg = Seq((1L, "C", 30L), (2L, "X", 40L), (9L, "N", 50L))
      .toDF("user_id", "attr", "t_us")
    val got = Relational.scd2Apply(dim, chg, "user_id")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "A", 10L, Some(20L), false),   // closed history untouched
      (1L, "B", 20L, Some(30L), false),   // current row CLOSED at change time
      (1L, "C", 30L, None, true),         // new current row OPENED
      (2L, "X", 5L, None, true),          // no-op: change matches current attr
      (3L, "Z", 7L, None, true),          // passthrough: no change arrived
      (9L, "N", 50L, None, true)))        // unseen key INSERTED as current
  }

  test("scd2: same-timestamp ties order by the id column deterministically") {
    val events = Seq(
      (1L, 10L, "A", 1000L), (1L, 11L, "B", 1000L), (1L, 12L, "C", 2000L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Relational.scd2(events, "user_id", "event_type", "event_id", "ts")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._3, r._2)).toSeq
    // A (id 10) precedes B (id 11) at t=1: A[1,1) B[1,2) C[2,null)
    assert(got == Seq(
      (1L, "A", 1L, Some(1L), false),
      (1L, "B", 1L, Some(2L), false),
      (1L, "C", 2L, None, true)))
  }

  test("mvRefresh: signed deltas, vanished groups dropped, update pairs net out") {
    val mv = Seq(("a", 2L, 30L), ("b", 1L, 5L), ("c", 3L, 60L))
      .toDF("g", "n", "cents")
    val changes = Seq(
      // group b fully deleted → must VANISH from the view, not linger
      ("b", 5L, "delete"),
      // group a: one update pair (value 10 → 17): n unchanged, sum +7
      ("a", 10L, "update_preimage"), ("a", 17L, "update_postimage"),
      // group d newborn via inserts
      ("d", 4L, "insert"), ("d", 6L, "insert"))
      .toDF("g", "cents", "_change_type")
    val got = Relational.mvRefresh(mv, changes, Seq("g"), Seq("cents"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 37L), ("c", 3L, 60L), ("d", 2L, 10L)))
  }

  test("mvRefresh refuses unknown change tags loud (never silently mis-weighs)") {
    val mv = Seq(("a", 1L, 10L)).toDF("g", "n", "cents")
    val changes = Seq(("a", 5L, "upsert")).toDF("g", "cents", "_change_type")
    val e = intercept[Exception] {
      Relational.mvRefresh(mv, changes, Seq("g"), Seq("cents")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("unknown _change_type")),
      s"wrong error: $e")
  }

  test("mvRefresh over a random DML tape equals full recompute") {
    // property-style: 300 rows, a random mix of deletes and update
    // pairs expressed as CDF rows; merge(base MV, signed delta) must
    // equal aggregating the final state directly
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map(i =>
      (i.toLong, s"g${i % 7}", rnd.nextInt(1000).toLong))
    val base = rows.toDF("id", "g", "cents")
    val mv = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val deleted = rows.filter(_._1 % 5 == 0)
    val updated = rows.filter(r => r._1 % 5 != 0 && r._1 % 3 == 0)
    val changes =
      deleted.map(r => (r._2, r._3, "delete")) ++
      updated.map(r => (r._2, r._3, "update_preimage")) ++
      updated.map(r => (r._2, r._3 + 100L, "update_postimage"))
    val got = Relational.mvRefresh(mv,
        changes.toDF("g", "cents", "_change_type"), Seq("g"), Seq("cents"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val finalRows = rows.filter(_._1 % 5 != 0)
      .map(r => if (r._1 % 3 == 0) (r._1, r._2, r._3 + 100L) else r)
    val want = finalRows.groupBy(_._2).map { case (g, rs) =>
      (g, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    assert(got == want)
  }
}
