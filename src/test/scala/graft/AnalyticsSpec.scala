package graft

import org.apache.spark.sql.Row
import graft.ops.Analytics

/** Funnel + cohort semantics, including the boundaries the sf test data
  * cannot reach (SURVEY.md §2.14's session-boundary lesson: pin every
  * comparison boundary with a fixture BEFORE trusting the oracle).
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val stages = Seq("signup", "view", "purchase")

  private def funnelOf(rows: (Long, Long, String)*): Map[Long, (Long, Long, Long)] =
    Analytics.funnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("funnel walks stages strictly forward in time") {
    val res = funnelOf(
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE view — stalls at view
      (2L, 10L, "signup"), (2L, 30L, "view"), (2L, 20L, "purchase"),
      // user 3: no signup — excluded entirely (stage_reached would be 0)
      (3L, 10L, "view"), (3L, 20L, "purchase"))
    assert(res === Map(1L -> ((3L, 10L, 30L)), 2L -> ((2L, 10L, 30L))))
  }

  test("a stage at the EXACT same tick does not advance the funnel (strict >)") {
    val res = funnelOf(
      (1L, 10L, "signup"), (1L, 10L, "view"), (1L, 11L, "purchase"),
      (2L, 10L, "signup"), (2L, 11L, "view"), (2L, 11L, "purchase"))
    // user 1: view at t=10 is NOT after signup at t=10 → stalls at stage 1
    // (so the later purchase can't count either); user 2: purchase at the
    // same tick as the view it needs to follow → stalls at stage 2
    assert(res === Map(1L -> ((1L, 10L, 10L)), 2L -> ((2L, 10L, 11L))))
  }

  test("funnel picks the FIRST qualifying event per stage, not any") {
    // two views: the earliest after signup (t=15) bounds the purchase
    // search, so the t=16 purchase counts even though a later view (t=40)
    // exists
    val res = funnelOf(
      (1L, 10L, "signup"), (1L, 15L, "view"), (1L, 40L, "view"),
      (1L, 16L, "purchase"))
    assert(res === Map(1L -> ((3L, 10L, 16L))))
  }

  test("sessionPaths: trigrams never span a session boundary; short sessions drop") {
    val gap = 100L
    val ev = Seq(
      // user 1, session 0: a b c d -> paths a>b>c, b>c>d
      (1L, 10L, 0L, "a"), (1L, 11L, 10L, "b"), (1L, 12L, 20L, "c"), (1L, 13L, 30L, "d"),
      // gap > 100 -> session 1: a b c (the boundary kills c|d>a>b paths)
      (1L, 14L, 200L, "a"), (1L, 15L, 210L, "b"), (1L, 16L, 220L, "c"),
      // user 2: only 2 events -> no trigram
      (2L, 17L, 0L, "x"), (2L, 18L, 10L, "y")
    ).toDF("user_id", "event_id", "t_us", "event_type")
    val got = graft.ops.Analytics.sessionPaths(ev, "user_id", "event_id",
        "t_us", "event_type", gapUs = gap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b>c" -> 2L, "b>c>d" -> 1L))
  }

  test("cohort retention counts distinct users per (cohort, offset)") {
    val wk = 7L // tiny tick unit for readability
    val ev = Seq(
      (1L, 0L, "x"), (1L, 7L, "x"), (1L, 15L, "x"),  // weeks 0,1,2
      (2L, 3L, "x"), (2L, 16L, "x"),                 // weeks 0,2
      (3L, 8L, "x")                                  // week 1 cohort
    ).toDF("user_id", "ts", "event_type")
    val res = Analytics.cohortRetention(ev, "user_id", "ts", weekTicks = wk)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(res === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("skyline equals the naive quadratic dominance test (incl. axis ties)") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)) ++
      Seq((0L, 49L), (49L, 0L), (5L, 5L), (5L, 7L), (7L, 5L)) // tie shapes
    val distinct = pts.distinct
    val naive = distinct.filter { case (x, y) =>
      !distinct.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) }
    }.sorted
    // tiny bucket width forces many buckets -> the cross-bucket phase
    // actually has pruning work to do
    val got = Analytics.skyline(pts.toDF("x", "y"), "x", "y", bucketWidth = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === naive)
  }

  test("markov transitions never cross a user or session boundary; ppm is floor") {
    val ev = Seq(
      // user 1: a->b->c within gap, then a session break before d
      (1L, 1L, 0L, "a"), (1L, 2L, 10L, "b"), (1L, 3L, 20L, "c"),
      (1L, 4L, 500L, "d"),
      // user 2: c->a (no cross-user pair d->c)
      (2L, 5L, 0L, "c"), (2L, 6L, 10L, "a"),
      // user 1 again later: another a->b strengthens that row
      (1L, 7L, 1000L, "a"), (1L, 8L, 1010L, "b")
    ).toDF("user_id", "event_id", "t_us", "event_type")
    val got = graft.ops.Analytics.markovTransitions(ev, "user_id", "event_id",
        "t_us", "event_type", gapUs = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from 'a': 2x a->b of 2 total = 1000000 ppm; from 'b': b->c 1 of 1;
    // from 'c': c->a 1 of 1; the break before d and user change emit none
    assert(got === Map(
      ("a", "b") -> ((2L, 1000000L)),
      ("b", "c") -> ((1L, 1000000L)),
      ("c", "a") -> ((1L, 1000000L))))
  }
}
