package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.plans.AsOfMergeJoin

/** The custom merge-scan as-of operator must agree with the composed
  * union+window formulation everywhere — including the edges the real
  * corpus doesn't exercise. */
class AsOfMergeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def crafted = (
    // left: (id, key, t)
    Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 10L, 200L),
        (4L, 20L, 100L), (5L, 30L, 100L), (6L, 20L, 99L))
      .toDF("id", "k", "t"),
    // right: (key, t, payload); unique per (key, t); key 30 absent;
    // key 20 has a row exactly AT a left time (<= must match it)
    Seq((10L, 40L, "a"), (10L, 100L, "b"), (10L, 150L, "c"),
        (20L, 100L, "d"), (40L, 10L, "z"))
      .toDF("k", "t", "payload"))

  test("merge exec equals the union+window form on crafted edges") {
    val (l, r) = crafted
    val viaWindow = AsOfJoin.asOf(l, r, "k", "t", Seq("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    val viaMerge = AsOfMergeJoin.asOf(l, r, "k", "t", Seq("payload"))
      .select("id", "payload").as[(Long, Option[String])].collect().toMap
    assert(viaMerge == viaWindow)
    // and both match the hand-computed truth
    assert(viaMerge == Map(
      1L -> Some("b"), // equal-time right row matches (<=)
      2L -> Some("a"), // earlier row only
      3L -> Some("c"),
      4L -> Some("d"), // exact-time match on another key
      5L -> None,      // key with no right rows at all
      6L -> None))     // right rows exist but all later
  }

  test("merge exec equals the union+window form on the events corpus") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("t_us", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("t_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "t_us")
      .agg(max(struct(col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("t_us"),
        col("m.event_id").as("click_id"), col("m.value").as("click_value"))
    val a = AsOfJoin.asOf(purchases, clicks, "user_id", "t_us",
        Seq("click_id", "click_value"))
      .collect().map(_.toSeq).toSet
    val b = AsOfMergeJoin.asOf(purchases, clicks, "user_id", "t_us",
        Seq("click_id", "click_value"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("merge exec plans one shuffle per side and no union relation") {
    val (l, r) = crafted
    val p = AsOfMergeJoin.asOf(l, r, "k", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfMergeJoin"), p.take(1200))
    assert(!p.contains("Union") && !p.contains("Window"), p.take(1200))
  }

  test("left-only filters push below the as-of node; payload filters stay") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.plans.AsOfJoinPlan
    val (l, r) = crafted
    val joined = AsOfMergeJoin.asOf(l, r, "k", "t", Seq("payload"))

    // left-only predicate: must land BELOW AsOfJoinPlan — either as a
    // Filter node, or (when the rule runs inside the main optimizer
    // batch, as it does with GraftExtensions registered) already
    // constant-folded into a SHRUNK LocalRelation by
    // ConvertToLocalRelation — pushdown then composed with eager
    // local evaluation, which is strictly better
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val pushed = joined.filter(col("id") > 1 && col("k") === 1)
    val oplan = pushed.queryExecution.optimizedPlan
    val above = oplan.collectFirst {
      case LFilter(_, _: AsOfJoinPlan) => true }
    assert(above.isEmpty, s"filter stayed above the join:\n$oplan")
    val leftRows = l.count()
    val below = oplan.collectFirst {
      case aj: AsOfJoinPlan => aj.left.collectFirst {
        case _: LFilter => true
        case lr: LocalRelation if lr.data.size < leftRows => true } }
    assert(below.flatten.nonEmpty, s"no filter below the join:\n$oplan")
    // and semantics are unchanged vs the unpushed union+window form
    val want = graft.ops.AsOfJoin.asOf(l, r, "k", "t", Seq("payload"))
      .filter(col("id") > 1 && col("k") === 1)
      .collect().map(_.toSeq).toSet
    assert(pushed.collect().map(_.toSeq).toSet === want)

    // payload predicate: must NOT move (it needs the join's result)
    val stay = joined.filter(col("payload").isNotNull)
    val oplan2 = stay.queryExecution.optimizedPlan
    val above2 = oplan2.collectFirst { case LFilter(_, _: AsOfJoinPlan) => true }
    assert(above2.nonEmpty, s"payload filter was moved:\n$oplan2")
  }
}
