package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered funnels and cohort retention.
  *
  * Both are single-aggregation-pass shapes designed for the 100 TB event
  * log, where the only thing that scales is "group by user once, keep
  * per-user state bounded":
  *
  *  - [[funnel]] collects per user one SORTED timestamp array per stage
  *    (bounded by that user's own event count, never the corpus) and
  *    walks the stage chain with scalar array expressions — no
  *    self-joins, no k passes over the log for k stages.
  *  - [[cohortRetention]] reduces the log to DISTINCT (user, week) pairs
  *    map-side before anything else; every later relation is bounded by
  *    users × weeks, not by events.
  *
  * Timestamps are integer ticks end to end — all comparisons are exact
  * integer ops, so any engine reproduces the result bit for bit. Callers
  * pick the resolution; the declared keys feed epoch-MICROS (`ts div
  * 1000` over the nanosAsLong read) because DuckDB's parquet reader
  * truncates nano timestamps to micros, so micros is the finest grid
  * both engines can actually agree on.
  */
object Analytics {

  /** Ordered funnel: stage k counts only if one of its events happened
    * STRICTLY after the timestamp that satisfied stage k-1 (first-match
    * greedy walk — the standard product-funnel semantics; ties at the
    * exact same nanosecond do NOT advance the funnel, pinned by spec).
    *
    * Returns one row per user that reached at least stage 1:
    * (user_id, stage_reached, t_first, t_last) where t_first/t_last are
    * the satisfying timestamps of the first and deepest reached stage.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(col(typeCol) === st, col(tsCol))))
        .as(s"a$i")
    }
    val agged = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol).as("user_id"))
      .agg(perStage.head, perStage.tail: _*)
    // greedy walk: t0 = first stage-0 ts; t_k = first stage-k ts > t_{k-1}.
    // try_element_at, NOT element_at: ANSI mode (Spark 4 default) makes
    // element_at THROW on an empty array, and a user who never reaches a
    // stage has exactly that. try_element_at is null on miss, and a null
    // bound makes every later stage null too (null lambda predicate →
    // element dropped).
    val ts = stages.indices.foldLeft(Vector.empty[Column]) { (acc, i) =>
      val t =
        if (i == 0) try_element_at(col("a0"), lit(1))
        else try_element_at(filter(col(s"a$i"), x => x > acc.last), lit(1))
      acc :+ t
    }
    val named = ts.zipWithIndex.map { case (t, i) => t.as(s"t$i") }
    val reached = stages.indices
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    agged
      .select(col("user_id") +: named: _*)
      .select(col("user_id"),
        reached.cast("long").as("stage_reached"),
        col("t0").as("t_first"),
        coalesce(stages.indices.reverse.map(i => col(s"t$i")): _*).as("t_last"))
      .filter(col("stage_reached") > 0)
  }

  /** One epoch-week in microsecond ticks (7 · 24 · 3600 · 1e6). */
  val WeekUs = 604800000000L

  /** Weekly cohort retention: cohort = epoch-week of the user's first
    * event, offset = active week − cohort week, value = distinct users.
    * Every cohort has an offset-0 row (the cohort size itself), so
    * retention rates are a division away.
    *
    * @param weekTicks one week in the tick unit of `tsCol`
    *                  (e.g. [[WeekUs]] for epoch-micros)
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      weekTicks: Long = WeekUs): DataFrame = {
    // events → distinct (user, week): the ONLY corpus-sized aggregation,
    // and it partial-aggregates map-side. Integer `div`, NOT `/`: Spark's
    // `/` on longs goes through double, and epoch ticks can sit above
    // 2^53 where doubles drop low bits. ts ≥ 0 so div is floor.
    val uw = events
      .select(col(userCol).as("user_id"),
        expr(s"$tsCol div ${weekTicks}L").as("wk"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    uw.join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Session path mining: the top-`k` `n`-grams of event types along
    * sessionized user journeys — "what do users do in sequence"
    * (navigation analysis, funnel discovery).
    *
    * Scale shape: one shuffle on the user (sessionize window + the
    * per-session collect share the partitioning), the n-gram expansion
    * is a map-side Generate over the bounded per-session type array,
    * the path count partial-aggregates map-side (path cardinality ≪
    * occurrence count), and top-k plans as TakeOrderedAndProject.
    * Session arrays are bounded by the gap parameter in any realistic
    * event stream; paths order deterministically by (count desc, path).
    */
  def sessionPaths(events: DataFrame, userCol: String, idCol: String,
                   tsUsCol: String, typeCol: String, gapUs: Long,
                   n: Int = 3, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(tsUsCol, idCol)
    val sess = events
      .withColumn("__flag", when(
        col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("__sid",
        sum(col("__flag")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val seqs = sess
      .groupBy(col(userCol), col("__sid"))
      .agg(array_sort(collect_list(
        struct(col(tsUsCol), col(idCol), col(typeCol)))).as("evs"))
      .select(transform(col("evs"), e => e.getField(typeCol)).as("types"))
    seqs
      .filter(size(col("types")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(types) - ${n - 1}), " +
          s"i -> concat_ws('>', slice(types, i, $n)))")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(k)
  }

  /** 2-D Pareto frontier (skyline), both axes minimized: keep a point
    * iff no other point is ≤ on both axes and < on at least one.
    *
    * On DISTINCT points sorted by (x asc, y asc), a point survives iff
    * its y is strictly below the min-y of every earlier point — equal-x
    * ties resolve correctly because an earlier same-x point has smaller
    * y (distinct) and dominates, and an equal-y earlier point has
    * smaller x and dominates. That turns a quadratic dominance test
    * into one window pass.
    *
    * Scale shape (two-phase, the classic distributed skyline): phase 1
    * runs that pass WITHIN each x-range bucket (hash-parallel windows) —
    * survivors per bucket form a strictly y-decreasing chain, so the
    * candidate set is tiny (bounded by the y-domain walk, not the row
    * count). Phase 2 repeats the pass globally over candidates only.
    * The global window is a single partition by construction, but over
    * per-bucket chains, never the input.
    */
  def skyline(points: DataFrame, xCol: String, yCol: String,
              bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pass(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("__pmin",
          min(col(yCol)).over(w.orderBy(col(xCol), col(yCol))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("__pmin").isNull || col(yCol) < col("__pmin"))
        .drop("__pmin")
    val pts = points.select(col(xCol), col(yCol)).distinct()
      .withColumn("__bkt", floor(col(xCol) / lit(bucketWidth)))
    val local = pass(pts, Window.partitionBy("__bkt"))
    pass(local.drop("__bkt"), Window.partitionBy())
  }

  /** First-order Markov transition model over sessionized event streams:
    * count[(from, to)] and the row-normalized transition probability.
    *
    * One shuffle on the user (the lag window), then the pair count
    * partial-aggregates map-side into the #types² matrix; the
    * normalizing row totals ride a second window over that tiny matrix.
    * Pairs never cross a user boundary (lag partitions by user) nor a
    * session boundary when `gapUs` splits one (strict >, the sessionize
    * convention). Probability emits as parts-per-million via INTEGER
    * floor division of the exact counts — no float ever, so engines
    * agree bit-for-bit (the count-ratio grid 1/total has no fixed
    * decimal width, so round(6) would be halfway-unsafe).
    */
  def markovTransitions(events: DataFrame, userCol: String, idCol: String,
                        tsUsCol: String, typeCol: String,
                        gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(tsUsCol, idCol)
    val pairs = events
      .select(col(userCol), col(idCol), col(tsUsCol), col(typeCol))
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .withColumn("__gap", col(tsUsCol) - lag(col(tsUsCol), 1).over(w))
      .filter(col("__from").isNotNull && col("__gap") <= gapUs)
    val counts = pairs.groupBy(col("__from").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("p_ppm", expr("n * 1000000 DIV __tot").cast("long"))
      .drop("__tot")
  }
}
