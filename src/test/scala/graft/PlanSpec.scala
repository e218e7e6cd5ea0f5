package graft

/** Plan-shape regression guards: the scale properties README promises
  * (pushdown, pruning, broadcast) asserted against the actual physical
  * plans — a perf regression that un-pushes a filter fails HERE, not in
  * a benchmark three rounds later. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("scan_project pushes the predicate into the parquet scan") {
    val p = plan("scan_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_quantity,30.0)"), p.take(800))
  }

  test("group_sum prunes the read schema to needed columns") {
    val p = plan("group_sum")
    assert(p.contains("l_shipdate"), "shipdate filter pushed")
    // pruned scan must NOT read unused wide columns
    assert(!p.contains("l_comment") && !p.contains("l_partkey"), p.take(800))
  }

  test("entry broadcasts the dimension tables") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("star_join broadcasts every dimension; only the fact side shuffles") {
    val p = plan("star_join")
    // four dimension joins (supplier, customer, nation⋈region) broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the fact table is scanned exactly once
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(800))
    // no dimension reaches a shuffle: every Exchange is for the fact
    // join, the final agg, or the output sort — none carries n_name rows
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      p.take(800))
  }

  test("tpch_q8 scans the fact once with broadcast dims") {
    val p = plan("tpch_q8")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("tpch_q15 gets the max as a broadcast scalar and reuses the rev exchange") {
    val p = plan("tpch_q15")
    // the 1-row max relation arrives as a broadcast cross join (the
    // quality_cut pattern); a Window formulation would re-sort the
    // whole per-supplier relation in one partition
    assert("Cross,? BuildRight".r.findFirstIn(p).isDefined ||
      p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
    // rev feeds both the probe side and the max subquery; the
    // localCheckpoint pins one evaluation, so the final plan must hold
    // NO file scan of the fact (both branches read the checkpointed
    // per-supplier relation)
    assert(!p.contains("lineitem.parquet"),
      "fact scanned inside the query — rev not materialized once")
  }

  test("tpch_q2 derives ps once and takes min-cost as a keyed window, dims broadcast") {
    val p = plan("tpch_q2")
    // window-min over ps_partkey consumes eligible ONCE: exactly one
    // fact scan feeds the lineitem-distinct derive, no agg+rejoin
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(800))
    assert(p.contains("Window"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("tpch_q11 stages the in-nation pair relation once; total arrives broadcast") {
    val p = plan("tpch_q11")
    assert(!p.contains("lineitem.parquet"),
      "fact scanned inside tpch_q11 — derived ps not staged once")
    // the grand total is a broadcast 1-row relation, not a window
    assert(p.contains("BroadcastNestedLoopJoin") ||
      "Cross,? BuildRight".r.findFirstIn(p).isDefined, p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("tpch_q16 broadcasts the exclusion anti join and the part dims") {
    val p = plan("tpch_q16")
    // ps consumed once — exactly one fact scan feeds the derive
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(800))
    assert("BroadcastHashJoin .*, LeftAnti, BuildRight".r.findFirstIn(p).isDefined,
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("tpch_q20 keeps supplier unshuffled: candidates arrive as a broadcast semi join") {
    val p = plan("tpch_q20")
    // two legitimate fact scans (ps derive + calendar-2000 shipped agg,
    // different slices) — pinned so a refactor can't silently add more
    assert("lineitem\\.parquet".r.findAllIn(p).size == 2, p.take(800))
    assert("BroadcastHashJoin .*, LeftSemi, BuildRight".r.findFirstIn(p).isDefined,
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("boilerplate_strip ships the frequent set as a broadcast, not a plan literal") {
    // The frequent-line hash set grows with the corpus (totalLines /
    // minDocs); inlining it with typedlit serialized the whole array
    // into every task's plan. It must travel as a broadcast variable:
    // no 32-hex md5 literal may appear in the plan text, and the plan
    // must stay corpus-size-independent in size.
    val p = plan("boilerplate_strip")
    assert("\\b[0-9a-f]{32}\\b".r.findFirstIn(p).isEmpty,
      "frequent-line md5 inlined into the plan")
    assert(p.length < 20000, s"plan is ${p.length} chars — literal leak?")
  }

  test("topk_limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("heavy_hitters plans TakeOrderedAndProject (per-partition heaps, no global sort)") {
    val p = plan("heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("quality_cut broadcasts the scalar threshold — no corpus-wide window sort") {
    val p = plan("quality_cut")
    // the percentile threshold arrives as a broadcast 1-row relation;
    // an unpartitioned Window would have sorted the corpus in ONE task
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("window_range_frame serves the frame from a single partitioned Window") {
    val p = plan("window_range_frame")
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p.take(1200))
  }

  test("decontaminate broadcasts eval shingles — no corpus self-join shuffle") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("similarity_topk keeps the corpus side un-shuffled (broadcast queries)") {
    val p = plan("similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(800))
  }

  test("dedup_ngram prunes shingles via a broadcast semi-join, no corpus self-join") {
    val p = plan("dedup_ngram")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(1200))
    // candidates come from the staged (materialized) relation, not a
    // re-executed LSH pipeline: the checkpoint scan shows as an RDD scan
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"), p.take(1200))
  }

  test("dedup_embedding and similarity_ann never cross-join the corpus") {
    for (key <- Seq("dedup_embedding", "similarity_ann")) {
      val p = plan(key)
      assert(!p.contains("CartesianProduct"), s"$key: ${p.take(800)}")
      // the only joins are the band-bucket equi-join and id re-attach
      assert(p.contains("Join") || p.contains("join"), s"$key has joins")
    }
  }

  test("fused wiki parse plans a single Generate over the scan") {
    val p = plan("wiki_parse_fused")
    assert(p.contains("Generate wiki_pages"), p.take(1200))
    // the regex chain's repeated regexp_extract projections must be gone
    assert(!p.contains("regexp_extract("), p.take(1200))
  }

  test("grouping_sets_agg plans one Expand over one scan, not a scan per set") {
    val p = plan("grouping_sets_agg")
    assert(p.contains("Expand"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("pivot_agg is a single-pass conditional agg: one scan, no join") {
    val p = plan("pivot_agg")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
    assert(!p.contains("Join"), p.take(800))
  }

  test("unpivot_agg expands map-side: no shuffle below the final sort") {
    val p = plan("unpivot_agg")
    assert(p.contains("Expand"), p.take(800))
    // exactly one exchange — the range partitioning for the ORDER BY
    assert("Exchange".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("multi_distinct plans one scan (Expand-based multi-distinct)") {
    val p = plan("multi_distinct")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("curate_corpus reads the corpus once: no keeper-set self-join") {
    val p = plan("curate_corpus")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
    assert(!p.contains("Join"), p.take(800))
  }

  test("curate_corpus never shuffles the raw text, only metrics + hash") {
    val exec = SparkEntry.queries("curate_corpus")(spark, sf)
      .queryExecution.executedPlan match {
      // AQE wraps the real plan; collect() does not descend into it
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffleInputs = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(shuffleInputs.nonEmpty)
    assert(!shuffleInputs.flatten.contains("text"),
      s"text column crossed a shuffle: $shuffleInputs")
  }

  test("window_lag_lead serves all three window functions from one sort") {
    val p = plan("window_lag_lead")
    // one Window operator (lag/lead/ntile share the partition+order), so a
    // single partition-by-custkey exchange + sort feeds them all
    assert("Window\\b".r.findAllIn(p).size >= 1, p.take(1200))
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size <= 1, p.take(1200))
  }

  test("interval_merge and dedup_temporal shuffle the log exactly once") {
    for (key <- Seq("interval_merge", "dedup_temporal")) {
      val exec = SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // exactly two exchanges total: the entity partitioning + the final
      // presentation sort; both windows and the aggregate reuse the first
      val shuffles = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.size <= 2,
        s"$key has ${shuffles.size} shuffles:\n${exec.toString.take(1000)}")
    }
  }

  test("sql_recursive executes as an iterative UnionLoop, not an unrolled union") {
    val p = plan("sql_recursive")
    assert(p.contains("UnionLoop"), p.take(1200))
  }

  test("sql_lateral decorrelates the LIMIT into a group-limited window join") {
    val p = plan("sql_lateral")
    // per-group top-k must come from WindowGroupLimit (map-side group
    // pruning before the rank filter), joined broadcast — never a
    // per-outer-row subquery execution
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("scan_partitioned prunes to the single year partition") {
    val p = plan("scan_partitioned")
    assert("PartitionFilters: \\[[^\\]]*= 1996".r.findFirstIn(p).isDefined,
      p.take(1500))
  }

  test("tpch_q4 plans the EXISTS as a semi join with the date filter pushed") {
    val p = plan("tpch_q4")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"), p.take(1200))
  }

  test("tpch_q5 broadcasts every dimension; the fact scans once") {
    val p = plan("tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("tpch_q19 derives both per-side OR-envelopes into the scans") {
    val p = plan("tpch_q19")
    // quantity envelope derived onto the fact side (an OR of the three
    // branch ranges in the pre-join Filter), brand predicates present in
    // the broadcast join condition — Catalyst's constraint propagation
    assert("l_quantity#\\d+ >= 1\\.0\\) AND \\(l_quantity#\\d+ <= 11\\.0"
      .r.findFirstIn(p).isDefined, p.take(2000))
    assert("p_brand#\\d+ = Brand#12".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tpch_q10 tops out with TakeOrderedAndProject, dims broadcast") {
    val p = plan("tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }
}
