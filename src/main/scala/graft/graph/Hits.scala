package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities, Kleinberg 1999) — the second iterative
  * fixed-point algorithm of the engine, generalizing the PageRank loop
  * muscle (reference: `/root/reference/PageRankAlgorithm.java:97-114`'s
  * driver-sequenced iteration) to a TWO-vector mutual recurrence:
  *
  *   auth(p) ∝ Σ_{q→p} hub(q)        hub(p) ∝ Σ_{p→q} auth(q)
  *
  * Cross-engine determinism (the property that makes this key
  * oracle-checkable where naive HITS is not): each half-step normalizes
  * by the MAX of the previous vector, not the L1/L2 norm. A global
  * float SUM is partial-order-dependent (Spark's tree aggregation vs
  * DuckDB's sequential scan can differ in the last ulp, and a norm
  * propagates that ulp into every value); MAX of already-rounded values
  * is exact in any evaluation order, and the subsequent division is one
  * IEEE op both engines perform identically. Each half-step result is
  * rounded to the 1e-9 grid so per-vertex sum ordering differences are
  * absorbed — the same lock-step trick as `pagerank_oracle`
  * (SURVEY.md §5.3d).
  *
  * Scale shape (per half-step, identical to one PageRank DF iteration):
  *   edges ⋈ state on the emitting side  — one hash shuffle
  *   groupBy(receiving side).sum         — partial agg map-side
  *   ÷ max via crossJoin(broadcast(1-row agg)) — NO driver round-trip:
  *     the normalizer stays in-plan as a broadcast, so the loop has no
  *     per-iteration driver sync barrier (unlike the reference's 13
  *     blocking job submissions).
  * Lineage: eager localCheckpoint EVERY iteration — not a cadence knob
  * like PageRank's linear chain. The state here is self-referenced
  * three times per half-step (normalizer aggregate, message join,
  * carry-through), so an unchecked plan grows ~9× per iteration:
  * exponential analysis cost, not the linear doubling of §4.3. The
  * checkpoint turns each iteration's input into a leaf scan that the
  * three consumers share.
  */
object Hits {

  /** @param edges  (src: string, dst: string) directed edge relation
    * @param iters  full iterations (each = auth half-step + hub half-step)
    * @param roundTo decimal grid applied to every stored value
    * @return (title, hub, auth) for every vertex appearing in `edges` */
  def run(edges: DataFrame, iters: Int = 10, roundTo: Int = 9): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val verts = e.select(col("src").as("title"))
      .unionByName(e.select(col("dst").as("title")))
      .distinct()
      .localCheckpoint()

    var state = verts.select(col("title"), lit(1.0).as("hub"), lit(1.0).as("auth"))
    var lastCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      // auth half-step: pull hub mass along in-edges, normalize by max hub
      val hmax = state.agg(max(col("hub")).as("__mx"))
      val authNew = e.join(state.select(col("title").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("title")).agg(sum(col("hub")).as("__s"))
        .crossJoin(broadcast(hmax))
        .select(col("title"), round(col("__s") / col("__mx"), roundTo).as("__auth"))
      state = state.select("title", "hub")
        .join(authNew, Seq("title"), "left")
        .select(col("title"), col("hub"),
          coalesce(col("__auth"), lit(0.0)).as("auth"))
      // hub half-step: pull the NEW auth mass along out-edges
      val amax = state.agg(max(col("auth")).as("__mx"))
      val hubNew = e.join(state.select(col("title").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("title")).agg(sum(col("auth")).as("__s"))
        .crossJoin(broadcast(amax))
        .select(col("title"), round(col("__s") / col("__mx"), roundTo).as("__hub"))
      state = state.select("title", "auth")
        .join(hubNew, Seq("title"), "left")
        .select(col("title"), coalesce(col("__hub"), lit(0.0)).as("hub"), col("auth"))
      state = state.localCheckpoint() // eager: materializes + truncates
      lastCkpt.foreach(_.unpersist(false))
      lastCkpt = Some(state)
    }
    state
  }
}
