package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Recall-vs-cost table for the four ANN paths at matched probe
  * budgets — `tools/run.sh graft.tools.AnnRecall <sfDir>`.
  *
  * One query grid (vec_id % 17 == 0), one ground truth
  * ([[Similarity.bruteForceTopK]] — recall 1.0 by definition), then
  * each path at increasing probe budget: LSH multi-probe bits, IVF
  * nprobe, PQ shortlist, IVFPQ nprobe. Prints a markdown table of
  * recall@10 and wall seconds per configuration (steady-state: each
  * config runs twice, the timed run is the second, so one-time model
  * builds and JIT are not charged to the probe budget). Developer
  * loop, not a driver surface — results land in BENCH_NOTES. */
object AnnRecall {
  private val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint()
    val q = col("vec_id") % 17 === 0
    val nVec = emb.count()
    val nQ = emb.filter(q).count()
    println(s"corpus $nVec vectors, $nQ queries, k=$K ($sfDir)")

    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, K)
      .localCheckpoint()

    def run(name: String, budget: String)(f: => DataFrame): Unit = {
      def once(): (DataFrame, Double) = {
        val t0 = System.nanoTime
        val df = f.localCheckpoint() // force full execution
        (df, (System.nanoTime - t0) / 1e9)
      }
      once() // warm: model build + JIT
      val (df, wall) = once()
      val recall = Similarity.recallAtK(df, exact, K)
      println(f"| $name | $budget | $recall%.3f | $wall%.2f |")
    }

    println("| path | budget | recall@10 | wall_s |")
    println("|---|---|---|---|")
    run("brute", "-")(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, K))
    for (pb <- Seq(0, 2, 4))
      run("lsh", s"probeBits=$pb")(
        Similarity.annTopK(emb, "vec_id", "embedding", q, K, probeBits = pb))
    for (np <- Seq(1, 2, 4))
      run("ivf", s"nprobe=$np")(
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, K, nprobe = np))
    for (sl <- Seq(20, 50, 100))
      run("pq", s"shortlist=$sl")(
        Similarity.pqTopK(emb, "vec_id", "embedding", q, K, shortlist = sl))
    for (np <- Seq(1, 2, 4))
      run("ivfpq", s"nprobe=$np")(
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, K, nprobe = np))
    spark.stop()
  }
}
