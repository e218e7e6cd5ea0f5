package graft

import org.apache.spark.sql.SparkSession

/** Benchmark surface (driver contract): one JSON line with the total
  * seconds over all passing query keys plus per-key detail.
  *
  * Robustness rules (VERDICT round 1, tasks 2–3):
  *  - A failing query NEVER contributes a sentinel to the total: it is
  *    reported under `"errors"` and excluded from `"queries"`/`"value"`.
  *  - The JSON line goes to stdout AND to a file
  *    (`$SPARK_GRAFT_BENCH_OUT`, default `/root/repo/BENCH_LAST.json`),
  *    because sbt's `[info]` stdout decoration made round 1's line
  *    unparseable for the driver (`"parsed": null`).
  *  - Best-of-3 per key, with per-key `[min, median, max]` under
  *    `"spread"` so a reader can tell host noise (wide spread) from a
  *    real regression (tight spread at a worse level).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_LAST.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup: whichever query runs first otherwise absorbs
    // ~5s of one-off compilation that isn't its cost.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ").take(200)

    val timings = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val runs = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = esc(Option(e.getMessage).getOrElse(e.getClass.getName))
            None
        }
      }
      if (runs.nonEmpty && !errors.contains(name)) timings(name) = runs.sorted
    }

    val qs = timings.map { case (k, rs) => s"\"$k\":${fmt(rs.head)}" }
      .mkString("{", ",", "}")
    val spread = timings.map { case (k, rs) =>
      val med = rs(rs.size / 2)
      s"\"$k\":[${fmt(rs.head)},${fmt(med)},${fmt(rs.last)}]"
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => s"\"$k\":\"$m\"" }
      .mkString("{", ",", "}")
    val total = timings.values.map(_.head).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"reps":$reps,"sf":"$sfDir"}"""
    println(line)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // stdout line already emitted
    spark.stop()
  }
}
