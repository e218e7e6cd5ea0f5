package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TxLog

/** Child JVM of the CROSS-PROCESS OCC race (TxLogOccRetrySpec
  * "two-JVM append race") — a separate process with its OWN
  * SparkSession and classloader, sharing nothing with the parent but
  * the table directory: it blind-appends one-row batches in a tight
  * loop until `stopFile` appears, so the parent's snapshot-dependent
  * DMLs must re-claim slots past commits no in-process hook injected.
  *
  * args: tableDir stopFile countFile
  * Writes the number of appends that landed to `countFile`, exit 0. */
object AppendRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, stopFile, countFile) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-append-race-child")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    import spark.implicits._
    val stop = java.nio.file.Paths.get(stopFile)
    var n = 0
    // bounded tight loop: the parent stops us by touching stopFile; the
    // bound keeps a wedged parent from leaking a spinning child forever
    while (!java.nio.file.Files.exists(stop) && n < 2000) {
      TxLog.append(Seq((1000000L + n, s"child$n")).toDF("id", "v"), dir)
      n += 1
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(countFile),
      n.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
