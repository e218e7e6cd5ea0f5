package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The DSv2 graftkv connector vs the expression-based TextKV reader:
  * identical rows under every split size (boundary sweep), pruning and
  * filter pushdown visible in the executed plan.
  */
class KVSourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_kv").toString
    val rows = (0 until 500).map { i =>
      // values with embedded tabs (split must be on the FIRST tab),
      // empty values, and a no-tab line
      if (i == 7) s"notab$i"
      else if (i % 13 == 0) s"k$i\t"
      else s"k$i\tv$i\textra$i"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "data.txt"),
      rows.mkString("", "\n", "\n").getBytes("UTF-8"))
    d
  }

  private def viaDsv2(maxSplit: Long) =
    spark.read.format("graftkv")
      .option("maxSplitBytes", maxSplit).load(dir + "/data.txt")

  test("boundary sweep: every split size yields the identical row set") {
    val want = viaDsv2(1L << 20).as[(String, String)].collect().sorted.toSeq
    assert(want.size === 500)
    for (split <- Seq(7L, 64L, 100L, 301L, 1000L)) {
      val got = viaDsv2(split).as[(String, String)].collect().sorted.toSeq
      assert(got === want, s"split=$split")
      // and it actually split: the 1e6 case is one partition, this many
      val parts = viaDsv2(split).rdd.getNumPartitions
      assert(parts > 1, s"split=$split produced a single partition")
    }
  }

  test("matches the expression-based TextKV reader on tab semantics") {
    val dsv2 = viaDsv2(1L << 20).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // readKV: substring_index/instr convention — no-tab line keeps the
    // whole line as key and (per instr=0) yields the line as value too;
    // the connector yields NULL value there. Compare on tabbed lines,
    // and pin the connector's no-tab convention explicitly.
    val tabbed = graft.sources.TextKV.readKV(spark, dir + "/data.txt")
      .filter(col("value") =!= col("key"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(tabbed.subsetOf(dsv2))
    assert(dsv2.contains(("notab7", None)))
  }

  test("column pruning narrows the scan schema; filters reach the reader") {
    val pruned = viaDsv2(1L << 20).select("key")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.output.map(_.name) === Seq("key"))

    val filtered = viaDsv2(1L << 20).filter(col("key") === "k42")
    val fscan = filtered.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(fscan.scan.description().contains("EqualTo(key,k42)"))
    assert(filtered.count() === 1)
    val prefix = viaDsv2(1L << 20).filter(col("key").startsWith("k42"))
    assert(prefix.count() === 11) // k42, k420..k429
  }

  test("V2 write path round-trips; overwrite truncates; multi-col joins by tab") {
    val d3 = java.nio.file.Files.createTempDirectory("graft_kvw").toString + "/out"
    val df = Seq(("a", "1", "x"), ("b", "2", "y")).toDF("k", "v1", "v2")
    df.write.format("graftkv").mode("append").save(d3)
    val back = spark.read.format("graftkv").load(d3)
      .as[(String, String)].collect().sorted.toSeq
    assert(back === Seq(("a", "1\tx"), ("b", "2\ty"))) // first tab splits
    // overwrite replaces, not appends
    Seq(("c", "3", "z")).toDF("k", "v1", "v2")
      .write.format("graftkv").mode("overwrite").save(d3)
    val after = spark.read.format("graftkv").load(d3)
      .as[(String, String)].collect().toSeq
    assert(after === Seq(("c", "3\tz")))
    // byte-identical to TextKV.writeKV on the same rows
    val d4 = java.nio.file.Files.createTempDirectory("graft_kvw2").toString + "/out"
    graft.sources.TextKV.writeKV(df, d4)
    def bytes(dir: String) = {
      val base = new java.io.File(dir)
      base.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.endsWith(".crc"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).sorted.toSeq
    }
    // compare line sets of the ORIGINAL write (re-write d3 with df)
    df.write.format("graftkv").mode("overwrite").save(d3)
    assert(bytes(d3) === bytes(d4))
  }

  test("micro-batch streaming read equals the batch read, one file per trigger") {
    val d5 = java.nio.file.Files.createTempDirectory("graft_kvstream").toString
    for (f <- 0 until 4)
      java.nio.file.Files.write(java.nio.file.Paths.get(d5, s"f$f.txt"),
        (0 until 50).map(i => s"k${f}_$i\tv$i").mkString("", "\n", "\n")
          .getBytes("UTF-8"))
    val q = spark.readStream.format("graftkv")
      .option("filesPerTrigger", "1").load(d5)
      .writeStream.outputMode("append")
      .format("memory").queryName("graftkv_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graftkv_stream")
      .as[(String, String)].collect().sorted.toSeq
    val want = spark.read.format("graftkv").load(d5)
      .as[(String, String)].collect().sorted.toSeq
    assert(got === want)
    assert(got.size === 200)
    // one file per trigger -> at least 4 micro-batches actually ran
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("multi-file directories and the _-prefixed skip rule") {
    val d2 = java.nio.file.Files.createTempDirectory("graft_kv2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(d2, "a.txt"),
      "a\t1\nb\t2\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d2, "b.txt"),
      "c\t3\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d2, "_SUCCESS"),
      Array.empty[Byte])
    val got = spark.read.format("graftkv").load(d2)
      .as[(String, String)].collect().sorted.toSeq
    assert(got === Seq(("a", "1"), ("b", "2"), ("c", "3")))
  }
}
