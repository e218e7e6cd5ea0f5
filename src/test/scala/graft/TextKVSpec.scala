package graft

import graft.sources.TextKV
import graft.index.InvertedIndex

class TextKVSpec extends SparkTestBase {
  import spark.implicits._

  test("KV sink + source round-trips the inverted index byte shape") {
    val docs = Seq((1L, "dog cat dog"), (2L, "cat")).toDF("doc_id", "text")
    val idx = InvertedIndex.postingStrings(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-kv").toString + "/idx"
    TextKV.writeKV(idx, dir)

    // raw bytes match the reference's TextOutputFormat shape: word\tids
    val lines = TextKV.readLines(spark, dir).as[String].collect().sorted
    assert(lines.toSeq == Seq("cat\t1,2", "dog\t1,1"))

    // schema-explicit re-parse
    val back = TextKV.readKV(spark, dir, "word", "doc_ids")
      .as[(String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(("cat", "1,2"), ("dog", "1,1")))
  }

  test("multi-path line scan unions inputs like addInputPaths") {
    val base = java.nio.file.Files.createTempDirectory("graft-mp")
    val d1 = base.resolve("a"); val d2 = base.resolve("b")
    Seq("l1", "l2").toDF("value").write.text(d1.toString)
    Seq("l3").toDF("value").write.text(d2.toString)
    val got = TextKV.readLines(spark, d1.toString, d2.toString)
      .as[String].collect().sorted
    assert(got.toSeq == Seq("l1", "l2", "l3"))
  }

  test("value-side tabs survive the positional first-tab split") {
    val df = Seq(("k1", "v\twith\ttabs")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-tab").toString + "/t"
    TextKV.writeKV(df, dir)
    val back = TextKV.readKV(spark, dir).as[(String, String)].head()
    assert(back == ("k1", "v\twith\ttabs"))
  }
}
