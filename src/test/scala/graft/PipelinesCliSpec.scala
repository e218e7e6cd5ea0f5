package graft

import java.nio.file.Files

/** End-to-end CLI parity: the two reference entry points driven through
  * their `main`s on a tiny dump, asserting the reference's OUTPUT
  * LOCATIONS — notably PageRank's `<out>_sortedOutput` dir
  * (ref: PageRankAlgorithm.java:121-122). */
class PipelinesCliSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private val tmp = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
  private def tmpDir(p: String) = {
    val d = Files.createTempDirectory(p); tmp += d; d
  }
  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmp.foreach { d =>
      try scala.util.Using.resource(Files.walk(d)) { st =>
        st.iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
      } catch { case _: java.io.IOException => () }
    }
    super.afterAll()
  }

  private def dump(n: Int): String = {
    val sb = new StringBuilder
    for (i <- 0 until n)
      sb.append(s"<page><title>C$i</title><id>$i</id>" +
        s"<text xml:space=\"preserve\">alpha beta [[C${(i + 1) % n}]]</text></page>\n")
    val d = tmpDir("graft-cli-in")
    val f = d.resolve("dump.xml")
    Files.write(f, sb.toString.getBytes("UTF-8"))
    f.toString
  }

  test("WikiPageRank CLI writes title\\trank to <out>_sortedOutput like the reference") {
    spark // force the shared session so main()'s getOrCreate reuses it
    val in = dump(20)
    val out = tmpDir("graft-cli-out").resolve("pr").toString
    graft.pipelines.WikiPageRank.main(Array(in, out))
    assert(!new java.io.File(out).exists,
      "<out> itself must not be created — the reference deletes its intermediates")
    val rows = spark.read.text(out + "_sortedOutput")
      .collect().map(_.getString(0))
    assert(rows.length == 20)
    assert(rows.forall { r =>
      val p = r.split("\t"); p.length == 2 &&
        p(0).startsWith("C") && p(1).toDouble > 0.0
    })
  }

  test("WikiInvertedIndex CLI writes word\\tids to <out>") {
    spark
    val in = dump(7)
    val out = tmpDir("graft-cli-out2").resolve("idx").toString
    graft.pipelines.WikiInvertedIndex.main(Array(in, out))
    val rows = spark.read.text(out).collect().map(_.getString(0))
    val m = rows.map { r => val p = r.split("\t"); (p(0), p(1)) }.toMap
    // "alpha" occurs once per page → every id, comma-joined sorted
    assert(m("alpha") == (0 until 7).mkString(","))
  }
}
