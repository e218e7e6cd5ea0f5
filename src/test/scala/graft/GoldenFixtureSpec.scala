package graft

import graft.index.InvertedIndex
import graft.pagerank.PageRank
import graft.parse.WikiParser

/** Golden end-to-end tests over src/test/resources/wiki/fixture.xml —
  * the FIXTURES.md §1 case table, every row. */
class GoldenFixtureSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val xml = {
    val src = scala.io.Source.fromResource("wiki/fixture.xml")
    try src.mkString finally src.close()
  }
  private lazy val pages = WikiParser.pages(Seq(xml).toDF("value"))
  private lazy val graph = WikiParser.linkGraph(pages)

  test("fixture: link-graph cases (plain, nested, self, red, no-text, dup-title merge)") {
    val g = graph.as[(String, Seq[String])].collect().toMap
    assert(g("Plain") == Seq("A", "B"))
    // [[x [[Inner1]] [[Inner2]] y]] → innermost of first lazy match + second match
    assert(g("Nested") == Seq("Inner1", "Inner2"))
    assert(g("Self") == Seq("Self"))
    assert(g("Red") == Seq("NoSuchPage"))
    assert(g("NoText") == Seq())
    // duplicate <title>Dup</title> pages merge; N counts distinct titles
    assert(g("Dup") == Seq("A", "B"))
    assert(g.size == 11) // 12 <page> blocks, Dup merged
  }

  test("fixture: pagerank matches naive; ties sorted by title; red links absent") {
    val naiveGraph = Map(
      "Plain" -> Seq("A", "B"), "Nested" -> Seq("Inner1", "Inner2"),
      "Self" -> Seq("Self"), "Red" -> Seq("NoSuchPage"), "NoText" -> Seq(),
      "TieA" -> Seq(), "TieB" -> Seq(), "Dup" -> Seq("A", "B"),
      "Scrub" -> Seq(), "A" -> Seq(), "B" -> Seq())
    var rank = naiveGraph.map { case (t, _) => t -> 1.0 / naiveGraph.size }
    for (_ <- 1 to 10) {
      val c = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((t, ls) <- naiveGraph if ls.nonEmpty; l <- ls if naiveGraph.contains(l))
        c(l) += rank(t) / ls.size
      rank = naiveGraph.map { case (t, _) => t -> (0.85 * c(t) + 0.15) }
    }
    val got = PageRank.ranked(graph, iters = 10).as[(String, Double)].collect()
    assert(got.map(_._1).toSet == rank.keySet)
    got.foreach { case (t, r) => assert(math.abs(r - rank(t)) < 1e-9, t) }
    // engineered ties (all contribution-less pages share rank 1-d, which
    // the engine computes as 1.0-0.85 = 0.150…02 — NOT the literal 0.15):
    // consecutive equal ranks must be title-ascending, and ties must exist
    val equalPairs = got.sliding(2).collect {
      case Array((t1, r1), (t2, r2)) if r1 == r2 => (t1, t2)
    }.toSeq
    assert(equalPairs.nonEmpty, "fixture must engineer rank ties")
    equalPairs.foreach { case (t1, t2) => assert(t1 < t2, s"tie order $t1 !< $t2") }
    assert(!got.exists(t => Set("NoSuchPage", "Inner1", "Inner2")(t._1)))
  }

  test("fixture: inverted index — scrub, lowercase, duplicate postings, first id") {
    val idx = InvertedIndex.postingStrings(WikiParser.docs(pages), "doc_id", "text")
      .as[(String, String)].collect().toMap
    // "ab1cd, ef! Mixed MIXED mixed dup dup" with doc id 19 (first <id>, not
    // the revision id 999): digits/punct scrubbed, lowercased, dups kept
    assert(idx("ab") == "19")
    assert(idx("cd") == "19")
    assert(idx("ef") == "19")
    assert(idx("mixed") == "19,19,19")
    assert(idx("dup") == "19,19")
    assert(!idx.contains("ab1cd"))
    // cross-doc posting: "words" appears in TieA(15) and TieB(16)
    assert(idx("words") == "15,16")
  }
}
