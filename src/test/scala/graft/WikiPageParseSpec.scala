package graft

import org.apache.spark.sql.functions._
import graft.parse.WikiParser

/** The fused Generator UDTF must be semantically identical to the
  * regex-composed parser on every fixture case (nested links, self-loops,
  * red links, dup titles, empty links, missing text, multi-page chunks) —
  * then it may replace it in the hot pipelines. */
class WikiPageParseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fixtureXml = {
    val src = scala.io.Source.fromResource("wiki/fixture.xml")
    try src.mkString finally src.close()
  }

  test("fused parser equals regex parser on the golden fixture") {
    val raw = Seq(fixtureXml).toDF("value")
    val regex = WikiParser.pages(raw)
      .select(col("title"), col("id"), col("text"))
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    val fused = WikiParser.pagesFused(raw)
      .select(col("title"), col("id"), col("text"))
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(fused == regex)
  }

  test("fused link graph equals regex link graph (incl. dup-title merge)") {
    val raw = Seq(fixtureXml).toDF("value")
    val regex = WikiParser.linkGraph(WikiParser.pages(raw))
      .as[(String, Seq[String])].collect().toMap
    val fused = WikiParser.linkGraphFused(raw)
      .as[(String, Seq[String])].collect().toMap
    assert(fused == regex)
    assert(fused("Dup") == Seq("A", "B"))
  }

  test("fused links column equals the outlinks() expression per page") {
    val raw = Seq(fixtureXml).toDF("value")
    val viaExpr = WikiParser.pages(raw)
      .select(col("title"), WikiParser.outlinks(col("text")).as("links"))
      .as[(String, Seq[String])].collect().toMap
    val viaGen = WikiParser.pagesFused(raw)
      .select(col("title"), col("links"))
      .as[(String, Seq[String])].collect().groupBy(_._1)
    // dup titles appear twice pre-merge on both sides; compare multisets
    val viaExprMulti = WikiParser.pages(raw)
      .select(col("title"), WikiParser.outlinks(col("text")).as("links"))
      .as[(String, Seq[String])].collect().groupBy(_._1)
    assert(viaGen.view.mapValues(_.map(_._2).sortBy(_.mkString("|")).toSeq).toMap ==
      viaExprMulti.view.mapValues(_.map(_._2).sortBy(_.mkString("|")).toSeq).toMap)
    assert(viaExpr.nonEmpty)
  }

  test("generator handles edge chunks: no pages, torn page, empty input") {
    val raw = Seq(
      "",                                          // empty
      "<mediawiki>header only</mediawiki>",        // no <page>
      "<page><title>Torn</title><text>[[X]]",      // no </page> → dropped
      "<page><title></title><text>[[X]]</text></page>", // empty title → dropped
      "<page><title>Ok</title><id>7</id><text xml:space=\"preserve\">a [[B]] [[]] [[ ]]</text></page>"
    ).toDF("value")
    val got = WikiParser.pagesFused(raw)
      .select(col("title"), col("id"), col("links"))
      .as[(String, String, Seq[String])].collect().toSeq
    assert(got == Seq(("Ok", "7", Seq("B")))) // empties/blank links dropped
  }

  test("wiki_pages is SQL-callable as a UDTF") {
    graft.functions.Functions.register(spark)
    Seq(fixtureXml).toDF("value").createOrReplaceTempView("raw_xml")
    val n = spark.sql(
      "SELECT p.title FROM raw_xml LATERAL VIEW wiki_pages(value) p AS title, id, text, links")
      .count()
    assert(n == WikiParser.pages(Seq(fixtureXml).toDF("value")).count())
  }
}
