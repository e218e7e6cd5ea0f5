package graft

import graft.text.Retrieval

/** BM25 checked against a naive in-test implementation (plain Scala
  * loops — a second independent formulation of the same recurrence);
  * the DuckDB oracle re-checks cross-engine at sf0.01. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry date"),
    (2L, "apple apple apple apple"),
    (3L, "banana cherry cherry banana cherry"),
    (4L, "dog egg fish grape"),
    (5L, "apple banana dog egg fish grape plum"))

  private def reference(queries: Seq[(Long, String)], k1: Double = 1.2,
                        b: Double = 0.75): Map[(Long, Long), Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    val out = scala.collection.mutable.Map[(Long, Long), Double]()
    for ((qid, q) <- queries; (did, words) <- toks.toSeq) {
      val dl = words.size
      var s = 0.0
      for (term <- q.split(" ").distinct) {
        val tf = words.count(_ == term)
        if (tf > 0) {
          val df = toks.values.count(_.contains(term))
          val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
          s += idf * (tf * (k1 + 1)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }
      }
      if (s > 0.0)
        out((qid, did)) =
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.toMap
  }

  test("scores match the naive implementation exactly after round(6)") {
    val queries = Seq((0L, "banana cherry"), (1L, "apple"), (2L, "plum grape"))
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", queries, k = 10)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (q, _, d, s) => (q, d) -> s }.toMap
    val want = reference(queries)
    assert(got.keySet == want.keySet)
    for (key <- want.keySet)
      assert(got(key) == want(key), s"query/doc $key: ${got(key)} vs ${want(key)}")
  }

  test("ranking: heavy repetition of one term saturates below broad coverage") {
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", Seq((0L, "banana cherry")), k = 10)
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(_._2).map(_._3).toSeq
    // doc 3 (both terms, high tf) > doc 1 (both terms once) > doc 5 (one)
    assert(got == Seq(3L, 1L, 5L))
  }

  test("rrf fuses ranks exactly: doc on both lists beats either top-1") {
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 99L, 1L), (0L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrf(Seq(a, b), k0 = 60, topK = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20: 1/62 + 1/62 tops doc 10/99's single 1/61
    assert(got.map(_._3).toSeq == Seq(20L, 10L, 99L, 30L))
    val m = got.map(r => r._3 -> r._4).toMap
    assert(m(20L) == r6(1.0 / 62 + 1.0 / 62))
    assert(m(10L) == r6(1.0 / 61) && m(99L) == r6(1.0 / 61)) // tie → doc_id
    assert(m(30L) == r6(1.0 / 63))
  }

  test("rank cut respects k with the doc_id tie-break") {
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", Seq((0L, "apple")), k = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 2 && got.forall(_._2 <= 2))
  }

  test("tfidf scores a doc subset against FULL-corpus df and N") {
    import org.apache.spark.sql.functions.col
    // 'rare' appears only in doc 1; 'common' in all 4 docs (idf = ln(1)=0)
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common mid"),
      (3L, "common mid"),
      (4L, "common")).toDF("doc_id", "text")
    val got = Retrieval.tfidfTopK(docs, "doc_id", "text", col("doc_id") === 1, 5)
      .as[(Long, Long, String, Double)].collect().toList
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df('rare')=1 of N=4 → 1·ln(4); df('common')=4 → 2·ln(1)=0; the
    // global df must see docs 2..4 even though they're filtered out
    assert(got == List(
      (1L, 1L, "rare", r6(math.log(4.0))),
      (1L, 2L, "common", 0.0)))
  }

  test("rankingMetrics computes MRR/DCG on the fixed-point grid") {
    // query 0: rel at ranks 2 and 4; query 1: no relevant hits
    val ranked = Seq(
      (0L, 1L, 0L), (0L, 2L, 1L), (0L, 3L, 0L), (0L, 4L, 1L),
      (1L, 1L, 0L), (1L, 2L, 0L)).toDF("query", "rank", "rel")
    val got = Retrieval.rankingMetrics(ranked).orderBy("query")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    def w(rank: Int): Long =
      math.floor(1000000.0 / (math.log(rank + 1.0) / math.log(2.0)) + 0.5).toLong
    assert(got == List(
      (0L, 2L, 2L, 500000L, w(2) + w(4)),
      (1L, 0L, -1L, 0L, 0L)))
  }
}
