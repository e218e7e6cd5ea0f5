package graft

import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("vocabulary: exact counts, doc frequency, deterministic tie cut") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // a:2 occurrences/1 doc, b:2/2, c:1/1 — ties broken token-asc, k=2
    // cuts c and orders a before b
    val got = TextAnalysis.vocabulary(docs, "doc_id", "text", k = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 1L), ("b", 2L, 2L)))
  }

  test("qualityCut keeps exactly the docs at/above the exact percentile") {
    val docs = (1 to 8).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    // percentile([1..8], 0.5) = 4.5 interpolated → keep token counts 5..8
    val got = TextAnalysis.qualityCut(docs, "doc_id", "text", q = 0.5)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(5L, 6L, 7L, 8L))
    assert(got.forall(_._3 == 4.5))
  }

  test("sourceCap keeps the first k docs per source, deterministic order") {
    val docs = (1L to 10L).map(i => (i, s"src${i % 2}")).toDF("doc_id", "src")
    val got = TextAnalysis.sourceCap(docs, "doc_id", "src", k = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // per source the 3 LOWEST ids survive with ranks 1..3
    assert(got == Seq((1L, "src1", 1L), (2L, "src0", 1L), (3L, "src1", 2L),
      (4L, "src0", 2L), (5L, "src1", 3L), (6L, "src0", 3L)))
  }

  test("decontaminate flags exactly the train docs sharing an eval 5-gram") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),          // eval
      (10L, "x alpha beta gamma delta epsilon y"),          // shares 5-gram
      (11L, "alpha beta gamma q delta epsilon zeta p"),     // only 3-gram overlap
      (12L, "totally unrelated words in this one here")     // clean
    ).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(docs, "doc_id", "text",
        evalPred = col("doc_id") < 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L))
  }

  test("decontaminate: hashed form ≡ string-shingle composed form") {
    // r17 equivalence pin: the broadcast + explode now carry xxhash64
    // shingle hashes; on any collision-free corpus (all realistic ones)
    // the per-doc hit counts must equal the string-keyed formulation,
    // including edge cases — short docs (< n tokens), empty text, docs
    // with repeated shingles (per-doc distinctness), multi-hit docs.
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "tiny doc"),                                     // < 5 tokens
      (10L, "x alpha beta gamma delta epsilon y"),
      (11L, "one two three four five one two three four five"), // repeats
      (12L, "alpha beta gamma delta epsilon zeta extra"),   // 2 distinct hits
      (13L, ""),
      (14L, "totally unrelated words in this one here")
    ).toDF("doc_id", "text")
    val pred = col("doc_id") < 10
    val fused = TextAnalysis.decontaminate(docs, "doc_id", "text", pred)
      .as[(Long, Long)].collect().toMap
    val composed = graft.text.TextAnalysis
      .decontaminateComposed(docs, "doc_id", "text", pred)
      .as[(Long, Long)].collect().toMap
    assert(fused == composed)
    assert(fused == Map(10L -> 1L, 11L -> 1L, 12L -> 2L))
  }

  test("quality features on a crafted doc") {
    val docs = Seq((1L, "the cat the cat mat")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_chars") == 19L)
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Double]("stop_ratio") == 0.4)      // 2×"the" / 5
    assert(r.getAs[Double]("distinct_ratio") == 0.6)  // the,cat,mat / 5
    assert(r.getAs[Double]("mean_word_len") == 3.0)   // (19-4)/5
  }

  test("token counts: whitespace vs regex tokenizer") {
    val docs = Seq((1L, "ab 12 c-d")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("re_tokens") == 5L) // ab, 12, c, -, d
  }

  test("fingerprint matches the classic h*31+c polynomial") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprint(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("fp") == 96354L) // ((0*31+97)*31+98)*31+99
  }

  test("corpus is single-spaced (tokenize ≡ string_split(' ') precondition)") {
    // Every text oracle compares TextOps.tokenize (\s+ split, trimmed)
    // against DuckDB string_split(text, ' '); they agree only when no
    // document has leading/trailing/double whitespace or tabs/newlines —
    // text_quality's mean_word_len formula assumes the same. Assert it so
    // a testdata regeneration that breaks the property fails HERE instead
    // of as an unexplained oracle hash mismatch (ADVICE r1).
    import org.apache.spark.sql.functions.col
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bad = Tables.documents(spark, sf)
        .filter(col("text").rlike("""\s\s|^\s|\s$|[\t\n\r]"""))
        .count()
      assert(bad == 0L, s"$sf has $bad non-single-spaced documents")
    }
  }

  test("curateObserved accumulates data-quality counters during the pass") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (df, obs) = TextAnalysis.curateObserved(docs, "doc_id", "text")
    val rows = df.collect()
    val m = obs.get
    assert(m("n_docs") == docs.count())
    assert(m("n_keepers") == rows.count(_.getBoolean(4)))
    assert(m("n_en") == rows.count(_.getString(3) == "en"))
    assert(m("token_mass") == rows.map(_.getLong(1)).sum)
  }

  test("langId identifies real-language samples via stopword profiles") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy for a while"),
      (2L, "el gato se sienta en la mesa y no es un problema"),
      (3L, "der hund und die katze sind mit dem ball in den garten"),
      (4L, "le chat et les chiens sont dans un jardin du village"),
      (5L, "中文文本处理很有趣"),
      (6L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "es"); assert(got(3L) == "de")
    assert(got(4L) == "fr"); assert(got(5L) == "zh"); assert(got(6L) == "und")
  }

  test("bigramLmScore matches a naive MLE LM computed in-test") {
    val docs = Seq(
      (1L, "a b a b"),    // bigrams: ab, ba, ab
      (2L, "a b c"),      // bigrams: ab, bc
      (3L, "solo"))       // < 2 tokens → excluded
      .toDF("doc_id", "text")
    // corpus counts: ab=3, ba=1, bc=1; prefixes: a→3, b→2
    def q(c: Long, p: Long): Long =
      math.floor(math.log(c.toDouble / p.toDouble) * 1e6 + 0.5).toLong
    def score(qs: Seq[Long]): Double = qs.sum.toDouble / 1e6 / qs.size
    val expect = Map(
      1L -> (3L, score(Seq(q(3, 3), q(1, 2), q(3, 3)))),
      2L -> (2L, score(Seq(q(3, 3), q(1, 2)))))
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("chunkOverlap boundaries: exact fit, one-over, sub-stride, empty") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(64)),  // exact chunk size → exactly 1 chunk
      (2L, words(65)),  // one over → 2 chunks, second = tokens 33..65 (33)
      (3L, words(10)),  // below stride → 1 chunk of 10
      (4L, ""))         // empty → no rows
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkOverlap(docs, "doc_id", "text")
      .select("doc_id", "chunk_id", "n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 64L), (2L, 0L, 64L), (2L, 1L, 33L), (3L, 0L, 10L)))
  }

  test("chunk digests cover the doc: consecutive chunks overlap by chunk-stride") {
    val docs = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    // 100 tokens → chunks at 0..63, 32..95, 64..99
    val got = TextAnalysis.chunkOverlap(docs, "doc_id", "text")
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().sorted
    assert(got.toList == List((0L, 64L), (1L, 64L), (2L, 36L)))
  }

  test("boilerplateStrip: >= minDocs strips, minDocs-1 survives, order kept, empty ok") {
    // "footer" in docs 1,2,3 (= minDocs) → stripped everywhere;
    // "promo" in docs 1,2 (= minDocs-1) → survives; doc 4 is ALL
    // boilerplate → empty clean_text. Distinct-doc counting: doc 3
    // repeats "footer" twice but still counts once.
    val docs = Seq(
      (1L, "alpha\nfooter\npromo\nomega"),
      (2L, "footer\npromo"),
      (3L, "footer\nfooter\nbeta"),
      (4L, "footer")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateStrip(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got === Map(
      1L -> (("alpha\npromo\nomega", 1L)),
      2L -> (("promo", 1L)),
      3L -> (("beta", 2L)),
      4L -> (("", 1L))))
  }

  test("boilerplateStrip: join fallback (gate=0) agrees with the broadcast path") {
    // Same corpus through both paths — maxBroadcastHashes = 0 forces
    // the bounded probe to overflow so the join formulation runs.
    // Includes a null-text doc, an all-boilerplate doc, trailing-empty
    // lines, and a doc with no boilerplate at all.
    val docs = Seq(
      (1L, "alpha\nfooter\npromo\nomega"),
      (2L, "footer\npromo"),
      (3L, "footer\nfooter\nbeta"),
      (4L, "footer"),
      (5L, "clean only\nlines here"),
      (6L, "footer\n"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    def run(gate: Int) =
      TextAnalysis.boilerplateStrip(docs, "doc_id", "text", minDocs = 3,
          maxBroadcastHashes = gate)
        .as[(Long, Option[String], Option[Long])].collect()
        .map { case (k, v, n) => k -> ((v, n)) }.toMap
    val broadcastPath = run(1 << 20)
    val joinPath = run(0)
    assert(broadcastPath === joinPath)
    assert(broadcastPath(7L) === ((None, None)))
    assert(broadcastPath(4L) === ((Some(""), Some(1L))))
  }

  test("tokenEntropy matches a naive fixed-point entropy computed in-test") {
    val docs = Seq(
      (1L, "a a a a"),       // zero entropy: one distinct token
      (2L, "a b c d"),       // max entropy: all distinct (ln 4)
      (3L, "a a b"),         // mixed counts
      (4L, "x"))             // single token -> entropy 0
      .toDF("doc_id", "text")
    def naive(counts: Seq[Long]): (Long, Double) = {
      val n = counts.sum
      val q = counts.map(c =>
        c * math.floor(math.log(n.toDouble / c.toDouble) * 1e6 + 0.5).toLong).sum
      (n, q.toDouble / 1e6 / n.toDouble)
    }
    val expect = Map(
      1L -> naive(Seq(4L)), 2L -> naive(Seq(1L, 1L, 1L, 1L)),
      3L -> naive(Seq(2L, 1L)), 4L -> naive(Seq(1L)))
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expect)
    assert(got(1L)._2 === 0.0)
    assert(got(2L)._2 > got(3L)._2)
  }

  test("collocations ranks above-chance pairs by exact quantized PMI") {
    // 'new york' always adjacent (strong collocation); 'the' everywhere
    // (chance-level pairs); minCount prunes singletons
    val docs = Seq.tabulate(10) { i =>
      (i.toLong, s"new york the w$i the city the")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5, topK = 3)
      .as[(String, String, Long, Long)].collect()
    // naive PMI on the same fixed-point grid
    val toks = (0 until 10).map(i => s"new york the w$i the city the".split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = toks.map(_.size).sum.toLong
    val tb = toks.map(_.size - 1).sum.toLong
    val bigs = toks.flatMap(w => w.init.zip(w.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5)
    def pmiQ(p: ((String, String), Long)): Long = {
      val ((w1, w2), n) = p
      math.floor((math.log(n.toDouble / tb.toDouble)
        - math.log(uni(w1).toDouble / t.toDouble)
        - math.log(uni(w2).toDouble / t.toDouble)) * 1e6 + 0.5).toLong
    }
    val naive = bigs.toSeq.map(p => (p._1._1, p._1._2, p._2, pmiQ(p)))
      .sortBy(r => (-r._4, r._1, r._2)).take(3)
    assert(got.toSeq === naive)
    assert(got.head._1 === "new" && got.head._2 === "york")
  }
}
