package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different words about spark engines here"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "a b")                                            // < 3 tokens: no shingles
  ).toDF("doc_id", "text")

  test("edit-verified pairs agree with an in-test Levenshtein oracle") {
    // perturbed copies guarantee LSH candidates; the in-test DP is an
    // independent implementation of both the distance and the permille
    // threshold, so this checks the whole verify stage, not just Spark's
    // levenshtein builtin
    val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val base = (0 until 10).map { i =>
      (i.toLong, (0 until 12).map(j => vocab((i * 7 + j * 3) % vocab.length)).mkString(" "))
    }
    val copies = (0 until 5).map { i =>
      val words = base(i)._2.split(" "); words(6) = "mutated"
      (100L + i, words.mkString(" "))
    }
    val corpus = (base ++ copies).toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(corpus, "doc_id", "text", maxDistPermille = 300)
      .as[(Long, Long, Long)].collect().toSet

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = corpus.as[(Long, String)].collect().toMap
    val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatures(corpus, "doc_id", "text"))
      .as[(Long, Long)].collect()
    val expect = cands.flatMap { case (x, y) =>
      val d = lev(texts(x), texts(y))
      if (d.toLong * 1000 <= 300L * math.max(texts(x).length, texts(y).length))
        Some((x, y, d.toLong))
      else None
    }.toSet
    assert(got == expect)
    assert(expect.nonEmpty, "corpus must produce at least one verified pair")
  }

  test("exact dedup groups identical texts, keeper = min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").select("keep_id", "n").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
  }

  test("shingles: ordered distinct 3-grams; short docs get empty array") {
    val got = docs.select(col("doc_id"),
      Dedup.shingles(split(col("text"), " "), 3).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(got(0)._2.head == "the quick brown")
    assert(got(0)._2.size == 7)   // 9 tokens → 7 shingles, all distinct
    assert(got(4)._2.isEmpty)     // "a b"
  }

  test("minhash+LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs, "doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))           // identical → all bands collide
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("ngram jaccard is the exact rational value") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .filter(col("doc_a") === 1 && col("doc_b") === 4)
      .select("jaccard").as[Double].collect()
    assert(got.toSeq == Seq(1.0)) // identical docs
    val near = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("jaccard").as[Double].collect()
    // docs 1/2 share 6 of 8 distinct shingles → 6/8... compute: 7+7 shingles,
    // differ in last token → shingles containing "dog"/"cat" differ (1) →
    // inter=6, union=8 → 0.75
    assert(near.isEmpty || near.head == 0.75) // present only if LSH banded them
  }

  test("minhash_md5 SQL registration matches the built-in composition") {
    graft.functions.Functions.register(spark)
    val viaSql = spark.sql("SELECT minhash_md5(array('xx yy zz', 'aa bb cc'), 3) AS m")
      .as[String].head()
    val viaBuiltins = Seq(Seq("xx yy zz", "aa bb cc")).toDF("sgl")
      .select(array_min(transform(col("sgl"), s => md5(concat(lit("3:"), s)))).as("m"))
      .as[String].head()
    assert(viaSql == viaBuiltins)
  }

  test("minhash signatures skip null-token windows instead of NPE") {
    // input type admits array<string> with nulls (containsNull=true): a
    // window touching a null contributes no shingle, mirroring MinHashMd5
    val toks = Seq(Tuple1(Seq("aa", "bb", null, "cc", "dd", "ee"))).toDF("toks")
    val got = toks.select(graft.functions.MinHashSignatures
        .minhashSignatures(col("toks"), 2, 3).as("s"))
      .as[Seq[String]].head()
    // only "cc dd ee" survives (every other 3-window touches the null)
    val want = (0 until 2).map(p =>
      Seq(Tuple1(Seq("cc dd ee"))).toDF("sgl")
        .select(array_min(transform(col("sgl"), s => md5(concat(lit(s"$p:"), s)))))
        .as[String].head())
    assert(got == want)
    // every window nulled → no shingles → null signature (= too-short doc)
    val allNull = Seq(Tuple1(Seq("aa", null, "bb"))).toDF("toks")
      .select(graft.functions.MinHashSignatures
        .minhashSignatures(col("toks"), 2, 3).as("s"))
      .select(col("s").isNull).as[Boolean].head()
    assert(allNull)
  }

  test("degenerate corpus: bucket cap bounds pairs, keeps overflow connected to keeper") {
    // 1000 identical docs land in ONE bucket per band; uncapped that is
    // 499 500 pairs per band. With cap 50: quadratic only among the 50
    // smallest ids (1 225 pairs) plus a star from the min id to each of
    // the 950 overflow ids — every doc stays connected to keeper id 0.
    val many = (0L until 1000L).map(i => (i, "all these documents carry the same boilerplate text payload"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(many, "doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(sigs, maxBucket = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs.size == 50 * 49 / 2 + 950, s"got ${pairs.size}")
    for (i <- Seq(50L, 500L, 999L))
      assert(pairs.contains((0L, i)), s"overflow id $i must star-pair with keeper 0")
    val overflow = Dedup.bucketOverflow(
      Dedup.lshBands(sigs), Seq("band_id", "bkey"), maxBucket = 50)
      .as[(Int, String, Long)].collect()
    assert(overflow.length == 4 && overflow.forall(_._3 == 1000L)) // 4 bands, all size 1000
    // At or under the cap the expansion is identical to the uncapped one.
    val capped = Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs, "doc_id", "text"),
      maxBucket = 1000).as[(Long, Long)].collect().toSet
    val tiny = Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs, "doc_id", "text"),
      maxBucket = 5).as[(Long, Long)].collect().toSet
    assert(capped == tiny)
  }

  test("fused simhash_portable equals the composed relational form on the corpus") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val fused = Dedup.simhashPortable(real, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val composed = Dedup.simhashPortableComposed(real, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fused == composed)
    assert(fused.nonEmpty)
    // degenerate inputs: empty / all-null token arrays drop the doc on
    // both forms (composed loses the rows in the explode)
    import org.apache.spark.sql.functions._
    val empty = spark.sql("SELECT 1L AS doc_id, '' AS text")
      .select(col("doc_id"),
        graft.functions.SimHashPortable.simhash(
          graft.ops.TextOps.tokenize(col("text")), 60).as("simhash"))
    assert(empty.collect().head.isNullAt(1))
  }

  test("incremental pairs = full mining restricted to the new batch") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val full = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(real, "doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    for (cut <- Seq(20L, 50L, 80L)) {
      val corpusBands = Dedup.lshBands(
        Dedup.minhashSignatures(real.filter(col("doc_id") < cut), "doc_id", "text"))
      val newSigs = Dedup.minhashSignatures(
        real.filter(col("doc_id") >= cut), "doc_id", "text")
      val inc = Dedup.incrementalPairs(newSigs, corpusBands)
        .as[(Long, Long)].collect().toSet
      val want = full.filter { case (a, b) => a >= cut || b >= cut }
      assert(inc == want, s"cut=$cut")
    }
  }

  test("simhash: identical docs share signature; near-dups are close in Hamming") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
    val m = sigs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L))
    val hamming12 = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val hamming13 = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(hamming12 < hamming13, s"near-dup $hamming12 should beat unrelated $hamming13")
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 3).as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("passageDupes flags every non-keeper occurrence of a repeated chunk") {
    // 4-token chunks for a readable fixture. Docs 1/5/9 share an aligned
    // boilerplate chunk; doc 3 repeats a chunk INSIDE itself; doc 7 is
    // clean; doc 8's tail is shorter than a chunk (never matches).
    val boiler = "all rights reserved worldwide"
    val docs = Seq(
      (1L, s"$boiler unique one text here"),
      (5L, s"$boiler other words go here"),
      (9L, s"$boiler more filler words yet"),
      (3L, "x y z w x y z w"),
      (7L, "nothing repeated in this document at all ok"),
      (8L, s"pad pad pad pad $boiler".split(" ").dropRight(1).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.passageDupes(docs, "doc_id", "text", chunkTokens = 4)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (5L, 0L, boiler),          // keeper is (1,0): first in (doc, idx) order
      (9L, 0L, boiler),
      (3L, 1L, "x y z w")))      // in-doc repeat: keeper (3,0), dupe (3,1)
  }

  test("passageDupes: empty result when no chunk repeats") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "h g f e d c b a"))
      .toDF("doc_id", "text")
    assert(Dedup.passageDupes(docs, "doc_id", "text", chunkTokens = 4).count() == 0)
  }

  test("prefix-filter pairs = brute-force all-pairs Jaccard (no false negatives)") {
    // random word soup over a small vocab → plenty of shared shingles
    val rnd = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 40L).map { id =>
      val base = Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, base)
    }.toDF("doc_id", "text")
    def naive(th: Double): Set[(Long, Long, Double)] = {
      def sgl(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val m = docs.as[(Long, String)].collect().toMap.view.mapValues(sgl).toMap
      (for {
        (a, sa) <- m.toSeq; (b, sb) <- m.toSeq
        if a < b && sa.nonEmpty && sb.nonEmpty
        i = (sa & sb).size.toDouble; u = (sa | sb).size.toDouble
        if i / u >= th
      } yield (a, b, BigDecimal(i / u).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    }
    for (th <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.prefixFilterPairs(docs, "doc_id", "text", th)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == naive(th), s"threshold $th")
    }
  }

  test("verify-broadcast gate: shuffle fallback produces the identical pair set") {
    // force the fallback with zero-sized gates (a 100 TB corpus whose
    // candidate set overflows the driver) and pin that the shuffle
    // path is logically indistinguishable from the broadcast path
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "green", "blue", "cyan", "teal")
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(9)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val viaBroadcast = Dedup.prefixFilterPairs(docs, "doc_id", "text", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val viaShuffle = Dedup.prefixFilterPairs(docs, "doc_id", "text", 0.4,
        idBroadcastGate = 0L, cellBroadcastGate = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaBroadcast == viaShuffle && viaBroadcast.nonEmpty)
  }

  test("prefix filter prunes: candidate prefixes are a strict subset of shingles") {
    // high threshold → prefix length |d| − ⌈t|d|⌉ + 1 ≪ |d|: the operator
    // must consider far fewer (doc, shingle) index rows than a full
    // inverted-index self-join would
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = docs.select(col("doc_id"),
      graft.dedup.Dedup.shingles(
        graft.ops.TextOps.tokenize(col("text")), 3).as("sgl"))
    val totalShingles = sh.select(explode(col("sgl"))).count()
    // reproduce the operator's prefix length at t = 0.8: ~20% of rows
    val prefixRows = sh.filter(size(col("sgl")) > 0)
      .select((size(col("sgl")).cast("long")
        - ceil(size(col("sgl")) * 0.8) + 1).as("len"))
      .agg(sum(col("len"))).as[Long].head()
    assert(prefixRows.toDouble / totalShingles < 0.35,
      s"prefix index $prefixRows rows vs $totalShingles shingles")
  }

  test("substringPairs lockstep a naive longest-common-substring check") {
    // naive LCS length via DP — the exact contract substringPairs bands
    def lcsLen(a: String, b: String): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a.charAt(i - 1) == b.charAt(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = Iterator.continually(('a' + rnd.nextInt(4)).toChar)
      .take(n).mkString  // 4-char alphabet → plenty of short accidental
                         // matches that must NOT reach the >=40 cut
    val shared60 = blob(60); val shared40 = blob(40); val shared39 = blob(39)
    val docs = Seq(
      1L -> (blob(100) + shared60 + blob(80)),   // pair (1,2): >=60 shared
      2L -> (shared60 + blob(150)),
      3L -> (blob(50) + shared40 + blob(50)),    // pair (3,4): exactly 40
      4L -> (blob(120) + shared40),
      5L -> (shared39 + blob(90)),               // pair (5,6): 39 — excluded
      6L -> (blob(70) + shared39),
      7L -> blob(39),                            // shorter than minLen
      8L -> (shared60 + blob(10) + shared60)     // internal repeat + pairs w/ 1,2
    ).toDF("doc_id", "text")
    val want = (for {
      a <- 1L to 8L; b <- (a + 1) to 8L
      ta = docs.where(col("doc_id") === a).select("text").as[String].head()
      tb = docs.where(col("doc_id") === b).select("text").as[String].head()
      if lcsLen(ta, tb) >= 40
    } yield (a, b)).toList
    val got = Dedup.substringPairs(docs, "doc_id", "text",
        minLen = 40, gramLen = 32)
      .orderBy("da", "db").as[(Long, Long)].collect().toList
    assert(got == want.sorted)
  }

  test("substringPairs is code-point safe around supplementary chars") {
    // an emoji (surrogate pair in UTF-16) BEFORE the shared region:
    // UTF-16 offsets would shift the extracted gram and lose the pair
    val rnd = new scala.util.Random(11)
    val shared = Iterator.continually(('a' + rnd.nextInt(4)).toChar)
      .take(50).mkString
    val docs = Seq(
      1L -> ("😀😀😀" + shared),
      2L -> ("plainprefix" + shared + "tail")
    ).toDF("doc_id", "text")
    val got = Dedup.substringPairs(docs, "doc_id", "text",
        minLen = 40, gramLen = 32)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 2L)))
  }
}
