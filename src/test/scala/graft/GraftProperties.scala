package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.pagerank.PageRank
import graft.text.TextAnalysis

/** Property tests (SURVEY.md §5.2.1). Each case runs a real Spark job, so
  * the per-property case count is small — breadth comes from randomness
  * across rounds, not volume. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val rawText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
      1 -> Gen.oneOf('!', ',', '.', '\t'))).map(_.mkString)

  property("tokenizer normalize∘scrub is idempotent") = forAll(rawText) { s =>
    val df = Seq(s).toDF("v")
    val once = df.select(
      TextOps.normalizeToken(TextOps.scrubNonAlpha(col("v"))).as("t"))
    val twice = once.select(
      TextOps.normalizeToken(TextOps.scrubNonAlpha(col("t"))).as("t"))
    once.as[String].head() == twice.as[String].head()
  }

  property("fingerprint matches an independent fold") = forAll(rawText) { s =>
    val got = TextAnalysis.fingerprint(Seq((1L, s)).toDF("id", "t"), "id", "t")
      .select("fp").as[Long].head()
    val want = s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    got == want
  }

  private val graphGen: Gen[Map[String, Seq[String]]] = for {
    n <- Gen.choose(2, 7)
    nodes = (0 until n).map(i => s"n$i")
    links <- Gen.sequence[Seq[Seq[String]], Seq[String]](nodes.map(_ =>
      Gen.listOfN(3, Gen.oneOf(nodes :+ "RED")).map(_.take(3))))
  } yield nodes.zip(links).toMap

  private def naive(graph: Map[String, Seq[String]], iters: Int): Map[String, Double] = {
    val titles = graph.keySet
    var rank = graph.map { case (t, _) => t -> 1.0 / graph.size }
    for (_ <- 1 to iters) {
      val contribs = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((t, ls) <- graph if ls.nonEmpty; l <- ls if titles(l))
        contribs(l) += rank(t) / ls.size
      rank = graph.map { case (t, _) => t -> (0.85 * contribs(t) + 0.15) }
    }
    rank
  }

  property("pagerank equals the naive interpreter on random graphs") =
    forAll(graphGen) { g =>
      val df = g.toSeq.toDF("title", "outlinks")
      val got = PageRank.run(df, iters = 3).as[(String, Double)].collect().toMap
      val want = naive(g, 3)
      got.keySet == want.keySet &&
        got.forall { case (t, r) => math.abs(r - want(t)) < 1e-9 }
    }

  property("every surviving page has rank >= 1-d and output is complete") =
    forAll(graphGen) { g =>
      val got = PageRank.run(g.toSeq.toDF("title", "outlinks"), iters = 2)
        .as[(String, Double)].collect()
      got.length == g.size && got.forall(_._2 >= 0.15 - 1e-12)
    }

  // random as-of inputs: few keys + small times force heavy key/time
  // collisions; right side deduped per (key, ts) as the contract requires
  private val asofGen: Gen[(Seq[(Long, Long, Long)], Seq[(Long, Long, String)])] = for {
    nl <- Gen.choose(1, 12)
    nr <- Gen.choose(0, 12)
    ls <- Gen.listOfN(nl, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
    } yield (k, t))
    rs <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
      p <- Gen.alphaStr.map(_.take(3))
    } yield (k, t, p))
  } yield (ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
           rs.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq)

  property("merge-scan as-of equals the union+window form on random inputs") =
    forAll(asofGen) { case (ls, rs) =>
      val l = ls.toDF("id", "k", "t")
      val r = rs.toDF("k", "t", "p")
      val a = graft.ops.AsOfJoin.asOf(l, r, "k", "t", Seq("p"))
        .select("id", "p").as[(Long, Option[String])].collect().toMap
      val b = graft.plans.AsOfMergeJoin.asOf(l, r, "k", "t", Seq("p"))
        .select("id", "p").as[(Long, Option[String])].collect().toMap
      a == b
    }

  property("incremental CC equals full recompute on random edge splits") =
    forAll(pairGraphGen) { pairs =>
      val spark2 = SparkTestBase.session
      import spark2.implicits._
      // split edges deterministically: every third edge is the delta
      val (delta, old) = pairs.zipWithIndex.partition(_._2 % 3 == 0)
      val cc0 = graft.graph.ConnectedComponents.run(
        old.map(_._1).toDF("a", "b"), "a", "b")
      val got = graft.graph.ConnectedComponents.incremental(
          cc0, delta.map(_._1).toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val want = graft.graph.ConnectedComponents.run(
          pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // self-loop-only nodes can drop out of either side; compare on
      // the union domain with self-labels as the default
      val keys = got.keySet ++ want.keySet
      keys.forall(k => got.getOrElse(k, k) == want.getOrElse(k, k))
    }

  property("forward as-of equals a naive earliest-at-or-after lookup") =
    forAll(asofGen) { case (ls, rs) =>
      val l = ls.toDF("id", "k", "t")
      val r = rs.toDF("k", "t", "p")
      val got = graft.ops.AsOfJoin.asOfForward(l, r, "k", "t", Seq("p"))
        .select("id", "p").as[(Long, Option[String])].collect().toMap
      val naive = ls.map { case (id, k, t) =>
        id -> rs.filter(x => x._1 == k && x._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
      }.toMap
      got == naive
    }

  private val pairGraphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 24)
    m <- Gen.choose(0, 30)
    pairs <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
  } yield pairs

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs if a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.filter(p => p._1 != p._2).flatMap(p => Seq(p._1, p._2)).distinct
    // min-id root: union always hangs the larger root under the smaller,
    // so find() already lands on the component minimum
    nodes.map(x => x -> find(x)).toMap
  }

  property("star-algorithm components equal union-find on random pair graphs") =
    forAll(pairGraphGen) { pairs =>
      // fastPathMaxEdges = 0 forces the DISTRIBUTED star loop — the
      // default gate would route these small graphs to the driver
      // union-find, which is exactly what this property checks against
      val got = graft.graph.ConnectedComponents
        .run(pairs.toDF("a", "b"), "a", "b", fastPathMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }

  // small vocab so chunk collisions actually occur across random docs
  private val chunkCorpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    texts <- Gen.listOfN(n,
      Gen.listOf(Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("passage dedup equals the naive chunk scan on random corpora") =
    forAll(chunkCorpusGen) { corpus =>
      val w = 3
      val got = graft.dedup.Dedup
        .passageDupes(corpus.toDF("doc_id", "text"), "doc_id", "text", w)
        .as[(Long, Long, String)].collect().toSet
      // naive: enumerate full-width disjoint chunks, first occurrence in
      // (doc, idx) order keeps, everything else is a dupe
      val chunks = for {
        (id, t) <- corpus
        ws = t.split("\\s+").filter(_.nonEmpty)
        i <- 0 to (if (ws.isEmpty) -1 else (ws.length - 1) / w)
        c = ws.slice(i * w, i * w + w)
        if c.length == w
      } yield (id, i.toLong, c.mkString(" "))
      val keeper = chunks.groupBy(_._3).map { case (p, occ) =>
        p -> occ.map(o => (o._1, o._2)).min }
      val want = chunks.filter { case (id, i, p) =>
        keeper(p) != ((id, i)) &&
        chunks.count(_._3 == p) > 1
      }.toSet
      got == want
    }

  private val hitsGraphGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(2, 9)
    edges <- Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
  } yield edges.map { case (a, b) => (s"v$a", s"v$b") }.distinct

  property("HITS equals the naive interpreter on random graphs") =
    forAll(hitsGraphGen) { edges =>
      val got = graft.graph.Hits.run(edges.toDF("src", "dst"), iters = 3)
        .as[(String, Double, Double)].collect()
        .map { case (t, h, a) => t -> (h, a) }.toMap
      got == HitsReference.interpret(edges, 3)
    }

  private val mergeGen: Gen[(List[(Long, String)], List[(Long, String)])] = for {
    cur <- Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.alphaStr.map(_.take(4))))
    chg <- Gen.listOf(Gen.zip(Gen.choose(0L, 25L), Gen.alphaStr.map(_.take(4))))
  } yield (cur.distinctBy(_._1), chg.distinctBy(_._1))

  property("mergeUpsert equals the naive map merge on random batches") =
    forAll(mergeGen) { case (cur, chg) =>
      val got = graft.ops.Relational
        .mergeUpsert(cur.toDF("k", "v"), chg.toDF("k", "v"), "k")
        .as[(Long, String, String)].collect().toSet
      val cm = cur.toMap; val gm = chg.toMap
      val want = (cm.keySet ++ gm.keySet).map { k =>
        (k, gm.getOrElse(k, cm(k)),
          if (gm.contains(k) && cm.contains(k)) "update"
          else if (!cm.contains(k)) "insert" else "keep")
      }
      got == want
    }

  // random closed intervals on a coarse grid so touching/overlap/swallow
  // cases all occur
  property("mergeIntervals equals a naive sweep on random intervals") =
    forAll(Gen.listOf(for {
      key <- Gen.choose(0L, 2L)
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(0L, 15L)
    } yield (key, s, s + len))) { raw =>
      val rows = raw.zipWithIndex.map { case ((k, s, e), i) => (k, i.toLong, s, e) }
      raw.isEmpty || {
        val got = graft.ops.TimeSeries
          .mergeIntervals(rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e")
          .select("k", "start", "end", "n_src")
          .as[(Long, Long, Long, Long)].collect().toSet
        // naive sweep per key over (s, id)-sorted closed intervals
        val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.sortBy(r => (r._3, r._2))
          val islands = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
          for ((_, _, s, e) <- sorted) {
            if (islands.nonEmpty && s <= islands.last._2)
              islands(islands.size - 1) = (islands.last._1,
                math.max(islands.last._2, e), islands.last._3 + 1)
            else islands += ((s, e, 1L))
          }
          islands.map { case (s, e, n) => (k, s, e, n) }
        }.toSet
        got == want
      }
    }

  property("dedupTemporal keeps exactly the naive burst leaders") =
    forAll(Gen.listOf(for {
      key <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 60L)
    } yield (key, t))) { raw =>
      val rows = raw.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
      val gap = 5L
      raw.isEmpty || {
        val got = graft.ops.TimeSeries
          .dedupTemporal(rows.toDF("k", "id", "t"), Seq("k"), "id", "t", gap)
          .select("k", "kept_id", "n_absorbed")
          .as[(Long, Long, Long)].collect().toSet
        val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.sortBy(r => (r._3, r._2))
          val bursts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
          var prevT = Long.MinValue
          for ((_, id, t) <- sorted) {
            if (bursts.isEmpty || t - prevT > gap) bursts += ((k, id, 1L))
            else bursts(bursts.size - 1) =
              (k, bursts.last._2, bursts.last._3 + 1)
            prevT = t
          }
          bursts
        }.toSet
        got == want
      }
    }
}
