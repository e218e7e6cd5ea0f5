package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{JaroWinkler, JaroWinklerAlgo}

/** The fuzzy-equality kernel behind `fuzzy_join`: known literature
  * values, the DuckDB-semantics edges (empty strings, the 0.7 boost
  * threshold), a lockstep against an independent naive implementation
  * on generated near-miss strings, and codegen ≡ interpreted. */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values (match DuckDB jaro_winkler_similarity)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-14)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-14)
    assert(jw("abcdef", "abcdef") === 1.0)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333333) < 1e-15)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window = 0: adjacent transposition can't match
  }

  test("DuckDB edge semantics: empty strings score 0; boost gated at jaro > 0.7") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    // jaro('aaaaaa','aaabbb') = 2/3 <= 0.7 → NO Winkler boost despite
    // the 3-char common prefix (DuckDB-verified)
    assert(math.abs(jw("aaaaaa", "aaabbb") - 2.0 / 3.0) < 1e-15)
    // just above the gate the boost applies
    val j = jw("prefixmatch", "prefixxxxx")
    assert(math.abs(j - 0.8290909090909091) < 1e-14)
  }

  /** Independent naive reimplementation (different data structures and
    * loop shape) for the lockstep. */
  private def naiveJw(s1: String, s2: String): Double = {
    val a = s1.getBytes("UTF-8"); val b = s2.getBytes("UTF-8")
    if (a.isEmpty || b.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val win = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val matchedB = Array.fill(b.length)(false)
    val pairsA = scala.collection.mutable.ArrayBuffer.empty[Byte]
    for (i <- a.indices) {
      val cands = math.max(0, i - win) until math.min(b.length, i + win + 1)
      cands.find(j => !matchedB(j) && a(i) == b(j)).foreach { j =>
        matchedB(j) = true; pairsA += a(i)
      }
    }
    val m = pairsA.length
    if (m == 0) return 0.0
    val inOrderB = matchedB.indices.filter(matchedB).map(b)
    val t = pairsA.zip(inOrderB).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m.toDouble - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val l = a.take(4).zip(b.take(4)).takeWhile { case (x, y) => x == y }.length
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  test("lockstep vs naive implementation on generated near-miss strings") {
    val words = Seq("small", "large", "hot", "cold", "red", "blue", "old", "new",
      "ring", "widget", "bolt", "gear", "gizmo", "rod", "ratchet", "bracket")
    val strings = (for {
      w1 <- words; w2 <- words.take(6)
    } yield s"$w1 $w2") ++ words ++
      words.map(_.reverse) ++ words.map(w => w + w.take(2))
    val pairs = for (i <- strings.indices; j <- i until math.min(i + 25, strings.length))
      yield (strings(i), strings(j))
    pairs.foreach { case (x, y) =>
      assert(jw(x, y) === naiveJw(x, y),
        s"mismatch on ('$x','$y'): ${jw(x, y)} vs ${naiveJw(x, y)}")
    }
  }

  test("null propagation; codegen and interpreted paths agree; SQL registration") {
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String])
    ).toDF("x", "y")
    val c = ColumnShim.column(JaroWinkler(
      ColumnShim.expression(col("x")), ColumnShim.expression(col("y"))))
    def vals(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    val wholeStage = vals(df.select(c.as("v")).collect())
    assert(wholeStage(0) === 0.9611111111111111)
    assert(wholeStage(1) == null && wholeStage(2) == null)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(vals(df.select(c.as("v")).collect()) === wholeStage)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    graft.functions.Functions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS v").collect()(0).getDouble(0)
    assert(viaSql === 0.9611111111111111)
  }
}
