package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnShim

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get the same surface as the Column API:
  *
  * {{{
  *   graft.functions.Functions.register(spark)
  *   spark.sql("SELECT minhash_md5(shingles, 0) FROM docs")
  * }}}
  *
  * For registration without code (spark-submit / thrift server), set
  * `spark.sql.extensions=graft.GraftExtensions` instead — both paths
  * share the builders below.
  */
object Functions {

  private[graft] def minhashMd5Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_md5(array<string>, perm_int)")
    val perm = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => other.eval().asInstanceOf[Number].intValue()
    }
    MinHashMd5(exprs.head, perm)
  }

  private[graft] def wikiPagesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "wiki_pages(xml_string)")
    WikiPageParse(exprs.head)
  }

  private[graft] def simhash60Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash60(array<string> tokens)")
    SimHashPortable(exprs.head, 60)
  }

  /** The typed-Aggregator UDAF as an Expression builder (the same
    * ScalaAggregator construction `spark.udf.register` performs). */
  private[graft] def topk3Builder(exprs: Seq[Expression]): Expression =
    ColumnShim.udafExpression(TopKAgg.topK(3), exprs)

  private[graft] def jaroWinklerBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "jaro_winkler(string, string)")
    JaroWinkler(exprs(0), exprs(1))
  }

  /** Z-order key as SQL: `zorder2(x, y[, bits])` — the same bitwise
    * fold as [[graft.sources.Warehouse.zorder2]], built directly from
    * catalyst nodes (a Column→Expression shim here would leave
    * unresolved ColumnNode placeholders in the SQL analyzer's tree —
    * Unevaluable at codegen). Both forms are spec-pinned to the same
    * reference interleave. */
  private[graft] def zorder2Builder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    require(exprs.length == 2 || exprs.length == 3,
      "zorder2(x_int, y_int[, bits])")
    val bits = if (exprs.length == 3) exprs(2).eval().asInstanceOf[Number].intValue() else 16
    val xl = Cast(exprs(0), LongType)
    val yl = Cast(exprs(1), LongType)
    (0 until bits).foldLeft(Literal(0L): Expression) { (acc, i) =>
      BitwiseOr(
        BitwiseOr(acc,
          ShiftLeft(BitwiseAnd(xl, Literal(1L << i)), Literal(i))),
        ShiftLeft(BitwiseAnd(yl, Literal(1L << i)), Literal(i + 1)))
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_md5", minhashMd5Builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wiki_pages", wikiPagesBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", simhash60Builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", zorder2Builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", jaroWinklerBuilder, "scala_udf")
    // UDAF surface: SELECT topk3(value, tag) ... GROUP BY g
    spark.udf.register("topk3", TopKAgg.topK(3))
  }
}
