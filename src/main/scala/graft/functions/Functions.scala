package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get the same surface as the Column API:
  *
  * {{{
  *   graft.functions.Functions.register(spark)
  *   spark.sql("SELECT minhash_md5(shingles, 0) FROM docs")
  * }}}
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_md5",
      exprs => {
        require(exprs.length == 2, "minhash_md5(array<string>, perm_int)")
        val perm = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        MinHashMd5(exprs.head, perm)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wiki_pages",
      exprs => {
        require(exprs.length == 1, "wiki_pages(xml_string)")
        WikiPageParse(exprs.head)
      },
      "scala_udf")
    // UDAF surface: SELECT topk3(value, tag) ... GROUP BY g
    spark.udf.register("topk3", TopKAgg.topK(3))
  }
}
