package graft

import org.apache.spark.sql.functions._

class SchemasSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("typed datasets load and aggregate with compile-time fields") {
    val li = Schemas.lineitemDS(spark, sf)
    val qty = li.filter(_.l_quantity >= 30).map(_.l_quantity).reduce(_ + _)
    assert(qty > 0)
    val docs = Schemas.documentsDS(spark, sf)
    assert(docs.head().text.nonEmpty)
    val emb = Schemas.embeddingsDS(spark, sf)
    assert(emb.head().embedding.length == 64)
  }

  test("missing column fails fast with a typed error naming the table") {
    val broken = Tables.lineitem(spark, sf).drop("l_quantity")
    val e = intercept[Schemas.SchemaMismatch] {
      Schemas.enforce(broken,
        org.apache.spark.sql.Encoders.product[Schemas.Lineitem].schema, "lineitem")
    }
    assert(e.getMessage.contains("lineitem"))
    assert(e.getMessage.contains("l_quantity"))
  }

  test("type drift fails fast (quantity as string)") {
    val drifted = Tables.lineitem(spark, sf)
      .withColumn("l_quantity", col("l_quantity").cast("string"))
    val e = intercept[Schemas.SchemaMismatch] {
      Schemas.enforce(drifted,
        org.apache.spark.sql.Encoders.product[Schemas.Lineitem].schema, "lineitem")
    }
    assert(e.getMessage.contains("l_quantity") && e.getMessage.contains("string"))
  }
}
