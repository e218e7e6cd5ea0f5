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

  test("testdata events.ts drift guard: raw type is known, normalized type is nanos long") {
    // The driver regenerated events.parquet between rounds 3 and 4,
    // silently switching ts from INT64 nanos to TIMESTAMP micros and
    // breaking 28 event-time keys. This guard names the failure: if the
    // raw testdata ts type drifts to something Tables.events can't
    // normalize, THIS test fails with the new type in its message
    // instead of 28 keys dying deep in Catalyst.
    import org.apache.spark.sql.types._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val raw = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(
        raw == LongType || raw == TimestampType || raw == TimestampNTZType,
        s"events.ts in $dir drifted to unsupported type $raw — update Tables.events")
      val normalized = Tables.events(spark, dir)
      assert(normalized.schema("ts").dataType == LongType,
        "Tables.events must emit epoch-nanos LongType")
      // sanity: values land in the epoch-nanos magnitude (year > 2000)
      val minTs = normalized.agg(min(col("ts"))).head().getLong(0)
      assert(minTs > 946684800L * 1000000000L,
        s"normalized ts magnitude wrong ($minTs) — unit conversion bug")
    }
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
