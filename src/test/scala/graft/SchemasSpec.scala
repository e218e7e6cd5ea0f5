package graft

import org.apache.spark.sql.functions._

class SchemasSpec extends SparkTestBase {
  import spark.implicits._

  // Derived from one root so the suite is relocatable; tests that scan
  // multiple SFs assume() a dir into existence rather than erroring in
  // an environment that only ships one scale factor.
  private val sfRoot = sys.env.getOrElse("GRAFT_TEST_SF_ROOT", "/root/testdata")
  private val sf = s"$sfRoot/sf0.001"
  private def presentSfDirs(names: String*): Seq[String] = {
    val dirs = names.map(n => s"$sfRoot/$n")
      .filter(d => new java.io.File(d).isDirectory)
    assume(dirs.nonEmpty, s"no testdata dirs under $sfRoot")
    dirs
  }

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
    for (dir <- presentSfDirs("sf0.001", "sf0.01")) {
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

  test("testdata dtype pin: a driver-side regeneration fails HERE by name") {
    // Snapshot of every column the engine reads, as of round 5. The
    // round-4 events.ts regeneration (INT64 nanos → TIMESTAMP) broke 28
    // keys silently; this pin turns the NEXT such regeneration into one
    // named failure. If it fires: the driver regenerated testdata —
    // update the pin AND audit every consumer of the drifted column.
    // events.ts is excluded (it has its own multi-shape guard above).
    val expected: Map[String, Map[String, String]] = Map(
      "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double",
        "c_mktsegment" -> "string"),
      "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Map("p_partkey" -> "bigint", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
      "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp_ntz"),
      "events" -> Map("event_id" -> "bigint", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "double", "props" -> "string"),
      "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Map("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    for ((t, cols) <- expected) {
      val actual = spark.read.parquet(s"$sf/$t.parquet").schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
      for ((c, want) <- cols) {
        val got = actual.getOrElse(c, "MISSING")
        assert(got == want,
          s"testdata drift: $t.$c is $got, pinned $want — the driver " +
            "regenerated testdata; update this pin and audit consumers")
      }
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
