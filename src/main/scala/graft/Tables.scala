package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata layout (TESTDATA.md):
  * `<sfDir>/<table>.parquet` for tables
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`.
  *
  * All readers go through `spark.read.parquet` so Catalyst gets native
  * parquet pushdown (PushedFilters / ReadSchema pruning) — the scan IS the
  * engine's predicate-pushdown surface at 100 TB. Never collect here.
  */
object Tables {
  /** Columns every reader of these tables relies on — validated on read
    * (fail fast with a typed error instead of the reference's deep-NPE
    * behavior, SURVEY.md §3.4). Checked lazily per (dir, name). */
  private val required: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
      "o_orderstatus", "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "region" -> Seq("r_regionkey", "r_name"),
    "documents" -> Seq("doc_id", "text"),
    "embeddings" -> Seq("vec_id", "embedding"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    required.get(name).foreach { cols =>
      val missing = cols.filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw Schemas.SchemaMismatch(name,
          s"missing required column(s) ${missing.mkString(", ")}; " +
            s"has: ${df.columns.mkString(", ")}")
    }
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Events with `ts` NORMALIZED to epoch-nanos LongType — the unit every
    * downstream consumer assumes (`ts div 1000` → micros). The driver's
    * testdata has shipped `ts` both as INT64 nanos (read as BIGINT via the
    * legacy nanosAsLong flag) and, since round 4's regeneration, as
    * TIMESTAMP(MICROS); accept both here so a testdata regeneration can
    * never again silently break every event-time key. TIMESTAMP_NTZ is
    * interpreted in the session timezone (all entry points pin UTC), which
    * matches the DuckDB oracles' `epoch_us(CAST(ts AS TIMESTAMP))`. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df // epoch-nanos already
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw Schemas.SchemaMismatch("events",
          s"ts must be TIMESTAMP[_NTZ] or epoch-nanos BIGINT, found $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
