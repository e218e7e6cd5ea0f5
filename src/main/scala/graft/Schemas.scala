package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema enforcement + typed views — the engine's replacement for the
  * reference's validate-nothing behavior (SURVEY.md §3.4: malformed rows
  * NPE'd deep inside reducers; here reads fail fast with a typed error
  * naming the table and the mismatch).
  *
  * The case classes double as the public typed API: `Tables.lineitemDS`
  * gives compile-time field checking for engine users who prefer
  * `Dataset[T]` over DataFrame (SURVEY.md §1.4 mapping).
  */
object Schemas {

  final case class SchemaMismatch(table: String, problem: String)
    extends RuntimeException(s"table '$table': $problem")

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double, l_tax: Double, l_returnflag: String,
                      l_linestatus: String,
                      l_shipdate: java.time.LocalDateTime) // parquet ts w/o tz → TIMESTAMP_NTZ in Spark 4
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
                   o_orderpriority: String)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  /** Fail fast if `df` is missing columns of `expected` or has an
    * incompatible type for any shared column (extra columns allowed —
    * widening reads are fine; silently-wrong ones are not). */
  def enforce(df: DataFrame, expected: StructType, table: String): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    expected.fields.foreach { f =>
      have.get(f.name) match {
        case None =>
          throw SchemaMismatch(table,
            s"missing column '${f.name}' (${f.dataType.simpleString}); " +
              s"has: ${df.columns.mkString(", ")}")
        // simpleString comparison deliberately ignores nullability flags
        // (array element containsNull etc.) — only real type drift fails
        case Some(dt) if dt.simpleString != f.dataType.simpleString =>
          throw SchemaMismatch(table,
            s"column '${f.name}' is ${dt.simpleString}, expected ${f.dataType.simpleString}")
        case _ =>
      }
    }
    df
  }

  import org.apache.spark.sql.Encoders
  private def ds[T](s: SparkSession, dir: String, name: String)
                   (implicit e: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val df = Tables.table(s, dir, name)
    enforce(df, e.schema, name)
    df.selectExpr(e.schema.fieldNames.map(n => s"`$n`"): _*).as[T]
  }

  def lineitemDS(s: SparkSession, dir: String): Dataset[Lineitem] =
    ds[Lineitem](s, dir, "lineitem")(Encoders.product[Lineitem])
  def ordersDS(s: SparkSession, dir: String): Dataset[Order] =
    ds[Order](s, dir, "orders")(Encoders.product[Order])
  def customerDS(s: SparkSession, dir: String): Dataset[Customer] =
    ds[Customer](s, dir, "customer")(Encoders.product[Customer])
  def documentsDS(s: SparkSession, dir: String): Dataset[Document] =
    ds[Document](s, dir, "documents")(Encoders.product[Document])
  def embeddingsDS(s: SparkSession, dir: String): Dataset[Embedding] =
    ds[Embedding](s, dir, "embeddings")(Encoders.product[Embedding])
}
