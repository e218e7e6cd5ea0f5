package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.index.InvertedIndex
import graft.ops.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an operator from SURVEY.md §2's inventory (or a
  * training-data-pipeline extension); `oracleSql` carries the DuckDB-dialect
  * equivalent the driver hash-checks at sf0.01.
  *
  * Determinism rules (SURVEY.md §5.2.3) applied to every oracle-checked key:
  *  - ends in a full ORDER BY over a unique key (or total grouping key);
  *  - float aggregates rounded on BOTH sides; monetary sums round(2)
  *    (inputs are on the 0.01 grid so true sums are on-grid — driver data
  *    verified), products round(4);
  *  - collect_list always sorted before concat;
  *  - regex restricted to the Java∩RE2 subset;
  *  - integer-typed outputs cast to BIGINT on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: scan → pushdown filter → broadcast-joined dims →
    * agg → sort (a miniature of the whole engine).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = lineitem(spark, d)
    val o  = orders(spark, d)
    val c  = customer(spark, d)
    val n  = nation(spark, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  // ---------------------------------------------------------------------
  // Query registry. One entry per implemented operator from SURVEY.md §2.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 S1 — scan + projection + pushdown-friendly predicate
    "scan_project" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(col("l_quantity") >= 30)
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.2 P1 — regex match filter (mapper-side title filter analog)
    "filter_rlike" -> ((s, d) =>
      TextOps.filterMatching(documents(s, d), col("text"), "spark (join|merge)")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    // §2.2 P2 — regex group extract (title/id extract analog)
    "regex_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          TextOps.extractGroup(col("props"), "\"k\": ([0-9]+)", 1)
            .cast("long").as("k_val"))
        .orderBy("event_id")),

    // §2.2 P5 — character-class scrub / regexp_replace
    "regex_replace" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), regexp_replace(col("text"), "[aeiou]", "").as("scrubbed"))
        .orderBy("doc_id")),

    // §2.2 P6 — lower + trim normalization
    "project_lower_trim" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"), lower(col("c_name")).as("lname"),
          trim(col("c_mktsegment")).as("seg"))
        .orderBy("c_custkey")),

    // §2.2 P7 — numeric parse / cast
    "cast_numeric" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("long").as("qty_int"),
          col("l_partkey").cast("string").as("part_str"))
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.2 P8 — scalar arithmetic (d·Σ+(1−d) analog shapes)
    "scalar_arith" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          // 2dp·2dp·2dp inputs → true value on the 1e-6 grid; round AT the
          // grid (6), never coarser — coarser hits exact halfway points
          // where Spark (HALF_UP) and DuckDB (binary) disagree.
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charge"),
          round(-col("l_extendedprice") / lit(100.0), 4).as("neg_centi"))
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.2 P10 — string concat / format
    "string_concat" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          concat(col("o_orderstatus"), lit("#"), col("o_orderpriority")).as("tag"))
        .orderBy("o_orderkey")),

    // §2.3 F1 — regex find-all + explode (the [[link]] fan-out analog)
    "explode_links" -> ((s, d) =>
      documents(s, d)
        .select(explode(TextOps.extractAll(col("text"), "spark [a-z]+")).as("link"))
        .groupBy("link").agg(count(lit(1)).as("cnt"))
        .orderBy("link")),

    // §2.3 F2 — tokenize + explode (word-occurrence fan-out)
    "tokenize_explode" -> ((s, d) =>
      TextOps.explodeTokens(documents(s, d).select(col("text")), col("text"), "word")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")),

    // §2.4 A1/A4 — count distinct (the N counter analog)
    "count_distinct" -> ((s, d) =>
      orders(s, d).agg(countDistinct(col("o_custkey")).as("n"))),

    // §2.4 A2 — group + sorted collect list + concat (posting-list shape)
    "group_collect_list" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",",
          transform(sort_array(collect_list(col("o_orderkey"))), _.cast("string")))
          .as("orderkeys"))
        .orderBy("o_custkey")),

    // §2.10 — the reference's InvertedIndex.java end-to-end
    "inverted_index" -> ((s, d) =>
      InvertedIndex.postingStrings(documents(s, d), "doc_id", "text")
        .orderBy("word")),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — same column names, same ordering, same rounding.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity >= 30
         ORDER BY l_orderkey, l_linenumber""",
    "filter_rlike" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE regexp_matches(text, 'spark (join|merge)')
         ORDER BY doc_id""",
    "regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val
         FROM events ORDER BY event_id""",
    "regex_replace" ->
      """SELECT doc_id, regexp_replace(text, '[aeiou]', '', 'g') AS scrubbed
         FROM documents ORDER BY doc_id""",
    "project_lower_trim" ->
      """SELECT c_custkey, lower(c_name) AS lname, trim(c_mktsegment) AS seg
         FROM customer ORDER BY c_custkey""",
    "cast_numeric" ->
      """SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity) AS BIGINT) AS qty_int,
             CAST(l_partkey AS VARCHAR) AS part_str
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "scalar_arith" ->
      """SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
             round(-l_extendedprice / 100.0, 4) AS neg_centi
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "string_concat" ->
      """SELECT o_orderkey, concat(o_orderstatus, '#', o_orderpriority) AS tag
         FROM orders ORDER BY o_orderkey""",
    "explode_links" ->
      """SELECT m AS link, count(*) AS cnt
         FROM (SELECT unnest(regexp_extract_all(text, 'spark [a-z]+')) AS m FROM documents)
         GROUP BY m ORDER BY link""",
    "tokenize_explode" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY word""",
    "count_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS n FROM orders",
    "group_collect_list" ->
      """SELECT o_custkey,
             string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "inverted_index" ->
      """SELECT word, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY word""",
  )
}
