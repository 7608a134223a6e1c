package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Scalar function surface: string, date/time, math, array higher-order
  * functions, JSON extraction (SURVEY.md §2.2 "scalar" rows; the reference's
  * regex parse P1 maps to `regexp_extract`, `cli/Test.java:119-121`).
  */
object Scalars extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q25_string_funcs",
      (s, dir) => {
        Tables(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            substring(col("p_name"), 1, 5).as("prefix"),
            concat_ws("-", col("p_brand"), col("p_type")).as("tag"),
            split(col("p_name"), " ").getItem(0).as("first_word"),
            length(col("p_name")).cast("long").as("name_len"),
            levenshtein(col("p_brand"), lit("Brand#1")).cast("long").as("lev"),
            regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("long").as("brand_num"),
            regexp_replace(col("p_type"), "ECONOMY", "ECO").as("ptype_short"),
            lpad(col("p_brand"), 10, "_").as("padded"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substring(p_name, 1, 5) AS prefix,
        |  concat_ws('-', p_brand, p_type) AS tag,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev,
        |  CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num,
        |  regexp_replace(p_type, 'ECONOMY', 'ECO') AS ptype_short,
        |  lpad(p_brand, 10, '_') AS padded
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin)),

    GraftQuery(
      "q26_date_funcs",
      (s, dir) => {
        Tables(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
              .cast("long").as("days_to_2002"),
            date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    GraftQuery(
      "q27_math_funcs",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .filter(col("l_orderkey") < 500)
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("ln"),
            round(col("l_extendedprice") * col("l_discount"), 4).as("disc_amt"),
            abs(col("l_quantity") - 25.0).as("qty_dev"),
            (col("l_discount") * col("l_discount")).as("disc_sq"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            round(log(col("l_extendedprice")), 6).as("ln_price"),
            ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"),
            pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod"))
          .orderBy("l_orderkey", "ln")
      },
      Some("""SELECT l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS ln,
        |  round(l_extendedprice * l_discount, 4) AS disc_amt,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  l_discount * l_discount AS disc_sq,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod
        |FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, ln""".stripMargin)),

    GraftQuery(
      "q28_array_vector_stats",
      (s, dir) => {
        Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            round(sqrt(expr(
              "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")), 6).as("l2_norm"),
            round(expr(
              "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)") / size(col("embedding")), 6).as("mean_val"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding],
        |                         (a, b) -> a + b)), 6) AS l2_norm,
        |  round(list_reduce([CAST(x AS DOUBLE) FOR x IN embedding], (a, b) -> a + b)
        |        / len(embedding), 6) AS mean_val
        |FROM embeddings ORDER BY vec_id""".stripMargin)),

    GraftQuery(
      "q29_json_extract_props",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(col("k")).as("n_with_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(COUNT(k) AS BIGINT) AS n_with_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // VARIANT ingestion — Spark 4's semi-structured type: props parsed ONCE
    // into a binary variant (shredded, no per-access re-parse — the
    // at-scale JSON answer), then typed `variant_get` paths. Same
    // aggregates as q29's string-path extraction, so the variant path is
    // provably result-identical to the classic one.
    GraftQuery(
      "q182_variant_json",
      (s, dir) => {
        Tables(s, dir, "events")
          .select(col("event_type"), expr("parse_json(props)").as("v"))
          .select(col("event_type"),
            expr("variant_get(v, '$.k', 'long')").as("k"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(col("k")).as("n_with_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(COUNT(k) AS BIGINT) AS n_with_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
