package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.functions.{LogLevelSummary, RecordSplitter}
import graft.sources.logfile.LogfileFixture
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2.2 rows: the typed-Aggregator UDAF (reference
  * `LogfileSummary` shape), the UDTF-shaped record splitter, set-operation
  * ALL variants, and schema'd `from_json` extraction.
  */
object Extended extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(
    // Typed Aggregator (partial+final contract, reference
    // test/LogfileSummary.java:18-37): one map-typed summary row, exploded
    // to (key, n) rows so the DuckDB oracle can check it.
    GraftQuery(
      "q49_udaf_typed_summary",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .select(col("event_type")).as[String]
          .select(LogLevelSummary.toColumn) // typed select → partial+final agg
          .toDF("counts")
          .select(explode(col("counts")).as(Seq("event_type", "n")))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // UDTF shape (reference S3 as an in-memory function): whole-file text →
    // records via head-regex splitter → explode. Oracle-checked: the
    // splitter is deterministic string manipulation, so DuckDB replays it —
    // read_text → line split with ordinals → head-regex marks → running-sum
    // record ids → per-record fold; the one artifact rule (a trailing
    // newline's final empty element is dropped, exactly RecordSplitter's
    // dropRight) rides as a filter on the LAST ordinal. Pattern and path
    // come from the same constants as the Spark side (never duplicated);
    // the Spark run materializes the fixture before the oracle reads it.
    GraftQuery(
      "q50_udtf_record_split",
      (s, _) => {
        Logfile.ensureFixture() // same dir/params as the q47/q48 fixture
        val whole = s.read.option("wholetext", "true")
          .text(s"${Logfile.FixtureDir}/fixture_0.log")
        whole
          .select(explode(RecordSplitter.splitRecords(col("value"), LogfileFixture.PatternA))
            .as("record"))
          .select(regexp_extract(substring_index(col("record"), "\n", 1),
            "\\b(INFO|WARN|ERROR)\\b", 1).as("level"),
            when(col("record").contains("\n"), 1L).otherwise(0L).as("is_multiline"))
          .groupBy("level")
          .agg(count(lit(1)).as("n"), sum(col("is_multiline")).as("n_multiline"))
          .orderBy("level")
      },
      Some(s"""WITH raw AS (
        |  SELECT content FROM read_text('${Logfile.FixtureDir}/fixture_0.log')),
        |lines AS (
        |  SELECT lst[i] AS line, i AS ord, len(lst) AS n_all
        |  FROM (SELECT string_split(content, chr(10)) AS lst FROM raw),
        |       UNNEST(range(1, len(lst) + 1)) AS t(i)),
        |kept AS (
        |  SELECT line, ord,
        |    CASE WHEN regexp_full_match(line, '${LogfileFixture.PatternA}')
        |      THEN 1 ELSE 0 END AS is_head
        |  FROM lines WHERE NOT (line = '' AND ord = n_all)),
        |numbered AS (
        |  SELECT line, is_head, SUM(is_head) OVER (ORDER BY ord) AS rec
        |  FROM kept),
        |recs AS (
        |  SELECT rec, MAX(CASE WHEN is_head = 1 THEN line END) AS head_line,
        |    COUNT(*) AS n_lines
        |  FROM numbered WHERE rec > 0 GROUP BY rec)
        |SELECT regexp_extract(head_line, '\\b(INFO|WARN|ERROR)\\b', 1) AS level,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN n_lines > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_multiline
        |FROM recs GROUP BY level ORDER BY level""".stripMargin)),

    // Set operations, ALL variants (bag semantics).
    GraftQuery(
      "q51_setops_all_variants",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        val variants = Seq(
          ("union_all", a.union(b)),
          ("intersect_all", a.intersectAll(b)),
          ("except_all", a.exceptAll(b)))
        variants.map { case (name, df) =>
          df.agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_distinct"))
            .select(lit(name).as("variant"), col("n"), col("n_distinct"))
        }.reduce(_.union(_)).orderBy("variant")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995),
        |b AS (SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996),
        |u AS (SELECT 'union_all' AS variant, o_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
        |i AS (SELECT 'intersect_all' AS variant, o_custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
        |e AS (SELECT 'except_all' AS variant, o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)),
        |all_v AS (SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e)
        |SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM all_v GROUP BY variant ORDER BY variant""".stripMargin)),

    // Schema'd from_json (vs q29's path extraction): parse once into a
    // typed struct, then predicate + aggregate on the struct field.
    GraftQuery(
      "q52_from_json_schema",
      (s, dir) => {
        Tables(s, dir, "events")
          .withColumn("p", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
          .filter(col("p.k") >= 50)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_ge50"), sum(col("p.k")).as("sum_k"),
            min(col("p.k")).as("min_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_ge50,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |WHERE k >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Pivot (wide aggregation): order counts per status × priority.
    GraftQuery(
      "q54_pivot_status_priority",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus"),
            coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec"),
            coalesce(col("5-LOW"), lit(0L)).as("low"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS high,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS notspec,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Correlated scalar subquery (TPC-H Q17 shape): lineitems under 40% of
    // their part's average quantity — exercises Catalyst decorrelation.
    GraftQuery(
      "q55_correlated_subquery_small_qty",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_partkey,
          |  CAST(COUNT(*) AS BIGINT) AS n_small,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
          |FROM lineitem l1
          |WHERE l_quantity < (SELECT 0.4 * AVG(l_quantity) FROM lineitem l2
          |                    WHERE l2.l_partkey = l1.l_partkey)
          |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin)
      },
      Some("""SELECT l_partkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.4 * AVG(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin)),

    // Ordered string aggregation (deterministic collect): nations per region.
    GraftQuery(
      "q56_string_agg_nations",
      (s, dir) => {
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Exact percentiles (continuous interpolation) per group; the
    // approx_percentile scale path is rows-only next to it.
    GraftQuery(
      "q57_percentiles_price",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Approximate percentile (t-digest-style sketch) — the 100 TB path for
    // q57. The sketch values are engine-specific; the oracle pins the
    // EXACT percentiles (q57's replay) plus the sketch's rank-error
    // contract: accuracy 1000 bounds the rank error by n/1000, so each
    // approx value must land within 1% of the group's value RANGE of its
    // exact counterpart — generous against the guarantee, meaningful
    // against a broken sketch.
    GraftQuery(
      "q58_approx_percentile",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 1000)")
            .as("ap"),
            expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("ep"),
            (max(col("o_totalprice")) - min(col("o_totalprice"))).as("spread"))
          .select(col("o_orderpriority"),
            round(element_at(col("ep"), 1), 4).as("p50"),
            round(element_at(col("ep"), 2), 4).as("p90"),
            round(element_at(col("ep"), 3), 4).as("p99"),
            (abs(element_at(col("ap"), 1) - element_at(col("ep"), 1)) <= col("spread") / 100 &&
             abs(element_at(col("ap"), 2) - element_at(col("ep"), 2)) <= col("spread") / 100 &&
             abs(element_at(col("ap"), 3) - element_at(col("ep"), 3)) <= col("spread") / 100)
              .as("approx_within_tol"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |  TRUE AS approx_within_tol
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Value-range window frame (RANGE BETWEEN): per customer, count orders
    // whose price is within ±10000 of the current order's price.
    GraftQuery(
      "q60_window_range_frame",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, 10000L)
        Tables(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_similar_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |       RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
        |    AS n_similar_price
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Single-pass column profiler (ingest data-quality sweep): one
    // aggregation over the data, one summary row per column.
    GraftQuery(
      "q66_profile_orders",
      (s, dir) => {
        // spread: the small-SF parquet is one row group ⇒ one partition,
        // which would single-thread the Expand(×5)+distinct aggregation
        graft.operators.Profiler.profile(
          Tables.spread(Tables(s, dir, "orders"), "o_orderkey"),
          Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))
          .orderBy("column")
      },
      Some("""WITH p AS (
        |  SELECT
        |    COUNT(*) - COUNT(o_orderkey) AS nulls_ok, COUNT(DISTINCT o_orderkey) AS nd_ok,
        |      CAST(MIN(o_orderkey) AS VARCHAR) AS min_ok, CAST(MAX(o_orderkey) AS VARCHAR) AS max_ok,
        |    COUNT(*) - COUNT(o_custkey) AS nulls_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
        |      CAST(MIN(o_custkey) AS VARCHAR) AS min_ck, CAST(MAX(o_custkey) AS VARCHAR) AS max_ck,
        |    COUNT(*) - COUNT(o_totalprice) AS nulls_tp, COUNT(DISTINCT o_totalprice) AS nd_tp,
        |      CAST(MIN(o_totalprice) AS VARCHAR) AS min_tp, CAST(MAX(o_totalprice) AS VARCHAR) AS max_tp,
        |    COUNT(*) - COUNT(o_orderpriority) AS nulls_op, COUNT(DISTINCT o_orderpriority) AS nd_op,
        |      CAST(MIN(o_orderpriority) AS VARCHAR) AS min_op, CAST(MAX(o_orderpriority) AS VARCHAR) AS max_op
        |  FROM orders)
        |SELECT 'o_custkey' AS "column", CAST(nulls_ck AS BIGINT) AS n_nulls,
        |  CAST(nd_ck AS BIGINT) AS n_distinct, min_ck AS min_value, max_ck AS max_value FROM p
        |UNION ALL
        |SELECT 'o_orderkey', CAST(nulls_ok AS BIGINT), CAST(nd_ok AS BIGINT), min_ok, max_ok FROM p
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(nulls_op AS BIGINT), CAST(nd_op AS BIGINT), min_op, max_op FROM p
        |UNION ALL
        |SELECT 'o_totalprice', CAST(nulls_tp AS BIGINT), CAST(nd_tp AS BIGINT), min_tp, max_tp FROM p
        |ORDER BY "column"""".stripMargin)),

    // Outlier detection via z-score, with variance computed from decimal
    // moment sums (n, Σx, Σx²) so both engines accumulate identically —
    // stddev_samp's float accumulation order would not hash-match.
    GraftQuery(
      "q67_outliers_zscore",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // exact moments on the Long path: cent-scaled price, squared sum
        // split hi/lo around 10⁹ (overflow-free to ~10⁹ rows per group),
        // reassembled in DECIMAL(38,0) — bit-identical to HUGEINT sums
        val moments = li
          .select(col("l_returnflag"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("price_c")).as("sc"),
            sum(expr("(price_c * price_c) div 1000000000")).as("hi"),
            sum(expr("(price_c * price_c) % 1000000000")).as("lo"))
          .withColumn("s1", expr("CAST(sc AS DOUBLE) / 100.0"))
          .withColumn("s2",
            expr("CAST(CAST(hi AS DECIMAL(38,0)) * 1000000000 + lo AS DOUBLE) / 10000.0"))
          .withColumn("mean", col("s1") / col("n"))
          .withColumn("var", (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
        li.join(broadcast(moments), Seq("l_returnflag"))
          .withColumn("z", (col("l_extendedprice") - col("mean")) / sqrt(col("var")))
          .filter(abs(col("z")) > 1.5)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_outliers"),
            round(max(abs(col("z"))), 6).as("max_abs_z"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(price_c) AS DOUBLE) / 100.0 AS s1,
        |    CAST(SUM(CAST(price_c AS HUGEINT) * price_c) AS DOUBLE) / 10000.0 AS s2
        |  FROM (SELECT l_returnflag,
        |          CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |        FROM lineitem) GROUP BY 1),
        |z AS (
        |  SELECT l.l_returnflag,
        |    (l.l_extendedprice - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
        |  FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_outliers,
        |  round(MAX(abs(z)), 6) AS max_abs_z
        |FROM z WHERE abs(z) > 1.5
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Equi-width histogram by integer bucket arithmetic (deterministic).
    GraftQuery(
      "q68_histogram_price",
      (s, dir) => {
        Tables(s, dir, "orders")
          .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            round(min(col("o_totalprice")), 2).as("lo"),
            round(max(col("o_totalprice")), 2).as("hi"))
          .orderBy("bucket")
      },
      Some("""SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  round(MIN(o_totalprice), 2) AS lo,
        |  round(MAX(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Conditional aggregation (FILTER-clause shape) in one pass.
    GraftQuery(
      "q61_conditional_agg",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
            count(when(col("l_quantity") >= 25, 1)).as("n_bulk"),
            sum(when(col("l_tax") === 0, 1L).otherwise(0L)).as("n_taxfree"),
            count(lit(1)).as("n_total"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        |  CAST(COUNT(*) FILTER (l_discount > 0.05) AS BIGINT) AS n_discounted,
        |  CAST(COUNT(*) FILTER (l_quantity >= 25) AS BIGINT) AS n_bulk,
        |  CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
        |  CAST(COUNT(*) AS BIGINT) AS n_total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Deterministic train/val/test split: bucket = first two hex chars of
    // md5(doc_id) → 0..255, cut at 205/230 (~80/10/10). Content-addressed
    // assignment is reproducible across engines, runs, and cluster sizes —
    // the property a training-data pipeline needs so a document never
    // migrates between splits when the corpus regrows. Hex parsed via
    // instr('0123456789abcdef', ·) arithmetic, the portable subset both
    // engines evaluate identically.
    GraftQuery(
      "q73_split_assignment",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val h = md5(col("doc_id").cast("string"))
        Tables(s, dir, "documents")
          .withColumn("bucket",
            (hexpos(substring(h, 1, 1)) * 16 + hexpos(substring(h, 2, 1))).cast("long"))
          .withColumn("split",
            when(col("bucket") < 205, "train")
              .when(col("bucket") < 230, "val")
              .otherwise("test"))
          .groupBy(col("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy("split")
      },
      Some("""WITH b AS (
        |  SELECT doc_id, n_chars,
        |    (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN bucket < 205 THEN 'train'
        |         WHEN bucket < 230 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b)
        |SELECT split,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM s GROUP BY split ORDER BY split""".stripMargin)),

    // Temperature-based domain mixture (the alpha=0.5 sampling of
    // multilingual pretraining): per-source weight ∝ sqrt(corpus chars),
    // normalized to target fractions, then the per-source sampling rate
    // that realizes them. sqrt is IEEE-correctly-rounded in both engines
    // and weights are summed as decimals (order-independent), so the
    // derived doubles are bit-identical cross-engine. One scan, one tiny
    // (n_sources-row) aggregation — the weights table a 100 TB mixture job
    // broadcasts to its samplers.
    GraftQuery(
      "q78_domain_mixture",
      (s, dir) => {
        val bySource = Tables(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
          .withColumn("w", sqrt(col("n_chars")).cast("decimal(28,8)"))
        val totals = bySource.agg(
          sum(col("w")).as("tw"), sum(col("n_chars")).as("tc"))
        bySource.crossJoin(broadcast(totals))
          .withColumn("target_frac",
            col("w").cast("double") / col("tw").cast("double"))
          .select(col("source"), col("n_docs"), col("n_chars"),
            round(col("target_frac"), 6).as("target_frac"),
            round(col("target_frac") * col("tc").cast("double") / col("n_chars"), 6)
              .as("sample_rate"))
          .orderBy("source")
      },
      Some("""WITH s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_chars,
        |    CAST(sqrt(n_chars) AS DECIMAL(28,8)) AS w FROM s),
        |t AS (SELECT SUM(w) AS tw, SUM(n_chars) AS tc FROM w)
        |SELECT source, n_docs, n_chars,
        |  round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS target_frac,
        |  round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) * CAST(tc AS DOUBLE) / n_chars, 6)
        |    AS sample_rate
        |FROM w, t ORDER BY source""".stripMargin)),

    // Deterministic stratified subsample: the 3 docs with the smallest
    // md5(doc_id) per source — content-addressed, so the "random" pick is
    // reproducible across engines, runs, and corpus regrowth (a doc keeps
    // its slot unless a smaller-hash doc appears in its stratum). The
    // reproducible-eval-subset primitive; Spark 4's WindowGroupLimit pushes
    // the rank<=3 bound into the sort, so no stratum is fully sorted.
    GraftQuery(
      "q82_stratified_deterministic",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables(s, dir, "documents")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("source"), col("doc_id"), col("lang"), col("n_chars"),
            col("rnk").cast("long").as("rnk"))
          .orderBy("source", "rnk")
      },
      Some("""SELECT source, doc_id, lang, n_chars, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT source, doc_id, lang, n_chars,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |      FROM documents) t
        |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin)),

    // Sequence-length bucketing for batch packing: pad-to-multiple-of-32
    // buckets with document counts, real vs padded token totals, and the
    // padding-waste fraction per bucket — the accounting a packing pipeline
    // runs before choosing bucket boundaries. One scan, one aggregation.
    GraftQuery(
      "q83_length_buckets",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("bucket", (ceil(col("n_tokens") / 32.0) * 32).cast("long"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("bucket") - col("n_tokens")).as("pad_tokens"),
            round(sum(col("bucket") - col("n_tokens")) / sum(col("bucket")), 6)
              .as("waste_frac"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |b AS (
        |  SELECT n_tokens, CAST(ceil(n_tokens / 32.0) * 32 AS BIGINT) AS bucket FROM t)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(bucket - n_tokens) AS BIGINT) AS pad_tokens,
        |  round(SUM(bucket - n_tokens) / SUM(bucket), 6) AS waste_frac
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Embedding-table quality profile: vector count, dimension bounds,
    // zero-norm (undefined-cosine) count, and norm mass — the sanity gate
    // before any similarity pass. L2 norms fold element-ascending (both
    // engines agree bit-for-bit, as in q42) and sum through DECIMAL so
    // aggregation order can't smear the total.
    GraftQuery(
      "q84_embedding_quality",
      (s, dir) => {
        Tables(s, dir, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            sqrt(expr(
              "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"))
              .as("l2"))
          .agg(
            count(lit(1)).as("n_vectors"),
            min(col("dim")).as("min_dim"),
            max(col("dim")).as("max_dim"),
            sum(when(col("l2") === 0, 1L).otherwise(0L)).as("n_zero"),
            sum(col("l2").cast("decimal(28,8)")).cast("double").as("sum_l2"),
            round(sum(col("l2").cast("decimal(28,8)")).cast("double") / count(lit(1)), 6)
              .as("avg_l2"))
      },
      Some("""WITH n AS (
        |  SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |    sqrt(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding],
        |                     (a, b) -> a + b)) AS l2
        |  FROM embeddings)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(MIN(dim) AS BIGINT) AS min_dim, CAST(MAX(dim) AS BIGINT) AS max_dim,
        |  CAST(SUM(CASE WHEN l2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(SUM(CAST(l2 AS DECIMAL(28,8))) AS DOUBLE) AS sum_l2,
        |  round(CAST(SUM(CAST(l2 AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 6) AS avg_l2
        |FROM n""".stripMargin)),

    // Winsorized robust mean — outlier-resistant per-group statistics: clamp
    // o_totalprice into its group's exact [p05, p95] band (q57's
    // interpolation parity), then average the clamped CENTS as Longs so the
    // only cross-row float influence is the two percentile cut points
    // themselves (identical in both engines). Two passes over the group:
    // percentile agg + broadcast-back join of 5 cut-point rows.
    GraftQuery(
      "q155_winsorized_mean",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val cuts = o.groupBy(col("o_orderpriority").as("pr"))
          .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
            expr("percentile(o_totalprice, 0.95)").as("p95"))
        o.join(broadcast(cuts), col("o_orderpriority") === col("pr"))
          .select(col("o_orderpriority"),
            expr("CAST(round(greatest(least(o_totalprice, p95), p05) * 100) AS BIGINT)")
              .as("w_c"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), sum(col("w_c")).as("sw"))
          .select(col("o_orderpriority"), col("n_orders"),
            round(col("sw").cast("double") / 100.0 / col("n_orders").cast("double"), 6)
              .as("winsorized_mean"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH cuts AS (
        |  SELECT o_orderpriority AS pr,
        |    quantile_cont(o_totalprice, 0.05) AS p05,
        |    quantile_cont(o_totalprice, 0.95) AS p95
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT o_orderpriority,
        |    CAST(round(greatest(least(o_totalprice, p95), p05) * 100) AS BIGINT) AS w_c
        |  FROM orders JOIN cuts ON o_orderpriority = pr)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  round(CAST(SUM(w_c) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS winsorized_mean
        |FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Salted hot-key AGGREGATION — q85's skew tool applied to groupBy: the
    // partial phase groups by (key, salt) so one hot key's rows spread
    // over 8 reducers, the final phase re-aggregates 8 sub-rows per key.
    // Sum/count re-associate exactly (cent Longs), so the oracle is the
    // PLAIN aggregation — the semantics-preservation proof for the 100 TB
    // hot-key case.
    GraftQuery(
      "q180_salted_aggregation",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_returnflag"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
          .withColumn("salt", expr("pmod(hash(monotonically_increasing_id()), 8)"))
        li.groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("price_c")).as("pc"), count(lit(1)).as("n"))
          .groupBy(col("l_returnflag"))
          .agg((sum(col("pc")).cast("double") / 100.0).as("revenue"),
            sum(col("n")).as("n_items"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // Distinct-aggregation rewrite — COUNT(DISTINCT x) at scale as two
    // plain aggregations (dedup by (group, x), then count), avoiding the
    // Expand replication a multi-distinct plan needs. The oracle is the
    // direct COUNT(DISTINCT): the rewrite must be invisible in results.
    GraftQuery(
      "q181_distinct_rewrite",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val pairs = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        val viaRewrite = pairs.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_parts"))
        val rows = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
        viaRewrite.join(rows, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_parts"), col("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin))
  )
}
