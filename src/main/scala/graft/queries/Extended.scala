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
    // records via head-regex splitter → explode. Rows-only: inputs are
    // fixture logfiles; parity with the DSv2 source is pinned in ScalaTest.
    GraftQuery(
      "q50_udtf_record_split",
      (s, _) => {
        val dir = s"${sys.props("java.io.tmpdir")}/graft_logfile_fixture"
        LogfileFixture.ensure(dir, files = 4, recordsPerFile = 20000, seed = 42L)
        val whole = s.read.option("wholetext", "true").text(s"$dir/fixture_0.log")
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
      None),

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
        |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
