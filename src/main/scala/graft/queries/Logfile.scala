package graft.queries

import graft.{GraftQuery, QueryPack}
import graft.sources.logfile.LogfileFixture
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own two pipelines, re-expressed on the `logfile` DSv2
  * source (SURVEY.md §3.2/§3.3): count-by-level over multiline records
  * (`cli/Test.java:119-133` collapsed to one groupBy) and Bernoulli
  * sample-and-format (`cli/Sample.java:99-102`). Inputs are the
  * deterministic fixture corpus (plain + gz twins, formats A and B) —
  * no SQL oracle (DuckDB can't read logfiles); exact truth-count parity
  * is pinned in ScalaTest, and these rows-only entries prove the source
  * end-to-end under the driver.
  */
object Logfile extends QueryPack {

  /** Shared fixture location + parameters (also used by q50 in Extended). */
  val FixtureDir = s"${sys.props("java.io.tmpdir")}/graft_logfile_fixture"
  val FixtureFiles = 4
  val FixtureRecordsPerFile = 20000
  val FixtureSeed = 42L

  def ensureFixture(): LogfileFixture.Truth =
    LogfileFixture.ensure(FixtureDir, FixtureFiles, FixtureRecordsPerFile, FixtureSeed)

  private def readFixture(s: SparkSession): DataFrame = {
    ensureFixture()
    s.read.format("logfile")
      .option("pattern", LogfileFixture.PatternA)
      .option("pattern.*_1.log*", LogfileFixture.PatternB)
      .option("pattern.*_3.log*", LogfileFixture.PatternB)
      .load(FixtureDir)
  }

  /** Cross-layout projection (reference P1, `test/LogfileType.java:21-23`):
    * unanchored ts/level regexes match both fixture formats A and B, reusing
    * the shared [[graft.sources.logfile.LogParsers.parse]] implementation.
    */
  private val MixedLayout = graft.sources.logfile.LogParsers.Layout(
    name = "fixture-mixed",
    headPattern = "", // resolution happens per-file at read time, not here
    tsRegex = """(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})""",
    tsFormat = "yyyy-MM-dd HH:mm:ss,SSS",
    levelRegex = """\b(INFO|WARN|ERROR)\b""",
    msgRegex = """ - (.*)$""")

  private def parsed(df: DataFrame): DataFrame =
    graft.sources.logfile.LogParsers.parse(df, MixedLayout)

  def queries: Seq[GraftQuery] = Seq(
    // Reference Test pipeline: one shuffle instead of 4 filtered counts.
    GraftQuery(
      "q47_logfile_count_by_level",
      (s, _) => {
        parsed(readFixture(s))
          .withColumn("kind",
            when(col("file").endsWith(".gz"), "gz").otherwise("plain"))
          .groupBy(col("kind"), col("level"))
          .agg(
            count(lit(1)).as("n_records"),
            sum(when(col("record").contains("\n"), 1L).otherwise(0L)).as("n_multiline"),
            min(unix_millis(col("ts"))).as("first_ts_ms"),
            max(unix_millis(col("ts"))).as("last_ts_ms"))
          .orderBy("kind", "level")
      },
      // Oracle-checked since r14: DuckDB replays the SOURCE itself — plain
      // files via read_text, per-path pattern dispatch as a filename CASE,
      // record assembly as the running-sum split (q50's machinery), head
      // parsing via the same regexes, strptime millis. The gz twins carry
      // BYTE-IDENTICAL content (the generator's contract, spec-pinned), so
      // the oracle emits each group under both kinds — an independent
      // engine now confirms the multiline-scan semantics end-to-end.
      Some(s"""WITH raw AS (
        |  SELECT filename, content
        |  FROM read_text('$FixtureDir/fixture_*.log')),
        |pat AS (SELECT filename, content,
        |  CASE WHEN filename LIKE '%_1.log' OR filename LIKE '%_3.log'
        |    THEN '${LogfileFixture.PatternB}'
        |    ELSE '${LogfileFixture.PatternA}' END AS pat FROM raw),
        |lines AS (
        |  SELECT filename, pat, lst[i] AS line, i AS ord, len(lst) AS n_all
        |  FROM (SELECT filename, pat, string_split(content, chr(10)) AS lst
        |        FROM pat),
        |       UNNEST(range(1, len(lst) + 1)) AS t(i)),
        |kept AS (
        |  SELECT filename, line, ord,
        |    CASE WHEN regexp_full_match(line, pat) THEN 1 ELSE 0 END AS is_head
        |  FROM lines WHERE NOT (line = '' AND ord = n_all)),
        |numbered AS (
        |  SELECT filename, line, is_head,
        |    SUM(is_head) OVER (PARTITION BY filename ORDER BY ord) AS rec
        |  FROM kept),
        |recs AS (
        |  SELECT filename, rec,
        |    MAX(CASE WHEN is_head = 1 THEN line END) AS head_line,
        |    COUNT(*) AS n_lines
        |  FROM numbered WHERE rec > 0 GROUP BY filename, rec),
        |parsedr AS (
        |  SELECT regexp_extract(head_line, '\\b(INFO|WARN|ERROR)\\b', 1) AS level,
        |    epoch_ms(strptime(regexp_extract(head_line,
        |      '(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3})', 1),
        |      '%Y-%m-%d %H:%M:%S,%g')) AS ts_ms,
        |    CASE WHEN n_lines > 1 THEN 1 ELSE 0 END AS ml
        |  FROM recs),
        |byl AS (
        |  SELECT level, CAST(COUNT(*) AS BIGINT) AS n_records,
        |    CAST(SUM(ml) AS BIGINT) AS n_multiline,
        |    CAST(MIN(ts_ms) AS BIGINT) AS first_ts_ms,
        |    CAST(MAX(ts_ms) AS BIGINT) AS last_ts_ms
        |  FROM parsedr GROUP BY level)
        |SELECT k.kind, b.level, b.n_records, b.n_multiline, b.first_ts_ms,
        |  b.last_ts_ms
        |FROM byl b CROSS JOIN (VALUES ('gz'), ('plain')) AS k(kind)
        |ORDER BY kind, level""".stripMargin)),

    // Layout-parser pipeline: prebuilt log4j layout → per-minute severity
    // counts over format-A fixture files (rows-only; parser values pinned
    // in LogParsersSpec).
    GraftQuery(
      "q70_logfile_parsed_timeline",
      (s, _) => {
        import graft.sources.logfile.LogParsers
        ensureFixture()
        val df = s.read.format("logfile")
          .option("pattern", LogParsers.Log4jDefault.headPattern)
          .load(s"$FixtureDir/fixture_0.log", s"$FixtureDir/fixture_2.log")
        LogParsers.parse(df, LogParsers.Log4jDefault)
          .groupBy(date_trunc("minute", col("ts")).as("minute"), col("level"))
          .agg(count(lit(1)).as("n"), sum(col("n_lines")).as("total_lines"))
          .select(unix_micros(col("minute")).as("minute_us"), col("level"),
            col("n"), col("total_lines"))
          .orderBy("minute_us", "level")
      },
      // Oracle-checked since r14: same source replay as q47 over the two
      // format-A files, Log4jDefault head pattern + ts/level regexes, per-
      // minute truncation in epoch micros.
      Some(s"""WITH raw AS (
        |  SELECT filename, content FROM read_text(
        |    ['$FixtureDir/fixture_0.log', '$FixtureDir/fixture_2.log'])),
        |lines AS (
        |  SELECT filename, lst[i] AS line, i AS ord, len(lst) AS n_all
        |  FROM (SELECT filename, string_split(content, chr(10)) AS lst
        |        FROM raw),
        |       UNNEST(range(1, len(lst) + 1)) AS t(i)),
        |kept AS (
        |  SELECT filename, line, ord,
        |    CASE WHEN regexp_full_match(line,
        |      '${graft.sources.logfile.LogParsers.Log4jDefault.headPattern}') THEN 1 ELSE 0 END AS is_head
        |  FROM lines WHERE NOT (line = '' AND ord = n_all)),
        |numbered AS (
        |  SELECT filename, line, is_head,
        |    SUM(is_head) OVER (PARTITION BY filename ORDER BY ord) AS rec
        |  FROM kept),
        |recs AS (
        |  SELECT filename, rec,
        |    MAX(CASE WHEN is_head = 1 THEN line END) AS head_line,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines
        |  FROM numbered WHERE rec > 0 GROUP BY filename, rec),
        |parsedr AS (
        |  SELECT strptime(regexp_extract(head_line,
        |      '^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3})', 1),
        |      '%Y-%m-%d %H:%M:%S,%g') AS ts,
        |    regexp_extract(head_line,
        |      '\\b(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\\b', 1) AS level,
        |    n_lines
        |  FROM recs)
        |SELECT CAST(epoch_us(date_trunc('minute', ts)) AS BIGINT) AS minute_us,
        |  level, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_lines) AS BIGINT) AS total_lines
        |FROM parsedr GROUP BY 1, 2 ORDER BY minute_us, level""".stripMargin)),

    // Reference Sample pipeline: Bernoulli sample → formatted export lines.
    // The draw is the CONTENT-ADDRESSED md5 bucket on (file, offset) — the
    // q23/q64 upgrade applied to the logfile surface: same inclusion
    // probability as the RNG sampler (which stays for reference parity,
    // exercised in SamplingSpec), but a record's fate is a pure function
    // of its identity, so the sample is stable across engines, runs, and
    // corpus regrowth — and the WHOLE pipeline (source record assembly,
    // byte offsets, draw, formatting) replays in the DuckDB oracle.
    GraftQuery(
      "q48_logfile_sample_format",
      (s, _) => {
        val plain = readFixture(s).filter(col("file").endsWith(".log"))
        graft.operators.Sampling.bernoulliByHash(plain, fraction = 0.01,
          key = concat_ws(":", col("file"), col("offset")))
          .select(format_string("%s@%016d:%n%n%s%n%n",
            col("file"), col("offset"), col("record")).as("sample_line"))
          .orderBy("sample_line")
      },
      Some(s"""WITH raw AS (
        |  SELECT filename, content
        |  FROM read_text('$FixtureDir/fixture_*.log')),
        |pat AS (SELECT filename, content,
        |  CASE WHEN filename LIKE '%_1.log' OR filename LIKE '%_3.log'
        |    THEN '${LogfileFixture.PatternB}'
        |    ELSE '${LogfileFixture.PatternA}' END AS pat FROM raw),
        |lines AS (
        |  SELECT filename, pat, lst[i] AS line, i AS ord, len(lst) AS n_all
        |  FROM (SELECT filename, pat, string_split(content, chr(10)) AS lst
        |        FROM pat),
        |       UNNEST(range(1, len(lst) + 1)) AS t(i)),
        |offs AS (
        |  SELECT filename, pat, line, ord, n_all,
        |    COALESCE(SUM(len(line) + 1) OVER (PARTITION BY filename
        |      ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS off
        |  FROM lines),
        |kept AS (
        |  SELECT filename, line, ord, off,
        |    CASE WHEN regexp_full_match(line, pat) THEN 1 ELSE 0 END AS is_head
        |  FROM offs WHERE NOT (line = '' AND ord = n_all)),
        |numbered AS (
        |  SELECT filename, line, ord, off, is_head,
        |    SUM(is_head) OVER (PARTITION BY filename ORDER BY ord) AS rec
        |  FROM kept),
        |recs AS (
        |  SELECT 'file:' || filename AS file,
        |    MIN(CASE WHEN is_head = 1 THEN off END) AS "offset",
        |    string_agg(line, chr(10) ORDER BY ord) AS record
        |  FROM numbered WHERE rec > 0 GROUP BY filename, rec),
        |sampled AS (
        |  SELECT * FROM recs
        |  WHERE CAST('0x' || substr(md5(file || ':' || "offset"), 1, 3)
        |    AS INTEGER) < 41)
        |SELECT file || '@' || lpad(CAST("offset" AS VARCHAR), 16, '0') || ':'
        |  || chr(10) || chr(10) || record || chr(10) || chr(10)
        |  AS sample_line
        |FROM sampled ORDER BY sample_line""".stripMargin))
  )
}
