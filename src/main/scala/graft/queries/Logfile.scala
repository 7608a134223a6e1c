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
      None),

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
      None),

    // Reference Sample pipeline: Bernoulli sample → formatted export lines.
    GraftQuery(
      "q48_logfile_sample_format",
      (s, _) => {
        graft.operators.Sampling.bernoulli(
          readFixture(s).filter(col("file").endsWith(".log")), // plain half only
          fraction = 0.01, seed = 7L)
          .select(format_string("%s@%016d:%n%n%s%n%n",
            col("file"), col("offset"), col("record")).as("sample_line"))
          .orderBy("sample_line")
      },
      None)
  )
}
