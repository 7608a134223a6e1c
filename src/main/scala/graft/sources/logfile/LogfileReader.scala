package graft.sources.logfile

import org.apache.spark.sql.{Dataset, SparkSession}

/** One assembled multiline log record — the typed face of the source
  * (SURVEY.md §1.3): `file`/`offset` are the reference's KV key
  * (`LogfileInputFormat.java:25-26`), `record` the re-joined text.
  */
final case class LogRecord(file: String, offset: Long, record: String)

/** Convenience entry points over `spark.read.format("logfile")`. */
object LogfileReader {

  /** Typed batch read with a single default pattern. */
  def read(spark: SparkSession, path: String, pattern: String,
      perPathPatterns: Map[String, String] = Map.empty): Dataset[LogRecord] = {
    import spark.implicits._
    var r = spark.read.format("logfile").option("pattern", pattern)
    perPathPatterns.foreach { case (glob, re) => r = r.option(s"pattern.$glob", re) }
    r.load(path).as[LogRecord]
  }

  /** Typed streaming read (micro-batch; new files per trigger). */
  def readStream(spark: SparkSession, path: String, pattern: String): Dataset[LogRecord] = {
    import spark.implicits._
    spark.readStream.format("logfile").option("pattern", pattern)
      .load(path).as[LogRecord]
  }
}
