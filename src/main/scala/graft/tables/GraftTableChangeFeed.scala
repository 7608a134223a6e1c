package graft.tables

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING change-data feed of a [[GraftTable]] — the row-level
  * `changes()` feed as a continuous query:
  *
  * {{{
  *   spark.readStream.format("graft-table-cdf").option("path", loc).load()
  *   // columns: <table schema> ++ (_change: insert|delete, _version)
  * }}}
  *
  * Offsets are table VERSIONS; each micro-batch is EXACTLY
  * `changes(startVersion, endVersion)` — the net per-commit row diffs with
  * rewrite survivors cancelled — so a downstream incremental aggregate
  * ([[IncrementalAgg.applyChanges]] in `foreachBatch`) maintained from the
  * stream equals a recompute over the end snapshot, the spec-pinned fold
  * invariant, now continuously. Unlike the append-only table stream
  * (`graft-table`), change commits (merge / delete / overwrite / restore)
  * are first-class here: their net inserts AND deletes flow through.
  *
  * Built on the V1 `Source` face (the FileStreamSource pattern) because a
  * change-feed batch is a PLAN (per-commit exceptAll over the touched
  * files), not a fixed file list — `getBatch` returns the `changes()`
  * DataFrame and Spark executes it as the micro-batch. Batches are commit-
  * granular; admission control does not apply (a single commit's diff is
  * the atomic unit, bounded by commit size — never the table).
  *
  * Options: `startingVersion` (default 0 — the create commit's rows arrive
  * as the first batch's inserts; `N` starts AFTER commit N, serving
  * `changes(N, …)`). Schema is anchored at stream start; a mid-stream
  * schema change makes the batch plan's schema diverge and fails the query
  * loud (restart re-anchors), the same non-additive-change contract as the
  * append stream. Like batch `changes()`, the feed needs the referenced
  * files — vacuumed ranges fail loud with the reclaimed names.
  *
  * Scale: planning is O(commits in range) driver metadata; execution reads
  * only the files those commits touched. Compaction/optimize commits DO
  * produce (cancelling) work here — `exceptAll` over the rewritten files —
  * the inherent cost of reconstructing CDC without persisted change files.
  */
final class GraftTableChangeFeedSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table-cdf"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table-cdf source needs .option(\"path\", ...)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-table-cdf derives its schema from the table")
    (shortName(), GraftTableChangeFeedStream.feedSchema(
      GraftTable.at(sqlContext.sparkSession, location(parameters)).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val startingVersion = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")).map(_.toLong).getOrElse(0L)
    require(startingVersion >= 0, s"startingVersion must be >= 0, got $startingVersion")
    new GraftTableChangeFeedStream(sqlContext.sparkSession,
      location(parameters), startingVersion)
  }
}

private[tables] object GraftTableChangeFeedStream {
  /** The feed's output shape: the table schema plus the change tags —
    * identical to batch `changes()` output.
    */
  def feedSchema(table: StructType): StructType =
    StructType(table.fields.toIndexedSeq :+
      StructField("_change", StringType) :+ StructField("_version", LongType))
}

private[tables] final class GraftTableChangeFeedStream(
    spark: SparkSession, location: String, startingVersion: Long)
  extends Source {

  // one handle for the stream's lifetime: commit parses memoize, so each
  // trigger replays only the commits landed since the last one
  private val table: GraftTable = GraftTable.at(spark, location)

  // schema anchored at stream start; `changes()` emits under the CURRENT
  // schema, so a mid-stream evolution diverges and the engine fails the
  // batch loud (restart re-anchors) — never a silent misalignment
  private val anchored: StructType =
    GraftTableChangeFeedStream.feedSchema(table.schema)

  override def schema: StructType = anchored

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from a checkpoint
  }

  override def getOffset: Option[V1Offset] = {
    val v = table.version
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val feed = table.changes(from, versionOf(end))
    require(feed.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      anchored.fields.map(f => (f.name, f.dataType)).toSeq,
      s"the table's schema changed mid-stream (feed ${feed.schema.simpleString}, " +
        s"anchored ${anchored.simpleString}); restart the stream to re-anchor")
    // the engine requires an isStreaming=true frame; the plan stays lazy
    // and distributed — no driver materialization
    org.apache.spark.sql.graftbridge.GraftPlanBridge.asStreaming(feed)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableChangeFeed[$location]"
}
