package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The streaming operator surface (SURVEY.md §2.2 streaming rows), written as
  * plan transformations that apply identically to a streaming or batch
  * DataFrame — Structured Streaming's unified-plan contract. The batch twins
  * in [[graft.queries.Events]] are the DuckDB-oracle face; these are wired to
  * `readStream` inputs and pinned by MemoryStream ScalaTests.
  *
  * State design for 100 TB streams: every aggregation here keys its state by
  * (window, group) or session key, watermarks bound state size and admit
  * late data up to the bound, and `dropDuplicatesWithinWatermark` keeps the
  * dedup map finite — no unbounded driver or executor state anywhere.
  */
object StreamingOps {

  private def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** events.ts arrives as BIGINT nanos (TESTDATA); expose an event-time col.
    * Integer `div`, not float `/`: epoch nanos exceed double's 2^53 exact
    * range, so float division can truncate a microsecond off boundary events
    * and shift them into the previous window vs the batch twin.
    */
  def withEventTime(df: DataFrame, nanosCol: String = "ts", out: String = "ts_t"): DataFrame =
    df.withColumn(out, timestamp_micros(expr(s"$nanosCol div 1000")))

  /** Tumbling windowed counts per event_type (streaming form of q30). */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windowed counts (streaming form of q31). */
  def slidingCounts(df: DataFrame, tsCol: String, width: String, slide: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n_events"))

  /** Gap-based session windows per user (streaming form of q32) — built on
    * the native `session_window` generator so state merges windows
    * incrementally instead of re-sorting history.
    */
  def sessionCounts(df: DataFrame, tsCol: String, gap: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Stateful streaming dedup bounded by the watermark (north-star dedup,
    * streaming form): duplicates arriving within the watermark horizon are
    * dropped; state for keys older than the horizon is evicted.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream inner join: both sides watermarked, the join range
    * bounded by an interval condition so each side's buffered state is
    * evictable — the only layout that keeps stream-stream join state finite.
    */
  def streamStreamJoin(left: DataFrame, leftTs: String, leftKey: String,
      right: DataFrame, rightTs: String, rightKey: String,
      watermark: String, joinWindow: String): DataFrame = {
    // alias the sides so identical key/ts column names (the common case for
    // two event streams sharing a schema) don't hit AMBIGUOUS_REFERENCE
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $joinWindow"))
  }

  /** Stream-static enrichment: join a stream against a slowly-changing dim
    * table. The static side is re-planned per micro-batch (Structured
    * Streaming re-resolves batch relations each trigger, so a dim refresh
    * lands without a restart) and broadcast — no shuffle of the stream, no
    * state: the 100 TB-stream shape for dimension lookups.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Exactly-once parquet sink via the canonical idempotent-`foreachBatch`
    * pattern: each micro-batch overwrites its OWN `batch_id=<id>` partition,
    * so a batch replayed after a crash/restart rewrites the same directory
    * instead of appending duplicates — idempotence without a transactional
    * table format. Readers take `spark.read.parquet(outDir)` and see each
    * input row exactly once.
    */
  def idempotentParquetSink(df: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }

  /** Custom arbitrary state via flatMapGroupsWithState: per-user running
    * totals emitted on every update — the escape hatch for state machines the
    * built-in windows can't express. State is one small case class per key
    * with a processing-time timeout, so executor state stays bounded by the
    * live-key set.
    */
  def runningUserTotals(ds: org.apache.spark.sql.Dataset[UserEvent],
      evictAfter: Option[String] = None): org.apache.spark.sql.Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import ds.sparkSession.implicits._
    // processing-time eviction keeps the live-key set bounded in production;
    // note it makes the engine trigger periodic empty batches to fire
    // timeouts, so tests driving processAllAvailable() use NoTimeout
    val timeoutConf = evictAfter
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update(), timeoutConf) {
        (user: Long, events: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
            var n = prev.n_events
            var total = prev.total_value
            events.foreach { e => n += 1; total += e.value }
            val next = UserTotal(user, n, total)
            state.update(next)
            evictAfter.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }
}

final case class UserEvent(user_id: Long, value: Double)
final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** The same running totals on Spark 4's `transformWithState` API — typed
  * `ValueState` handles instead of one opaque state object, RocksDB-backed
  * (`spark.sql.streaming.stateStore.providerClass` must be the RocksDB
  * provider). This is the forward-looking arbitrary-state surface;
  * [[StreamingOps.runningUserTotals]] keeps the legacy contract.
  */
object TwsRunningTotals {
  import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}
  import org.apache.spark.sql.{Dataset, Encoders}

  private class Processor extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var totals: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal]("totals",
        Encoders.product[UserTotal], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserTotal] = {
      val prev = if (totals.exists()) totals.get() else UserTotal(user, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotal(user, n, total)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def apply(ds: Dataset[UserEvent]): Dataset[UserTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
