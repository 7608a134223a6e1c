package graft.sources.logfile

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics for the logfile scan — the observability the reference
  * exposes through `LogfileRecordReader.getProgress`
  * (`LogfileRecordReader.java:331-337`), re-expressed as Spark SQL metrics:
  * they aggregate across tasks and surface in the SQL UI / `SparkPlan.metrics`
  * next to the built-in rows-output counter.
  *
  * Each metric is its own zero-arg class: Spark's status listener
  * re-instantiates the CustomMetric by reflection to aggregate task values
  * for the UI, so a parameterized shared class would break there.
  */
private[logfile] object LogfileMetrics {
  val BytesRead = "logfileBytesRead"
  val RecordsAssembled = "logfileRecordsAssembled"
  val RecordsSpanningSplits = "logfileRecordsSpanningSplits"

  def supported: Array[CustomMetric] = Array(
    new BytesReadMetric, new RecordsAssembledMetric, new RecordsSpanningSplitsMetric)

  final case class TaskMetric(name: String, value: Long) extends CustomTaskMetric
}

/** Logical (decompressed) bytes consumed, including realignment reads. */
final class BytesReadMetric extends CustomSumMetric {
  override def name(): String = LogfileMetrics.BytesRead
  override def description(): String = "logical (decompressed) bytes read"
}

/** Multiline records emitted. */
final class RecordsAssembledMetric extends CustomSumMetric {
  override def name(): String = LogfileMetrics.RecordsAssembled
  override def description(): String = "multiline records assembled"
}

/** Records whose assembly read past the split end (invariant 3) — a direct
  * gauge of how much cross-split stitching the corpus forces.
  */
final class RecordsSpanningSplitsMetric extends CustomSumMetric {
  override def name(): String = LogfileMetrics.RecordsSpanningSplits
  override def description(): String = "records spanning split boundaries"
}
