package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF mirroring the reference's hand-rolled partial+final
  * aggregation (`test/LogfileSummary.java:18-37`): per-level counts
  * accumulated associatively — `addRecord` ≙ reduce, `merge` ≙ merge —
  * expressed through Spark's `Aggregator` contract so Catalyst runs it as
  * partial (map-side) + final aggregation automatically.
  *
  * Production code would use `groupBy(level).count()` (SURVEY.md §2.1 A3);
  * this exists for the one-row-summary shape and as the UDAF surface demo.
  */
object LogLevelSummary extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(acc: Map[String, Long], level: String): Map[String, Long] =
    acc.updated(level, acc.getOrElse(level, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(acc: Map[String, Long]): Map[String, Long] = acc

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
