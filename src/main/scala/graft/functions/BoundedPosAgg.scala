package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count + bounded position collection in ONE aggregation buffer — the
  * single-pass primitive behind DML routing ([[graft.tables.GraftTable]]
  * `routeDmlMarked`): per touched file the router needs the matched-row
  * COUNT always, and the matched POSITIONS only when the file classifies
  * merge-on-read (few hits). Two separate jobs (count pass + position pass
  * over the dv subset) become one: positions accumulate until `cap` is
  * crossed, then the buffer is DROPPED and only the count keeps counting —
  * a dense rewrite-class file ships 8 bytes, never its position list, so
  * both executor buffers and the driver result stay O(min(hits, cap)) per
  * group at any scale.
  *
  * Overflow is sticky through partial/merge (once over cap on any side,
  * merged stays over), so the result is exactly
  * `if (count <= cap) Some(all positions) else None` regardless of how
  * rows split across tasks.
  */
final case class BoundedPosAgg(cap: Int)
    extends Aggregator[Long, (Long, Option[Vector[Long]]), (Long, Option[Seq[Long]])] {
  require(cap > 0, s"cap must be positive, got $cap")

  override def zero: (Long, Option[Vector[Long]]) = (0L, Some(Vector.empty))

  override def reduce(b: (Long, Option[Vector[Long]]), pos: Long)
      : (Long, Option[Vector[Long]]) = {
    val n = b._1 + 1
    (n, b._2.flatMap(v => if (n > cap) None else Some(v :+ pos)))
  }

  override def merge(b1: (Long, Option[Vector[Long]]), b2: (Long, Option[Vector[Long]]))
      : (Long, Option[Vector[Long]]) = {
    val n = b1._1 + b2._1
    val pos = for { v1 <- b1._2; v2 <- b2._2; if n <= cap } yield v1 ++ v2
    (n, pos)
  }

  override def finish(b: (Long, Option[Vector[Long]])): (Long, Option[Seq[Long]]) =
    (b._1, b._2.map(_.toSeq))

  override def bufferEncoder: Encoder[(Long, Option[Vector[Long]])] =
    ExpressionEncoder[(Long, Option[Vector[Long]])]()
  override def outputEncoder: Encoder[(Long, Option[Seq[Long]])] =
    ExpressionEncoder[(Long, Option[Seq[Long]])]()
}
