package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.functions._

/** Mergeable Misra–Gries heavy-hitter sketch (Misra & Gries '82; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS'12): at most k counters;
  * decrement-all when a new item finds no slot. After any sequence of
  * reduces and merges, every item with true frequency > n/(k+1) is GUARANTEED
  * present — counts are underestimates, presence is not. That guarantee is
  * what makes the two-pass exact pattern work at 100 TB: pass 1 shuffles k
  * counters per map task (not the corpus), pass 2 exact-counts only the
  * ≤ k candidates.
  */
final case class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      case None => // decrement every counter, drop the zeroed
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** Pointwise sum, then subtract the (k+1)-th largest so ≤ k survive —
    * keeps the n/(k+1) error bound additive across merges.
    */
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {

  /** Exact heavy hitters: all `token` values with frequency > phi·total,
    * with exact counts — (token, n). Two passes: the MG sketch nominates
    * ≤ k candidates (k > 1/phi ⇒ provably no misses), then one semi-join
    * pass exact-counts candidates only. Output is deterministic and equals
    * the naive full groupBy + HAVING, but the wide shuffle carries k
    * counters per task instead of one row per distinct token.
    */
  def heavyHitters(df: DataFrame, tokenCol: Column, phi: Double, k: Int): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(k > 1.0 / phi,
      s"k=$k breaks the no-miss guarantee for phi=$phi (need k > ${1.0 / phi})")
    val toks = df.select(tokenCol.cast("string").as("token"))
    val sketch = udaf(MisraGriesAgg(k))
    // pass 1: sketch + total in one aggregation; the single result row is an
    // aggregate (k counters + a count), not data — safe to bring back
    val row = toks.agg(sketch(col("token")).as("mg"), count(lit(1)).as("n_total")).head()
    val candidates = row.getAs[Map[String, Long]]("mg").keys.toSeq.sorted
    val nTotal = row.getAs[Long]("n_total")
    // pass 2: exact counts for candidates only; the ≤ k-literal IN predicate
    // pushes down to the scan, so this pass reads, shuffles, and counts a
    // sliver of the corpus
    toks.filter(col("token").isin(candidates: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(phi * nTotal))
      .select(col("token"), col("n"))
  }
}
