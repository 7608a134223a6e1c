package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable deterministic quantile sketch — the KLL compactor layout
  * (Karnin–Lang–Liberty, FOCS'16) with a DETERMINISTIC compaction rule so
  * reruns, merges, and tests agree bit-for-bit (the published sketch flips a
  * coin per compaction; we always keep the odd-indexed half, trading the
  * unbiasedness guarantee for reproducibility and keeping the rank-error
  * bound's shape).
  *
  * Layout: `levels(i)` holds values of weight 2^i, at most `k` per level.
  * Inserting into a full level sorts it and promotes the odd-indexed half to
  * level i+1 (weight doubles, count halves) — so memory is O(k · log(n/k))
  * and the shuffle carries a bounded buffer per (group, task) regardless of
  * group size: the property that lets a 100 TB corpus compute per-group
  * percentiles in one partial+final aggregation with no per-group sort.
  *
  * Exactness contract: while n ≤ k the sketch never compacts, so `finish`
  * is the EXACT lower quantile (what q130's oracle computes via
  * row_number). Past k it is approximate with rank error ≤ ε·n for
  * ε ≈ 2/k per compacted level (pinned empirically in QuantileSketchSpec).
  *
  * `n` (true count) is tracked exactly alongside the weighted items, so
  * rank targets stay integer-exact even after compaction: the target for
  * quantile p_num/p_den is ceil(p_num·n / p_den) computed in Long math —
  * no float rank arithmetic anywhere.
  */
final case class QSketch(n: Long, levels: Seq[Seq[Double]])

/** The sketch algebra, shared by the one-shot aggregator and the
  * build/merge pair that re-aggregates stored sketches (q139).
  */
object QSketchOps {

  def zero: QSketch = QSketch(0L, Seq(Vector.empty))

  /** Promote overfull levels upward: sort, keep the odd-indexed half at
    * double weight. Deterministic — no coin flip.
    */
  def compact(levels: Seq[Seq[Double]], k: Int): Seq[Seq[Double]] = {
    val out = levels.toBuffer
    var i = 0
    while (i < out.length) {
      if (out(i).length > k) {
        val sorted = out(i).sorted
        val kept = (1 until sorted.length by 2).map(sorted)
        if (i + 1 >= out.length) out.append(Vector.empty)
        out(i) = Vector.empty
        out(i + 1) = out(i + 1) ++ kept
      }
      i += 1
    }
    out.toSeq
  }

  def insert(b: QSketch, x: Double, k: Int): QSketch = {
    val l0 = b.levels.head :+ x
    val next = b.levels.updated(0, l0)
    QSketch(b.n + 1, if (l0.length > k) compact(next, k) else next)
  }

  def merge(b1: QSketch, b2: QSketch, k: Int): QSketch = {
    val depth = math.max(b1.levels.length, b2.levels.length)
    val joined = (0 until depth).map { i =>
      val a = if (i < b1.levels.length) b1.levels(i) else Vector.empty
      val b = if (i < b2.levels.length) b2.levels(i) else Vector.empty
      a ++ b
    }
    QSketch(b1.n + b2.n, compact(joined, k))
  }

  /** Lower weighted quantile per requested (num, den): the smallest value
    * whose cumulative weight reaches ceil(num·n/den) — integer rank math.
    */
  def quantilesOf(b: QSketch, quantiles: Seq[(Int, Int)]): Seq[Double] = {
    if (b.n == 0L) return quantiles.map(_ => Double.NaN)
    val weighted = b.levels.zipWithIndex.flatMap { case (vs, i) =>
      val w = 1L << i
      vs.map(v => (v, w))
    }.sortBy(_._1)
    val totalW = weighted.iterator.map(_._2).sum
    quantiles.map { case (num, den) =>
      // target rank over TRUE n, rescaled onto the sketch's weight mass so
      // post-compaction drift in total weight cannot push the rank past the
      // end: ceil(num*n/den), then ceil(rankN*totalW/n). rankN*totalW can
      // reach n² ≈ 10¹⁹ past ~3·10⁹ values — BigInt for that one product
      // (per-quantile at finalization, not per-row)
      val rankN = (num.toLong * b.n + den - 1) / den
      val rescaled = ((BigInt(rankN) * totalW + b.n - 1) / b.n).toLong
      val target = math.max(1L, math.min(totalW, rescaled))
      var cum = 0L
      var ans = weighted.last._1
      val it = weighted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= target) { ans = v; found = true }
      }
      ans
    }
  }

  def validate(k: Int, quantiles: Seq[(Int, Int)]): Unit = {
    require(k >= 8, s"k must be >= 8, got $k")
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (num, den) =>
      require(num >= 0 && den > 0 && num <= den, s"bad quantile $num/$den")
    }
  }
}

final case class QuantileSketchAgg(k: Int, quantiles: Seq[(Int, Int)])
    extends Aggregator[Double, QSketch, Seq[Double]] {
  QSketchOps.validate(k, quantiles)

  override def zero: QSketch = QSketchOps.zero
  override def reduce(b: QSketch, x: Double): QSketch = QSketchOps.insert(b, x, k)
  override def merge(b1: QSketch, b2: QSketch): QSketch = QSketchOps.merge(b1, b2, k)
  override def finish(b: QSketch): Seq[Double] = QSketchOps.quantilesOf(b, quantiles)

  override def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Stage 1 of the stored-sketch lifecycle: aggregate raw values into a
  * sketch VALUE (per day, per shard, …) that a table can persist.
  */
final case class QuantileSketchBuildAgg(k: Int)
    extends Aggregator[Double, QSketch, QSketch] {
  QSketchOps.validate(k, Seq((50, 100)))

  override def zero: QSketch = QSketchOps.zero
  override def reduce(b: QSketch, x: Double): QSketch = QSketchOps.insert(b, x, k)
  override def merge(b1: QSketch, b2: QSketch): QSketch = QSketchOps.merge(b1, b2, k)
  override def finish(b: QSketch): QSketch = b

  override def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  override def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
}

/** Stage 2: MERGE stored sketches into coarser rollups and answer
  * quantiles — the corpus is never rescanned (the q131 HLL pattern, for
  * percentiles).
  */
final case class QuantileSketchMergeAgg(k: Int, quantiles: Seq[(Int, Int)])
    extends Aggregator[QSketch, QSketch, Seq[Double]] {
  QSketchOps.validate(k, quantiles)

  override def zero: QSketch = QSketchOps.zero
  override def reduce(b: QSketch, s: QSketch): QSketch = QSketchOps.merge(b, s, k)
  override def merge(b1: QSketch, b2: QSketch): QSketch = QSketchOps.merge(b1, b2, k)
  override def finish(b: QSketch): Seq[Double] = QSketchOps.quantilesOf(b, quantiles)

  override def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
