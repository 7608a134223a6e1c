package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval containment join — the scale path for the
  * join shape `point BETWEEN start AND end` with NO equi key.
  *
  * Spark plans a pure range predicate as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts): O(|points|·|intervals|)
  * comparisons, the first thing to die at 100 TB. This operator makes the
  * join an EQUI join on a coarse time bin:
  *
  *   - each interval is exploded to every bin it overlaps
  *     (`floor(s/W) .. floor(e/W)` — at most `ceil(len/W)+1` rows, so ≤2
  *     when `W >=` the longest interval);
  *   - each point maps to exactly ONE bin (`floor(p/W)`), so a qualifying
  *     (point, interval) pair meets in exactly one bin and the output needs
  *     no dedup;
  *   - the exact containment predicate runs AFTER the hash join, touching
  *     only same-bin candidates.
  *
  * Cost: one shuffle on the bin key for each side; candidate pairs are
  * bounded by per-bin density instead of the full cross product. Pick `W`
  * of the order of the longest interval: larger W means fewer interval
  * replicas but more candidates per bin.
  *
  * Domain contract: bin math uses integer `div`, which truncates toward
  * zero, so only NON-NEGATIVE coordinates bin correctly (epoch
  * days/seconds/micros all qualify). Out-of-domain rows — a negative point,
  * a negative interval start, or an inverted interval (end < start) — are
  * FILTERED OUT of the join rather than mis-binned: they produce no output
  * pairs. Callers with legitimately negative domains (e.g. pre-1970 epoch
  * days) must shift coordinates to be non-negative before calling.
  */
object IntervalJoin {

  private val BinCol = "__graft_iv_bin"

  /** Join `points` to every row of `intervals` whose `[sCol, eCol]` range
    * (inclusive both ends) contains `pCol`. All three columns must be
    * non-negative integral types on the same scale.
    *
    * @param binWidth bucket width in the same units as the coordinates;
    *                 must be >= 1 (use ~ the longest interval length)
    */
  def containment(
      points: DataFrame, pCol: String,
      intervals: DataFrame, sCol: String, eCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val clash = (points.columns ++ intervals.columns).contains(BinCol)
    require(!clash, s"column name $BinCol is reserved by IntervalJoin")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share column names ${overlap.mkString(",")} — rename before joining")

    val iv = intervals
      .where(col(sCol) >= 0 && col(eCol) >= col(sCol))
      .withColumn(BinCol,
        explode(sequence(
          expr(s"CAST(`$sCol` AS BIGINT) div $binWidth"),
          expr(s"CAST(`$eCol` AS BIGINT) div $binWidth"))))
    val pt = points
      .where(col(pCol) >= 0)
      .withColumn(BinCol, expr(s"CAST(`$pCol` AS BIGINT) div $binWidth"))
    pt.join(iv, BinCol)
      .where(col(pCol) >= col(sCol) && col(pCol) <= col(eCol))
      .drop(BinCol)
  }

  /** Interval-OVERLAP join: pairs `(a, b)` whose inclusive ranges intersect
    * (`aS <= bE && bS <= aE`), optionally restricted to equal `equiKeys`
    * pairs. Same binning idea as [[containment]], plus the standard
    * first-shared-bin dedup: an overlapping pair co-occupies every bin the
    * intersection touches, so it is emitted ONLY in the bin of
    * `max(aS, bS)` — which equals `greatest(aS div W, bS div W)` because
    * integer `div` is monotone — making the output duplicate-free without a
    * `distinct`. With equi keys the hash join key is `(keys…, bin)`, so
    * per-key density bounds the candidates; the same non-negative-domain
    * contract as [[containment]] applies.
    */
  def overlap(
      a: DataFrame, aS: String, aE: String,
      b: DataFrame, bS: String, bE: String,
      equiKeys: Seq[(String, String)],
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val clash = (a.columns ++ b.columns).contains(BinCol)
    require(!clash, s"column name $BinCol is reserved by IntervalJoin")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"a and b share column names ${shared.mkString(",")} — rename before joining")

    def binned(df: DataFrame, s: String, e: String) = df
      .where(col(s) >= 0 && col(e) >= col(s))
      .withColumn(BinCol,
        explode(sequence(
          expr(s"CAST(`$s` AS BIGINT) div $binWidth"),
          expr(s"CAST(`$e` AS BIGINT) div $binWidth"))))
    val aB = binned(a, aS, aE)
    val bB = binned(b, bS, bE).withColumnRenamed(BinCol, BinCol + "_b")
    val cond = equiKeys
      .map { case (ka, kb) => col(ka) === col(kb) }
      .foldLeft(col(BinCol) === col(BinCol + "_b"))(_ && _)
    aB.join(bB, cond)
      .where(col(aS) <= col(bE) && col(bS) <= col(aE))
      .where(col(BinCol) === greatest(
        expr(s"CAST(`$aS` AS BIGINT) div $binWidth"),
        expr(s"CAST(`$bS` AS BIGINT) div $binWidth")))
      .drop(BinCol, BinCol + "_b")
  }
}
