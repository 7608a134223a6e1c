package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (nearest prior match).
  *
  * For each left row, attach the right row with the greatest
  * `(rightTime, tiebreak)` such that `rightTime <= leftTime` and the join
  * keys are equal; left rows with no prior right row keep NULL payload
  * (left-outer semantics).
  *
  * Scale design: instead of a range join (quadratic worst case), both sides
  * are tagged and unioned, then a single hash shuffle on the key plus an
  * in-partition sort by `(time, side, tiebreak)` lets `last(payload,
  * ignoreNulls)` carry the most recent right payload forward — one shuffle,
  * one sort, linear in input. The payload travels as a single struct so a
  * NULL field inside a matched right row can never "tear" and pick up a
  * value from an older row.
  *
  * Skew caveat: window partitions are not splittable by AQE, so one
  * pathologically hot key serializes into a single task; if a key can hold
  * a large fraction of all rows, pre-split it by time range (run the as-of
  * per coarse time bucket with the previous bucket's last right row carried
  * in) before reaching for this operator.
  */
object AsOfJoin {

  /** @param left      the probe side; all of its columns are preserved
    * @param leftKey   equality key column in `left`
    * @param leftTime  event-time expression over `left` (any orderable type)
    * @param right     the reference side
    * @param rightKey  equality key column in `right`
    * @param rightTime event-time expression over `right` (same type as leftTime)
    * @param tiebreak  total-order tiebreaker among right rows with equal time
    * @param payload   right columns to attach (must not collide with left's)
    */
  def apply(
      left: DataFrame,
      leftKey: Column,
      leftTime: Column,
      right: DataFrame,
      rightKey: Column,
      rightTime: Column,
      tiebreak: Column,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Internal column names must not shadow caller columns: pick the first
    // "__k", "__k_1", "__k_2", … suffix generation where none of the six
    // working names exists in the left schema (right's columns never leak —
    // they are projected into the working names up front).
    val bases = Seq("__k", "__t", "__side", "__tb", "__payload", "__match")
    val taken = leftCols.toSet
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => bases.forall(b => !taken.contains(b + s)))
      .get
    val (kC, tC, sideC, tbC, payC, matchC) =
      ("__k" + sfx, "__t" + sfx, "__side" + sfx, "__tb" + sfx,
        "__payload" + sfx, "__match" + sfx)
    val l = left
      .withColumn(kC, leftKey)
      .withColumn(tC, leftTime)
      .withColumn(sideC, lit(1))
      .withColumn(tbC, lit(null).cast("long"))
    val r = right.select(
      rightKey.as(kC),
      rightTime.as(tC),
      lit(0).as(sideC),
      tiebreak.cast("long").as(tbC),
      struct(payload.map(col): _*).as(payC))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(kC))
      .orderBy(col(tC).asc, col(sideC).asc, col(tbC).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn(matchC, last(col(payC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)

    val out = leftCols.map(col) ++ payload.map(p => col(s"$matchC.$p").as(p))
    matched.select(out: _*)
  }
}
