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
    val l = left
      .withColumn("__k", leftKey)
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val r = right.select(
      rightKey.as("__k"),
      rightTime.as("__t"),
      lit(0).as("__side"),
      tiebreak.cast("long").as("__tb"),
      struct(payload.map(col): _*).as("__payload"))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p))
    matched.select(out: _*)
  }
}
