package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: backward (nearest prior match), forward (nearest
  * following match), or nearest (closer of the two, ties to backward) —
  * the `merge_asof` surface, with an optional tolerance predicate.
  *
  * Backward attaches, per left row, the right row with the greatest
  * `(rightTime, tiebreak)` such that `rightTime <= leftTime`; forward the
  * smallest `(rightTime, tiebreak)` with `rightTime >= leftTime`; rows with
  * no match keep NULL payload (left-outer semantics).
  *
  * Scale design: instead of a range join (quadratic worst case), both sides
  * are tagged and unioned, then a single hash shuffle on the key plus an
  * in-partition sort by `(time, side, tiebreak)` lets `last(payload,
  * ignoreNulls)` carry the nearest right payload across to left rows — one
  * shuffle, one sort per direction, linear in input ("nearest" runs both
  * window orders over the same exchange). The payload travels as a single
  * struct so a NULL field inside a matched right row can never "tear" and
  * pick up a value from an older row.
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
    * @param direction "backward" (default), "forward", or "nearest"
    *   ("nearest" requires a time type whose `-` yields a comparable value —
    *   longs, doubles, timestamps; equidistant ties go backward)
    * @param within    optional tolerance predicate (leftTime, matchedRightTime)
    *   => keep; a match failing it is nulled out (e.g. `(lt, mt) => lt - mt
    *   <= lit(86400L)` for "within a day" on epoch-second longs)
    */
  def apply(
      left: DataFrame,
      leftKey: Column,
      leftTime: Column,
      right: DataFrame,
      rightKey: Column,
      rightTime: Column,
      tiebreak: Column,
      payload: Seq[String],
      direction: String = "backward",
      within: Option[(Column, Column) => Column] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    // Internal column names must not shadow caller columns: pick the first
    // "__k", "__k_1", "__k_2", … suffix generation where none of the
    // working names exists in the left schema or the payload (right's other
    // columns never leak — they are projected into the working names up
    // front; "__mt" also names the match-time field inside the payload
    // struct, so it must not collide with a payload column either).
    val bases = Seq("__k", "__t", "__side", "__tb", "__payload", "__mb", "__mf", "__mt")
    val taken = leftCols.toSet ++ payload
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => bases.forall(b => !taken.contains(b + s)))
      .get
    val (kC, tC, sideC, tbC, payC, mbC, mfC, mtC) =
      ("__k" + sfx, "__t" + sfx, "__side" + sfx, "__tb" + sfx,
        "__payload" + sfx, "__mb" + sfx, "__mf" + sfx, "__mt" + sfx)
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
      // match time rides inside the struct so tolerance/nearest can see it
      struct((payload.map(col) :+ rightTime.as(mtC)): _*).as(payC))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward: ascending time; at equal time rights sort first (<= match),
    // ascending tiebreak so `last` carries the greatest
    val wB = Window.partitionBy(col(kC))
      .orderBy(col(tC).asc, col(sideC).asc, col(tbC).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: descending time; at equal time rights still first (>= match),
    // descending tiebreak so `last` carries the smallest
    val wF = Window.partitionBy(col(kC))
      .orderBy(col(tC).desc, col(sideC).asc, col(tbC).desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def tolerated(m: Column): Column = within match {
      case Some(p) => when(m.isNotNull && p(col(tC), m.getField(mtC)), m)
      case None => m
    }
    val withCands = direction match {
      case "backward" =>
        unioned.withColumn(mbC, tolerated(last(col(payC), ignoreNulls = true).over(wB)))
          .withColumn(mfC, col(mbC))
      case "forward" =>
        unioned.withColumn(mfC, tolerated(last(col(payC), ignoreNulls = true).over(wF)))
          .withColumn(mbC, col(mfC))
      case "nearest" =>
        unioned
          .withColumn(mbC, tolerated(last(col(payC), ignoreNulls = true).over(wB)))
          .withColumn(mfC, tolerated(last(col(payC), ignoreNulls = true).over(wF)))
    }
    // nearest: closer candidate wins, equidistant goes backward; the
    // subtractions are both non-negative so no abs() is needed (works for
    // any time type whose difference is comparable)
    val chosen =
      when(col(mbC).isNull, col(mfC))
        .when(col(mfC).isNull, col(mbC))
        .when(col(mfC).getField(mtC) - col(tC) < col(tC) - col(mbC).getField(mtC), col(mfC))
        .otherwise(col(mbC))
    val matched = withCands
      .withColumn(mbC, chosen)
      .filter(col(sideC) === 1)

    val out = leftCols.map(col) ++ payload.map(p => col(s"$mbC.$p").as(p))
    matched.select(out: _*)
  }
}
