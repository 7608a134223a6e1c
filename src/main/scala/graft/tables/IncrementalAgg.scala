package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped (count, sum) aggregate from a
  * [[GraftTable.changes]] feed — the concrete form of the change feed's
  * promise: a downstream aggregate updates from the NET per-commit diffs
  * (O(commit) rows) instead of re-reading the table (O(100 TB)).
  *
  * State shape: `(group, n, sum)` with Long-exact sums (cents-style).
  * Folding a feed slice: inserts contribute (+1, +v), deletes (−1, −v),
  * per group; groups whose count reaches zero leave the state. Because
  * `changes` emits NET diffs with rewrite survivors cancelled, the fold
  * over ANY version range equals recomputing over the end snapshot — the
  * invariant `fold(state@a, changes(a, b)) ≡ recompute(snapshot(b))` is
  * pinned in `IncrementalAggSpec` across a mixed DML history and sits
  * under the DuckDB gate end-to-end as q294.
  */
object IncrementalAgg {

  /** Aggregate a plain frame into the state shape (bootstrap). */
  def init(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum"))

  /** Fold one `changes(a, b)` slice into the state for version `a`. */
  def applyChanges(state: DataFrame, feed: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val delta = feed.select(col(groupCol).as("group"),
        when(col("_change") === "insert", 1L).otherwise(-1L).as("dn"),
        when(col("_change") === "insert", col(valueCol))
          .otherwise(-col(valueCol)).as("dv"))
      .groupBy("group").agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    state.as("s")
      .join(delta.as("d"), state("group") <=> delta("group"), "full")
      .select(
        coalesce(col("s.group"), col("d.group")).as("group"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.dn"), lit(0L))).as("n"),
        (coalesce(col("s.sum"), lit(0L)) + coalesce(col("d.dv"), lit(0L))).as("sum"))
      .where(col("n") > 0L)
  }

  /** Maintain the aggregate from version `from` to `to`: bootstrap from
    * `snapshot(from)` and fold each commit's net feed. One `changes` read
    * covers the whole range (it is already per-commit tagged).
    */
  def maintained(t: GraftTable, from: Long, to: Long,
      groupCol: String, valueCol: String): DataFrame = {
    val state = init(t.snapshot(Some(from)), groupCol, valueCol)
    if (to <= from) state
    else applyChanges(state, t.changes(from, to), groupCol, valueCol)
  }
}
