package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftPlanBridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator custom plan: exact top-k rows per group, executed as
  * bounded per-partition heaps — the tier-(c) extension path (custom
  * `LogicalPlan` + `SparkStrategy` + physical `SparkPlan`, injected through
  * `SparkSessionExtensions`).
  *
  * Why a custom operator: the composable alternatives materialize strictly
  * more state at scale. `row_number() OVER (PARTITION BY g ORDER BY s)`
  * (q15's shape) must SORT every group's full row set after the shuffle —
  * at 100 TB that is a full-data sort and possible spill just to discard
  * all but k rows; the typed `TopKAgg` aggregator (q76's shape) keeps
  * bounded state but routes rows through Spark's aggregation buffer
  * machinery with per-row serialization of a growing array.
  *
  * This operator plans as TWO physical nodes around the group exchange:
  *
  *   TopKPerGroupExec(final)    — requires ClusteredDistribution(group)
  *     +- ShuffleExchange(group)         (inserted by EnsureRequirements)
  *        +- TopKPerGroupExec(partial)   — no distribution requirement
  *           +- child scan/ops
  *
  * The partial node caps every map-side partition at k rows PER GROUP
  * before the exchange — the shuffle moves at most `k · groups · partitions`
  * rows regardless of input size (the same partial/final contract a hash
  * aggregate enjoys, applied to order statistics). The final node merges the
  * per-partition survivors; both run the identical bounded-heap algorithm.
  * The sort order must be TOTAL (caller supplies tie-breakers) — then the
  * result is deterministic under any partitioning, and heap contents never
  * depend on arrival order.
  *
  * Semantics mirror the reference's per-key head extraction idiom
  * (reference `cli/Test.java:119-133` keeps only per-key summaries, never
  * full groups) re-expressed as a Spark physical operator.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  require(k > 0, s"k must be positive, got $k")

  override def output: Seq[Attribute] = child.output

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per group. `partial = true` caps each input
  * partition's groups map-side; `partial = false` requires co-located groups
  * and produces the exact result.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val gExprs = groupExprs
    val order = sortOrder
    val limit = k
    val childOutput = child.output

    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      // total order (caller guarantees tie-breakers); BaseOrdering is
      // codegen'd on the executor, interpreted fallback otherwise
      val ord: Ordering[InternalRow] =
        RowOrdering.create(order, childOutput).asInstanceOf[Ordering[InternalRow]]
      // worst-kept-row-on-top heap per group key
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      numGroups.add(heaps.size())
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val groups = heaps.values().iterator()
      while (groups.hasNext) {
        val heap = groups.next()
        val rows = new Array[InternalRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        out ++= rows
      }
      numOutputRows.add(out.length)
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans the logical node as the partial/final pair around the exchange. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, order, k, child) =>
      val partial = TopKPerGroupExec(g, order, k, partial = true, planLater(child))
      TopKPerGroupExec(g, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Exact top-k rows per group of `df`, ordered by `sort` — each entry is
    * `(columnName, ascending)` and the combined order MUST be total
    * (include a unique tie-breaker) for a deterministic result.
    */
  def apply(df: DataFrame, groupCols: Seq[String], sort: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = GraftPlanBridge.analyzed(df)
    val byName = plan.output.map(a => a.name -> a).toMap
    def attr(n: String) = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    val order = sort.map { case (n, asc) =>
      val dir = if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
                else org.apache.spark.sql.catalyst.expressions.Descending
      SortOrder(attr(n), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftPlanBridge.ofRows(spark, TopKPerGroup(groupCols.map(attr), order, k, plan))
  }

  /** Idempotently add the strategy to a live session (`getOrCreate` may
    * reuse a session built without GraftExtensions). Checks the PLANNER's
    * assembled strategy list, not just `experimental` — an
    * extension-injected copy lives in `extraPlanningStrategies`, and adding
    * a second one would make every TopKPerGroup plan twice per query.
    */
  def ensureStrategy(spark: SparkSession): Unit =
    // the check-then-append pair below is not atomic: two threads planning
    // their first TopKPerGroup concurrently could each append, after which
    // every TopKPerGroup plans twice per query — serialize on the session
    spark.synchronized {
      val planned = spark.sessionState.planner.strategies
      if (!planned.contains(TopKPerGroupStrategy) &&
          !spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies ++= Seq(TopKPerGroupStrategy)
      val optimized = spark.sessionState.optimizer.batches.flatMap(_.rules)
      if (!optimized.contains(PushFilterThroughTopK) &&
          !spark.experimental.extraOptimizations.contains(PushFilterThroughTopK))
        spark.experimental.extraOptimizations ++= Seq(PushFilterThroughTopK)
    }
}
