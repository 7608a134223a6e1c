package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, LogicalPlan, ResolvedHint, Window}

/** Dev tool: scale-smell audit over EVERY declared query's optimized plan —
  * `runMain graft.PlanAudit <sfDir>`. Reports each query whose plan contains
  * a Window with an empty partitionSpec (the all-rows-to-one-task shape that
  * breaks at 100 TB unless the frame is provably post-aggregation-bounded)
  * so the allowlist in SURVEY §2.3 stays honest as the surface grows.
  *
  * Second rule (analyzed plan, where hints still exist): a `broadcast(...)`
  * hint whose subtree contains an Aggregate with grouping keys and no Limit
  * above it — a group-by's output cardinality is input-driven unless the
  * keys are enumerable, so a hinted broadcast of one is the q91-shaped OOM
  * at 100 TB. Bounded-key cases (group-by over a dim table / low-arity
  * flag) are allowlisted in SURVEY §2.3, the same discipline as windows.
  *
  * Third rule (physical plan): BroadcastNestedLoopJoin / CartesianProduct —
  * the O(n·m)-comparisons shapes — where the build/either side is NOT
  * structurally row-bounded. Bounded = the subtree provably yields O(k)
  * rows by plan shape alone: an ungrouped (one-row) aggregate, a Limit /
  * TakeOrdered, a literal LocalTableScan, or compositions of those through
  * non-expanding operators. A totals crossJoin or a 3-row band-edge join
  * auto-clears; the deliberate data×data kernels (exact all-pairs cosine,
  * which ships a blocked shuffle twin) are allowlisted in SURVEY §2.3 —
  * anywhere else a theta join that silently planned BNL is the first thing
  * a 100 TB run dies on.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = Seq.newBuilder[(String, Int)]
    val bcast = Seq.newBuilder[(String, Int)]
    val bnl = Seq.newBuilder[(String, Int)]
    val errors = Seq.newBuilder[(String, String)]
    // an Aggregate with grouping keys whose output is NOT capped by a Limit
    // between the hint and itself (Limit above agg = k-bounded by plan)
    def uncappedAggs(p: LogicalPlan): Int = p match {
      case _: GlobalLimit => 0 // everything below is k-bounded
      case a: Aggregate if a.groupingExpressions.nonEmpty =>
        1 + a.children.map(uncappedAggs).sum
      case other => other.children.map(uncappedAggs).sum
    }
    // structurally row-bounded physical subtree: O(k) output by plan shape
    // alone — one-row (ungrouped) aggregates, limits, literal scans, and
    // compositions through non-expanding operators. Conservative: row-
    // expanding generators break the proof; unary operators that can only
    // keep or shrink cardinality (project/filter/sort/agg/exchange) recurse.
    def bounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.aggregate._
      p match {
        case a: HashAggregateExec if a.groupingExpressions.isEmpty => true
        case a: SortAggregateExec if a.groupingExpressions.isEmpty => true
        case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
        case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
             _: LocalLimitExec => true
        case _: LocalTableScanExec => true
        case _: GenerateExec => false // row-expanding: proof breaks
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          bounded(j.left) && bounded(j.right)
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          bounded(j.left) && bounded(j.right)
        case u if u.children.size == 1 => bounded(u.children.head)
        case _ => false
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val n = df.queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) flagged += name -> n
        val b = df.queryExecution.analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
            uncappedAggs(h.child)
        }.sum
        if (b > 0) bcast += name -> b
        val nl = df.queryExecution.sparkPlan.collect {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
              if !bounded(j.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                case _ => j.right
              }) => j
          case j: org.apache.spark.sql.execution.joins.CartesianProductExec
              if !bounded(j.left) && !bounded(j.right) => j
        }.size
        if (nl > 0) bnl += name -> nl
      } catch { case t: Throwable =>
        errors += name -> (t.getClass.getSimpleName + ": " +
          Option(t.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120))
      }
    }
    println("== queries with partition-less Window operators ==")
    flagged.result().foreach { case (q, n) => println(s"AUDIT $q windows=$n") }
    println("== queries broadcasting an un-capped grouped Aggregate ==")
    bcast.result().foreach { case (q, n) => println(s"AUDIT-BCAST $q aggs=$n") }
    println("== queries planning nested-loop / cartesian joins ==")
    bnl.result().foreach { case (q, n) => println(s"AUDIT-BNL $q joins=$n") }
    println("== errors (builder failed before a plan existed) ==")
    errors.result().foreach { case (q, e) => println(s"AUDIT-ERR $q $e") }
    spark.stop()
  }
}
