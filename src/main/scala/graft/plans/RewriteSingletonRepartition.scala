package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (tier-(c) extension path, SURVEY.md §4.2 "optional
  * nicety"): rewrite `repartition(1)` — a full shuffle with one reducer, the
  * reference's single-output-file idiom (`cli/Sample.java:101`) — into
  * `coalesce(1)`, the narrow no-shuffle equivalent.
  *
  * Deliberately OFF by default (`spark.graft.rewriteSingletonRepartition`):
  * coalesce(1) collapses the whole preceding stage into one task, which is
  * the right trade only when the upstream work is small (sample exports);
  * Spark itself never auto-rewrites for exactly this reason.
  */
case class RewriteSingletonRepartition(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get("spark.graft.rewriteSingletonRepartition", "false").toBoolean) plan
    else plan.transform {
      case Repartition(1, true, child) => Repartition(1, shuffle = false, child)
    }
}
