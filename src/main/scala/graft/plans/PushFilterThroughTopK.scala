package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the custom-operator integration: a `Filter`
  * over [[TopKPerGroup]] whose predicate references ONLY group columns
  * commutes with the operator (per-group top-k neither creates nor reorders
  * rows within a surviving group), so it is pushed below. From there
  * Catalyst's own pushdown chain takes over and the predicate reaches the
  * parquet scan as `PushedFilters` — groups are pruned BEFORE any heap sees
  * them, instead of heaping 100 TB and discarding.
  *
  * Predicates that touch non-group columns must NOT move: filtering rows
  * before the top-k changes which rows survive (classic limit-pushdown
  * trap), so they stay above the operator. Two further soundness guards
  * (mirroring Catalyst's own PushPredicateThroughNonJoin): the predicate
  * must be deterministic (a pushed rand() would evaluate per input row
  * instead of per surviving row), and the group expressions must be bare
  * attributes — with a computed group key like `g % 10`, a predicate over
  * `g` references only group-expr inputs yet is NOT constant within a
  * group, so pushing it would change which rows win.
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, topk: TopKPerGroup)
        if cond.deterministic &&
          topk.groupExprs.forall(_.isInstanceOf[Attribute]) &&
          f.references.nonEmpty &&
          f.references.subsetOf(AttributeSet(topk.groupExprs)) =>
      topk.copy(child = Filter(cond, topk.child))
  }
}
