package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `Project(cols, Filter(rn <= k, Window(row_number as rn)))`
  * where `rn` is projected away ⇒ `Project(cols, TopKPerKeyNode(...))`.
  *
  * Spark's own InferWindowGroupLimit (3.5+) inserts a WindowGroupLimit to
  * pre-prune rows, but still sorts every key group and evaluates the window;
  * this rewrite replaces the whole subtree with the heap-based operator —
  * no sort, no rank column materialization. Registered via
  * `GraftExtensions` (injectOptimizerRule) and usable through
  * `spark.experimental.extraOptimizations`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def limitFromCondition(cond: Expression, rnAttr: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnAttr) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnAttr) => Some(k - 1)
      case _ => None
    }

  /** Unwraps the WindowGroupLimit Spark may already have inserted. */
  private def unwrapGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(Alias(WindowExpression(RowNumber(), _), _)), partitionSpec, orderSpec, wChild, _)))
        if w.windowOutputSet.size == 1 =>
      val rnAttr = w.windowOutputSet.head
      limitFromCondition(cond, rnAttr) match {
        // partitionSpec must be non-empty: a global `row_number() <= k` needs
        // AllTuples semantics that the heap operator's per-key exchange does
        // not provide — leave that shape to Spark's sort+limit planning.
        case Some(k) if k > 0 && partitionSpec.nonEmpty &&
            !AttributeSet(projectList).contains(rnAttr) =>
          val child = unwrapGroupLimit(wChild)
          Project(projectList, TopKPerKeyNode(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
