package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.4's "optional `Rule`" slot,
  * demonstrating the extension point): NFKC normalization is
  * idempotent, so `nfkc(nfkc(x))` collapses to `nfkc(x)`. Composed
  * pipelines (normalize → store → re-normalize on read) produce the
  * nested form naturally; the rule removes the second per-row pass.
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`).
  */
object NfkcIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfkcNormalize(inner @ NfkcNormalize(_)) => inner
    }
}
