package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for graft's native expressions — the (c)-tier
  * extension path from SURVEY §2: a `Rule[LogicalPlan]` injected via
  * [[GraftExtensions]] (`injectOptimizerRule`), running inside
  * Catalyst's operator-optimization batch alongside constant folding
  * and predicate pushdown.
  *
  * Rewrites:
  *  - `graft_normalize(graft_normalize(x, F), F)` → the inner call:
  *    Unicode normalization is idempotent per form, and composed
  *    pipelines hit this shape for real — a canonicalize-then-hash
  *    stage built on an input that a loader already normalized. The
  *    inner scan-time call survives; the redundant outer O(n) pass
  *    (with its potential String round-trip per row) disappears from
  *    the generated stage.
  *  - `graft_morton` over two foldable args stays for Catalyst's own
  *    ConstantFolding (the expression is deterministic and non-null-
  *    propagating-weird, so no special casing is needed here — listed
  *    to document the division of labor).
  */
object CollapseRedundantNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(inner @ UnicodeNormalize(_, f1), f2) if f1 == f2 =>
        inner
    }
}
