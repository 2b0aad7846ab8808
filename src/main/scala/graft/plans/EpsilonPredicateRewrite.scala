package graft.plans

import graft.functions.{SquaredL2, WithinEps}
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a radius predicate written the obvious way —
  * `squared_l2(a, b) <= ε²` (or its mirrored `ε² >= squared_l2`) —
  * is rewritten to the engine's blocked early-exit membership kernel
  * `within_eps(a, b, ε²)`, which stops folding a pair's distance as
  * soon as the partial sum crosses ε² (most candidates in a
  * neighborhood join are far, so the fold usually exits within a few
  * dimensions — the reference's own early-exit trick,
  * `kdtree2.cpp:620-630`, applied declaratively).
  *
  * This closes the SQL-surface gap: [[graft.operators.EpsilonJoin]]
  * calls the kernel explicitly, but a user writing plain SQL through
  * [[graft.GraftExtensions]] gets the same physical behavior without
  * knowing the kernel exists. The rewrite is expression-local and
  * fires only when the threshold is a non-null foldable numeric
  * (`WithinEps` bakes ε² into codegen), and only on `<=`/`>=` forms —
  * strict `<` has different boundary semantics and is left alone.
  */
object EpsilonPredicateRewrite extends Rule[LogicalPlan] {

  private def eps2Of(l: Literal): Option[Double] = l.dataType match {
    // numeric-only guard: fires never (rather than throws) on a
    // mistyped comparison the analyzer let through via coercion
    case _: org.apache.spark.sql.types.NumericType if l.value != null =>
      // WithinEps REQUIRES a finite ε² (its early-exit contract) — an
      // Infinity/NaN radius is a valid, if degenerate, comparison and
      // must pass through unrewritten, not throw during planning
      Some(graft.GraftExtensions.foldToDouble(l))
        .filter(java.lang.Double.isFinite)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(d: SquaredL2, l: Literal)
          if eps2Of(l).isDefined =>
        WithinEps(d.left, d.right, eps2Of(l).get)
      case GreaterThanOrEqual(l: Literal, d: SquaredL2)
          if eps2Of(l).isDefined =>
        WithinEps(d.left, d.right, eps2Of(l).get)
    }
}
