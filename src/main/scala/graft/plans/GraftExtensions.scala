package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.ext.{JaccardExpr, JaccardGteExpr}

/** Catalyst citizenship: the engine's optimizer rules, injected through
  * the standard `SparkSessionExtensions` hook —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * The library works without registration (every operator is built from
  * expressions that stand alone); the rules are pure-win rewrites that
  * fire on predicate SHAPES users write, which no single expression
  * constructor can see. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => JaccardPredicateRule)
}

/** Rewrites `jaccard_sim(a, b) >= τ` (τ a non-NaN double literal) into
  * the fused early-exit predicate [[graft.ext.JaccardGteExpr]]: once the
  * optimistic bound (inter + remaining)/union-so-far falls below τ, the
  * pair is rejected without finishing the probe pass. On band-collision
  * candidate verification — where most pairs share one stopword minhash
  * and nothing else — most evaluations exit within a few elements.
  *
  * Semantics are EXACTLY the comparison it replaces, including Spark's
  * NaN ordering (union=0 → NaN ≥ τ → true), so the rewrite is safe for
  * any input; NaN thresholds are left alone (τ=NaN means "only NaN
  * passes" under Spark ordering — a shape not worth a fused kernel). */
object JaccardPredicateRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(j: JaccardExpr, Literal(t: Double, DoubleType)) if !t.isNaN =>
      JaccardGteExpr(j.left, j.right, t)
    case LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardExpr) if !t.isNaN =>
      JaccardGteExpr(j.left, j.right, t)
  }
}
