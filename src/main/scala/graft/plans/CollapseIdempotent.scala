package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse directly-nested idempotent expressions —
  * `lower(lower(x))` -> `lower(x)`, `trim(trim(x))` -> `trim(x)`,
  * `array_distinct(array_distinct(x))` -> `array_distinct(x)`, etc.
  *
  * Composed text pipelines produce these stacks naturally: each stage
  * (tokenize, quality, langid, a caller's own prep) defensively
  * normalizes its input, and when stages are chained the normalizations
  * nest. Catalyst has no rule for them (checked against Spark 4.1's
  * `expressions` optimizer batch), so without this pass every extra
  * `lower` is a full per-char copy of the column at scan width.
  *
  * This is the engine's analog of the reference's graph-rewriting hook
  * surface: a registered pass that rewrites the computation graph before
  * execution (reference: hybridbackend/tensorflow/framework/rewriting.py,
  * common/arrow.cc-adjacent graph/op_optimization.cc:73-134), expressed
  * Spark-first as a `Rule[LogicalPlan]` injected via
  * `SparkSessionExtensions.injectOptimizerRule` ([[graft.GraftExtensions]]).
  *
  * Only IDENTICAL idempotent pairs collapse. `lower(upper(x))` is left
  * alone: case-folding is not an involution outside ASCII (ß -> SS), so
  * collapsing mixed pairs would change results.
  */
object CollapseIdempotent extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Lower(inner @ Lower(_)) => inner
    case Upper(inner @ Upper(_)) => inner
    case StringTrim(inner @ StringTrim(_, None), None) => inner
    case StringTrimLeft(inner @ StringTrimLeft(_, None), None) => inner
    case StringTrimRight(inner @ StringTrimRight(_, None), None) => inner
    case ArrayDistinct(inner @ ArrayDistinct(_)) => inner
  }
}
