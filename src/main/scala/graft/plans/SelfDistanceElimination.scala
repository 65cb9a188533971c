package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.SqDistLong

/** Catalyst optimizer rule (x05): ‖x − x‖² ≡ 0.
  *
  * When both sides of a SqDistLong are semantically the same
  * expression — which arises naturally when a generated pipeline joins
  * a table to itself and compares a row against its own vector — the
  * 64-element pair loop is replaced with a constant (null-preserving
  * when the input is nullable). Injected via
  * `SparkSessionExtensions.injectOptimizerRule`, so it runs inside
  * Catalyst's normal fixed-point optimization alongside the built-in
  * constant folding.
  */
object SelfDistanceElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SqDistLong(a, b) if a.semanticEquals(b) && a.deterministic =>
        if (a.nullable) If(IsNull(a), Literal(null, LongType), Literal(0L))
        else Literal(0L)
    }
}
