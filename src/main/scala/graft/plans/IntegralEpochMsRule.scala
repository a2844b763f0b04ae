package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: `FLOOR(unix_micros(ts) / 1000.0)` →
  * `unix_micros(ts) div 1000`.
  *
  * The float-division idiom is what users (and our own StateOps.epochMs)
  * naturally write for epoch-ms truncation. It is correct for every sane
  * timestamp but pays double-convert + fp-divide + floor per row, and it
  * silently loses exactness once |µs| exceeds 2^53. The integral-divide form
  * is both faster and exact over the full long range; for non-negative
  * divisors the two agree everywhere they are both defined, so the rewrite
  * is semantics-preserving (pinned by IntegralEpochMsRuleSpec against both
  * forms' results).
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`) — the
  * engine's example of extending Catalyst itself rather than the expression
  * library.
  */
object IntegralEpochMsRule extends Rule[LogicalPlan] {

  private object PositiveIntFoldable {
    def unapply(e: Expression): Option[Long] = if (!e.foldable) None else e.eval() match {
      case d: Double if d > 0 && d == math.floor(d) && d <= Long.MaxValue => Some(d.toLong)
      case _ => None
    }
  }

  private object MicrosAsDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(um: UnixMicros, DoubleType, _, _) => Some(um)
      case um: UnixMicros => Some(um)
      case _ => None
    }
  }

  /** Exact floor division on longs: (x − pmod(x, d)) div d. Plain `div`
    * truncates toward zero and would disagree with floor() for negative
    * (pre-epoch) values not divisible by d.
    */
  private def floorDiv(x: Expression, d: Long): Expression = {
    val dLit = Literal(d, LongType)
    IntegralDivide(Subtract(x, Pmod(x, dLit)), dLit)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // floor(unix_micros(ts) / <int-valued positive divisor>); Floor(double)
    // yields LongType, as does IntegralDivide — type-preserving rewrite
    case Floor(Divide(MicrosAsDouble(um), PositiveIntFoldable(d), _)) =>
      floorDiv(um, d)
  }
}
