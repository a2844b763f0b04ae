package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `row_number() OVER (PARTITION BY k ORDER BY s) = 1`
  * filters become `min_by`/`max_by` aggregations.
  *
  * The window form is what users naturally write for latest-per-key, but it
  * SORTS every partition just to keep one row — at scale the sort spills
  * while the aggregate form combines map-side and shuffles only one row
  * per key (the same plan shape the engine's own `StateOps.latestPerKey`
  * hand-writes; this rule gives the window spelling the same physics).
  *
  * Fires only where the rewrite is semantics-preserving:
  *  - exactly one window expression, a bare ROW_NUMBER, and the filter is
  *    exactly `rn = 1`;
  *  - PARTITION BY is non-empty (a global aggregate would return one
  *    default row on empty input where the window form returns none);
  *  - all ORDER BY keys share one direction (asc → min_by, desc → max_by)
  *    with the DEFAULT null placement (asc nulls-first / desc nulls-last):
  *    the pick key is a struct, whose field comparison treats null as
  *    smallest — min over it ranks nulls first and max ranks them last,
  *    exactly the defaults (null keys never nullify the struct itself, so
  *    min_by/max_by's null-ordering skip can't trigger);
  *  - every involved type is orderable (the pick key is a struct).
  *
  * Ties: row_number's choice among order-key ties is partition-layout
  * nondeterministic; the rewrite appends the full row as a tiebreak, so it
  * deterministically picks one of the same tied candidates — a refinement,
  * not a divergence. RowNumberToPickRuleSpec pins results equal to the
  * unrewritten window on real data and the non-fire cases.
  */
object RowNumberToPickRule extends Rule[LogicalPlan] {

  private def isRnEqOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.exprId == rn.exprId
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.exprId == rn.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, w: Window) if w.windowExpressions.size == 1 =>
      val rewritten = for {
        rnAlias <- Some(w.windowExpressions.head).collect { case a: Alias => a }
        we <- Some(rnAlias.child).collect {
          case e: WindowExpression if e.windowFunction.isInstanceOf[RowNumber] => e
        }
        if isRnEqOne(cond, rnAlias.toAttribute)
        spec = we.windowSpec
        if spec.partitionSpec.nonEmpty
        if spec.orderSpec.nonEmpty
        if spec.orderSpec.forall(o => RowOrdering.isOrderable(o.child.dataType) &&
          ((o.direction == Ascending && o.nullOrdering == NullsFirst) ||
            (o.direction == Descending && o.nullOrdering == NullsLast)))
        if w.child.output.forall(a => RowOrdering.isOrderable(a.dataType))
        directions = spec.orderSpec.map(_.direction).distinct
        if directions.size == 1
      } yield {
        val childOut = w.child.output
        val valueStruct = CreateStruct(childOut)
        val keyStruct = CreateStruct(spec.orderSpec.map(_.child) ++ childOut)
        val pickFn = directions.head match {
          case Ascending => MinBy(valueStruct, keyStruct)
          case Descending => MaxBy(valueStruct, keyStruct)
        }
        val pick = Alias(pickFn.toAggregateExpression(), "_graft_pick")()
        val agg = Aggregate(spec.partitionSpec, Seq(pick), w.child)
        val pickAttr = pick.toAttribute
        val projList = childOut.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(pickAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
        } :+ Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
        Project(projList, agg)
      }
      rewritten.getOrElse(Filter(cond, w))
  }
}
