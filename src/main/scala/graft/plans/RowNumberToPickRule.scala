package graft.plans

import graft.functions.TopKAgg
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rank-filtered ROW_NUMBER windows become pick/top-k
  * aggregations.
  *
  *  - `row_number() OVER (PARTITION BY k ORDER BY s) = 1` →
  *    `min_by`/`max_by` aggregation (one row per key, map-side combined);
  *  - `row_number() ... <= k` → the engine's bounded-heap
  *    [[graft.functions.TopKAgg]] + posexplode — the shuffle carries
  *    k·groups·partitions rows, the answer, not the input (descending
  *    windows use the aggregate's reverse mode: keep-largest,
  *    largest-first, which reproduces desc-nulls-last exactly);
  *  - `rank()/dense_rank() ... = 1` (ALL tied-best rows per group, not
  *    one) → a per-group min/max-key aggregate self-joined back to the
  *    input on (group keys, key struct), null-safe — the aggregate forms
  *    map-side and the join broadcasts (|groups| rows ≪ input), where the
  *    window form sorts every partition. Only `= 1` qualifies: at k > 1
  *    rank's gap semantics diverge from a bounded heap.
  *
  * The window form is what users naturally write for latest-per-key /
  * top-k-per-group, but it SORTS every partition just to keep k rows — at
  * scale the sort spills while the aggregate forms combine map-side (the
  * same plan shapes `StateOps.latestPerKey` and `Analytics.topKPerGroup`
  * hand-write; this rule gives the window spelling the same physics).
  *
  * Fires only where the rewrite is semantics-preserving:
  *  - exactly one window expression, a bare ROW_NUMBER, and the filter
  *    contains exactly ONE rank conjunct `rn = 1` / `rn <= k` (positive int
  *    literal); other conjuncts (`rn = 1 AND region = 'EU'`) must not
  *    reference rn and survive as a residual Filter above the rewrite —
  *    the rank never depends on them, so filter-after-pick ≡
  *    filter-after-window. A pure renaming/pruning Project between the
  *    Filter and the Window (the subquery spelling
  *    `SELECT … FROM (windowed) WHERE rn = 1` produces) is traversed:
  *    the condition is mapped through the projection, the rewrite happens
  *    below it, and the original projection is re-applied on top;
  *  - PARTITION BY is non-empty (a global aggregate would return one
  *    default row on empty input where the window form returns none);
  *  - all ORDER BY keys share one direction with the DEFAULT null
  *    placement (asc nulls-first / desc nulls-last): the pick key is a
  *    struct, whose field comparison treats null as smallest — min over it
  *    ranks nulls first and max ranks them last, exactly the defaults
  *    (null keys never nullify the struct itself, so min_by/max_by's
  *    null-ordering skip can't trigger);
  *  - every involved type is orderable (the pick key is a struct).
  *
  * Ties: row_number's choice among order-key ties is partition-layout
  * nondeterministic; the rewrites append the full row as a tiebreak, so
  * they deterministically keep/rank one of the same tied candidates — a
  * refinement, not a divergence. RowNumberToPickRuleSpec pins results
  * equal to the unrewritten window on real data and the non-fire cases.
  */
object RowNumberToPickRule extends Rule[LogicalPlan] with PredicateHelper {

  private sealed trait RankFilter
  private case object EqOne extends RankFilter
  private case class LeqK(k: Int) extends RankFilter

  /** A projection that only renames/reorders/prunes attributes — safe to
    * traverse (the condition maps through it attribute-for-attribute).
    */
  private def isRenaming(projList: Seq[NamedExpression]): Boolean =
    projList.forall {
      case _: Attribute => true
      case Alias(_: Attribute, _) => true
      case _ => false
    }

  private def rankFilterOf(cond: Expression, rn: Attribute): Option[RankFilter] =
    cond match {
      case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.exprId == rn.exprId =>
        Some(EqOne)
      case EqualTo(Literal(1, IntegerType), a: Attribute) if a.exprId == rn.exprId =>
        Some(EqOne)
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId && k >= 1 => Some(LeqK(k))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
          if a.exprId == rn.exprId && k >= 1 => Some(LeqK(k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if a.exprId == rn.exprId && k >= 2 => Some(LeqK(k - 1))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(_, _: Window) => rewriteFilter(f).getOrElse(f)
    case f @ Filter(_, Project(projList, _: Window)) if isRenaming(projList) =>
      rewriteFilter(f).getOrElse(f)
  }

  private def rewriteFilter(f: Filter): Option[LogicalPlan] = {
    // unwrap an intervening renaming Project: map the condition's
    // attributes back to the window's own outputs; the rewrite keeps the
    // original exprIds, so the projection re-applies unchanged on top
    val (w, projOpt, cond) = f.child match {
      case p @ Project(projList, pw: Window) =>
        val mapping = projList.collect {
          case al @ Alias(child: Attribute, _) => al.exprId -> child
        }.toMap
        val mapped = f.condition.transform {
          case a: Attribute if mapping.contains(a.exprId) => mapping(a.exprId)
        }
        (pw, Some(p), mapped)
      case pw: Window => (pw, None, f.condition)
      case _ => return None
    }
    if (w.windowExpressions.size != 1) return None
    for {
      rnAlias <- Some(w.windowExpressions.head).collect { case a: Alias => a }
      we <- Some(rnAlias.child).collect {
        case e: WindowExpression if e.windowFunction.isInstanceOf[RowNumber] ||
          e.windowFunction.isInstanceOf[Rank] ||
          e.windowFunction.isInstanceOf[DenseRank] => e
      }
      isRowNumber = we.windowFunction.isInstanceOf[RowNumber]
      rnAttr = rnAlias.toAttribute
      conjuncts = splitConjunctivePredicates(cond)
      (rankConjs, residual) = conjuncts.partition(c => rankFilterOf(c, rnAttr).isDefined)
      if rankConjs.size == 1
      if residual.forall(!_.references.contains(rnAttr))
      rank <- rankFilterOf(rankConjs.head, rnAttr)
      spec = we.windowSpec
      if spec.partitionSpec.nonEmpty
      if spec.orderSpec.nonEmpty
      if spec.orderSpec.forall(o => RowOrdering.isOrderable(o.child.dataType) &&
        ((o.direction == Ascending && o.nullOrdering == NullsFirst) ||
          (o.direction == Descending && o.nullOrdering == NullsLast)))
      if w.child.output.forall(a => RowOrdering.isOrderable(a.dataType))
      directions = spec.orderSpec.map(_.direction).distinct
      if directions.size == 1
      picked <- rank match {
        case EqOne if isRowNumber => Some(rewriteEqOne(w, spec, rnAlias, directions.head))
        case EqOne => Some(rewriteAllTiedBest(w, spec, rnAlias, directions.head))
        case LeqK(k) if isRowNumber =>
          Some(rewriteLeqK(w, spec, rnAlias, k, reverse = directions.head == Descending))
        case _ => None // rank/dense_rank ≤ k: gap semantics, no rewrite
      }
      filtered = if (residual.isEmpty) picked else Filter(residual.reduce(And), picked)
    } yield projOpt.fold(filtered)(p => Project(p.projectList, filtered))
  }

  private def rewriteEqOne(w: Window, spec: WindowSpecDefinition, rnAlias: Alias,
                           direction: SortDirection): LogicalPlan = {
    val childOut = w.child.output
    val valueStruct = CreateStruct(childOut)
    val keyStruct = CreateStruct(spec.orderSpec.map(_.child) ++ childOut)
    val pickFn = direction match {
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

  /** `rank()/dense_rank() = 1` → keep EVERY row whose order-key tuple
    * equals the per-group best: Aggregate(group, min/max(keyStruct)) with
    * FRESH output exprIds (group keys re-aliased) inner-joined back to
    * the input, null-safe on both the group keys (a null partition value
    * is one window group) and the key struct (struct ordering already
    * treats null fields as equal — belt and braces). The two join inputs
    * share the child SUBTREE (reused scan/exchange) but no output
    * attributes, so the self-join is duplicate-resolved by construction.
    * The appended rank column is the literal 1 under the window alias's
    * exprId, like the other rewrites.
    */
  private def rewriteAllTiedBest(w: Window, spec: WindowSpecDefinition, rnAlias: Alias,
                                 direction: SortDirection): LogicalPlan = {
    val childOut = w.child.output
    val keyStruct = CreateStruct(spec.orderSpec.map(_.child))
    val bestFn = direction match {
      case Ascending => Min(keyStruct)
      case Descending => Max(keyStruct)
    }
    val bestAlias = Alias(bestFn.toAggregateExpression(), "_graft_best")()
    val groupAliases = spec.partitionSpec.zipWithIndex.map { case (e, i) =>
      Alias(e, s"_graft_g$i")()
    }
    val agg = Aggregate(spec.partitionSpec, groupAliases :+ bestAlias, w.child)
    val cond = (spec.partitionSpec.zip(groupAliases).map { case (l, r) =>
      EqualNullSafe(l, r.toAttribute): Expression
    } :+ EqualNullSafe(keyStruct, bestAlias.toAttribute)).reduce(And)
    val join = Join(w.child, agg, Inner, Some(cond), JoinHint.NONE)
    val projList = childOut :+ Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
    Project(projList, join)
  }

  /** `rn <= k` → topK(struct(orderKeys…, row…), k) + posexplode; rank =
    * array position + 1 (TopKAgg returns the k best in rank order:
    * smallest-first, or largest-first in reverse mode for DESC windows).
    */
  private def rewriteLeqK(w: Window, spec: WindowSpecDefinition, rnAlias: Alias,
                          k: Int, reverse: Boolean): LogicalPlan = {
    val childOut = w.child.output
    val nOrd = spec.orderSpec.size
    val item = CreateStruct(spec.orderSpec.map(_.child) ++ childOut)
    val pick = Alias(TopKAgg(item, k, reverse).toAggregateExpression(), "_graft_topk")()
    val agg = Aggregate(spec.partitionSpec, Seq(pick), w.child)
    val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
    val itemAttr = AttributeReference("_graft_item", item.dataType, nullable = false)()
    val generate = Generate(PosExplode(pick.toAttribute), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None, generatorOutput = Seq(posAttr, itemAttr), agg)
    val projList = childOut.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(itemAttr, nOrd + i, Some(a.name)), a.name)(exprId = a.exprId)
    } :+ Alias(Add(posAttr, Literal(1)), rnAlias.name)(exprId = rnAlias.exprId)
    Project(projList, generate)
  }
}
