package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the idiomatic per-group top-k pattern
  *
  * {{{ Project(cols…, Filter(rn <= k, Window(rn := row_number() over
  *     (PARTITION BY p ORDER BY o), child))) }}}
  *
  * into [[TopKPerKeyNode]] whenever the rank column itself is dropped by
  * the enclosing Project (the `withColumn("rn", …).filter(…).drop("rn")`
  * idiom — `Upsert.latestByKey`, `Dedup.exact`, every "keep newest per
  * key" operator). The window operator fully sorts every partition to
  * produce ranks that are immediately discarded; the rewrite keeps a
  * k-bounded heap instead (no sort, no spill, same one shuffle).
  *
  * Spark 3.5+'s own `InferWindowGroupLimit` only PRE-FILTERS rows ahead
  * of the window (the sort still runs); this rule removes the sort+window
  * entirely. It fires only when:
  *  - the window computes exactly one expression, a `row_number()` with a
  *    non-empty PARTITION BY (global top-k is a different plan — sorts
  *    there are `TakeOrderedAndProject`'s business);
  *  - the filter bounds that rank from above (`<= k`, `< k`, `= 1`);
  *  - the outer project references neither the rank nor anything else
  *    the child can't supply.
  *
  * Caller contract (same as any rank-filter): the ORDER BY should be
  * total for deterministic survivors — with ties, both the window and
  * the heap keep an arbitrary pick.
  */
/** Optimizer rule: rank-then-join instead of join-then-rank.
  *
  * {{{ TopKPerKey(keys, ord, k, Join(l, r, LeftOuter, l.a = r.b)) }}}
  * becomes
  * {{{ Join(TopKPerKey(keys, ord, k, l), r, LeftOuter, l.a = r.b) }}}
  *
  * when the top-k keys and ordering reference only the left side and the
  * right side is PROVABLY unique on its join keys. Then the join neither
  * drops nor duplicates left rows, so ranking before it selects exactly
  * the same survivors — but the join now processes k rows per key
  * instead of the full left side (at 100 TB: the top-k feeds the join a
  * bounded stream, and the enrichment join's shuffle shrinks by the
  * selectivity of the rank filter).
  *
  * Uniqueness is established structurally, no stats needed: the right
  * side (under pure column-pruning Projects) is an Aggregate whose every
  * grouping column is a join key, or a Distinct whose whole output is
  * join keys. Inner joins are NOT rewritten — an unmatched left row
  * would be filtered before ranking in the original plan but after it
  * in the pushed plan, changing which rows fill the top k.
  */
object TopKJoinPushdown extends Rule[LogicalPlan] {

  /** Split an equi-join condition into (leftAttrs, rightAttrs) per
    * conjunct; None if any conjunct is not a plain attribute equality. */
  private def equiKeys(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Seq[Attribute]] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val rKeys = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if l.outputSet.contains(a) && r.outputSet.contains(b) => Some(b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
        if l.outputSet.contains(a) && r.outputSet.contains(b) => Some(b)
      case _ => None
    }
    if (rKeys.forall(_.isDefined)) Some(rKeys.flatten) else None
  }

  private def splitConjunctivePredicates(cond: Expression): Seq[Expression] =
    cond match {
      case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => Seq(other)
    }

  /** Is `plan` unique on `keys` (at most one row per key combination)? */
  @annotation.tailrec
  private def isUniqueOn(plan: LogicalPlan, keys: Seq[Attribute]): Boolean = {
    val keyIds = keys.map(_.exprId).toSet
    plan match {
      // pure column pruning/reordering preserves uniqueness evidence
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        isUniqueOn(child, keys)
      case Distinct(child) =>
        child.output.forall(a => keyIds.contains(a.exprId))
      case agg: Aggregate =>
        agg.groupingExpressions.forall { g =>
          agg.aggregateExpressions.exists {
            case a @ Alias(c, _) => c.semanticEquals(g) && keyIds.contains(a.exprId)
            case ar: AttributeReference => ar.semanticEquals(g) && keyIds.contains(ar.exprId)
            case _ => false
          }
        }
      case _ => false
    }
  }

  private def tryPush(keys: Seq[Expression], ord: Seq[SortOrder], k: Int,
      j: Join): Option[Join] = j match {
    case Join(l, r, LeftOuter, Some(cond), _) =>
      val refs = AttributeSet(keys.flatMap(_.references) ++ ord.flatMap(_.references))
      equiKeys(cond, l, r) match {
        case Some(rKeys) if refs.subsetOf(l.outputSet) && isUniqueOn(r, rKeys) =>
          Some(j.copy(left = TopKPerKeyNode(keys, ord, k, l)))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case t @ TopKPerKeyNode(keys, ord, k, j: Join) =>
      tryPush(keys, ord, k, j).getOrElse(t)
    // column pruning routinely leaves a pure attribute Project between
    // the top-k and the join; a row-preserving projection commutes with
    // a row-filtering operator, so push through it
    case t @ TopKPerKeyNode(keys, ord, k, p @ Project(pl, j: Join))
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      tryPush(keys, ord, k, j) match {
        case Some(pushed) => p.copy(child = pushed)
        case None => t
      }
  }
}


/** Optimizer rule: restore predicate pushdown through [[TopKPerKeyNode]].
  *
  * Catalyst's `PushDownPredicates` knows nothing about custom logical
  * nodes, so ANY filter lands and stays ABOVE the top-k — the heap
  * processes every key group, then whole groups are discarded, and the
  * predicate never reaches the parquet scan. A predicate that
  * references only the PARTITION KEYS removes entire groups, and
  * per-key top-k is computed independently per group — so it commutes:
  *
  * {{{ Filter(p(keys), TopKPerKey(keys, ord, k, child)) ≡
  *     TopKPerKey(keys, ord, k, Filter(p(keys), child)) }}}
  *
  * After the swap the standard rules take over and push the filter the
  * rest of the way down (at best into `PushedFilters` on the scan).
  * Predicates touching NON-key columns (e.g. the ranked value) do NOT
  * commute — filtering survivors differs from ranking the filtered —
  * and are left alone.
  */
object FilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Soundness requires every key to be a BARE attribute: only then is
    // a predicate over the key references constant within each group.
    // With an expression key (e.g. partition by year(ts)), a predicate
    // on ts varies INSIDE a group — filtering before the rank changes
    // which rows fill the top k. Those shapes are left alone.
    case f @ Filter(cond, t @ TopKPerKeyNode(keys, _, _, child))
        if keys.forall(_.isInstanceOf[AttributeReference]) &&
          cond.deterministic &&
          cond.references.subsetOf(AttributeSet(keys.flatMap(_.references))) &&
          cond.references.subsetOf(child.outputSet) =>
      t.withNewChildren(Seq(Filter(cond, child)))
  }
}

object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn.exprId => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn.exprId => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1))
      if a.exprId == rn.exprId => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
      if a.exprId == rn.exprId => Some(k)
    case _ => None
  }

  /** InferWindowGroupLimit may already have inserted its pre-filter
    * below the window; the heap subsumes it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(
              WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
              _)),
            _, _, child, _))) if part.nonEmpty =>
      val rn = alias.toAttribute
      limitOf(cond, rn) match {
        case Some(k) if k >= 1 &&
            !projectList.exists(_.references.contains(rn)) &&
            projectList.forall(_.references.subsetOf(AttributeSet(child.output))) =>
          Project(projectList, TopKPerKeyNode(part, order, k, stripGroupLimit(child)))
        case _ => p
      }
  }
}
