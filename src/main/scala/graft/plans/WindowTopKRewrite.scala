package graft.plans

import org.apache.spark.sql.catalyst.expressions._
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
