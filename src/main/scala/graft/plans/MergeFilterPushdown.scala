package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: predicate pushdown through a coalesce-keyed outer
  * merge (the classic hand-written CDC-apply / full-outer upsert shape;
  * `Merge.applyChangeLog` itself now plans as a disjoint union where
  * built-in pushdown suffices, so this rule serves user-constructed
  * full-outer merges).
  *
  * A merged view projects its key columns as `coalesce(c.k, b.k)` over a
  * full-outer equi-join on `b.k = c.k`. Catalyst substitutes a user
  * predicate on the merged key through the Project, leaving
  * `Filter(p(coalesce(ck, bk)), Join(b, c, FullOuter, bk = ck))` — and
  * stops: built-in pushdown never moves single conjuncts through an
  * outer join, so a date/key-range predicate on the merged view scans
  * BOTH full inputs. At lake scale that defeats partition pruning on
  * exactly the query that needs it most ("merged state of partition X").
  *
  * The rewrite: for every conjunct whose key references all occur under
  * `Coalesce(x, y)` where {x, y} is an equi-join key pair, substitute
  * the coalesce with the side's own key and push one copy into EACH
  * side. This preserves semantics exactly:
  *  - a matched row has `xk = yk = v` (equality is null-rejecting), so
  *    the output coalesce is `v` and both side filters evaluate `p(v)`
  *    — the row survives in the pushed plan iff it survived the filter
  *    in the original;
  *  - filtering cannot re-classify a matched row as unmatched
  *    one-sidedly: both sides drop key `v` together (`p(v)` is a single
  *    value), so either the matched row survives whole or no output row
  *    with key `v` exists — same as the original filter's verdict;
  *  - an unmatched row's coalesce evaluates to its own side's key (the
  *    other side's attribute is NULL in that output row — even a NULL
  *    own-key works: coalesce yields NULL, and the pushed `p(own key)`
  *    evaluates the identical value).
  * Conjuncts referencing anything outside such coalesce pairs (e.g. the
  * merge's own `op = 'D'` anti-delete filter, or payload predicates)
  * are left where they are.
  *
  * Scope: FullOuter / LeftOuter / RightOuter equi-joins (the proof only
  * uses null-rejecting key equality plus "unmatched ⇒ other side NULL",
  * which holds for all three). Inner joins never reach this rule —
  * built-in pushdown already handles them.
  */
object MergeFilterPushdown extends Rule[LogicalPlan] {

  private def splitConjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Attribute-equality join key pairs as (leftAttr, rightAttr). */
  private def equiPairs(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Seq[(Attribute, Attribute)] =
    splitConjuncts(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if l.outputSet.contains(a) && r.outputSet.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
        if l.outputSet.contains(a) && r.outputSet.contains(b) => (a, b)
    }

  /** Rewrite `e` for one join side: every `Coalesce` over a key pair
    * becomes that side's key attribute (`pick`). Returns None unless the
    * result references only `side`'s output (i.e. every original
    * reference sat under a recognized coalesce). */
  private def forSide(
      e: Expression,
      pairs: Seq[(Attribute, Attribute)],
      pick: ((Attribute, Attribute)) => Attribute,
      side: LogicalPlan): Option[Expression] = {
    val rewritten = e.transform {
      case c @ Coalesce(Seq(x: AttributeReference, y: AttributeReference)) =>
        pairs.find { case (la, ra) =>
          (la.exprId == x.exprId && ra.exprId == y.exprId) ||
            (la.exprId == y.exprId && ra.exprId == x.exprId)
        }.map(pick).getOrElse(c)
    }
    if (rewritten.references.subsetOf(side.outputSet)) Some(rewritten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        j @ Join(l, r, FullOuter | LeftOuter | RightOuter, Some(jc), _)) =>
      val pairs = equiPairs(jc, l, r)
      if (pairs.isEmpty) f
      else {
        val conjuncts = splitConjuncts(cond)
        val pushed = conjuncts.map { c =>
          if (!c.deterministic || c.references.isEmpty) None
          else for {
            lp <- forSide(c, pairs, _._1, l)
            rp <- forSide(c, pairs, _._2, r)
          } yield (lp, rp)
        }
        val (push, keep) = conjuncts.zip(pushed).partition(_._2.isDefined)
        if (push.isEmpty) f
        else {
          val lPred = push.map(_._2.get._1).reduce(And)
          val rPred = push.map(_._2.get._2).reduce(And)
          val newJoin =
            j.copy(left = Filter(lPred, l), right = Filter(rPred, r))
          keep.map(_._1).reduceOption(And)
            .map(Filter(_, newJoin)).getOrElse(newJoin)
        }
      }
  }
}
