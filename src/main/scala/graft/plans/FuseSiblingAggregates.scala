package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Fuses SIBLING AGGREGATES: the `base ⋈ agg₁(child) ⋈ agg₂(child)` shape —
 * several aggregations of the SAME child joined back onto a base table on
 * the SAME grouping key — collapses into one Aggregate computing both
 * sides' functions and ONE join:
 *
 *   Join(Join(base, Agg(k, a₁, C), k=k₁), Agg(k, a₂, C'), k=k₂)
 *     ⟶  Join(base, Agg(k, a₁ ++ a₂, merge(C, C')), k=k₁)
 *
 * This is the reference's "driver-merge DAG" shape (SURVEY §2.4 A11 /
 * §3.2, create_tables_file_metadata_gdc.py:78-438: one base query plus six
 * STRING_AGG aggregates of the same dev tables, merged record-by-record in
 * driver memory). Expressed relationally the merge is a chain of left
 * joins, and each un-fused aggregate branch costs a full re-scan of the
 * child plus its own shuffle. Catalyst has no rule for this (exchange
 * reuse only deduplicates IDENTICAL subtrees, and the aggregate branches
 * differ in their aggregate lists), so the engine ships it as a
 * `SparkSessionExtensions` pre-CBO rule — SURVEY §4's "collapse repeated
 * same-key aggregates into one shuffle".
 *
 * Soundness requirements, all checked structurally:
 *  - both joins are the same type, Inner or LeftOuter, unhinted;
 *  - the aggregate children are the same plan (`sameResult`), possibly
 *    under differently-pruned Projects (merged into a union Project);
 *  - the grouping key sets are semantically equal under the child
 *    correspondence — hence the two aggregates have IDENTICAL key sets,
 *    so per base row either both branches match or neither does, and
 *    dropping the second join condition loses nothing;
 *  - every join conjunct is an EqualTo between a base-side expression and
 *    an aggregate output carrying a grouping expression, and the two
 *    conditions' (base expr, key expr) pair sets match semantically;
 *  - no nondeterministic expressions, no DISTINCT aggregates (fusing two
 *    distinct-aggregate branches would force Expand-based planning, which
 *    can be slower than the un-fused form).
 *
 * The second aggregate's expressions are rewritten into the merged child's
 * attribute space keeping their output `ExprId`s, so references above the
 * join (projections, further joins) resolve unchanged. `transformUp` fuses
 * chains of any length pairwise (the innermost pair first, whose fused
 * Aggregate is then itself a candidate).
 */
object FuseSiblingAggregates extends Rule[LogicalPlan] with PredicateHelper {

  /** c2-side ExprId → corresponding attribute of the merged child. */
  private type Corr = Map[ExprId, Attribute]

  private def substitute(e: Expression, corr: Corr): Expression =
    e.transform { case a: Attribute => corr.getOrElse(a.exprId, a) }

  private def rewriteNamed(ne: NamedExpression, corr: Corr): NamedExpression = ne match {
    case al: Alias =>
      Alias(substitute(al.child, corr), al.name)(
        al.exprId, al.qualifier, al.explicitMetadata, al.nonInheritableMetadataKeys)
    case a: Attribute => corr.get(a.exprId) match {
      case Some(m) if m.exprId == a.exprId => a
      case Some(m) => Alias(m, a.name)(a.exprId, a.qualifier)
      case None => a
    }
  }

  /**
   * Merge the two aggregate children into one plan able to evaluate both
   * sides' expressions. Leaf case: the plans are `sameResult` (same scan /
   * filter chain modulo ExprIds) — the correspondence is positional.
   * Project case: column pruning gives the branches different column
   * lists; the merged Project carries the union (second side's entries
   * rewritten into the first side's space, keeping their ExprIds unless
   * the same computation already exists on the first side).
   */
  private def merge(c1: LogicalPlan, c2: LogicalPlan): Option[(LogicalPlan, Corr)] = (c1, c2) match {
    case _ if c1.sameResult(c2) &&
        c1.output.length == c2.output.length &&
        c1.output.zip(c2.output).forall { case (x, y) => x.name == y.name && x.dataType == y.dataType } =>
      Some((c1, c2.output.zip(c1.output).map { case (y, x) => y.exprId -> x }.toMap))
    case (Project(p1, b1), Project(p2, b2)) =>
      merge(b1, b2).map { case (m, corrB) =>
        val p2r = p2.map(rewriteNamed(_, corrB))
        val extra = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
        val corr = scala.collection.mutable.Map.empty[ExprId, Attribute]
        def bodyOf(ne: NamedExpression): Expression = ne match {
          case al: Alias => al.child
          case x => x
        }
        p2r.foreach { ne2 =>
          p1.find(ne1 => bodyOf(ne1).semanticEquals(bodyOf(ne2))) match {
            case Some(ne1) => corr += ne2.exprId -> ne1.toAttribute
            case None => extra += ne2; corr += ne2.exprId -> ne2.toAttribute
          }
        }
        (Project(p1 ++ extra, m), corr.toMap)
      }
    case _ => None
  }

  /** The expression an aggregate output attribute carries. */
  private def aliasedExpr(aggExprs: Seq[NamedExpression], a: Attribute): Option[Expression] =
    aggExprs.collectFirst {
      case al: Alias if al.exprId == a.exprId => al.child
      case at: Attribute if at.exprId == a.exprId => at
    }

  /**
   * Decompose a join condition into (base expr, grouping expr) pairs.
   * None unless EVERY conjunct is an EqualTo between a base-side
   * expression and an aggregate output attribute aliasing a grouping
   * expression.
   */
  private def keyPairs(cond: Expression, base: LogicalPlan, groupExprs: Seq[Expression],
                       aggExprs: Seq[NamedExpression],
                       aggOut: AttributeSet): Option[Seq[(Expression, Expression)]] = {
    val pairs = splitConjunctivePredicates(cond).map {
      case EqualTo(l, r: Attribute) if l.references.subsetOf(base.outputSet) && aggOut.contains(r) =>
        aliasedExpr(aggExprs, r)
          .filter(ke => groupExprs.exists(_.semanticEquals(ke))).map(ke => (l, ke))
      case EqualTo(l: Attribute, r) if r.references.subsetOf(base.outputSet) && aggOut.contains(l) =>
        aliasedExpr(aggExprs, l)
          .filter(ke => groupExprs.exists(_.semanticEquals(ke))).map(ke => (r, ke))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  private def hasDistinct(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(_.exists {
      case ae: AggregateExpression => ae.isDistinct
      case _ => false
    })

  private def samePairSets(p1: Seq[(Expression, Expression)],
                           p2: Seq[(Expression, Expression)]): Boolean =
    p1.length == p2.length &&
      p2.forall { case (b2, k2) =>
        p1.exists { case (b1, k1) => b1.semanticEquals(b2) && k1.semanticEquals(k2) } } &&
      p1.forall { case (b1, k1) =>
        p2.exists { case (b2, k2) => b1.semanticEquals(b2) && k1.semanticEquals(k2) } }

  private def fuse(base: LogicalPlan, agg1: Aggregate, jt: org.apache.spark.sql.catalyst.plans.JoinType,
                   cond1: Expression, hint: JoinHint,
                   agg2: Aggregate, cond2: Expression): Option[Join] =
    for {
      (m, corr) <- merge(agg1.child, agg2.child)
      g2r = agg2.groupingExpressions.map(substitute(_, corr))
      if g2r.length == agg1.groupingExpressions.length &&
        g2r.forall(e2 => agg1.groupingExpressions.exists(_.semanticEquals(e2))) &&
        agg1.groupingExpressions.forall(e1 => g2r.exists(_.semanticEquals(e1)))
      a2r = agg2.aggregateExpressions.map(rewriteNamed(_, corr))
      p1 <- keyPairs(cond1, base, agg1.groupingExpressions, agg1.aggregateExpressions,
        agg1.outputSet)
      p2 <- keyPairs(cond2, base, g2r, a2r, AttributeSet(a2r.map(_.toAttribute)))
      if samePairSets(p1, p2)
    } yield Join(base,
      Aggregate(agg1.groupingExpressions, agg1.aggregateExpressions ++ a2r, m),
      jt, Some(cond1), hint)

  private def fusableSides(agg1: Aggregate, agg2: Aggregate,
                           jt1: org.apache.spark.sql.catalyst.plans.JoinType,
                           jt2: org.apache.spark.sql.catalyst.plans.JoinType,
                           h1: JoinHint, h2: JoinHint): Boolean =
    jt1 == jt2 && (jt1 == Inner || jt1 == LeftOuter) &&
      h1 == JoinHint.NONE && h2 == JoinHint.NONE &&
      agg1.aggregateExpressions.forall(_.deterministic) &&
      agg2.aggregateExpressions.forall(_.deterministic) &&
      agg1.groupingExpressions.forall(_.deterministic) &&
      agg2.groupingExpressions.forall(_.deterministic) &&
      !hasDistinct(agg1) && !hasDistinct(agg2)

  private def fuseOnce(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j2 @ Join(Join(base, agg1: Aggregate, jt1, Some(cond1), h1),
                   agg2: Aggregate, jt2, Some(cond2), h2)
        if fusableSides(agg1, agg2, jt1, jt2, h1, h2) =>
      fuse(base, agg1, jt1, cond1, h1, agg2, cond2).getOrElse(j2)

    // column pruning interposes a Project between the two joins — see
    // through it: substitute the Project's aliases into the outer join
    // condition, fuse, then re-apply the Project extended with the second
    // aggregate's outputs so the fused node's output matches the original
    case j2 @ Join(Project(pl, Join(base, agg1: Aggregate, jt1, Some(cond1), h1)),
                   agg2: Aggregate, jt2, Some(cond2), h2)
        if fusableSides(agg1, agg2, jt1, jt2, h1, h2) &&
          pl.forall(_.deterministic) =>
      val plMap: Map[ExprId, Expression] = pl.map {
        case al: Alias => al.exprId -> al.child
        case a: Attribute => a.exprId -> (a: Expression)
      }.toMap
      val cond2s = cond2.transform {
        case a: Attribute if plMap.contains(a.exprId) => plMap(a.exprId)
      }
      fuse(base, agg1, jt1, cond1, h1, agg2, cond2s) match {
        case Some(fused) =>
          Project(pl ++ agg2.aggregateExpressions.map(_.toAttribute), fused)
        case None => j2
      }
  }

  /** Fuse to fixpoint, collapsing the Projects each fusion step leaves
    * behind so longer sibling chains (the reference's six-branch DAG)
    * keep matching. Bounded iterations — each pass removes a join, so the
    * bound is never the limiter in practice. */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    var cur = plan
    var i = 0
    var changed = true
    while (changed && i < 8) {
      val next = fuseOnce(cur)
      changed = !next.fastEquals(cur)
      cur = if (changed)
        org.apache.spark.sql.catalyst.optimizer.CollapseProject(next)
      else next
      i += 1
    }
    cur
  }
}
