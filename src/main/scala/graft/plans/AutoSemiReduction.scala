package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Automatic predicate transfer as a Catalyst optimizer rule — the
  * plan-level twin of [[PredicateTransfer.reduceAuto]], so ANY star query
  * (DataFrame or SQL text) gets the reference's transfer behavior without
  * calling the utility (`fpdb-executor/src/physical/transform/pred-trans/
  * PredTransOrder.cpp:12-31` orders and injects transfers inside the
  * planner the same way).
  *
  * Rewrite: for an inner equi-join whose one side is a LARGE fact and the
  * other a SMALL dimension carrying a genuinely selective filter (not just
  * Catalyst's inferred `isnotnull` key guards),
  *
  *   Join(fact, dim, Inner, k)
  *     → Join(Join(fact, Project(keys, dim'), LeftSemi, k'), dim, Inner, k)
  *
  * where dim' is an attribute-fresh copy of the dim subtree. The semi join
  * broadcasts (dim is under the broadcast threshold by eligibility), so
  * the fact is filtered map-side BEFORE it reaches the join's shuffle or
  * the next operator up the tree — at 100 TB the difference between
  * shuffling every fact row and shuffling the few that can survive.
  * Single-hop runtime bloom filters (`InjectRuntimeFilter`, on in
  * GraftSession) still apply on top for the joins this rule skips.
  *
  * Semantics-preserving by construction: a left-semi by the join's own
  * keys only removes fact rows the inner join would drop anyway and never
  * duplicates. Eligibility is deliberately conservative:
  *  - equi keys must be plain attributes on both sides;
  *  - dim subtree: deterministic, no subqueries, no aliases, all leaves
  *    `MultiInstanceRelation` (so the fresh copy cannot collide exprIds);
  *  - dim stats ≤ `spark.sql.autoBroadcastJoinThreshold`, fact ≥ 8× dim;
  *  - skipped when the fact already carries a semi join against the same
  *    relation leaves (idempotence under the fixed-point batch, and
  *    respect for hand-written `PredicateTransfer.reduce` calls).
  * Kill switch: `spark.graft.autoSemiReduction=false`.
  */
object AutoSemiReduction extends Rule[LogicalPlan] with PredicateHelper {

  private val SizeRatio = 8L

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.autoSemiReduction", "true").toBoolean

  /** A filter beyond the inferred `isnotnull` join-key guards. */
  private def selectivelyFiltered(p: LogicalPlan): Boolean = p.exists {
    case Filter(c, _) => splitConjunctivePredicates(c).exists {
      case _: IsNotNull => false
      case e => e.deterministic
    }
    case _ => false
  }

  private def safeToCopy(p: LogicalPlan): Boolean =
    p.collectLeaves().forall(_.isInstanceOf[MultiInstanceRelation]) &&
      p.collect { case n => n.expressions }.flatten.forall { e =>
        e.deterministic &&
          !e.exists(x => x.isInstanceOf[Alias] || x.isInstanceOf[SubqueryExpression])
      }

  /** Fact already semi-reduced against the same relation leaves? */
  private def alreadyReduced(fact: LogicalPlan, dim: LogicalPlan): Boolean = {
    val dimLeaves = dim.collectLeaves().map(_.canonicalized)
    fact.exists {
      case Join(_, r, LeftSemi, _, _) =>
        r.collectLeaves().map(_.canonicalized) == dimLeaves
      case _ => false
    }
  }

  /** Attribute-fresh copy of `dim` plus old→new output mapping. */
  private def freshCopy(dim: LogicalPlan): (LogicalPlan, AttributeMap[Attribute]) = {
    val fresh = dim.transformUp {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    }
    val mapping = AttributeMap(
      dim.collectLeaves().flatMap(_.output).zip(fresh.collectLeaves().flatMap(_.output)))
    val remapped = fresh.transformUp {
      case node => node.transformExpressions {
        case a: AttributeReference => mapping.getOrElse(a, a)
      }
    }
    (remapped, mapping)
  }

  /** (factKey, dimKey) attribute pairs of the equi part of `cond`. */
  private def equiKeys(fact: LogicalPlan, dim: LogicalPlan,
      cond: Expression): Seq[(Attribute, Attribute)] =
    splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if fact.outputSet.contains(a) && dim.outputSet.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if fact.outputSet.contains(a) && dim.outputSet.contains(b) => (a, b)
    }

  private def eligible(fact: LogicalPlan, dim: LogicalPlan, cond: Expression): Boolean = {
    val dimSize = dim.stats.sizeInBytes
    selectivelyFiltered(dim) &&
      dimSize <= SQLConf.get.autoBroadcastJoinThreshold &&
      fact.stats.sizeInBytes >= dimSize * SizeRatio &&
      safeToCopy(dim) &&
      !alreadyReduced(fact, dim) &&
      equiKeys(fact, dim, cond).nonEmpty
  }

  private def reduce(fact: LogicalPlan, dim: LogicalPlan,
      cond: Expression): LogicalPlan = {
    val keys = equiKeys(fact, dim, cond)
    val (copy, mapping) = freshCopy(dim)
    val semiCond = keys.map { case (f, d) =>
      EqualTo(f, mapping.getOrElse(d, d)).asInstanceOf[Expression]
    }.reduce(And)
    val semiRight = Project(keys.map { case (_, d) => mapping.getOrElse(d, d) }, copy)
    Join(fact, semiRight, LeftSemi, Some(semiCond), JoinHint.NONE)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // never touch streaming joins: a copied stream source inside an
      // un-watermarked semi join would fail incremental planning (today
      // streaming sources also carry huge default stats, but that is an
      // accident, not a guarantee)
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic && !j.isStreaming =>
        if (eligible(left, right, cond))
          j.copy(left = reduce(left, right, cond))
        else if (eligible(right, left, cond))
          j.copy(right = reduce(right, left, cond))
        else j
    }
  }
}
