package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Rewrites a non-equi event-time range join into the binned equi join
  * of [[graft.ops.RangeJoin]] — automatically, for ANY user query of
  * that shape.
  *
  * Without an equality conjunct Spark can only plan
  * BroadcastNestedLoopJoin (O(n·m), broadcasts a whole side) for an
  * inner join with condition
  *
  *   r.ts >= l.ts  AND  r.ts < l.ts + C        (C a positive literal)
  *
  * Quantizing time into C-width bins makes the match condition an
  * equality: bin(r.ts) must equal bin(l.ts) or bin(l.ts)+1. The rule
  * explodes the left side into those two bins and adds `_bin` equality,
  * turning the plan into a shuffled hash join with the original range
  * predicate as residual — same rows, linear shuffle, no broadcast.
  * Fires only when no usable equi conjunct exists (the equality guard
  * also makes the rewrite self-terminating under the optimizer's
  * fixed-point driver). Long (epoch-µs) columns only — the engine's
  * timestamp convention.
  */
object RewriteRangeJoinAsBinned extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else detectRange(conjuncts, left, right) match {
        case Some((lTs, rTs, len)) if len > 0 =>
          val lenLit = Literal(len, LongType)
          val lDiv = IntegralDivide(lTs, lenLit)
          val binAttr = AttributeReference("_graft_bin", LongType)()
          val lGen = Generate(
            Explode(CreateArray(Seq(lDiv, Add(lDiv, Literal(1L, LongType))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = left)
          val rBin = Alias(IntegralDivide(rTs, lenLit), "_graft_bin_r")()
          val rProj = Project(right.output :+ rBin, right)
          val newJoin = Join(lGen, rProj, Inner,
            Some(And(EqualTo(binAttr, rBin.toAttribute), cond)), hint)
          Project(j.output, newJoin)
        case _ => j
      }
  }

  /** An equality between the two sides already makes this a hash join —
    * binning would only add overhead (and re-match forever). */
  private def hasEquiKey(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) => oriented(a, b, left, right).isDefined
      case EqualNullSafe(a, b) => oriented(a, b, left, right).isDefined
      case _ => false
    }

  /** Orient (a, b) as (fromLeft, fromRight) if each side evaluates
    * against exactly one join child. */
  private def oriented(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    if (canEvaluate(a, left) && canEvaluate(b, right)) Some((a, b))
    else if (canEvaluate(a, right) && canEvaluate(b, left)) Some((b, a))
    else None

  /** Find `rTs >= lTs` and `rTs < lTs + len` over long attributes of
    * opposite sides (either literal position in the Add). */
  private def detectRange(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Long)] = {
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(r: Attribute, l: Attribute)
        if l.dataType == LongType && r.dataType == LongType &&
           canEvaluate(l, left) && canEvaluate(r, right) => (l, r)
      case LessThanOrEqual(l: Attribute, r: Attribute)
        if l.dataType == LongType && r.dataType == LongType &&
           canEvaluate(l, left) && canEvaluate(r, right) => (l, r)
    }
    lower.flatMap { case (lTs, rTs) =>
      conjuncts.collectFirst {
        case LessThan(r: Attribute, Add(l: Attribute, Literal(c: Long, LongType), _))
          if r.semanticEquals(rTs) && l.semanticEquals(lTs) => c
        case LessThan(r: Attribute, Add(Literal(c: Long, LongType), l: Attribute, _))
          if r.semanticEquals(rTs) && l.semanticEquals(lTs) => c
        case GreaterThan(Add(l: Attribute, Literal(c: Long, LongType), _), r: Attribute)
          if r.semanticEquals(rTs) && l.semanticEquals(lTs) => c
        case GreaterThan(Add(Literal(c: Long, LongType), l: Attribute, _), r: Attribute)
          if r.semanticEquals(rTs) && l.semanticEquals(lTs) => c
      }.map(len => (lTs, rTs, len))
    }
  }
}
