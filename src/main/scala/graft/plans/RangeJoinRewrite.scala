package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Rewrites naive time-range joins into bucketized equi-joins.
  *
  * `SELECT ... FROM a JOIN b ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL
  * c SECOND` has no equi predicate, so Spark plans a broadcast-nested-
  * loop (or cartesian) join — quadratic work and a driver-sized build
  * side, unusable at 100 TB. The scale-safe form is the standard
  * bucketization: quantize both time columns into c-second buckets,
  * equi-join on the bucket id with the probe side exploded to its own
  * and the next bucket, and keep the exact range predicate as a
  * post-filter (`operators/TimeJoins` is the manual spelling). This rule
  * performs that rewrite inside the optimizer, so the natural SQL gets
  * the linear-shuffle plan automatically.
  *
  * Scope guards (deliberately narrow — a wrong rewrite is a wrong
  * answer):
  *   - inner joins with no join hint;
  *   - the condition's only cross-side conjuncts are the two range
  *     bounds (same timestamp pair, constant non-negative offset);
  *     single-side conjuncts are left in place (they were pushed down
  *     by earlier batches anyway);
  *   - both bounds reference TimestampType attributes directly;
  *   - after the rewrite an equi conjunct exists, which also makes the
  *     rule idempotent under the fixed-point batch (joins with any
  *     cross-side equi conjunct never match).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Constant second offset of `expr` over base `ts`, if `expr` is
    * `ts + <literal interval>` in any of the spellings the parser and
    * function API produce. */
  private def intervalSeconds(expr: Expression, ts: Expression): Option[Long] = {
    def seconds(lit: Literal): Option[Long] = lit match {
      case Literal(micros: Long, _: DayTimeIntervalType) if micros >= 0 && micros % 1000000L == 0 =>
        Some(micros / 1000000L)
      case Literal(ci: CalendarInterval, CalendarIntervalType)
          if ci.months == 0 && ci.microseconds >= 0 && ci.microseconds % 1000000L == 0 =>
        Some(ci.days * 86400L + ci.microseconds / 1000000L)
      case _ => None
    }
    expr match {
      case TimestampAddInterval(base, lit: Literal, _) if base.semanticEquals(ts) => seconds(lit)
      case Add(base, lit: Literal, _) if base.semanticEquals(ts) => seconds(lit)
      case _ => None
    }
  }

  private def isTsAttr(e: Expression, side: LogicalPlan): Boolean = e match {
    case a: AttributeReference => a.dataType == TimestampType && side.outputSet.contains(a)
    case _ => false
  }

  /** ts → c-second bucket id, spelled identically on both join sides so
    * bucket assignment is consistent. unix_timestamp avoids the
    * timestamp→long cast ANSI mode forbids. Optimizer rules run after
    * analysis, so the timezone-aware expression must carry its
    * timeZoneId explicitly or the plan turns unresolved. */
  private def bucket(ts: Expression, tolSec: Long): Expression =
    Cast(Floor(Divide(
      Cast(UnixTimestamp(ts, Literal("yyyy-MM-dd HH:mm:ss"),
        timeZoneId = Some(conf.sessionLocalTimeZone)), DoubleType),
      Literal(tolSec.toDouble))), LongType)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if hint == JoinHint.NONE && j.resolved =>
      val conjuncts = splitConjuncts(cond)
      val (cross, single) = conjuncts.partition(c =>
        c.references.intersect(left.outputSet).nonEmpty &&
          c.references.intersect(right.outputSet).nonEmpty)

      // already has an equi conjunct (or anything but the two bounds) → leave it
      val parsed: Option[(Expression, Expression, Long)] = cross match {
        case Seq(c1, c2) =>
          def lower(c: Expression): Option[(Expression, Expression)] = c match {
            case GreaterThanOrEqual(r, l) if isTsAttr(r, right) && isTsAttr(l, left) => Some((l, r))
            case LessThanOrEqual(l, r) if isTsAttr(r, right) && isTsAttr(l, left) => Some((l, r))
            case _ => None
          }
          def upper(c: Expression): Option[(Expression, Expression, Long)] = c match {
            case LessThanOrEqual(r, add) if isTsAttr(r, right) =>
              add.references.toSeq match {
                case Seq(l: AttributeReference) if isTsAttr(l, left) =>
                  intervalSeconds(add, l).map(tol => (l, r, tol))
                case _ => None
              }
            case GreaterThanOrEqual(add, r) if isTsAttr(r, right) =>
              add.references.toSeq match {
                case Seq(l: AttributeReference) if isTsAttr(l, left) =>
                  intervalSeconds(add, l).map(tol => (l, r, tol))
                case _ => None
              }
            case _ => None
          }
          (for ((l1, r1) <- lower(c1); (l2, r2, tol) <- upper(c2)) yield (l1, r1, r2, l2, tol))
            .orElse(for ((l1, r1) <- lower(c2); (l2, r2, tol) <- upper(c1)) yield (l1, r1, r2, l2, tol))
            .collect { case (l1, r1, r2, l2, tol)
                if l1.semanticEquals(l2) && r1.semanticEquals(r2) && tol > 0 => (l1, r1, tol) }
        case _ => None
      }

      parsed match {
        case Some((lTs, rTs, tol)) =>
          val bL = AttributeReference("__graft_bucket_l", LongType, nullable = true)()
          val bR = AttributeReference("__graft_bucket_r", LongType, nullable = true)()
          // probe side: explode to own + next bucket (a right row within
          // [lTs, lTs+tol] lives in one of the two)
          val gen = Explode(CreateArray(Seq(bucket(lTs, tol), Add(bucket(lTs, tol), Literal(1L)))))
          val newLeft = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(bL), child = left)
          val newRight = Project(right.output :+ Alias(bucket(rTs, tol), bR.name)(bR.exprId), right)
          val newCond = (Seq(EqualTo(bL, bR): Expression) ++ cross ++ single).reduce(And)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE))
        case None => j
      }
  }
}
