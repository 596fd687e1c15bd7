package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Rewrites instant comparisons back into the raw stored-long domain
  * so they reach the parquet scan as pushable filters.
  *
  * Spark 4 cannot read TIMESTAMP(NANOS) parquet natively; the events
  * table reads nanos as BIGINT and converts per row with
  * `timestamp_micros(ts div 1000)` (Tables.events). A time-bounded
  * predicate then sits ABOVE that conversion —
  * `timestamp_micros(ts div 1000) >= T` — which no datasource can
  * push: the scan reads every row group of a 100 TB table to apply a
  * filter that prunes most of them. Both conversion steps are
  * monotone and exactly invertible on literals, so the comparison can
  * be algebraically moved onto the stored column:
  *
  *  1. `timestamp_micros(e) cmp TIMESTAMP_LIT` ⇒ `e cmp micros(lit)`
  *     (timestamp literals store micros internally — strictly
  *     monotone bijection, any cmp direction).
  *  2. `(x div k) cmp m` with literals k > 0, m > 0 ⇒ a bound on `x`
  *     (`div` truncates toward zero; for a POSITIVE right bound the
  *     truncation direction is the same for every x, negative inputs
  *     included, so: `t ≥ m ⇔ x ≥ m·k`, `t > m ⇔ x ≥ (m+1)·k`,
  *     `t ≤ m ⇔ x ≤ m·k + k−1`, `t < m ⇔ x ≤ m·k − 1`,
  *     `t = m ⇔ m·k ≤ x ≤ m·k + k−1`). Bounds are built with
  *     overflow-checked arithmetic; on overflow the predicate is left
  *     unchanged.
  *
  * The two steps chain (the user-provided optimizer batch runs to
  * fixpoint), turning the conversion-domain predicate into
  * `ts ≥ nanos_literal` — exactly the row-group-pruning filter shape.
  * Only Filter conditions are rewritten. Disable with
  * `spark.graft.instantPushdown=false`.
  */
object InstantComparisonRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.instantPushdown", "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        val rewritten = cond.transform {
          // iterate locally so both steps land in one application
          // (step 1 exposes the div comparison step 2 consumes)
          case cmp: BinaryComparison =>
            var cur: Expression = cmp
            var prev: Expression = null
            while (!(cur eq prev)) {
              prev = cur
              cur = cur match {
                case c: BinaryComparison => rewriteCmp(c)
                case other               => other
              }
            }
            cur
        }
        if (rewritten fastEquals cond) f else Filter(rewritten, child)
    }

  private def rewriteCmp(cmp: BinaryComparison): Expression = cmp match {
    // step 1: unwrap timestamp_micros against a timestamp literal
    // (either side); the literal's internal value IS the micros long
    case GreaterThan(MicrosToTimestamp(e), Literal(v: Long, TimestampType)) =>
      GreaterThan(e, Literal(v, LongType))
    case GreaterThanOrEqual(MicrosToTimestamp(e), Literal(v: Long, TimestampType)) =>
      GreaterThanOrEqual(e, Literal(v, LongType))
    case LessThan(MicrosToTimestamp(e), Literal(v: Long, TimestampType)) =>
      LessThan(e, Literal(v, LongType))
    case LessThanOrEqual(MicrosToTimestamp(e), Literal(v: Long, TimestampType)) =>
      LessThanOrEqual(e, Literal(v, LongType))
    case EqualTo(MicrosToTimestamp(e), Literal(v: Long, TimestampType)) =>
      EqualTo(e, Literal(v, LongType))
    case GreaterThan(Literal(v: Long, TimestampType), MicrosToTimestamp(e)) =>
      LessThan(e, Literal(v, LongType))
    case GreaterThanOrEqual(Literal(v: Long, TimestampType), MicrosToTimestamp(e)) =>
      LessThanOrEqual(e, Literal(v, LongType))
    case LessThan(Literal(v: Long, TimestampType), MicrosToTimestamp(e)) =>
      GreaterThan(e, Literal(v, LongType))
    case LessThanOrEqual(Literal(v: Long, TimestampType), MicrosToTimestamp(e)) =>
      GreaterThanOrEqual(e, Literal(v, LongType))
    case EqualTo(Literal(v: Long, TimestampType), MicrosToTimestamp(e)) =>
      EqualTo(e, Literal(v, LongType))

    // step 2: move a positive-bound comparison through `div k`
    case _ => divBound(cmp).getOrElse(cmp)
  }

  /** `x div k` with positive long-literal k, normalized so the divide
    * is on the LEFT (flipping the comparison when needed).
    */
  private object DivCmp {
    def unapply(cmp: BinaryComparison): Option[(Expression, Long, Long, String)] =
      (cmp.left, cmp.right) match {
        case (d: IntegralDivide, Literal(m: Long, LongType)) =>
          d.right match {
            case Literal(k: Long, LongType) if k > 0 && m > 0 =>
              Some((d.left, k, m, op(cmp)))
            case _ => None
          }
        case (Literal(m: Long, LongType), d: IntegralDivide) =>
          d.right match {
            case Literal(k: Long, LongType) if k > 0 && m > 0 =>
              Some((d.left, k, m, flip(op(cmp))))
            case _ => None
          }
        case _ => None
      }
    private def op(c: BinaryComparison): String = c match {
      case _: GreaterThan        => ">"
      case _: GreaterThanOrEqual => ">="
      case _: LessThan           => "<"
      case _: LessThanOrEqual    => "<="
      case _                     => "="
    }
    private def flip(o: String): String = o match {
      case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
      case e => e
    }
  }

  private def divBound(cmp: BinaryComparison): Option[Expression] = cmp match {
    case DivCmp(x, k, m, o) =>
      try {
        val mk = Math.multiplyExact(m, k)
        o match {
          case ">=" => Some(GreaterThanOrEqual(x, Literal(mk, LongType)))
          case ">"  => Some(GreaterThanOrEqual(x,
            Literal(Math.multiplyExact(Math.addExact(m, 1L), k), LongType)))
          case "<=" => Some(LessThanOrEqual(x,
            Literal(Math.addExact(mk, k - 1), LongType)))
          case "<"  => Some(LessThanOrEqual(x, Literal(mk - 1, LongType)))
          case _    => Some(And(
            GreaterThanOrEqual(x, Literal(mk, LongType)),
            LessThanOrEqual(x, Literal(Math.addExact(mk, k - 1), LongType))))
        }
      } catch { case _: ArithmeticException => None } // overflow: keep as-is
    case _ => None
  }
}
