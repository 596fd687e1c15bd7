package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule

/** Broadcasts the provably-single-row side of a condition-free cross
  * join.
  *
  * The scalar-carry idiom — `frame.crossJoin(frame.agg(...))` to ride
  * a global aggregate (total count, L1 norm, corpus size) alongside
  * every row — is all over any analytical codebase, and this engine's
  * operators spell it `crossJoin(broadcast(agg))` by hand. When the
  * hint is forgotten, Spark's stats often cannot see that a GLOBAL
  * aggregate is exactly one row (its size estimate derives from the
  * child), and the planner falls back to `CartesianProduct`: a full
  * shuffle of the big side against a 1-row frame, the worst plan in
  * the book at scale.
  *
  * This rule makes the hint automatic: for an INNER/CROSS join with
  * no condition, any side that provably produces AT MOST ONE ROW —
  * a grouping-free [[Aggregate]], a `LIMIT 1`, or one of those under
  * Project/Filter — gets a broadcast [[ResolvedHint]]. Soundness is
  * structural (no statistics involved): a one-row broadcast is
  * always at least as good as any other strategy for that join.
  *
  * Gated to condition-free inner/cross joins only — joins WITH
  * conditions already have keyed strategies, and outer joins change
  * row-preservation semantics that a hint must not disturb.
  */
object BroadcastScalarCrossJoin extends Rule[LogicalPlan] {

  /** Structurally at most one output row. */
  private def atMostOneRow(p: LogicalPlan): Boolean = p match {
    case a: Aggregate            => a.groupingExpressions.isEmpty
    case GlobalLimit(limit, child) =>
      limit match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
          v <= 1
        case _ => false
      }
    case p: Project              => atMostOneRow(p.child)
    case f: Filter               => atMostOneRow(f.child)
    case l: LocalLimit           => atMostOneRow(l.child)
    case s: SubqueryAlias        => atMostOneRow(s.child)
    case h: ResolvedHint         => atMostOneRow(h.child)
    case _                       => false
  }

  // extraOptimizations run AFTER EliminateResolvedHint, so the hint
  // must go into the Join's own JoinHint slot, not a ResolvedHint node
  private val bcast =
    Some(HintInfo(strategy =
      Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, None, hint) =>
      if (hint.rightHint.exists(_.strategy.isDefined) ||
          hint.leftHint.exists(_.strategy.isDefined)) j
      else if (atMostOneRow(right))
        j.copy(hint = hint.copy(rightHint = bcast))
      else if (atMostOneRow(left))
        j.copy(hint = hint.copy(leftHint = bcast))
      else j
  }
}
