package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Eager COUNT aggregation through inner equi-joins (the counting
  * special case of Yannakakis-style aggregate pushdown):
  *
  * {{{
  *   Aggregate(G, count(...), L ⋈_k R)
  *     ⇒ Aggregate(G, sum(cl·cr), Agg(k∪G_L, count → cl, L) ⋈_k Agg(k∪G_R, count → cr, R))
  * }}}
  *
  * A counting query over a many-to-many join — "pairs per nation"
  * (`CypherQueries.multiMatch`), co-occurrence counts, any
  * multi-MATCH that ends in `count(*)` — otherwise MATERIALIZES the
  * full join output just to count it: |L|·|R| / |keys| intermediate
  * rows, the plan shape that dies first at 100 TB. After the rewrite
  * each side collapses to one row per (join key × group key) before
  * the join, so the exchanged and joined volume is bounded by key
  * cardinality, never by the pair count. The rule cascades: a pre-agg
  * whose child is itself a join matches again on the next fixpoint
  * iteration, pushing counts to the bottom of a join tree.
  *
  * Worst case (join keys ~unique, e.g. a key-preserving funnel join):
  * the pre-aggregations reduce nothing and add one exchange of
  * narrow (keys, count) rows per side — bounded overhead, against an
  * unbounded win on multiplicative joins. Disable with
  * `spark.graft.eagerCountAgg=false`.
  *
  * Soundness conditions enforced below: inner join, conjunctive
  * all-attribute equi-condition, attribute-only grouping keys, every
  * aggregate a non-DISTINCT unfiltered COUNT whose arguments are a
  * literal or columns of a single side. COUNT semantics survive
  * because `count(x) over L⋈R = Σ_k count_L(x per k) · count_R(k)`
  * (null join keys never match, exactly as in the unrewritten join;
  * null-valued count arguments are excluded by the per-side count).
  * The replacement `sum` is coalesced to 0 to keep count's
  * non-nullable type contract.
  */
object EagerCountAggregation extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.eagerCountAgg", "true").toBoolean) plan
    else plan.transform {
      // never rewrite a STREAMING aggregate: the rewrite moves the
      // aggregation boundary, so the stateful operator becomes the
      // outer SUM while the pushed-down per-side COUNTs accumulate
      // their own cross-batch state — each micro-batch then re-adds
      // every PRIOR batch's per-side counts into the outer sum
      // (measured: votes 1 → 3 instead of 1 → 2 on a repeated edge).
      // Batch plans have no cross-batch state, so the algebraic
      // identity only holds there.
      case agg @ Aggregate(gkeys, results, child, _) if !agg.isStreaming =>
        rewrite(gkeys, results, child).getOrElse(agg)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** A rewritable COUNT: non-distinct, unfiltered, Complete. */
  private def asCount(e: Expression): Option[AggregateExpression] = e match {
    case ae @ AggregateExpression(_: Count, Complete, false, None, _) => Some(ae)
    case _ => None
  }

  private def rewrite(gkeys: Seq[Expression], results: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // look through a column-pruning (attributes-only) projection
    val join = child match {
      case j: Join => j
      case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) => j
      case _ => return None
    }
    // Cross-with-equi-condition is Inner in all but name (Catalyst
    // keeps the Cross tag on joins that began as crossJoin calls)
    if ((join.joinType != Inner && join.joinType != Cross) ||
      join.condition.isEmpty) return None

    val leftOut = join.left.outputSet
    val rightOut = join.right.outputSet
    // conjunctive equi-condition over bare attributes
    val eqs: Seq[(Attribute, Attribute)] = conjuncts(join.condition.get).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(b) && rightOut.contains(a) => (b, a)
      case _ => return None
    }

    val gAttrs: Seq[Attribute] = gkeys.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (!gAttrs.forall(a => leftOut.contains(a) || rightOut.contains(a))) return None

    // every aggregate in the result list must be a rewritable COUNT
    // whose arguments live wholly on one side (or are literals)
    val counts = results.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (counts.isEmpty) return None
    sealed trait Src
    case object Rows extends Src
    case class OneSide(left: Boolean, args: Seq[Expression]) extends Src
    def classify(ae: AggregateExpression): Option[Src] = asCount(ae).flatMap { c =>
      val args = c.aggregateFunction.children
      val refs = args.flatMap(_.references)
      if (refs.isEmpty) Some(Rows)
      else if (refs.forall(leftOut.contains)) Some(OneSide(true, args))
      else if (refs.forall(rightOut.contains)) Some(OneSide(false, args))
      else None
    }
    val classified: Map[AggregateExpression, Src] =
      counts.map(ae => ae -> (classify(ae) match {
        case Some(s) => s
        case None    => return None
      })).toMap

    // per-side pre-aggregations: join keys + that side's group keys,
    // a row count, and one count per side-specific COUNT argument list
    def side(isLeft: Boolean): (Aggregate, Attribute, Map[Seq[Expression], Attribute]) = {
      val sideChild = if (isLeft) join.left else join.right
      val keys = ((if (isLeft) eqs.map(_._1) else eqs.map(_._2)) ++
        gAttrs.filter((if (isLeft) leftOut else rightOut).contains)).distinct
      val rowCnt = Alias(AggregateExpression(
        Count(Seq(Literal(1))), Complete, isDistinct = false), "__graft_cnt")()
      val extra: Map[Seq[Expression], NamedExpression] = classified.collect {
        case (_, OneSide(l, args)) if l == isLeft => args
      }.toSeq.distinct.map { args =>
        args -> Alias(AggregateExpression(
          Count(args), Complete, isDistinct = false), "__graft_cnt_arg")()
      }.toMap
      val agg = Aggregate(keys, keys ++ (rowCnt +: extra.values.toSeq), sideChild)
      (agg, rowCnt.toAttribute, extra.map { case (k, v) => k -> v.toAttribute })
    }
    val (leftAgg, cl, clArgs) = side(isLeft = true)
    val (rightAgg, cr, crArgs) = side(isLeft = false)

    val newJoin = Join(leftAgg, rightAgg, Inner, join.condition, join.hint)

    // count(...) → coalesce(sum(cl·cr), 0): same LongType, same
    // non-null contract, value = the pair count the join would have
    // produced
    val newResults = results.map(_.transformUp {
      case ae: AggregateExpression if classified.contains(ae) =>
        val mult = classified(ae) match {
          case Rows                   => Multiply(cl, cr)
          case OneSide(true, args)    => Multiply(clArgs(args), cr)
          case OneSide(false, args)   => Multiply(cl, crArgs(args))
        }
        Coalesce(Seq(AggregateExpression(
          Sum(mult), Complete, isDistinct = false), Literal(0L)))
    }.asInstanceOf[NamedExpression])

    Some(Aggregate(gkeys, newResults, newJoin))
  }
}

/** Installs graft's optimizer extensions on a session (idempotent).
  * Library users either call this once per session or add the rules
  * via `SparkSessionExtensions.injectOptimizerRule`.
  */
object GraftOptimizations {
  private val rules = Seq(EagerCountAggregation, InstantComparisonRewrite,
    BroadcastScalarCrossJoin, JoinKeyRangePropagation)
  def install(spark: SparkSession): Unit =
    rules.foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
}
