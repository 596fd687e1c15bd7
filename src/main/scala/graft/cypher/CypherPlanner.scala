package graft.cypher

import graft.cypher.Ast._
import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiles a parsed [[Ast.CypherQuery]] into a DataFrame plan over a
  * [[PropertyGraph]].
  *
  * Where the reference ships the query string to Neo4j and streams
  * rows back through one socket (Neo4jInputFormat.java:60-92,
  * NonParallelInput), this planner turns the same query into Catalyst
  * operators: node patterns become pruned table scans, relationship
  * hops become equi-joins on node ids, `WHERE` becomes pushed-down
  * filters, `RETURN … count/sum` becomes partial-aggregated groupBys,
  * and `ORDER BY … LIMIT` becomes TakeOrderedAndProject. Every piece
  * is optimizer-visible, so the whole query distributes.
  *
  * Column naming convention inside a plan: `v__prop` for node
  * variable `v`, plus `v__id` for its node id.
  */
object CypherPlanner {

  def run(spark: SparkSession, graph: PropertyGraph, query: String): DataFrame =
    plan(graph, CypherParser.parse(query))

  def plan(graph: PropertyGraph, q: CypherQuery): DataFrame = {
    // plan the mandatory MATCH clauses, then left-join OPTIONAL ones
    val (mandatory, optionals) = q.matches.partition(!_.optional)
    require(mandatory.nonEmpty, "query needs at least one non-optional MATCH")

    var df: DataFrame = null
    var bound = Set.empty[String]
    mandatory.foreach { m =>
      val (cdf, cvars) = planChain(graph, m.chain, bound, df)
      df = cdf; bound ++= cvars
    }
    optionals.foreach { m =>
      val shared = m.chain.nodeVars.filter(bound.contains).distinct
      require(shared.nonEmpty,
        "OPTIONAL MATCH must share at least one variable with a previous MATCH")
      // plan the optional chain standalone (shared vars bind through
      // the relationship join keys, no second node-table scan), then
      // left-outer join on the shared variables' ids
      val (odf, ovars) = planChain(graph, m.chain, Set.empty, null, shared.toSet)
      val keys = shared.map(v => s"${v}__id")
      // drop the optional side's duplicate copies of shared-var props
      val dupCols = odf.columns.filter(c =>
        shared.exists(v => c.startsWith(s"${v}__")) && !keys.contains(c))
      df = df.join(odf.drop(dupCols: _*), keys, "left_outer")
      bound ++= ovars
    }

    q.where.foreach(w => df = df.filter(toColumn(w)))

    val hasAgg = q.items.exists(i => isAggregate(i.expr))
    var out: DataFrame =
      if (hasAgg) {
        val (aggs, keys) = q.items.partition(i => isAggregate(i.expr))
        val keyCols = keys.map(i => toColumn(i.expr).as(i.name))
        val aggCols = aggs.map(i => toAggColumn(i.expr).as(i.name))
        if (keyCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          .select(q.items.map(i => col(i.name)): _*)
      } else {
        val sel = df.select(q.items.map(i => toColumn(i.expr).as(i.name)): _*)
        if (q.distinct) sel.distinct() else sel
      }

    if (q.orderBy.nonEmpty) {
      val sorts = q.orderBy.map(s =>
        if (s.ascending) col(s.ref).asc else col(s.ref).desc)
      out = out.orderBy(sorts: _*)
    }
    q.skip.foreach(n => out = out.offset(n.toInt))
    q.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  /** Plans one linear pattern chain. Returns (df, node variables
    * bound). `prev` (with `prevBound` vars) is the accumulated plan
    * from earlier clauses; a chain that starts from an already-bound
    * variable extends it, otherwise the chains are cross-joined (per
    * Cypher cartesian-product semantics).
    */
  private def planChain(graph: PropertyGraph, chain: PatternChain,
      prevBound: Set[String], prev: DataFrame,
      virtualVars: Set[String] = Set.empty): (DataFrame, Set[String]) = {

    var bound = prevBound
    var df = prev

    def nodeDf(np: NodePattern): (DataFrame, String) = {
      val v = np.variable.getOrElse(s"__anon${np.hashCode.abs}")
      val label = np.label.getOrElse(throw new IllegalArgumentException(
        s"node ($v) needs a label to bind a table (round-1 planner)"))
      var t = graph.nodeTable(label)
      np.props.foreach { case (k, value) => t = t.filter(col(k) === lit(value)) }
      val renamed = t.select(t.columns.map(c =>
        if (c == "__id") col(c).as(s"${v}__id") else col(c).as(s"${v}__$c")): _*)
      (renamed, v)
    }

    def bindStart(np: NodePattern): String = {
      val v = np.variable.getOrElse("__start")
      if (bound.contains(v)) v // already in df — extend from it
      else {
        val (ndf, vv) = nodeDf(np)
        df = if (df == null) ndf else df.crossJoin(ndf)
        bound += vv
        vv
      }
    }

    var cur = bindStart(chain.start)
    chain.hops.foreach { case (rel, nextNode) =>
      val relType = rel.relType.getOrElse(throw new IllegalArgumentException(
        "relationships need a type (round-1 planner)"))
      val r = varLengthRel(graph.relTable(relType), rel.varLength)
        .select(col("__src").as("__r_src"), col("__dst").as("__r_dst"))
      val nv = nextNode.variable.getOrElse(s"__anon${nextNode.hashCode.abs}")

      val (joinKeyCur, joinKeyNext) = rel.direction match {
        case Out => ("__r_src", "__r_dst")
        case In  => ("__r_dst", "__r_src")
      }
      df = df.join(r, col(s"${cur}__id") === col(joinKeyCur))
      if (bound.contains(nv)) {
        // closing a cycle back onto an already-bound variable
        df = df.filter(col(s"${nv}__id") === col(joinKeyNext))
        df = df.drop("__r_src", "__r_dst")
      } else if (virtualVars.contains(nv)) {
        // variable is bound in an earlier clause: expose its id via the
        // join key; the outer left-join constrains it, no scan needed
        df = df.withColumnRenamed(joinKeyNext, s"${nv}__id")
          .drop(joinKeyCur)
        bound += nv
      } else {
        val (ndf, _) = nodeDf(nextNode.copy(variable = Some(nv)))
        df = df.join(ndf, col(joinKeyNext) === col(s"${nv}__id"))
        bound += nv
        df = df.drop("__r_src", "__r_dst")
      }
      cur = nv
    }
    (df, bound)
  }

  /** Expands `-[:T*lo..hi]->` into a union of k-hop compositions of
    * the relationship table (one row per distinct path, Cypher
    * multiplicity semantics). Each k-hop is a chain of equi-joins —
    * Catalyst/AQE picks broadcast vs shuffle per step; at 100 TB the
    * intermediate frontier is keyed on node id throughout, so the
    * partitioning is reused between steps.
    */
  private def varLengthRel(rel: DataFrame, varLength: Option[(Int, Int)]): DataFrame =
    varLength match {
      case None => rel
      case Some((lo, hi)) =>
        require(lo >= 1 && hi >= lo && hi <= 10,
          s"variable-length bounds *$lo..$hi out of supported range")
        val base = rel.select(col("__src"), col("__dst"))
        def kHop(k: Int): DataFrame =
          (2 to k).foldLeft(base) { (acc, step) =>
            val right = base.select(
              col("__src").as(s"__m$step"), col("__dst").as("__nd"))
            acc.join(right, acc("__dst") === right(s"__m$step"))
              .select(acc("__src"), col("__nd").as("__dst"))
          }
        (lo to hi).map(kHop).reduce(_.unionByName(_))
    }

  private def isAggregate(e: CExpr): Boolean = e match {
    case FnCall(n, _, _) => Set("count", "sum", "min", "max", "avg", "collect")(n)
    case _               => false
  }

  private def toColumn(e: CExpr): Column = e match {
    case Prop(v, p)   => col(s"${v}__$p")
    case Ident(n)     => col(s"${n}__id")
    case LitV(x)      => lit(x)
    case Cmp("=", l, r)  => toColumn(l) === toColumn(r)
    case Cmp("<>", l, r) => toColumn(l) =!= toColumn(r)
    case Cmp("<", l, r)  => toColumn(l) < toColumn(r)
    case Cmp("<=", l, r) => toColumn(l) <= toColumn(r)
    case Cmp(">", l, r)  => toColumn(l) > toColumn(r)
    case Cmp(">=", l, r) => toColumn(l) >= toColumn(r)
    case Cmp(op, _, _)   => throw new IllegalArgumentException(s"bad operator $op")
    case And(l, r)    => toColumn(l) && toColumn(r)
    case Or(l, r)     => toColumn(l) || toColumn(r)
    case Not(x)       => !toColumn(x)
    case f: FnCall    => throw new IllegalArgumentException(
      s"aggregate ${f.name} not allowed here")
  }

  private def toAggColumn(e: CExpr): Column = e match {
    case FnCall("count", _, true)    => count(lit(1))
    case FnCall("count", Some(a), _) => count(toColumn(a))
    case FnCall("sum", Some(a), _)   => sum(toColumn(a))
    case FnCall("min", Some(a), _)   => min(toColumn(a))
    case FnCall("max", Some(a), _)   => max(toColumn(a))
    case FnCall("avg", Some(a), _)   => avg(toColumn(a))
    case FnCall("collect", Some(a), _) => sort_array(collect_list(toColumn(a)))
    case other => throw new IllegalArgumentException(s"not an aggregate: $other")
  }
}
