package graft.cypher

import graft.cypher.Ast._
import org.scalatest.funsuite.AnyFunSuite

class CypherParserSpec extends AnyFunSuite {

  private def matches(q: CypherQuery): Seq[MatchClause] =
    q.clauses.collect { case m: MatchClause => m }
  private def where(q: CypherQuery): Option[CExpr] =
    q.clauses.collectFirst { case FilterClause(e) => e }

  test("node scan with projection and order") {
    val q = CypherParser.parse(
      "MATCH (c:Customer) RETURN c.name AS name, c.acctbal ORDER BY name DESC LIMIT 5")
    assert(matches(q).head.chain.start == NodePattern(Some("c"), Some("Customer"), Map.empty))
    val r = q.returnClause
    assert(r.items == Seq(
      ReturnItem(Prop("c", "name"), Some("name")),
      ReturnItem(Prop("c", "acctbal"), None)))
    assert(r.items(1).name == "acctbal")
    assert(r.orderBy == Seq(SortItem("name", ascending = false)))
    assert(r.limit.contains(5L))
  }

  test("relationship pattern directions") {
    val out = matches(CypherParser.parse(
      "MATCH (a:X)-[:R]->(b:Y) RETURN a.p")).head.chain
    assert(out.hops.head._1 == RelPattern(None, Some("R"), Out, None))
    val in = matches(CypherParser.parse(
      "MATCH (a:X)<-[:R]-(b:Y) RETURN a.p")).head.chain
    assert(in.hops.head._1 == RelPattern(None, Some("R"), In, None))
    val both = matches(CypherParser.parse(
      "MATCH (a:X)-[:R]-(b:Y) RETURN a.p")).head.chain
    assert(both.hops.head._1 == RelPattern(None, Some("R"), Both, None))
  }

  test("property map, where, skip") {
    val q = CypherParser.parse(
      "MATCH (c:Customer {mktsegment: 'BUILDING'}) WHERE c.acctbal >= 10.5 AND NOT c.name = 'x' " +
      "RETURN c.name SKIP 2 LIMIT 3")
    assert(matches(q).head.chain.start.props == Map("mktsegment" -> "BUILDING"))
    assert(where(q).contains(
      And(Cmp(">=", Prop("c", "acctbal"), LitV(10.5)),
        Not(Cmp("=", Prop("c", "name"), LitV("x"))))))
    assert(q.returnClause.skip.contains(2L) && q.returnClause.limit.contains(3L))
  }

  test("aggregates and count star") {
    val q = CypherParser.parse(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) " +
      "RETURN n.name AS nation, count(*) AS n, sum(c.acctbal) AS bal")
    assert(q.returnClause.items(1).expr == FnCall("count", None, star = true))
    assert(q.returnClause.items(2).expr == FnCall("sum", Some(Prop("c", "acctbal"))))
  }

  test("var-length range") {
    def vl(p: String) = matches(CypherParser.parse(
      s"MATCH (a:X)-[$p]->(b:Y) RETURN a.p")).head.chain.hops.head._1.varLength
    assert(vl(":R*1..3").contains((1, 3)))
    assert(vl(":R*2").contains((2, 2)))
    assert(vl(":R*..3").contains((1, 3)))
    assert(vl(":R*2..").contains((2, CypherParser.MaxVarHops)))
    assert(vl(":R*").contains((1, CypherParser.MaxVarHops)))
    assert(vl(":R").isEmpty)
  }

  test("GQL postfix path quantifier maps onto the var-length range") {
    def vl(pat: String) = matches(CypherParser.parse(
      s"MATCH (a:X)$pat(b:Y) RETURN a.p")).head.chain.hops.head._1.varLength
    assert(vl("-[:R]->{1,3}").contains((1, 3)))
    assert(vl("-[:R]->{2}").contains((2, 2)))
    assert(vl("-[:R]->{2,}").contains((2, CypherParser.MaxVarHops)))
    assert(vl("<-[:R]-{1,2}").contains((1, 2)))
    assert(vl("-[:R]-{1,2}").contains((1, 2)))
    // zero lower bounds are GQL semantics (0..m includes the empty
    // path) — both the explicit and implicit spellings parse (r13)
    assert(vl("-[:R]->{0,3}").contains((0, 3)))
    assert(vl("-[:R]->{,3}").contains((0, 3)))
    assert(vl("-[:R]->{0}").contains((0, 0)))
    // combining both spellings is rejected; so are {} and an inverted
    // range
    intercept[IllegalArgumentException](vl("-[:R*1..2]->{1,3}"))
    intercept[IllegalArgumentException](vl("-[:R]->{}"))
    intercept[IllegalArgumentException](vl("-[:R]->{3,1}"))
  }

  test("parenthesized quantified path group maps onto the var-length range") {
    val q = CypherParser.parse(
      "MATCH (a:X) (()-[:R]->()){2,3} (b:Y) RETURN a.p")
    val chain = matches(q).head.chain
    assert(chain.start.label.contains("X"))
    assert(chain.hops.size == 1)
    val (rel, end) = chain.hops.head
    assert(rel.relType.contains("R") && rel.varLength.contains((2, 3)))
    assert(end.label.contains("Y"))
    // named inner nodes are GQL group variables (per-step node lists)
    val gv = matches(CypherParser.parse(
      "MATCH (a:X) ((u)-[:R]->(v)){2,3} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(gv.groupNodes.contains((Some("u"), Some("v"))))
    assert(gv.varLength.contains((2, 3)))
    val gvHalf = matches(CypherParser.parse(
      "MATCH (a:X) (()-[:R]->(v)){2} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(gvHalf.groupNodes.contains((None, Some("v"))))
    assert(rel.groupNodes.isEmpty, "anonymous groups bind no group vars")
    // inner labels/props are PER-STEP constraints since r13 —
    // captured as stepFilters, no longer a reject
    val sf = matches(CypherParser.parse(
      "MATCH (a:X) ((:Z)-[:R]->()){2,3} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(sf.stepFilters.exists(_._1.label.contains("Z")))
    assert(sf.varLength.contains((2, 3)))
    // inline per-step WHERE parses into stepWhere (r13)
    val sw = matches(CypherParser.parse(
      "MATCH (a:X) ((u)-[:R]->(v) WHERE u.p < v.p){1,3} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(sw.stepWhere.contains(
      Ast.Cmp("<", Ast.Prop("u", "p"), Ast.Prop("v", "p"))))
    // multi-hop inner chains parse as a composite groupChain (r13)
    val mh = matches(CypherParser.parse(
      "MATCH (a:X) (()-[:R]->()-[:S]->()){2} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(mh.groupChain.exists(_.hops.size == 2))
    assert(mh.varLength.contains((2, 2)))
    // 4-hop inner chains parse since r15 (cap lifted to MaxVarHops)
    val mh4 = matches(CypherParser.parse(
      "MATCH (a:X) (()-[:R]->()-[:S]->()-[:T]->()-[:U]->()){2} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(mh4.groupChain.exists(_.hops.size == 4))
    // only the shared quantifier cap rejects inner chains now
    val tooMany = Seq.fill(CypherParser.MaxVarHops + 1)("-[:R]->()").mkString
    intercept[IllegalArgumentException](CypherParser.parse(
      s"MATCH (a:X) (()$tooMany){2} (b:Y) RETURN a.p"))
    // In-direction inner hops parse since r14 (composite orientation)
    val mhIn = matches(CypherParser.parse(
      "MATCH (a:X) (()-[:R]->()<-[:S]-()){2} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(mhIn.groupChain.exists(_.hops.size == 2))
    // named inner relationships parse since r14 (per-repetition lists)
    val mhR = matches(CypherParser.parse(
      "MATCH (a:X) ((u)-[r:R]->()-[:S]->()){2} (b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(mhR.groupChain.exists(_.hops.head._1.variable.contains("r")))
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (a:X) (()-[:R*1..2]->()){2} (b:Y) RETURN a.p")) // double spell
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (a:X) (()-[:R]->()) (b:Y) RETURN a.p")) // missing quantifier
  }

  test("relationship property maps parse and attach to the pattern") {
    val r = matches(CypherParser.parse(
      "MATCH (a:X)-[l:R {qty: 25.0, kind: 'bulk'}]->(b:Y) RETURN a.p"))
      .head.chain.hops.head._1
    assert(r.props == Map("qty" -> 25.0, "kind" -> "bulk"))
    assert(r.variable.contains("l"))
  }

  test("optional match flag") {
    val q = CypherParser.parse(
      "MATCH (c:Customer) OPTIONAL MATCH (o:Order)-[:PLACED_BY]->(c) RETURN c.name")
    val ms = matches(q)
    assert(!ms.head.optional && ms(1).optional)
  }

  test("WITH pipeline with aggregation and post-filter") {
    val q = CypherParser.parse(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) " +
      "WITH n, count(c) AS cnt WHERE cnt > 3 RETURN n.name AS nation, cnt")
    val w = q.clauses.collectFirst { case w: WithClause => w }.get
    assert(w.items == Seq(
      ReturnItem(Ident("n"), None),
      ReturnItem(FnCall("count", Some(Ident("c"))), Some("cnt"))))
    assert(w.where.contains(Cmp(">", Ident("cnt"), LitV(3L))))
  }

  test("UNWIND of a list literal and of a bound name") {
    val q = CypherParser.parse("UNWIND [1, 2, 3] AS x RETURN x")
    assert(q.clauses.head ==
      UnwindClause(ListLit(Seq(LitV(1L), LitV(2L), LitV(3L))), "x"))
    val q2 = CypherParser.parse(
      "MATCH (n:Nation) WITH collect(n.name) AS names UNWIND names AS nm RETURN nm")
    assert(q2.clauses.exists {
      case UnwindClause(Ident("names"), "nm") => true
      case _ => false
    })
  }

  test("arithmetic precedence: * binds tighter than +, cmp above both") {
    val q = CypherParser.parse(
      "MATCH (c:X) WHERE c.a + c.b * 2 >= 10 RETURN c.a * c.b + 1 AS v")
    assert(where(q).contains(Cmp(">=",
      Arith("+", Prop("c", "a"), Arith("*", Prop("c", "b"), LitV(2L))),
      LitV(10L))))
    assert(q.returnClause.items.head.expr ==
      Arith("+", Arith("*", Prop("c", "a"), Prop("c", "b")), LitV(1L)))
    // count(*) still parses as the star aggregate, not arithmetic
    val agg = CypherParser.parse("MATCH (c:X) RETURN count(*) AS n")
    assert(agg.returnClause.items.head.expr == FnCall("count", None, star = true))
  }

  test("DISTINCT aggregates and scalar functions parse") {
    val q = CypherParser.parse(
      "MATCH (c:X) RETURN count(DISTINCT c.k) AS n, toLower(c.name) AS lc")
    assert(q.returnClause.items.head.expr ==
      FnCall("count", Some(Prop("c", "k")), distinct = true))
    assert(q.returnClause.items(1).expr == FnCall("tolower", Some(Prop("c", "name"))))
  }

  test("string predicates STARTS WITH / ENDS WITH / CONTAINS / =~ parse") {
    val q = CypherParser.parse(
      "MATCH (c:X) WHERE c.name STARTS WITH 'Cu' AND c.name ENDS WITH '1' " +
        "AND c.seg CONTAINS 'ING' AND c.name =~ 'Cu.*' RETURN c.name")
    val w = where(q).get
    def preds(e: CExpr): Seq[StrPred] = e match {
      case And(l, r)  => preds(l) ++ preds(r)
      case p: StrPred => Seq(p)
      case _          => Seq.empty
    }
    assert(preds(w) == Seq(
      StrPred("startswith", Prop("c", "name"), LitV("Cu")),
      StrPred("endswith", Prop("c", "name"), LitV("1")),
      StrPred("contains", Prop("c", "seg"), LitV("ING")),
      StrPred("regex", Prop("c", "name"), LitV("Cu.*"))))
  }

  test("path variables, type/labels/length functions parse") {
    val q = CypherParser.parse(
      "MATCH p = (a:X)-[r:T*1..2]->(b) RETURN length(p) AS hops, type(r) AS t, labels(a) AS ls")
    assert(matches(q).head.chain.pathVar.contains("p"))
    assert(q.returnClause.items.map(_.expr) == Seq(
      FnCall("length", Some(Ident("p"))),
      FnCall("type", Some(Ident("r"))),
      FnCall("labels", Some(Ident("a")))))
  }

  test("CASE and coalesce parse") {
    val q = CypherParser.parse(
      "MATCH (c:X) RETURN CASE WHEN c.a < 0 THEN 'neg' ELSE 'pos' END AS band, " +
        "coalesce(c.a, 0) AS a0")
    assert(q.returnClause.items.head.expr ==
      CaseExpr(Seq((Cmp("<", Prop("c", "a"), LitV(0L)), LitV("neg"))), Some(LitV("pos"))))
    assert(q.returnClause.items(1).expr == Coalesce(Seq(Prop("c", "a"), LitV(0L))))
  }

  test("UNION and UNION ALL parse; mixing flavors is rejected") {
    val st = CypherParser.parseStatement(
      "MATCH (c:X) RETURN c.name AS n UNION MATCH (s:Y) RETURN s.name AS n")
    assert(st.parts.size == 2 && !st.unionAll)
    val sta = CypherParser.parseStatement(
      "MATCH (c:X) RETURN c.name AS n UNION ALL MATCH (s:Y) RETURN s.name AS n " +
        "UNION ALL MATCH (t:Z) RETURN t.name AS n")
    assert(sta.parts.size == 3 && sta.unionAll)
    assertThrows[IllegalArgumentException](CypherParser.parseStatement(
      "MATCH (c:X) RETURN c.name AS n UNION MATCH (s:Y) RETURN s.name AS n " +
        "UNION ALL MATCH (t:Z) RETURN t.name AS n"))
    // the single-query entry point refuses a UNION statement
    assertThrows[IllegalArgumentException](CypherParser.parse(
      "MATCH (c:X) RETURN c.name AS n UNION MATCH (s:Y) RETURN s.name AS n"))
  }

  test("malformed queries fail with a message") {
    assertThrows[IllegalArgumentException](CypherParser.parse("MATCH (c:Customer"))
    assertThrows[IllegalArgumentException](CypherParser.parse("FOO 1"))
    assertThrows[IllegalArgumentException](
      CypherParser.parse("MATCH (c:Customer) RETURN c.name trailing"))
  }

  test("bare pattern predicate is EXISTS sugar; parenthesized exprs backtrack") {
    val q = CypherParser.parse(
      "MATCH (o:Order) WHERE (p:Part {brand: 'B'})<-[:CONTAINS]-(o) RETURN o.orderstatus")
    val f = q.clauses.collectFirst { case f: FilterClause => f }.get
    val ex = f.expr.asInstanceOf[ExistsPattern]
    assert(ex.chain.hops.nonEmpty)
    // NOT (pattern) negates the sugar
    val q2 = CypherParser.parse(
      "MATCH (o:Order) WHERE NOT (o)-[:CONTAINS]->(:Part) RETURN o.orderstatus")
    val f2 = q2.clauses.collectFirst { case f: FilterClause => f }.get
    assert(f2.expr.isInstanceOf[Not] &&
      f2.expr.asInstanceOf[Not].e.isInstanceOf[ExistsPattern])
    // a parenthesized value expression still parses as arithmetic
    val q3 = CypherParser.parse(
      "MATCH (c:Customer) WHERE (c.acctbal + 1.0) > 2.0 RETURN c.name")
    val f3 = q3.clauses.collectFirst { case f: FilterClause => f }.get
    assert(f3.expr.isInstanceOf[Cmp])
  }

  test("nested subquery expressions keep the enclosing pattern's inline WHERE frame") {
    // predicates buffered by EARLIER elements of the enclosing
    // pattern (a.acctbal > 1.0) must neither be drained into a nested
    // subquery expression's inner scope nor dropped by the full-body
    // fallback's buffer reset (r16 frame-mark discipline)
    def flat(e: CExpr): Seq[CExpr] = e match {
      case And(l, r) => flat(l) ++ flat(r)
      case other     => Seq(other)
    }
    def hasAPred(preds: Seq[CExpr]): Boolean = preds.exists {
      case Cmp(">", Prop("a", "acctbal"), _) => true
      case _                                 => false
    }
    // simple-form EXISTS inside the SECOND element's inline WHERE
    val q1 = CypherParser.parse(
      "MATCH (a:Customer WHERE a.acctbal > 1.0)<-[:PLACED_BY]-" +
        "(b WHERE EXISTS { (b)-[:CONTAINS]->(:Part) }) RETURN a.name")
    val preds1 = flat(q1.clauses.collectFirst { case f: FilterClause => f }.get.expr)
    assert(hasAPred(preds1), "a's inline predicate must stay in the outer frame")
    val ex1 = preds1.collectFirst { case e: ExistsPattern => e }.get
    assert(ex1.where.isEmpty, "a's predicate must not leak into the EXISTS scope")
    // full-body EXISTS (the WITH horizon forces the fallback path)
    val q2 = CypherParser.parse(
      "MATCH (a:Customer WHERE a.acctbal > 1.0)<-[:PLACED_BY]-" +
        "(b WHERE EXISTS { MATCH (b)-[:CONTAINS]->(p:Part) WITH p " +
        "MATCH (p2:Part) WHERE p2.size = p.size RETURN p2 }) RETURN a.name")
    val preds2 = flat(q2.clauses.collectFirst { case f: FilterClause => f }.get.expr)
    assert(hasAPred(preds2), "full-body fallback must not drop a's predicate")
    val sub2 = preds2.collectFirst { case e: ExistsSubquery => e }.get
    val innerPreds = sub2.body.collect { case FilterClause(e) => flat(e) }.flatten
    assert(!hasAPred(innerPreds), "a's predicate must not migrate into the body")
    // full-body COUNT nested the same way
    val q3 = CypherParser.parse(
      "MATCH (a:Customer WHERE a.acctbal > 1.0)<-[:PLACED_BY]-" +
        "(b WHERE COUNT { MATCH (b)-[:CONTAINS]->(p:Part) WITH p " +
        "RETURN DISTINCT p.size } > 0) RETURN a.name")
    val preds3 = flat(q3.clauses.collectFirst { case f: FilterClause => f }.get.expr)
    assert(hasAPred(preds3), "COUNT fallback must not drop a's predicate")
    assert(preds3.exists {
      case Cmp(">", _: CountSubquery, _) => true
      case _                             => false
    })
  }

  test("COUNT { pattern } parses as a subquery expression, count(x) stays an aggregate") {
    val q = CypherParser.parse(
      "MATCH (n:Nation) RETURN n.name, COUNT { (n)<-[:FROM_NATION]-(:Customer) } AS c")
    val items = q.returnClause.items
    assert(items(1).expr.isInstanceOf[CountPattern])
    assert(items(1).alias.contains("c"))
    val q2 = CypherParser.parse("MATCH (n:Nation) RETURN count(n.name) AS c")
    assert(q2.returnClause.items.head.expr == FnCall("count", Some(Prop("n", "name"))))
  }

  test("list comprehension and reduce parse; plain list literals still work") {
    val q = CypherParser.parse(
      "MATCH (n:Nation) RETURN [x IN [1, 2, 3] WHERE x > 1 | x * 2] AS ys")
    val lc = q.returnClause.items.head.expr.asInstanceOf[ListComp]
    assert(lc.variable == "x" && lc.where.isDefined && lc.proj.isDefined)
    val q2 = CypherParser.parse(
      "MATCH (n:Nation) RETURN reduce(acc = 0, x IN [1, 2] | acc + x) AS s")
    val r = q2.returnClause.items.head.expr.asInstanceOf[ReduceExpr]
    assert(r.acc == "acc" && r.variable == "x" && r.init == LitV(0L))
    // a plain list literal is still a ListLit
    val q3 = CypherParser.parse("MATCH (n:Nation) RETURN [1, 2, 3] AS xs")
    assert(q3.returnClause.items.head.expr.isInstanceOf[ListLit])
  }

  test("WITH accepts openCypher order: modifiers then WHERE as a post-horizon filter") {
    val q = CypherParser.parse(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) " +
      "WITH n, count(c) AS cnt ORDER BY cnt DESC LIMIT 5 WHERE cnt > 3 " +
      "RETURN n.name AS nation, cnt")
    val w = q.clauses.collectFirst { case w: WithClause => w }.get
    assert(w.where.isEmpty && w.limit.contains(5L) && w.orderBy.nonEmpty)
    // the WHERE lands as a FilterClause AFTER the WithClause
    val iw = q.clauses.indexWhere(_.isInstanceOf[WithClause])
    assert(q.clauses(iw + 1) == FilterClause(Cmp(">", Ident("cnt"), LitV(3L))))
  }

  test("multi-arg scalar calls, list predicates, unary minus, % and ^") {
    val q = CypherParser.parse(
      "MATCH (n:Nation) RETURN substring(n.name, 0, 3) AS pre, " +
      "replace(n.name, 'A', '@') AS r, abs(n.nationkey) AS a")
    val items = q.returnClause.items
    assert(items(0).expr ==
      FnCallN("substring", Seq(Prop("n", "name"), LitV(0L), LitV(3L))))
    assert(items(1).expr ==
      FnCallN("replace", Seq(Prop("n", "name"), LitV("A"), LitV("@"))))
    // single-arg scalar stays FnCall
    assert(items(2).expr == FnCall("abs", Some(Prop("n", "nationkey"))))

    val q2 = CypherParser.parse(
      "MATCH (n:Nation) WHERE any(x IN [1, 2] WHERE x > -1) RETURN n.name")
    val lp = q2.clauses.collectFirst { case FilterClause(e) => e }.get
      .asInstanceOf[ListPred]
    assert(lp.kind == "any" && lp.variable == "x")
    // unary minus folded into the literal
    assert(lp.pred == Cmp(">", Ident("x"), LitV(-1L)))

    // % at mul precedence; ^ tighter and LEFT-associative (openCypher:
    // 2^3^2 = (2^3)^2 = 64)
    val q3 = CypherParser.parse("MATCH (n:Nation) RETURN n.nationkey % 3 + 2 ^ 3 ^ 2 AS v")
    assert(q3.returnClause.items.head.expr ==
      Arith("+", Arith("%", Prop("n", "nationkey"), LitV(3L)),
        Arith("^", Arith("^", LitV(2L), LitV(3L)), LitV(2L))))

    // malformed spellings fail loudly, not silently
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (n:Nation) RETURN any(x IN [1,2]) AS a")) // missing WHERE
    intercept[IllegalArgumentException](CypherParser.parse(
      "MATCH (n:Nation) RETURN substring(n.name,) AS s")) // dangling comma
    // an unknown multi-arg call shape is rejected by the planner
    intercept[IllegalArgumentException] {
      graft.cypher.CypherPlanner.plan(
        graft.graph.GraphLoader.tpch(graft.TestSpark.spark, graft.TestSpark.sf),
        CypherParser.parse("MATCH (n:Nation) RETURN split(n.name, 'A', 'B') AS s"))
        .collect()
    }
  }

  test("transcendental scalars, zero-arg constants, and isEmpty parse and evaluate") {
    val spark = graft.TestSpark.spark
    val g = graft.graph.GraphLoader.tpch(spark, graft.TestSpark.sf)
    val row = graft.cypher.CypherPlanner.plan(g, CypherParser.parse(
      """MATCH (n:Nation) WHERE n.nationkey = 0
        |RETURN round(exp(1.0), 6) AS e1, round(pi(), 6) AS p,
        |  round(e(), 6) AS e2,
        |  round(atan2(1.0, 1.0), 6) AS a45,
        |  round(degrees(atan2(1.0, 1.0)), 6) AS d45,
        |  round(sin(pi()), 6) AS s0,
        |  round(log10(100.0), 6) AS l2,
        |  isEmpty(trim(' ')) AS emp, isEmpty(n.name) AS nemp,
        |  isEmpty([]) AS lemp""".stripMargin)).collect().head
    assert(row.getAs[Double]("e1") == row.getAs[Double]("e2"))
    assert(row.getAs[Double]("p") == 3.141593)
    assert(row.getAs[Double]("d45") == 45.0)
    assert(row.getAs[Double]("a45") == 0.785398)
    assert(row.getAs[Double]("s0") == 0.0)
    assert(row.getAs[Double]("l2") == 2.0)
    assert(row.getAs[Boolean]("emp") && !row.getAs[Boolean]("nemp")
      && row.getAs[Boolean]("lemp"))
    // zero-arg parens only for the constants; sqrt() with no arg fails
    intercept[Exception] {
      graft.cypher.CypherPlanner.plan(g, CypherParser.parse(
        "MATCH (n:Nation) RETURN sqrt() AS x")).collect()
    }
  }

  test("duration.between variants parse; unsupported units fail loudly") {
    import graft.cypher.Ast._
    val q = CypherParser.parse(
      "MATCH (e:Event) RETURN " +
        "duration.inSeconds.between(datetime('2024-01-01T00:00:00'), e.ts).seconds AS s, " +
        "duration.inDays.between(datetime('2024-01-01T00:00:00'), e.ts).days AS d")
    val items = q.returnClause.items
    assert(items.head.expr.isInstanceOf[FnCallN] &&
      items.head.expr.asInstanceOf[FnCallN].name == "@durbetween_s")
    assert(items(1).expr.asInstanceOf[FnCallN].name == "@durbetween_d")
    // the wrong component on a single-component duration is an error
    intercept[Exception] {
      CypherParser.parse("MATCH (e:Event) RETURN " +
        "duration.inSeconds.between(e.ts, e.ts).days AS x")
    }
    intercept[Exception] {
      CypherParser.parse("MATCH (e:Event) RETURN " +
        "duration.inMonths.between(e.ts, e.ts).months AS x")
    }
  }

  test("MERGE/CREATE clause parses into WriteRelClause") {
    import graft.cypher.Ast._
    val q = CypherParser.parse(
      "MATCH (a:Customer)-[:FROM_NATION]->(b:Nation) " +
        "MERGE (a)-[:X]->(b) RETURN count(*) AS n")
    assert(q.clauses.collect { case w: WriteRelClause => w } match {
      case Seq(WriteRelClause(chain, false, Nil, Nil)) =>
        chain.hops.head._1.relType.contains("X")
      case _ => false
    })
    // a multi-hop write pattern is rejected at parse time
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "MERGE (a)-[:X]->(b)-[:Y]->(c) RETURN count(*) AS n")
    }
  }

  test("CALL { } IN TRANSACTIONS parses; non-write bodies and missing imports reject") {
    import graft.cypher.Ast._
    val q = CypherParser.parse(
      "MATCH (a:Customer)-[:FROM_NATION]->(b:Nation) " +
        "CALL { WITH a, b MERGE (a)-[:X]->(b) } " +
        "IN TRANSACTIONS OF 250 ROWS ON ERROR CONTINUE REPORT STATUS AS s " +
        "RETURN s.transactionId AS t, count(*) AS n")
    q.clauses.collectFirst { case c: CallInTxClause => c } match {
      case Some(CallInTxClause(imports, body, cap, status, onError)) =>
        assert(imports == Seq("a", "b") && cap == 250 &&
          status.contains("s") && onError.contains("CONTINUE") &&
          body.forall(_.isInstanceOf[WriteRelClause]))
      case None => fail("no CallInTxClause parsed")
    }
    // OF … ROWS omitted → Neo4j's default 1000; REPORT STATUS optional
    val q2 = CypherParser.parse(
      "MATCH (a:Customer) CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS " +
        "RETURN count(*) AS n")
    assert(q2.clauses.collectFirst { case c: CallInTxClause => c }
      .exists(c => c.rowCap == 1000 && c.statusVar.isEmpty))
    // a reading clause in the body is rejected at parse time
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { WITH a MATCH (n:Nation) MERGE (a)-[:X]->(n) } IN TRANSACTIONS " +
        "RETURN count(*) AS n")
    }
    // no importing WITH: nothing keys the batches — rejected
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { MERGE (x:Y {id: 1}) } IN TRANSACTIONS RETURN count(*) AS n")
    }
    // zero row cap is rejected
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS OF 0 ROWS " +
        "RETURN count(*) AS n")
    }
    // ON ERROR BREAK / FAIL parse without REPORT STATUS
    assert(CypherParser.parse("MATCH (a:Customer) " +
      "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS ON ERROR BREAK " +
      "RETURN count(*) AS n")
      .clauses.collectFirst { case c: CallInTxClause => c }
      .exists(_.onError.contains("BREAK")))
    assert(CypherParser.parse("MATCH (a:Customer) " +
      "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS ON ERROR FAIL " +
      "RETURN count(*) AS n")
      .clauses.collectFirst { case c: CallInTxClause => c }
      .exists(_.onError.contains("FAIL")))
    // REPORT STATUS without ON ERROR CONTINUE/BREAK is a Neo4j syntax
    // error (the default ON ERROR FAIL cannot carry a status var)
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS " +
        "REPORT STATUS AS s RETURN count(*) AS n")
    }
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS ON ERROR FAIL " +
        "REPORT STATUS AS s RETURN count(*) AS n")
    }
    // an unknown ON ERROR mode rejects loudly
    intercept[Exception] {
      CypherParser.parse("MATCH (a:Customer) " +
        "CALL { WITH a SET a.flag = 1 } IN TRANSACTIONS ON ERROR RETRY " +
        "RETURN count(*) AS n")
    }
  }
}
