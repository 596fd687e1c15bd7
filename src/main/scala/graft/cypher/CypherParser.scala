package graft.cypher

import graft.cypher.Ast._

/** Hand-rolled recursive-descent parser for the Cypher subset
  * (grammar in [[Ast]]). Keywords are case-insensitive; string
  * literals use single quotes; property maps use `{k: v}`.
  */
object CypherParser {

  /** Upper bound substituted for open-ended var-length ranges (`*`,
    * `*2..`) — matches the planner's supported expansion cap.
    */
  val MaxVarHops = 10

  /** Parses a single (non-UNION) query — the common entry point. */
  def parse(input: String): CypherQuery = {
    val st = parseStatement(input)
    require(st.parts.size == 1, "UNION statement — use parseStatement")
    st.parts.head
  }

  /** Parses a full statement: `query (UNION [ALL] query)*`. */
  def parseStatement(input: String): CypherStatement =
    new P(tokenize(input)).statement()

  // ---- lexer ----------------------------------------------------------

  sealed trait Tok
  final case class TId(s: String) extends Tok       // identifier / keyword
  final case class TStr(s: String) extends Tok      // 'string'
  final case class TNum(s: String) extends Tok      // 123 or 1.5
  final case class TSym(s: String) extends Tok      // punctuation incl. -> <- <= >= <> ..

  private[cypher] def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = nextWhile(s, i, ch => ch.isLetterOrDigit || ch == '_')
        out += TId(s.substring(i, j)); i = j
      } else if (c.isDigit) {
        var j = nextWhile(s, i, _.isDigit)
        // a single '.' followed by a digit → float; ".." stays a range
        if (j < s.length && s.charAt(j) == '.' && j + 1 < s.length &&
            s.charAt(j + 1).isDigit)
          j = nextWhile(s, j + 1, _.isDigit)
        out += TNum(s.substring(i, j)); i = j
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < s.length && s.charAt(i) != '\'') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
          else { sb += s.charAt(i); i += 1 }
        }
        require(i < s.length, s"unterminated string literal in: $s")
        out += TStr(sb.toString); i += 1
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("->", "<-", "<=", ">=", "<>", "..", "=~", "+=").contains(two)) {
          out += TSym(two); i += 2
        } else { out += TSym(c.toString); i += 1 }
      }
    }
    out.result()
  }

  private def nextWhile(s: String, from: Int, p: Char => Boolean): Int = {
    var j = from
    while (j < s.length && p(s.charAt(j))) j += 1
    j
  }

  // ---- parser ---------------------------------------------------------

  private final class P(toks: Vector[Tok]) {
    private var pos = 0

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TId(s) => s.equalsIgnoreCase(kw)
      case _      => false
    }
    private def atKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    private def eatKw(kw: String): Unit = {
      require(atKw(kw), s"expected $kw at token $pos, got $peek")
      pos += 1
    }
    private def atSym(sym: String): Boolean = peek.contains(TSym(sym))
    private def eatSym(sym: String): Unit = {
      require(atSym(sym), s"expected '$sym' at token $pos, got $peek")
      pos += 1
    }
    private def ident(): String = next() match {
      case TId(s) => s
      case t      => throw new IllegalArgumentException(s"expected identifier, got $t")
    }

    def statement(): CypherStatement = {
      val parts = Seq.newBuilder[CypherQuery]
      parts += query()
      // UNION flavors must be uniform across the statement (Neo4j
      // rejects a mix, whose dedup semantics would be ambiguous)
      var all: Option[Boolean] = None
      while (atKw("UNION")) {
        eatKw("UNION")
        val thisAll = atKw("ALL")
        if (thisAll) eatKw("ALL")
        require(all.forall(_ == thisAll), "cannot mix UNION and UNION ALL")
        all = Some(thisAll)
        parts += query()
      }
      require(pos == toks.length, s"trailing tokens from position $pos: ${toks.drop(pos)}")
      CypherStatement(parts.result(), all.getOrElse(false))
    }

    def query(): CypherQuery = query(inCall = false)

    private def query(inCall: Boolean): CypherQuery = {
      val clauses = Seq.newBuilder[Clause]
      var sawReturn = false
      var sawAny = false
      // a CALL body may be RETURN-less (write-only IN TRANSACTIONS
      // bodies); the closing brace ends it — read-shaped RETURN-less
      // bodies still fail loudly at plan time ("must end in RETURN")
      while (!sawReturn && !(inCall && sawAny && atSym("}"))) {
        if (atKw("MATCH") || atKw("OPTIONAL")) {
          val opt = atKw("OPTIONAL")
          if (opt) eatKw("OPTIONAL")
          eatKw("MATCH")
          // path variable: `MATCH p = (a)-[...]->(b)`
          val pathVar = peek match {
            case Some(TId(_)) if pos + 1 < toks.length && toks(pos + 1) == TSym("=") =>
              val pv = ident(); eatSym("="); Some(pv)
            case _ => None
          }
          // GQL path selectors (Neo4j 5.2x / GQL, r15): `ANY SHORTEST
          // <path>`, `SHORTEST 1 <path>`, `ALL SHORTEST <path>` —
          // keyword sugar over the shortestPath/allShortestPaths
          // plans, no parenthesis wrapper. `SHORTEST k` with k > 1
          // (k-best enumeration) rejects loudly.
          var gqlShortest = false
          var gqlAllShortest = false
          var gqlKBest: Option[Int] = None
          def kwPair(a: String, b: String): Boolean =
            atKw(a) && pos + 1 < toks.length && isKw(toks(pos + 1), b)
          if (kwPair("ANY", "SHORTEST")) {
            eatKw("ANY"); eatKw("SHORTEST"); gqlShortest = true
          } else if (kwPair("ALL", "SHORTEST")) {
            eatKw("ALL"); eatKw("SHORTEST"); gqlAllShortest = true
          } else if (atKw("SHORTEST") && pos + 1 < toks.length &&
              toks(pos + 1).isInstanceOf[TNum]) {
            eatKw("SHORTEST")
            val k = longLit()
            // SHORTEST k with k > 1 (r16): GQL k-best — planned as the
            // capped trail enumeration + per-pair top-k window. The k
            // cap mirrors the MaxVarHops discipline: unbounded k would
            // silently turn the search into full enumeration.
            require(k >= 1 && k <= 16,
              s"SHORTEST $k: k must be between 1 and 16")
            gqlShortest = true
            if (k > 1) gqlKBest = Some(k.toInt)
          }
          // `shortestPath((a)-[:T*]->(b))` / `allShortestPaths(…)` —
          // lex as the identifier followed by '(' '(': the inner '('
          // opens the wrapped pattern's start node
          val parenAll = atKw("ALLSHORTESTPATHS")
          val parenShort = parenAll || atKw("SHORTESTPATH")
          if (parenAll) { eatKw("ALLSHORTESTPATHS"); eatSym("(") }
          else if (parenShort) { eatKw("SHORTESTPATH"); eatSym("(") }
          val allShortest = parenAll || gqlAllShortest
          val shortest = parenShort || gqlShortest || gqlAllShortest
          val chain0 = patternChain()
          // weighted spelling `shortestPath((a)-[:T*]->(b), 'prop')`
          // and (r17) `allShortestPaths((a)-[:T*]->(b), 'prop')`: the
          // optional second argument names the relationship cost
          // property (engine extension — core Cypher reaches weighted
          // paths via apoc/GDS dijkstra)
          val weightProp =
            if (parenShort && atSym(",")) {
              eatSym(",")
              next() match {
                case TStr(s) => Some(s)
                case t => throw new IllegalArgumentException(
                  s"shortestPath weight must be a string-literal property name, got $t")
              }
            } else None
          if (parenShort) eatSym(")")
          val chain = chain0.copy(pathVar = pathVar, shortest = shortest,
            allShortest = allShortest, weightProp = weightProp,
            kBest = gqlKBest)
          // inline pattern predicates conjoin with the clause WHERE —
          // for OPTIONAL MATCH both filter the optional side before
          // the left join (Neo4j's inline-WHERE scoping)
          val inlineW = drainInlineWheres()
          val where = andOpt(inlineW,
            if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None)
          // Cypher semantics: WHERE after OPTIONAL MATCH filters the
          // optional pattern before the left join; after a plain MATCH
          // it is an ordinary filter
          if (opt) clauses += MatchClause(chain, optional = true, where)
          else {
            clauses += MatchClause(chain, optional = false)
            where.foreach(clauses += FilterClause(_))
          }
        } else if (atWriteClause) {
          clauses ++= writeClauses()
        } else if (atKw("UNWIND")) {
          eatKw("UNWIND")
          val list = valueExpr()
          eatKw("AS")
          clauses += UnwindClause(list, ident())
        } else if (atKw("WITH")) {
          eatKw("WITH")
          val (distinct, items) = projectionItems()
          // lenient extension: WHERE directly after the items filters
          // BEFORE the modifiers (the HAVING-style spelling)
          val where = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
          val (sorts, skip, limit) = tailModifiers()
          clauses += WithClause(distinct, items, where, sorts, skip, limit)
          // openCypher grammar position: WHERE after ORDER BY/SKIP/
          // LIMIT filters the modifier-applied rows — an immediate
          // FilterClause gives exactly that post-horizon semantics
          if (atKw("WHERE")) { eatKw("WHERE"); clauses += FilterClause(expr()) }
        } else if (atKw("CALL") && pos + 1 < toks.length &&
            isKw(toks(pos + 1), "db")) {
          // catalog procedures: CALL db.labels() / db.relationshipTypes()
          eatKw("CALL"); eatKw("db"); eatSym(".")
          val proc0 = ident()
          // dotted procedure names: db.schema.nodeTypeProperties()
          val proc =
            if (atSym(".")) { eatSym("."); s"$proc0.${ident()}" } else proc0
          eatSym("("); eatSym(")")
          val kind = proc.toLowerCase(java.util.Locale.ROOT) match {
            case "labels"            => "labels"
            case "relationshiptypes" => "relationshipTypes"
            case "propertykeys"      => "propertyKeys"
            case "schema.nodetypeproperties" => "nodeTypeProperties"
            case "schema.reltypeproperties"  => "relTypeProperties"
            case other => throw new IllegalArgumentException(
              s"unsupported procedure db.$other " +
                "(db.labels | db.relationshipTypes | db.propertyKeys | " +
                "db.schema.nodeTypeProperties | " +
                "db.schema.relTypeProperties)")
          }
          clauses += CatalogCallClause(kind)
          // optional `YIELD col [AS alias] (, col [AS alias])*` (Neo4j
          // clients always emit it): each yielded name must be one of
          // the procedure's own columns; the YIELD list re-projects
          // through a WITH horizon
          if (atKw("YIELD")) {
            eatKw("YIELD")
            val expected: Set[String] = kind match {
              case "labels"       => Set("label")
              case "propertyKeys" => Set("propertyKey")
              case "nodeTypeProperties" =>
                Set("nodeType", "nodeLabels", "propertyName",
                  "propertyTypes", "mandatory")
              case "relTypeProperties" =>
                Set("relType", "propertyName", "propertyTypes",
                  "mandatory")
              case _              => Set("relationshipType")
            }
            val items = Seq.newBuilder[ReturnItem]
            def one(): Unit = {
              val y = ident()
              require(expected(y),
                s"db.$proc yields ${expected.mkString(", ")}; got '$y'")
              val alias =
                if (atKw("AS")) { eatKw("AS"); Some(ident()) } else None
              items += ReturnItem(Ident(y), alias)
            }
            one()
            while (atSym(",")) { eatSym(","); one() }
            clauses += WithClause(distinct = false, items.result(),
              None, Nil, None, None)
          }
        } else if (atKw("CALL")) {
          eatKw("CALL")
          // Neo4j-5.23 SCOPED subquery form `CALL (n, m) { … }` /
          // `CALL (*) { … }` / `CALL () { … }` — the GQL spelling of
          // the importing WITH ('*' imports every bound variable,
          // resolved at plan time). A scoped CALL must not also open
          // with an importing WITH (Neo4j's rule); its body may still
          // start with an ordinary projecting WITH.
          val scoped: Option[Seq[String]] =
            if (!atSym("(")) None
            else {
              eatSym("(")
              val b = Seq.newBuilder[String]
              if (atSym("*")) { eatSym("*"); b += "*" }
              else if (!atSym(")")) {
                b += ident()
                while (atSym(",")) { eatSym(","); b += ident() }
              }
              eatSym(")")
              Some(b.result())
            }
          eatSym("{")
          // importing WITH: a leading WITH whose items are ONLY bare
          // identifiers (lookahead distinguishes it from a projecting
          // WITH, which the subquery body may still open with)
          val imports = scoped match {
            case Some(sc) => sc
            case None =>
              if (atKw("WITH") && importListAhead()) {
                eatKw("WITH")
                val b = Seq.newBuilder[String]
                b += ident()
                while (atSym(",")) { eatSym(","); b += ident() }
                b.result()
              } else Seq.empty
          }
          val inner = query(inCall = true)
          eatSym("}")
          if (atKw("IN")) {
            // `IN TRANSACTIONS [OF n ROWS] [ON ERROR …] [REPORT
            // STATUS AS var]` — the batched-write subquery form.
            // ENGINE DIVERGENCE (documented in SURVEY §6): Neo4j
            // permits reading clauses (MATCH/MERGE) inside an
            // IN TRANSACTIONS body; this engine restricts the body to
            // pure update clauses because its set-based write algebra
            // plans the whole body over the full driving frame — an
            // inner read that observed earlier batches' writes would
            // silently diverge from Neo4j's sequential-batch
            // semantics, so the shape rejects loudly instead.
            eatKw("IN"); eatKw("TRANSACTIONS")
            val cap =
              if (atKw("OF")) {
                eatKw("OF"); val n = longLit(); eatKw("ROWS")
                require(n >= 1 && n <= Int.MaxValue,
                  s"IN TRANSACTIONS OF $n ROWS: the row cap must be a positive int")
                n.toInt
              } else 1000 // Neo4j's default batch size
            // `ON ERROR CONTINUE | BREAK | FAIL` — Neo4j's per-batch
            // error policy. The engine's set-based writes cannot fail
            // per-batch (no partial commits exist to skip or halt at),
            // so all three plan identically; parsing them matters
            // because Neo4j REQUIRES one of CONTINUE/BREAK alongside
            // REPORT STATUS (REPORT STATUS under the default ON ERROR
            // FAIL is a client-side syntax error), and matching that
            // validation keeps query portability honest.
            val onError =
              if (atKw("ON")) {
                eatKw("ON"); eatKw("ERROR")
                val mode = ident().toUpperCase
                require(Set("CONTINUE", "BREAK", "FAIL")(mode),
                  s"ON ERROR $mode: expected CONTINUE, BREAK or FAIL")
                Some(mode)
              } else None
            val status =
              if (atKw("REPORT")) {
                eatKw("REPORT"); eatKw("STATUS"); eatKw("AS"); Some(ident())
              } else None
            require(status.isEmpty ||
                onError.exists(m => m == "CONTINUE" || m == "BREAK"),
              "REPORT STATUS AS requires ON ERROR CONTINUE or ON ERROR " +
                "BREAK (Neo4j rejects REPORT STATUS under the default " +
                "ON ERROR FAIL)")
            require(imports != Seq("*"),
              "CALL (*) { … } IN TRANSACTIONS is not supported — name " +
                "the imports (the first import's node id keys the " +
                "transaction batches)")
            require(imports.nonEmpty,
              "CALL { … } IN TRANSACTIONS requires an importing WITH " +
                "(the first import's node id keys the transaction batches)")
            val bad = inner.clauses.collectFirst {
              case c if !c.isInstanceOf[WriteRelClause] &&
                !c.isInstanceOf[CreateNodeClause] &&
                !c.isInstanceOf[DeleteRelClause] &&
                !c.isInstanceOf[DetachDeleteClause] &&
                !c.isInstanceOf[SetPropClause] &&
                !c.isInstanceOf[SetMapClause] &&
                !c.isInstanceOf[SetLabelClause] &&
                !c.isInstanceOf[RemovePropClause] &&
                !c.isInstanceOf[ForeachClause] => c
            }
            require(bad.isEmpty,
              s"CALL { … } IN TRANSACTIONS body must contain only update " +
                s"clauses, got ${bad.get.getClass.getSimpleName}")
            clauses += CallInTxClause(imports, inner.clauses, cap, status, onError)
          } else clauses += CallClause(imports, inner.clauses)
        } else if (atKw("RETURN")) {
          eatKw("RETURN")
          val (distinct, items) = projectionItems()
          val (sorts, skip, limit) = tailModifiers()
          clauses += ReturnClause(distinct, items, sorts, skip, limit)
          sawReturn = true
        } else throw new IllegalArgumentException(
          s"expected MATCH/OPTIONAL MATCH/WITH/UNWIND/CALL/MERGE/CREATE/RETURN at token $pos, got $peek")
        sawAny = true
      }
      require(sawAny, "empty query")
      if (inCall) {
        // the closing brace hands control back to the CALL site
        require(atSym("}"),
          s"expected }} closing the CALL subquery at token $pos, got $peek")
      } else
        // a UNION boundary hands control back to statement(), which owns
        // the end-of-input check across all parts
        require(pos == toks.length || atKw("UNION"),
          s"trailing tokens from position $pos: ${toks.drop(pos)}")
      CypherQuery(clauses.result())
    }

    /** True at the head of any update clause — the clause family
      * FOREACH bodies are restricted to.
      */
    private def atWriteClause: Boolean =
      atKw("DELETE") || atKw("DETACH") || atKw("REMOVE") || atKw("SET") ||
        atKw("MERGE") || atKw("CREATE") || atKw("FOREACH")

    /** Parses one update clause head (DELETE / DETACH DELETE / REMOVE
      * / SET / MERGE / CREATE / FOREACH) into its clauses — shared by
      * the top-level pipeline and FOREACH bodies. A SET list may mix
      * the three item forms (`v.prop = e`, `v += {map}`, `v:Label`),
      * each emitting its own clause.
      */
    private def writeClauses(): Seq[Clause] = {
      val clauses = Seq.newBuilder[Clause]
      if (atKw("DELETE") || atKw("DETACH")) {
        val detach = atKw("DETACH")
        if (detach) { eatKw("DETACH"); eatKw("DELETE") } else eatKw("DELETE")
        val vs = Seq.newBuilder[String]
        vs += ident()
        while (atSym(",")) { eatSym(","); vs += ident() }
        clauses +=
          (if (detach) DetachDeleteClause(vs.result())
           else DeleteRelClause(vs.result()))
      } else if (atKw("REMOVE")) {
        eatKw("REMOVE")
        val ts = Seq.newBuilder[(String, String)]
        def one(): Unit = {
          val v = ident(); eatSym("."); ts += ((v, ident()))
        }
        one()
        while (atSym(",")) { eatSym(","); one() }
        clauses += RemovePropClause(ts.result())
      } else if (atKw("SET")) {
        eatKw("SET")
        // adjacent same-form items coalesce into one clause (the
        // planner applies a comma list atomically); form changes cut
        // a clause boundary, preserving left-to-right order
        val props = Seq.newBuilder[(String, String, CExpr)]
        def flushProps(): Unit = {
          val ps = props.result()
          if (ps.nonEmpty) { clauses += SetPropClause(ps); props.clear() }
        }
        def one(): Unit = {
          val v = ident()
          if (atSym(".")) {
            eatSym(".")
            val p = ident(); eatSym("=")
            props += ((v, p, addExpr()))
          } else if (atSym("+=")) {
            eatSym("+="); eatSym("{")
            val entries = Seq.newBuilder[(String, CExpr)]
            def entry(): Unit = {
              val k = ident(); eatSym(":"); entries += ((k, addExpr()))
            }
            entry()
            while (atSym(",")) { eatSym(","); entry() }
            eatSym("}")
            flushProps()
            clauses += SetMapClause(v, entries.result())
          } else {
            eatSym(":")
            flushProps()
            clauses += SetLabelClause(v, ident())
          }
        }
        one()
        while (atSym(",")) { eatSym(","); one() }
        flushProps()
      } else if (atKw("FOREACH")) {
        eatKw("FOREACH"); eatSym("(")
        val x = ident()
        eatKw("IN")
        val list = valueExpr()
        eatSym("|")
        val body = Seq.newBuilder[Clause]
        require(atWriteClause,
          "FOREACH body must contain at least one update clause")
        while (atWriteClause) body ++= writeClauses()
        eatSym(")")
        clauses += ForeachClause(x, list, body.result())
      } else {
        val create = atKw("CREATE")
        if (create) eatKw("CREATE") else eatKw("MERGE")
        if (writePatternIsRel) {
          val chain = patternChain()
          require(inlineWheres.isEmpty,
            "inline pattern WHERE is not allowed in MERGE/CREATE " +
              "patterns (Neo4j rule) — filter with a preceding MATCH")
          require(chain.hops.size == 1,
            "MERGE/CREATE supports exactly one relationship pattern " +
              "between two bound node variables")
          val (onCreate, onMatch) =
            onSetBlocks(chain.hops.head._1.variable, create)
          clauses += WriteRelClause(chain, create, onCreate, onMatch)
        } else {
          // node write: `(x:Label {k: expr, …})` — property values
          // are full expressions, unlike pattern maps (literals)
          eatSym("(")
          val v = peek match {
            case Some(TId(_)) => Some(ident())
            case _            => None
          }
          eatSym(":")
          val label = ident()
          val props = Seq.newBuilder[(String, CExpr)]
          if (atSym("{")) {
            eatSym("{")
            def one(): Unit = {
              val k = ident(); eatSym(":"); props += ((k, addExpr()))
            }
            one()
            while (atSym(",")) { eatSym(","); one() }
            eatSym("}")
          }
          eatSym(")")
          val (onCreate, onMatch) = onSetBlocks(v, create)
          clauses += CreateNodeClause(v, label, props.result(),
            merge = !create, onCreate = onCreate, onMatch = onMatch)
        }
      }
      clauses.result()
    }

    /** ON CREATE SET / ON MATCH SET conditional assignments after a
      * MERGE pattern (node or relationship), in either order, each a
      * comma list of `var.prop = expr` where `var` must be the merged
      * variable (`target`). Returns (onCreate, onMatch).
      */
    private def onSetBlocks(target: Option[String],
        create: Boolean): (Seq[(String, CExpr)], Seq[(String, CExpr)]) = {
      var onCreate = Seq.empty[(String, CExpr)]
      var onMatch = Seq.empty[(String, CExpr)]
      while (atKw("ON")) {
        eatKw("ON")
        val isCreate = atKw("CREATE")
        if (isCreate) eatKw("CREATE") else eatKw("MATCH")
        eatKw("SET")
        require(!create,
          "ON CREATE/ON MATCH SET requires MERGE, not CREATE")
        val as = Seq.newBuilder[(String, CExpr)]
        def assign(): Unit = {
          val av = ident(); eatSym(".")
          val p = ident(); eatSym("=")
          require(target.contains(av),
            s"ON ${if (isCreate) "CREATE" else "MATCH"} SET targets " +
              s"'$av' — only the merged variable ${target.getOrElse("?")} " +
              "is assignable here")
          as += ((p, addExpr()))
        }
        assign()
        while (atSym(",")) { eatSym(","); assign() }
        if (isCreate) onCreate ++= as.result() else onMatch ++= as.result()
      }
      (onCreate, onMatch)
    }

    /** Lookahead after MERGE/CREATE: true iff the parenthesized node
      * group is followed by a relationship arrow (`-` / `<-`), i.e.
      * the write is a relationship pattern, not a node create.
      */
    private def writePatternIsRel: Boolean = {
      var i = pos
      var depth = 0
      while (i < toks.length) {
        toks(i) match {
          case TSym("(") => depth += 1
          case TSym(")") =>
            depth -= 1
            if (depth == 0)
              return i + 1 < toks.length &&
                (toks(i + 1) == TSym("-") || toks(i + 1) == TSym("<-"))
          case _ => ()
        }
        i += 1
      }
      false
    }

    /** Lookahead from a WITH directly after `CALL {`: true iff the
      * items are bare identifiers followed by another clause keyword —
      * the importing-WITH form.
      */
    private def importListAhead(): Boolean = {
      var p = pos + 1 // past WITH
      var ok = true
      var expectId = true
      var done = false
      // write-clause keywords follow an importing WITH too — the
      // IN TRANSACTIONS body form is `WITH o MERGE …` / `WITH o SET …`
      val followKws = Set("MATCH", "OPTIONAL", "UNWIND", "WITH", "RETURN",
        "CALL", "MERGE", "CREATE", "SET", "DELETE", "DETACH", "REMOVE",
        "FOREACH")
      while (!done && ok && p < toks.length) {
        toks(p) match {
          case TId(s) if expectId && !followKws.contains(s.toUpperCase) =>
            expectId = false; p += 1
          case TSym(",") if !expectId => expectId = true; p += 1
          case TId(s) if !expectId && followKws.contains(s.toUpperCase) =>
            done = true
          case _ => ok = false
        }
      }
      ok && done
    }

    private def projectionItems(): (Boolean, Seq[ReturnItem]) = {
      val distinct = atKw("DISTINCT")
      if (distinct) eatKw("DISTINCT")
      val items = Seq.newBuilder[ReturnItem]
      // `RETURN *` / `WITH *` (optionally `*, more items`): the star
      // is a planner-expanded placeholder for every bound variable
      if (atSym("*")) { eatSym("*"); items += ReturnItem(Ident("*"), None) }
      else items += returnItem()
      while (atSym(",")) { eatSym(","); items += returnItem() }
      (distinct, items.result())
    }

    private def tailModifiers(): (Seq[SortItem], Option[Long], Option[Long]) = {
      val sorts = Seq.newBuilder[SortItem]
      if (atKw("ORDER")) {
        eatKw("ORDER"); eatKw("BY")
        sorts += sortItem()
        while (atSym(",")) { eatSym(","); sorts += sortItem() }
      }
      val skip = if (atKw("SKIP")) { eatKw("SKIP"); Some(longLit()) } else None
      val limit = if (atKw("LIMIT")) { eatKw("LIMIT"); Some(longLit()) } else None
      (sorts.result(), skip, limit)
    }

    private def longLit(): Long = next() match {
      case TNum(n) => n.toLong
      case t       => throw new IllegalArgumentException(s"expected number, got $t")
    }

    /** Neo4j-5 inline pattern predicates — `(n:L WHERE n.p > 1)` /
      * `-[r:T WHERE r.q = 2]->` — collected here while the enclosing
      * pattern parses, then drained into the owning context's WHERE
      * (MATCH / OPTIONAL MATCH / EXISTS / COUNT / COLLECT / pattern
      * comprehension). Hoisting is semantics-preserving: the inline
      * predicate filters that element's bindings, which for inner
      * joins commutes with the post-match filter, and OPTIONAL
      * MATCH's attached WHERE already filters before the left join.
      */
    private val inlineWheres = scala.collection.mutable.Buffer[CExpr]()
    private def drainInlineWheres(): Option[CExpr] =
      if (inlineWheres.isEmpty) None
      else {
        val w = inlineWheres.reduceLeft[CExpr](And(_, _))
        inlineWheres.clear()
        Some(w)
      }
    /** Drain only entries buffered at index >= `mark` — the frame a
      * nested parse (subquery expression, pattern predicate, pattern
      * comprehension) opened — leaving predicates buffered by EARLIER
      * elements of the enclosing pattern for that pattern's own
      * drain. Whole-buffer drains inside a nested parse would pull
      * the enclosing frame's predicates into the wrong scope.
      */
    private def drainInlineWheresFrom(mark: Int): Option[CExpr] =
      if (inlineWheres.size <= mark) None
      else {
        val w = inlineWheres.drop(mark).reduceLeft[CExpr](And(_, _))
        inlineWheres.remove(mark, inlineWheres.size - mark)
        Some(w)
      }
    /** Discard entries at index >= `mark` (a backtracked or
      * fallback-replaced nested parse), restoring the enclosing
      * frame's prefix untouched.
      */
    private def resetInlineWheres(mark: Int): Unit =
      if (inlineWheres.size > mark)
        inlineWheres.remove(mark, inlineWheres.size - mark)
    /** Run a nested full-body subquery parse against an EMPTY
      * inline-WHERE buffer, restoring the enclosing frame's entries
      * afterwards. The body's own MATCH clauses drain the buffer
      * wholesale ([[drainInlineWheres]]) and its MERGE validation
      * requires it empty — with the enclosing pattern's predicates
      * still buffered they would be silently pulled into the
      * subquery's scope (or trip the MERGE require).
      */
    private def withFreshInlineFrame[A](body: => A): A = {
      val saved = inlineWheres.toList
      inlineWheres.clear()
      try body
      finally {
        inlineWheres.clear()
        inlineWheres ++= saved
      }
    }
    private def andOpt(a: Option[CExpr], b: Option[CExpr]): Option[CExpr] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(And(x, y))
        case _                  => a.orElse(b)
      }

    private def patternChain(): PatternChain = {
      val start = nodePattern()
      val hops = Seq.newBuilder[(RelPattern, NodePattern)]
      while (atSym("-") || atSym("<-") || atGroupStart) {
        if (atGroupStart) hops += ((quantifiedGroupRel(), nodePattern()))
        else {
          val rel = relPattern()
          hops += ((rel, nodePattern()))
        }
      }
      PatternChain(start, hops.result())
    }

    /** `(` directly followed by `(` can only open a parenthesized
      * path-pattern group — a node pattern's body never starts with
      * another paren.
      */
    private def atGroupStart: Boolean =
      atSym("(") && pos + 1 < toks.length && toks(pos + 1) == TSym("(")

    /** Parenthesized quantified path pattern — the full GQL form
      * `(s) ((a:L {p: v})-[:T]->(b:M)){n,m} (t)`: the group's single
      * hop repeats n..m times between the juncture nodes, exactly the
      * `*n..m` plan. Named inner nodes are GQL GROUP VARIABLES — each
      * binds a per-step node list over the group's repetitions
      * (derived from the var-expand walk the plan already carries).
      * Inner labels/properties constrain EVERY repetition — carried
      * as [[RelPattern.stepFilters]] and planned as an edge-endpoint
      * semi-join pre-filter.
      */
    private def quantifiedGroupRel(): RelPattern = {
      eatSym("(")
      val mark = inlineWheres.size
      val inner = patternChain()
      // inner-element inline WHERE would hoist OUT of the repetition
      // scope (the inner names bind per-step, not per-row) — point at
      // the group-level form instead of mis-scoping silently
      require(inlineWheres.size == mark,
        "inline WHERE on a quantified group's inner elements is not " +
          "supported — use the group-level WHERE " +
          "`((a)-[:T]->(b) WHERE …){n,m}`")
      // GQL inline per-step WHERE: `((a)-[r:T]->(b) WHERE a.p < b.p)`
      val stepWhere =
        if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
      eatSym(")")
      val q = pathQuantifier().getOrElse(throw new IllegalArgumentException(
        "a parenthesized path pattern must carry a {n,m} quantifier"))
      inner.hops.foreach { case (r, _) =>
        require(r.varLength.isEmpty,
          "cannot quantify an already var-length relationship")
      }
      if (inner.hops.size == 1) {
        val (rel, endNode) = inner.hops.head
        val groupVars = (inner.start.variable, endNode.variable) match {
          case (None, None) => None
          case gv            => Some(gv)
        }
        val constrained = Seq(inner.start, endNode).exists(n =>
          n.label.isDefined || n.props.nonEmpty || n.moreLabels.nonEmpty)
        rel.copy(varLength = Some(q), groupNodes = groupVars,
          stepFilters = if (constrained) Some((inner.start, endNode)) else None,
          stepWhere = stepWhere)
      } else {
        // multi-hop group: the whole inner chain repeats as a unit —
        // composed into a composite edge frame by the planner (a fold
        // over the h inner hops, no per-h machinery); an inline WHERE
        // filters whole repetitions there (r14). The only cap is the
        // shared quantifier one — GQL imposes no inner-chain limit.
        require(inner.hops.size <= MaxVarHops,
          s"quantified path group inner chains support at most " +
            s"$MaxVarHops hops (the shared var-length cap)")
        // named inner relationships bind per-repetition payload lists
        // (GQL group variables for relationships) — planned by the
        // composite expansion alongside the node group variables
        RelPattern(variable = None,
          relType = inner.hops.head._1.relType,
          direction = Out, varLength = Some(q),
          groupChain = Some(inner), stepWhere = stepWhere)
      }
    }

    /** The `{n,m}` / `{n}` / `{n,}` / `{,m}` quantifier body; None
      * when the cursor is not on `{`. Shared by the postfix
      * relationship quantifier and the parenthesized group form.
      */
    private def pathQuantifier(): Option[(Int, Int)] =
      // GQL `+` (one-or-more) / `*` (zero-or-more) postfix
      // quantifiers — `-[:T]->+`, `((a)-[:T]->(b))*` (r15); bounded
      // by the shared var-length cap like the open {n,} forms
      if (atSym("+")) { eatSym("+"); Some((1, MaxVarHops)) }
      else if (atSym("*")) { eatSym("*"); Some((0, MaxVarHops)) }
      else if (!atSym("{")) None
      else {
        eatSym("{")
        val lo = peek match {
          case Some(TNum(_)) => Some(longLit().toInt)
          case _             => None
        }
        val hasComma = atSym(",")
        if (hasComma) eatSym(",")
        val hi = peek match {
          case Some(TNum(_)) => Some(longLit().toInt)
          case _             => None
        }
        eatSym("}")
        val r = (lo, hasComma, hi) match {
          case (Some(l), false, _)      => (l, l)          // {2}
          case (Some(l), true, Some(h)) => (l, h)          // {1,3}
          case (Some(l), true, None)    => (l, MaxVarHops) // {2,}
          // {,m} means 0..m in GQL/Neo4j — the zero-length path
          // (start = end, no edges traversed) is included, planned as
          // the k=0 union branch of the var-expand
          case (None, true, Some(h))    => (0, h)          // {,3}
          case _ => throw new IllegalArgumentException(
            "empty path quantifier {}")
        }
        require(r._2 >= r._1, s"path quantifier {${r._1},${r._2}}: " +
          "upper bound below lower bound")
        Some(r)
      }

    private def nodePattern(): NodePattern = {
      eatSym("(")
      val variable = peek match {
        case Some(TId(_)) => Some(ident())
        case _            => None
      }
      // Neo4j-5 label expressions (r15): `:A|B` any-of, `:A:B`/`:A&B`
      // all-of, `:!A` negated terms, `:%` wildcard (any label — every
      // node here is labeled, so it desugars to the label-less scan).
      // Mixing `|` with conjunction forms rejects, per Neo4j.
      val pos0 = Seq.newBuilder[String]
      val negs = Seq.newBuilder[String]
      var sawAmp = false
      var sawWild = false
      def labelTerm(): Unit =
        if (atSym("%")) { eatSym("%"); sawWild = true }
        else if (atSym("!")) { eatSym("!"); negs += ident() }
        else pos0 += ident()
      val hasLabel = atSym(":")
      if (hasLabel) { eatSym(":"); labelTerm() }
      while (hasLabel && atSym("&")) { sawAmp = true; eatSym("&"); labelTerm() }
      val posList = pos0.result()
      val negList = negs.result()
      val label = posList.headOption
      // label disjunction `(n:A|B)` — nodes carrying ANY alternative
      val alts = Seq.newBuilder[String]
      while (label.isDefined && atSym("|")) { eatSym("|"); alts += ident() }
      val altLabels = alts.result()
      // multi-label conjunction `(n:A:B)` — nodes carrying EVERY label
      val more = Seq.newBuilder[String]
      while (label.isDefined && atSym(":")) { eatSym(":"); more += ident() }
      more ++= posList.drop(1)
      require(altLabels.isEmpty ||
          (more.result().isEmpty && negList.isEmpty && !sawAmp && !sawWild),
        "label expressions cannot mix `|` (any-of) with conjunction " +
          "forms (`:`/`&`/`!`/`%`) in one pattern")
      val props =
        if (atSym("{")) {
          eatSym("{")
          val m = Map.newBuilder[String, Any]
          m += (ident() -> { eatSymThen(":"); literal() })
          while (atSym(",")) { eatSym(","); m += (ident() -> { eatSymThen(":"); literal() }) }
          eatSym("}")
          m.result()
        } else Map.empty[String, Any]
      // inline node predicate `(n:L WHERE n.p > 1)` (Neo4j 5) —
      // hoisted to the owning context's WHERE via inlineWheres
      if (atKw("WHERE")) { eatKw("WHERE"); inlineWheres += expr() }
      eatSym(")")
      NodePattern(variable, label, props, more.result(), altLabels, negList)
    }

    private def eatSymThen(sym: String): Unit = eatSym(sym)

    private def relPattern(): RelPattern = {
      val direction =
        if (atSym("<-")) { eatSym("<-"); In }
        else { eatSym("-"); Out } // provisional: Out confirmed by trailing '->'
      // bare arrows (`-->`, `<--`, `--`): anonymous type-less
      // relationship with no bracket body
      if (!atSym("[")) {
        direction match {
          case In =>
            eatSym("-")
            return RelPattern(None, None, In, None)
          case _ =>
            if (atSym("->")) { eatSym("->"); return RelPattern(None, None, Out, None) }
            eatSym("-")
            return RelPattern(None, None, Both, None)
        }
      }
      eatSym("[")
      val variable = peek match {
        case Some(TId(_)) => Some(ident())
        case _            => None
      }
      // type expression: positive `:A` (with `|` alternatives), or
      // NEGATED `:!A` / `:!A|!B` (r15 — any type except the listed;
      // a relationship carries exactly one type, so negation is set
      // difference on the typeless union). Mixing rejects loudly.
      val negTypes = Seq.newBuilder[String]
      val relType =
        if (!atSym(":")) None
        else {
          eatSym(":")
          if (atSym("!")) {
            eatSym("!")
            negTypes += ident()
            while (atSym("|")) {
              eatSym("|")
              if (atSym(":")) eatSym(":")
              require(atSym("!"),
                "cannot mix negated and positive relationship types " +
                  "in one pattern")
              eatSym("!")
              negTypes += ident()
            }
            None
          } else Some(ident())
        }
      // multi-type alternatives `:A|B` (also `:A|:B`)
      val altTypes = Seq.newBuilder[String]
      if (relType.isDefined)
        while (atSym("|")) {
          eatSym("|")
          if (atSym(":")) eatSym(":")
          require(!atSym("!"),
            "cannot mix negated and positive relationship types " +
              "in one pattern")
          altTypes += ident()
        }
      val alts = altTypes.result()
      val negs = negTypes.result()
      // all Cypher range spellings: *  *2  *1..3  *..3  *2..
      // (missing lower bound → 1; missing upper bound → the planner's
      // supported cap; bare number → exactly that many hops)
      val varLength =
        if (atSym("*")) {
          eatSym("*")
          val lo = peek match {
            case Some(TNum(_)) => Some(longLit().toInt)
            case _             => None
          }
          val hasRange = atSym("..")
          if (hasRange) eatSym("..")
          val hi = peek match {
            case Some(TNum(_)) if hasRange => Some(longLit().toInt)
            case _                         => None
          }
          (lo, hasRange, hi) match {
            case (Some(l), false, _)      => Some((l, l))          // *2
            case (Some(l), true, Some(h)) => Some((l, h))          // *1..3
            case (Some(l), true, None)    => Some((l, MaxVarHops)) // *2..
            case (None, true, Some(h))    => Some((1, h))          // *..3
            case (None, true, None)       => Some((1, MaxVarHops)) // *..
            case (None, false, _)         => Some((1, MaxVarHops)) // *
          }
        } else None
      val props =
        if (atSym("{")) {
          eatSym("{")
          val m = Map.newBuilder[String, Any]
          m += (ident() -> { eatSym(":"); literal() })
          while (atSym(",")) { eatSym(","); m += (ident() -> { eatSym(":"); literal() }) }
          eatSym("}")
          m.result()
        } else Map.empty[String, Any]
      // inline relationship predicate `-[r:T WHERE r.q > 5]->`
      // (Neo4j 5; fixed-length hops only, per Neo4j's own rule)
      val relWhere =
        if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
      eatSym("]")
      // GQL-style postfix quantifier `-[:T]->{n,m}` (also {n}, {n,},
      // {,m}) — the Neo4j-5 spelling of the *n..m range; parsed after
      // the closing arrow, where `{` is unambiguous (a node pattern
      // always opens with `(`). Combining both spellings is rejected.
      def quantified(base: Option[(Int, Int)]): Option[(Int, Int)] =
        pathQuantifier() match {
          case None => base
          case q =>
            if (base.isDefined) throw new IllegalArgumentException(
              "cannot combine a *range with a {n,m} path quantifier")
            q
        }
      // the inline predicate hoists only off FIXED-length hops —
      // Neo4j itself rejects it on var-length/quantified patterns
      // (the per-step form is the quantified group's WHERE)
      def withWhere(vl: Option[(Int, Int)]): Option[(Int, Int)] = {
        relWhere.foreach { w =>
          require(vl.isEmpty,
            "relationship pattern predicates are not supported on " +
              "variable-length or quantified relationships (Neo4j " +
              "rule) — use a quantified group " +
              "`((a)-[r:T]->(b) WHERE …){n,m}`")
          inlineWheres += w
        }
        vl
      }
      direction match {
        case In =>
          eatSym("-")
          RelPattern(variable, relType, In, withWhere(quantified(varLength)),
            props, alts, negTypes = negs)
        case _ =>
          if (atSym("->")) {
            eatSym("->")
            RelPattern(variable, relType, Out,
              withWhere(quantified(varLength)), props, alts,
              negTypes = negs)
          } else if (atSym("-")) {
            eatSym("-")
            RelPattern(variable, relType, Both,
              withWhere(quantified(varLength)), props, alts,
              negTypes = negs)
          } else throw new IllegalArgumentException(
            "expected -> or - to close the relationship pattern")
      }
    }

    private def returnItem(): ReturnItem = {
      val e = addExpr()
      val alias = if (atKw("AS")) { eatKw("AS"); Some(ident()) } else None
      ReturnItem(e, alias)
    }

    private def sortItem(): SortItem = {
      val e = addExpr()
      val asc =
        if (atKw("DESC")) { eatKw("DESC"); false }
        else { if (atKw("ASC")) eatKw("ASC"); true }
      SortItem(e, asc)
    }

    // expr with OR < AND < NOT < comparison precedence
    private def expr(): CExpr = {
      var l = andExpr()
      while (atKw("OR")) { eatKw("OR"); l = Or(l, andExpr()) }
      l
    }
    private def andExpr(): CExpr = {
      var l = notExpr()
      while (atKw("AND")) { eatKw("AND"); l = And(l, notExpr()) }
      l
    }
    private def notExpr(): CExpr =
      if (atKw("NOT")) { eatKw("NOT"); Not(notExpr()) }
      else if (atKw("EXISTS")) {
        eatKw("EXISTS")
        eatSym("{")
        // single-pattern form first: optional MATCH keyword, one
        // pattern, optional inner WHERE, then the closing brace. A
        // body that continues past that (WITH horizons, further
        // MATCHes, a RETURN) backtracks into the FULL-subquery form
        // (r15) — a whole clause pipeline, planned per outer binding.
        val save = pos
        val mark = inlineWheres.size
        val simple: Option[CExpr] =
          try {
            if (atKw("MATCH")) eatKw("MATCH")
            val chain = patternChain()
            val inW = drainInlineWheresFrom(mark)
            val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
            if (atSym("}")) { eatSym("}"); Some(ExistsPattern(chain, andOpt(inW, w))) }
            else None
          } catch {
            case scala.util.control.NonFatal(_) => None
          }
        simple.getOrElse {
          pos = save
          resetInlineWheres(mark) // drop only this frame's buffered entries
          val body = withFreshInlineFrame(query(inCall = true).clauses)
          eatSym("}")
          ExistsSubquery(body)
        }
      } else if (atSym("(")) {
        // bare pattern predicate — `WHERE (a)-[:T]->(b)` — is EXISTS
        // sugar. Try a pattern parse; a parenthesized value expression
        // (no hops, or not pattern-shaped at all) backtracks cleanly.
        val save = pos
        val mark = inlineWheres.size
        try {
          val chain = patternChain()
          if (chain.hops.nonEmpty) ExistsPattern(chain, drainInlineWheresFrom(mark))
          else { pos = save; resetInlineWheres(mark); cmpExpr() }
        } catch {
          case scala.util.control.NonFatal(_) =>
            pos = save; resetInlineWheres(mark); cmpExpr()
        }
      } else cmpExpr()

    private def cmpExpr(): CExpr = {
      val l = addExpr()
      peek match {
        case Some(TSym("=~")) =>
          next()
          StrPred("regex", l, addExpr())
        case Some(TSym(op)) if Set("=", "<>", "<", "<=", ">", ">=").contains(op) =>
          next()
          Cmp(op, l, addExpr())
        case Some(t) if isKw(t, "STARTS") =>
          eatKw("STARTS"); eatKw("WITH")
          StrPred("startswith", l, addExpr())
        case Some(t) if isKw(t, "ENDS") =>
          eatKw("ENDS"); eatKw("WITH")
          StrPred("endswith", l, addExpr())
        case Some(t) if isKw(t, "CONTAINS") =>
          eatKw("CONTAINS")
          StrPred("contains", l, addExpr())
        case Some(t) if isKw(t, "IS") =>
          eatKw("IS")
          val negated = atKw("NOT")
          if (negated) eatKw("NOT")
          eatKw("NULL")
          if (negated) Not(IsNull(l)) else IsNull(l)
        case Some(t) if isKw(t, "IN") =>
          eatKw("IN")
          // any list-valued expression (r15): bound list variables,
          // collect results, range(), group variables — literal lists
          // keep the isin fast path at compile time
          InList(l, addExpr())
        case _ => l
      }
    }

    // arithmetic with * / binding tighter than + - ; `*` inside
    // count(*) and rel patterns never reaches here (consumed by their
    // own productions)
    private def addExpr(): CExpr = {
      var l = mulExpr()
      while (atSym("+") || atSym("-")) {
        val op = next().asInstanceOf[TSym].s
        l = Arith(op, l, mulExpr())
      }
      l
    }
    private def mulExpr(): CExpr = {
      var l = powExpr()
      while (atSym("*") || atSym("/") || atSym("%")) {
        val op = next().asInstanceOf[TSym].s
        l = Arith(op, l, powExpr())
      }
      l
    }
    // `^` binds tighter than * / % and is LEFT-associative in
    // openCypher/Neo4j: 2^3^2 = (2^3)^2 = 64, not 512
    private def powExpr(): CExpr = {
      var l = unaryExpr()
      while (atSym("^")) { eatSym("^"); l = Arith("^", l, unaryExpr()) }
      l
    }
    // unary minus: folds into numeric literals, otherwise 0 - e
    private def unaryExpr(): CExpr =
      if (atSym("-")) {
        eatSym("-")
        unaryExpr() match {
          case LitV(n: Long)   => LitV(-n)
          case LitV(d: Double) => LitV(-d)
          case e               => Arith("-", LitV(0L), e)
        }
      } else valueExpr()

    private val aggFns =
      Set("count", "sum", "min", "max", "avg", "collect", "stdev")
    private val scalarFns =
      Set("toupper", "tolower", "trim", "size", "id", "elementid",
        "type", "labels",
        "length", "abs", "ceil", "floor", "round", "sign", "sqrt",
        "tointeger", "tofloat", "tostring", "reverse", "head", "last",
        "tail", "substring", "replace", "split", "left", "right", "keys",
        "ltrim", "rtrim", "toboolean", "date", "datetime", "duration",
        "localdatetime", "localtime", "time",
        "properties", "nodes", "relationships", "exp", "log", "log10",
        "sin", "cos",
        "tan", "asin", "acos", "atan", "atan2", "degrees", "radians",
        "pi", "e", "isempty", "startnode", "endnode", "distance", "cost",
        "tointegerornull", "tofloatornull", "tostringornull",
        "tobooleanornull", "isnan", "char_length", "character_length",
        "haversin")
    private val listPredFns = Set("any", "all", "none", "single")

    /** Temporal instant components, accessed Neo4j-style as a postfix
      * `.year` on an already-parsed expression (`e.ts.year`,
      * `date(e.ts).month`). Parsed into reserved `@`-prefixed FnCall
      * names so every existing AST traversal (agg detection, list
      * tracking) sees an ordinary unary function.
      */
    private val temporalComps = Set(
      "year", "month", "day", "hour", "minute", "second",
      "dayofweek", "epochseconds", "epochmillis")

    /** Primary expression plus any postfix temporal-component chain.
      * The FIRST dot after a bare identifier is property access
      * (consumed inside [[primaryExpr]] as `Prop`), so `n.year` stays
      * a property read; only dots on an already-built expression
      * (`e.ts.year`, `date(x).month`) resolve as components.
      */
    private def valueExpr(): CExpr = {
      var e = primaryExpr()
      var done = false
      while (!done) {
        if (atSym(".") && pos + 1 < toks.length &&
            (toks(pos + 1) match {
              case TId(n) => temporalComps.contains(n.toLowerCase(java.util.Locale.ROOT))
              case _      => false
            })) {
          eatSym(".")
          e = FnCall("@" + ident().toLowerCase(java.util.Locale.ROOT), Some(e))
        } else if (atSym(".") && pos + 1 < toks.length &&
            (toks(pos + 1) match {
              // `.seconds` on a duration.inSeconds.between(...) value /
              // `.days` on inDays — the single component such a
              // duration carries, so the access is the identity
              case TId(n) =>
                val ln = n.toLowerCase(java.util.Locale.ROOT)
                e match {
                  case FnCallN("@durbetween_s", _) => ln == "seconds"
                  case FnCallN("@durbetween_d", _) => ln == "days"
                  case _                           => false
                }
              case _ => false
            })) {
          eatSym("."); ident(): Unit // identity component access
        } else if (atSym("[")) {
          // postfix list access: index `xs[i]` (negative = from end)
          // or slice `xs[a..b]` (0-based, end-exclusive, open ends) —
          // desugared to reserved @index/@slice calls. Missing slice
          // bounds become 0 / size(xs).
          eatSym("[")
          val start =
            if (atSym("..")) LitV(0L) else addExpr()
          if (atSym("..")) {
            eatSym("..")
            val end =
              if (atSym("]")) FnCall("size", Some(e)) else addExpr()
            eatSym("]")
            e = FnCallN("@slice", Seq(e, start, end))
          } else {
            eatSym("]")
            e = FnCallN("@index", Seq(e, start))
          }
        } else done = true
      }
      e
    }

    private def primaryExpr(): CExpr = peek match {
      // `duration.inSeconds.between(a, b)` / `duration.inDays.between`
      // — Neo4j's single-component duration constructors, the
      // instant-minus-instant surface (epoch arithmetic; the full
      // calendar-decomposed `duration.between` is out of scope).
      // Parsed into reserved @durbetween_s/_d calls.
      case Some(TId(name))
          if name.equalsIgnoreCase("duration") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym(".") =>
        ident(); eatSym(".")
        val unit = ident().toLowerCase(java.util.Locale.ROOT)
        require(unit == "inseconds" || unit == "indays",
          s"duration.$unit unsupported — use duration.inSeconds.between " +
            "or duration.inDays.between")
        eatSym(".")
        val m = ident()
        require(m.equalsIgnoreCase("between"),
          s"expected between after duration.$unit, got $m")
        eatSym("(")
        val a = addExpr(); eatSym(",")
        val b = addExpr(); eatSym(")")
        FnCallN(if (unit == "inseconds") "@durbetween_s" else "@durbetween_d",
          Seq(a, b))
      case Some(TId(name))
          if name.equalsIgnoreCase("coalesce") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        ident(); eatSym("(")
        val args = Seq.newBuilder[CExpr]
        args += addExpr()
        while (atSym(",")) { eatSym(","); args += addExpr() }
        eatSym(")")
        Coalesce(args.result())
      case Some(t) if isKw(t, "CASE") =>
        eatKw("CASE")
        // simple form `CASE scrut WHEN v THEN …` desugars to the
        // searched form with `scrut = v` conditions
        val scrut = if (atKw("WHEN")) None else Some(addExpr())
        val whens = Seq.newBuilder[(CExpr, CExpr)]
        while (atKw("WHEN")) {
          eatKw("WHEN")
          val c0 = scrut match {
            case None    => expr()
            case Some(x) => Cmp("=", x, addExpr())
          }
          eatKw("THEN"); whens += ((c0, addExpr()))
        }
        val otherwise = if (atKw("ELSE")) { eatKw("ELSE"); Some(addExpr()) } else None
        eatKw("END")
        CaseExpr(whens.result(), otherwise)
      case Some(TId(name))
          if name.equalsIgnoreCase("reduce") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        // reduce(acc = init, x IN list | step)
        ident(); eatSym("(")
        val acc = ident()
        eatSym("=")
        val init = addExpr()
        eatSym(",")
        val v = ident()
        eatKw("IN")
        val list = addExpr()
        eatSym("|")
        val step = addExpr()
        eatSym(")")
        ReduceExpr(acc, init, v, list, step)
      case Some(TId(name))
          if name.equalsIgnoreCase("range") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        ident(); eatSym("(")
        val from = addExpr()
        eatSym(",")
        val to = addExpr()
        val step = if (atSym(",")) { eatSym(","); addExpr() } else LitV(1L)
        eatSym(")")
        RangeList(from, to, step)
      case Some(TId(ns))
          if ns.equalsIgnoreCase("datetime") &&
          pos + 2 < toks.length && toks(pos + 1) == TSym(".") &&
          (toks(pos + 2) match {
            case TId(f) => f.equalsIgnoreCase("fromepoch") ||
              f.equalsIgnoreCase("fromepochmillis")
            case _ => false
          }) =>
        // `datetime.fromEpoch(seconds[, nanos])` /
        // `datetime.fromEpochMillis(ms)` (Neo4j 5.8) — epoch-anchored
        // instants, desugared to reserved @fromepoch calls
        ident(); eatSym(".")
        val f = ident().toLowerCase(java.util.Locale.ROOT)
        eatSym("(")
        val args = Seq.newBuilder[CExpr]
        args += addExpr()
        while (atSym(",")) { eatSym(","); args += addExpr() }
        eatSym(")")
        FnCallN(if (f == "fromepoch") "@fromepoch" else "@fromepochmillis",
          args.result())
      case Some(TId(ns))
          if (ns.equalsIgnoreCase("datetime") || ns.equalsIgnoreCase("date")) &&
          pos + 2 < toks.length && toks(pos + 1) == TSym(".") &&
          (toks(pos + 2) match {
            case TId(f) => f.equalsIgnoreCase("truncate")
            case _      => false
          }) =>
        // namespaced temporal truncation `datetime.truncate('month', x)`
        // / `date.truncate(...)` — desugared to a reserved @trunc call
        // carrying the unit as a literal (the planner validates it)
        val toDate = ns.equalsIgnoreCase("date")
        ident(); eatSym("."); ident(); eatSym("(")
        val unit = next() match {
          case TStr(s) => s.toLowerCase(java.util.Locale.ROOT)
          case t => throw new IllegalArgumentException(
            s"$ns.truncate expects a string-literal unit, got $t")
        }
        eatSym(",")
        val arg = addExpr()
        eatSym(")")
        FnCallN(if (toDate) "@truncdate" else "@trunc", Seq(LitV(unit), arg))
      case Some(TId(name))
          if (name.equalsIgnoreCase("datetime") || name.equalsIgnoreCase("date") ||
            name.equalsIgnoreCase("localdatetime") ||
            name.equalsIgnoreCase("time") || name.equalsIgnoreCase("localtime") ||
            name.equalsIgnoreCase("duration")) &&
          pos + 2 < toks.length && toks(pos + 1) == TSym("(") &&
          toks(pos + 2) == TSym("{") =>
        // map constructor `datetime({year: …, month: …, …})` /
        // `date({year, month, day})` / `localdatetime({…})` /
        // `time({hour, …})` / `localtime({…})` /
        // `duration({days: 7, hours: 2})` — desugared to reserved
        // @mk… calls carrying alternating (key, expr) arguments; the
        // planner validates components and defaults the rest
        // (month/day → 1, time-of-day → 0, Neo4j semantics)
        val mkFn = name.toLowerCase(java.util.Locale.ROOT) match {
          case "date"          => "@mkdate"
          case "datetime"      => "@mkdatetime"
          case "localdatetime" => "@mklocaldatetime"
          case "duration"      => "@mkduration"
          case _               => "@mktime" // time / localtime
        }
        ident(); eatSym("("); eatSym("{")
        val entries = Seq.newBuilder[CExpr]
        def entry(): Unit = {
          val k = ident().toLowerCase(java.util.Locale.ROOT)
          eatSym(":")
          entries += LitV(k)
          entries += addExpr()
        }
        entry()
        while (atSym(",")) { eatSym(","); entry() }
        eatSym("}"); eatSym(")")
        FnCallN(mkFn, entries.result())
      case Some(TId(name))
          if name.equalsIgnoreCase("point") &&
          pos + 2 < toks.length && toks(pos + 1) == TSym("(") &&
          toks(pos + 2) == TSym("{") =>
        // `point({x: …, y: …})` — cartesian 2-D point — or
        // `point({latitude: …, longitude: …})` — geographic WGS84
        // point (Neo4j's key-set-determines-CRS rule); both become a
        // (crs, x, y) struct downstream, geographic with x=longitude,
        // y=latitude exactly as Neo4j aliases them
        ident(); eatSym("("); eatSym("{")
        val kv = scala.collection.mutable.LinkedHashMap[String, CExpr]()
        def entry(): Unit = {
          val k = ident().toLowerCase(java.util.Locale.ROOT)
          eatSym(":")
          kv += (k -> addExpr())
        }
        entry()
        while (atSym(",")) { eatSym(","); entry() }
        eatSym("}"); eatSym(")")
        require(kv.keySet == Set("x", "y") ||
            kv.keySet == Set("latitude", "longitude"),
          "point() requires exactly {x, y} (cartesian) or " +
            s"{latitude, longitude} (WGS84), got {${kv.keys.mkString(", ")}}")
        if (kv.keySet == Set("x", "y"))
          FnCallN("@point", Seq(kv("x"), kv("y")))
        else FnCallN("@pointgeo", Seq(kv("longitude"), kv("latitude")))
      case Some(TId(name))
          if name.equalsIgnoreCase("point") &&
          pos + 2 < toks.length && toks(pos + 1) == TSym(".") &&
          (toks(pos + 2) match {
            case TId(f) => f.equalsIgnoreCase("distance") ||
              f.equalsIgnoreCase("withinBBox")
            case _      => false
          }) =>
        // `point.distance(a, b)` — distance between two points
        // (Neo4j 5 spelling; `distance(a, b)` also accepted as the
        // legacy form) — and `point.withinBBox(p, lowerLeft,
        // upperRight)` — bounding-box containment
        ident(); eatSym(".")
        val f = ident()
        eatSym("(")
        val a = addExpr(); eatSym(",")
        val b = addExpr()
        if (f.equalsIgnoreCase("withinBBox")) {
          eatSym(",")
          val c = addExpr(); eatSym(")")
          FnCallN("@withinbbox", Seq(a, b, c))
        } else {
          eatSym(")")
          FnCallN("@distance", Seq(a, b))
        }
      case Some(TId(name))
          if (name.equalsIgnoreCase("percentileCont") ||
            name.equalsIgnoreCase("percentileDisc")) &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        val disc = name.equalsIgnoreCase("percentileDisc")
        ident(); eatSym("(")
        val a = addExpr()
        eatSym(",")
        val p = next() match {
          case TNum(n) => n.toDouble
          case t => throw new IllegalArgumentException(
            s"percentile expects a numeric literal percentile, got $t")
        }
        require(p >= 0.0 && p <= 1.0, s"percentile $p outside [0, 1]")
        eatSym(")")
        if (disc) PercentileDisc(a, p) else PercentileCont(a, p)
      case Some(TId(name))
          if name.equalsIgnoreCase("count") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("{") =>
        // COUNT { (MATCH)? pattern (WHERE pred)? } subquery
        // expression; bodies continuing past one pattern backtrack
        // into the FULL-subquery form (r15)
        ident(); eatSym("{")
        val saveC = pos
        val markC = inlineWheres.size
        val simpleC: Option[CExpr] =
          try {
            if (atKw("MATCH")) eatKw("MATCH")
            val chain = patternChain()
            val inW = drainInlineWheresFrom(markC)
            val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
            if (atSym("}")) { eatSym("}"); Some(CountPattern(chain, andOpt(inW, w))) }
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        simpleC.getOrElse {
          pos = saveC
          resetInlineWheres(markC)
          val body = withFreshInlineFrame(query(inCall = true).clauses)
          eatSym("}")
          CountSubquery(body)
        }
      case Some(TId(name))
          if name.equalsIgnoreCase("collect") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("{") =>
        // Neo4j 5 `COLLECT { MATCH pattern (WHERE p)? RETURN expr }`
        // subquery expression — the per-row list of projections over
        // the pattern's matches. Desugars to the pattern
        // comprehension ([[Ast.PatternComp]]), whose SORTED collect
        // makes the result deterministic (Neo4j's own order is
        // unspecified).
        ident(); eatSym("{")
        val saveL = pos
        val markL = inlineWheres.size
        val simpleL: Option[CExpr] =
          try {
            if (atKw("MATCH")) eatKw("MATCH")
            val chain = patternChain()
            val inW = drainInlineWheresFrom(markL)
            val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
            eatKw("RETURN")
            val proj = addExpr()
            if (atSym("}")) { eatSym("}"); Some(PatternComp(chain, andOpt(inW, w), proj)) }
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        simpleL.getOrElse {
          pos = saveL
          resetInlineWheres(markL)
          // full form (r15): a whole pipeline whose last clause must
          // be a single-item RETURN (validated at plan time)
          val body = withFreshInlineFrame(query(inCall = true).clauses)
          eatSym("}")
          CollectSubquery(body)
        }
      case Some(TId(name))
          if listPredFns.contains(name.toLowerCase(java.util.Locale.ROOT)) &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        // any/all/none/single(x IN list WHERE pred)
        val kind = ident().toLowerCase(java.util.Locale.ROOT)
        eatSym("(")
        val v = ident()
        eatKw("IN")
        val list = addExpr()
        eatKw("WHERE")
        val pred = expr()
        eatSym(")")
        ListPred(kind, v, list, pred)
      case Some(TId(name))
          if aggFns.contains(name.toLowerCase(java.util.Locale.ROOT)) &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        val fn = ident().toLowerCase(java.util.Locale.ROOT)
        eatSym("(")
        val call =
          if (atSym("*")) { eatSym("*"); FnCall(fn, None, star = true) }
          else {
            val distinct = atKw("DISTINCT")
            if (distinct) eatKw("DISTINCT")
            FnCall(fn, Some(addExpr()), distinct = distinct)
          }
        eatSym(")")
        call
      case Some(TId(name))
          if scalarFns.contains(name.toLowerCase(java.util.Locale.ROOT)) &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        val fn = ident().toLowerCase(java.util.Locale.ROOT)
        eatSym("(")
        // zero-arg scalars: pi(), e()
        if (atSym(")")) { eatSym(")"); FnCall(fn, None) }
        else {
          val args = Seq.newBuilder[CExpr]
          args += addExpr()
          while (atSym(",")) { eatSym(","); args += addExpr() }
          eatSym(")")
          val as = args.result()
          if (as.size == 1) FnCall(fn, Some(as.head)) else FnCallN(fn, as)
        }
      case Some(TId(s)) if s.equalsIgnoreCase("null") =>
        next(); LitV(null)
      case Some(TId(s)) if s.equalsIgnoreCase("true") =>
        next(); LitV(true)
      case Some(TId(s)) if s.equalsIgnoreCase("false") =>
        next(); LitV(false)
      case Some(TId(_)) =>
        val v = ident()
        if (atSym(".")) { eatSym("."); Prop(v, ident()) }
        else if (atSym("{")) {
          // map projection `n {.*, .name, total: expr}` — desugared at
          // parse time to a struct build (reserved FnCallN), consumed
          // via field access (`m.name`). Entry forms: `.key` property
          // selectors, `key: expr` computed entries (r14), and the
          // `.*` all-properties selector (r15) — the parser has no
          // label context, so `.*` emits an `@mapstar` marker the
          // planner resolves against the bound frame's property
          // columns at plan time.
          eatSym("{")
          val keys = Seq.newBuilder[CExpr]
          while (!atSym("}")) {
            if (atSym(".")) {
              eatSym(".")
              if (atSym("*")) { eatSym("*"); keys += FnCallN("@mapstar", Nil) }
              else keys += LitV(ident())
            } else {
              val k = ident()
              eatSym(":")
              keys += FnCallN("@mapentry", Seq(LitV(k), expr()))
            }
            if (!atSym("}")) eatSym(",")
          }
          eatSym("}")
          val ks = keys.result()
          require(ks.nonEmpty, s"empty map projection on '$v'")
          FnCallN("@mapproj", Ident(v) +: ks)
        } else if (atSym(":")) {
          // label predicate `v:Label(:More)*` in expression position
          // (`WHERE n:Customer`, `RETURN n:Part AS is_part`, r15) —
          // true when the node carries EVERY listed label; reads the
          // scan's hidden @labels column, so no extra join
          val ls = Seq.newBuilder[CExpr]
          while (atSym(":")) { eatSym(":"); ls += LitV(ident()) }
          FnCallN("@haslabel", Ident(v) +: ls.result())
        } else Ident(v)
      case Some(TStr(s)) => next(); LitV(s)
      case Some(TNum(n)) =>
        next()
        LitV(if (n.contains('.')) n.toDouble else n.toLong)
      case Some(TSym("$")) =>
        eatSym("$"); Param(ident())
      case Some(TSym("(")) =>
        eatSym("("); val e = expr(); eatSym(")"); e
      case Some(TSym("[")) if pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        // pattern comprehension `[(a)-[:R]->(b) (WHERE p)? | proj]`;
        // a list literal starting with a parenthesized value
        // expression backtracks cleanly (same discipline as the bare
        // pattern predicate)
        val save = pos
        val markP = inlineWheres.size
        try {
          eatSym("[")
          val chain = patternChain()
          if (chain.hops.isEmpty) throw new IllegalArgumentException(
            "not a pattern comprehension")
          val inW = drainInlineWheresFrom(markP)
          val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
          eatSym("|")
          val proj = addExpr()
          eatSym("]")
          PatternComp(chain, andOpt(inW, w), proj)
        } catch {
          case scala.util.control.NonFatal(_) =>
            pos = save
            resetInlineWheres(markP)
            eatSym("[")
            val items = Seq.newBuilder[CExpr]
            if (!atSym("]")) {
              items += valueExpr()
              while (atSym(",")) { eatSym(","); items += valueExpr() }
            }
            eatSym("]")
            ListLit(items.result())
        }
      case Some(TSym("["))
          if pos + 2 < toks.length && toks(pos + 1).isInstanceOf[TId] &&
            isKw(toks(pos + 2), "IN") =>
        // list comprehension: [x IN list (WHERE pred)? (| proj)?]
        eatSym("[")
        val v = ident()
        eatKw("IN")
        val list = addExpr()
        val where = if (atKw("WHERE")) { eatKw("WHERE"); Some(expr()) } else None
        val proj = if (atSym("|")) { eatSym("|"); Some(addExpr()) } else None
        eatSym("]")
        ListComp(v, list, where, proj)
      case Some(TSym("[")) =>
        eatSym("[")
        val items = Seq.newBuilder[CExpr]
        if (!atSym("]")) {
          items += valueExpr()
          while (atSym(",")) { eatSym(","); items += valueExpr() }
        }
        eatSym("]")
        ListLit(items.result())
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    private def literal(): Any = next() match {
      case TStr(s) => s
      case TNum(n) => if (n.contains('.')) n.toDouble else n.toLong
      case TId(s) if s.equalsIgnoreCase("true")  => true
      case TId(s) if s.equalsIgnoreCase("false") => false
      case TId(s) if s.equalsIgnoreCase("null")  => null
      case t => throw new IllegalArgumentException(s"expected literal, got $t")
    }
  }
}
