package graft.cypher

import graft.cypher.Ast._
import org.scalatest.funsuite.AnyFunSuite

class CypherParserSpec extends AnyFunSuite {

  test("node scan with projection and order") {
    val q = CypherParser.parse(
      "MATCH (c:Customer) RETURN c.name AS name, c.acctbal ORDER BY name DESC LIMIT 5")
    assert(q.matches.head.chain.start == NodePattern(Some("c"), Some("Customer"), Map.empty))
    assert(q.items == Seq(
      ReturnItem(Prop("c", "name"), Some("name")),
      ReturnItem(Prop("c", "acctbal"), None)))
    assert(q.items(1).name == "acctbal")
    assert(q.orderBy == Seq(SortItem("name", ascending = false)))
    assert(q.limit.contains(5L))
  }

  test("relationship pattern directions") {
    val out = CypherParser.parse(
      "MATCH (a:X)-[:R]->(b:Y) RETURN a.p").matches.head.chain
    assert(out.hops.head._1 == RelPattern(None, Some("R"), Out, None))
    val in = CypherParser.parse(
      "MATCH (a:X)<-[:R]-(b:Y) RETURN a.p").matches.head.chain
    assert(in.hops.head._1 == RelPattern(None, Some("R"), In, None))
    assertThrows[IllegalArgumentException](
      CypherParser.parse("MATCH (a:X)-[:R]-(b:Y) RETURN a.p"))
  }

  test("property map, where, skip") {
    val q = CypherParser.parse(
      "MATCH (c:Customer {mktsegment: 'BUILDING'}) WHERE c.acctbal >= 10.5 AND NOT c.name = 'x' " +
      "RETURN c.name SKIP 2 LIMIT 3")
    assert(q.matches.head.chain.start.props == Map("mktsegment" -> "BUILDING"))
    assert(q.where.contains(
      And(Cmp(">=", Prop("c", "acctbal"), LitV(10.5)),
        Not(Cmp("=", Prop("c", "name"), LitV("x"))))))
    assert(q.skip.contains(2L) && q.limit.contains(3L))
  }

  test("aggregates and count star") {
    val q = CypherParser.parse(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) " +
      "RETURN n.name AS nation, count(*) AS n, sum(c.acctbal) AS bal")
    assert(q.items(1).expr == FnCall("count", None, star = true))
    assert(q.items(2).expr == FnCall("sum", Some(Prop("c", "acctbal"))))
  }

  test("var-length range") {
    val q = CypherParser.parse("MATCH (a:X)-[:R*1..3]->(b:Y) RETURN a.p")
    assert(q.matches.head.chain.hops.head._1.varLength.contains((1, 3)))
  }

  test("optional match flag") {
    val q = CypherParser.parse(
      "MATCH (c:Customer) OPTIONAL MATCH (o:Order)-[:PLACED_BY]->(c) RETURN c.name")
    assert(!q.matches.head.optional && q.matches(1).optional)
  }

  test("malformed queries fail with a message") {
    assertThrows[IllegalArgumentException](CypherParser.parse("MATCH (c:Customer"))
    assertThrows[IllegalArgumentException](CypherParser.parse("RETURN 1"))
    assertThrows[IllegalArgumentException](
      CypherParser.parse("MATCH (c:Customer) RETURN c.name trailing"))
  }
}
