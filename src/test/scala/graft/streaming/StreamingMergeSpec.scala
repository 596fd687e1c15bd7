package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.TestSpark
import graft.neo4j.Neo4jConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import scala.jdk.CollectionConverters._

/** [[StreamingJobs.mergeBatches]] against an embedded transactional
  * endpoint that APPLIES the MERGE semantics (keyed upsert into a
  * map), so the spec pins what the reference's write half guarantees
  * under at-least-once delivery: batch shapes (bounded UNWIND arrays,
  * extracted parameter name) and convergence when a committed batch is
  * replayed after an ambiguous failure or a restart.
  */
class StreamingMergeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  private var server: HttpServer = _
  // the embedded graph: orderkey -> status, MERGE-upserted
  private val state = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  // every payload body the endpoint accepted, in arrival order
  private val posts = java.util.Collections.synchronizedList(
    new java.util.ArrayList[String]())

  private def applyMerge(body: String): Unit = {
    val stmt = mapper.readTree(body).get("statements").get(0)
    val rows = stmt.get("parameters").get("rows")
    rows.elements().asScala.foreach { r =>
      state.put(r.get("orderkey").asLong(), r.get("status").asText()): Unit
    }
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/db/data/transaction/commit", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        posts.add(body): Unit
        applyMerge(body)
        val resp = """{"results":[],"errors":[]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def cfg(query: String, idempotent: Boolean = true) = Neo4jConfig(
    restUri = s"http://localhost:${server.getAddress.getPort}/db/data/",
    query = query,
    idempotentWrites = idempotent)

  private val MergeStmt =
    "UNWIND $rows AS r MERGE (o:Order {orderkey:r.orderkey}) SET o.status = r.status"

  test("micro-batches flush as bounded MERGE payloads and restart keeps committed work") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    state.clear(); posts.clear()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-merge-ckpt").toString

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("orderkey", "status")
    val q = StreamingJobs.mergeBatches(df.coalesce(1), cfg(MergeStmt),
      Seq("orderkey", "status"), ckpt, batchSize = 2)
    try {
      input.addData((1L, "O"), (2L, "O"), (3L, "F"), (4L, "O"), (5L, "P"))
      q.processAllAvailable()
    } finally q.stop()

    assert(state.asScala.toMap ==
      Map(1L -> "O", 2L -> "O", 3L -> "F", 4L -> "O", 5L -> "P"))
    // batch shape: 5 rows under batchSize=2 on one partition = 3 POSTs
    // (2+2+1 — the reference's accumulate/flush/final-flush contract),
    // each an UNWIND array of <= batchSize elements under the extracted
    // parameter name, carrying the configured statement verbatim
    val bodies = posts.asScala.toList
    assert(bodies.size == 3)
    val sizes = bodies.map { b =>
      val stmt = mapper.readTree(b).get("statements").get(0)
      assert(stmt.get("statement").asText() == MergeStmt)
      stmt.get("parameters").get("rows").size()
    }
    assert(sizes.sum == 5 && sizes.forall(_ <= 2))

    // restart from the same checkpoint: committed micro-batches do NOT
    // re-run (no new POSTs for old data), new data merges on top
    val postsBefore = posts.size()
    val q2 = StreamingJobs.mergeBatches(df.coalesce(1), cfg(MergeStmt),
      Seq("orderkey", "status"), ckpt, batchSize = 2)
    try {
      input.addData((3L, "O"), (6L, "F"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(state.asScala.toMap ==
      Map(1L -> "O", 2L -> "O", 3L -> "O", 4L -> "O", 5L -> "P", 6L -> "F"))
    assert(posts.size() == postsBefore + 1, "only the new micro-batch may POST")
  }

  test("replaying committed payloads converges (at-least-once idempotence)") {
    // simulate the ambiguous-failure replay: every payload the stream
    // committed is POSTed again, byte-identical — MERGE semantics must
    // leave the graph exactly where it was
    val before = state.asScala.toMap
    assert(before.nonEmpty, "runs after the streaming test")
    posts.asScala.toList.foreach(applyMerge)
    assert(state.asScala.toMap == before)
  }

  test("non-idempotent configs and CREATE statements are rejected up front") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("orderkey", "status")
    intercept[IllegalArgumentException] {
      StreamingJobs.mergeBatches(df, cfg(MergeStmt, idempotent = false),
        Seq("orderkey", "status"), "/tmp/unused")
    }
    intercept[IllegalArgumentException] {
      StreamingJobs.mergeBatches(df,
        cfg("UNWIND $rows AS r CREATE (o:Order {orderkey:r.orderkey})"),
        Seq("orderkey"), "/tmp/unused")
    }
  }
}
