package graft.neo4j

import graft.neo4j.Neo4jConfig.TransactionUri
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Connection settings for a Neo4j transactional HTTP endpoint —
  * graft's equivalent of the reference's builder surface
  * (Neo4jFormatBase.Builder: restURI, cypher query, username,
  * password, connect/read timeouts; validation at
  * Neo4jFormatBase.java:180-195).
  */
final case class Neo4jConfig(
    restUri: String,
    query: String,
    username: Option[String] = None,
    password: Option[String] = None,
    connectTimeoutMs: Int = 1000,
    readTimeoutMs: Int = 1000,
    maxRetries: Int = 3,
    retryBackoffMs: Int = 100,
    idempotentWrites: Boolean = false) {
  require(restUri != null && restUri.nonEmpty, "No Rest URI was supplied.")
  require(query != null && query.nonEmpty, "No Cypher statement was supplied.")
  require(maxRetries >= 0, "maxRetries must be >= 0")
  require(retryBackoffMs >= 0, "retryBackoffMs must be >= 0")

  def endpoint: String =
    (if (restUri.endsWith("/")) restUri else restUri + "/") + TransactionUri

  def authHeader: Option[String] = for (u <- username; p <- password) yield {
    "Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$u:$p".getBytes("UTF-8"))
  }
}

object Neo4jConfig {
  /** Appended to the rest URI for transactional queries (mirrors
    * Neo4jFormatBase.TRANSACTION_URI).
    */
  val TransactionUri = "transaction/commit"
}

/** HTTP plumbing shared by reader and writer. */
private[neo4j] object Http {
  def client(cfg: Neo4jConfig): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMs.toLong))
      .build()

  /** Statuses safe to retry for ANY payload: the server (429
    * rate-limit) or its front proxy (503 unavailable) rejected the
    * request before processing it, so nothing can have committed.
    * 4xx client errors (bad query, auth) fail fast.
    */
  private val AlwaysRetryable = Set(429, 503)

  /** Statuses retryable only for replay-safe payloads: a 500, or a
    * gateway's 502/504, can arrive AFTER the backend committed the
    * transaction (the transactional endpoint commits per request), so
    * replaying a non-idempotent write here could duplicate rows.
    */
  private val AmbiguousRetryable = Set(500, 502, 504)

  /** Non-200 response, distinguishable by TYPE from transport
    * IOExceptions in the retry loop (message text can be null on
    * transport errors, so string matching is unsafe).
    */
  private final class StatusException(val status: Int)
    extends java.io.IOException(s"Server returned status [$status]")

  /** POST with bounded deterministic exponential backoff (base ×2 per
    * attempt, no jitter — reproducible tests beat decorrelation at
    * this fan-in), up to `cfg.maxRetries` times.
    *
    * `replaySafe = false` (the writer's default — UNWIND…CREATE is
    * not idempotent) narrows retries to failures that PRECEDE the
    * request reaching the server: connect-phase exceptions and
    * [[AlwaysRetryable]] statuses. Ambiguous failures — an IOException
    * after the request was sent (response lost mid-read) or an
    * [[AmbiguousRetryable]] gateway status — fail fast instead of
    * silently duplicating committed work; opting in via
    * `Neo4jConfig.idempotentWrites` (for MERGE-style statements)
    * restores full at-least-once retries.
    */
  def post(cfg: Neo4jConfig, payload: String,
      replaySafe: Boolean = true): HttpResponse[java.io.InputStream] = {
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, HttpResponse[java.io.InputStream]] =
        try {
          val b = HttpRequest.newBuilder(URI.create(cfg.endpoint))
            .timeout(Duration.ofMillis(cfg.readTimeoutMs.toLong))
            .header("Content-Type", "application/json;charset=UTF-8")
            .header("Accept", "application/json")
            .header("X-Stream", "true")
            .POST(HttpRequest.BodyPublishers.ofString(payload))
          cfg.authHeader.foreach(a => b.header("Authorization", a))
          val resp = client(cfg).send(b.build(),
            HttpResponse.BodyHandlers.ofInputStream())
          if (resp.statusCode() == 200) Right(resp)
          else {
            try resp.body().close() catch { case _: java.io.IOException => () }
            val e = new StatusException(resp.statusCode())
            val retriable = AlwaysRetryable(resp.statusCode()) ||
              (replaySafe && AmbiguousRetryable(resp.statusCode()))
            if (retriable) Left(e) else throw e
          }
        } catch {
          // typed guards, not message matching — transports raise
          // IOExceptions with null messages (e.g. a closed keep-alive
          // channel); a non-retryable status was thrown above and
          // propagates unchanged
          case se: StatusException => throw se
          // connect-phase failures: the request never reached the
          // server, so a replay can't duplicate anything
          case ce: java.net.ConnectException => Left(ce)
          case ct: java.net.http.HttpConnectTimeoutException => Left(ct)
          case io: java.io.IOException =>
            // sent-but-ambiguous (reset / read timeout mid-response):
            // the server may have committed before the response died
            if (replaySafe) Left(io) else throw io
        }
      outcome match {
        case Right(resp) => return resp
        case Left(e) =>
          if (attempt >= cfg.maxRetries) throw e
          Thread.sleep(cfg.retryBackoffMs.toLong << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Reads a Cypher query result from a Neo4j transactional endpoint
  * into a DataFrame — the Spark twin of Neo4jInputFormat.
  *
  * The HTTP fetch happens once on the driver (the endpoint is a
  * single server — same NonParallelInput constraint as the reference,
  * Neo4jInputFormat.java:40); rows are then parallelized so all
  * downstream processing distributes. For graph-scale data the
  * native path is GraphLoader + CypherPlanner, which never funnels
  * through a socket.
  */
object Neo4jReader {

  def read(spark: SparkSession, cfg: Neo4jConfig, schema: StructType): DataFrame = {
    val payload = CypherPayload.statementJson(cfg.query)
    val resp = Http.post(cfg, payload)
    val rows =
      try Neo4jRowParser.parseRows(resp.body()).map(coerce(_, schema)).toVector
      finally resp.body().close()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), math.max(1, rows.size / 10000)),
      schema)
  }

  /** Typed read — the Spark counterpart of the reference's typed
    * tuple emission (Neo4jInputFormat is generic in a Flink tuple
    * type; here the case class's Encoder derives the expected schema
    * AND the row mapping). Columns bind by POSITION like the
    * reference's tuple fields: the i-th RETURN expression feeds the
    * i-th case-class field; the encoder's field names become the
    * column names.
    */
  def readTyped[T <: Product](spark: SparkSession, cfg: Neo4jConfig)(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] =
    read(spark, cfg, enc.schema).as[T](enc)

  /** Parallel paginated read: partition `p` of `numPartitions` fetches
    * pages p, p+numPartitions, … of `pageSize` rows by appending
    * `SKIP/LIMIT` to the query, stopping after its first short page.
    * The reference input format is explicitly single-split
    * (NonParallelInput, Neo4jInputFormat.java:40) — this spreads the
    * wire transfer and JSON parsing across executor tasks instead of
    * funnelling everything through one socket on the driver. The query
    * must have a deterministic ORDER BY for pagination to partition
    * the result exactly.
    */
  def readPartitioned(spark: SparkSession, cfg: Neo4jConfig, schema: StructType,
      numPartitions: Int = 4, pageSize: Int = 10000): DataFrame = {
    require(numPartitions >= 1 && pageSize >= 1, "bad partitioning")
    // appending our own window onto a query that already paginates
    // would silently return the wrong subset — refuse loudly
    require(!"""(?is).*\b(SKIP|LIMIT)\s+\d+\s*$""".r.matches(cfg.query),
      "partitioned read appends SKIP/LIMIT; the query must not end with its own")
    val rows = spark.sparkContext
      .parallelize(0 until numPartitions, numPartitions)
      .flatMap { p =>
        val pages = new Iterator[Vector[Seq[Any]]] {
          private var k = 0
          private var done = false
          override def hasNext: Boolean = !done
          override def next(): Vector[Seq[Any]] = {
            val skip = (p.toLong + k.toLong * numPartitions) * pageSize
            k += 1
            val q = s"${cfg.query} SKIP $skip LIMIT $pageSize"
            val resp = Http.post(cfg.copy(query = q), CypherPayload.statementJson(q))
            val page =
              try Neo4jRowParser.parseRows(resp.body()).map(coerce(_, schema)).toVector
              finally resp.body().close()
            if (page.size < pageSize) done = true
            page
          }
        }
        pages.flatten.map(Row.fromSeq)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Parameter names a keyset query must embed (wire parameters in
    * the transactional payload, never spliced into query text).
    */
  val KeysetAfter = "graftAfter"
  val KeysetUpper = "graftUpper"
  val KeysetPage = "graftPage"

  /** Keyset-paginated parallel read — the scale-safe alternative to
    * [[readPartitioned]]'s SKIP/LIMIT pages, whose server-side cost is
    * O(offset) per page (deep pages of a large result degrade
    * quadratically). A keyset page costs O(log n + pageSize) on an
    * indexed key regardless of page index.
    *
    * The key domain `(bounds._1, bounds._2]` splits into
    * `numPartitions` contiguous ranges; each executor task pages its
    * range with the last-seen key carried forward. The query embeds
    * the three pagination parameters itself — they travel as
    * transactional-payload parameters, so no text is ever spliced:
    *
    * {{{
    * MATCH (n:User) WHERE id(n) > $graftAfter AND id(n) <= $graftUpper
    * RETURN id(n) AS id, n.name ORDER BY id LIMIT $graftPage
    * }}}
    *
    * The key must be the ascending ORDER BY column, returned at
    * `keyIndex`, integral, and unique (a run of equal keys split
    * across a page boundary would drop rows). Probe `bounds` with a
    * cheap `RETURN min(key)-1, max(key)` through [[read]]. (Reference
    * contrast: Neo4jInputFormat is single-split by design —
    * NonParallelInput, Neo4jInputFormat.java:40.)
    */
  def readKeyset(spark: SparkSession, cfg: Neo4jConfig, schema: StructType,
      bounds: (Long, Long), keyIndex: Int = 0,
      numPartitions: Int = 4, pageSize: Int = 10000): DataFrame = {
    require(numPartitions >= 1 && pageSize >= 1, "bad partitioning")
    require(bounds._1 <= bounds._2, s"empty key domain $bounds")
    Seq(KeysetAfter, KeysetUpper, KeysetPage).foreach(p =>
      require(cfg.query.contains("$" + p),
        s"keyset query must reference $$$p (wire parameter)"))
    val (lo, hi) = bounds
    val span = hi - lo
    val nodes = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    val rows = spark.sparkContext
      .parallelize(0 until numPartitions, numPartitions)
      .flatMap { p =>
        val rangeLo = lo + span / numPartitions * p + math.min(p, span % numPartitions)
        val rangeHi = lo + span / numPartitions * (p + 1) + math.min(p + 1, span % numPartitions)
        val pages = new Iterator[Vector[Seq[Any]]] {
          private var after = rangeLo
          private var done = rangeLo >= rangeHi
          override def hasNext: Boolean = !done
          override def next(): Vector[Seq[Any]] = {
            val payload = CypherPayload.statementJson(cfg.query, Map(
              KeysetAfter -> nodes.numberNode(after),
              KeysetUpper -> nodes.numberNode(rangeHi),
              KeysetPage -> nodes.numberNode(pageSize)))
            val resp = Http.post(cfg, payload)
            val page =
              try Neo4jRowParser.parseRows(resp.body()).map(coerce(_, schema)).toVector
              finally resp.body().close()
            if (page.size < pageSize) done = true
            else after = page.last(keyIndex) match {
              case n: Number => n.longValue()
              case other => throw new java.io.IOException(
                s"keyset column $keyIndex must be integral, got $other")
            }
            page
          }
        }
        pages.flatten.map(Row.fromSeq)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Aligns parsed JSON scalars with the declared column types (the
    * reference relies on Flink tuple field types the same way).
    */
  private[neo4j] def coerce(values: Array[Any], schema: StructType): Seq[Any] =
    values.toSeq.zip(schema.fields).map {
      case (null, _) => null
      case (v: Number, f) => f.dataType match {
        case IntegerType => v.intValue()
        case LongType    => v.longValue()
        case DoubleType  => v.doubleValue()
        case FloatType   => v.floatValue()
        case _           => v
      }
      case (v, _) => v
    }
}

/** Writes a DataFrame to Neo4j as batched `UNWIND $param` statements —
  * the Spark twin of Neo4jOutputFormat: per-partition accumulation
  * with bounded batch size and a final flush on partition end
  * (Neo4jOutputFormat.java:104-116, writeRecord/close), executed in
  * parallel across partitions like the reference's parallel tasks.
  */
object Neo4jWriter {

  def write(df: DataFrame, cfg: Neo4jConfig, parameterKeys: Seq[String],
      batchSize: Int = 1000): Unit = {
    require(parameterKeys.nonEmpty, "No parameter keys were supplied.")
    val param = CypherPayload.parameterName(cfg.query)
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      var batch = mapper.createArrayNode()

      // whole payload built by jackson (query text AND parameter rows),
      // so no hand-spliced JSON anywhere on the wire path
      def flush(): Unit = if (batch.size() > 0) {
        val payload = CypherPayload.statementJson(cfg.query, Map(param -> batch))
        Http.post(cfg, payload, replaySafe = cfg.idempotentWrites)
          .body().close()
        batch = mapper.createArrayNode()
      }

      rows.foreach { row =>
        val node = batch.addObject()
        parameterKeys.zipWithIndex.foreach { case (key, i) =>
          row.get(i) match {
            case null       => node.putNull(key)
            case b: Boolean => node.put(key, b)
            case x: Int     => node.put(key, x)
            case x: Long    => node.put(key, x)
            case x: Float   => node.put(key, x)
            case x: Double  => node.put(key, x)
            case s: String  => node.put(key, s)
            case other => throw new java.io.IOException(
              s"Unsupported field type for value: $other " +
                s"(column ${schema.fields(i).name})")
          }
        }
        if (batch.size() >= batchSize) flush()
      }
      flush()
    }
  }
}
