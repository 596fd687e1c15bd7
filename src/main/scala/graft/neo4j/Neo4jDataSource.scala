package graft.neo4j

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Row

/** DataSource V2 surface for the Neo4j transactional HTTP endpoint:
  *
  * {{{
  *   spark.read.format("graft-neo4j")
  *     .schema("id LONG, name STRING")
  *     .option("url", "http://host:7474/db/data/")
  *     .option("query", "MATCH (n:User) RETURN n.id, n.name ORDER BY n.id")
  *     .option("mode", "pages")          // single | pages | keyset
  *     .option("numPartitions", "8")
  *     .load()
  *
  *   df.write.format("graft-neo4j").mode("append")
  *     .option("url", "http://host:7474/db/data/")
  *     .option("query", "UNWIND $rows AS r CREATE (n:User {id: r.id})")
  *     .save()
  * }}}
  *
  * This is the Spark-native spelling of the reference's
  * Neo4jInputFormat/Neo4jOutputFormat pair (registered formats rather
  * than programmatic calls); the wire protocol, pagination and retry
  * semantics are the ones in [[Neo4jReader]]/[[Neo4jWriter]], re-hosted
  * inside Spark's partition planning so the fetches run IN EXECUTOR
  * TASKS — including `single` mode, where the one fetch happens in the
  * one task rather than on the driver. Schema is explicit by contract
  * (Cypher results are untyped JSON; the reference requires Flink
  * tuple types the same way).
  *
  * Scale notes: `pages` interleaves SKIP/LIMIT pages across
  * `numPartitions` readers; `keyset` gives each reader a disjoint key
  * range it walks with O(page) server cost per request (no deep-skip
  * scans) — the mode to use against a large store. Writes batch rows
  * into `UNWIND $param` payloads per partition; the transactional
  * endpoint commits per request, so the sink is at-least-once under
  * retry only when `idempotentWrites` is set (MERGE-style statements)
  * and fail-fast otherwise — same contract as [[Neo4jWriter]].
  * `writeStream.format("graft-neo4j")` ships the same per-partition
  * UNWIND batches per micro-batch epoch (r17); streaming REQUIRES
  * `idempotentWrites` because a failed epoch replays, and a
  * statement may reference `$graftEpoch` for replay bookkeeping.
  */
final class Neo4jTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-neo4j"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-neo4j cannot infer a schema: Cypher results are untyped JSON. " +
        "Provide one with .schema(...) — column i binds to RETURN expression i.")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new Neo4jTable(schema, properties)
}

private[neo4j] object Neo4jDataSource {
  def config(o: CaseInsensitiveStringMap): Neo4jConfig = Neo4jConfig(
    restUri = require(o, "url"),
    query = require(o, "query"),
    username = Option(o.get("username")),
    password = Option(o.get("password")),
    connectTimeoutMs = o.getInt("connectTimeoutMs", 1000),
    readTimeoutMs = o.getInt("readTimeoutMs", 1000),
    maxRetries = o.getInt("maxRetries", 3),
    retryBackoffMs = o.getInt("retryBackoffMs", 100),
    idempotentWrites = o.getBoolean("idempotentWrites", false))

  def require(o: CaseInsensitiveStringMap, key: String): String = {
    val v = o.get(key)
    if (v == null || v.isEmpty)
      throw new IllegalArgumentException(s"graft-neo4j: missing option '$key'")
    v
  }
}

private[neo4j] final class Neo4jTable(
    schema: StructType, props: java.util.Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-neo4j"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // table properties (from the provider) + per-read options
    val merged = new java.util.HashMap[String, String](props)
    merged.putAll(options)
    new Neo4jScanBuilder(schema, new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new java.util.HashMap[String, String](props)
    merged.putAll(info.options())
    new Neo4jWriteBuilder(info.schema(), new CaseInsensitiveStringMap(merged))
  }
}

// ---------------------------------------------------------------- read

private[neo4j] final class Neo4jScanBuilder(
    schema: StructType, options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = {
    val cfg = Neo4jDataSource.config(options)
    val mode = options.getOrDefault("mode", "single")
    val numPartitions = options.getInt("numPartitions", 4)
    val pageSize = options.getInt("pageSize", 10000)
    mode match {
      case "single" | "pages" | "keyset" => ()
      case other => throw new IllegalArgumentException(
        s"graft-neo4j: unknown mode '$other' (single | pages | keyset)")
    }
    if (mode == "pages")
      // same guard as Neo4jReader.readPartitioned: appending our own
      // window onto a self-paginating query returns the wrong subset
      if ("""(?is).*\b(SKIP|LIMIT)\s+\d+\s*$""".r.matches(cfg.query))
        throw new IllegalArgumentException(
          "pages mode appends SKIP/LIMIT; the query must not end with its own")
    val bounds = if (mode == "keyset") {
      Seq(Neo4jReader.KeysetAfter, Neo4jReader.KeysetUpper,
        Neo4jReader.KeysetPage).foreach(p =>
        if (!cfg.query.contains("$" + p))
          throw new IllegalArgumentException(
            s"keyset mode: query must reference $$$p (wire parameter)"))
      (options.getLong("keysetLo", 0L), options.getLong("keysetHi", 0L))
    } else (0L, 0L)
    if (mode == "keyset" && bounds._1 > bounds._2)
      throw new IllegalArgumentException(
        s"keyset mode: empty key domain $bounds (set keysetLo/keysetHi)")
    new Neo4jScan(schema, cfg, mode, numPartitions, pageSize, bounds,
      options.getInt("keyIndex", 0),
      Option(options.get("maxKeyQuery")).filter(_.nonEmpty),
      options.getLong("startKey", options.getLong("keysetLo", 0L)))
  }
}

private[neo4j] final case class Neo4jInputPartition(
    index: Int, rangeLo: Long, rangeHi: Long) extends InputPartition

private[neo4j] final class Neo4jScan(
    schema: StructType, cfg: Neo4jConfig, mode: String,
    numPartitions: Int, pageSize: Int, bounds: (Long, Long), keyIndex: Int,
    maxKeyQuery: Option[String] = None, startKey: Long = 0L)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-neo4j $mode ${cfg.endpoint}"

  override def planInputPartitions(): Array[InputPartition] = mode match {
    case "single" => Array(Neo4jInputPartition(0, 0L, 0L))
    case "pages" =>
      (0 until numPartitions).map(Neo4jInputPartition(_, 0L, 0L)).toArray
    case "keyset" =>
      Neo4jScan.keysetRanges(bounds._1, bounds._2, numPartitions)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Neo4jReaderFactory(schema, cfg, mode, numPartitions, pageSize, keyIndex)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(mode == "keyset",
      "graft-neo4j streaming requires mode=keyset (a monotone key is " +
        "the only offset a Cypher endpoint can tail)")
    val maxQ = maxKeyQuery.getOrElse(throw new IllegalArgumentException(
      "graft-neo4j streaming: set maxKeyQuery (e.g. " +
        "'MATCH (n:User) RETURN max(id(n))') — it polls the high-water key"))
    new Neo4jMicroBatchStream(schema, cfg, maxQ, numPartitions, pageSize,
      keyIndex, startKey)
  }
}

private[neo4j] object Neo4jScan {
  /** Contiguous key ranges over (lo, hi], remainder spread over the
    * first ranges — same arithmetic as Neo4jReader.readKeyset.
    */
  def keysetRanges(lo: Long, hi: Long, numPartitions: Int): Array[InputPartition] = {
    val span = hi - lo
    (0 until numPartitions).map { p =>
      val rLo = lo + span / numPartitions * p + math.min(p.toLong, span % numPartitions)
      val rHi = lo + span / numPartitions * (p + 1) + math.min(p + 1L, span % numPartitions)
      Neo4jInputPartition(p, rLo, rHi)
    }.filter(r => r.rangeLo < r.rangeHi).toArray[InputPartition]
  }
}

private[neo4j] final case class Neo4jOffset(key: Long) extends Offset {
  override def json(): String = key.toString
}

/** Micro-batch streaming read — the CDC-style TAIL of an append-only
  * store with a monotonically increasing key (the id-batch pattern
  * the reference's write half produces): each trigger polls the
  * high-water key with `maxKeyQuery` (one tiny driver-side request),
  * and the batch reads exactly the `(lastOffset, latest]` key range,
  * split into the SAME disjoint keyset ranges the batch reader plans,
  * so every fetch still runs in an executor task. Offsets are plain
  * key values — restart-safe through the checkpoint, and rows are
  * read exactly once as long as the key only grows (the documented
  * contract; deletes/updates are out of scope for a tail).
  */
private[neo4j] final class Neo4jMicroBatchStream(
    schema: StructType, cfg: Neo4jConfig, maxKeyQuery: String,
    numPartitions: Int, pageSize: Int, keyIndex: Int, startKey: Long)
    extends MicroBatchStream {

  override def initialOffset(): Offset = Neo4jOffset(startKey)

  override def latestOffset(): Offset = {
    val resp = Http.post(cfg, CypherPayload.statementJson(maxKeyQuery),
      replaySafe = true) // a read: always safe to retry
    val rows =
      try Neo4jRowParser.parseRows(resp.body()).toVector
      finally resp.body().close()
    val latest = rows.headOption.flatMap(_.headOption) match {
      case Some(n: Number) => n.longValue()
      case _               => startKey // empty store: stay put
    }
    Neo4jOffset(math.max(latest, startKey))
  }

  override def deserializeOffset(json: String): Offset =
    Neo4jOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Neo4jScan.keysetRanges(start.asInstanceOf[Neo4jOffset].key,
      end.asInstanceOf[Neo4jOffset].key, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new Neo4jReaderFactory(schema, cfg, "keyset", numPartitions, pageSize, keyIndex)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[neo4j] final class Neo4jReaderFactory(
    schema: StructType, cfg: Neo4jConfig, mode: String,
    numPartitions: Int, pageSize: Int, keyIndex: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[Neo4jInputPartition]
    val pages: Iterator[Vector[Seq[Any]]] = mode match {
      case "single" => new Iterator[Vector[Seq[Any]]] {
        private var done = false
        override def hasNext: Boolean = !done
        override def next(): Vector[Seq[Any]] = {
          done = true
          val resp = Http.post(cfg, CypherPayload.statementJson(cfg.query))
          try Neo4jRowParser.parseRows(resp.body())
            .map(Neo4jReader.coerce(_, schema)).toVector
          finally resp.body().close()
        }
      }
      case "pages" => new Iterator[Vector[Seq[Any]]] {
        private var k = 0
        private var done = false
        override def hasNext: Boolean = !done
        override def next(): Vector[Seq[Any]] = {
          val skip = (p.index.toLong + k.toLong * numPartitions) * pageSize
          k += 1
          val paged = s"${cfg.query} SKIP $skip LIMIT $pageSize"
          val resp = Http.post(cfg, CypherPayload.statementJson(paged))
          val page =
            try Neo4jRowParser.parseRows(resp.body())
              .map(Neo4jReader.coerce(_, schema)).toVector
            finally resp.body().close()
          if (page.size < pageSize) done = true
          page
        }
      }
      case "keyset" =>
        val nodes = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
        new Iterator[Vector[Seq[Any]]] {
          private var after = p.rangeLo
          private var done = p.rangeLo >= p.rangeHi
          override def hasNext: Boolean = !done
          override def next(): Vector[Seq[Any]] = {
            val payload = CypherPayload.statementJson(cfg.query, Map(
              Neo4jReader.KeysetAfter -> nodes.numberNode(after),
              Neo4jReader.KeysetUpper -> nodes.numberNode(p.rangeHi),
              Neo4jReader.KeysetPage -> nodes.numberNode(pageSize)))
            val resp = Http.post(cfg, payload)
            val page =
              try Neo4jRowParser.parseRows(resp.body())
                .map(Neo4jReader.coerce(_, schema)).toVector
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
    }
    new PartitionReader[InternalRow] {
      private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      private val flat = pages.flatten
      private var current: InternalRow = _
      override def next(): Boolean =
        if (flat.hasNext) {
          current = toCatalyst(Row.fromSeq(flat.next())).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

// --------------------------------------------------------------- write

/** The wire parameter a streaming-write statement may reference to
  * see its micro-batch epoch (`… SET n.epoch = $graftEpoch`): bound
  * per batch only when the statement mentions it, enabling
  * statement-side replay bookkeeping on top of the MERGE idempotency
  * contract.
  */
private[neo4j] object Neo4jStreamingWrite { val EpochParam = "graftEpoch" }

private[neo4j] final class Neo4jWriteBuilder(
    schema: StructType, options: CaseInsensitiveStringMap) extends WriteBuilder {
  override def build(): Write = new Write {
    private val cfg = Neo4jDataSource.config(options)
    private val batchSize = options.getInt("batchSize", 1000)
    // fail at planning time, not per task: the statement must be an
    // UNWIND batch payload
    CypherPayload.parameterName(cfg.query)
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new Neo4jDataWriterFactory(schema, cfg, batchSize)
      // the transactional endpoint commits per request: there is no
      // job-level atomicity to add or roll back (same contract as the
      // reference's OutputFormat, which writes batches as it goes)
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
    // Streaming write (r17 — the reference's OutputFormat shape under
    // structured streaming): each micro-batch ships the same
    // per-partition UNWIND batches as the batch path. A failed epoch
    // REPLAYS under Spark's at-least-once sink contract and the
    // transactional endpoint commits per request (no rollback), so
    // the sink REQUIRES `idempotentWrites` — the option that both
    // declares the statement MERGE-shaped (replayed batches are
    // no-ops) and marks the HTTP posts replay-safe for retry. A
    // statement may reference `$graftEpoch` to record the epoch.
    override def toStreaming: StreamingWrite = {
      require(cfg.idempotentWrites,
        "graft-neo4j streaming write: a failed epoch is replayed " +
          "(at-least-once) and the transactional endpoint commits " +
          "per request with no rollback — set idempotentWrites=true " +
          "and use a MERGE-style statement so replays are no-ops")
      new StreamingWrite {
        override def createStreamingWriterFactory(
            info: PhysicalWriteInfo): StreamingDataWriterFactory =
          new Neo4jStreamingWriterFactory(schema, cfg, batchSize)
        override def commit(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
        override def abort(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
      }
    }
  }
}

private[neo4j] final case class Neo4jCommit(rows: Long) extends WriterCommitMessage

/** Row → UNWIND-batch writer shared by the batch and streaming write
  * paths (one payload shape, one type mapping — the twins cannot
  * drift). `extraParams` carries the streaming epoch when the
  * statement references it.
  */
private[neo4j] final class Neo4jRowWriter(
    schema: StructType, cfg: Neo4jConfig, batchSize: Int,
    extraParams: Map[String, com.fasterxml.jackson.databind.JsonNode])
    extends DataWriter[InternalRow] {
  private val param = CypherPayload.parameterName(cfg.query)
  private val keys = schema.fields.map(_.name)
  private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private var batch = mapper.createArrayNode()
  private var written = 0L

  private def flush(): Unit = if (batch.size() > 0) {
    val payload = CypherPayload.statementJson(cfg.query,
      extraParams + (param -> batch))
    Http.post(cfg, payload, replaySafe = cfg.idempotentWrites).body().close()
    batch = mapper.createArrayNode()
  }

  override def write(record: InternalRow): Unit = {
    val row = toScala(record).asInstanceOf[Row]
    val node = batch.addObject()
    keys.zipWithIndex.foreach { case (key, i) =>
      row.get(i) match {
        case null       => node.putNull(key)
        case b: Boolean => node.put(key, b)
        case x: Int     => node.put(key, x)
        case x: Long    => node.put(key, x)
        case x: Float   => node.put(key, x)
        case x: Double  => node.put(key, x)
        case s: String  => node.put(key, s)
        case other => throw new java.io.IOException(
          s"Unsupported field type for value: $other (column $key)")
      }
    }
    written += 1
    if (batch.size() >= batchSize) flush()
  }
  override def commit(): WriterCommitMessage = { flush(); Neo4jCommit(written) }
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

private[neo4j] final class Neo4jDataWriterFactory(
    schema: StructType, cfg: Neo4jConfig, batchSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new Neo4jRowWriter(schema, cfg, batchSize, Map.empty)
}

private[neo4j] final class Neo4jStreamingWriterFactory(
    schema: StructType, cfg: Neo4jConfig, batchSize: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val nodes = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    val extra =
      if (cfg.query.contains("$" + Neo4jStreamingWrite.EpochParam))
        Map(Neo4jStreamingWrite.EpochParam ->
          (nodes.numberNode(epochId): com.fasterxml.jackson.databind.JsonNode))
      else Map.empty[String, com.fasterxml.jackson.databind.JsonNode]
    new Neo4jRowWriter(schema, cfg, batchSize, extra)
  }
}
