package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) corpus source/sink — the interchange
  * format most raw LLM training corpora arrive in (one document per
  * line), alongside the parquet the engine uses internally.
  *
  * 100 TB notes:
  *  - the schema is DECLARED, never inferred: schema inference is a
  *    full extra pass over the data (Spark samples every file), which
  *    at corpus scale doubles the read. A missing field is null, a
  *    malformed line lands in `_corrupt_record` instead of failing the
  *    job (PERMISSIVE), so one bad shard can't kill a 1000-executor
  *    ingest — count the corrupt column and quarantine instead.
  *  - uncompressed/`gzip` JSONL files split by line (gzip files are
  *    one split each — prefer zstd/bzip2 or many shards for
  *    parallelism); the reader parallelizes per file split with no
  *    driver involvement.
  *  - the sink writes the same schema back, so jsonl → transform →
  *    jsonl round-trips losslessly for downstream tokenizer pipelines.
  */
object JsonlCorpus {

  /** The documents-table schema (mirrors documents.parquet). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Reads a JSONL corpus with a declared schema; malformed lines
    * surface in `_corrupt_record`, not as job failures.
    *
    * Implementation: `text` source + explicit `from_json` rather than
    * the JSON datasource — same line-split parallel scan and
    * whole-stage-codegen parse, but without the datasource's
    * "corrupt-column-only queries must be cached" restriction, so
    * [[corruptCount]] stays a plain streaming count.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame = {
    // _corrupt_record declared INSIDE the parse struct: PERMISSIVE
    // from_json fills it with the raw line on malformed input (a null
    // struct is never produced, so a when(isNull) probe can't work)
    val full = schema.add("_corrupt_record", StringType)
    val opts = Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
    spark.read.textFile(path).toDF("value")
      .select(org.apache.spark.sql.functions
        .from_json(col("value"), full, opts).as("r"))
      .select(full.fieldNames.map(f => col(s"r.$f")).toIndexedSeq: _*)
  }

  /** The well-formed rows only (corrupt column dropped). */
  def readClean(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): DataFrame =
    read(spark, path, schema)
      .filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Count of malformed lines — the quarantine metric an ingest job
    * alerts on.
    */
  def corruptCount(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): Long =
    read(spark, path, schema).filter(col("_corrupt_record").isNotNull).count()

  /** Writes a frame as JSONL shards (one JSON object per line). */
  def write(df: DataFrame, path: String,
      shards: Option[Int] = None): Unit = {
    val out = shards.map(df.repartition(_)).getOrElse(df)
    out.write.mode(SaveMode.Overwrite).json(path)
  }
}
