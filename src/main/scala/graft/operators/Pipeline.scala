package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pretraining-corpus pipeline summaries — the shape of
  * job a training-data curation run finishes with: how many documents
  * survived each gate and how many tokens the kept corpus holds.
  */
object Pipeline {

  /** One-row corpus summary: total docs, docs passing the quality
    * gate, exact-unique docs, and whitespace/BPE-ish token totals.
    * Three independent single-row aggregates cross-joined — the
    * quality and token ones are pure map-side-combined scan
    * aggregations; only the distinct-hash count pays a keyed shuffle
    * (of 16-byte hashes, the unavoidable cost of an exact distinct).
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
    val tokens = TextAnalysis.tokens(spark, sfDir)
      .agg(sum(col("ws_tokens")).as("ws_tokens_total"),
        sum(col("bpe_tokens")).as("bpe_tokens_total"))
    val unique = Tables.documents(spark, sfDir)
      .agg(count_distinct(md5(col("text"))).as("n_unique"))
    quality.crossJoin(unique).crossJoin(tokens)
      .select(col("n_docs"), col("n_kept"), col("n_unique"),
        col("ws_tokens_total"), col("bpe_tokens_total"))
  }
}
