package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus — the ranking side of a
  * training-data pipeline (query-targeted subset selection, nearest
  * public analog: Lucene/Elasticsearch scoring, here as one
  * distributed scan + a tiny broadcast of corpus statistics).
  */
object Search {

  /** BM25 top-k for a fixed bag of query terms (k1 = 1.2, b = 0.75,
    * the Robertson/Sparck-Jones defaults, with the +1 idf smoothing
    * that keeps every term's contribution positive).
    *
    * Plan: one pass computes per-document term frequencies and length
    * from the tokenized text (all codegen'd higher-order functions —
    * no UDF, no explode: the per-term `filter(ws, …)` counts stay
    * inside the row, so nothing wider than (doc_id, 3 ints) leaves
    * the scan); a second single-row aggregate collects the corpus
    * stats (N, avgdl, per-term df) and broadcasts them back; the only
    * multi-row exchange is the final top-k sort, which AQE runs as a
    * per-partition limit + tiny merge. At 100 TB the corpus-stats row
    * is still one row, so the shape is two scans and a k-row result.
    *
    * Scores are rounded to 6 dp and ordered on the ROUNDED value with
    * doc_id as tiebreak, so the DuckDB oracle (identical expression
    * tree, same literal constants) sorts bit-identically.
    */
  def bm25TopK(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"), k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val ws = split(lower(trim(col("text"))), "\\s+")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(ws, w => w === lit(t))).cast("long").as(s"tf${i + 1}")
    }
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("doc_id") +: size(ws).cast("long").as("dl") +: tfCols: _*)
    val statAggs =
      count(lit(1)).as("n") +: avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf${i + 1}") > 0, 1L).otherwise(0L)).as(s"df${i + 1}"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)

    def idf(dfc: Column): Column =
      log((col("n") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1))
    def weight(tf: Column): Column =
      tf * lit(2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val score = terms.indices
      .map(i => idf(col(s"df${i + 1}")) * weight(col(s"tf${i + 1}")))
      .reduce(_ + _)

    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
