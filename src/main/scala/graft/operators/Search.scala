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

  /** Fuzzy entity-name resolution by edit distance ≤ 1 — the
    * SymSpell deletion-neighborhood join (Garbe's method, the
    * production fuzzy-lookup structure): every DISTINCT name emits
    * itself plus its one-character-deletion variants, names sharing a
    * variant are candidates (provably complete for distance ≤ 1:
    * a substitution deletes to the same string from both sides, an
    * insertion's extra character deletes down to the partner), and
    * exact `levenshtein` verifies only the candidates — never an
    * all-pairs comparison. Output: matched name pairs with their
    * entity counts, the merge work-list entity resolution feeds on.
    *
    * 100 TB notes: the join domain is the distinct-name VOCABULARY
    * (entity catalogs are orders of magnitude smaller than the rows
    * that mention them — the first groupBy collapses corpus-scale to
    * catalog-scale with map-side partials); deletion variants
    * multiply the vocabulary by ~name-length only, and the candidate
    * exchange carries 16-byte variant hashes, never the names.
    */
  /** One name's SymSpell deletion neighborhood (itself + every
    * one-character deletion) — the JVM twin of [[fuzzyNames]]'
    * variant expression, shared with the streaming canonicalizer.
    */
  private[graft] def deletionVariants(name: String): Seq[String] =
    (name +: (0 until name.length).map(i =>
      name.substring(0, i) + name.substring(i + 1))).distinct

  /** Exact Levenshtein distance (classic DP) — candidate verification
    * for the streaming canonicalizer; small strings only (entity
    * names), O(|a|·|b|).
    */
  private[graft] def levenshteinJvm(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(identity)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(a.length)
  }

  /** The SymSpell LOOKUP index for a name catalog: deletion-variant →
    * candidate names. Built once from the (small) distinct-name
    * catalog and shipped in the task closure / broadcast — the
    * serving artifact of [[fuzzyNames]]' offline join.
    */
  private[graft] def symspellIndex(catalog: Seq[String])
      : Map[String, Seq[String]] =
    catalog.flatMap(n => deletionVariants(n).map(_ -> n))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap

  /** Canonicalize one mention against a SymSpell index: the nearest
    * catalog name within edit distance 1 — exact match always wins,
    * then the lexicographically smallest at distance 1 (deterministic
    * tie-break) — or None. The per-record arithmetic of
    * `StreamingJobs.canonicalizeNames`.
    */
  private[graft] def canonicalizeJvm(mention: String,
      index: Map[String, Seq[String]]): Option[String] = {
    val cands = deletionVariants(mention)
      .flatMap(index.getOrElse(_, Nil)).distinct
    cands.map(c => (levenshteinJvm(mention, c), c))
      .filter(_._1 <= 1).sorted.headOption.map(_._2)
  }

  /** End-to-end entity resolution over the name catalog: the fuzzy
    * pair graph of [[fuzzyNames]] closes transitively into clusters
    * (connected components over name-hash ids from the shared
    * [[graft.OracleHash]] family — both engines derive identical
    * ids), and every name maps to its cluster's canonical
    * representative (the member with the smallest hash id —
    * deterministic, engine-independent). The merge MAP entity
    * resolution actually applies to rows, one step past the pair
    * work-list.
    *
    * 100 TB notes: everything after the catalog groupBy is
    * vocabulary-sized; the component loop runs on the fuzzy-pair
    * graph only (pairs ≪ names), with singleton names defaulting to
    * themselves via one left join — the dedup_clusters shape on the
    * entity catalog.
    */
  def nameClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .as[(String, Long)]
      .map { case (n, c) => (n, graft.OracleHash.poly(n, 0L), c) }
      .toDF("name", "nid", "n_parts")
    val pairs = fuzzyNames(spark, sfDir).select(col("a_name"), col("b_name"))
    val edges = pairs
      .join(names.select(col("name").as("a_name"), col("nid").as("src")),
        Seq("a_name"))
      .join(names.select(col("name").as("b_name"), col("nid").as("dst")),
        Seq("b_name"))
      .select(col("src"), col("dst"))
    // fuzzy-PAIR graphs are vocabulary-bounded by construction — the
    // same size-gated union-find opt-in dedup_clusters uses
    val comp = graft.graph.Algorithms
      .connectedComponents(edges, localEdgeCap = 1 << 20)
    names
      .join(comp.select(col("id").as("nid"), col("comp")), Seq("nid"),
        "left_outer")
      .withColumn("cid", coalesce(col("comp"), col("nid")))
      .join(names.select(col("nid").as("cid"), col("name").as("canonical")),
        Seq("cid"))
      .select(col("name"), col("canonical"), col("n_parts"))
      .orderBy(col("name"))
  }

  def fuzzyNames(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val variants = names.select(col("name"), explode(expr(
        "array_union(array(name), transform(sequence(1, length(name)), " +
          "i -> concat(substring(name, 1, i - 1), " +
          "substring(name, i + 1, length(name)))))")).as("v"))
      .select(col("name"), md5(col("v")).as("vh")).distinct()
    val cands = variants.as("a").join(variants.as("b"),
        col("a.vh") === col("b.vh") && col("a.name") < col("b.name"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= 1)
      .join(names.select(col("name").as("a_name"),
        col("n_parts").as("a_parts")), Seq("a_name"))
      .join(names.select(col("name").as("b_name"),
        col("n_parts").as("b_parts")), Seq("b_name"))
      .select(col("a_name"), col("b_name"), col("dist"),
        col("a_parts"), col("b_parts"))
      .orderBy(col("a_name"), col("b_name"))
  }
}
