package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY §2.3 #19-22):
  * exact, word-n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale discipline (the 100 TB story):
  *  - nothing here ever self-joins raw text: candidate generation
  *    always goes through an inverted index (shared shingle / LSH band
  *    / simhash block) so the shuffle carries hashes, not documents;
  *  - signatures are fixed-size (MinHash: 128×8 B; SimHash: 8 B) —
  *    orders of magnitude smaller than the documents they stand for;
  *  - hot shingles are capped (stop-shingle guard) so one degenerate
  *    key cannot produce a quadratic bucket.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * the canonical representative. One shuffle on a 128-bit hash —
    * uniformly distributed, no skew, no text in the shuffle.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("keep_doc_id"))

  /** Lower-cased word array of a document, the shared tokenization for
    * all near-dup operators (also mirrored in the DuckDB oracle).
    */
  private def words(c: Column): Column =
    split(lower(trim(c)), "\\s+")

  /** Word 3-gram shingles of `text` as an array of strings. */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = words(c)
    // slide an n-window over the word array: transform over indices
    filter_(
      transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => when(size(w) >= n,
          concat_ws(" ", slice(w, i + 1, lit(n))))),
      x => x.isNotNull)
  }

  private def filter_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.filter(c, f)

  /** Near-dup pairs by exact word-3-gram Jaccard ≥ τ.
    *
    * Inverted-index plan: explode distinct shingles → hash → self-join
    * on shingle hash to count the intersection |A∩B| per candidate
    * pair → Jaccard = |A∩B| / (|A|+|B|-|A∩B|). Only pairs sharing at
    * least one shingle are ever materialized, and the join key is an
    * 8-byte hash. Hot shingles (df > stopShingleCap) are dropped on
    * both sides — they only connect near-everything and cannot decide
    * a high-τ pair on their own.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      stopShingleCap: Int = 1000): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(shingles(col("text"))).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("sh_hash"))

    val hot = docs.groupBy(col("sh_hash")).count()
      .filter(col("count") > stopShingleCap).select(col("sh_hash"))
    val pruned = docs.join(broadcast(hot), Seq("sh_hash"), "left_anti")

    val a = pruned.select(col("sh_hash"), col("doc_id").as("a_id"), col("n_sh").as("a_n"))
    val b = pruned.select(col("sh_hash"), col("doc_id").as("b_id"), col("n_sh").as("b_n"))
    a.join(b, Seq("sh_hash"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("a_n") + col("b_n") - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash signature of the shingle set: `numPerms` permutations
    * approximated by seeded xxhash64, signature element i = min over
    * shingles of hash(shingle, seed=i). Computed columnar: explode →
    * groupBy(doc) with min-aggregate per permutation — one shuffle,
    * map-side partials.
    */
  def minhashSignatures(docs: DataFrame, numPerms: Int): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(array_distinct(shingles(col("text")))).as("s"))
    val aggs = (0 until numPerms).map(i =>
      min(xxhash64(col("s"), lit(i))).as(s"h$i"))
    exploded.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerms).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup: b bands × r rows banding over the MinHash
    * signature; docs colliding in any band become candidates; a
    * verification pass computes the estimated Jaccard from full
    * signatures and keeps pairs ≥ τ.
    *
    * At 100 TB: the banding join shuffles (band_id, band_hash, doc_id)
    * — 24 B rows; text is never shuffled. Verification joins the 1 KB
    * signatures for candidate pairs only.
    */
  def minhashLsh(spark: SparkSession, sfDir: String, tau: Double = 0.6,
      numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val r = numPerms / bands
    val sigs = minhashSignatures(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), numPerms)
      .cache()

    val banded = sigs.select(col("doc_id"),
        posexplode(array((0 until bands).map(bnd =>
          xxhash64(concat_ws(",",
            (0 until r).map(j => col("sig").getItem(bnd * r + j)): _*))): _*))
          .as(Seq("band", "band_hash")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()

    cands
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard", round(
        size(filter_(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y),
          identity(_))).cast("double") / numPerms, 6))
      .filter(col("est_jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash per document from word-unigram hashes: for each of
    * the 64 bit positions, sum ±1 over token hashes and take the sign.
    * Columnar formulation: explode tokens → per-bit conditional sums.
    * Output: doc_id, simhash (as long).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)).as(s"b$i")
    }
    toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ k (default 3) via
    * the pigeonhole principle: split the 64-bit hash into k+1 = 4
    * 16-bit blocks; any pair within distance k must agree exactly on
    * ≥1 block → join per block, then verify true Hamming distance.
    * Join keys are (block_idx, block_value) — no all-pairs comparison.
    */
  def simhashNearDup(spark: SparkSession, sfDir: String, maxHamming: Int = 3)
      : DataFrame = {
    val sigs = simhashSignatures(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .cache()
    val blocks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("blk", "blk_val")))
    val pairs = blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_val") === col("y.blk_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.simhash").as("a_sh"),
        col("y.doc_id").as("b_id"), col("y.simhash").as("b_sh"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
