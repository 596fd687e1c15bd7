package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §5). AQE's skew-join handling
  * covers joins; pathological AGGREGATION keys (one key holding half
  * the corpus — think empty-string documents or a boilerplate shingle)
  * need salting: a deterministic salt splits the hot key across
  * reducers for a partial aggregate, and a second tiny aggregate over
  * (key → salts) merges the partials. Only decomposable aggregates
  * (sum/count/min/max) qualify — which is exactly what the dedup and
  * stats operators use.
  */
object Skew {

  /** Two-phase salted sum/count per key. The salt derives from a hash
    * of `saltBy` (any column with per-row variety, e.g. the row id) so
    * results are deterministic — no rand(), which would break retries
    * and the oracle.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltBy: Column, salts: Int = 16): DataFrame =
    df.select(key.as("__k"), value.as("__v"),
        pmod(hash(saltBy), lit(salts)).as("__salt"))
      .groupBy(col("__k"), col("__salt"))
      .agg(sum(col("__v")).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(col("__k"))
      .agg(sum(col("__ps")).as("sum_value"), sum(col("__pc")).as("n"))
      .withColumnRenamed("__k", "key")

  /** The declared salted-aggregation query (`skew_salted_agg`):
    * per-event-type value totals over `events`, where event_type is a
    * pathologically hot key (a handful of values across the whole
    * corpus). Value accumulates through decimal(18,4), so the
    * two-phase salted sum is exactly the single-phase sum regardless
    * of salt assignment — which is what lets a plain GROUP BY oracle
    * check the salted plan.
    */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    saltedSumCount(Tables.events(spark, sfDir),
        col("event_type"), col("value").cast("decimal(18,4)"), col("event_id"))
      .select(col("key"), col("sum_value").cast("double").as("sum_value"), col("n"))
      .orderBy(col("key"))

  /** Deterministic salted JOIN: the fact side salts its key with a
    * hash of a per-row column (never rand() — retries and the oracle
    * need stability), the dim side replicates ×salts, and the join
    * runs on (key, salt) so one hot key spreads across `salts`
    * reducers. Join semantics are untouched — every fact row still
    * meets its dim row exactly once — which is what lets a plain-join
    * oracle certify the salted plan. Use when a specific hot key is
    * KNOWN and AQE's size-based skew split isn't enough (AQE can't
    * split a single in-flight hash bucket); the dim must be small
    * enough to replicate ×salts but too big (or too churn-prone) to
    * broadcast.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBy: Column, salts: Int = 8): DataFrame = {
    val f = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash hint: a salted join IS the shuffle-join escape
    // hatch, letting Spark broadcast the replicated dim would defeat
    // the exercise (and at production dim sizes isn't an option)
    f.join(d.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** The declared salted-join query (`skew_salted_join`): every event
    * enriched with its user's first-activity timestamp via the salted
    * (user_id, salt) join — user_id standing in for the hot-key role
    * an abusive account or a null-bucket plays in production streams.
    */
  def saltedJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val dim = e.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    saltedJoin(e, dim, "user_id", col("event_id"))
      .select(col("event_id"), col("user_id"), col("first_ts"),
        (col("ts") === col("first_ts")).cast("int").as("is_first"))
      .orderBy(col("event_id"))
  }
}
