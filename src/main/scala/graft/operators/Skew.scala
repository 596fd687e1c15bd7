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
}
