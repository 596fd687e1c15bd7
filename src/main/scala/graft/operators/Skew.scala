package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
