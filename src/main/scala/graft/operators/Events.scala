package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, batch form (SURVEY §2.2 #17-18). The
  * streaming twins in graft.streaming use the same column logic over
  * readStream; keeping the transformation identical is what makes the
  * batch DuckDB oracle meaningful for the streaming path.
  */
object Events {

  /** Tumbling 1-hour event-time window aggregation. Uses the same
    * `window()` construct Structured Streaming uses, so this exact
    * plan runs incrementally under a watermark (see
    * graft.streaming.StreamingJobs).
    * 100 TB notes: one shuffle on (window, event_type); partial aggs
    * map-side; window start derived arithmetically (codegen'd), no UDF.
    */
  def windowAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization: a new session starts when a user is
    * idle > 30 minutes. Classic lag + cumulative-sum formulation —
    * fully window-based, so it is a single shuffle on user_id and is
    * exactly expressible in the DuckDB oracle.
    * 100 TB notes: shuffle on user_id only; per-user state is a sort
    * within partition. The streaming twin keeps O(1) state per key via
    * flatMapGroupsWithState instead of a sort.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }
}
