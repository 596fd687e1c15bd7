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

  /** Volume-anomaly screen: hourly event counts per type, z-scored
    * against that type's own hourly distribution — the standard
    * ops-analytics alarm for traffic spikes/drops. Mean and stddev
    * come from exact decimal moments over the (already tiny) hourly
    * frame, so the z-scores are parallel-order-independent and
    * oracle-exact.
    *
    * 100 TB notes: the raw corpus pays exactly ONE shuffle — the
    * (hour, type) partial-agg count (same shape as [[windowAgg]]).
    * Everything after operates on hours×types rows: the per-type
    * moment agg and the join back are both trivially broadcast-sized.
    */
  def anomaly(spark: SparkSession, sfDir: String, zTau: Double = 3.0): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val moments = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_hours"),
      sum(col("n_events")).as("s1"),
      sum(col("n_events") * col("n_events")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n_hours")).as("mean_n"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n_hours")) /
          (col("n_hours") - lit(1L))).as("sd_n"))
    hourly.join(broadcast(moments), Seq("event_type"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("mean_n"), 6).as("mean_n"),
        round((col("n_events") - col("mean_n")) / col("sd_n"), 6).as("z"),
        (abs(col("n_events") - col("mean_n")) / col("sd_n") > zTau)
          .cast("int").as("anomalous"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Temporally-ordered funnel: users who viewed, then clicked after
    * their first view, then purchased after that first qualifying
    * click. Each stage is one filtered groupBy(user_id) min-timestamp
    * plus a join against the previous stage's (small, per-user) frame
    * — AQE broadcasts the stage frames, so the event table is scanned
    * per stage but never shuffled whole.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def stage(evType: String, prev: Option[DataFrame], prevTs: String, outTs: String)
        : DataFrame = {
      val base = ev.filter(col("event_type") === evType)
      val gated = prev match {
        case Some(p) => base.join(p, "user_id").filter(col("ts") >= col(prevTs))
        case None    => base
      }
      gated.groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
    }
    val t1 = stage("view", None, "", "t1")
    val t2 = stage("click", Some(t1), "t1", "t2")
    val t3 = stage("purchase", Some(t2), "t2", "t3")
    t1.agg(count(lit(1)).as("n_view"))
      .crossJoin(t2.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(t3.agg(count(lit(1)).as("n_funnel")))
  }

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

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event; each later active week increments that cohort's
    * retention counter at its week offset.
    *
    * 100 TB notes: the first-activity aggregate and the activity join
    * share the user_id key, so the shuffle partitioning is computed
    * once and reused (no second exchange of the event table); the
    * per-day DISTINCT collapses each user's events before the final
    * tiny (cohort_week, week_offset) aggregate. Nothing here is
    * per-event after the first partial aggregation.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(
        date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        col("user_id"),
        floor(datediff(col("day"), col("cohort_day")) / 7).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
