package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Windowed TOP-K — streaming SQL's canonical "top sellers per
    * hour" report (the shape Flink demos with): per tumbling hour,
    * the k most frequent event types with their rank, ties broken on
    * the type name (deterministic where Flink's is arrival-order).
    *
    * 100 TB notes: the corpus pays only the windowed-count aggregate
    * (map-side partials to windows×types groups); the rank window
    * partitions over the COLLAPSED frame — top-k never sorts events,
    * it sorts group counts. The streaming twin is the watermark
    * analog of [[graft.streaming.StreamingJobs.hoppingAgg]] with the
    * ranking on the sink side (finalized windows are append-mode
    * output, exactly how production jobs spell it).
    */
  def windowedTopk(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("window_start"), col("rank"))
  }

  /** Hopping (sliding) 1-hour window with a 15-minute slide — the
    * HOP window of streaming SQL (Flink's SlidingEventTimeWindows;
    * flink-neo4j pipelines compose it upstream of the connector).
    * Every event lands in exactly window/slide = 4 windows; Spark's
    * `window(ts, "1 hour", "15 minutes")` enumerates them
    * arithmetically at the scan (a codegen'd Expand — no join
    * against a generated window table).
    *
    * 100 TB notes: the expand multiplies rows ×4 BEFORE the
    * shuffle, but hash partial aggregation collapses them map-side
    * to at most windows×types partials per task, so the exchange
    * carries group partials, not events. The same operator runs
    * incrementally under a watermark (StreamingJobs.hoppingAgg —
    * spec-pinned); state is bounded by watermark horizon × 4 open
    * windows per type.
    */
  def hoppingWindow(spark: SparkSession, sfDir: String): DataFrame =
    hoppingWindowOn(Tables.events(spark, sfDir))

  /** Core of [[hoppingWindow]] over an arbitrary (ts, event_type,
    * value) frame — shared with the spec's boundary pins.
    */
  def hoppingWindowOn(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Daily event-type pivot — the wide activity matrix
    * (day × event_type → count) reporting layers ask for. Uses
    * Spark's native `pivot` WITH an explicit value list: declaring
    * the columns up front skips the extra distinct-collection job
    * pivot otherwise runs AND makes the output schema static —
    * both what a production pipeline wants (a schema that can't
    * drift because a new event type appeared mid-day).
    *
    * 100 TB notes: compiles to a single groupBy(day) hash aggregate
    * with one conditional count per declared type — one shuffle
    * keyed on day, map-side partials, no explode. Null cells (day
    * without that type) fill to 0 for determinism.
    */
  def pivotDaily(spark: SparkSession, sfDir: String,
      types: Seq[String] = Seq("click", "error", "purchase", "signup",
        "view")): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("d"))

  /** Equi-width value histogram per event type: bucket i covers
    * [(i−1)·step, i·step) via explicit `floor(value/step)+1` binning
    * (identical arithmetic on both engines; values below 0 land in
    * bucket ≤ 0, above-range in higher buckets — no silent clamp) —
    * the distribution profile a monitoring layer keeps per metric.
    *
    * 100 TB notes: bucket assignment is a per-row codegen'd
    * expression at the scan; ONE shuffle on (type, bucket) — at most
    * types×buckets groups — with map-side partials doing virtually
    * all the reduction.
    */
  def valueHistogram(spark: SparkSession, sfDir: String,
      step: Double = 20.0): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        (floor(col("value") / step) + 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type"), col("bucket"))

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
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionizeOn(Tables.events(spark, sfDir))

  /** [[sessionize]] over an arbitrary events-shaped frame — the
    * boundary-semantics specs drive this directly.
    */
  def sessionizeOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
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

  /** Gap-based sessionization via Spark's NATIVE `session_window`
    * (30-min gap, minus [[sessionize]]'s per-user sequence number):
    * one shuffle on (user, window), sessions merge inside the
    * aggregate. This exact plan also runs incrementally under a
    * watermark — session_window is the Structured Streaming session
    * operator — so the batch oracle here certifies the streaming
    * operator's arithmetic.
    *
    * BOUNDARY: sessions that touch at a point MERGE — an event
    * exactly `gap` seconds after the previous one joins that
    * session, identical to the lag/cumsum spelling's `diff > gap`
    * split rule, so both operators share one oracle shape.
    * EventsSpec pins the exact-gap case on both (don't trust the
    * "end-exclusive window" intuition — merge is on start ≤ end).
    */
  def sessionizeNative(spark: SparkSession, sfDir: String): DataFrame =
    sessionizeNativeOn(Tables.events(spark, sfDir))

  /** [[sessionizeNative]] over an arbitrary events-shaped frame. */
  def sessionizeNativeOn(events: DataFrame): DataFrame =
    sessionWindowAgg(events).orderBy(col("user_id"), col("session_start"))

  /** The session_window aggregation itself, shared VERBATIM between
    * the batch operator (above, which only adds a presentation sort)
    * and the watermarked streaming twin
    * ([[graft.streaming.StreamingJobs.sessionizeNative]]) — so the
    * batch oracle genuinely certifies the streaming operator's
    * arithmetic, and StreamingJobsSpec pins the same aggregation
    * merging sessions under a watermark.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /** As-of (point-in-time) join — last-touch attribution: for each
    * `purchase`, the latest `view` by the same user at or before the
    * purchase timestamp. Spark has no ASOF JOIN operator; the
    * scalable spelling is a union-tag + one keyed window, NO join at
    * all: tag views 0 / purchases 1, sort each user's rows by
    * (ts, side), and carry the last non-null view columns forward
    * with `last(_, ignoreNulls).over(w)`. The `side` tie-break makes
    * a view at exactly the purchase ts count as "at or before".
    *
    * 100 TB notes: exactly one exchange on user_id for the window
    * (the view dedup groupBy pre-shuffles on (user_id, ts), which AQE
    * coalesces); per-user sorted runs never materialize a join — the
    * classic sort-merge-asof shape. Skewed users would salt the same
    * way Skew.saltedAgg does; time-ordered state is O(1) per row
    * (running last), not O(window).
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // one view row per (user, ts): keep the max event_id (and its
    // value) so the as-of pick is deterministic under ts collisions
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"),
        max_by(col("value"), col("event_id")).as("view_value"))
    val tagged = views
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("view_id"), col("view_value"),
        lit(null).cast("long").as("purchase_id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("view_id"),
          lit(null).cast("double").as("view_value"),
          col("event_id").as("purchase_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("lv_id", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("lv_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .withColumn("lv_val", last(col("view_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("lv_id").as("view_id"), col("lv_ts").as("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("lv_ts"))).as("gap_us"),
        col("lv_val").as("view_value"))
      .orderBy(col("purchase_id"))
  }

  /** Rolling event-time window: each event's trailing-1-hour count
    * and average value for its user, via a RANGE frame over the
    * event-time axis (frame membership by timestamp VALUE, not row
    * position — ties and gaps handled by definition). The decimal
    * running sum keeps the average order-independent.
    * 100 TB notes: one exchange on user_id; the range frame is
    * computed in a single pass over each user's sorted run with a
    * sliding two-pointer (Spark's bounded-range WindowExec), state
    * O(window), never O(history).
    */
  def rollingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-hourUs, 0)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("avg_1h",
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          / col("n_1h"), 6))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("avg_1h"))
      .orderBy(col("event_id"))
  }

  /** Bounded range join (interval join): events inside
    * [purchase_ts - 30 min, purchase_ts] per (user, purchase) —
    * "activity in the half hour leading up to the purchase". A naive
    * inequality join is O(n·m) per user; the scalable spelling is the
    * BANDED equi-join: bucket both sides by a 30-min time grain, probe
    * each purchase's bucket and its predecessor (the interval spans at
    * most 2 grains), equi-join on (user_id, bucket), then apply the
    * exact range filter. The optimizer sees a plain shuffled equi-join
    * with a pushed residual — no cross product ever forms.
    *
    * 100 TB notes: join keys carry the time grain, so partition
    * fan-out scales with bucket cardinality (time × users), not event
    * volume; candidate factor is ≤ 2 buckets per purchase regardless
    * of data size; AQE handles per-bucket skew.
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val grainUs = 30L * 60 * 1000 * 1000 // 30 min in microseconds
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("bucket", floor(col("us") / grainUs))
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
    val probes = purchases
      .withColumn("bucket", explode(array(
        floor(col("p_us") / grainUs) - 1, floor(col("p_us") / grainUs))))
    probes.join(ev, Seq("user_id", "bucket"))
      .filter(col("us") >= col("p_us") - grainUs && col("us") <= col("p_us")
        && col("event_id") =!= col("purchase_id"))
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(lit(1)).as("n_events_30m"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value_30m"))
      .orderBy(col("purchase_id"))
  }

  /** CEP-style sequence-pattern detection (the MATCH_RECOGNIZE /
    * Flink-CEP idiom, re-expressed relationally): each user's
    * time-ordered event types collapse to a compact symbol string
    * (first letter — distinct across the five types), and patterns
    * become REGEXES over that string: non-overlapping
    * view→click→purchase trigrams, an anywhere-ordered conversion
    * flag, and error-burst counts. Regex counting via
    * `regexp_extract_all` is left-to-right non-overlapping in both
    * Java and RE2, so the DuckDB oracle matches literally; the
    * (ts, event_id) sort key makes same-timestamp ordering
    * deterministic.
    *
    * 100 TB notes: ONE user-keyed exchange carrying 1-byte symbols
    * (never payloads); the per-user sequence is bounded by that
    * user's activity — whale sessions would be windowed by day first
    * (compose with [[sessionize]]), which changes no plumbing.
    */
  def sequenceDetect(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("t"))
    ev.groupBy(col("user_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("t")))),
          s => s.getField("t")), "").as("seq"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        size(regexp_extract_all(col("seq"), lit("vcp"), lit(0)))
          .cast("long").as("n_vcp"),
        col("seq").rlike("v.*c.*p").cast("int").as("converted"),
        size(regexp_extract_all(col("seq"), lit("e+"), lit(0)))
          .cast("long").as("n_error_bursts"))
      .orderBy(col("user_id"))
  }

  /** CEP NEGATION pattern — "view then purchase within 1 h with NO
    * click in between" (Flink CEP's `notFollowedBy`, the pattern
    * class [[sequenceDetect]]'s regex over collected symbols cannot
    * express with time bounds): for every purchase, the latest prior
    * view and latest prior click resolve from two running windows,
    * and the purchase counts as "direct" iff a view exists within
    * the hour and the last click is at or before that view. Absence
    * + time-bound matching is the hard half of CEP — this spelling
    * is O(1) state per user and streams as keyed running-max state.
    *
    * Time bounds compare integer MICROSECONDS (`unix_micros` /
    * DuckDB `epoch_us`) — exact on both engines, no fractional-epoch
    * double drift.
    *
    * 100 TB notes: one user-keyed exchange; the two running maxima
    * are window state, never a self-join — the naive per-purchase
    * interval join this replaces is quadratic in session length.
    */
  def cepNegation(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastView = max(when(col("event_type") === "view", col("ts"))).over(w)
    val lastClick = max(when(col("event_type") === "click", col("ts"))).over(w)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("last_view", lastView)
      .withColumn("last_click", lastClick)
      .filter(col("event_type") === "purchase")
      .withColumn("direct",
        (col("last_view").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_view")) <= 3600000000L &&
          (col("last_click").isNull || col("last_click") <= col("last_view")))
          .cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("direct")).as("n_direct"))
      .orderBy(col("user_id"))
  }

  /** RFM segmentation — the classic user-value triage: per user,
    * Recency (days since last event, vs the corpus max date),
    * Frequency (event count), Monetary (exact decimal value sum),
    * each cut into terciles (1 = best) and combined into the
    * three-digit segment code marketers act on (111 = champions,
    * 333 = lost). `ntile` over (metric, user_id) is deterministic on
    * both engines via the id tie-break — the [[graft.operators
    * .TextAnalysis.pplBuckets]] precedent.
    *
    * 100 TB notes: the corpus-scale work is ONE user-keyed aggregate
    * with map-side partials; tercile assignment then runs through
    * [[HistogramNtile]] — rank ranges read off a broadcast histogram,
    * whole buckets assigned in a pure map, only the ≤2 cut-straddling
    * buckets per metric sorted — so no global (single-partition)
    * window sort ever touches the user-cardinality frame. The
    * per-user frame persists across the three metric passes (narrow:
    * four columns a user), exactly the artifact a production RFM
    * pipeline materializes.
    */
  def rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val maxTs = ev.agg(max(col("ts")).as("global_max"))
    val per = ev.groupBy(col("user_id")).agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxTs))
      .withColumn("recency_days",
        datediff(to_date(col("global_max")), to_date(col("last_ts"))).cast("long"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"))
    // the per-user frame materializes ONCE as a true leaf (withNtile
    // references its input several times — stats agg, histogram agg,
    // wholesale branch, straddle branch — and chaining the three
    // metric passes would re-expand each stage per reference,
    // exponentially); the three tercile passes then run as
    // independent branches off that leaf and join back on user_id.
    // Size-adaptive: a user frame under the threshold pays one plain
    // ntile window per metric (bit-equal result), corpus-cardinality
    // user counts take the broadcast-rank histogram plan
    val perL = graft.Frames.leaf(per)
    val nUsers = perL.count()
    def tile(sortAsc: Column, orderWithin: Seq[Column], out: String) =
      HistogramNtile.withNtileAdaptive(perL, nUsers, Nil, sortAsc,
          orderWithin, 3, out)
        .select(col("user_id"), col(out))
    perL
      .join(tile(col("recency_days"),
        Seq(col("recency_days"), col("user_id")), "r"), Seq("user_id"))
      .join(tile(-col("frequency"),
        Seq(col("frequency").desc, col("user_id")), "f"), Seq("user_id"))
      .join(tile(-col("monetary"),
        Seq(col("monetary").desc, col("user_id")), "m"), Seq("user_id"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"),
        col("r"), col("f"), col("m"),
        (col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
      .orderBy(col("user_id"))
  }

  /** Session path mining: the most common event-type TRIGRAMS taken
    * inside a session (journey fragments like view>click>purchase),
    * with sessions cut by [[sessionize]]'s exact 30-minute-gap rule
    * so the two operators agree on boundaries. Trigrams never cross a
    * session cut; sessions shorter than 3 events contribute none.
    * Ties at the top-k boundary break on the path string, so the
    * result is fully deterministic on both engines.
    *
    * 100 TB notes: ONE shuffle on user_id serves both window passes
    * (session tagging and the two lead()s share the same partitioning
    * + ordering, Catalyst plans a single exchange+sort); the trigram
    * count then aggregates into a tiny |types|^3 domain where
    * map-side partials do virtually all the reduction, and the top-k
    * sort runs on that collapsed frame, not the corpus.
    */
  def sessionPaths(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    sessionPathsOn(Tables.events(spark, sfDir), k)

  /** First-order Markov transition model of in-session journeys: for
    * every (current, next) event-type pair, the transition count and
    * probability P(next | current) — the journey model one rung below
    * [[sessionPaths]]' literal trigram mining (a Markov chain
    * predicts/anomaly-scores any path, not just the memorized top
    * fragments). Transitions never cross [[sessionize]]'s exact
    * 30-minute session cut, so all three journey operators agree on
    * boundaries. Probabilities are 6-dp rounded over exact integer
    * counts — deterministic on both engines.
    *
    * 100 TB notes: the same single user_id exchange the other journey
    * operators pay (session tagging + lead share one partitioning);
    * the transition aggregate collapses map-side into a |types|²
    * domain, and the per-source normalization windows over THAT tiny
    * frame, never the corpus.
    */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val bySrc = Window.partitionBy(col("src_type"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_type", lead(col("event_type"), 1).over(bySession))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("src_type"), col("next_type").as("dst_type"))
      .groupBy(col("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(bySrc), 6) + lit(0.0))
      .orderBy(col("src_type"), col("dst_type"))
  }

  /** [[sessionPaths]] over an arbitrary events-shaped frame — the
    * boundary/count specs drive this directly.
    */
  def sessionPathsOn(events: DataFrame, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("e2", lead(col("event_type"), 1).over(bySession))
      .withColumn("e3", lead(col("event_type"), 2).over(bySession))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** First-touch / last-touch ATTRIBUTION — the marketing-analytics
    * join of the journey family: per user, the event type that opened
    * the journey and the one that closed it (by timestamp, event_id
    * tie-break), aggregated into a (first_touch, last_touch) matrix
    * with user counts and total event value. The two-ended view that
    * arbitrates between first- and last-click credit models.
    *
    * Value totals accumulate as DECIMAL(18,4) (order-independent
    * exact sums) and surface as double — the [[rfm]] monetary
    * discipline.
    *
    * 100 TB notes: ONE user-keyed exchange serves both window passes
    * (same partitioning, two sort orders) and the per-user collapse;
    * the touch matrix is |types|² and aggregates map-side.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.select(col("user_id"), col("event_type"), col("value"), col("ts"),
        col("event_id"))
      .withColumn("rf", row_number().over(wAsc))
      .withColumn("rl", row_number().over(wDesc))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("rf") === 1, col("event_type"))).as("first_touch"),
        max(when(col("rl") === 1, col("event_type"))).as("last_touch"),
        sum(col("value").cast("decimal(18,4)")).as("v"))
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy(col("first_touch"), col("last_touch"))
  }
}
