package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Batch event-operator semantics pins — currently the sessionization
  * gap boundary, where the two declared spellings intentionally
  * differ.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Three events for one user: t0, t0+1800s exactly, t0+1800s+1s. */
  private def boundaryEvents() = {
    val spk = spark
    import spk.implicits._
    Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "view", 1.0),
      (2L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), "view", 1.0),
      (3L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:30:01"), "view", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("session_window merges the exact-gap event (touching sessions)") {
    // event 2 lands exactly 1800 s after event 1: its window starts
    // where event 1's ends, and session_window merges sessions that
    // touch — all three events form ONE session. This pins that the
    // native operator agrees with the `> 1800` oracle at the
    // boundary (the "end-exclusive ⇒ splits" intuition is wrong).
    val sessions = Events.sessionizeNativeOn(boundaryEvents()).collect()
    assert(sessions.length == 1)
    assert(sessions.head.getAs[Long]("n_events") == 3L)
  }

  test("hopping window assigns an event to exactly win/slide = 4 windows") {
    val spk = spark
    import spk.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:37:30"), "view", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val rows = Events.hoppingWindowOn(ev).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[java.sql.Timestamp]("window_start").toString).toSet
      == Set("2023-12-31 23:45:00.0", "2024-01-01 00:00:00.0",
        "2024-01-01 00:15:00.0", "2024-01-01 00:30:00.0"))
    assert(rows.forall(_.getAs[Long]("n_events") == 1L))
  }

  test("hopping windows are end-exclusive at the slide boundary") {
    val spk = spark
    import spk.implicits._
    // an event exactly at 01:00:00 belongs to the four windows
    // STARTING 00:15..01:00 — not to [00:00, 01:00), whose end it
    // touches (same end-exclusive rule the oracle's floor(epoch/900)
    // arithmetic encodes)
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val starts = Events.hoppingWindowOn(ev).collect()
      .map(_.getAs[java.sql.Timestamp]("window_start").toString).toSet
    assert(starts == Set("2024-01-01 00:15:00.0", "2024-01-01 00:30:00.0",
      "2024-01-01 00:45:00.0", "2024-01-01 01:00:00.0"))
  }

  test("lag/cumsum sessionize keeps the exact-gap event (> semantics)") {
    // the classic spelling starts a new session only when the gap
    // EXCEEDS 1800 s — identical grouping to the native operator,
    // including at the exact boundary
    val sessions = Events.sessionizeOn(boundaryEvents()).collect()
    assert(sessions.length == 1)
    assert(sessions.head.getAs[Long]("n_events") == 3L)
  }

  test("session paths: trigrams never cross a session cut") {
    val spk = spark
    import spk.implicits._
    // user 10: one 4-event session (2 trigrams) then a >30min gap and
    // a 3-event session (1 trigram); user 20: 2 events, no trigram
    val ev = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "view", 1.0),
      (2L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (3L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "view", 1.0),
      (4L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), "purchase", 1.0),
      (5L, 10L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1.0),
      (6L, 10L, java.sql.Timestamp.valueOf("2024-01-01 01:01:00"), "click", 1.0),
      (7L, 10L, java.sql.Timestamp.valueOf("2024-01-01 01:02:00"), "purchase", 1.0),
      (8L, 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "view", 1.0),
      (9L, 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val paths = Events.sessionPathsOn(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 trigrams total; the cross-gap pairs (view,purchase,view) /
    // (purchase,view,click) from user 10's gap never form
    assert(paths == Map(
      "view>click>view" -> 1L,
      "click>view>purchase" -> 1L,
      "view>click>purchase" -> 1L))
  }

  test("session paths: total trigram mass equals sum of per-session max(0, n-2)") {
    val sf = graft.TestSpark.sf
    val sessions = Events.sessionize(spark, sf)
      .selectExpr("greatest(n_events - 2, 0) AS t")
      .agg(org.apache.spark.sql.functions.sum("t")).as[Long](spk_enc)
      .collect().head
    val pathMass = Events.sessionPathsOn(
        graft.Tables.events(spark, sf), k = Int.MaxValue)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long](spk_enc)
      .collect().head
    assert(pathMass == sessions)
  }

  test("windowed top-k: ranks dense 1..k, counts descending per window") {
    val rows = Events.windowedTopk(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Timestamp]("window_start")).foreach {
      case (_, rs) =>
        val byRank = rs.sortBy(_.getAs[Long]("rank"))
        assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
          (1L to byRank.length.toLong))
        val counts = byRank.map(_.getAs[Long]("n_events"))
        assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
        assert(byRank.length <= 3)
    }
  }

  test("markov transitions: rows are distributions, mass matches bigram count") {
    val rows = Events.markovTransitions(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // per-source probabilities sum to 1 (within 6-dp rounding slack)
    rows.groupBy(_.getAs[String]("src_type")).foreach { case (s, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-4, s"src $s sums to $p")
    }
    // total transition mass = total trigram-style bigram mass: sum of
    // per-session max(0, n_events - 1)
    val bigrams = Events.sessionize(spark, TestSpark.sf)
      .selectExpr("greatest(n_events - 1, 0) AS t")
      .agg(org.apache.spark.sql.functions.sum("t")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n")).sum == bigrams)
  }

  test("rfm: terciles balanced within one, segment encodes the digits") {
    val rows = Events.rfm(spark, graft.TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // segment is exactly the three tercile digits
    assert(rows.forall { r =>
      val (rr, f, m) = (r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m"))
      Seq(rr, f, m).forall(d => d >= 1 && d <= 3) &&
        r.getAs[Long]("segment") == rr * 100 + f * 10 + m
    })
    // ntile(3) balance: bucket sizes differ by at most one
    for (c <- Seq("r", "f", "m")) {
      val sizes = rows.groupBy(_.getAs[Long](c)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
    // one row per active user
    val users = graft.Tables.events(spark, graft.TestSpark.sf)
      .select("user_id").distinct().count()
    assert(rows.length.toLong == users)
  }

  test("attribution: matrix covers every user once, touches are real extremes") {
    import org.apache.spark.sql.functions._
    val rows = Events.attribution(spark, graft.TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, graft.TestSpark.sf)
    val users = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    // spot-check one user's touches against a direct sort
    val first = ev.orderBy(col("ts"), col("event_id")).select("user_id", "event_type")
      .collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.head.getString(1) }
    val last = ev.orderBy(col("ts").desc, col("event_id").desc)
      .select("user_id", "event_type")
      .collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.head.getString(1) }
    val pairCounts = first.keys.toSeq
      .groupBy(u => (first(u), last(u))).map { case (k, us) => k -> us.size.toLong }
    rows.foreach { r =>
      val k = (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))
      assert(pairCounts(k) == r.getAs[Long]("n_users"), s"pair $k")
    }
  }

  private def spk_enc: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
