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
}
