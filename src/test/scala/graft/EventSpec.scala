package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class EventSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (gap 45 min); user 2: one session.
  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
    (2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0, ""),
    (3L, ts("2024-01-01 10:55:00"), 1L, "view", 3.0, ""),
    (4L, ts("2024-01-01 09:59:00"), 2L, "buy", 10.0, "")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessionize: 30-min gap starts a new session") {
    val s = EventOps.sessionize(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .sortBy(x => (x._1, x._2))
    assert(s.toSeq == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 10.0)))
  }

  test("hourly rollup: window start is the hour truncation") {
    val h = EventOps.hourlyRollup(events).collect()
      .map(r => (r.getAs[Timestamp]("hour_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events")))
      .sortBy(x => (x._1.getTime, x._2))
    assert(h.toSeq == Seq(
      (ts("2024-01-01 09:00:00"), "buy", 1L),
      (ts("2024-01-01 10:00:00"), "click", 1L),
      (ts("2024-01-01 10:00:00"), "view", 2L)))
  }

  test("user stats: counts, distinct types, exact value sum") {
    val u = EventOps.userStats(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_event_types"), r.getAs[Double]("total_value")))
      .sortBy(_._1)
    assert(u.toSeq == Seq((1L, 3L, 2L, 6.0), (2L, 1L, 1L, 10.0)))
  }
}
