package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: views at 10:00 and 10:20; click at 10:30 → attributes to 10:20.
  // user 1: click at 11:30 → nearest view 10:20 is 70 min old → no match.
  // user 2: view at 10:00 tied... two views same ts → max event_id wins.
  private val left = Seq(
    (100L, ts("2024-01-01 10:30:00"), 1L),
    (101L, ts("2024-01-01 11:30:00"), 1L),
    (102L, ts("2024-01-01 10:10:00"), 2L)
  ).toDF("event_id", "ts", "user_id")

  private val right = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L),
    (2L, ts("2024-01-01 10:20:00"), 1L),
    (3L, ts("2024-01-01 10:00:00"), 2L),
    (4L, ts("2024-01-01 10:00:00"), 2L)
  ).toDF("event_id", "ts", "user_id")

  test("as-of join: latest prior match within tolerance; ties by id; no stale match") {
    val out = Temporal.asofJoin(left, right, "user_id", "event_id", "ts", "ts",
        "event_id", 30L * 60 * 1000 * 1000)
      .select($"l.event_id", $"r.event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 2L, 102L -> 4L)) // 101 unmatched (beyond tolerance)
  }

  test("forward as-of: earliest later match within tolerance; ties by lowest id") {
    // left 100 @10:30 → right candidates after it within 30 min: none for
    // user 1 (views are earlier) — so flip roles: use left 102 @10:10 with
    // a later fixture. Build a dedicated fixture instead:
    val l = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L), // errors at 10:10 and 10:20 → 10:10 wins
      (101L, ts("2024-01-01 11:00:00"), 1L), // next error 11:40 is 40 min out → no match
      (102L, ts("2024-01-01 10:00:00"), 2L)  // two errors at the same ts → lowest id wins
    ).toDF("event_id", "ts", "user_id")
    val r = Seq(
      (1L, ts("2024-01-01 09:50:00"), 1L), // BEFORE the left row — never matches
      (2L, ts("2024-01-01 10:10:00"), 1L),
      (3L, ts("2024-01-01 10:20:00"), 1L),
      (4L, ts("2024-01-01 11:40:00"), 1L),
      (6L, ts("2024-01-01 10:05:00"), 2L),
      (5L, ts("2024-01-01 10:05:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = Temporal.asofJoinForward(l, r, "user_id", "event_id", "ts", "ts",
        "event_id", 30L * 60 * 1000 * 1000)
      .select($"l.event_id", $"r.event_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == Map(100L -> 2L, 102L -> 5L))
  }

  test("range join count: left rows with no match survive with 0") {
    val out = Temporal.rangeJoinCount(left, right, "user_id", "event_id", "ts", "ts",
        15L * 60 * 1000 * 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(100L -> 1L, 101L -> 0L, 102L -> 2L))
  }
}
