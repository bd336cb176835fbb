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

  test("range join count: left rows with no match survive with 0") {
    val out = Temporal.rangeJoinCount(left, right, "user_id", "event_id", "ts", "ts",
        15L * 60 * 1000 * 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(100L -> 1L, 101L -> 0L, 102L -> 2L))
  }
}
