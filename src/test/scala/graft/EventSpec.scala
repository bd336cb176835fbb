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

  test("dense LOCF: gap days zero-fill, carried value survives the gap, leading gap stays null") {
    // type A observed day 1 and day 4 (3-day gap); type B first observed day 3
    // of A's span — its day-1/2 rows exist (shared spine) with null locf
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A", 5.0, ""),
      (2L, ts("2024-01-04 10:00:00"), 1L, "A", 7.0, ""),
      (3L, ts("2024-01-03 10:00:00"), 2L, "B", 2.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.dailyDenseLocf(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n_events"), Option(r.getAs[java.lang.Double]("day_value")),
          Option(r.getAs[java.lang.Double]("locf_value")))).toMap
    assert(rows.size == 8, s"2 types x 4 spine days, got ${rows.size}")
    assert(rows(("A", "2024-01-02")) == ((0L, None, Some(5.0))), "gap day carries day-1 value")
    assert(rows(("A", "2024-01-03")) == ((0L, None, Some(5.0))))
    assert(rows(("A", "2024-01-04")) == ((1L, Some(7.0), Some(7.0))), "new observation replaces carry")
    assert(rows(("B", "2024-01-01")) == ((0L, None, None)), "before first observation stays null")
    assert(rows(("B", "2024-01-03")) == ((1L, Some(2.0), Some(2.0))))
    assert(rows(("B", "2024-01-04")) == ((0L, None, Some(2.0))))
  }

  test("sessionize: 30-min gap starts a new session") {
    val s = EventOps.sessionize(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      .sortBy(x => (x._1, x._2))
    assert(s.toSeq == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 10.0)))
  }

  test("session paths: ordered type sequence per session, equal-ts ties on event_id") {
    // user 3: two events share a timestamp — path order must follow event_id
    val tied = events.union(Seq(
      (6L, ts("2024-01-01 12:00:00"), 3L, "cart", 0.0, ""),
      (5L, ts("2024-01-01 12:00:00"), 3L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val p = EventOps.sessionPaths(tied).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        ((r.getAs[String]("path"), r.getAs[Long]("n_events")))).toMap
    assert(p == Map(
      (1L, 1L) -> (("view>click", 2L)),
      (1L, 2L) -> (("view", 1L)),
      (2L, 1L) -> (("buy", 1L)),
      (3L, 1L) -> (("view>cart", 2L))))
  }

  test("conversion paths: only purchase-containing sessions, count-desc ties on path") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "purchase", 0.0, ""),
      (3L, ts("2024-01-01 10:00:00"), 2L, "view", 0.0, ""),
      (4L, ts("2024-01-01 10:01:00"), 2L, "purchase", 0.0, ""),
      (5L, ts("2024-01-01 10:00:00"), 3L, "purchase", 0.0, ""),
      (6L, ts("2024-01-01 10:00:00"), 4L, "view", 0.0, "") // never converts
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val c = EventOps.conversionPaths(ev).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("total_events")))
    assert(c.toSeq == Seq(("view>purchase", 2L, 4L), ("purchase", 1L, 1L)))
    // k caps the report deterministically
    assert(EventOps.conversionPaths(ev, k = 1).collect()
      .map(_.getAs[String]("path")).toSeq == Seq("view>purchase"))
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

  test("funnel: stages require strictly-later events, in order") {
    // A: full ordered funnel; B: click BEFORE first view (stage 2 not reached);
    // C: view then purchase but never clicks (stages 2-3 not reached)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:01:00"), 10L, "click", 0.0, ""),
      (3L, ts("2024-01-01 10:02:00"), 10L, "purchase", 0.0, ""),
      (4L, ts("2024-01-01 09:00:00"), 20L, "click", 0.0, ""),
      (5L, ts("2024-01-01 09:30:00"), 20L, "view", 0.0, ""),
      (6L, ts("2024-01-01 08:00:00"), 30L, "view", 0.0, ""),
      (7L, ts("2024-01-01 08:30:00"), 30L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f = EventOps.funnel(ev).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("users"), Option(r.getAs[Any]("conv_from_prev")))).toMap
    assert(f("view") == ((3L, None)))
    assert(f("click") == ((1L, Some(1.0 / 3))))
    assert(f("purchase") == ((1L, Some(1.0))))
  }

  test("bot rate: a burst flags, the same volume spread over minutes does not") {
    // user 10: 4 events in ONE minute (bot burst); user 20: 4 events in 4
    // separate minutes (heavy human)
    val ev = ((1 to 4).map(i => (i.toLong, ts("2024-01-01 10:00:00"), 10L, "view", 0.0, "")) ++
      (1 to 4).map(i => (10L + i, ts(s"2024-01-01 10:0$i:00"), 20L, "view", 0.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.botRate(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("active_minutes"),
          r.getAs[Long]("max_per_minute"), r.getAs[Int]("bot_flag")))).toMap
    assert(out(10L) == ((4L, 1L, 4L, 1)), s"got ${out(10L)}")
    assert(out(20L) == ((4L, 4L, 1L, 0)), s"got ${out(20L)}")
  }

  test("windowed funnel: late conversions fall outside the stage window") {
    // A converts within the day at every stage; B clicks 2 days after the
    // view (outside); C clicks in-window but purchases 3 days later (outside)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "view", 0.0, ""),
      (2L, ts("2024-01-01 11:00:00"), 10L, "click", 0.0, ""),
      (3L, ts("2024-01-01 12:00:00"), 10L, "purchase", 0.0, ""),
      (4L, ts("2024-01-01 10:00:00"), 20L, "view", 0.0, ""),
      (5L, ts("2024-01-03 10:00:00"), 20L, "click", 0.0, ""),
      (6L, ts("2024-01-01 10:00:00"), 30L, "view", 0.0, ""),
      (7L, ts("2024-01-01 11:00:00"), 30L, "click", 0.0, ""),
      (8L, ts("2024-01-04 11:00:00"), 30L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f = EventOps.funnelWindowed(ev).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(f == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L), s"got $f")
    // the unwindowed funnel would credit everyone
    val open = EventOps.funnel(ev).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(open == Map("view" -> 3L, "click" -> 3L, "purchase" -> 2L))
  }

  test("weekday anomalies: spike flagged against its own weekday; zero-variance weekdays excluded") {
    import spark.implicits._
    // four Mondays (10,10,10,40 events) and two constant Tuesdays (5,5)
    val dayCounts = Seq(
      ("2024-01-01", 10), ("2024-01-08", 10), ("2024-01-15", 10), ("2024-01-22", 40),
      ("2024-01-02", 5), ("2024-01-09", 5))
    val ev = dayCounts.zipWithIndex.flatMap { case ((d, n), di) =>
      (0 until n).map(i => (di * 1000L + i, ts(s"$d 10:00:00"), 1L, "view", 0.0, ""))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flagged = EventOps.weekdayAnomalies(ev).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("n_events"), r.getAs[Double]("zscore")))
    // only the Monday spike flags: Tuesdays have zero variance (excluded),
    // baseline Mondays sit at |z| ≈ 0.58
    assert(flagged.map(f => (f._1, f._2)).toSeq == Seq(("2024-01-22", 40L)))
    assert(flagged.head._3 > 1.5)
  }

  test("time to convert: first purchase strictly after the first view, whole seconds") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "purchase", 0.0, ""),
      (3L, ts("2024-01-01 10:30:00"), 1L, "purchase", 0.0, ""), // later; ignored
      (4L, ts("2024-01-01 09:00:00"), 2L, "purchase", 0.0, ""), // before any view
      (5L, ts("2024-01-01 09:30:00"), 2L, "view", 0.0, ""),
      (6L, ts("2024-01-01 11:00:00"), 3L, "purchase", 0.0, "")  // never viewed
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.timeToConvert(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("secs_to_convert")).toMap
    assert(out == Map(1L -> 300L)) // users 2 and 3 never convert after a view
  }

  test("daily anomalies: only the spike day clears the z threshold") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // 9 quiet days of 10 events + one day of 100 → only the spike is ≥ 2σ
    val rows = (1 to 9).flatMap { d =>
      (1 to 10).map(i => (d * 100L + i, ts(f"2024-01-0$d%d 10:00:00"), i.toLong, "view", 0.0, ""))
    } ++ (1 to 100).map(i => (5000L + i, ts("2024-01-10 10:00:00"), i.toLong, "view", 0.0, ""))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = EventOps.dailyAnomalies(ev).collect()
    assert(a.length == 1)
    assert(a.head.getDate(0).toString == "2024-01-10")
    assert(a.head.getAs[Double]("zscore") > 2.0)
  }

  test("retention cohorts: week offsets count returning users per first-seen week") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 first seen wk0 (Mon 2024-01-01), active wk0 + wk2;
    // user 2 first seen wk0, active wk0 only; user 3 first seen wk2
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-16 10:00:00"), 1L, "view", 0.0, ""),
      (3L, ts("2024-01-03 10:00:00"), 2L, "view", 0.0, ""),
      (4L, ts("2024-01-17 10:00:00"), 3L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = EventOps.retentionCohorts(ev).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(m == Map(
      ("2024-01-01", 0L) -> 2L,  // both wk0 users active in their own week
      ("2024-01-01", 2L) -> 1L,  // only user 1 returns two weeks later
      ("2024-01-15", 0L) -> 1L)) // user 3's own cohort
  }

  test("latest per user: max_by survivor, ties break on event_id") {
    import spark.implicits._
    // user 1: two events share the max ts — the higher event_id wins
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-01 11:00:00"), 1L, "click", 2.0, ""),
      (2L, ts("2024-01-01 11:00:00"), 1L, "buy", 3.0, ""),
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 4.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = EventOps.latestPerUser(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("last_event_id"), r.getAs[String]("last_event_type"),
          r.getAs[Long]("n_events"))))
      .toMap
    assert(m == Map(1L -> ((3L, "click", 3L)), 2L -> ((4L, "view", 1L))))
    // no Window/sort in the plan — the whole point of the max_by shape
    val plan = EventOps.latestPerUser(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "latestPerUser must not plan a window sort")
  }

  test("dwell times: per-transition gap stats in whole seconds, never cross-user") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:01:30"), 1L, "click", 0.0, ""),    // view→click 90 s
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase", 0.0, ""), // click→purchase 30 s
      (4L, ts("2024-01-01 23:59:00"), 2L, "view", 0.0, ""),
      (5L, ts("2024-01-02 00:00:00"), 2L, "click", 0.0, "")     // view→click 60 s
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.dwellTimes(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("min_gap_secs"),
          r.getAs[Long]("max_gap_secs"), r.getAs[Double]("avg_gap_secs")))).toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 60L, 90L, 75.0)),
      ("click", "purchase") -> ((1L, 30L, 30L, 30.0))))
  }

  test("type transitions: consecutive bigrams per user, conditional probability") {
    import spark.implicits._
    // user 1: view → click → view;  user 2: view → buy
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, ""),
      (3L, ts("2024-01-01 10:10:00"), 1L, "view", 1.0, ""),
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, ""),
      (5L, ts("2024-01-01 09:30:00"), 2L, "buy", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val t = EventOps.typeTransitions(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    // user boundaries never produce a transition (user 1's last → user 2's first)
    assert(t == Map(
      ("view", "click") -> ((1L, 0.5)), ("view", "buy") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("type runs: maximal same-type islands with bounds and lengths") {
    import spark.implicits._
    // user 1: view view click view → 3 runs; user 2: buy → 1 run
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0, ""),
      (4L, ts("2024-01-01 10:15:00"), 1L, "view", 1.0, ""),
      (5L, ts("2024-01-01 09:00:00"), 2L, "buy", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val runs = EventOps.typeRuns(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_seq")) ->
        ((r.getAs[String]("event_type"), r.getAs[Timestamp]("run_start"),
          r.getAs[Timestamp]("run_end"), r.getAs[Long]("run_len")))).toMap
    assert(runs == Map(
      (1L, 1L) -> (("view", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2L)),
      (1L, 2L) -> (("click", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:10:00"), 1L)),
      (1L, 3L) -> (("view", ts("2024-01-01 10:15:00"), ts("2024-01-01 10:15:00"), 1L)),
      (2L, 1L) -> (("buy", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L))))
  }

  test("variant props extraction: integral-double rule, null on malformed/missing/uncastable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sum => fsum, try_variant_get, try_parse_json,
      get_json_object, when, floor}
    // the ADVICE-r3 edge cases: k present but NOT an integral number — a
    // string value and a fractional value. The ops' shared contract (the
    // engines' native casts all disagree here): contribute iff the value
    // reads as a double with d = floor(d); else null. A plain
    // variant_get(..., 'long') would THROW on {"k":"abc"} and silently
    // truncate {"k":1.5}.
    def integral(d: org.apache.spark.sql.Column) = when(d === floor(d), d.cast("long"))
    val df = Seq(
      """{"k": 7}""", """{"k": 5}""", """{"other": 1}""", "", "not json",
      """{"k": "abc"}""", """{"k": 1.5}"""
    ).toDF("props")
    val variantK = integral(try_variant_get(try_parse_json($"props"), "$.k", "double"))
    val stringK = integral(get_json_object($"props", "$.k").try_cast("double"))
    val got = df.agg(fsum(variantK)).head().getLong(0)
    assert(got == 12L) // only the two integral rows contribute
    // row-level agreement between the two extraction paths on every edge case
    val rows = df.select(variantK.as("v"), stringK.as("s")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"variant path ${if (r.isNullAt(0)) "null" else r.getLong(0)} != " +
          s"string path ${if (r.isNullAt(1)) "null" else r.getLong(1)}")
    }
  }

  test("user stats: counts, distinct types, exact value sum") {
    val u = EventOps.userStats(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_event_types"), r.getAs[Double]("total_value")))
      .sortBy(_._1)
    assert(u.toSeq == Seq((1L, 3L, 2L, 6.0), (2L, 1L, 1L, 10.0)))
  }

  test("stickiness: rolling windows cover gap days, ratio on the ppm grid") {
    // u1 active day 1 and day 4, u2 active day 1 only — 4-day dense spine
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-04 10:00:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.stickiness(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_ppm"))).toMap
    assert(rows.size == 4, s"dense 4-day spine expected, got ${rows.keys}")
    assert(rows("2024-01-01") == ((2L, 2L, 2L, 1000000L)), "both users on day 1")
    assert(rows("2024-01-02") == ((0L, 2L, 2L, 0L)), "gap day: dau 0, window carries both")
    assert(rows("2024-01-04") == ((1L, 2L, 2L, 500000L)), "1 of 2 monthly users active")
  }

  test("forecast naive: same-weekday-last-week baseline, unlagged days excluded") {
    // type A: day 1 → 2 events, day 8 → 5 events (err 3); days 2-7 absent.
    // Only day 8 has a 7-day-lagged observation, so n_eval = 1.
    val ev = ((1 to 2).map(i => (i.toLong, ts(s"2024-01-01 10:00:0$i"), 1L, "A", 1.0, "")) ++
      (1 to 5).map(i => ((10 + i).toLong, ts(s"2024-01-08 10:00:0$i"), 1L, "A", 1.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.forecastNaive(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getAs[String]("event_type"), row.getAs[Long]("n_eval"),
      row.getAs[Long]("sum_abs_err"), row.getAs[Long]("mae_milli"))
      == (("A", 1L, 3L, 3000L)))
  }

  test("markov stationary: sub-stochastic mass halves through an even split") {
    // one user, events A A B: transitions A→A and A→B, each p = 1/2; B has
    // no successor (sub-stochastic). Each round total mass halves:
    // (5e8, 5e8) → (2.5e8, 2.5e8) → … → (3.125e7, 3.125e7) after 4 rounds.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A", 1.0, ""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "A", 1.0, ""),
      (3L, ts("2024-01-01 10:02:00"), 1L, "B", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val pi = EventOps.markovStationary(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("pi_q")).toMap
    assert(pi == Map("A" -> 31250000L, "B" -> 31250000L), s"got $pi")
  }

  test("funnel by variant: arm counts partition the unsplit funnel exactly") {
    val ev = graft.sources.Tables.events(spark, TestSession.sf)
    val whole = EventOps.funnel(ev).collect()
      .map(r => r.getAs[Long]("stage_idx") -> r.getAs[Long]("users")).toMap
    val split = EventOps.funnelByVariant(ev).collect()
      .groupBy(_.getAs[Long]("stage_idx")).view
      .mapValues(_.map(_.getAs[Long]("users")).sum).toMap
    assert(split == whole, s"split $split must partition whole $whole")
  }

  test("conversion propensity: geometric first-hit accumulation to 15/16") {
    // A → {A: 1/2, purchase: 1/2}: within 4 steps P(hit) = 1 − (1/2)^4
    // = 937500 ppm; the target itself stays absorbing at 1e6.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A", 1.0, ""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "A", 1.0, ""),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val v = EventOps.conversionPropensity(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("v_q")).toMap
    assert(v == Map("A" -> 937500L, "purchase" -> 1000000L), s"got $v")
  }

  test("decay credit: recent touch outweighs stale 8:1, out-of-window drops") {
    // purchase at 12:00; view 30 min before (bucket 0, w=8), click 7 h
    // before (bucket 1, w=4), view 25 h before (outside the 24 h window).
    // wsum = 12 → credits 666666 / 333333 ppm.
    val ev = Seq(
      (1L, ts("2024-01-02 12:00:00"), 1L, "purchase", 9.0, ""),
      (2L, ts("2024-01-02 11:30:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-02 05:00:00"), 1L, "click", 1.0, ""),
      (4L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.decayCredit(ev).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("touches"), x.getAs[Long]("credit_ppm"))).toMap
    assert(r == Map("view" -> ((1L, 666666L)), "click" -> ((1L, 333333L))), s"got $r")
  }

  test("forecast ewma: constant series is predicted exactly; full-window rule") {
    // type A: 1 event/day on days 1..9. Day 9 is the only day with the full
    // 8-day history; its forecast is (Σ 2^(8-i))//255 = 1 → error 0.
    val const = (1 to 9).map(d =>
      (d.toLong, ts(f"2024-01-$d%02d 10:00:00"), 1L, "A", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.forecastEwma(const).collect()
    assert(r.length == 1)
    assert((r.head.getAs[Long]("n_eval"), r.head.getAs[Long]("sum_abs_err"),
      r.head.getAs[Long]("mae_milli")) == ((1L, 0L, 0L)), s"got ${r.head}")
    // a day-9 spike of 5 against the flat history: forecast stays 1, err 4;
    // day 10 (history has the spike, c(10)=1): forecast
    // (5·2^7 + Σ_{i=2..8} 2^(8-i))//255 = (640+127)//255 = 3 → err 2
    val spike = ((1 to 8).map(d =>
      (d.toLong, ts(f"2024-01-$d%02d 10:00:00"), 1L, "A", 1.0, "")) ++
      (1 to 5).map(i => ((20 + i).toLong, ts(s"2024-01-09 10:00:0$i"), 1L, "A", 1.0, "")) ++
      Seq((30L, ts("2024-01-10 10:00:00"), 1L, "A", 1.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = EventOps.forecastEwma(spike).collect()
    assert(s.length == 1)
    assert((s.head.getAs[Long]("n_eval"), s.head.getAs[Long]("sum_abs_err"),
      s.head.getAs[Long]("mae_milli")) == ((2L, 6L, 3000L)), s"got ${s.head}")
  }

  test("incremental stickiness equals the full recompute on any event split") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-02 11:00:00"), 2L, "view", 1.0, ""),
      (4L, ts("2024-01-03 12:00:00"), 3L, "view", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val full = EventOps.stickiness(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("dau"),
        r.getAs[Long]("wau"), r.getAs[Long]("mau"),
        r.getAs[Long]("stickiness_ppm"))).sortBy(_._1)
    val merged = EventOps.stickinessIncremental(
      ev.filter($"event_id" <= 2), ev.filter($"event_id" > 2)).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("dau"),
        r.getAs[Long]("wau"), r.getAs[Long]("mau"),
        r.getAs[Long]("stickiness_ppm"))).sortBy(_._1)
    assert(merged.toSeq == full.toSeq)
  }

  test("ab lift: sticky hash split partitions users, exact counts and spend") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 10.0, ""),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-01 12:00:00"), 2L, "purchase", 5.0, ""),
      (4L, ts("2024-01-01 13:00:00"), 3L, "view", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.abLift(ev).collect()
      .map(r => (r.getAs[Long]("variant"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_purchases"), Option(r.getAs[java.lang.Double]("spend"))))
    assert(rows.map(_._2).sum == 3, "every user lands in exactly one arm")
    assert(rows.map(_._3).sum == 2, "purchase totals preserved across arms")
    assert(rows.flatMap(_._4).map(_.toDouble).sum == 15.0, "spend partitions exactly")
    // stickiness: rerun with different partitioning → identical assignment
    val rows2 = EventOps.abLift(ev.repartition(5)).collect()
      .map(r => (r.getAs[Long]("variant"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_purchases"), Option(r.getAs[java.lang.Double]("spend"))))
    assert(rows.sortBy(_._1).toSeq == rows2.sortBy(_._1).toSeq)
  }

  test("mad anomalies: spike day flagged, mad4 robust to its own outlier") {
    // type A: 4 quiet days of 5 events + one 50-event spike. median stays 5
    // (med2 = 10), MAD stays 0 (mad4 = 0: middle deviations are all zero),
    // so ONLY the spike clears 2·dev2 > 3·mad4 — the masking-free property.
    val quiet = (1 to 4).flatMap(d => (1 to 5).map(i =>
      ((d * 100 + i).toLong, ts(f"2024-01-0$d 10:00:$i%02d"), 1L, "A", 1.0, "")))
    val spike = (1 to 50).map(i =>
      ((500 + i).toLong, ts(f"2024-01-05 10:00:${i % 60}%02d"), 1L, "A", 1.0, ""))
    val ev = (quiet ++ spike)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.madAnomalies(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("med2"), r.getAs[Long]("mad4"),
          r.getAs[Int]("is_anomaly"))).toMap
    assert(rows.size == 5)
    assert(rows("2024-01-05") == ((50L, 10L, 0L, 1)), s"spike must flag: $rows")
    assert((1 to 4).forall(d => rows(s"2024-01-0$d")._4 == 0), "quiet days stay quiet")
  }

  test("multitouch credit: 24h lookback splits purchase credit, out-of-window dropped") {
    // purchase day 2 noon; in-window: view day 1 13:00 + click day 2 11:00;
    // out-of-window: view day 1 11:00 (25h before). credit = 1e6 div 2 each.
    val ev = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-01 13:00:00"), 1L, "view", 1.0, ""),
      (3L, ts("2024-01-02 11:00:00"), 1L, "click", 1.0, ""),
      (4L, ts("2024-01-02 12:00:00"), 1L, "purchase", 9.0, ""),
      (5L, ts("2024-01-02 12:00:00"), 2L, "purchase", 5.0, "") // touchless
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.multitouchCredit(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("touches"), r.getAs[Long]("purchases"), r.getAs[Long]("credit_ppm")))
      .toMap
    assert(rows == Map(
      ("2024-01-01", "view") -> ((1L, 1L, 500000L)),
      ("2024-01-02", "click") -> ((1L, 1L, 500000L))),
      s"got $rows")
  }

  test("ab significance: exact pooled z-squared and the 95% decision flag") {
    def z2Of(n1: Long, x1: Long, n2: Long, x2: Long) = {
      val r = spark.range(1)
        .selectExpr(s"${n1}L AS n1", s"${x1}L AS x1", s"${n2}L AS n2", s"${x2}L AS x2")
        .selectExpr(s"${EventOps.abZ2Sql} AS z2",
          s"CASE WHEN (${EventOps.abZ2Sql}) >= ${EventOps.abZ2Crit} THEN 1 ELSE 0 END AS sig")
        .collect().head
      (r.getAs[Double]("z2"), r.getAs[Int]("sig"))
    }
    // strong effect: 20% vs 10% conversion on 1000 users each
    val (zStrong, sigStrong) = z2Of(1000, 200, 1000, 100)
    assert(math.abs(zStrong - 1.0e10 * 2000 / (1.0e6 * 300 * 1700)) < 1e-9)
    assert(sigStrong == 1)
    // identical proportions: z2 = 0, not significant
    assert(z2Of(1000, 200, 1000, 200) == ((0.0, 0)))
    // degenerate splits (all or none converted): zero pooled variance -> 0
    assert(z2Of(50, 0, 50, 0) == ((0.0, 0)))
    assert(z2Of(50, 50, 50, 50) == ((0.0, 0)))
    // end-to-end over events: one readout row, counts reconcile
    val ev = (1 to 40).map { u =>
      (u.toLong, ts("2024-01-01 10:00:00"), u.toLong,
        if (u % 4 == 0) "purchase" else "view", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.abSignificance(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == 40)
    assert(r.getAs[Long]("x1") + r.getAs[Long]("x2") == 10)
    assert(r.getAs[Double]("z2") >= 0.0)
  }

  test("session overlap: bucketed interval join finds exactly the intersecting pairs") {
    // 9 quiet days (1 event) + one 40-event spike on 01-10 -> the spike day
    // is the only |z| >= 2 anomaly; its window is [01-09, 01-12).
    val quiet = (1 to 9).map(d =>
      (d.toLong, ts(f"2024-01-$d%02d 12:00:00"), 100L + d, "view", 1.0, ""))
    val spike = (1 to 40).map(i =>
      (100L + i, ts("2024-01-10 12:00:00"), 777L, "view", 1.0, ""))
    // user 50: one session INSIDE the window; user 51: one session spanning
    // the window's start day boundary (08->09, meets it in two day buckets);
    // user 52: well before the window.
    val probes = Seq(
      (200L, ts("2024-01-10 14:00:00"), 50L, "view", 1.0, ""),
      (201L, ts("2024-01-10 14:10:00"), 50L, "view", 1.0, ""),
      (202L, ts("2024-01-08 23:50:00"), 51L, "view", 1.0, ""),
      (203L, ts("2024-01-09 00:05:00"), 51L, "view", 1.0, ""),
      (204L, ts("2024-01-02 10:00:00"), 52L, "view", 1.0, ""))
    val ev = (quiet ++ spike ++ probes)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionIncidentOverlap(ev).collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    // user 50 fully inside: overlap == session length (10 min)
    assert(byUser(50L).length == 1 &&
      byUser(50L).head.getAs[Long]("overlap_us") == 10L * 60 * 1000000)
    // user 51 straddles the window start: ONE deduped pair, 5 min inside
    assert(byUser(51L).length == 1 &&
      byUser(51L).head.getAs[Long]("overlap_us") == 5L * 60 * 1000000)
    assert(!byUser.contains(52L), "out-of-window session must not pair")
    // every emitted pair satisfies the raw range predicate
    assert(out.forall { r =>
      r.getAs[java.sql.Timestamp]("session_start").getTime <
        ts("2024-01-12 00:00:00").getTime &&
        r.getAs[java.sql.Timestamp]("session_end").getTime >=
          ts("2024-01-09 00:00:00").getTime
    })
  }

  test("session gap sweep: monotone in threshold; 30-min point equals sessionize") {
    import graft.operators.EventOps
    val events = graft.sources.Tables.events(spark, TestSession.sf)
    val curve = EventOps.sessionGapSweep(events).collect()
      .map(r => r.getAs[Long]("gap_minutes") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"))).toMap
    assert(curve.keySet == EventOps.sessionGapSweepMin.toSet)
    val total = events.count()
    assert(curve.values.forall(_._1 == total), "every row carries the event total")
    // bigger allowed gap → fewer (or equal) sessions
    EventOps.sessionGapSweepMin.sliding(2).foreach { case Seq(a, b) =>
      assert(curve(b)._2 <= curve(a)._2, s"sessions must not grow from $a to $b min")
    }
    assert(curve(30L)._2 == EventOps.sessionize(events).count(),
      "the 30-min sweep point must equal the production sessionizer")
  }
}
