package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("drawdown: worst peak-to-trough on the path, zero for monotonic rises") {
    val ev = Seq(
      // cum: 5,2,3,-1,9 → peak: 5,5,5,5,9 → dd: 0,3,2,6,0
      (1L, 5.0, ts("2024-01-01 10:00:00")),
      (1L, -3.0, ts("2024-01-01 11:00:00")),
      (1L, 1.0, ts("2024-01-01 12:00:00")),
      (1L, -4.0, ts("2024-01-01 13:00:00")),
      (1L, 10.0, ts("2024-01-01 14:00:00")),
      // monotonic: never underwater
      (2L, 1.0, ts("2024-01-01 10:00:00")),
      (2L, 2.0, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "value", "ts")
    val out = EventAnalytics.drawdown(ev, "user_id", "ts", "value",
      scaleBits = 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      1L -> ((5L, 9L, 9L, 6L)),
      2L -> ((2L, 3L, 3L, 0L))), out.toString)
    // ties on ts break by orderCols: (+10, -10) at the same instant in
    // id order never dips; reversed order dips 10
    val tied = Seq(
      (3L, 10.0, ts("2024-01-01 10:00:00"), 1L),
      (3L, -10.0, ts("2024-01-01 10:00:00"), 2L)
    ).toDF("user_id", "value", "ts", "event_id")
    val a = EventAnalytics.drawdown(tied, "user_id", "ts", "value",
      scaleBits = 0, orderCols = Seq("event_id")).head()
    assert(a.getLong(3) === 10L && a.getLong(4) === 10L)
  }

  test("leadLag: A leading B by one bucket wins, zero-dot lags present") {
    // A: 2 events in hour 10, 1 in hour 11; B: 4 events in hour 11.
    // dot(0) = a(11)*b(11) = 4; dot(+1) = a(10)*b(11) = 8  -> best +1
    val ev = Seq(
      ("A", ts("2024-01-01 10:00:00")), ("A", ts("2024-01-01 10:30:00")),
      ("A", ts("2024-01-01 11:00:00")),
      ("B", ts("2024-01-01 11:10:00")), ("B", ts("2024-01-01 11:20:00")),
      ("B", ts("2024-01-01 11:30:00")), ("B", ts("2024-01-01 11:40:00"))
    ).toDF("event_type", "ts")
    val out = EventAnalytics.leadLag(ev, "event_type", "ts", "A", "B", maxLag = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size === 5) // every lag row present, even zero dots
    assert(out(1L) === ((8L, true)), out.toString)   // A leads B by 1h
    assert(out(0L) === ((4L, false)), out.toString)
    assert(out(-1L) === ((0L, false)) && out(2L) === ((0L, false)))
    intercept[IllegalArgumentException] {
      EventAnalytics.leadLag(ev, "event_type", "ts", "A", "B", maxLag = 0)
    }
  }

  test("entityNovelty: first-day attribution, repeats within a day collapse") {
    // day 1: entities (1,A), (1,B) both new; day 2: (1,A) returns
    // (duplicated within the day — counted once) + (2,A) new;
    // day 3: only returning activity
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), (1L, "B", ts("2024-01-01 11:00:00")),
      (1L, "A", ts("2024-01-02 10:00:00")), (1L, "A", ts("2024-01-02 12:00:00")),
      (2L, "A", ts("2024-01-02 10:00:00")),
      (1L, "B", ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.entityNovelty(ev, Seq("user_id", "event_type"), "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("2024-01-01") === ((2L, 2L, 2L, 1000L)), out.toString)
    assert(out("2024-01-02") === ((2L, 1L, 3L, 500L)), out.toString)
    assert(out("2024-01-03") === ((1L, 0L, 3L, 0L)), out.toString)
    intercept[IllegalArgumentException] {
      EventAnalytics.entityNovelty(ev, Seq.empty, "ts")
    }
  }

  test("hourOfDayProfile: peak hour, integer shares, burst verdict both ways") {
    // bot: 9 of 10 events in hour 02 (peak share 900 > 2x uniform);
    // organic: spread over 3 hours with a mild 2/4 peak at the
    // earliest maximal hour (tie at hours 01 and 03 -> peak = 01)
    val ev = Seq.fill(9)(("bot", ts("2024-01-01 02:10:00"))) ++ Seq(
      ("bot", ts("2024-01-01 07:00:00")),
      ("org", ts("2024-01-01 01:00:00")), ("org", ts("2024-01-01 01:30:00")),
      ("org", ts("2024-01-02 03:00:00")), ("org", ts("2024-01-02 03:30:00")))
    val out = EventAnalytics.hourOfDayProfile(
      ev.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5),
          r.getBoolean(6)))).toMap
    assert(out(("bot", 2L))  === ((9L, 10L, 900L, true, true)), out.toString)
    assert(out(("bot", 7L))  === ((1L, 10L, 100L, false, true)))
    assert(out(("org", 1L))  === ((2L, 4L, 500L, true, false))) // tie -> min hour
    assert(out(("org", 3L))  === ((2L, 4L, 500L, false, false)))
    intercept[IllegalArgumentException] {
      EventAnalytics.hourOfDayProfile(ev.toDF("event_type", "ts"),
        "event_type", "ts", burstMilli = 1001)
    }
  }

  test("cooccurrence: session-scoped lift, repeats counted once, absent pairs omitted") {
    // user 1: two sessions both containing {A, B} (A repeated in the
    // first — counted once); user 2: two singleton sessions {A}, {C}
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), (1L, "A", ts("2024-01-01 10:05:00")),
      (1L, "B", ts("2024-01-01 10:10:00")),
      (1L, "A", ts("2024-01-02 10:00:00")), (1L, "B", ts("2024-01-02 10:30:00")),
      (2L, "A", ts("2024-01-01 09:00:00")),
      (2L, "C", ts("2024-01-03 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.cooccurrence(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7)))).toMap
    // 4 sessions; n_A=3, n_B=2, n_C=1; (A,B) together in 2:
    // lift = 2*4/(3*2) -> 1333 milli, positive (8 > 6)
    assert(out === Map(("A", "B") ->
      ((2L, 3L, 2L, 4L, 1333L, true))), out.toString)
    intercept[IllegalArgumentException] {
      EventAnalytics.cooccurrence(ev, "user_id", "ts", "event_type", gapUs = 0)
    }
  }

  test("cusum: sustained drift alarms, per-side clamping, null when never alarmed") {
    // key 1: mean shifts up at tick 3 — upper CUSUM accumulates
    // su: 0,0,13,26,39,29; alarms (h=15) at ticks 4,5,6
    // key 2: drifts down — sd: 0,8,16,24; alarms at ticks 3,4
    // key 3: on-target forever — never alarms, first_alarm_us null
    val ev = Seq(
      (1L, 10.0, ts("2024-01-01 10:00:00")), (1L, 10.0, ts("2024-01-01 11:00:00")),
      (1L, 25.0, ts("2024-01-01 12:00:00")), (1L, 25.0, ts("2024-01-01 13:00:00")),
      (1L, 25.0, ts("2024-01-01 14:00:00")), (1L, 2.0, ts("2024-01-01 15:00:00")),
      (2L, 10.0, ts("2024-01-01 10:00:00")), (2L, 0.0, ts("2024-01-01 11:00:00")),
      (2L, 0.0, ts("2024-01-01 12:00:00")), (2L, 0.0, ts("2024-01-01 13:00:00")),
      (3L, 10.0, ts("2024-01-01 10:00:00")), (3L, 10.0, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "value", "ts")
    val out = EventAnalytics.cusum(ev, "user_id", "ts", "value",
      refValue = 10.0, slack = 2.0, threshold = 15.0, scaleBits = 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    val us13 = java.sql.Timestamp.valueOf("2024-01-01 13:00:00").getTime * 1000
    val us12 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime * 1000
    assert(out(1L) === ((6L, 39L, 6L, 3L, us13)), out.toString)
    assert(out(2L) === ((4L, 0L, 24L, 2L, us12)), out.toString)
    assert(out(3L) === ((2L, 0L, 0L, 0L, null)), out.toString)
    intercept[IllegalArgumentException] {
      EventAnalytics.cusum(ev, "user_id", "ts", "value", 10.0, -1.0, 15.0)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.cusum(ev, "user_id", "ts", "value", 10.0, 2.0, 0.0)
    }
  }

  test("latenessAudit: lateness vs the running high-water mark, in-order streams zero") {
    val ev = Seq(
      // arrival 1,2,3: ts 10:00, 12:00, then 11:00 — the third event
      // arrives 3600s behind the HWM set by the second
      ("a", ts("2024-01-01 10:00:00"), 1L),
      ("a", ts("2024-01-01 12:00:00"), 2L),
      ("a", ts("2024-01-01 11:00:00"), 3L),
      // in-order key: zero late mass
      ("b", ts("2024-01-01 10:00:00"), 4L),
      ("b", ts("2024-01-01 10:30:00"), 5L)
    ).toDF("event_type", "ts", "arr")
    val out = EventAnalytics.latenessAudit(ev, "event_type", "ts", "arr")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "a" -> ((3L, 1L, 3600000000L, 3600000000L)),
      "b" -> ((2L, 0L, 0L, 0L))), out.toString)
  }

  test("realizedVariance: within-bucket returns only, exact integer masses") {
    val ev = Seq(
      // day 1: q 4 → 7 → 5: returns +3, −2 → n 2, net 1, rv 13
      (1L, 4.0, ts("2024-01-01 10:00:00"), 1L),
      (1L, 7.0, ts("2024-01-01 11:00:00"), 2L),
      (1L, 5.0, ts("2024-01-01 12:00:00"), 3L),
      // day 2 resets the lag: the overnight 5→9 gap is NOT a return
      (1L, 9.0, ts("2024-01-02 10:00:00"), 4L),
      (1L, 9.0, ts("2024-01-02 11:00:00"), 5L), // zero return counts
      // a single-tick (user, day) produces no returns → no row
      (2L, 3.0, ts("2024-01-01 10:00:00"), 6L)
    ).toDF("user_id", "value", "ts", "event_id")
    val out = EventAnalytics.realizedVariance(ev, "user_id", "ts", "value",
      scaleBits = 0, orderCols = Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      (1L, "2024-01-01") -> ((2L, 1L, 13L)),
      (1L, "2024-01-02") -> ((1L, 0L, 0L))), out.toString)
  }

  test("ewma: exact shift weights, warm-up renormalizes, negatives trunc toward zero") {
    val ev = Seq(
      (1L, 4.0, ts("2024-01-01 10:00:00"), 1L),
      (1L, 8.0, ts("2024-01-01 11:00:00"), 2L),
      (1L, 0.0, ts("2024-01-01 12:00:00"), 3L),
      (2L, -4.0, ts("2024-01-01 10:00:00"), 4L),
      (2L, -8.0, ts("2024-01-01 11:00:00"), 5L)
    ).toDF("user_id", "value", "ts", "event_id")
    val out = EventAnalytics.ewma(ev, "user_id", "ts", "value",
      scaleBits = 0, window = 2, orderCols = Seq("event_id"))
      .collect().map(r => r.getLong(1) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(out === Map(
      // warm-up: a single tick is its own EWMA (den renormalizes)
      1L -> ((1, 4L)),
      // [4,8]: (4·1 + 8·2) div (4−1) = 20 div 3 = 6 — leans newest
      2L -> ((2, 6L)),
      // [8,0]: 8 div 3 = 2 — decays toward the new level
      3L -> ((2, 2L)),
      4L -> ((1, -4L)),
      // negative numerator truncates toward zero in BOTH engines:
      // −20 div 3 = −6, not floor's −7
      5L -> ((2, -6L))), out.toString)
    intercept[IllegalArgumentException] {
      EventAnalytics.ewma(ev, "user_id", "ts", "value", window = 0)
    }
  }

  test("funnel requires stages in strict time order") {
    // u1 completes signup→view→click in order; u2 has the click BEFORE
    // the view (out of order — must not reach stage 3); u3 never views.
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 11:00:00")),
      (1L, "click", ts("2024-01-01 12:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:30:00")),
      (2L, "view", ts("2024-01-01 11:00:00")),
      (3L, "signup", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val rows = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view", "click"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set((1, "signup", 3L), (2, "view", 2L), (3, "click", 1L)))
  }

  test("funnel stage at the exact same timestamp does not count (strictly after)") {
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val rows = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("signup", 1L), ("view", 0L)))
  }

  test("windowed funnel rejects a stage that converts after the deadline") {
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 12:00:00")),   // within 3h — ok
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-01 14:00:01"))    // 4h 1s — too late
    ).toDF("user_id", "event_type", "ts")
    val rows = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view"), withinUs = Some(4L * 3600 * 1000000))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("signup", 2L), ("view", 1L)))
  }

  test("windowed funnel: a later in-window event still converts (min after filter)") {
    // the user's FIRST view is out of window, but a second view within
    // the window must still advance — the window filters candidates,
    // then min picks the earliest surviving one
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-05 10:00:00")),   // way out of window
      (1L, "view", ts("2024-01-01 11:00:00"))    // in window
    ).toDF("user_id", "event_type", "ts")
    val rows = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view"), withinUs = Some(2L * 3600 * 1000000))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("signup", 1L), ("view", 1L)))
  }

  test("transition matrix: rational probabilities per from-state") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 11:00:00"), 2L),
      (1L, "a", ts("2024-01-01 12:00:00"), 3L),
      (1L, "c", ts("2024-01-01 13:00:00"), 4L),
      (2L, "a", ts("2024-01-01 10:00:00"), 5L),
      (2L, "b", ts("2024-01-01 11:00:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val m = EventAnalytics.transitionMatrix(ev, "user_id", "event_type", "ts",
      Seq("event_id")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // from 'a': a->b twice, a->c once → 2/3 and 1/3
    assert(m(("a", "b")) === ((2L, 2.0 / 3.0)))
    assert(m(("a", "c")) === ((1L, 1.0 / 3.0)))
    assert(m(("b", "a")) === ((1L, 1.0)))
  }

  test("topPaths truncates to the first N events in (ts, order) order") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 11:00:00"), 2L),
      (1L, "c", ts("2024-01-01 12:00:00"), 3L),
      (2L, "a", ts("2024-01-01 10:00:00"), 4L),
      (2L, "b", ts("2024-01-01 11:00:00"), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val paths = EventAnalytics.topPaths(ev, "user_id", "event_type", "ts",
      firstN = 2, orderCols = Seq("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(paths === Map("a->b" -> 2L))
  }

  test("retention cohorts count a user once per active period") {
    // u1 first event in week of 2024-01-01 (Mon), active again twice in
    // the week of 2024-01-08 → one retained row, not two
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-09 12:00:00"))
    ).toDF("user_id", "ts")
    val rows = EventAnalytics.retentionCohorts(ev, "user_id", "ts", "week")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(
      ("2024-01-01 00:00:00.0", 0L, 1L),
      ("2024-01-01 00:00:00.0", 1L, 1L),
      ("2024-01-08 00:00:00.0", 0L, 1L)))
  }

  test("timeWeightedAvg weights each value by its holding time") {
    // value 10 held 1s, value 20 held 3s, last value carries no weight:
    // twap_milli = (10000*1s + 20000*3s) div 4s = 17500
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, ts("2024-01-01 00:00:01"), 20.0, 2L),
      (1L, ts("2024-01-01 00:00:04"), 99.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val r = EventAnalytics.timeWeightedAvg(ev, "user_id", "ts", "value",
      orderCols = Seq("event_id")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("twap_milli") === 17500L)
    assert(r.head.getAs[Long]("n_intervals") === 2L)
    assert(r.head.getAs[Long]("span_us") === 4000000L)
  }

  test("timeWeightedAvg breaks timestamp ties by the order columns") {
    // two ticks at the same ts: event_id order decides which value the
    // interval belongs to — deterministic on both engines
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, ts("2024-01-01 00:00:00"), 20.0, 2L),
      (1L, ts("2024-01-01 00:00:02"), 0.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val r = EventAnalytics.timeWeightedAvg(ev, "user_id", "ts", "value",
      orderCols = Seq("event_id")).collect().head
    // value 10 holds 0s (tie), value 20 holds 2s → twap_milli = 20000
    assert(r.getAs[Long]("twap_milli") === 20000L)
    assert(r.getAs[Long]("span_us") === 2000000L)
  }

  test("rollingAnomaly: spike flags, minPrior gate, zero-variance flags any deviation") {
    // 4 steady ticks at 10, then a spike to 100, then another 10
    val ev = (1 to 4).map(i =>
      (1L, ts(f"2024-01-01 00:00:0${i - 1}"), 10.0, i.toLong)) ++ Seq(
      (1L, ts("2024-01-01 00:00:04"), 100.0, 5L),
      (1L, ts("2024-01-01 00:00:05"), 10.0, 6L))
    val out = EventAnalytics.rollingAnomaly(ev.toDF("user_id", "ts", "value", "event_id"),
      "user_id", "ts", "value", window = 4, kMilli = 3000L, minPrior = 3,
      orderCols = Seq("event_id"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    // ticks 1-3 have fewer than minPrior=3 predecessors: never flag
    assert(out(1L) === ((0L, 10L, 0L, 0L, false)))
    assert(out(3L) === ((2L, 10L, 20L, 200L, false)))
    // tick 4: prior = {10,10,10}, zero variance, x == mean -> clean
    assert(out(4L) === ((3L, 10L, 30L, 300L, false)))
    // tick 5: prior = {10,10,10,10}, zero variance, x deviates -> the
    // constant-metric-just-jumped case flags (infinite z)
    assert(out(5L) === ((4L, 100L, 40L, 400L, true)))
    // tick 6: prior = {10,10,10,100} — the spike inflated σ (σ² =
    // 24300/16 ≈ 1519, z ≈ 0.58): returning to 10 is NOT an anomaly;
    // exact check (4·10−130)²·10⁶ = 8.1e9 vs 9e6·4·24300 = 8.75e11
    assert(out(6L) === ((4L, 10L, 130L, 10300L, false)))
    intercept[IllegalArgumentException] {
      EventAnalytics.rollingAnomaly(ev.toDF("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "value", window = 4, minPrior = 5)
    }
  }
}
