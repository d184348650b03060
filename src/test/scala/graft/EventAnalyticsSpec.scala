package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel requires steps strictly ordered per user") {
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 purchases but never clicks: stops at step 1
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 12:00:00"), "purchase"),
      // u3 clicks BEFORE signup: the click cannot count, stops at step 1
      (3L, ts("2024-01-03 09:00:00"), "click"),
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      // u4 never signs up: not even step 1
      (4L, ts("2024-01-04 10:00:00"), "click"),
      (4L, ts("2024-01-04 11:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnel(events)
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "signup", 3L), (2L, "click", 1L),
      (3L, "purchase", 1L)), s"got $r")
  }

  test("funnel step-2 event must follow the user's FIRST step-1 event") {
    // signup(10:00) click(09:00, too early) click(10:30, counts)
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnel(events, Seq("signup", "click"))
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "signup", 1L), (2L, "click", 1L)), s"got $r")
  }

  test("rolling features use a calendar RANGE frame, not a row frame") {
    val events = Seq(
      // three active days: Jan 1, Jan 5, Jan 20 (a 15-day gap)
      (1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (1L, ts("2024-01-01 11:00:00"), "view", 2.0),
      (1L, ts("2024-01-05 10:00:00"), "view", 4.0),
      (1L, ts("2024-01-20 10:00:00"), "view", 8.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.rollingFeatures(events)
      .orderBy("day_idx")
      .as[(Long, Long, Long, Double, Long, Double, Long)].collect().toSeq
    val d0 = 19723L // 2024-01-01 as days since 1970-01-01
    assert(r == Seq(
      // day 0: both events; window = itself
      (1L, d0, 2L, 3.0, 2L, 3.0, 0L),
      // day 4: Jan 1 is 4 days back -> inside [-6, 0]
      (1L, d0 + 4, 1L, 4.0, 3L, 7.0, 2L),
      // day 19: nothing within 6 days -> frame is just itself,
      // though the PREVIOUS ACTIVE day (Jan 5) still feeds the lag
      (1L, d0 + 19, 1L, 8.0, 1L, 8.0, 1L)), s"got $r")
  }

  test("anomalousDays flags only the spike day and skips constant series") {
    // u1: 19 days at 1 event + one day at 50 -> z = 4.36 (a single
    // outlier among n days caps at z = (n-1)/sqrt(n), so n must be >10
    // for 3 sigma to be reachable at all).
    // u2: 10 identical days -> variance 0, nothing flagged.
    val u1 = (1 to 19).map(d =>
      (1L, ts(f"2024-01-$d%02d 10:00:00"), "view")) ++
      Seq.fill(50)((1L, ts("2024-01-25 10:00:00"), "view"))
    val u2 = (10 to 19).map(d => (2L, ts(s"2024-02-$d 10:00:00"), "view"))
    val events = (u1 ++ u2).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.anomalousDays(events)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r.map(x => (x._1, x._3)) == Seq((1L, 50L)), s"got $r")
    assert(r.head._4 > 2.8, s"z-score should be large: $r")
  }

  test("cohortRetention cohorts by Monday week of first event") {
    val events = Seq(
      // u1 first active Mon 2024-01-01 week; active again the next week
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-10 10:00:00"), "view"),
      // u2 same cohort, only active in week 0 (Sunday is still that week)
      (2L, ts("2024-01-07 23:00:00"), "view"),
      // u3 cohort week of 2024-01-08, active weeks 0 and 2
      (3L, ts("2024-01-08 00:00:00"), "view"),
      (3L, ts("2024-01-22 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.cohortRetention(events)
      .as[(Timestamp, Long, Long)].collect().toSeq
    val w0 = ts("2024-01-01 00:00:00"); val w1 = ts("2024-01-08 00:00:00")
    assert(r == Seq(
      (w0, 0L, 2L), // u1 + u2 active in their first week
      (w0, 1L, 1L), // u1 retained one week later
      (w1, 0L, 1L), (w1, 2L, 1L)), s"got $r")
  }

  test("gapFill carries the last daily total across missing days") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 2.50),
      (1L, ts("2024-01-01 10:00:00"), 1.00), // day 0: 350 cents
      (1L, ts("2024-01-04 08:00:00"), 5.00), // day 3: 500 cents, gap 2
      (2L, ts("2024-01-02 12:00:00"), 9.99)  // single-day user: no fill
    ).toDF("user_id", "ts", "value")
    val r = EventAnalytics.gapFill(events)
      .orderBy($"user_id", $"day_idx")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val d0 = 19723L // days from 1970-01-01 to 2024-01-01
    assert(r == Seq(
      (1L, d0, 350L, false),
      (1L, d0 + 1, 350L, true),
      (1L, d0 + 2, 350L, true),
      (1L, d0 + 3, 500L, false),
      (2L, d0 + 1, 999L, false)), s"got $r")
  }

  test("pitJoin resolves the day-boundary state from the SCD2 ranges") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, "view", 1.0),
      (1L, ts("2024-01-01 10:00:00"), 11L, "view", 1.0),
      (1L, ts("2024-01-02 09:00:00"), 12L, "buy", 1.0),
      (1L, ts("2024-01-03 09:00:00"), 13L, "view", 1.0),
      (2L, ts("2024-01-01 09:00:00"), 20L, "buy", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val r = EventAnalytics.pitJoin(events)
      .orderBy($"user_id", $"day_idx")
      .as[(Long, Long, String)].collect().toSeq
    val d0 = 19723L // 2024-01-01
    assert(r == Seq(
      (1L, d0 + 1, "view"), // midnight Jan 2: still in the first view run
      (1L, d0 + 2, "buy")   // midnight Jan 3: inside the buy range
    ), s"got $r — single-day user 2 has no interior boundary")
  }

  test("madOutlierDays flags a planted spike that a z-score would mask") {
    // quiet days wobble 1/2/3 (lower median 2, MAD 1) + one 50-event
    // spike: the spike inflates σ enough that a 3σ z-test misses it,
    // while |50 − 2| = 48 > 5·MAD flags it
    def mk(u: Long, day: Int, n: Int) = (0 until n).map(i =>
      (u, ts(f"2024-01-${day}%02d 0${i % 9 + 1}:00:00")))
    val quiet = Seq(1, 2, 3, 1, 2, 3, 1)
    val rows = quiet.zipWithIndex.flatMap { case (n, i) =>
      mk(1L, i + 1, n) } ++ mk(1L, 8, 50)
    val events = rows.toDF("user_id", "ts")
    val out = EventAnalytics.madOutlierDays(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val d0 = 19723L
    assert(out.map(t => (t._1, t._2, t._3)) == Seq((1L, d0 + 7, 50L)),
      s"exactly the spike day flags: $out")
    val (_, _, _, med, mad) = out.head
    assert(med == 2L || med == 3L)
    assert(mad == 1L, "lower-median absolute deviation of the wobble")
  }

  test("rfm scores are population quintiles with inverted recency") {
    val r = EventAnalytics.rfm(Tables.events(spark, TestSpark.sfDir)).cache()
    // scores live in 1..5
    Seq("r", "f", "m").foreach { c =>
      assert(r.filter(r(c) < 1 || r(c) > 5).count() == 0, s"$c in 1..5")
    }
    // monotone: a strictly higher frequency can never score LOWER
    val byF = r.select($"frequency", $"f").distinct()
      .orderBy($"frequency").collect().map(x => (x.getLong(0), x.getLong(1)))
    byF.sliding(2).foreach { case Array((f1, s1), (f2, s2)) =>
      assert(f1 >= f2 || s1 <= s2, s"freq $f1->$f2 but score $s1->$s2")
    }
    // recency inversion: the user(s) active on the corpus's LAST day get 5
    val best = r.filter($"recency_days" === 0).select($"r").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(best == Seq(5L), "most recent users take the top recency score")
    // composite packs the three digits
    assert(r.filter($"rfm" =!=
      $"r" * 100 + $"f" * 10 + $"m").count() == 0)
  }

  test("scd2 collapses attribute runs into history rows with one open row") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, "view"),
      (1L, ts("2024-01-01 10:00:00"), 11L, "view"),
      (1L, ts("2024-01-02 09:00:00"), 12L, "buy"),
      (1L, ts("2024-01-03 09:00:00"), 13L, "view"),
      (2L, ts("2024-01-01 09:00:00"), 20L, "buy")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.scd2(events)
      .orderBy($"user_id", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(r == Seq(
      (1L, "view", ts("2024-01-01 09:00:00"),
        Some(ts("2024-01-02 09:00:00")), 2L, false),
      (1L, "buy", ts("2024-01-02 09:00:00"),
        Some(ts("2024-01-03 09:00:00")), 1L, false),
      (1L, "view", ts("2024-01-03 09:00:00"), None, 1L, true),
      (2L, "buy", ts("2024-01-01 09:00:00"), None, 1L, true)), s"got $r")
    // history invariant: per user, ranges tile without overlap and only
    // the last row is open
    val fx = EventAnalytics.scd2(Tables.events(spark, TestSpark.sfDir)).cache()
    val users = fx.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"is_current", 1L).otherwise(0L))
        .as("open"))
    assert(users.filter($"open" =!= 1L).count() == 0,
      "exactly one current row per user")
    val overlap = fx.filter(!$"is_current" && $"valid_to" < $"valid_from")
    assert(overlap.count() == 0, "closed ranges never run backwards")
  }
}
