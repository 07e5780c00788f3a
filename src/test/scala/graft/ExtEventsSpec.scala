package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Events

class ExtEventsSpec extends AnyFunSuite {

  test("funnelSteps counts only in-order completions") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // user 1: full ordered funnel; user 2: click BEFORE signup (stops at 1);
    // user 3: signup then purchase but no click (purchase must not count)
    val rows = Seq(
      (1L, "signup", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "signup", 2L),
      (3L, "signup", 1L), (3L, "purchase", 2L))
    val df = rows.zipWithIndex.map { case ((u, t, ms), i) =>
      (i.toLong, new java.sql.Timestamp(base + ms), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.funnelSteps(df).collect()
    assert(out.map(r => (r.getAs[Int]("step"), r.getAs[Long]("n_users"))).toSeq
      === Seq((1, 3L), (2, 1L), (3, 1L)))
    assert(math.abs(out.last.getAs[Double]("conversion") - 1.0 / 3) < 1e-6)
  }

  test("topUsers ranks per (day, type) by count with user_id tiebreak") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    val rows =
      Seq.fill(3)((1L, "click")) ++ Seq.fill(2)((2L, "click")) ++
        Seq.fill(2)((3L, "click")) ++ Seq((4L, "view"))
    val df = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, new java.sql.Timestamp(base + i), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.topUsers(df, k = 2).collect()
    val click = out.filter(_.getAs[String]("event_type") == "click")
    // user 1 (3 events) first; users 2 and 3 tie at 2 → lower id wins rank 2
    assert(click.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("user_id"))).toSeq
      === Seq((1, 1L), (2, 2L)))
    val view = out.filter(_.getAs[String]("event_type") == "view")
    assert(view.map(_.getAs[Long]("user_id")).toSeq === Seq(4L))
  }
  test("dauWau counts trailing-7-day distinct users and stickiness") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val day = 86400000L
    val base = 1700006400000L // 2023-11-15 00:00 UTC, mid-day-safe offset
    // day 0: users 1,2; day 1: user 1 (twice — dedup); day 8: user 3
    // (day 8 is outside day 0/1's 7-day reach: its WAU is just user 3)
    val rows = Seq(
      (1L, 0L * day), (2L, 0L * day), (1L, 1L * day),
      (1L, 1L * day + 1000L), (3L, 8L * day))
    val df = rows.zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, new java.sql.Timestamp(base + off), u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.dauWau(df).collect()
    assert(out.map(r => (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toSeq
      === Seq((2L, 2L), (1L, 2L), (1L, 1L)))
    // day 1: DAU=1 (user 1 deduped), WAU=2 (users 1,2 within window)
    assert(math.abs(out(1).getAs[Double]("stickiness") - 0.5) < 1e-9)
    // only active days are reported (days 2..7 have windows but no DAU)
    assert(out.length === 3)
  }

  test("cooccurrence counts per-session type pairs and exact lift") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    val h = 3600000L
    // user 1: {click,view} then (2h later, new session) {click};
    // user 2: {click,view,purchase} — 3 sessions total
    val rows = Seq(
      (1L, 0L, "click"), (1L, 1000L, "view"), (1L, 2000L, "click"),
      (1L, 2 * h, "click"),
      (2L, 0L, "click"), (2L, 500L, "view"), (2L, 900L, "purchase"))
    val df = rows.zipWithIndex.map { case ((u, off, t), i) =>
      (i.toLong, new java.sql.Timestamp(base + off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.cooccurrence(df).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("lift"))).toMap
    // click in 3 sessions, view in 2, purchase in 1; S=3
    assert(byPair(("click", "view")) === (2L, 3L, 2L, 1.0))
    assert(byPair(("click", "purchase")) === (1L, 3L, 1L, 1.0))
    assert(byPair(("purchase", "view")) === (1L, 1L, 2L, 1.5))
    // pairs are unordered and deduped within session (no (view,click) row)
    assert(out.length === 3)
  }

  test("cooccurrenceCapped: high cap is exact; low cap keeps the earliest-seen types") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // one session with 4 distinct types in first-seen order
    // view(0) < click(100) < purchase(200) < error(300); a second session
    // (user 2) with {click, view} untouched by the cap
    val rows = Seq(
      (1L, 0L, "view"), (1L, 100L, "click"), (1L, 200L, "purchase"),
      (1L, 300L, "error"), (1L, 400L, "view"),
      (2L, 0L, "click"), (2L, 500L, "view"))
    val df = rows.zipWithIndex.map { case ((u, off, t), i) =>
      (i.toLong, new java.sql.Timestamp(base + off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // cap above the max per-session distinct-type count: bit-equal to exact
    val exact = graft.ext.Events.cooccurrence(df).collect().map(_.toSeq).toSeq
    val high = graft.ext.Events.cooccurrenceCapped(df, maxTypes = 10)
      .collect().map(_.toSeq).toSeq
    assert(high === exact)
    // cap 3 drops 'error' (4th by first-seen) from user 1's session: no
    // pair touches it; counts are over the capped incidence space
    val capped = graft.ext.Events.cooccurrenceCapped(df, maxTypes = 3).collect()
    assert(!capped.exists(r => r.getString(0) == "error" || r.getString(1) == "error"))
    val byPair = capped.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("n_ab")).toMap
    assert(byPair(("click", "view")) === 2L)
    assert(byPair(("click", "purchase")) === 1L)
    assert(byPair(("purchase", "view")) === 1L)
    assert(capped.length === 3)
  }

  test("conversionLag measures first-signup to first-later-purchase per cohort") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700006400000L
    val day = 86400000L
    // user 1: signup at 0, purchases at +2000 and +5000 → lag 2000
    // user 2: purchase BEFORE signup only → not converted
    // user 3: signup day 1, purchase day 1 +4000 → cohort day 1, lag 4000
    // user 4: two signups (first wins), purchase +3000 after first
    val rows = Seq(
      (1L, "signup", 0L), (1L, "purchase", 2000L), (1L, "purchase", 5000L),
      (2L, "purchase", 0L), (2L, "signup", 1000L),
      (3L, "signup", day), (3L, "purchase", day + 4000L),
      (4L, "signup", 100L), (4L, "signup", 900L), (4L, "purchase", 3100L))
    val df = rows.zipWithIndex.map { case ((u, t, off), i) =>
      (i.toLong, new java.sql.Timestamp(base + off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.conversionLag(df).collect()
    assert(out.length === 2)
    // cohort day 0: users 1 (lag 2000) and 4 (lag 3000) → p50 interpolated 2500
    assert(out(0).getAs[Long]("n_users") === 2L)
    assert(out(0).getAs[Double]("p50_ms") === 2500.0)
    assert(out(0).getAs[Double]("mean_ms") === 2500.0)
    // cohort day 1: user 3 alone
    assert(out(1).getAs[Long]("n_users") === 1L)
    assert(out(1).getAs[Double]("p50_ms") === 4000.0)
  }

  test("userConcentration brackets by exact count quantiles with ties included") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // 10 users: one whale with 91 events, nine with 1 each (total 100)
    val rows = (1 to 91).map(i => (100L, i.toLong)) ++ (2 to 10).map(u => (u.toLong, 0L))
    val df = rows.zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, new java.sql.Timestamp(base + off), u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ext.Events.userConcentration(df).collect()
    assert(out.map(_.getAs[Double]("p")).toSeq === Seq(0.90, 0.95, 0.99))
    // p99 quantile of {1x9, 91} interpolates above 1 → only the whale
    val p99 = out.find(_.getAs[Double]("p") == 0.99).get
    assert(p99.getAs[Long]("n_users") === 1L)
    assert(p99.getAs[Long]("n_events") === 91L)
    assert(p99.getAs[Double]("share") === 0.91)
    assert(p99.getAs[Long]("total_users") === 10L && p99.getAs[Long]("total_events") === 100L)
    // every bracket nests inside the next-smaller one
    val us = out.map(_.getAs[Long]("n_users"))
    assert(us(0) >= us(1) && us(1) >= us(2))
  }

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eventsDf(rows: (Long, Long, String, Double)*) = // (event_id, epochMs, type, value)
    rows.toDF("event_id", "ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("user_id", lit(42L))
      .withColumn("props", format_string("{\"k\": %d}", col("event_id")))
      .drop("ms")

  test("sessionize splits on >30min gaps and aggregates per session") {
    val h = 3600000L
    val df = eventsDf(
      (1L, 0L, "click", 1.0), (2L, 1000L, "click", 2.0),          // session 1
      (3L, 2 * h, "view", 3.0),                                   // session 2 (2h gap)
      (4L, 2 * h + 1800000L, "view", 4.0),                        // exactly 30min later → same session
      (5L, 2 * h + 1800000L + 1800001L, "click", 5.0))            // 30min+1ms → session 3
    val out = Events.sessionize(df).collect()
    assert(out.map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"))).toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 1L)))
    assert(out.head.getAs[Long]("start_ms") === 0L)
    assert(out.head.getAs[Long]("end_ms") === 1000L)
    assert(out.head.getAs[Double]("sum_value") === 3.0)
  }

  test("tumblingHourly groups on epoch-aligned hours per type") {
    val h = 3600000L
    val df = eventsDf(
      (1L, 100L, "click", 1.0), (2L, h - 1, "click", 2.0), // hour 0
      (3L, h + 5, "click", 4.0),                           // hour 1
      (4L, h + 6, "view", 8.0))                            // hour 1, other type
    val out = Events.tumblingHourly(df).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("n"))).toSeq ===
      Seq((0L, "click", 2L), (h, "click", 1L), (h, "view", 1L)))
    assert(out.head.getAs[Double]("sum_value") === 3.0)
  }

  test("funnel cohorts by first-signup day and counts horizon-bounded conversions") {
    val d = 86400000L
    val df = Seq(
      (1L, 0L, 1L, "signup"), (2L, 3 * d, 1L, "purchase"),        // converted
      (3L, 1000L, 2L, "signup"), (4L, 9 * d, 2L, "purchase"),     // beyond 7d horizon
      (5L, 1 * d, 3L, "purchase"), (6L, 2 * d, 3L, "signup"),     // purchase precedes signup
      (7L, 0L, 4L, "purchase"),                                   // never signed up: no cohort
      (8L, 2 * d + 5000, 5L, "signup"), (9L, 6 * d, 5L, "signup"),
      (10L, 4 * d, 5L, "purchase")                                // first signup day 2, converted
    ).toDF("event_id", "ms", "user_id", "event_type")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}")).drop("ms")
    val out = Events.funnel(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("1970-01-01", 2L, 1L, 0.5),   // users 1,2 — only 1 converts in 7d
      ("1970-01-03", 2L, 1L, 0.5)))  // users 3,5 — 3's purchase was before signup
  }

  test("retention counts users active exactly N days after their first day") {
    val d = 86400000L
    val df = Seq(
      // user 1: active day 0, day 1, day 1 again (dedup), day 9 (beyond max 7)
      (1L, 0L, 1L), (2L, 1 * d, 1L), (3L, 1 * d + 5000, 1L), (4L, 9 * d, 1L),
      // user 2: active day 0 only
      (5L, 2000L, 2L),
      // user 3: first day 1, active day 3
      (6L, 1 * d, 3L), (7L, 3 * d, 3L)
    ).toDF("event_id", "ms", "user_id")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}")).drop("ms")
    val out = Events.retention(df).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("1970-01-01", 0, 2L),  // users 1,2 start day 0
      ("1970-01-01", 1, 1L),  // user 1 returns next day (one row despite 2 events)
      ("1970-01-02", 0, 1L),  // user 3 starts day 1
      ("1970-01-02", 2, 1L))) // user 3 returns 2 days later; user 1 day 9 excluded
  }

  test("jsonProps extracts $.k and aggregates per type") {
    val df = eventsDf((1L, 0L, "click", 0.0), (2L, 1L, "click", 0.0), (7L, 2L, "view", 0.0))
    val out = Events.jsonProps(df).collect()
    val click = out.find(_.getString(0) == "click").get
    assert(click.getAs[Long]("n") === 2L)
    assert(click.getAs[Int]("min_k") === 1 && click.getAs[Int]("max_k") === 2)
    assert(click.getAs[Long]("sum_k") === 3L)
  }

  test("approxDistinct is within rsd of the exact count on real data") {
    val events = Tables.load(spark, SparkTestSession.sfDir, "events")
    val approx = Events.approxDistinct(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e).toDouble / e < 0.1, s"type $t: approx ${approx(t)} vs exact $e")
    }
  }

  test("approxDistinctChecked: exact columns match the exact agg, envelope flag always 1") {
    val events = Tables.load(spark, SparkTestSession.sfDir, "events")
    val out = Events.approxDistinctChecked(events)
    assert(out.columns.toSeq === Seq("event_type", "n", "exact_users", "approx_within_10pct"))
    assert(out.filter(col("approx_within_10pct") =!= 1).count() === 0L)
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"), count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("u"), r.getAs[Long]("c"))).toMap
    out.collect().foreach { r =>
      val (u, c) = exact(r.getString(0))
      assert(r.getAs[Long]("exact_users") === u && r.getAs[Long]("n") === c)
    }
  }

  test("anomalyHourly scores a burst hour against its trailing baseline") {
    val h = 3600000L
    // hours 0-3: 2 events each (baseline); hour 4: 10 events (spike)
    val calm = (0L until 4L).flatMap(k => Seq(
      (k * 2 + 1, k * h + 1000, "click", 1.0), (k * 2 + 2, k * h + 2000, "click", 1.0)))
    val burst = (0L until 10L).map(i => (100 + i, 4 * h + 1000 + i, "click", 1.0))
    val out = Events.anomalyHourly(eventsDf((calm ++ burst): _*)).collect()
    // hour 0 has no history -> dropped; hours 1-4 scored
    assert(out.length === 4)
    val spike = out.find(_.getAs[Long]("hour_ms") === 4 * h).get
    assert(spike.getAs[Long]("n") === 10L)
    assert(spike.getAs[Double]("baseline") === 2.0)
    assert(spike.getAs[Double]("spike_score") === 2.666667) // round((10-2)/3, 6)
    // calm hours score 0 (n == baseline)
    out.filter(_.getAs[Long]("hour_ms") < 4 * h)
      .foreach(r => assert(r.getAs[Double]("spike_score") === 0.0))
  }

  test("attribution groups by first event type; conversion is strictly later") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // user 1: view first, purchase later -> view converts
    // user 2: view first, no purchase -> view doesn't
    // user 3: purchase first, nothing later -> purchase, NOT self-converted
    // user 4: purchase first, second purchase later -> purchase, converted
    // user 5: same-ms tie -> event_id breaks it (click id 10 < view id 11)
    val rows = Seq(
      (1L, 1L, "view", 1L), (2L, 1L, "purchase", 5L),
      (3L, 2L, "view", 1L), (4L, 2L, "click", 5L),
      (5L, 3L, "purchase", 1L),
      (6L, 4L, "purchase", 1L), (7L, 4L, "purchase", 9L),
      (10L, 5L, "click", 7L), (11L, 5L, "view", 7L))
    val df = rows.map { case (eid, u, t, ms) =>
      (eid, new java.sql.Timestamp(base + ms), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.attribution(df).collect()
      .map(r => (r.getAs[String]("first_touch"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_converted"))).toSeq
    assert(out === Seq(("click", 1L, 0L), ("purchase", 2L, 1L), ("view", 2L, 1L)))
  }

  test("topPaths counts consecutive trigrams per user in (ms, event_id) order") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // user 1: a b c d -> paths a>b>c, b>c>d ; user 2: a b c -> a>b>c
    // user 3: only 2 events -> no trigram
    val rows = Seq(
      (1L, 1L, "a", 1L), (2L, 1L, "b", 2L), (3L, 1L, "c", 3L), (4L, 1L, "d", 4L),
      (5L, 2L, "a", 1L), (6L, 2L, "b", 2L), (7L, 2L, "c", 3L),
      (8L, 3L, "a", 1L), (9L, 3L, "b", 2L))
    val df = rows.map { case (eid, u, t, ms) =>
      (eid, new java.sql.Timestamp(base + ms), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.topPaths(df).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    assert(out === Seq((1, "a>b>c", 2L), (2, "b>c>d", 1L)))
  }

  test("transitions count within-session successors and normalize per from-type") {
    val base = 1700000000000L
    val gap = 1800000L
    // user 1: a b | (gap) c a  -> a>b in session 1; c>a in session 2
    // user 2: a b            -> a>b
    // boundary transition b>c (across the gap) must NOT count
    val rows = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 1000L),
      (3L, 1L, "c", 1000L + gap + 1000L), (4L, 1L, "a", 1000L + gap + 2000L),
      (5L, 2L, "a", 0L), (6L, 2L, "b", 500L))
    val df = rows.map { case (eid, u, t, ms) =>
      (eid, new java.sql.Timestamp(base + ms), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.transitions(df).collect()
      .map(r => (r.getAs[String]("from_event"), r.getAs[String]("to_event"),
        r.getAs[Long]("n"), r.getAs[Double]("p"))).toSeq
    assert(out === Seq(("a", "b", 2L, 1.0), ("c", "a", 1L, 1.0)))
    // probabilities sum to 1 per from-type on real data
    val events = Tables.load(spark, SparkTestSession.sfDir, "events")
    val real = Events.transitions(events).collect()
    assert(real.nonEmpty)
    real.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
  }

  test("rollingActive counts trailing-window days and flags gaps") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val day = 86400000L
    val base = 1700000000000L // mid-day UTC anchor
    // user 1 active on days 0,1,2, then a 10-day lapse, then day 12
    // (two events that day — must still count once); user 2: day 0 only
    val rows = Seq((1L, 0), (1L, 1), (1L, 2), (1L, 12), (1L, 12), (2L, 0))
    val df = rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, new java.sql.Timestamp(base + d * day), u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.rollingActive(df, windowDays = 7).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("active_days_7d"),
        r.getAs[Long]("gap_days")))
    assert(out.toSeq === Seq(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L), // ramp-up, consecutive days
      (1L, 1L, 10L),                            // lapse: window empty again
      (2L, 1L, 0L)))
    // determinism on the real fixture under repartitioning
    val events = Tables.load(spark0, SparkTestSession.sfDir, "events")
    val a = Events.rollingActive(events).collect().map(_.toSeq).toSeq
    val b = Events.rollingActive(events.repartition(11)).collect().map(_.toSeq).toSeq
    assert(a === b)
    // the rolling count never exceeds the window length
    assert(a.forall(_(2).asInstanceOf[Long] <= 7L))
  }

  test("abLift: cohorts partition users, moments reconcile, degenerate cohorts yield NULL z") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val events = Tables.load(spark0, SparkTestSession.sfDir, "events")
    val r = Events.abLift(events).collect().head
    val (nA, sA, nB, sB) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    // cohorts partition the user set; totals reconcile with raw counts
    assert(nA + nB === events.select("user_id").distinct().count())
    assert(sA + sB === events.filter(col("event_type") === "purchase").count())
    assert(r.getDouble(2) === math.round(sA.toDouble / nA * 1e6) / 1e6)
    // z carries diff's sign
    if (!r.isNullAt(7)) assert(r.getDouble(7).sign === r.getDouble(6).sign)
    // cohort of one user each: n>1 guard → NULL z, diff still defined.
    // user ids chosen so md5-bucket(1)=A is false/true appropriately —
    // derive cohorts the same way the engine does rather than hardcoding
    def bucketA(u: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100 < 50
    }
    val aUser = (1L to 50L).find(bucketA).get
    val bUser = (1L to 50L).find(!bucketA(_)).get
    val base = 1700000000000L
    def mk(rows: Seq[(Long, String)]) = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, new java.sql.Timestamp(base + i), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tiny = Events.abLift(mk(Seq((aUser, "purchase"), (bUser, "purchase"),
      (bUser, "purchase")))).collect().head
    assert(tiny.getLong(0) === 1L && tiny.getLong(3) === 1L)
    assert(tiny.isNullAt(7), tiny.toString)
    assert(tiny.getDouble(6) === 1.0)
    // zero variance (every user identical count): z NULL, not ±inf
    val aUser2 = (aUser + 1 to 99L).find(bucketA).get
    val bUser2 = (bUser + 1 to 99L).find(!bucketA(_)).get
    val flat = Events.abLift(mk(Seq(aUser, aUser2, bUser, bUser2)
      .map(u => (u, "purchase")))).collect().head
    assert(flat.getLong(0) === 2L && flat.getLong(3) === 2L)
    assert(flat.isNullAt(7), flat.toString)
  }

  test("asofJoin matches the latest strictly-prior right event per user") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // user 1: click@10 (id 0), view@20 (id 1), purchase@25 (id 2) → view
    //         purchase@20 (id 3): SAME ms as view but view has LOWER id →
    //         view sorts before in (ms, event_id), so it DOES match;
    //         click@20 (id 4) sorts after purchase id 3 → must not match it
    // user 2: purchase with no prior right event → NULL match columns
    // user 3: right events only after the purchase → NULL too
    val rows = Seq(
      (0L, 10L, 1L, "click"), (1L, 20L, 1L, "view"), (2L, 25L, 1L, "purchase"),
      (3L, 20L, 1L, "purchase"), (4L, 20L, 1L, "click"),
      (5L, 10L, 2L, "purchase"),
      (6L, 10L, 3L, "purchase"), (7L, 20L, 3L, "click"))
    val df = rows.map { case (id, off, u, t) =>
      (id, new java.sql.Timestamp(base + off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.asofJoin(df).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("match_event_id"))) None
         else Some((r.getAs[Long]("match_event_id"), r.getAs[Long]("lag_ms")))))
      .toMap
    assert(out(2L) === Some((4L, 5L)))  // click id 4 at (20,4) is the latest prior
    assert(out(3L) === Some((1L, 0L))) // equal-ms view, lower id → matches
    assert(out(5L) === None)
    assert(out(6L) === None)
    // non-purchase rows never appear on the left
    assert(out.keySet === Set(2L, 3L, 5L, 6L))
  }

  test("statusHistory collapses runs into [from, to) intervals with an open current row") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // user 1: click,click → view → click (three runs; the type REVISITS so
    // run identity is positional, not by type); user 2: one run, open
    val rows = Seq(
      (0L, 0L, 1L, "click"), (1L, 10L, 1L, "click"), (2L, 20L, 1L, "view"),
      (3L, 30L, 1L, "click"),
      (4L, 0L, 2L, "view"))
    val df = rows.map { case (id, off, u, t) =>
      (id, new java.sql.Timestamp(base + off), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.statusHistory(df).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[String]("status"), r.getAs[Long]("valid_from_ms"),
        if (r.isNullAt(r.fieldIndex("valid_to_ms"))) None else Some(r.getAs[Long]("valid_to_ms")),
        r.getAs[Long]("n_events")))
    assert(out.toSeq === Seq(
      (1L, 1L, "click", base, Some(base + 20L), 2L),
      (1L, 2L, "view", base + 20L, Some(base + 30L), 1L),
      (1L, 3L, "click", base + 30L, None, 1L),
      (2L, 1L, "view", base, None, 1L)))
  }

  test("statusHistory equals an independent run-length reference on 400 random events") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val rnd = new scala.util.Random(23)
    val base = 1700000000000L
    val types = Seq("a", "b", "c")
    val rows = (0 until 400).map { i =>
      (i.toLong, base + rnd.nextInt(100000).toLong, 1L + rnd.nextInt(5),
        types(rnd.nextInt(types.length)))
    }
    val df = rows.map { case (id, ms, u, t) =>
      (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.statusHistory(df).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[String]("status"), r.getAs[Long]("valid_from_ms"),
        if (r.isNullAt(r.fieldIndex("valid_to_ms"))) -1L else r.getAs[Long]("valid_to_ms"),
        r.getAs[Long]("n_events"))).toSeq
    // independent reference: per user sort by (ms, id), run-length encode
    val expect = rows.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)] // type, from, n
      for ((_, ms, _, t) <- sorted) {
        if (runs.nonEmpty && runs.last._1 == t)
          runs(runs.length - 1) = (t, runs.last._2, runs.last._3 + 1)
        else runs += ((t, ms, 1L))
      }
      runs.zipWithIndex.map { case ((t, from, n), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._2 else -1L
        (u, (i + 1).toLong, t, from, to, n)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got === expect)
    assert(got.count(_._5 == -1L) === 5, "one open row per user")
  }

  test("forecastEval scores seasonal-naive errors only where a prior-day bucket exists") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700002800000L // on an exact hour boundary
    val h = 3600000L
    val day = 86400000L
    // click: hour0→2 events, hour0+1d→3 (err +1); hour2→4, hour2+1d→2
    // (err −2); hour1→1 with NO next-day bucket → never evaluated
    val offs = Seq(0L, 1L) ++ Seq(day, day + 1L, day + 2L) ++
      Seq(2 * h, 2 * h + 1, 2 * h + 2, 2 * h + 3) ++ Seq(2 * h + day, 2 * h + day + 1) ++
      Seq(h)
    val df = offs.zipWithIndex.map { case (off, i) =>
      (i.toLong, new java.sql.Timestamp(base + off), 1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.forecastEval(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_hours_eval") === 2L)
    assert(r.getAs[Long]("abs_err_total") === 3L)
    assert(r.getAs[Long]("err_total") === -1L)
    assert(r.getAs[Double]("mae") === 1.5)
    assert(r.getAs[Double]("bias") === -0.5)
  }

  test("rangeJoin window bounds are [lo, hi) and anchors are a value-desc heap cut") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val base = 1700000000000L
    // anchor: error id 0 @ t=0 value 9.0 → window [-5min, +5min)
    // in: event exactly at lo (id 1, t=-300000) — inclusive
    // out: event exactly at hi (id 2, t=+300000) — exclusive
    // in: the anchor itself counts (n_errors ≥ 1)
    // second error id 3 value 1.0 @ t=10^9 off: topK=1 keeps only value 9.0
    val rows = Seq(
      (0L, 0L, "error", 9.0), (1L, -300000L, "click", 1.0),
      (2L, 300000L, "click", 1.0), (3L, 1000000000L, "error", 1.0))
    val df = rows.map { case (id, off, t, v) =>
      (id, new java.sql.Timestamp(base + off), 1L, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.rangeJoin(df, topK = 1).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("anchor_id") === 0L)
    assert(r.getAs[Long]("n_events") === 2L)   // anchor + lo-boundary click
    assert(r.getAs[Long]("n_errors") === 1L)
    assert(r.getAs[Long]("window_start_ms") === base - 300000L)
    assert(r.getAs[Long]("window_end_ms") === base + 300000L)
  }
}
