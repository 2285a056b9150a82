package graft

import org.apache.spark.sql.functions._
import graft.ops.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type) fixture:
  //  u1: view@10  click@20  purchase@30   → full conversion
  //  u2: click@5  view@10  click@8        → view but no click AFTER it
  //  u3: view@10  click@20               → no purchase
  //  u4: purchase@1                      → never viewed
  private lazy val ev = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 5L, "click"), (2L, 10L, "view"), (2L, 8L, "click"),
    (3L, 10L, "view"), (3L, 20L, "click"),
    (4L, 1L, "purchase")
  ).toDF("user_id", "ts_us", "event_type")

  test("funnel counts strictly-after conversions only") {
    val rows = EventAnalytics.funnel(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("funnel ignores same-timestamp events (strict ordering)") {
    val sameTs = Seq((1L, 10L, "view"), (1L, 10L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val rows = EventAnalytics.funnel(sameTs, "user_id", "ts_us",
        "event_type", Seq("view", "click"))
      .orderBy("step_idx").collect()
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("funnel conversion window drops conversions past the gap") {
    // u1 converts within the 15-unit window; u2's click is 40 late
    val ev2 = Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 10L, "view"), (2L, 50L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val bounded = EventAnalytics.funnel(ev2, "user_id", "ts_us",
        "event_type", Seq("view", "click"), maxGapMicros = Some(15L))
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    assert(bounded === Seq(2L, 1L))
    val unbounded = EventAnalytics.funnel(ev2, "user_id", "ts_us",
        "event_type", Seq("view", "click"))
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    assert(unbounded === Seq(2L, 2L))
  }

  test("iqrOutliers flags only values outside the Tukey fences") {
    // [1..8, 100]: q1=3, q3=7, IQR=4 → fences [-3, 13]; only 100 is out
    val ev2 = ((1L to 8L).map(i => (i, "A", i.toDouble)) :+
      ((9L, "A", 100.0))).toDF("event_id", "event_type", "value")
    val rows = EventAnalytics.iqrOutliers(ev2, "event_type", "value",
        "event_id").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("id") === 9L &&
      rows.head.getAs[String]("side") === "high")
    // a tighter factor pulls in the tails symmetrically
    val tight = EventAnalytics.iqrOutliers(ev2, "event_type", "value",
        "event_id", factor = 0.25).collect()
    assert(tight.map(_.getAs[Long]("id")).sorted.toSeq === Seq(1L, 9L))
  }

  test("funnel refuses duplicate steps") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev, "user_id", "ts_us", "event_type",
        Seq("view", "view"))
    }
  }

  test("retention cohorts form the offset triangle") {
    // week length 10: u1 first wk0 active wk0,wk2; u2 first wk1 active wk1
    val e = Seq((1L, 5L), (1L, 25L), (1L, 27L), (2L, 15L))
      .toDF("user_id", "ts_us")
    val rows = EventAnalytics.retentionCohorts(e, "user_id", "ts_us",
        weekMicros = 10L)
      .orderBy("cohort_week", "week_offset").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("retention offset-0 row always covers the whole cohort") {
    val e = Seq((1L, 5L), (2L, 7L), (1L, 15L))
      .toDF("user_id", "ts_us")
    val rows = EventAnalytics.retentionCohorts(e, "user_id", "ts_us", 10L)
      .filter(col("week_offset") === 0).collect()
    assert(rows.map(_.getLong(2)).sum === 2L)
  }

  test("transitions counts per-user consecutive pairs and normalizes") {
    // u1: A→B→A; u2: A→A — cross-user boundaries must not pair
    val ev2 = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (2L, 1L, "A"), (2L, 2L, "A")).toDF("user_id", "ts_us", "event_type")
      .withColumn("event_id", col("ts_us"))
    val rows = EventAnalytics.transitions(ev2, "user_id", "ts_us",
        "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      ("A", "A", 1L, 2L, 500000L),
      ("A", "B", 1L, 2L, 500000L),
      ("B", "A", 1L, 1L, 1000000L)))
  }

  test("rateAnomalies z-scores a bucket against its trailing history") {
    // type A: buckets 0..5 with count 2 each (via 2 events per bucket),
    // bucket 6 with 12 events → trailing 6 buckets all equal → σ=0 → NULL
    // is wrong; make history {1,3,1,3,1,3} (μ=2, σ=1) and x=12 → z=+10
    val ev = (0 to 5).flatMap { b =>
      val n = if (b % 2 == 0) 1 else 3
      (1 to n).map(i => ("A", b * 100L + i))
    } ++ (1 to 12).map(i => ("A", 600L + i))
    val df = ev.toDF("event_type", "ts_us")
    val rows = EventAnalytics.rateAnomalies(df, "event_type", "ts_us",
        bucketMicros = 100L, trailing = 6, minPrev = 5)
      .collect()
    assert(rows.length === 2) // buckets 5 (5 prev) and 6 (6 prev)
    val b6 = rows.find(_.getAs[Long]("bucket") == 6L).get
    assert(b6.getAs[Long]("n_events") === 12L)
    assert(b6.getAs[Long]("n_prev") === 6L)
    assert(b6.getAs[Long]("z_micro") === 10000000L) // (12-2)/1 = 10
  }

  test("rateAnomalies emits NULL z when the trailing window is constant") {
    val ev = (0 to 5).flatMap(b => Seq(("A", b * 10L + 1), ("A", b * 10L + 2)))
    val rows = EventAnalytics.rateAnomalies(ev.toDF("event_type", "ts_us"),
        "event_type", "ts_us", bucketMicros = 10L, trailing = 5, minPrev = 5)
      .collect()
    assert(rows.length === 1 && rows.head.isNullAt(
      rows.head.fieldIndex("z_micro")))
  }

  test("forwardFill carries the last non-null value per key") {
    val df = Seq(
      (1L, 1L, None), (1L, 2L, Some(5.0)), (1L, 3L, None),
      (1L, 4L, Some(7.0)), (1L, 5L, None),
      (2L, 1L, None)
    ).toDF("user_id", "ts_us", "v")
    val got = EventAnalytics.forwardFill(df, "user_id", "ts_us", "v")
      .orderBy("user_id", "ts_us")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 1L, None), (1L, 2L, Some(5.0)), (1L, 3L, Some(5.0)),
      (1L, 4L, Some(7.0)), (1L, 5L, Some(7.0)),
      (2L, 1L, None)))
  }

  test("occupancy counts intervals per bucket across their full span") {
    // bucket 10: [0,25]→{0,1,2}, [10,35]→{1,2,3}, [40,40]→{4}
    val iv = Seq((0L, 25L), (10L, 35L), (40L, 40L))
      .toDF("session_start", "session_end")
    val rows = EventAnalytics.occupancy(iv, "session_start", "session_end",
        bucketMicros = 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("bucket_start_us"),
        r.getAs[Long]("active"))).toSeq
    assert(rows === Seq((0L, 0L, 1L), (1L, 10L, 2L), (2L, 20L, 2L),
      (3L, 30L, 1L), (4L, 40L, 1L)))
  }

  test("occupancy fails loudly on an interval wider than the span cap") {
    val iv = Seq((0L, 1000L)).toDF("s", "e")
    val ex = intercept[Exception] {
      EventAnalytics.occupancy(iv, "s", "e", bucketMicros = 10L,
        maxSpanBuckets = 50).collect()
    }
    assert(ex.getMessage.contains("occupancy interval inverted") ||
      String.valueOf(ex.getCause).contains("occupancy interval inverted"))
  }

  test("bucketing FLOORS negative epochs (DuckDB // and floor() parity)") {
    // ts = -1 with bucket 10 must land in bucket -1 (floor), not bucket 0
    // (truncate-toward-zero) — the pre-1970 disagreement between Spark's
    // `div` and both the oracle's `//` and TemporalJoins' floor() bins
    val e = Seq(("u1", -1L), ("u1", -10L), ("u1", 5L))
      .toDF("user_id", "ts_us")
    val weeks = EventAnalytics.retentionCohorts(e, "user_id", "ts_us", 10L)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"))).toSet
    // buckets: -1 → -1, -10 → -1, 5 → 0 ⇒ cohort -1 with offsets {0, 1}
    assert(weeks == Set((-1L, 0L), (-1L, 1L)))
    val occ = EventAnalytics.occupancy(
        Seq((-15L, 5L)).toDF("s", "e"), "s", "e", bucketMicros = 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("active"))).toSeq
    // [-15, 5] spans floor-buckets -2, -1, 0
    assert(occ === Seq((-2L, 1L), (-1L, 1L), (0L, 1L)))
  }
}
