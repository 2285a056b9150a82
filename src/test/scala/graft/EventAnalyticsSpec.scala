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
}
