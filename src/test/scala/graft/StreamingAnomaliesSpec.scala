package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingAnomalies
import graft.ops.EventAnalytics

class StreamingAnomaliesSpec extends SparkSpec {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  // type A: 2 events in hour 0, 1 in hour 1, 5 in hour 2; type B: 1 in
  // hour 0 — plus a far-future row to close every window of interest
  private val events: Seq[(Long, String)] =
    Seq((us(1), "A"), (us(40), "A"), (us(70), "A"),
      (us(125), "A"), (us(130), "A"), (us(135), "A"), (us(140), "A"),
      (us(150), "A"), (us(10), "B"))

  test("streaming windowed type counts equal the batch path once closed") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counts = StreamingAnomalies.windowedTypeCounts(
      input.toDF().toDF("ts_us", "event_type"), "event_type", "ts_us",
      watermark = "30 minutes")
    val query = counts.writeStream
      .format("memory").queryName("anomaly_counts")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      // watermark advances at batch end; one more batch closes hours 0-2
      input.addData((us(600), "A"))
      query.processAllAvailable()
      input.addData((us(1200), "A"))
      query.processAllAvailable()
      // the first sentinel's own window (hour 10) closes too when the
      // second sentinel advances the watermark — compare the hours under
      // test, which the batch frame (no sentinels) defines
      val got = spark.table("anomaly_counts")
        .as[(String, Long, Long)].collect().toSet
        .filter(_._2 <= us(120))
      val batch = StreamingAnomalies.windowedTypeCounts(
          events.toDF("ts_us", "event_type"), "event_type", "ts_us")
        .as[(String, Long, Long)].collect().toSet
      assert(got == batch, s"stream $got != batch $batch")
      assert(got == Set(("A", 0L, 2L), ("A", us(60), 1L), ("A", us(120), 5L),
        ("B", 0L, 1L)))
    } finally query.stop()
  }

  test("scoreTrailing over the windowed counts flags the spike hour") {
    val counts = StreamingAnomalies.windowedTypeCounts(
      events.toDF("ts_us", "event_type"), "event_type", "ts_us")
    val scored = EventAnalytics.scoreTrailing(counts, trailing = 24,
        minPrev = 2)
      .as[(String, Long, Long, Long, Option[Long])].collect()
    // only hour 2 of type A has >= 2 trailing buckets: history {2, 1} →
    // μ=1.5, σ=0.5, x=5 → z = (5−1.5)/0.5 = 7
    assert(scored.toSeq === Seq(("A", us(120), 5L, 2L, Some(7000000L))))
  }
}
