package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTrends

class StreamingTrendsSpec extends SparkSpec {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  // two 1-hour windows of docs: window 0 trends "spark" (4 occurrences),
  // window 1 "flood" (4)
  private val docs = Seq(
    (us(1), "spark spark join"),
    (us(5), "spark stream"),
    (us(20), "join Spark!"),
    (us(70), "flood flood flood"),
    (us(80), "flood warn"),
    (us(90), "warn"))

  test("streaming windowed term counts equal the batch path, appended once " +
    "per closed window") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counts = StreamingTrends.windowedTermCounts(
      input.toDF().toDF("ts_us", "text"), "text", "ts_us",
      watermark = "10 minutes")
    val query = counts.writeStream
      .format("memory").queryName("trend_counts")
      .outputMode("append").start()
    try {
      input.addData(docs.take(3): _*)
      query.processAllAvailable()
      // window 0 is still open: nothing appended yet
      assert(spark.table("trend_counts").count() == 0)
      input.addData(docs.drop(3): _*)
      query.processAllAvailable()
      // the watermark advances at batch END; one more batch triggers the
      // append of the now-closed window 0
      input.addData((us(200), "later"))
      query.processAllAvailable()
      val got = spark.table("trend_counts")
        .as[(Long, String, Long)].collect().toSet
      // the no-data batch processAllAvailable drains also closes window 1
      // (wm=190min after the last batch), so both finalized windows match
      // the batch path; the 200-min window stays open and never appears
      val batch = StreamingTrends.windowedTermCounts(
        docs.toDF("ts_us", "text"), "text", "ts_us")
        .as[(Long, String, Long)].collect()
        .filter(_._1 <= us(60)).toSet
      assert(got == batch, s"stream $got != batch-windows-0/1 $batch")
      assert(got.contains((0L, "spark", 4L)) && got.contains((0L, "join", 2L)))
    } finally query.stop()
  }

  test("topTerms truncates per window with deterministic ties") {
    val counts = StreamingTrends.windowedTermCounts(
      docs.toDF("ts_us", "text"), "text", "ts_us")
    val top = StreamingTrends.topTerms(counts, k = 2)
      .as[(Long, String, Long, Int)].collect().toSet
    // window 0: spark(4), join(2); window 1: flood(4), warn(2)
    assert(top == Set(
      (0L, "spark", 4L, 1), (0L, "join", 2L, 2),
      (us(60), "flood", 4L, 1), (us(60), "warn", 2L, 2)))
    // tie on count → lexicographically smaller token ranks first
    val tie = Seq((0L, "bb aa")).toDF("ts_us", "text")
    val t = StreamingTrends.topTerms(
      StreamingTrends.windowedTermCounts(tie, "text", "ts_us"), k = 2)
      .orderBy("rk").as[(Long, String, Long, Int)].collect().toSeq
    assert(t.map(_._2) == Seq("aa", "bb"))
    intercept[IllegalArgumentException] {
      StreamingTrends.topTerms(counts, k = 0)
    }
  }
}
