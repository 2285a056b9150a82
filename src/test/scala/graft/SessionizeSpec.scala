package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("batch sessionization splits on gaps > threshold") {
    val events = Seq(
      (1L, 100L, us(0), 1.0), (1L, 101L, us(10), 2.0), (1L, 102L, us(50), 3.0),
      (2L, 200L, us(5), 4.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val out = Sessionize.batchSessions(events, gapMinutes = 30)
      .orderBy("user_id", "session_seq")
      .select("user_id", "n_events").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("batch sessionization aggregates bounds and totals") {
    val events = Seq(
      (1L, 1L, us(0), 1.5), (1L, 2L, us(1), 2.5))
      .toDF("user_id", "event_id", "ts_us", "value")
    val row = Sessionize.batchSessions(events, 30).collect().head
    assert(row.getAs[Long]("session_start") == us(0))
    assert(row.getAs[Long]("session_end") == us(1))
    assert(row.getAs[Long]("total_value_cents") == 400L)
  }

  test("streaming sessions match batch semantics on the same events") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.SessionEvent]
    val sessions = Sessionize.streamingSessions(input.toDS(), gapMinutes = 30)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // NB timestamps sit above the initial watermark (0): a row exactly at
      // the watermark is dropped as late data.
      input.addData(
        Sessionize.SessionEvent(1L, us(60), 1.0),
        Sessionize.SessionEvent(1L, us(70), 2.0))
      query.processAllAvailable()
      // advance event time past the gap so the session times out
      input.addData(Sessionize.SessionEvent(2L, us(180), 9.0))
      query.processAllAvailable()
      input.addData(Sessionize.SessionEvent(2L, us(300), 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect()
      assert(out.contains((1L, 2L, 3.0)))
    } finally query.stop()
  }

  test("streaming windowed counts run with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double, String)]
    val df = input.toDF().toDF("event_id", "ts_us", "value", "event_type")
    val windowed = Sessionize.streamingWindowCounts(df)
    val query = windowed.writeStream
      .format("memory").queryName("windows_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((1L, us(60), 1.0, "click"), (2L, us(61), 2.0, "click"),
        (3L, us(62), 5.0, "view"))
      query.processAllAvailable()
      val out = spark.table("windows_out")
        .select("event_type", "n_events").as[(String, Long)].collect().toMap
      assert(out("click") == 2L && out("view") == 1L)
    } finally query.stop()
  }

  test("late within-gap event lowers the streaming session start (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val input = MemoryStream[Sessionize.SessionEvent]
    val sessions = Sessionize.streamingSessions(input.toDS(), gapMinutes = 30)
    val query = sessions.writeStream
      .format("memory").queryName("late_sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def us(min: Long): Long = min * 60L * 1000000L
      // batch 1: the session opens at t=100
      input.addData(Sessionize.SessionEvent(1L, us(100), 1.0))
      query.processAllAvailable()
      // batch 2: a late-but-within-watermark event at t=80 — within the
      // 30-minute gap of the open session, so batch semantics put the
      // session start at 80, not 100
      input.addData(Sessionize.SessionEvent(1L, us(80), 2.0))
      query.processAllAvailable()
      // advance event time far past the gap so the session times out
      input.addData(Sessionize.SessionEvent(2L, us(500), 9.0))
      query.processAllAvailable()
      input.addData(Sessionize.SessionEvent(2L, us(700), 1.0))
      query.processAllAvailable()
      val out = spark.table("late_sessions_out")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events", "total_value")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(out == Seq((us(80), us(100), 2L, 3.0)))
    } finally query.stop()
  }
}
