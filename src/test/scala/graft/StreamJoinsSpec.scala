package graft

import graft.ops.TemporalJoins
import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(minutes * 60L * 1000L)

  test("streamingRangeJoin over MemoryStreams matches the batch rangeJoin " +
    "on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, String, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamJoins.streamingRangeJoin(
      clicks.toDF().toDF("click_id", "k", "t"),
      purchases.toDF().toDF("purchase_id", "k", "w_start"),
      key = "k", ptTs = "t", ivTs = "w_start",
      windowSpan = "30 minutes", watermark = "10 minutes")
      .select(col("click_id"), col("purchase_id"))
    val query = out.writeStream.format("memory").queryName("srj_out")
      .outputMode(OutputMode.Append()).start()
    val clickRows = Seq(
      (1L, "u", ts(65)), (2L, "u", ts(80)), (3L, "u", ts(200)),
      (4L, "v", ts(70)))
    val purchaseRows = Seq(
      (10L, "u", ts(60)), (11L, "u", ts(75)), (12L, "v", ts(90)))
    try {
      clicks.addData(clickRows: _*)
      purchases.addData(purchaseRows: _*)
      query.processAllAvailable()
      // advance both watermarks far past every window so all results emit
      clicks.addData((99L, "z", ts(1000)))
      purchases.addData((99L, "z", ts(2000)))
      query.processAllAvailable()
      val got = spark.table("srj_out").as[(Long, Long)].collect().toSet
      // batch twin over the identical rows (epoch-micros axis)
      val cB = clickRows.map(r => (r._1, r._2, r._3.getTime * 1000L))
        .toDF("click_id", "k", "t")
      val pB = purchaseRows
        .map(r => (r._1, r._2, r._3.getTime * 1000L,
          r._3.getTime * 1000L + 30L * 60 * 1000000L))
        .toDF("purchase_id", "k", "w_start", "w_end")
      val want = TemporalJoins.rangeJoin(cB, "t", pB, "w_start", "w_end",
        key = Some("k"), binMicros = 30L * 60 * 1000000L)
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got == want &&
        got == Set((1L, 10L), (2L, 10L), (2L, 11L)))
    } finally query.stop()
  }
}
