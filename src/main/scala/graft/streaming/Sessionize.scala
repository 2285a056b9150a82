package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event sessionization, batch and streaming.
 *
 * Batch: classic gaps-and-islands — a lag window marks session starts, a
 * running sum numbers the sessions, one aggregation closes them. Two shuffles
 * total (both on user_id), which is the floor for this computation.
 *
 * Streaming: the same semantics as flatMapGroupsWithState with an event-time
 * timeout — the stateful-processing shape the reference never needed
 * (SURVEY.md §2.10) but a 100 TB event pipeline does.
 */
object Sessionize {

  /** Sessions per user: a new session starts when the gap since the previous
    * event exceeds `gapMinutes`. `tsCol` must be epoch micros (LONG). */
  def batchSessions(events: DataFrame, gapMinutes: Int,
                    tsCol: String = "ts_us", userCol: String = "user_id",
                    tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val marked = events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col(tsCol) - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(col("value").cast(DecimalType(12, 2))) * 100).cast("long")
          .as("total_value_cents"))
  }

  final case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, total_value: Double)

  /** Streaming sessionization over a watermarked event stream: emits a
    * session once `gapMinutes` of event time passes without activity. */
  def streamingSessions(events: Dataset[SessionEvent], gapMinutes: Int)
                       (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.end, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_._2)
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v, _) =>
              cur match {
                case Some(s) if ts < s.start - gapUs =>
                  // out-of-order event more than a gap BEFORE the open
                  // session: under batch semantics it can never merge with
                  // [start, end], so it is its own completed session. (A
                  // later bridge event would retroactively merge in batch;
                  // bounded-state streaming cannot unemit — documented
                  // approximation shared by watermarked sessionizers.)
                  out ::= SessionOut(user, ts, ts, 1L, v)
                case Some(s) if ts - s.end <= gapUs =>
                  // within-gap merge — min() so a late event that precedes
                  // the session start LOWERS it, matching batchSessions
                  cur = Some(SessionState(math.min(s.start, ts),
                    math.max(s.end, ts), s.n + 1, s.total + v))
                case Some(s) =>
                  out ::= SessionOut(user, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(ts, ts, 1L, v))
                case None =>
                  cur = Some(SessionState(ts, ts, 1L, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000L + gapMinutes * 60000L)
            }
            out.reverseIterator
          }
      }
  }

  /** Streaming tumbling-window aggregation over the events stream — the
    * watermarked equivalent of the batch q_events_window plan. */
  def streamingWindowCounts(events: DataFrame, watermark: String = "1 hour")
  : DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
}
