package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming rate-anomaly monitoring — the streaming twin of
 * [[graft.ops.EventAnalytics.rateAnomalies]] for a live event feed: the
 * per-(type, window) volumes a 100 TB telemetry pipeline watches for
 * spikes and drops before trusting an hour's data.
 *
 * Same two-stage seam as [[StreamingTrends]], because the stages scale
 * differently:
 *
 *  1. [[windowedTypeCounts]] — the INCREMENTAL part: a watermarked
 *     (window, type) count. State is the open windows' partial counts
 *     (bounded by |types| × open windows — tiny); in append mode each
 *     window's count emits exactly once, when the watermark closes it.
 *     Identical code path on a batch frame (the watermark is a no-op),
 *     which is what the spec exploits for stream≡batch parity.
 *  2. [[graft.ops.EventAnalytics.scoreTrailing]] — the trailing z-score,
 *     run batch-side over the accumulated finalized counts (foreachBatch
 *     appends them to a counts table; the score needs the trailing
 *     `trailing` buckets, which no single micro-batch carries). The
 *     window there runs over the per-type bucket COUNTS frame, so the
 *     finishing pass costs |types| × buckets regardless of event volume.
 */
object StreamingAnomalies {

  /** Watermarked (type, bucket, n_events) counts over an event stream
    * with an epoch-micros `tsUsCol`; `bucket` is the window start in
    * epoch micros — [[graft.ops.EventAnalytics.scoreTrailing]] consumes
    * the frame directly (it only uses the bucket ORDER). Works
    * identically on a batch frame. */
  def windowedTypeCounts(events: DataFrame, typeCol: String, tsUsCol: String,
                         windowDuration: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col(typeCol).as("type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("type"), unix_micros(col("window.start")).as("bucket"),
        col("n_events"))
}
