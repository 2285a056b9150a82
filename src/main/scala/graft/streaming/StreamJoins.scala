package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream temporal joins — the continuous twin of
 * [[graft.ops.TemporalJoins.rangeJoin]] (SURVEY.md §2.10 extension).
 *
 * Structured Streaming's stream-stream inner join needs exactly what the
 * batch operator's semantics provide: an equality key plus a bounded
 * event-time interval condition, with a watermark on BOTH sides so the
 * state store can expire rows — an interval row is dropped once the point
 * stream's watermark passes its window end, a point once the interval
 * stream's watermark passes its timestamp. Without the time bound the
 * join state grows forever; this API makes the bound unavoidable.
 */
object StreamJoins {

  /**
   * Points landing inside `[intervalTs, intervalTs + windowSpan)` per key,
   * over two watermarked streams. `ptTs`/`ivTs` must be TIMESTAMP columns
   * (event time); `windowSpan`/`watermark` are SQL interval strings
   * (e.g. "6 hours", "30 minutes"). Append-mode results are row-identical
   * to the batch rangeJoin over the same data (spec-pinned).
   *
   * The two inputs must be distinct streams (or aliased copies): the key
   * columns are resolved per-side by NAME against each frame.
   */
  def streamingRangeJoin(points: DataFrame, intervals: DataFrame,
                         key: String, ptTs: String, ivTs: String,
                         windowSpan: String, watermark: String): DataFrame = {
    val p = points.withWatermark(ptTs, watermark).alias("p")
    val i = intervals.withWatermark(ivTs, watermark).alias("i")
    p.join(i,
      col(s"p.$key") === col(s"i.$key") &&
        col(s"p.$ptTs") >= col(s"i.$ivTs") &&
        col(s"p.$ptTs") < col(s"i.$ivTs") + expr(s"INTERVAL $windowSpan"))
  }
}
