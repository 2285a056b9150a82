package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed trending terms over a document stream — the streaming twin of
 * [[graft.ops.TextAnalysis.ngramFrequencies]] (corpus vocabulary stats) for
 * a live ingest: which tokens are spiking in the window that just closed?
 * The monitoring signal a 100 TB ingest pipeline watches for crawler traps,
 * template floods, and topic drift before the bad batch reaches training.
 *
 * Two stages with an explicit seam, because they scale differently:
 *
 *  1. [[windowedTermCounts]] — the INCREMENTAL part: explode to
 *     (window, token) and count under a watermark. State is the open
 *     windows' partial counts (bounded by vocabulary × open windows); in
 *     append mode a window's counts emit exactly once, when the watermark
 *     closes it. Identical code path on a batch frame (Spark's unified
 *     API) — which is what the spec exploits for stream≡batch parity.
 *  2. [[topTerms]] — the per-window top-k truncation, run batch-side on
 *     each finalized micro-batch (foreachBatch) or over the batch frame:
 *     a [[graft.functions.TopKAgg]] heap per window, no sort of the
 *     (window, token) count table. Top-k cannot be maintained
 *     incrementally without keeping the full count table anyway, so the
 *     split puts the truncation exactly where the data is complete.
 *
 * Tokenization is the same compiled [[graft.functions.WordGrams]] scan the
 * batch vocabulary ops use — one pipeline definition for both worlds.
 */
object StreamingTrends {

  /** Watermarked (window_start_us, token) counts over a document stream
    * with an epoch-micros `tsCol` and a text column. Works identically on
    * a batch frame (the watermark is a no-op there). */
  def windowedTermCounts(docs: DataFrame, textCol: String, tsCol: String,
                         windowDuration: String = "1 hour",
                         watermark: String = "1 hour"): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    docs
      .withColumn("ts", timestamp_micros(col(tsCol)))
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.functions.WordGrams.grams(col(textCol), 1)).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(window(col("ts"), windowDuration), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("token"), col("n"))
  }

  /** Per-window top-k trending terms over a (window_start_us, token, n)
    * count frame — ties broken to the lexicographically smaller token, so
    * the trend list is deterministic. The heap aggregate never sorts the
    * full count table. */
  def topTerms(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.functions.TopKAgg.topKPerKeyRanked(counts,
      Seq("window_start_us"), Seq(negate(col("n")), col("token")), k, "rk")
      .select(col("window_start_us"), col("token"), col("n"), col("rk"))
  }
}
