package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Persisted mergeable sketches — the incremental-analytics pattern: a
 * 100 TB corpus lands in batches, and per-batch DataSketches HLL bytes
 * (Spark's `hll_sketch_agg`) persist as a COLUMN next to the batch's
 * stats; corpus-wide distinct counts then come from `hll_union_agg` over
 * the tiny sketch table — no rescan of any batch, ever. Unioning
 * per-batch sketches merges register state losslessly, so the
 * incremental estimate stays inside the sketch's error bound of the
 * whole-corpus single-pass estimate — but NOT bit-equal to it:
 * DataSketches HLL carries an order-sensitive HIP estimator and
 * sparse-mode promotions, so two different batch splits can differ in
 * the last ~1% (SketchesSpec pins both against the exact count).
 *
 * This complements the exact/approx switches elsewhere (vocabStats,
 * columnProfile): those answer one batch's question in one pass; this
 * stores the pass so the NEXT batch's question is O(sketches).
 */
object Sketches {

  /** Per-key token HLL sketches: (key, n_tokens, sketch bytes). */
  def tokenSketches(docs: DataFrame, textCol: String, keyCol: String,
                    lgK: Int = 12): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    docs
      .select(col(keyCol).as("k"),
        explode(graft.functions.WordGrams.grams(col(textCol), 1))
          .as("token"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tokens"),
        hll_sketch_agg(col("token"), lit(lgK)).as("sketch"))
  }

  /** Merge persisted sketch rows to one corpus row:
    * (n_tokens, distinct_estimate). */
  def mergeSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      sum(col("n_tokens")).as("n_tokens"),
      hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("distinct_estimate"))
}
