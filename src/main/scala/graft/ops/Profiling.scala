package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset profiling — the per-column quality summary a training-data
 * pipeline publishes alongside each corpus snapshot (null rates, distinct
 * cardinalities, value ranges; the dataset-card numbers).
 *
 * One logical aggregation over the table produces every column's metrics;
 * the single output row then unpivots driver-free into one row per column
 * (explode over an in-row struct array — no shuffle, no per-column job).
 *
 * Distinct counts: `exact = true` uses `count(DISTINCT col)` — Catalyst
 * plans the multi-distinct aggregate via Expand, which replicates the scan
 * rows once per distinct column inside a single shuffle. That is the right
 * trade for oracle-exact profiles at test scale; at 100 TB profile with
 * `exact = false`, which swaps in HyperLogLog++ (`approx_count_distinct`)
 * so the whole profile stays ONE pass with map-side partial aggregation
 * and O(columns) state per partition (ProfilingSpec bounds the HLL error
 * against the exact path).
 *
 * min/max surface as strings so heterogeneous column types share one
 * output schema; keep profiled columns to integer/string types when a
 * replay oracle must match the rendering (float formatting differs across
 * engines).
 */
object Profiling {

  /** Per-column profile rows: (col_name, n_nonnull, n_distinct, min_s,
    * max_s), ordered by col_name. */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val nd = if (exact) countDistinct(col(c))
               else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"nn_$i"), nd.as(s"nd_$i"),
        min(col(c)).cast("string").as(s"mn_$i"),
        max(col(c)).cast("string").as(s"mx_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"nn_$i").as("n_nonnull"),
        col(s"nd_$i").cast("long").as("n_distinct"),
        col(s"mn_$i").as("min_s"), col(s"mx_$i").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /**
   * Population-stability drift between two snapshots of a categorical
   * distribution (cluster cells, languages, sources): per key the counts
   * on each side and the key's PSI term
   * (p_a − p_b)·ln(p_a / p_b) in micro-units — Σ psi_micro is the
   * population stability index, THE standard "did my corpus mix shift"
   * monitor (PSI > 0.2 conventionally means investigate). Shares are
   * add-one smoothed over the union key set so a key present on one side
   * only contributes a finite term instead of ±∞.
   *
   * Scale shape: two map-side-combinable counts + one full-outer join on
   * the key, totals recovered from the per-key frame itself and attached
   * as a 1-row broadcast cross join (the modularity/bm25 pattern — fully
   * lazy, no eager count pass). All inputs to the IEEE ops are exact
   * BIGINTs, so psi_micro replays bit-exactly in SQL.
   */
  def distributionDrift(a: DataFrame, b: DataFrame,
                        keyCol: String): DataFrame = {
    val ca = a.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("key"), "full_outer")
      .select(col("key"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = joined.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"),
      count(lit(1)).as("_k"))
    val pa = (col("n_a") + 1).cast("double") /
      (col("_ta") + col("_k")).cast("double")
    val pb = (col("n_b") + 1).cast("double") /
      (col("_tb") + col("_k")).cast("double")
    joined.crossJoin(broadcast(tot))
      .withColumn("psi_micro",
        round(lit(1000000.0) * (pa - pb) * log(pa / pb)).cast("long"))
      .select(col("key"), col("n_a"), col("n_b"), col("psi_micro"))
  }
}
