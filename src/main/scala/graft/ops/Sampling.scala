package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H}

/**
 * Deterministic sampling for training-data pipelines.
 *
 * Random-number sampling (`df.sample`) depends on partition layout and RNG
 * state, so a resumed or re-partitioned 100 TB job samples a different set.
 * Hash sampling decides per ROW from a content hash: the same row is in or
 * out under any partitioning, any executor count, any engine — which also
 * makes it DuckDB-replayable, joinable across tables (sample the same
 * entities everywhere), and monotone in the rate (rate 0.2 ⊇ rate 0.1).
 * The reference's InferClassifications chunk sampling is the same idea's
 * in-memory cousin (indexing/extract/infer_classifications.py).
 */
object Sampling {

  /** Uniform [0,1) from the row's id: h60 is a 60-bit md5 slice, so the
    * ratio is an exact dyadic rational both engines compute identically. */
  def uniform01(c: Column, salt: String = ""): Column =
    H.h60(concat_ws("#", lit(salt), c.cast("string"))).cast("double") /
      lit(1.152921504606847e18)

  /** Keep each row with probability `rate`, decided by its id hash. `salt`
    * derives independent samples from the same corpus. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    df.filter(uniform01(col(idCol), salt) < rate)
  }

  /** Stratified hash sample: a per-stratum rate map with a default for
    * unlisted strata — the standard source/language rebalancing step when
    * assembling a training mix. One narrow pass, no shuffle. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double = 0.0,
                 salt: String = ""): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates outside [0,1]")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(uniform01(col(idCol), salt) < rateCol)
  }
}
