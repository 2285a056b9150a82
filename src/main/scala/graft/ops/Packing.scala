package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions => T}

/**
 * Sequence packing for training-data assembly: assign every document a
 * (pack_id, pack_offset) slot in a stream of fixed-token-budget training
 * sequences, in a deterministic corpus order.
 *
 * This is the batch form of the packing step that turns a curated corpus
 * into fixed-length training sequences. The assignment here is offset
 * packing — documents are concatenated in id order and cut every `budget`
 * tokens, so a document may straddle a boundary (the trainer's loader
 * handles the split, as loaders do for concat-and-chunk datasets). The
 * whole computation is the distributed two-pass prefix sum (range
 * partition → per-partition running sums → broadcast per-partition
 * offsets), so no task ever materializes the global order: at 100 TB the
 * only shuffle is the range partitioning itself.
 */
object Packing {

  /** One row per document: its token length, global start offset in the
    * concatenated token stream, the pack (sequence) index its first token
    * lands in, and the offset within that pack. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val withLen = docs
      .select(col(idCol), T.tokenCount(col(textCol)).cast("long").as("tok_len"))
      .repartitionByRange(col(idCol))
      .withColumn("_pid", spark_partition_id())
    // pass 1: running sum within each range partition (exclusive of self)
    val wLocal = Window.partitionBy("_pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withLen.withColumn("_local",
      coalesce(sum("tok_len").over(wLocal), lit(0L)))
    // pass 2: per-partition totals — a few rows, tiny global window is fine
    val wOffset = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("_pid").agg(sum("tok_len").as("_psum"))
      .withColumn("_offset", coalesce(sum("_psum").over(wOffset), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("start_tok", col("_local") + col("_offset"))
      .withColumn("pack_id", floor(col("start_tok") / lit(budget.toLong)).cast("long"))
      .withColumn("pack_offset", col("start_tok") % lit(budget.toLong))
      .drop("_pid", "_local", "_offset")
  }
}
