package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental vector-index maintenance over a structured stream: new
 * embeddings are routed into the cells of a FROZEN trained codebook as
 * they arrive, so the IVF index stays queryable between (infrequent)
 * retrains — exactly how production vector stores ingest: train on a
 * sample at build time, assign continuously, retrain when the balance
 * monitor complains.
 *
 * Reference contract: the vector-store add/upsert path
 * (lexical-graph storage/vector/vector_index.py:49-128 — backends index
 * incrementally server-side; this is the in-engine equivalent for the
 * [[graft.ops.MlAnn]] index family).
 *
 * Scale shape: [[assignCells]] is a stateless per-row select (the same
 * codegen'd argmin the batch index uses — stream output ≡ batch
 * assignment, spec-proven), so it rides any sink at full input rate with
 * no shuffle and no state store. [[cellLoad]] is the index-health monitor:
 * a streaming aggregate of per-cell arrival counts whose state is bounded
 * by the (tiny, fixed) cell count — skewed loads mean the codebook needs
 * retraining.
 */
object StreamingVectors {

  /** Route a stream (or batch frame) of (id, embedding) rows to their
    * nearest codebook cell. Pure select — works identically on streaming
    * and batch DataFrames. */
  def assignCells(stream: DataFrame, embCol: String, idCol: String,
                  centers: Array[Array[Double]]): DataFrame =
    graft.ops.MlAnn.assignCells(stream, embCol, idCol, centers)

  /** Per-cell arrival counts — state bounded by the cell count. Use with
    * OutputMode.Complete (or Update) on a monitoring sink. */
  def cellLoad(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
}
