package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.VersionManager

/**
 * Streaming CDC apply: maintain the SCD-2 version store under a changelog
 * stream of (vid, payload, valid_from [, tombstone]) events — the
 * streaming half of the versioning suite (batch [[VersionManager
 * .mergeVersions]] builds the store, [[VersionManager.snapshotDiff]]
 * diffs it, this keeps it current as re-ingests arrive).
 *
 * Each micro-batch touches ONLY the vids present in the batch: the store
 * splits into an untouched partition (left_anti on the batch's distinct
 * vids — no interval recomputation, no rewrite of cold history) and an
 * affected partition whose open intervals re-merge together with the new
 * versions. At 100 TB the store is bucketed by vid, so both the semi and
 * anti join are shuffle-free storage-layout probes and per-batch cost is
 * O(touched vids), not O(store).
 *
 * Idempotency: versions dedup on (vid, valid_from) before the merge, so
 * an at-least-once redelivery of a change event cannot mint a duplicate
 * interval (the streaming requirement the batch builder doesn't have).
 * The dedup assumes redelivered events are byte-identical — a CORRECTION
 * must arrive under a new valid_from, or which payload survives the
 * (vid, valid_from) collision is partition-order-dependent.
 *
 * The store is read/written through caller seams (`readStore`/
 * `writeStore`) — parquet dirs in tests, bucketed tables at scale — the
 * [[StreamingIngest.ingest]] discipline.
 */
object StreamingVersions {

  /** Merge a batch of new version rows into an SCD-2 store frame.
    * Exposed for direct (non-streaming) incremental use and the spec. */
  def mergeBatch(store: DataFrame, batch: DataFrame, vidCols: Seq[String],
                 validFromCol: String, tieBreak: Seq[String]): DataFrame = {
    val touched = batch.select(vidCols.map(col): _*).distinct()
    val untouched = store.join(touched, vidCols, "left_anti")
    val affected = store.join(touched, vidCols, "left_semi")
      .drop("valid_to")
    val merged = VersionManager.mergeVersions(
      affected.unionByName(batch)
        .dropDuplicates(vidCols :+ validFromCol),
      vidCols, validFromCol, tieBreak)
    untouched.unionByName(merged)
  }

  /** Run the CDC apply over a changelog stream; each micro-batch rewrites
    * the store through the seams. Returns the running query. */
  def applyChanges(changes: DataFrame, vidCols: Seq[String],
                   validFromCol: String, tieBreak: Seq[String],
                   checkpointDir: String)
                  (readStore: () => DataFrame,
                   writeStore: DataFrame => Unit): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeStore(
          mergeBatch(readStore(), batch, vidCols, validFromCol, tieBreak))
      }
      .start()
}
