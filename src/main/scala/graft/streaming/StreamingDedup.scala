package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One banded arrival: a document's id and minhash signature landing in an
  * LSH bucket (one row per (doc, band)). */
final case class BucketArrival(bucket: String, id: String, sig: Seq[Long])

/** Per-bucket streaming state: the member (id, signature) pairs seen so far,
  * newest first, capped at the operator's `maxBucketSize`. */
final case class BucketState(members: List[(String, Seq[Long])])

/** A near-dup candidate: ids ordered (`id_a` < `id_b`), `jaccard_est` =
  * fraction of matching signature positions — the same estimate the batch
  * [[graft.ops.Dedup.minhashLsh]] emits. */
final case class StreamPair(id_a: String, id_b: String, jaccard_est: Double)

/**
 * Incremental minhash-LSH near-duplicate detection over a document STREAM —
 * the streaming twin of [[graft.ops.Dedup.minhashLsh]] for ingest-time
 * dedup: a training-data pipeline that ingests continuously wants "does this
 * new document near-duplicate anything already ingested?" per micro-batch,
 * not a nightly O(corpus) self-join.
 *
 * Shape: each micro-batch computes the same compiled minhash signatures and
 * banded bucket keys as the batch operator, then
 * `flatMapGroupsWithState` keyed by bucket holds each bucket's member list
 * as state. A new arrival emits one candidate pair per stored member of its
 * bucket (and per earlier arrival in the same batch), then joins the state.
 * State is per-bucket and bounded (`maxBucketSize`), so total state grows
 * with the number of OCCUPIED buckets, not with pair count.
 *
 * Contracts (vs the batch operator):
 *  - candidate pairs are emitted AT-LEAST-ONCE: a pair colliding in two
 *    bands emits from both buckets (the batch op ends with one global
 *    `.distinct()`; a streaming global distinct would need unbounded
 *    state). Downstream exact-verify / clustering dedups naturally.
 *  - a bucket past `maxBucketSize` stops ACCUMULATING members: later
 *    arrivals still pair against the stored cap but aren't stored. A
 *    bucket that hot means a degenerate band (boilerplate shingle run) —
 *    the members it drops are the lowest-information candidates. The cap
 *    is what bounds state at 100 TB; set it to corpus tolerance.
 *  - within a batch, arrivals process in id order, so output is
 *    deterministic under micro-batch replay (same batch -> same pairs).
 */
object StreamingDedup {

  def nearDupPairs(stream: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 3,
                   maxBucketSize: Int = 64): Dataset[StreamPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    graft.functions.MinhashSignature.register(spark)
    val rows = numHashes / bands
    // identical banding to the batch operator: bucket = md5(band, slice)
    val banded = stream
      .select(col(idCol).cast("string").as("id"),
        graft.functions.MinhashSignature
          .signature(col(textCol), numHashes, shingleSize).as("sig"))
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(
        md5(concat_ws(",", col("band"),
          concat_ws(",", slice(col("sig"), col("band") * rows + 1,
            lit(rows))))).as("bucket"),
        col("id"), col("sig"))
      .as[BucketArrival]

    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[BucketArrival],
         state: GroupState[BucketState]) => {
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[StreamPair]
          // id-sorted for replay determinism; re-deliveries of a stored id
          // are dropped (the state IS the seen-set for this bucket)
          it.toSeq.sortBy(_.id).foreach { a =>
            if (!members.exists(_._1 == a.id)) {
              members.foreach { case (mid, msig) =>
                val (x, y) = if (a.id < mid) (a.id, mid) else (mid, a.id)
                var eq = 0
                var i = 0
                while (i < numHashes) {
                  if (a.sig(i) == msig(i)) eq += 1
                  i += 1
                }
                out += StreamPair(x, y, eq.toDouble / numHashes)
              }
              if (members.size < maxBucketSize) members ::= (a.id, a.sig)
            }
          }
          state.update(BucketState(members))
          out.iterator
        })
  }
}
