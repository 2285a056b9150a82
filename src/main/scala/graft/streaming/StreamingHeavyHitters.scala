package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming heavy hitters — the live twin of
 * [[graft.ops.TextAnalysis.heavyHitters]]: maintain a Misra-Gries
 * frequent-tokens summary over an unbounded document stream with
 * O(capacity) state TOTAL, then (whenever asked) recount the candidate
 * set exactly over the accumulated corpus. The monitoring shape a 100 TB
 * ingest runs continuously: which tokens/templates are flooding the
 * crawl, without ever keeping a full vocabulary count table open.
 *
 * Per micro-batch (wire [[mergeBatch]] into `foreachBatch`):
 *
 *  1. the batch is sketched EXECUTOR-side by the same
 *     [[graft.functions.MisraGriesAgg]] scalar aggregate the batch
 *     operator uses — map-side partials, one O(capacity) candidate list
 *     to the driver, never a token-space groupBy;
 *  2. the driver folds that list into the persisted summary with the
 *     PODS'12 mergeable-summaries rule ([[mgMerge]]: add counts, subtract
 *     the (capacity+1)-th largest, drop non-positive). Mergeability is
 *     the whole point: the fold preserves the one-pass guarantee — every
 *     token with true stream count > n/(capacity+1) keeps a positive
 *     counter no matter how the stream was batched;
 *  3. the summary (≤ capacity rows + the running token total and batch
 *     high-water mark) is written as a NEW versioned parquet dir
 *     `statePath/v-<batchId>` via write-to-temp + atomic directory
 *     rename; older versions are deleted only after the rename lands.
 *     The version listing itself is the pointer — [[readState]] reads
 *     the highest-numbered version — so a crash at ANY point between
 *     batches leaves a complete previous state readable: mid-write
 *     leaves only ignored `_tmp_` garbage, mid-cleanup leaves an extra
 *     old version the next fold removes. (A plain mode("overwrite") of
 *     one dir had a delete-then-write window that could lose the whole
 *     summary plus the batch high-water mark.)
 *
 * Exactly-once under foreachBatch's at-least-once redelivery: the state
 * carries the last folded `batch_id`; a redelivered id at-or-below the
 * mark is skipped (the same discipline [[StreamingVersions]] documents).
 *
 * The summary's counts are LOWER BOUNDS (undercount ≤ n/(capacity+1)) —
 * like the batch operator, the candidate SET is the contract, so
 * [[finishExact]] recounts candidates over the accumulated corpus with
 * the batch operator's exact threshold arithmetic: the streamed answer
 * equals the batch answer on the same data, which is what the spec gates.
 */
object StreamingHeavyHitters {

  /** Misra-Gries merge of two (token, count) summaries at `capacity`
    * (Agarwal et al., "Mergeable Summaries", PODS 2012): sum counts; if
    * more than `capacity` tokens remain, subtract the (capacity+1)-th
    * largest count from all and drop the non-positive. Deterministic
    * output order: count desc, token asc. */
  def mgMerge(a: Seq[(String, Long)], b: Seq[(String, Long)],
              capacity: Int): Seq[(String, Long)] = {
    require(capacity > 0, "capacity must be positive")
    val m = mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (t, c) =>
      m.updateWith(t) {
        case Some(c0) => Some(c0 + c)
        case None     => Some(c)
      }
    }
    if (m.size > capacity) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      m.filterInPlace((_, c) => c > sub).mapValuesInPlace((_, c) => c - sub)
    }
    m.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  private val VersionDirRe = """v-(\d+)""".r

  /** The committed version directories under `statePath`, ascending by
    * batch id (crash-leftover `_tmp_` dirs are invisible here). A state
    * dir written by the PRE-versioned flat `mode("overwrite")` layout
    * (parquet files directly under statePath) is refused LOUDLY: reading
    * it as empty state would silently drop every accumulated count and
    * the redelivery-dedup watermark on upgrade (round-9 ADVICE). */
  private def versions(fs: org.apache.hadoop.fs.FileSystem,
                       root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Nil
    else {
      val entries = fs.listStatus(root).toSeq
      val vs = entries.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case VersionDirRe(id) => Some((id.toLong, st.getPath))
            case _ => None
          }
      }.flatten.sortBy(_._1)
      if (vs.isEmpty && entries.exists(st => st.isFile &&
          st.getPath.getName.endsWith(".parquet")))
        throw new IllegalStateException(
          s"heavy-hitters state at $root uses the legacy FLAT layout " +
            "(parquet files at the root, no v-<batchId> version dirs) — " +
            "reading it as empty would silently reset all accumulated " +
            "counts; migrate by moving the files into a v-<lastBatchId> " +
            "subdirectory (they are the state as of that batch)")
      vs
    }

  /** The latest committed state version's path, if any — the frame to
    * hand [[finishExact]]. */
  def latestStatePath(s: SparkSession, statePath: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    versions(fs, root).lastOption.map(_._2.toString)
  }

  /** (summary, total stream tokens, last folded batch id) from the
    * highest committed state version; empty state if none exists yet. */
  def readState(s: SparkSession, statePath: String)
  : (Seq[(String, Long)], Long, Long) = {
    val latest = latestStatePath(s, statePath)
      .getOrElse(return (Nil, 0L, -1L))
    val rows = s.read.parquet(latest).collect()
    if (rows.isEmpty) return (Nil, 0L, -1L)
    val meta = rows.head // every row carries the same meta columns
    (rows.toSeq.filter(!_.isNullAt(0))
       .map(r => (r.getString(0), r.getLong(1)))
       .sortBy { case (t, c) => (-c, t) },
      meta.getLong(2), meta.getLong(3))
  }

  /** foreachBatch body: sketch `batch`, fold into the state at
    * `statePath`, skip already-folded batch ids. The batch sketch is the
    * only distributed work; the fold is ≤ 2·capacity driver rows. */
  def mergeBatch(batch: DataFrame, textCol: String, statePath: String,
                 capacity: Int, batchId: Long): Unit = {
    require(capacity > 0, "capacity must be positive")
    val s = batch.sparkSession
    graft.functions.WordGrams.register(s)
    import org.apache.spark.sql.GraftSqlBridge
    val (prev, prevNtok, prevBatch) = readState(s, statePath)
    if (batchId <= prevBatch) return // redelivered micro-batch: folded
    val row = batch
      .select(graft.functions.WordGrams.grams(col(textCol), 1).as("toks"))
      .agg(coalesce(sum(size(col("toks")).cast("long")), lit(0L)).as("ntok"),
        GraftSqlBridge.misraGries(col("toks"), capacity).as("sketch"))
      .head()
    val ntokB = row.getLong(0)
    val sketchB = row.getSeq[Row](1).map(r => (r.getString(0), r.getLong(1)))
    val merged = mgMerge(prev, sketchB, capacity)
    import s.implicits._
    // a token-less stream still needs its meta row: keep a null sentinel
    val frame =
      if (merged.isEmpty) Seq((Option.empty[String], 0L)).toDF("token", "cnt")
      else merged.map { case (t, c) => (Option(t), c) }.toDF("token", "cnt")
    // atomic commit: write the new version to a temp dir, rename it into
    // place (directory rename is atomic on HDFS and posix local FS; the
    // target cannot exist — redelivered ids were skipped above), THEN
    // garbage-collect older versions and temp leftovers. A crash at any
    // point leaves the previous version intact and readable.
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_tmp_v-$batchId")
    val committed = new org.apache.hadoop.fs.Path(root, s"v-$batchId")
    frame
      .withColumn("n_tokens", lit(prevNtok + ntokB))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, committed))
      throw new java.io.IOException(
        s"heavy-hitters state commit failed: rename $tmp -> $committed")
    // best-effort cleanup (older versions + any crashed temp dirs): a
    // failure here only costs disk, never state
    versions(fs, root).filter(_._1 < batchId)
      .foreach { case (_, p) => fs.delete(p, true) }
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_tmp_")
        && st.getPath.getName != tmp.getName)
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Exact finisher — the batch operator's second pass over the
    * ACCUMULATED corpus: recount only the streamed summary's candidates,
    * keep those at/above ceil(n · phi) where n is the streamed token
    * total. With capacity > 1/phi the summary provably contains every
    * true phi-hitter, so this equals
    * [[graft.ops.TextAnalysis.heavyHitters]] on the same data. */
  def finishExact(corpus: DataFrame, textCol: String, state: DataFrame,
                  phiNum: Long, phiDen: Long): DataFrame = {
    require(phiNum > 0 && phiDen > 0, "phi must be positive")
    val s = corpus.sparkSession
    graft.functions.WordGrams.register(s)
    val st = state.select(col("token"), col("n_tokens")).collect()
    val cands = st.toSeq.filter(!_.isNullAt(0)).map(_.getString(0))
    val ntok = if (st.isEmpty) 0L else st.head.getLong(1)
    val thr = if (ntok == 0) 1L else (ntok * phiNum + phiDen - 1) / phiDen
    corpus
      .select(explode(
        graft.functions.WordGrams.grams(col(textCol), 1)).as("token"))
      .filter(col("token").isin(cands: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(desc("cnt"), col("token"))
  }
}
