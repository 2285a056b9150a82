package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Small-file compaction for parquet-backed stores — the maintenance op a
 * streaming ingest (StreamingIngest / StreamingVersions foreachBatch
 * appends) makes necessary: each micro-batch writes small files, and at
 * 100 TB a table shredded into millions of KB-scale files makes every
 * scan pay per-file open/footer costs and starves the scheduler with
 * tiny splits. Compaction rewrites the table into ~targetBytes files,
 * optionally re-establishing the [[RangeLayout]] sort so min/max pruning
 * survives the rewrite.
 *
 * The reference defers this to its stores (OpenSearch segment merges /
 * Postgres vacuum are their engines' compaction); for the file-backed
 * Spark store it is an engine-side operator.
 *
 * Planning is a deterministic running-total bin assignment over a fixed
 * file order (size-desc, then path): a file's bin is
 * `floor(sum(bytes of files BEFORE it) / targetBytes)` — each bin's
 * payload is below targetBytes plus its largest member (the classic
 * streaming bin-fill bound; CompactionSpec proves it), and the whole
 * plan replays as one SQL window. The global (unpartitioned) window is
 * safe BY CONSTRUCTION here: it ranks file-METADATA rows, one per file —
 * ~800k rows for 100 TB at 128 MB files — never data rows.
 */
object Compaction {

  /** Assign every file row a compaction bin. Output adds `bin` (0-based;
    * contiguous whenever no single file exceeds targetBytes — an
    * over-target file's span skips the intervening bin ids). `files`
    * carries one row per file: (pathCol, bytesCol). */
  def assignBins(files: DataFrame, pathCol: String, bytesCol: String,
                 targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val before = Window.orderBy(col(bytesCol).desc, col(pathCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.withColumn("bin",
      floor(coalesce(sum(col(bytesCol)).over(before), lit(0L))
        / lit(targetBytes.toDouble)).cast("long"))
  }

  /** One row per file backing `path`: (path, bytes) from the filesystem —
    * metadata listing only, no data read. */
  def fileStats(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val it = fs.listFiles(p, true)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        rows += ((st.getPath.toString, st.getLen))
    }
    import spark.implicits._
    rows.toSeq.toDF("path", "bytes")
  }

  /** Rewrite `inPath` into ~targetBytes output files at `outPath`.
    * With `sortCols` the rewrite goes through [[RangeLayout.write]]
    * (disjoint per-file key intervals — pruning survives compaction);
    * without, a plain repartition. Returns the number of output bins.
    * Reads whole-table once, writes once — the only shuffle is the
    * repartition(-ByRange) itself. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val totalBytes = fileStats(spark, inPath)
      .agg(sum(col("bytes"))).head().getLong(0)
    val bins = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(inPath)
    if (sortCols.nonEmpty) RangeLayout.write(df, outPath, sortCols, bins)
    else df.repartition(bins).write.mode("overwrite").parquet(outPath)
    bins
  }
}
