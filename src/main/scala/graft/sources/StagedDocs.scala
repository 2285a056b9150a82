package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Staged extraction store: a re-playable tee between extract and build.
 *
 * The reference persists each extracted chunk as one JSON file under
 * `{docs_directory}/{collection_id}/{source_id}/{node_id}.json` and replays
 * the collection later as a document source, filtering node metadata down to
 * the extraction keys plus a caller allowlist
 * (reference: indexing/load/file_based_docs.py:141-259,
 * s3_based_docs.py — the same contract against S3 paths).
 *
 * Spark-native form: the staged collection is a JSON dataset partitioned by
 * `collection_id` and `source_id` — Hadoop path schemes make the local-FS and
 * S3 variants the same implementation, and partition pruning turns
 * "read collection X" into a directory scan of just that collection. Rows are
 * chunk-grained, matching the reference's one-file-per-chunk layout:
 * `(collection_id, source_id, chunk_id, text, metadata MAP<STRING,STRING>)`.
 */
object StagedDocs {

  /** Metadata keys always retained, mirroring the reference's
    * PROPOSITIONS_KEY / TOPICS_KEY / INDEX_KEY allowlist
    * (file_based_docs.py:141-158). */
  val AlwaysKeepKeys: Seq[String] =
    Seq("graft:propositions", "graft:topics", "graft:index")

  /** Chunk-row schema of the staged store. Explicit (not inferred) so the
    * JSON round-trip preserves the open metadata MAP — inference would
    * freeze it into a per-collection struct. */
  val schema: StructType = StructType(Seq(
    StructField("chunk_id", StringType),
    StructField("text", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  /** Write chunk-grained docs into the staged store, keeping only the
    * extraction metadata keys plus `metadataKeys` (None = keep all, the
    * reference's `metadata_keys=None` behavior). Chunks that already carry
    * the index routing key are build artifacts, not source chunks, and are
    * skipped (file_based_docs.py:246: nodes with INDEX_KEY are not staged). */
  def stage(docs: DataFrame, docsDirectory: String, collectionId: String,
            metadataKeys: Option[Seq[String]] = None): Unit = {
    val filtered = metadataKeys match {
      case None => docs
      case Some(keep) =>
        val keeps = (AlwaysKeepKeys ++ keep).map(lit(_))
        docs.withColumn("metadata",
          map_filter(col("metadata"), (k, _) => k.isin(keeps: _*)))
    }
    filtered
      // coalesce: a NULL metadata map makes array_contains NULL, and
      // filter() would silently DROP the row under three-valued logic —
      // a null-metadata chunk has no graft:index key, so it stays
      .filter(!coalesce(
        array_contains(map_keys(col("metadata")), "graft:index"), lit(false)))
      .withColumn("collection_id", lit(collectionId))
      .write.mode("append")
      .partitionBy("collection_id", "source_id")
      .json(docsDirectory)
  }

  /** Replay one staged collection as a chunk-grained DataFrame. The
    * collection filter prunes to that collection's directories — no other
    * collection is scanned. */
  def read(spark: SparkSession, docsDirectory: String,
           collectionId: String): DataFrame =
    spark.read
      .option("basePath", docsDirectory)
      .schema(schema
        .add("collection_id", StringType).add("source_id", StringType))
      .json(docsDirectory)
      .filter(col("collection_id") === collectionId)
      .drop("collection_id")

  /** List staged collection ids — a directory listing, no data scan
    * (the reference's collection directories). */
  def collections(spark: SparkSession, docsDirectory: String): Seq[String] = {
    val p = new Path(docsDirectory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("collection_id="))
      .map(_.stripPrefix("collection_id="))
      .sorted
  }
}
