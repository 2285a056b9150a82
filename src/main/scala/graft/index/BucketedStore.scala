package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed parquet storage for the graph tables — the warehouse-scale form
 * of the in-memory caches used at test scale (SURVEY.md §1.4 "one long
 * edges DataFrame"; README "Design for 100 TB").
 *
 * Bucketing by join key pre-shuffles the data ONCE at write time: every
 * traversal join on `src` (and every statement join on `statement_id`) then
 * reads co-located buckets and sort-merge-joins with NO exchange — the
 * single biggest shuffle eliminator for repeated traversals over a 100 TB
 * edge table. Buckets also bound task input size (`buckets` ≈ data size /
 * target partition size).
 */
object BucketedStore {

  /** Write `df` as a parquet table bucketed and sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata flows from the catalog). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
