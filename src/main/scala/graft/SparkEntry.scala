package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query inventories (graft.queries.*). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.LexicalPipeline.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.MaintenanceQueries.queries ++
      graft.queries.ProcessorQueries.queries ++
      graft.queries.LexicalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.MaintenanceQueries.oracles ++
      graft.queries.ProcessorQueries.oracles ++
      graft.queries.LexicalQueries.oracles
}
