package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.index.GraphTables
import graft.ops.Similarity

/**
 * ChunkBasedSearch: vector top-k over chunk embeddings (with per-source
 * diversity) → chunk→statement→topic→source traversal joins → per-statement
 * fact aggregation → the central materialization shape
 * (reference: chunk_based_search.py:88-102 +
 * traversal_based_base_retriever.py:143-217).
 *
 * The traversal is a chain of broadcast joins seeded by the (tiny) top-k
 * chunk id set — the Spark analog of `WHERE chunkId IN $chunkIds`.
 */
object ChunkBasedRetriever {

  def search(
      g: GraphTables,
      queryEmbedding: Seq[Double],
      vssTopK: Int = graft.model.Defaults.VssTopK,
      diversityFactor: Int = graft.model.Defaults.VssDiversityFactor): DataFrame = {

    // Seed: diverse vector top-k over chunks (§2.3).
    val seedChunks = Similarity.diverseTopK(
      g.chunks, "embedding", "chunk_id", "source_id",
      queryEmbedding, vssTopK, diversityFactor)
      .select(col("id").as("chunk_id"), col("score").as("vss_score"))

    // Traversal joins: statements mentioned in the seed chunks, their topics
    // and sources; fact support counts become statement scores
    // (reference traversal_base:208-216 score = number of supporting facts).
    val stmts = g.statements
      .join(broadcast(seedChunks), Seq("chunk_id"))
    val factCounts = g.factSupports
      .join(broadcast(stmts.select("statement_id")), Seq("statement_id"), "left_semi")
      .groupBy("statement_id").agg(count(lit(1)).as("n_facts"))
    stmts
      .join(factCounts, Seq("statement_id"), "left")
      .join(g.chunks.select(col("chunk_id"), col("source_id")), Seq("chunk_id"))
      .select(
        col("source_id"), col("topic_id"), col("statement_id"), col("chunk_id"),
        col("value").as("statement"),
        coalesce(col("n_facts"), lit(0L)).cast("double").as("score"))
  }

  /** Full flagship dataflow: search → processor chain → formatted context
    * (reference DEFAULT_PROCESSORS order, traversal_base:24-46). */
  def query(
      g: GraphTables,
      queryEmbedding: Seq[Double],
      vssTopK: Int = graft.model.Defaults.VssTopK,
      maxStatementsPerTopic: Int = graft.model.Defaults.MaxStatementsPerTopic,
      maxResults: Int = graft.model.Defaults.MaxSearchResults): DataFrame = {
    val raw = search(g, queryEmbedding, vssTopK)
    val processed = Seq[DataFrame => DataFrame](
      Processors.dedupResults,
      Processors.rescoreResults,
      df => Processors.truncateStatements(df, maxStatementsPerTopic),
      df => Processors.truncateResults(df, maxResults)
    ).foldLeft(raw)((df, p) => p(df))
    Processors.formatContext(processed)
  }
}
