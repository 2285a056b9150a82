package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.index.LexicalGraphBuilder
import graft.retrieve.ChunkBasedRetriever

/**
 * End-to-end flagship: ingest the documents corpus → build the lexical graph
 * → answer one retrieval query → formatted per-source context rows.
 * This is the Spark trace of `LexicalGraphQueryEngine.query` (SURVEY.md §3.1)
 * with deterministic stub extraction/embedding.
 */
object LexicalPipeline {

  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val g = LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source", "lang"))
      .persistAll()
    val queryEmbedding = embedQuery(spark, "spark join stream table")
    ChunkBasedRetriever.query(g, queryEmbedding)
  }

  /** The reference's complete `query()` trace: search → full 18-step
    * DEFAULT_PROCESSORS + formatting chain → final flat context rows. */
  def flagshipFullChain(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val g = LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source", "lang"))
      .persistAll()
    ChunkBasedRetriever.fullQuery(
      g, embedQuery(spark, "spark join stream table"))
  }

  /** Multipart flagship: a conjunction question shards into keywords, each
    * shard drives the full default chain with a shrunken budget, results
    * union (query_mode_retriever.py:28-68 over the real retriever). */
  def flagshipMultipart(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val g = LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source", "lang"))
      .persistAll()
    graft.retrieve.QueryModeRetriever.retrieve(
      new graft.llm.StubLLM,
      "spark join tables and stream batch rows",
      (q, max) => ChunkBasedRetriever.fullQuery(
        g, embedQuery(spark, q), maxResults = max))
  }

  /** Embed a query string with the same deterministic hash embedder the
    * indexing side uses (reference `to_embedded_query`, vector_index.py:20-45).
    * Driver-side HashEmbedder, NOT a spark.range(1) job: LlmSpec proves the
    * two bit-identical, and a query embed should never pay a cluster job. */
  def embedQuery(spark: SparkSession, text: String): Seq[Double] =
    new graft.llm.HashEmbedder(LexicalGraphBuilder.EmbeddingDim)
      .embed(text).toSeq
}
