package graft.model

/**
 * Knob parity with the reference (SURVEY.md §6; reference:
 * retrieval/processors/processor_args.py:58-120, config.py:35-58,
 * lexical_graph_query_engine.py:218-224). These values define "the same
 * work" for benchmark comparison; library defaults route through here so
 * parity is enforced at one site.
 *
 * LexicalGraphBuilder's chunk constants (32/4 tokens, 64-d embeddings) are
 * deliberately scaled down from ChunkSizeTokens/ChunkOverlapTokens/
 * EmbeddingDim for the synthetic short-document corpus; production corpora
 * use these reference values.
 */
object Defaults {
  // retrieval seeding
  val VssTopK = 10
  val VssDiversityFactor = 5
  val IntermediateLimit = 50
  val QueryLimit = 10

  // processor chain
  val MaxSearchResults = 5
  val MaxStatementsPerTopic = 10
  val MaxStatements = 200
  val MaxTopics = 40 // rerank_topics.py (processor_args.py:112)
  val StatementPruningFactor = 0.05
  val ResultsPruningThreshold = 0.08

  // entity context expansion
  val EcMaxDepth = 3
  val EcMaxContexts = 3 // entity_context_search (processor_args.py:86)

  // beam searches
  val TopicBeamWidth = 100
  val TopicBeamDepth = 6
  val ChunkBeamWidth = 10
  val ChunkBeamDepth = 3

  // indexing
  val ChunkSizeTokens = 256
  val ChunkOverlapTokens = 25
  val EmbeddingDim = 1024
}
