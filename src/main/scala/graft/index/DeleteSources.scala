package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cascade deletion of sources and orphan garbage collection
 * (reference: indexing/build/delete_sources.py:44-200 — collect the
 * chunk/topic/statement/fact/entity ids reachable from a source, detach-delete
 * them, then GC facts/entities no longer supported by anything).
 *
 * On Spark the cascade is pure anti-join dataflow: each table is rewritten
 * minus the transitively-deleted ids. The delete id set is tiny, so every
 * anti-join broadcasts it; orphan GC is a semi-join against the survivors
 * (never a count-and-compare, which would need an extra aggregation).
 */
object DeleteSources {

  def apply(g: GraphTables, deleteSourceIds: DataFrame): GraphTables = {
    val del = broadcast(deleteSourceIds.select(col("source_id")).distinct())

    val sources = g.sources.join(del, Seq("source_id"), "left_anti")
    val chunks = g.chunks.join(del, Seq("source_id"), "left_anti")
    val liveChunkIds = chunks.select("chunk_id")

    // Topics survive if still mentioned in any live chunk; the mention edges
    // themselves shrink to live chunks.
    val topicMentionedIn = g.topicMentionedIn
      .join(liveChunkIds, Seq("chunk_id"), "left_semi")
    val topics = g.topics
      .join(topicMentionedIn.select("topic_id"), Seq("topic_id"), "left_semi")

    val statements = g.statements.join(liveChunkIds, Seq("chunk_id"), "left_semi")
    val liveStatementIds = statements.select("statement_id")

    // Orphan-fact GC: a fact lives iff it still supports a live statement.
    val factSupports = g.factSupports
      .join(liveStatementIds, Seq("statement_id"), "left_semi")
    val facts = g.facts
      .join(factSupports.select("fact_id"), Seq("fact_id"), "left_semi")

    // Orphan-entity GC: an entity lives iff referenced by a live fact.
    val liveEntityIds = facts.select(col("subject_entity_id").as("entity_id"))
      .union(facts.select(col("object_entity_id").as("entity_id")))
      .where(col("entity_id").isNotNull)
    val entities = g.entities.join(liveEntityIds, Seq("entity_id"), "left_semi")
    val entityRelations = g.entityRelations
      .join(entities.select(col("entity_id").as("src_entity_id")),
        Seq("src_entity_id"), "left_semi")
      .join(entities.select(col("entity_id").as("dst_entity_id")),
        Seq("dst_entity_id"), "left_semi")

    GraphTables(sources, chunks, topics, topicMentionedIn, statements,
      facts, factSupports, entities, entityRelations)
  }
}

/**
 * Restart-safe incremental processing (reference:
 * indexing/build/checkpoint.py — dedup already-processed nodes across runs).
 * The checkpoint is a `processed_ids` table; filtering a new batch is one
 * broadcast anti-join, and committing a batch is an append.
 */
object Checkpoint {
  /** Rows of `batch` whose `idCol` has not been processed yet. */
  def filterNew(batch: DataFrame, processed: DataFrame, idCol: String): DataFrame =
    batch.join(
      broadcast(processed.select(col(idCol)).distinct()), Seq(idCol), "left_anti")

  /** The updated checkpoint table after processing `batch`. */
  def commit(processed: DataFrame, batch: DataFrame, idCol: String): DataFrame =
    processed.select(col(idCol)).union(batch.select(col(idCol))).distinct()
}
