package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.GraphTables
import graft.ops.Similarity

/**
 * The remaining traversal retrievers (SURVEY.md §2.4): topic-based,
 * entity-based (with the var-length 0..1 statement hop), entity-network,
 * and the weighted composite that unions them
 * (reference: retrieval/retrievers/{topic_based_search.py:98-114,
 * entity_based_search.py:150-206, entity_network_search.py:62-85,
 * composite_traversal_based_retriever.py:194-237}).
 *
 * All retrievers return the flat statements frame
 * (source_id, topic_id, statement_id, chunk_id, statement, score) that the
 * [[Processors]] chain consumes.
 */
object Retrievers {

  private def materialize(g: GraphTables, statementIds: DataFrame,
                          retrieverScore: Double): DataFrame = {
    val ids = broadcast(statementIds.select("statement_id").distinct())
    val factCounts = g.factSupports
      .join(ids, Seq("statement_id"), "left_semi")
      .groupBy("statement_id").agg(count(lit(1)).as("n_facts"))
    g.statements.join(ids, Seq("statement_id"), "left_semi")
      .join(factCounts, Seq("statement_id"), "left")
      .join(g.chunks.select("chunk_id", "source_id"), Seq("chunk_id"))
      .select(col("source_id"), col("topic_id"), col("statement_id"),
        col("chunk_id"), col("value").as("statement"),
        (coalesce(col("n_facts"), lit(0L)).cast("double") * retrieverScore)
          .as("score"))
  }

  /** TopicBasedSearch: statements supported by facts whose statements belong
    * to the given topics — the fact double-hop
    * (reference topic_based_search.py:98-114). */
  def topicBased(g: GraphTables, topicIds: DataFrame,
                 intermediateLimit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val tids = broadcast(topicIds.select("topic_id").distinct())
    val topicStatements = g.statements.join(tids, Seq("topic_id"), "left_semi")
      .select("statement_id")
    val topicFacts = g.factSupports
      .join(topicStatements, Seq("statement_id"), "left_semi")
      .select("fact_id").distinct()
    // ordered cap: a bare distinct().limit() keeps a partition-order-
    // dependent subset when the expansion exceeds the limit (TakeOrdered,
    // so the sort never materializes beyond the cap)
    val statementIds = g.factSupports
      .join(broadcast(topicFacts), Seq("fact_id"), "left_semi")
      .select("statement_id").distinct()
      .orderBy("statement_id").limit(intermediateLimit)
    materialize(g, statementIds, 1.0)
  }

  /** EntityBasedSearch single-entity variant with the var-length 0..1
    * PREVIOUS hop: statements supported by the entity's subject facts, plus
    * each one's previous statement
    * (reference entity_based_search.py:191-206). */
  def entityBased(g: GraphTables, entityIds: DataFrame,
                  intermediateLimit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val eids = broadcast(entityIds.select("entity_id").distinct())
    val entityFacts = g.facts
      .join(eids.withColumnRenamed("entity_id", "subject_entity_id"),
        Seq("subject_entity_id"), "left_semi")
      .select("fact_id")
    val hop0 = g.factSupports
      .join(broadcast(entityFacts), Seq("fact_id"), "left_semi")
      .select("statement_id").distinct()
    // var-length 0..1: the statement itself union its PREVIOUS neighbor
    val hop1 = g.statements
      .join(broadcast(hop0), Seq("statement_id"), "left_semi")
      .where(col("prev_statement_id").isNotNull)
      .select(col("prev_statement_id").as("statement_id"))
    val statementIds = hop0.union(hop1).distinct()
      .orderBy("statement_id").limit(intermediateLimit) // deterministic cap
    materialize(g, statementIds, 1.0)
  }

  /** Multi-entity path search: bounded var-length 1..2 paths between the
    * start and end entity sets over the relation graph (undirected), then
    * facts whose subject AND object both lie on a path
    * (reference entity_based_search.py:150-170). */
  def entityPathFacts(g: GraphTables, startIds: DataFrame,
                      endIds: DataFrame): DataFrame = {
    val rel = g.entityRelations
      .select(col("src_entity_id").as("a"), col("dst_entity_id").as("b"))
    val und = rel.union(rel.select(col("b").as("a"), col("a").as("b")))
    val s = broadcast(startIds.select(col("entity_id").as("a")).distinct())
    val e1 = und.join(s, Seq("a"))
    // 1-hop paths a->b with b in endIds: nodes {a, b}
    val ends = broadcast(endIds.select(col("entity_id").as("b")).distinct())
    val p1 = e1.join(ends, Seq("b"))
      .select(array(col("a"), col("b")).as("nodes"))
    // 2-hop paths a->m->b: nodes {a, m, b}
    val p2 = e1.select(col("a"), col("b").as("m"))
      .join(und.select(col("a").as("m"), col("b")), Seq("m"))
      .join(ends, Seq("b"))
      .select(array(col("a"), col("m"), col("b")).as("nodes"))
    val pathNodes = p1.union(p2)
      .select(explode(col("nodes")).as("entity_id")).distinct()
    g.facts
      .join(broadcast(pathNodes.withColumnRenamed("entity_id", "subject_entity_id")),
        Seq("subject_entity_id"), "left_semi")
      .join(broadcast(pathNodes.withColumnRenamed("entity_id", "object_entity_id")),
        Seq("object_entity_id"), "left_semi")
  }

  /** EntityNetworkSearch: statements of topics reachable from the entity
    * context (reference entity_network_search.py:62-85). */
  def entityNetwork(g: GraphTables, entityIds: DataFrame,
                    intermediateLimit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val facts = g.facts.join(
      broadcast(entityIds.select(col("entity_id").as("subject_entity_id"))),
      Seq("subject_entity_id"), "left_semi")
    val stmtIds = g.factSupports
      .join(broadcast(facts.select("fact_id")), Seq("fact_id"), "left_semi")
      .select("statement_id")
    val topicIds = g.statements
      .join(broadcast(stmtIds), Seq("statement_id"), "left_semi")
      .select("topic_id").distinct()
    val statementIds = g.statements
      .join(broadcast(topicIds), Seq("topic_id"), "left_semi")
      .select("statement_id").distinct()
      .orderBy("statement_id").limit(intermediateLimit) // deterministic cap
    materialize(g, statementIds, 1.0)
  }

  /** Weighted composite: union of per-retriever results with weights applied
    * to scores (reference composite_traversal_based_retriever.py:194-237).
    * Dedup across retrievers happens in Processors.dedupResults. */
  def composite(results: Seq[(DataFrame, Double)]): DataFrame =
    results.map { case (df, w) =>
      df.withColumn("score", col("score") * w)
    }.reduce(_ union _)

  /** EntityContextSearch (reference entity_context_search.py:109-153): each
    * entity-context string re-queries a shrunken sub-retriever
    * (vss_top_k = 2, max 2 results) and the per-context results union. The
    * context list is ec_max_contexts-bounded, so the loop is a handful of
    * lazy plan branches — one Spark job total, like the composite. */
  def entityContextSearch(
      g: GraphTables,
      contexts: Seq[String],
      embed: String => Seq[Double],
      maxContexts: Int = graft.model.Defaults.EcMaxContexts,
      vssTopK: Int = 2,
      maxResults: Int = 2): DataFrame = {
    val branches = contexts.take(maxContexts).filter(_.nonEmpty).map { c =>
      Processors.truncateResults(
        ChunkBasedRetriever.search(g, embed(c), vssTopK), maxResults)
    }
    require(branches.nonEmpty, "entityContextSearch: no non-empty contexts")
    branches.reduce(_ unionByName _)
  }
}
