package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.GraphTables
import graft.llm.LLM

/**
 * Lexical graph summary over the BUILT graph (reference
 * retrieval/summary/graph_summary.py:60-173): the prompt-seeding summary is
 * assembled from (a) the top entities by subject-fact degree rendered as
 * "value [class]" and (b) the dominant class-level paths rendered as
 * "(SrcClass)-[REL]->(DstClass)" — the reference reads the latter from its
 * materialized `__SYS_Class__` nodes; here the same aggregation runs
 * directly over the entity/relation tables (one groupBy each, top-k via
 * TakeOrderedAndProject). The LLM turn over the two bounded line sets is
 * the only driver-side step.
 */
object GraphSummary {

  /** Top-k entities by subject-fact degree: (entity, score)
    * (graph_summary.py:60-73). */
  def entityLines(g: GraphTables, k: Int = 100): DataFrame = {
    val degree = g.facts.groupBy(col("subject_entity_id").as("entity_id"))
      .agg(count(lit(1)).as("score"))
    degree.join(g.entities, Seq("entity_id"))
      .select(concat(col("value"), lit(" ["), col("classification"),
        lit("]")).as("entity"), col("score"))
      .orderBy(desc("score"), col("entity"))
      .limit(k)
  }

  /** Top-k class-level paths: (path, score) — relation edges aggregated to
    * their endpoint classifications (the __SYS_Class__ analogue,
    * graph_summary.py:75-91). */
  def classPaths(g: GraphTables, k: Int = 100): DataFrame = {
    val src = g.entities.select(col("entity_id").as("src_entity_id"),
      col("classification").as("src_class"))
    val dst = g.entities.select(col("entity_id").as("dst_entity_id"),
      col("classification").as("dst_class"))
    g.entityRelations
      .join(src, Seq("src_entity_id"))
      .join(dst, Seq("dst_entity_id"))
      .groupBy(col("src_class"), col("relation_value"), col("dst_class"))
      .agg(count(lit(1)).as("score"))
      .select(concat(lit("("), col("src_class"), lit(")-["),
        col("relation_value"), lit("]->("), col("dst_class"), lit(")"))
        .as("path"), col("score"))
      .orderBy(desc("score"), col("path"))
      .limit(k)
  }

  /** Per-tenant summary listing (the `__SYS_Tenant__` axis,
    * graph_summary.py:83-138): dominant class-level paths for every tenant
    * in one pass — relations of all tenants unioned (each tagged with its
    * tenant id), endpoint classifications joined within tenant (entity ids
    * embed the tenant hash, so cross-tenant id collisions cannot occur),
    * and the per-tenant top-k ranked by the TopKAgg heap aggregate rather
    * than a per-tenant loop or a full window sort. Output: (tenant_id,
    * path, score, rk) with rk starting at 1. */
  def tenantClassPaths(gs: Seq[(String, GraphTables)],
                       k: Int = 10): DataFrame = {
    val ents = gs.map { case (tn, g) =>
      g.entities.select(lit(tn).as("tenant_id"), col("entity_id"),
        col("classification"))
    }.reduce(_ union _)
    val rels = gs.map { case (tn, g) =>
      g.entityRelations.select(lit(tn).as("tenant_id"), col("src_entity_id"),
        col("relation_value"), col("dst_entity_id"))
    }.reduce(_ union _)
    val src = ents.select(col("tenant_id"),
      col("entity_id").as("src_entity_id"), col("classification").as("src_class"))
    val dst = ents.select(col("tenant_id"),
      col("entity_id").as("dst_entity_id"), col("classification").as("dst_class"))
    val paths = rels
      .join(src, Seq("tenant_id", "src_entity_id"))
      .join(dst, Seq("tenant_id", "dst_entity_id"))
      .groupBy(col("tenant_id"), col("src_class"), col("relation_value"),
        col("dst_class"))
      .agg(count(lit(1)).as("score"))
      .select(col("tenant_id"),
        concat(lit("("), col("src_class"), lit(")-["), col("relation_value"),
          lit("]->("), col("dst_class"), lit(")")).as("path"),
        col("score"))
    graft.functions.TopKAgg.topKPerKeyRanked(paths, Seq("tenant_id"),
      Seq(negate(col("score")), col("path")), k, "rk")
  }

  /** Assemble the summary prompt from the two bounded top-k line sets and
    * run the LLM turn (graph_summary.py:93-100 + 160-173). */
  def summarize(g: GraphTables, llm: LLM, k: Int = 100,
                description: String = ""): String = {
    val entities = entityLines(g, k).select("entity")
      .collect().map(_.getString(0)).mkString("\n")
    val paths = classPaths(g, k).select("path")
      .collect().map(_.getString(0)).mkString("\n")
    llm.complete(
      s"""Summarize this knowledge graph.
         |Entities:
         |$entities
         |Paths:
         |$paths
         |Hint: $description""".stripMargin)
  }
}
