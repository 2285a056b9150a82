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
