package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.llm.{LLM, LLMOps}

/**
 * The production extraction pipeline: chunk → proposition-extraction LLM
 * turn → topic-extraction LLM turn → [[TopicParser]] → graph tables
 * (reference: extraction_pipeline.py:150-230 composing
 * llm_proposition_extractor.py and topic_extractor.py:157-217, prompts
 * indexing/prompts.py:4-174; build fan-out lexical_graph_index.py:572-612).
 *
 * Both LLM turns run as `mapPartitions` batches (one client per partition,
 * [[LLMOps.completeAll]]) — the reference's worker pools become partition
 * parallelism. With [[graft.llm.StubLLM]]-style deterministic extractors the
 * whole DAG stays hash-testable; with a real model the same plan ships the
 * reference's prompts.
 */
object ExtractionPipeline {

  /** Proposition-extraction prompt (EXTRACT_PROPOSITIONS_PROMPT shape:
    * instructions + source info + text; response = title then one
    * proposition per line). Condensed: the instruction block is fixed, so
    * only the variable sections are assembled per chunk. */
  def propositionsPrompt(sourceInfo: String, text: String): String =
    s"""Decompose the text into clear, concise, context-independent
       |propositions, one per line, prefaced by a concise title.
       |<sourceInformation>
       |$sourceInfo
       |</sourceInformation>
       |<text>
       |$text
       |</text>""".stripMargin

  /** Topic-extraction prompt (EXTRACT_TOPICS_PROMPT shape: organize
    * propositions into topics, extract entities `value|classification` and
    * relationships `entity|RELATIONSHIP|entity` under `proposition:` lines;
    * response format is exactly what [[TopicParser]] parses).
    * `preferredTopics` seeds topic reuse across chunks — the reference's
    * PreferredValuesProvider (indexing/extract/preferred_values.py) feeding
    * the prompt's Preferred Topics list. */
  def topicsPrompt(classifications: Seq[String], propositions: String,
                   preferredTopics: Seq[String] = Nil): String =
    s"""Organize the propositions into topics. For each topic emit:
       |topic: <topic>
       |entities:
       |entity|classification
       |proposition: <exact proposition text>
       |entity|RELATIONSHIP|entity
       |Preferred classifications: ${classifications.mkString(", ")}
       |Preferred topics: ${preferredTopics.mkString(", ")}
       |<propositions>
       |$propositions
       |</propositions>""".stripMargin

  /** Run the two-turn extraction over chunk rows and build the graph.
    * `chunks` needs `metadataCols`, a `seqCol`, and `textCol`; the LLM
    * factories are executor-side seams ([[graft.llm.LLM]]). */
  def extract(
      chunks: DataFrame,
      textCol: String,
      metadataCols: Seq[String],
      propositionLlm: () => LLM,
      topicLlm: () => LLM,
      classifications: Seq[String] = Seq("Token"),
      seqCol: String = "seq",
      tenant: String = "t0",
      buildTs: Long = 0L): GraphTables = {
    val keyCols = metadataCols :+ seqCol
    val withKey = chunks.withColumn("_ck",
      concat_ws("", keyCols.map(c => col(c).cast("string")): _*))
    val prompts1 = withKey.withColumn("_prompt",
      format_string(propositionsPrompt("%s", "%s"),
        concat_ws(", ", metadataCols.map(col): _*), col(textCol)))
    val props = LLMOps.completeAll(prompts1, "_ck", "_prompt", propositionLlm)
      .withColumnRenamed("response", "_props")
    // classification strings are embedded in the TEMPLATE (not passed as
    // format args), so a '%' in an LLM-inferred classification would throw
    // UnknownFormatConversionException in every task — escape them
    val safeCls = classifications.map(_.replace("%", "%%"))
    val prompts2 = props.withColumn("_prompt",
      format_string(topicsPrompt(safeCls, "%s"), col("_props")))
    val raw = LLMOps.completeAll(prompts2, "_ck", "_prompt", topicLlm)
      .withColumnRenamed("response", "_raw")
    LexicalGraphBuilder.fromExtractions(
      withKey.join(raw, Seq("_ck")).drop("_ck"),
      textCol, "_raw", metadataCols, seqCol, tenant, buildTs)
  }
}
