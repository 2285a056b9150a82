package graft.retrieve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.{LLM, LLMOps}

/**
 * Result post-processors (reference retrieval/post_processors/): steps that
 * run AFTER the formatting chain, over the final per-result frames.
 */
object PostProcessors {

  // ----- EnrichSourceDetails (enrich_source_details.py:90-195) -----

  /** `$key` / `${key}` template substitution over a metadata map column —
    * the source_info_template accessor. Unknown keys stay as-is
    * (safe_substitute). Parsed driver-side into one concat expression. */
  def sourceInfoTemplate(template: String, metadataCol: Column): Column = {
    val token = "\\$\\{([A-Za-z0-9_]+)\\}|\\$([A-Za-z0-9_]+)".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- token.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      val key = Option(m.group(1)).getOrElse(m.group(2))
      pieces += coalesce(element_at(metadataCol, key), lit(m.matched))
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  /** First-present-key accessor (source_info_keys). */
  def sourceInfoKeys(keys: Seq[String], metadataCol: Column): Column =
    coalesce(keys.map(k => element_at(metadataCol, k)): _*)

  /** Replace each result's source display string with the accessor's value,
    * falling back to the existing source id when the accessor yields
    * nothing. `accessor` builds the Column from the metadata map —
    * `sourceInfoTemplate(...)` / `sourceInfoKeys(...)` / any custom
    * expression, the Spark analogue of the reference's
    * str | list | Template | Callable accessor union. */
  def enrichSourceDetails(df: DataFrame, sources: DataFrame,
                          accessor: Column => Column): DataFrame = {
    val enriched = sources.select(col("source_id"),
      accessor(col("metadata")).as("_src_info"))
    val fallbacks =
      (if (df.columns.contains("source_str")) Seq(col("source_str")) else Nil) :+
        col("source_id").cast("string")
    df.join(enriched, Seq("source_id"), "left")
      .withColumn("source_str", coalesce(col("_src_info") +: fallbacks: _*))
      .drop("_src_info")
  }

  // ----- SentenceReranker / BGEReranker (sentence_reranker.py,
  // bge_reranker.py): model-scored top-n over result text. Both reference
  // classes are cross-encoder wrappers with the same contract as
  // [[graft.byokg.Reranker]]; this is the post-processor wiring — swap the
  // deterministic TokenOverlapReranker for a model-backed implementation in
  // production. -----

  def rerankResults(df: DataFrame, query: String,
                    reranker: graft.byokg.Reranker,
                    textCol: String = "statement",
                    topN: Int = graft.model.Defaults.MaxStatements,
                    orderCol: String = "statement_id"): DataFrame =
    reranker.rerankTopK(query, df, textCol, topN, orderCol)

  // ----- StatementEnhancement (statement_enhancement.py:22-160) -----

  def enhancePrompt(statement: String, chunkContext: String): String =
    s"""Improve this statement using its chunk context.
       |Statement: $statement
       |Context: $chunkContext
       |Reply inside <modified_statement></modified_statement>.""".stripMargin

  /** Enhance every statement with an LLM turn that sees the statement and
    * its chunk context, keeping the original text when the response has no
    * `<modified_statement>` tag. The reference fans out over a thread pool;
    * here [[LLMOps.completeAll]] runs one client per partition — the same
    * cost model, but scheduled by Spark and never driver-bound. */
  def statementEnhancement(df: DataFrame, llmFactory: () => LLM,
                           statementCol: String = "statement",
                           chunkCol: String = "chunk_value",
                           idCol: String = "statement_id"): DataFrame = {
    val prompts = df.withColumn("_prompt",
      concat(lit("Improve this statement using its chunk context.\nStatement: "),
        col(statementCol), lit("\nContext: "),
        coalesce(col(chunkCol), lit("")),
        lit("\nReply inside <modified_statement></modified_statement>.")))
    val responses = LLMOps.completeAll(prompts, idCol, "_prompt", llmFactory)
    val extracted = regexp_extract(col("response"),
      "(?s)<modified_statement>(.*?)</modified_statement>", 1)
    df.join(responses.select(col(idCol),
        when(length(trim(extracted)) > 0, trim(extracted)).as("_enh")),
      Seq(idCol), "left")
      .withColumn(statementCol, coalesce(col("_enh"), col(statementCol)))
      .drop("_enh")
  }
}
