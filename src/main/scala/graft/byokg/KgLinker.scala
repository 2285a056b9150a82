package graft.byokg

import java.text.Normalizer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.LLM

/**
 * The byokg multi-task linker protocol (reference:
 * byokg-rag/src/graphrag_toolkit/byokg_rag/graph_connectors/kg_linker.py:15-140
 * and utils.py parse_response): one LLM turn emits per-task artifacts inside
 * `<entities>/<paths>/<opencypher>/<answers>` tags; the engine parses them and
 * drives a retriever per artifact kind. Prompt construction and parsing are
 * pure string functions — the LLM call is the only seam.
 */
object KGLinker {

  /** task name -> artifact tag (reference AVAILABLE_TASKS). */
  val Tasks: Seq[(String, String)] = Seq(
    "entity-extraction" -> "entities",
    "path-extraction" -> "paths",
    "opencypher" -> "opencypher",
    "draft-answer-generation" -> "answers")

  /** Extract the lines inside `<tag>...</tag>` (reference utils.parse_response:
    * first match, DOTALL, split on newlines, drop empties). */
  def parseTag(response: String, tag: String): Seq[String] = {
    val p = ("(?s)<" + java.util.regex.Pattern.quote(tag) + ">(.*?)</" +
      java.util.regex.Pattern.quote(tag) + ">").r
    p.findFirstMatchIn(response) match {
      case Some(m) => m.group(1).strip().split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      case None => Seq.empty
    }
  }

  /** All task artifacts from one response (reference parse_response loop). */
  def parseResponse(response: String): Map[String, Seq[String]] =
    Tasks.map { case (task, tag) => task -> parseTag(response, tag) }.toMap

  /** The `<task-completion>` control artifact ("FINISH" ends the loop). */
  def taskCompletion(response: String): Seq[String] =
    parseTag(response, "task-completion")

  /** The linker prompt: question + schema + accumulated graph context +
    * per-task instructions (reference kg_linker_prompt.yaml structure; the
    * iterative variant swaps the entity-extraction task prompt). */
  def buildPrompt(question: String, schema: String, graphContext: String,
                  iterative: Boolean = false): String = {
    val ctx = if (graphContext.nonEmpty) graphContext
              else "No graph context provided. See the above schema."
    val tasks = Tasks.map { case (task, tag) =>
      val variant = if (iterative && task == "entity-extraction")
        s"$task (iterative: prefer unexplored entities)" else task
      s"Task $variant: emit one artifact per line inside <$tag></$tag>."
    }.mkString("\n")
    s"""Question: $question
       |Schema:
       |$schema
       |Graph context:
       |$ctx
       |$tasks
       |Emit <task-completion>FINISH</task-completion> when the context answers the question.""".stripMargin
  }
}

/** One linker turn: prompt -> LLM -> parsed artifacts. */
final class KGLinker(llm: LLM) {
  def generateResponse(question: String, schema: String,
                       graphContext: String = "",
                       iterative: Boolean = false): String =
    llm.complete(KGLinker.buildPrompt(question, schema, graphContext, iterative))
}

/**
 * Read-only graph-query gate + executor (reference
 * graph_retrievers.py:351-430 GraphQueryRetriever). The reference checks an
 * openCypher string for modification keywords before handing it to the graph
 * store; here the "graph store" is Spark itself, so the same check guards a
 * Spark SQL query over the registered graph views, and execution verbalizes
 * the result rows into context lines.
 */
object GraphQuerySafety {

  /** Keywords that indicate graph/table modification. Union of the
    * reference's openCypher list (graph_retrievers.py:388-392) and their SQL
    * equivalents, since our executor speaks Spark SQL. */
  val ModificationKeywords: Seq[String] = Seq(
    "CREATE", "MERGE", "SET", "REMOVE", "DELETE", "DETACH DELETE", "DROP",
    "DETACH", "CALL",
    "INSERT", "UPDATE", "ALTER", "TRUNCATE", "GRANT", "REVOKE",
    // Spark SQL statements that mutate table data/metadata without any of
    // the verbs above
    "LOAD", "ANALYZE", "MSCK", "REFRESH")

  /** True when the query contains no modification keyword. Mirrors the
    * reference exactly: strip block + line comments, NFKC-normalize (collapses
    * fullwidth lookalikes), uppercase, word-boundary match
    * (graph_retrievers.py:376-414). */
  def isQuerySafe(query: String, blockModification: Boolean = true): Boolean = {
    if (!blockModification) return true
    var q = query.replaceAll("(?s)/\\*.*?\\*/", "")
    q = q.replaceAll("//[^\n]*", "")
    q = q.replaceAll("--[^\n]*", "") // SQL line comments too
    q = Normalizer.normalize(q, Normalizer.Form.NFKC).toUpperCase
    !ModificationKeywords.exists(k =>
      ("(?m)\\b" + java.util.regex.Pattern.quote(k) + "\\b").r
        .findFirstIn(q).isDefined)
  }
}

/** Executes a safety-checked SQL query and verbalizes result rows into
  * context lines ("col: value, col: value"). Unsafe queries and execution
  * errors become "Error executing query..." feedback lines — the engine
  * loop's retry signal (reference byokg_query_engine.py:131-149). */
final class GraphQueryRetriever(spark: SparkSession,
                                blockModification: Boolean = true,
                                maxRows: Int = 100) {

  def retrieve(sql: String): Seq[String] = {
    if (!GraphQuerySafety.isQuerySafe(sql, blockModification))
      return Seq("Error executing query: modification keywords are blocked " +
        "(read-only executor)")
    try {
      val df = spark.sql(sql).limit(maxRows)
      val cols = df.columns
      df.collect().map { row =>
        cols.zipWithIndex.map { case (c, i) =>
          s"$c: ${Option(row.get(i)).map(_.toString).getOrElse("null")}"
        }.mkString(", ")
      }.toSeq
    } catch {
      case e: Exception =>
        // null/empty messages must still produce the retry-signal line the
        // engine loop keys on, not a secondary NPE out of the handler
        val msg = Option(e.getMessage).flatMap(_.linesIterator.find(_ => true))
          .getOrElse(e.getClass.getSimpleName)
        Seq(s"Error executing query: $msg")
    }
  }
}

/**
 * Reranker seam (reference graph_reranker.py:13-133). The reference's
 * LocalGReranker is a BGE cross-encoder; its contract is filter_topk: score
 * (query, text) pairs, stable-argsort descending, keep k. The trait keeps
 * that contract; [[TokenOverlapReranker]] is the deterministic stand-in
 * (token Jaccard) so the full KGQA loop runs hermetically — production wires
 * a model-backed implementation through the same method.
 */
trait Reranker extends Serializable {
  /** Keep the top-k rows of `input` by relevance to `query`, adding
    * `rerank_score`; ties and order are stable w.r.t. `orderCol`. */
  def rerankTopK(query: String, input: DataFrame, textCol: String,
                 topk: Int, orderCol: String): DataFrame
}

/** Deterministic reranker: token-set Jaccard between query and text.
  * One narrow pass + a bounded TakeOrderedAndProject — no shuffle beyond
  * the top-k merge. */
final class TokenOverlapReranker extends Reranker {
  override def rerankTopK(query: String, input: DataFrame, textCol: String,
                          topk: Int, orderCol: String): DataFrame = {
    // array_remove("") — split yields empty tokens at leading/trailing
    // separators, and a shared "" would give unrelated punctuated texts a
    // phantom intersection
    val qToks = array_distinct(array_remove(
      split(lower(lit(query)), "[^a-z0-9]+"), ""))
    val tToks = array_distinct(array_remove(
      split(lower(col(textCol)), "[^a-z0-9]+"), ""))
    input.withColumn("rerank_score",
      when(size(array_union(qToks, tToks)) === 0, lit(0.0))
        .otherwise(size(array_intersect(qToks, tToks)).cast("double") /
          size(array_union(qToks, tToks)).cast("double")))
      .orderBy(desc("rerank_score"), col(orderCol))
      .limit(topk)
  }
}

/**
 * Embedding-interaction reranker — the BGE-shaped scorer the token-overlap
 * stand-in can't be: it ranks by QUERY-DOCUMENT EMBEDDING INTERACTION, not
 * lexical overlap, so paraphrases that share no token still score (the
 * cross-encoder contract of the reference's bge_reranker.py:1-217 and
 * byokg graph_reranker.py:32-133, with the model forward pass replaced by
 * a deterministic bilinear form over the SAME stored embeddings the
 * vector indexes already carry).
 *
 * Score: cosine(W·q, t) with W = I + λ·R (R = circular index shift) — a
 * true bilinear interaction qᵀWᵀt (cross-dimension terms, not plain
 * cosine), which collapses to ONE precomputed query-side vector
 * w_j = q_j + λ·q_{(j+1) mod d}: the per-row work is a single codegen'd
 * cosine against a driver-built literal, so reranking any candidate set
 * is one narrow pass + a bounded TakeOrderedAndProject, embarrassingly
 * parallel at any scale. Candidate embeddings come from `embCol` when the
 * frame already carries them (the stored-statement-embedding path —
 * at scale ALWAYS prefer this: the store computed them at ingest) or are
 * hash-projected from the text on the fly (the hermetic test path, exact
 * twin of the graph builder's embedding stand-in).
 */
final class EmbeddingInteractionReranker(
    dim: Int = 64, shiftWeight: Double = 0.5,
    embCol: Option[String] = None) extends Reranker {
  override def rerankTopK(query: String, input: DataFrame, textCol: String,
                          topk: Int, orderCol: String): DataFrame = {
    graft.functions.CosineSimilarity.register(input.sparkSession)
    val qe = new graft.llm.HashEmbedder(dim).embed(query)
    // qᵀWᵀt with W = I + λR folds into the query side: w_j = q_j + λ·q_{j+1}
    val w = Array.tabulate(dim)(j => qe(j) + shiftWeight * qe((j + 1) % dim))
    val t = embCol.map(col).getOrElse(
      graft.functions.VectorFunctions.hashEmbedding(col(textCol), dim))
    input.withColumn("rerank_score",
        graft.functions.CosineSimilarity.cosineToQuery(t, w.toSeq))
      .orderBy(desc("rerank_score"), col(orderCol))
      .limit(topk)
  }
}
