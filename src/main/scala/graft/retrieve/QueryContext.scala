package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.index.GraphTables
import graft.llm.{LLM, QueryOps}

/**
 * Keyword → entity lookup (reference retrieval/query_context/
 * entity_provider.py:30-110): for each keyword, find entities whose
 * `search_str` matches exactly (with an optional `keyword|Classification`
 * class filter, else excluding the local-entity class), scored by how many
 * facts mention them; keywords with no exact match fall back to a
 * STARTS WITH prefix match. This seeds every entity-based retrieval.
 *
 * The reference issues one graph query per keyword; here the whole keyword
 * batch resolves in two joins — exact (equi-join on search_str) and prefix
 * (a broadcast of the handful of unmatched keywords against the entity
 * scan). The keyword list is LLM-extracted and bounded (≤ ~10), so the
 * broadcast is genuinely small.
 */
object EntityProvider {

  val LocalEntityClass = "__Local_Entity__"

  /** Entities with their fact-participation degree — the reference's
    * `count((entity)-[:SUBJECT|OBJECT]->())` score
    * (entity_provider.py:36-44). One union + hash aggregation. */
  def scoredEntities(g: GraphTables): DataFrame = {
    val mentions = g.facts.select(col("subject_entity_id").as("entity_id"))
      .union(g.facts.select(col("object_entity_id").as("entity_id")))
    val degree = mentions.groupBy("entity_id").agg(count(lit(1)).as("score"))
    g.entities.join(degree, Seq("entity_id"), "inner") // score=0 rows excluded
  }

  /** Resolve a keyword batch. Keywords use the reference's
    * `word` / `word|Classification` syntax. Returns
    * (keyword, entity_id, value, classification, score, matched) where
    * matched is 'exact' or 'prefix'. */
  def entitiesForKeywords(g: GraphTables, keywords: Seq[String]): DataFrame = {
    val s = g.entities.sparkSession
    val kws = s.createDataFrame(keywords.map(Tuple1(_))).toDF("keyword")
      .withColumn("kw_part", split(col("keyword"), "\\|").getItem(0))
      .withColumn("kw_class", when(size(split(col("keyword"), "\\|")) > 1,
        split(col("keyword"), "\\|").getItem(1)))
      .withColumn("kw_norm", T.searchStr(col("kw_part")))
      .select("keyword", "kw_norm", "kw_class")
    val scored = scoredEntities(g)
      .select(col("entity_id"), col("value"), col("search_str"),
        col("classification"), col("score"))

    def classOk(exact: Boolean) =
      when(col("kw_class").isNotNull,
        if (exact) col("classification") === col("kw_class")
        else col("classification").startsWith(col("kw_class")))
        .otherwise(col("classification") =!= lit(LocalEntityClass))

    val exact = broadcast(kws).join(scored,
        col("kw_norm") === col("search_str") && classOk(exact = true))
      .withColumn("matched", lit("exact"))
    // keywords with no exact hit retry as prefix (entity_provider.py:52-83)
    val unmatched = kws.join(exact.select("keyword"), Seq("keyword"), "left_anti")
    val prefix = broadcast(unmatched).join(scored,
        col("search_str").startsWith(col("kw_norm")) && classOk(exact = false))
      .withColumn("matched", lit("prefix"))
    exact.unionByName(prefix)
      .select(col("keyword"), col("entity_id"), col("value"),
        col("classification"), col("score"), col("matched"))
  }
}

/**
 * Keyword providers (reference retrieval/query_context/keyword_provider.py,
 * keyword_vss_provider.py, keyword_provider_base.py): the three modes that
 * seed entity lookup. SIMPLE asks the LLM for the question's keywords; VSS
 * first pulls diverse vector-search context and asks the LLM to pick the
 * most relevant entities from question + context
 * (IDENTIFY_RELEVANT_ENTITIES_PROMPT); PASSTHRU returns the query itself
 * (the multipart shards arrive pre-extracted).
 */
object KeywordProviders {

  def simple(llm: LLM, question: String, maxKeywords: Int = 5): Seq[String] =
    QueryOps.keywords(llm, question, maxKeywords)

  def passthru(question: String): Seq[String] = Seq(question)

  def vss(g: GraphTables, llm: LLM, question: String,
          queryEmbedding: Seq[Double], maxKeywords: Int = 5,
          topK: Int = graft.model.Defaults.VssTopK): Seq[String] = {
    val ctxIds = graft.ops.Similarity.diverseTopK(
      g.chunks, "embedding", "chunk_id", "source_id",
      queryEmbedding, topK, graft.model.Defaults.VssDiversityFactor)
      .select(col("id").as("chunk_id"))
    val context = g.chunks.join(broadcast(ctxIds), Seq("chunk_id"))
      .orderBy(col("chunk_id")).select("text")
      .collect().map(_.getString(0)).mkString("\n")
    val prompt =
      s"""Identify up to $maxKeywords of the most relevant named entities from
         |the question and keywords from the context, most relevant first,
         |one per line.
         |<question>
         |$question
         |</question>
         |<context>
         |$context
         |</context>""".stripMargin
    llm.complete(prompt).split("\n").map(_.trim).filter(_.nonEmpty)
      .take(maxKeywords).toSeq
  }
}

/**
 * Multipart query mode (reference retrieval/retrievers/
 * query_mode_retriever.py:28-68): a complex question shards into its
 * keywords, each shard runs the underlying retriever with a shrunken
 * per-shard result budget (`max/shards + 1`), and the shard results union.
 * Simple questions pass through unchanged.
 *
 * `retrieverFn(queryText, maxResults)` is the sub-retriever seam — the
 * reference builds a new TraversalBasedRetriever per shard the same way.
 * Shards stay lazy DataFrames, so the union is ONE Spark plan; the
 * reference's thread pool fan-out is subsumed by Spark scheduling the
 * branches concurrently.
 */
object QueryModeRetriever {

  /** A question is multipart when it decomposes into >1 subquery (the
    * reference asks an LLM QueryModeProvider; the deterministic stand-in is
    * conjunction splitting — same seam as QueryOps.decompose). */
  def isMultipart(llm: LLM, question: String): Boolean =
    QueryOps.decompose(llm, question).size > 1

  def retrieve(llm: LLM, question: String,
               retrieverFn: (String, Int) => DataFrame,
               maxResults: Int = graft.model.Defaults.MaxSearchResults,
               enableMultipartQueries: Boolean = true,
               maxKeywords: Int = 5): DataFrame = {
    if (!enableMultipartQueries || !isMultipart(llm, question))
      retrieverFn(question, maxResults)
    else {
      val keywords = QueryOps.keywords(llm, question, maxKeywords)
      val perShard = maxResults / keywords.size + 1
      keywords.map(k => retrieverFn(k, perShard)).reduce(_ unionByName _)
    }
  }

  /** The composite retriever's derive_subqueries path (reference
    * composite_traversal_based_retriever.py:205-229): decompose the question
    * into subqueries, run the retriever per subquery at full budget, and
    * aggregate — the thread-pool fan-out becomes one unioned lazy plan. */
  def retrieveComposite(llm: LLM, question: String,
                        retrieverFn: (String, Int) => DataFrame,
                        maxResults: Int = graft.model.Defaults.MaxSearchResults,
                        deriveSubqueries: Boolean = true): DataFrame = {
    val subqueries =
      if (deriveSubqueries) QueryOps.decompose(llm, question)
      else Seq(question)
    subqueries.map(q => retrieverFn(q, maxResults)).reduce(_ unionByName _)
  }
}
