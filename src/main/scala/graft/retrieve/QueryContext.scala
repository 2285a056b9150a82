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

  /** rerank_entities (reference retrieval/utils/entity_utils.py:15-105):
    * each entity's token is `"value (classification)"` lowercased; tokens
    * are tfidf-scored against query + keywords (the char-ngram matcher
    * library stands in as the repo's deterministic token-tfidf, same
    * contract), rounded at 4dp like the reference, and every entity is kept
    * — unmatched ones at 0.0 — ordered by (reranking_score desc,
    * degree score desc). */
  def rerankEntities(entities: DataFrame, query: String,
                     keywords: Seq[String]): DataFrame = {
    val terms = (query +: keywords)
      .flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .distinct.toSeq
    val toks = entities.withColumn("toks",
      split(concat(lower(col("value")), lit(" "),
        lower(col("classification"))), "[^a-z0-9]+"))
    // round(sum, 4) == round of the aggregated tfidf_score (reference 4dp)
    val termScores = TfIdf.scores(toks, "entity_id", "toks", terms)
      .select(col("entity_id"), round(col("tfidf_score"), 4).as("_rr"))
    entities.join(termScores, Seq("entity_id"), "left")
      .withColumn("reranking_score", coalesce(col("_rr"), lit(0.0)))
      .drop("_rr")
      .orderBy(desc("reranking_score"), desc("score"), col("entity_id"))
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

  /** NLP mode: named-entity keywords from the question text alone
    * (reference keyword_nlp_provider.py:30-37 — spaCy NER feeding a
    * lowercase-keyed dict). The model is an external dependency there; the
    * deterministic stand-in tags maximal runs of capitalized tokens, skips
    * interrogative/stopword-only spans, and dedups case-insensitively with
    * first-occurrence order + last-occurrence casing — the reference's
    * exact dict semantics. */
  def nlp(question: String): Seq[String] = {
    val stop = Set("what", "who", "whom", "where", "when", "why", "how",
      "which", "the", "a", "an", "is", "are", "was", "were", "do", "does",
      "did", "in", "of", "and", "or", "to", "list", "name", "tell", "give")
    val spans = scala.collection.mutable.ListBuffer.empty[List[String]]
    var cur = List.empty[String]
    for (t <- question.split("\\s+")) {
      val w = t.replaceAll("^[^\\p{L}\\p{N}]+|[^\\p{L}\\p{N}]+$", "")
      if (w.nonEmpty && w.head.isUpper) cur = cur :+ w
      else { if (cur.nonEmpty) spans += cur; cur = Nil }
    }
    if (cur.nonEmpty) spans += cur
    val ents = spans.toList.map(_.mkString(" "))
      .filter(sp => !sp.split(" ").forall(w => stop.contains(w.toLowerCase)))
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ents.foreach(e => m.put(e.toLowerCase, e))
    m.values.toList
  }

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
 * Vector-seeded entity providers (reference retrieval/query_context/
 * entity_vss_provider.py, entity_from_top_statement_provider.py): instead of
 * resolving LLM keywords against `search_str`, seed from vector search —
 * either all entities mentioned under the top-k topics (VSS provider), or
 * only the entities of the single statement that best TF-IDF-matches the
 * question among those topics (top-statement provider).
 */
object EntityVSSProvider {

  /** Entities mentioned by statements of the given topics, excluding the
    * local-entity class, scored by fact-participation degree, top `limit`
    * (entity_vss_provider.py:44-77's topic-variant cypher). `topicIds` is a
    * vss top-k — bounded, so its joins broadcast; the statement/fact hops
    * are left to AQE. */
  def entitiesForTopics(g: GraphTables, topicIds: DataFrame,
                        limit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val tids = broadcast(topicIds.select("topic_id").distinct())
    val stmts = g.statements.join(tids, Seq("topic_id"))
      .select("statement_id").distinct()
    val factIds = g.factSupports
      .join(stmts, Seq("statement_id"), "left_semi")
      .select("fact_id").distinct()
    val mentioned = g.facts.join(factIds, Seq("fact_id"), "left_semi")
      .select(col("subject_entity_id").as("entity_id"))
      .union(g.facts.join(factIds, Seq("fact_id"), "left_semi")
        .select(col("object_entity_id").as("entity_id")))
      .filter(col("entity_id").isNotNull)
      .distinct()
    EntityProvider.scoredEntities(g)
      .join(mentioned, Seq("entity_id"), "left_semi")
      .filter(col("classification") =!= lit(EntityProvider.LocalEntityClass))
      .select("entity_id", "value", "classification", "score")
      .orderBy(desc("score"), col("entity_id"))
      .limit(limit)
  }

  /** EntityVSSProvider: top-k topics by query-embedding cosine, then their
    * mentioned entities (entity_vss_provider.py:32-42 + :44-77). */
  def fromVss(g: GraphTables, queryEmbedding: Seq[Double], topK: Int = 3,
              limit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val topTopics = graft.ops.Similarity
      .topK(g.topicEmbeddings, "embedding", "topic_id", queryEmbedding, topK)
      .select(col("id").as("topic_id"))
    entitiesForTopics(g, topTopics, limit)
  }

  /** EntityFromTopStatementProvider: top-k topics by embedding, TF-IDF-score
    * their statements against the question, keep the single best statement,
    * return that statement's entities degree-scored
    * (entity_from_top_statement_provider.py:28-120). */
  def fromTopStatement(g: GraphTables, queryEmbedding: Seq[Double],
                       question: String, topK: Int = 3,
                       limit: Int = graft.model.Defaults.IntermediateLimit): DataFrame = {
    val topTopics = broadcast(graft.ops.Similarity
      .topK(g.topicEmbeddings, "embedding", "topic_id", queryEmbedding, topK)
      .select(col("id").as("topic_id")))
    val stmts = g.statements.join(topTopics, Seq("topic_id"))
      .select(col("statement_id"), col("value"))
      .dropDuplicates("statement_id")
    // TF-IDF of question terms over the candidate statements (the
    // reference's score_values_with_tfidf, rerank top-1): tf from each
    // statement's tokens, df over the candidate set, n folded in as a
    // scalar aggregate — no driver-side count during plan build.
    val qTerms = question.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .distinct.toSeq
    val toks = stmts.withColumn("toks",
      split(graft.functions.TextFunctions.searchStr(col("value")), "\\s+"))
    // left join + coalesce keeps zero-scored candidates in the top-1 rank
    // (an inner score frame would yield an empty pick when NO term matches)
    val best = stmts.select("statement_id")
      .join(TfIdf.scores(toks, "statement_id", "toks", qTerms),
        Seq("statement_id"), "left")
      .withColumn("score", coalesce(col("tfidf_score"), lit(0.0)))
      .orderBy(desc("score"), col("statement_id"))
      .limit(1)
      .select("statement_id")
    val factIds = g.factSupports
      .join(broadcast(best), Seq("statement_id"), "left_semi")
      .select("fact_id").distinct()
    val mentioned = g.facts.join(factIds, Seq("fact_id"), "left_semi")
      .select(col("subject_entity_id").as("entity_id"))
      .union(g.facts.join(factIds, Seq("fact_id"), "left_semi")
        .select(col("object_entity_id").as("entity_id")))
      .filter(col("entity_id").isNotNull)
      .distinct()
    EntityProvider.scoredEntities(g)
      .join(mentioned, Seq("entity_id"), "left_semi")
      .filter(col("classification") =!= lit(EntityProvider.LocalEntityClass))
      .select("entity_id", "value", "classification", "score")
      .orderBy(desc("score"), col("entity_id"))
      .limit(limit)
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
      // an empty keyword turn (blank LLM response) falls back to the
      // single-query path instead of dividing by zero
      if (keywords.isEmpty) retrieverFn(question, maxResults)
      else {
        val perShard = maxResults / keywords.size + 1
        keywords.map(k => retrieverFn(k, perShard)).reduce(_ unionByName _)
      }
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
