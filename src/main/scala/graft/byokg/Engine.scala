package graft.byokg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CosineSimilarity
import graft.llm.{LLM, QueryOps}

/**
 * Entity linking into a user-supplied KG (SURVEY.md §2.13; reference:
 * byokg-rag/src/graphrag_toolkit/byokg_rag/indexing/fuzzy_string.py:10-97 and
 * dense_index.py). Both linkers return (mention, node, score, rk) top-k rows.
 */
object EntityLinker {

  /** Fuzzy linking: normalized-levenshtein ratio with the reference's
    * length-difference gate, top-k per mention via a window. */
  def fuzzyLink(nodes: DataFrame, nodeCol: String, mentions: Seq[String],
                k: Int = 3, maxLenDiff: Int = 10): DataFrame = {
    val s = nodes.sparkSession
    val ms = s.createDataFrame(mentions.map(Tuple1(_))).toDF("mention")
    val scored = broadcast(ms).crossJoin(nodes.select(col(nodeCol).as("node")))
      .filter(abs(length(col("mention")) - length(col("node"))) <= maxLenDiff)
      .withColumn("score",
        lit(1.0) - levenshtein(lower(col("mention")), lower(col("node")))
          .cast("double") /
          greatest(length(col("mention")), length(col("node"))).cast("double"))
    val w = Window.partitionBy(col("mention"))
      .orderBy(desc("score"), col("node"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Dense linking: cosine top-k of the query embedding against node
    * embeddings (the LocalFaissDenseIndex analogue — brute force here, the
    * IVF/LSH paths in graft.ops.Similarity are the scale variants). */
  def denseLink(nodeEmb: DataFrame, nodeCol: String, embCol: String,
                queryEmb: Seq[Double], k: Int = 3): DataFrame = {
    CosineSimilarity.register(nodeEmb.sparkSession)
    nodeEmb.select(col(nodeCol).as("node"),
      CosineSimilarity.cosine(col(embCol), typedLit(queryEmb)).as("score"))
      .orderBy(desc("score"), col("node"))
      .limit(k)
  }
}

/**
 * Agentic triplet retrieval: iterate (select relations relevant to the
 * question → expand frontier along them → keep the strongest next entities)
 * — the reference's AgenticRetriever loop
 * (byokg-rag/.../graph_retrievers/graph_retrievers.py:23-182), with the LLM
 * relation-selection turn behind the [[LLM]] trait (StubLLM keeps it
 * deterministic: relations are chosen by token overlap with the question).
 *
 * The loop is driver-side, but each iteration issues ONE bounded Spark job
 * over the frontier; only the (tiny) distinct relation list is collected to
 * build the selection prompt — exactly the data the reference puts in its
 * prompt.
 */
object AgenticRetriever {

  def retrieve(edges: DataFrame, seeds: DataFrame, question: String, llm: LLM,
               iterations: Int = 2, topEntities: Int = 8): DataFrame = {
    val qTokens = QueryOps.keywords(llm, question, maxKeywords = 8).toSet
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(true)
    var acc: DataFrame = null
    for (_ <- 1 to iterations) {
      val hop = Traversal.oneHop(edges, frontier)
      // Relation-selection turn: candidate labels -> prompt -> chosen subset.
      val labels = hop.select(col("label")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val chosen = labels.filter(l =>
        l.toLowerCase.split("[^a-z0-9]+").exists(qTokens.contains)) match {
        case Nil => labels // nothing matches: keep all (reference fallback)
        case cs => cs
      }
      val filtered = hop.filter(col("label").isin(chosen: _*))
        .localCheckpoint(true)
      acc = if (acc == null) filtered else acc.union(filtered)
      // Next entities: strongest by in-frontier degree, capped. `filtered`
      // is already checkpointed, so this projection stays flat lazily.
      frontier = filtered.groupBy(col("dst")).agg(count(lit(1)).as("deg"))
        .orderBy(desc("deg"), col("dst"))
        .limit(topEntities)
        .select(col("dst").as("node"))
    }
    acc.distinct()
  }
}

/**
 * KGQA driver (reference byokg_query_engine.py:119-260): link the question's
 * mentions into the graph, run agentic triplet retrieval + bounded k-hop
 * path retrieval, verbalize, and assemble an order-preserving-deduped
 * context. LLM turns (linking prompts, answer generation) stay on the
 * driver; every expansion is a Spark job.
 */
final class ByoKGQueryEngine(edges: DataFrame, llm: LLM,
                             iterations: Int = 2) {

  /** Returns (context_line, first_seen) in stable first-seen order. */
  def retrieveContext(question: String, mentions: Seq[String]): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
    val linked = EntityLinker.fuzzyLink(nodes, "node", mentions, k = 1)
      .select(col("node"))
    val agentic = AgenticRetriever.retrieve(edges, linked, question, llm,
      iterations)
    val khop = Traversal.kHopTriplets(edges, linked, iterations)
    val context = Traversal.verbalizeTriplets(agentic.union(khop).distinct())
    // order-preserving dedup (byokg_query_engine.py:101-116): stable rank by
    // text, first occurrence wins. The global window is safe here: this is
    // the final LLM context, bounded by the retrieval caps to O(100) lines.
    context.groupBy(col("text"))
      .agg(min(lit(1)).as("one")).drop("one")
      .withColumn("first_seen",
        row_number().over(Window.orderBy(col("text"))))
  }
}
