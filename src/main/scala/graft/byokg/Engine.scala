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
    * length-difference gate, top-k per mention as a k-bounded heap aggregate
    * (TopKAgg) — the node side is the whole entity vocabulary, so the
    * (mention, node) score set heaps down to k rows per mention in
    * O(n log k) without the two full sorts of the window-rank plan. */
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
    graft.functions.TopKAgg.topKPerKeyRanked(scored, Seq("mention"),
      Seq(negate(col("score")), col("node")), k, "rk")
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
               iterations: Int = 2, topEntities: Int = 8): DataFrame =
   graft.ops.Joins.boundedLoop(edges.sparkSession) {
    val qTokens = QueryOps.keywords(llm, question, maxKeywords = 8).toSet
    // lazy checkpoints: each frame's first action (the labels collect of
    // the following hop, or the final distinct) materializes the persist as
    // part of that job — same rows and caching as the eager form, one job
    // per turn instead of two
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(false)
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
        .localCheckpoint(false)
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

  /** Returns (text, first_seen) in true first-seen order: the agentic
    * retriever's context arrives before the k-hop context (the order
    * _add_to_context appends in, byokg_query_engine.py:101-116 + 173-178),
    * and a line seen by both keeps its earliest position. Each source frame
    * carries an arrival-order column; dedup takes min(order) per text and
    * ranks by it — the q_orderpreserve_dedup pattern, NOT an alphabetical
    * window. The global windows are safe: this is the final LLM context,
    * bounded by the retrieval caps to O(100) lines. */
  def retrieveContext(question: String, mentions: Seq[String]): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
    val linked = EntityLinker.fuzzyLink(nodes, "node", mentions, k = 1)
      .select(col("node"))
    val agentic = AgenticRetriever.retrieve(edges, linked, question, llm,
      iterations)
    val khop = Traversal.kHopTriplets(edges, linked, iterations)
    // arrival order: retriever priority, then a stable within-retriever rank
    // (the reference's store-iteration order isn't reproducible on a
    // distributed frame, so each retriever's lines rank deterministically)
    def ordered(df: DataFrame, priority: Int): DataFrame =
      Traversal.verbalizeTriplets(df).withColumn("ord",
        lit(priority.toLong * 1000000L) +
          row_number().over(Window.orderBy(col("text"))))
    val context = ordered(agentic, 0).union(ordered(khop.distinct(), 1))
    context.groupBy(col("text"))
      .agg(min(col("ord")).as("min_ord"))
      .withColumn("first_seen",
        row_number().over(Window.orderBy(col("min_ord"))))
      .drop("min_ord")
  }
}

/**
 * The full byokg iterate loop (reference byokg_query_engine.py:151-188):
 * each iteration runs one KGLinker turn, links the emitted entity/answer
 * artifacts into the graph, retrieves triplet context (agentic), path context
 * (metapaths from the artifact's `a -> b -> c` lines), and graph-query
 * context (safety-gated SQL), appending to an order-preserving context list.
 * `FINISH` in `<task-completion>` ends the loop early.
 *
 * The context list lives on the driver — it IS the next prompt, and every
 * retriever bounds its output (top-k links, capped expansions), mirroring the
 * reference's List[str] accumulation.
 */
final class ByoKGIterativeEngine(edges: DataFrame, llm: graft.llm.LLM,
                                 queryRetriever: Option[GraphQueryRetriever] = None,
                                 reranker: Option[Reranker] = None,
                                 maxContextLines: Int = 200,
                                 cypherRetriever: Option[CypherGraphRetriever] = None) {

  private val linker = new KGLinker(llm)

  /** Graph schema string for the linker prompt: the sorted relation labels
    * (reference graph_store.get_schema()). One tiny distinct aggregation. */
  def schema(): String =
    edges.select(col("label")).distinct().orderBy(col("label"))
      .collect().map(_.getString(0)).mkString("Relations: ", ", ", "")

  private def addToContext(ctx: scala.collection.mutable.LinkedHashSet[String],
                           items: Seq[String]): Unit =
    items.foreach(ctx.add) // LinkedHashSet = insertion-ordered seen-set

  def query(question: String, iterations: Int = 2): Seq[String] = {
    val ctx = scala.collection.mutable.LinkedHashSet.empty[String]
    val explored = scala.collection.mutable.LinkedHashSet.empty[String]
    val sch = schema()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct().localCheckpoint(true)
    var done = false
    for (it <- 0 until iterations if !done) {
      val response = linker.generateResponse(question, sch,
        ctx.mkString("\n"), iterative = it > 0)
      val artifacts = KGLinker.parseResponse(response)

      val mentions = artifacts("entity-extraction")
        .filterNot(_.contains("FINISH"))
      val linked =
        if (mentions.nonEmpty)
          EntityLinker.fuzzyLink(nodes, "node", mentions, k = 1)
            .select(col("node")).collect().map(_.getString(0)).toSeq
        else Seq.empty
      explored ++= linked
      val answerMentions = artifacts("draft-answer-generation")
      val linkedAnswers =
        if (answerMentions.nonEmpty)
          EntityLinker.fuzzyLink(nodes, "node", answerMentions, k = 1)
            .select(col("node")).collect().map(_.getString(0)).toSeq
        else Seq.empty

      val sources = (linked ++ linkedAnswers).distinct
      if (sources.nonEmpty) {
        val s = edges.sparkSession
        val seedDf = s.createDataFrame(sources.map(Tuple1(_))).toDF("node")
        val triplets = AgenticRetriever.retrieve(edges, seedDf, question, llm)
        val lines = Traversal.verbalizeTriplets(triplets)
          .orderBy(col("text")).limit(maxContextLines)
          .collect().map(_.getString(0)).toSeq
        val kept = reranker.fold(lines) { r =>
          val df = s.createDataFrame(lines.zipWithIndex.map(_.swap))
            .toDF("ord", "text")
          r.rerankTopK(question, df, "text", maxContextLines, "ord")
            .select(col("text")).collect().map(_.getString(0)).toSeq
        }
        addToContext(ctx, kept)
      }

      val metapaths = artifacts("path-extraction")
        .map(_.split("->").map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
      if (metapaths.nonEmpty && explored.nonEmpty) {
        val s = edges.sparkSession
        val seedDf = s.createDataFrame(explored.toSeq.map(Tuple1(_))).toDF("node")
        metapaths.foreach { mp =>
          val paths = Traversal.metapathPaths(edges, seedDf, mp)
          val lines = Traversal.verbalizePaths(paths)
            .orderBy(col("text")).limit(maxContextLines)
            .collect().map(_.getString(0)).toSeq
          addToContext(ctx, lines)
        }
      }

      artifacts("opencypher") match {
        case qs if qs.nonEmpty && (cypherRetriever.isDefined ||
            queryRetriever.isDefined) =>
          // one query per artifact LINE (the prompt's contract): joining
          // them into a single statement would parse-fail every multi-query
          // turn and lose all graph-query context. LLMs prompted for
          // openCypher get the MATCH-subset compiler (CypherLite) when
          // wired; the safety-gated Spark SQL executor stays the fallback
          // for SQL-prompted deployments.
          qs.foreach { q =>
            val lines = cypherRetriever.map(_.retrieve(q))
              .getOrElse(queryRetriever.get.retrieve(q))
            addToContext(ctx, lines)
          }
        case _ =>
      }

      done = KGLinker.taskCompletion(response).exists(_.contains("FINISH"))
    }
    ctx.toSeq
  }
}
