package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The reference's result-processor chain re-expressed as DataFrame transforms.
 *
 * The reference runs these as Python list transforms over collected results
 * (reference: the retrieval/processors modules, chained per
 * traversal_based_base_retriever.py:24-46). Here each one is a distributed
 * transform over a flat statements frame with columns
 * (source_id, topic_id, statement_id, chunk_id, statement, score, ...),
 * grouped only where the semantics demand it. Keeping the frame flat (instead
 * of the reference's nested SearchResultCollection) means every step stays a
 * window or aggregation Catalyst can plan, and re-nesting happens once at
 * format time.
 */
object Processors {

  /** SortResults: global score sort (reference sort_results.py:43-63).
    * Deterministic tie-break on ids. */
  def sortResults(df: DataFrame): DataFrame =
    df.orderBy(desc("score"), col("source_id"), col("topic_id"), col("statement_id"))

  /** TruncateResults: keep the top-n sources by source score
    * (reference truncate_results.py:36-56). */
  def truncateResults(df: DataFrame,
                      maxResults: Int = graft.model.Defaults.MaxSearchResults): DataFrame = {
    // top-n via orderBy+limit (TakeOrderedAndProject): per-partition top-n,
    // merged on the driver — never a global single-partition window rank
    val srcRank = df.groupBy("source_id").agg(max("score").as("src_score"))
      .orderBy(desc("src_score"), col("source_id"))
      .limit(maxResults)
      .select("source_id")
    df.join(broadcast(srcRank), Seq("source_id"), "left_semi")
  }

  /** TruncateStatements: top-n statements per topic
    * (reference truncate_statements.py:41-87). */
  def truncateStatements(df: DataFrame,
                         maxPerTopic: Int = graft.model.Defaults.MaxStatementsPerTopic): DataFrame = {
    val w = Window.partitionBy("topic_id").orderBy(desc("score"), col("statement_id"))
    df.withColumn("stmt_rank", row_number().over(w))
      .filter(col("stmt_rank") <= maxPerTopic)
      .drop("stmt_rank")
  }

  /** TruncateByTokens: keep highest-scored statements while the running token
    * total stays within budget (reference truncate_by_tokens.py:74-164).
    * Token length = whitespace tokens of the statement text.
    *
    * The global running sum is a two-pass prefix sum — range-partition on the
    * rank order, local prefix sums, then broadcast per-partition offsets — so
    * no single task ever sees the whole frame (a bare `Window.orderBy` would
    * funnel every row through one partition). */
  def truncateByTokens(df: DataFrame, maxTokens: Int,
                       textCol: String = "statement"): DataFrame = {
    val withLen = df.withColumn("tok_len",
      graft.functions.TextFunctions.tokenCount(col(textCol)))
      .repartitionByRange(col("score").desc, col("statement_id"))
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy("_pid")
      .orderBy(desc("score"), col("statement_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withLen.withColumn("_local", sum("tok_len").over(wLocal))
    // per-partition totals: a few rows, so the tiny global window is fine
    val wOffset = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("_pid").agg(sum("tok_len").as("_psum"))
      .withColumn("_offset", coalesce(sum("_psum").over(wOffset), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), Seq("_pid"))
      .filter(col("_local") + col("_offset") <= maxTokens)
      .drop("tok_len", "_pid", "_local", "_offset")
  }

  /** PruneStatements: drop statements scoring below max_score * factor or an
    * absolute floor (reference prune_statements.py:16-50). The global max is
    * a scalar aggregate broadcast back, NOT a whole-frame window — a window
    * over lit(1) would funnel every row through one partition. */
  def pruneStatements(df: DataFrame,
                      pruningFactor: Double = graft.model.Defaults.StatementPruningFactor,
                      absoluteFloor: Double = 0.0): DataFrame = {
    val mx = df.agg(max("score").as("max_score"))
    df.crossJoin(broadcast(mx))
      .filter(col("score") >= greatest(col("max_score") * pruningFactor,
        lit(absoluteFloor)))
      .drop("max_score")
  }

  /** PruneResults: drop whole sources whose aggregate score is below the
    * threshold (reference prune_results.py:36-57). The passing-source set
    * grows with the data, so no broadcast hint — AQE picks the join strategy
    * from the measured size. */
  def pruneResults(df: DataFrame,
                   threshold: Double = graft.model.Defaults.ResultsPruningThreshold): DataFrame = {
    val srcScores = df.groupBy("source_id").agg(avg("score").as("source_score"))
      .filter(col("source_score") >= threshold)
      .select("source_id")
    df.join(srcScores, Seq("source_id"), "left_semi")
  }

  /** DedupResults: merge duplicate statements across retrievers, keeping the
    * best score per statement (reference dedup_results.py:45-97). */
  def dedupResults(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("statement_id").orderBy(desc("score"), col("source_id"))
    df.withColumn("dup_rank", row_number().over(w))
      .filter(col("dup_rank") === 1)
      .drop("dup_rank")
  }

  /** DisaggregateResults: one result per topic, topic score = max statement
    * score (reference disaggregate_results.py:39-69). On the flat frame this
    * is a per-topic score annotation. */
  def disaggregateResults(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("topic_id")
    df.withColumn("topic_score", max("score").over(w))
  }

  /** RescoreResults: source score = mean over its topics of the per-topic mean
    * statement score (reference rescore_results.py:39-86). The outer mean is a
    * sorted sequential fold, not a plain double sum: float addition isn't
    * associative, so an order-dependent sum differs run to run under Spark's
    * nondeterministic partition merge order (and across engines). Sorting the
    * addends first makes the score bit-reproducible everywhere. */
  def rescoreResults(df: DataFrame): DataFrame = {
    val perTopic = df.groupBy("source_id", "topic_id")
      .agg(avg("score").as("topic_mean"))
    val perSource = perTopic.groupBy("source_id")
      .agg((aggregate(sort_array(collect_list(col("topic_mean"))),
        lit(0.0), (acc, v) => acc + v) / count(lit(1))).as("result_score"))
    // one row per source — unbounded at scale, so let AQE pick the strategy
    df.join(perSource, Seq("source_id"))
  }

  /** FilterByMetadata: keep statements whose source metadata passes the filter
    * AST (reference filter_by_metadata.py:38-62). `sources` must carry the
    * metadata columns the filter references. */
  def filterByMetadata(df: DataFrame, sources: DataFrame,
                       filter: graft.filter.FilterAst.Filter): DataFrame = {
    val passing = sources.filter(graft.filter.FilterAst.compile(filter))
      .select("source_id")
    // the passing set is a filtered scan of all sources — not broadcastable
    // by contract; AQE converts to broadcast when the measured size allows
    df.join(passing, Seq("source_id"), "left_semi")
  }

  /** The nested per-source context frame (topics with sorted statements)
    * that every output format renders from. */
  private def nestedContext(df: DataFrame): DataFrame =
    df.groupBy("source_id", "topic_id")
      .agg(
        max("score").as("topic_score"),
        sort_array(collect_list(struct(col("score"), col("statement_id"),
          col("statement"))), asc = false).as("statements"))
      .groupBy("source_id")
      .agg(
        max("topic_score").as("score"),
        sort_array(collect_list(struct(col("topic_score"), col("topic_id"),
          col("statements"))), asc = false).as("topics"))

  /** Format the flat frame back into the nested per-source JSON context the
    * engine hands to the LLM (reference lexical_graph_query_engine.py:388-446;
    * the reference also renders yaml/xml/text/bedrock_xml from the same
    * nesting — see [[formatContextText]] / [[formatContextXml]]). */
  def formatContext(df: DataFrame): DataFrame =
    nestedContext(df)
      .select(col("source_id"), col("score"),
        to_json(struct(col("source_id"), col("topics"))).as("context_json"))
      .orderBy(desc("score"), col("source_id"))

  /** Plain-text rendering: one indented block per source, statements in
    * score order (reference text format, lexical_graph_query_engine.py:410-446). */
  def formatContextText(df: DataFrame): DataFrame =
    nestedContext(df)
      .select(col("source_id"), col("score"),
        concat(
          lit("source: "), col("source_id"), lit("\n"),
          concat_ws("\n", transform(col("topics"), t =>
            concat(lit("  topic: "), t("topic_id"), lit("\n"),
              concat_ws("\n", transform(t("statements"), st =>
                concat(lit("    - "), st("statement")))))))).as("context_text"))
      .orderBy(desc("score"), col("source_id"))

  /** XML rendering (reference xml / bedrock_xml formats). */
  def formatContextXml(df: DataFrame): DataFrame =
    nestedContext(df)
      .select(col("source_id"), col("score"),
        concat(
          lit("<source id=\""), col("source_id"), lit("\">"),
          concat_ws("", transform(col("topics"), t =>
            concat(lit("<topic id=\""), t("topic_id"), lit("\">"),
              concat_ws("", transform(t("statements"), st =>
                concat(lit("<statement>"), st("statement"),
                  lit("</statement>")))),
              lit("</topic>")))),
          lit("</source>")).as("context_xml"))
      .orderBy(desc("score"), col("source_id"))
}
