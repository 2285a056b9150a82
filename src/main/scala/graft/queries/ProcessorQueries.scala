package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.retrieve.{EntityContextProvider, Processors, TopicBeamSearch}

/**
 * Result-processor chain, set-op dedups, chunking, and retrieval-graph
 * operators (SURVEY.md §2.5-§2.7, §2.12, §2.4 beam/context expansion) as
 * oracle-gated queries.
 *
 * q_beam_topic / q_entity_context have no SQL oracle (iterative graph
 * expansion with score-truncated frontiers is not expressible as one ANSI
 * query) — the driver records the weaker rows-only check for them; their
 * semantics are unit-tested in RetrieversSpec against hand-built fixtures.
 */
object ProcessorQueries {
  import Tables.t

  private val ChunkTokens = 32
  private val ChunkStride = 28

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5/§3.1-step-6 processor chain over a retrieval-shaped frame derived
    // from TPC-H: statements = lineitems, topics = orders, sources =
    // customers; two "retrievers" (returnflag-R priced, high-quantity) union
    // their results, then Dedup -> Prune -> TruncateStatements ->
    // Disaggregate -> Rescore -> Sort.
    "q_processor_chain" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val base = t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("source_id"),
          col("l_orderkey").as("topic_id"),
          concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("statement_id"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      // Integer (cent-scaled) scores: every aggregate downstream stays exact.
      val retrA = base.filter(col("l_returnflag") === "R")
        .withColumn("score", (col("l_extendedprice") * 100).cast("long"))
      val retrB = base.filter(col("l_quantity") > 25)
        .withColumn("score", (col("l_quantity") * 100000).cast("long"))
      val unioned = retrA.union(retrB)
        .select(col("source_id"), col("topic_id"), col("statement_id"),
          col("score").cast("double").as("score"))
      val chained = Processors.rescoreResults(
        Processors.disaggregateResults(
          Processors.truncateStatements(
            Processors.pruneStatements(
              Processors.dedupResults(unioned), 0.05), 3)))
      Processors.sortResults(
        chained.select(col("source_id"), col("topic_id"), col("statement_id"),
          col("score"), col("topic_score"),
          round(col("result_score"), 6).as("result_score")))
    }),

    // §2.5/§2.6 FULL default chain (reference traversal_based_base_retriever
    // DEFAULT_PROCESSORS + DEFAULT_FORMATTING_PROCESSORS, 18 steps) over the
    // same TPC-H retrieval shape as q_processor_chain, now with statement
    // text, per-statement facts, chunk values, and source metadata so the
    // tail processors (PopulateStatementStrs, RemoveVersioningMetadata,
    // FilterByMetadata, UpdateChunkMetadata, ClearScores, StatementsToStrings,
    // SimplifySingleTopicResults, FormatSources, ClearChunks, ClearTopicIds,
    // TruncateResults) all do real work.
    "q_full_chain" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      // statement_id = md5 over the full line tuple: (orderkey, linenumber)
      // collides in the synthetic data, and a collision-keyed side join
      // (facts, chunks) would fan out. Cents-scaled numerics keep the md5
      // input string engine-stable.
      // base feeds 5 branches (two retrievers, facts, chunks) — checkpoint
      // it once so the lineitem join + md5 ids aren't recomputed per branch
      val base = t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("source_id"),
          col("l_orderkey").as("topic_id"),
          md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_shipdate").cast("string")).as("statement"),
          col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .localCheckpoint(true)
      // no .distinct(): populateStatementStrs dedups in its collect_set
      val facts = base.select(col("statement_id"),
          concat(lit("part:"), col("l_partkey")).as("fact_value"))
        .union(base.select(col("statement_id"),
          concat(lit("supp:"), col("l_suppkey")).as("fact_value")))
      val chunks = base.select(col("statement_id").as("chunk_id"),
        col("l_shipdate").cast("string").as("text")).distinct()
      val sources = t(s, dir, "customer").select(
        col("c_custkey").as("source_id"),
        map(lit("name"), col("c_name"), lit("segment"), col("c_mktsegment"),
          lit("__graft__versioning__valid_from__"), lit("0"),
          lit("__graft__versioning__build_timestamp__"), lit("0")).as("metadata"),
        col("c_mktsegment").as("segment"))
      val cleanSources = Processors.removeVersioningMetadata(sources)
      val retrA = base.filter(col("l_returnflag") === "R")
        .withColumn("score", (col("l_extendedprice") * 100).cast("long"))
      val retrB = base.filter(col("l_quantity") > 25)
        .withColumn("score", (col("l_quantity") * 100000).cast("long"))
      val unioned = retrA.union(retrB)
        .select(col("source_id"), col("topic_id"), col("statement_id"),
          col("statement_id").as("chunk_id"), col("statement"),
          col("score").cast("double").as("score"))
      val processed = Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        Processors.dedupResults,
        Processors.disaggregateResults,
        df => Processors.filterByMetadata(df, cleanSources,
          graft.filter.FilterAst.Pred("segment", graft.filter.FilterAst.Ne, "FURNITURE")),
        df => Processors.populateStatementStrs(df, facts),
        df => Processors.rerankStatements(df, None),
        df => Processors.pruneStatements(df, 0.05),
        Processors.rescoreResults,
        df => Processors.truncateStatements(df, 3),
        df => Processors.truncateRankResults(df, 10),
        df => Processors.updateChunkMetadata(df, chunks),
        df => Processors.clearScores(df),
        df => Processors.statementsToStrings(df, includeFacts = true),
        df => Processors.simplifySingleTopicResults(df),
        Processors.clearChunks,
        df => df.withColumn("topic", concat(lit("order-"), col("topic_id"))),
        Processors.clearTopicIds
      ).foldLeft(unioned)((df, p) => p(df))
      processed
        .join(Processors.formatSources(cleanSources)
          .select("source_id", "source_str"), Seq("source_id"), "left")
        .select(col("source_rank").cast("long").as("source_rank"),
          col("source_str"), col("single_topic").cast("int").as("single_topic"),
          col("topic"), col("statement"), col("score"), col("result_score"))
        .orderBy(col("source_rank"), col("topic"), desc("score"), col("statement"))
    }),

    // §2.11 StatementEnhancement post-processor: per-statement LLM turn via
    // mapPartitions (one client per partition), tag-parsed, original kept on
    // miss. The deterministic uppercase stub makes the whole distributed
    // plumbing — prompt build, partition fan-out, response join — DuckDB-
    // replayable as upper(statement).
    "q_statement_enhance" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus")).as("statement"),
          col("l_shipdate").cast("string").as("chunk_value"))
      graft.retrieve.PostProcessors.statementEnhancement(
          base, () => new graft.llm.UppercaseEnhancerStub)
        .orderBy(col("statement_id"))
    }),

    // §2.6 RerankStatements with a live scorer: statement score := 4dp
    // token-set Jaccard against the query (rerank_statements.py:60-118 with
    // the deterministic scorer standing in for the cross-encoder).
    "q_rerank_statements" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus")).as("statement"))
      Processors.rerankStatements(base,
          Some(Processors.tokenOverlapScorer("r o")))
        .orderBy(desc("score"), col("statement_id"))
    }),

    // §2.7 context-prefix dedup: drop values that are proper prefixes of
    // another value (entity_context_provider.py:187-249). The self-join is
    // bucketed on the first character — a prefix pair always shares it — so
    // the quadratic comparison happens per bucket, never across the corpus.
    "q_prefix_dedup" -> ((s, dir) => {
      val names = t(s, dir, "part").select(col("p_name").as("v")).distinct()
      val keyed = names.withColumn("k", substring(col("v"), 1, 1))
      val dominated = keyed
        .join(keyed.select(col("k"), col("v").as("w")), Seq("k"))
        .filter(col("w") =!= col("v") && col("w").startsWith(col("v")))
        .select(col("v")).distinct()
      names.join(dominated, Seq("v"), "left_anti").orderBy(col("v"))
    }),

    // §2.7 byokg order-preserving dedup: first occurrence per key, output in
    // first-occurrence order (byokg_query_engine.py:101-116).
    "q_orderpreserve_dedup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(min(col("event_id")).as("first_seen"))
        .orderBy(col("first_seen"))
    }),

    // §2.12 chunking: sliding token windows (size 32, stride 28 — the
    // reference's SentenceSplitter 256/25 shape, lexical_graph_index.py:197),
    // one explode, no shuffle until the final order.
    "q_chunk_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), split(T.searchStr(col("text")), "\\s+").as("toks"))
        .withColumn("nt", size(col("toks")))
        .withColumn("start", explode(sequence(lit(0),
          greatest(expr(s"((nt - 1) div $ChunkStride) * $ChunkStride"), lit(0)),
          lit(ChunkStride))))
        .select(col("doc_id"), col("start"),
          concat_ws(" ", slice(col("toks"), col("start") + 1, lit(ChunkTokens)))
            .as("chunk_text"))
        .filter(length(col("chunk_text")) > 0)
        .withColumn("n_chunk_toks", size(split(col("chunk_text"), " ")))
        .orderBy(col("doc_id"), col("start"))
    }),

    // §2.4 topic beam search over the built lexical graph (rows-only).
    "q_beam_topic" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val seeds = g.topics.orderBy(col("topic_id")).limit(3)
        .select(col("topic_id"))
      val queryEmb = (0 until graft.index.LexicalGraphBuilder.EmbeddingDim)
        .map(i => math.sin(i + 1.0))
      TopicBeamSearch.search(g, seeds, queryEmb, beamWidth = 20, depth = 2)
        .select(col("topic_id"), round(col("score"), 6).as("score"), col("depth"))
        .orderBy(col("depth"), desc("score"), col("topic_id"))
    }),

    // §2.4 semantic chunk beam (width 10 / depth 3, path_weighted scoring —
    // rows-only: iterative width-truncated expansion isn't one ANSI query;
    // mode semantics are fixture-tested in RetrieversSpec).
    "q_beam_chunk" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val seeds = g.chunks.orderBy(col("chunk_id")).limit(3).select("chunk_id")
      val queryEmb = (0 until graft.index.LexicalGraphBuilder.EmbeddingDim)
        .map(i => math.sin(i + 1.0))
      graft.retrieve.ChunkBeamSearch.search(g, seeds, queryEmb,
        beamWidth = 10, depth = 3, scoringMode = "path_weighted")
        .select(col("chunk_id"), round(col("score"), 6).as("score"), col("depth"))
        .orderBy(col("depth"), desc("score"), col("chunk_id"))
    }),

    // §2.4 statement beam (fact-sharing + prev-link neighbors, attention
    // scoring — rows-only).
    "q_beam_statement" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val seeds = g.statements.orderBy(col("statement_id")).limit(3)
        .select("statement_id")
      val queryEmb = (0 until graft.index.LexicalGraphBuilder.EmbeddingDim)
        .map(i => math.cos(i + 1.0))
      graft.retrieve.StatementBeamSearch.search(g, seeds, queryEmb,
        beamWidth = 10, depth = 3, scoringMode = "attention")
        .select(col("statement_id"), round(col("score"), 6).as("score"),
          col("depth"))
        .orderBy(col("depth"), desc("score"), col("statement_id"))
    }),

    // §2.4 entity context tree expansion with degree scores (rows-only).
    "q_entity_context" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val seeds = g.entities.orderBy(col("entity_id")).limit(5)
        .select(col("entity_id"))
      EntityContextProvider.expand(g, seeds, maxDepth = 2)
        .join(EntityContextProvider.entityScores(g), Seq("entity_id"), "left")
        .select(col("entity_id"), col("depth"),
          coalesce(col("score"), lit(0L)).as("score"))
        .orderBy(col("depth"), col("entity_id"))
    }))

  val oracles: Map[String, String] = Map(
    "q_processor_chain" ->
      """WITH base AS (
        |  SELECT o_custkey AS source_id, l_orderkey AS topic_id,
        |    l_orderkey||'-'||l_linenumber AS statement_id,
        |    l_returnflag, l_quantity, l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |unioned AS (
        |  SELECT source_id, topic_id, statement_id,
        |    CAST(CAST(trunc(l_extendedprice*100) AS BIGINT) AS DOUBLE) AS score
        |  FROM base WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT source_id, topic_id, statement_id,
        |    CAST(CAST(trunc(l_quantity*100000) AS BIGINT) AS DOUBLE)
        |  FROM base WHERE l_quantity > 25),
        |dedup AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY statement_id ORDER BY score DESC, source_id) AS rn
        |    FROM unioned) WHERE rn = 1),
        |pruned AS (
        |  SELECT * FROM dedup WHERE score >= (SELECT max(score)*0.05 FROM dedup)),
        |trunc3 AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY topic_id ORDER BY score DESC, statement_id) AS sr
        |    FROM pruned) WHERE sr <= 3),
        |disagg AS (
        |  SELECT *, max(score) OVER (PARTITION BY topic_id) AS topic_score
        |  FROM trunc3),
        |topicmeans AS (
        |  SELECT source_id, topic_id, sum(score)/count(*) AS topic_mean
        |  FROM trunc3 GROUP BY 1, 2),
        |rescored AS (
        |  SELECT source_id,
        |    round(list_reduce(list_sort(list(topic_mean)), (a, b) -> a + b)
        |      / count(*), 6) AS result_score
        |  FROM topicmeans GROUP BY source_id)
        |SELECT d.source_id, d.topic_id, d.statement_id, d.score, d.topic_score,
        |  r.result_score
        |FROM disagg d JOIN rescored r USING (source_id)
        |ORDER BY d.score DESC, d.source_id, d.topic_id, d.statement_id""".stripMargin,

    "q_full_chain" ->
      """WITH base AS (
        |  SELECT o_custkey AS source_id, l_orderkey AS topic_id,
        |    md5(l_orderkey||'-'||l_linenumber||'-'||l_partkey||'-'||l_suppkey||'-'||
        |      CAST(trunc(l_extendedprice*100) AS BIGINT)||'-'||
        |      CAST(trunc(l_quantity*100) AS BIGINT)||'-'||
        |      CAST(l_shipdate AS VARCHAR)) AS statement_id,
        |    l_returnflag||' '||l_linestatus||' '||CAST(l_shipdate AS VARCHAR) AS statement,
        |    l_partkey, l_suppkey, l_returnflag, l_quantity, l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |unioned AS (
        |  SELECT source_id, topic_id, statement_id, statement,
        |    CAST(CAST(trunc(l_extendedprice*100) AS BIGINT) AS DOUBLE) AS score
        |  FROM base WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT source_id, topic_id, statement_id, statement,
        |    CAST(CAST(trunc(l_quantity*100000) AS BIGINT) AS DOUBLE)
        |  FROM base WHERE l_quantity > 25),
        |dedup AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY statement_id ORDER BY score DESC, source_id) AS rn
        |    FROM unioned) WHERE rn = 1),
        |disagg AS (
        |  SELECT *, max(score) OVER (PARTITION BY topic_id) AS topic_score
        |  FROM dedup),
        |filt AS (
        |  SELECT d.* FROM disagg d
        |  WHERE EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey = d.source_id AND c.c_mktsegment <> 'FURNITURE')),
        |factarr AS (
        |  SELECT statement_id, list_sort(list(DISTINCT fact_value)) AS fl
        |  FROM (SELECT statement_id, 'part:'||l_partkey AS fact_value FROM base
        |        UNION ALL
        |        SELECT statement_id, 'supp:'||l_suppkey FROM base)
        |  GROUP BY statement_id),
        |pop AS (
        |  SELECT f.*,
        |    f.statement||' (details: '||array_to_string(fa.fl, ', ')||')' AS statement_str
        |  FROM filt f LEFT JOIN factarr fa USING (statement_id)),
        |pruned AS (
        |  SELECT * FROM pop WHERE score >= (SELECT max(score)*0.05 FROM pop)),
        |topicmeans AS (
        |  SELECT source_id, topic_id, sum(score)/count(*) AS topic_mean
        |  FROM pruned GROUP BY 1, 2),
        |rescored AS (
        |  SELECT source_id,
        |    list_reduce(list_sort(list(topic_mean)), (a, b) -> a + b)
        |      / count(*) AS result_score
        |  FROM topicmeans GROUP BY source_id),
        |resc AS (
        |  SELECT p.*, r.result_score FROM pruned p JOIN rescored r USING (source_id)),
        |trunc3 AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY topic_id ORDER BY score DESC, statement_id) AS sr
        |    FROM resc) WHERE sr <= 3),
        |ranked AS (
        |  SELECT source_id, row_number() OVER (ORDER BY _rs DESC, source_id) AS source_rank
        |  FROM (SELECT source_id, max(result_score) AS _rs FROM trunc3
        |        GROUP BY source_id ORDER BY _rs DESC, source_id LIMIT 10)),
        |single AS (
        |  SELECT t.source_id FROM trunc3 t JOIN ranked USING (source_id)
        |  GROUP BY t.source_id HAVING count(DISTINCT t.topic_id) = 1),
        |srcstr AS (
        |  SELECT c_custkey AS source_id,
        |    c_name||' ('||c_mktsegment||')' AS source_str
        |  FROM customer)
        |SELECT rk.source_rank, s.source_str,
        |  CASE WHEN sg.source_id IS NOT NULL THEN 1 ELSE 0 END AS single_topic,
        |  'order-'||t.topic_id AS topic, t.statement_str AS statement, t.score,
        |  CAST(NULL AS DOUBLE) AS result_score
        |FROM trunc3 t
        |JOIN ranked rk USING (source_id)
        |LEFT JOIN single sg ON sg.source_id = t.source_id
        |LEFT JOIN srcstr s ON s.source_id = t.source_id
        |ORDER BY rk.source_rank, topic, t.score DESC, statement""".stripMargin,

    "q_statement_enhance" ->
      """SELECT md5(l_orderkey||'-'||l_linenumber||'-'||l_partkey||'-'||l_suppkey||'-'||
        |    CAST(trunc(l_extendedprice*100) AS BIGINT)||'-'||
        |    CAST(trunc(l_quantity*100) AS BIGINT)||'-'||
        |    CAST(l_shipdate AS VARCHAR)) AS statement_id,
        |  upper(l_returnflag||' '||l_linestatus) AS statement,
        |  CAST(l_shipdate AS VARCHAR) AS chunk_value
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY statement_id""".stripMargin,

    "q_rerank_statements" ->
      """WITH base AS (
        |  SELECT md5(l_orderkey||'-'||l_linenumber||'-'||l_partkey||'-'||l_suppkey||'-'||
        |      CAST(trunc(l_extendedprice*100) AS BIGINT)||'-'||
        |      CAST(trunc(l_quantity*100) AS BIGINT)||'-'||
        |      CAST(l_shipdate AS VARCHAR)) AS statement_id,
        |    l_returnflag||' '||l_linestatus AS statement
        |  FROM lineitem WHERE l_orderkey < 500),
        |toks AS (
        |  SELECT *, list_distinct(string_split_regex(lower(statement), '[^a-z0-9]+')) AS t,
        |    ['r', 'o'] AS q
        |  FROM base)
        |SELECT statement_id, statement,
        |  round(CAST(len(list_intersect(t, q)) AS DOUBLE) /
        |    (len(t) + len(q) - len(list_intersect(t, q))), 4) AS score
        |FROM toks
        |ORDER BY score DESC, statement_id""".stripMargin,

    "q_prefix_dedup" ->
      """WITH names AS (SELECT DISTINCT p_name AS v FROM part)
        |SELECT v FROM names a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM names b
        |  WHERE b.v <> a.v AND substr(b.v, 1, length(a.v)) = a.v)
        |ORDER BY v""".stripMargin,

    "q_orderpreserve_dedup" ->
      """SELECT event_type, min(event_id) AS first_seen
        |FROM events GROUP BY event_type ORDER BY first_seen""".stripMargin,

    "q_chunk_split" -> {
      val norm = TextQueries.normSql("text")
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex($norm,'\\s+') AS toks FROM documents),
         |st AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, greatest(((len(toks)-1)//$ChunkStride)*$ChunkStride, 0)+1, $ChunkStride)) AS start
         |  FROM tok),
         |ch AS (
         |  SELECT doc_id, start,
         |    array_to_string(list_slice(toks, start+1, start+$ChunkTokens), ' ') AS chunk_text
         |  FROM st)
         |SELECT doc_id, CAST(start AS INT) AS start, chunk_text,
         |  len(string_split(chunk_text, ' ')) AS n_chunk_toks
         |FROM ch WHERE length(chunk_text) > 0
         |ORDER BY doc_id, start""".stripMargin
    })
}
