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
 * The beam/context expansions are fixed-depth, so their oracles unroll the
 * loop: LexicalQueries.graphCte rebuilds the graph store in DuckDB, then
 * one CTE block per depth replays expand -> visited anti-join -> score ->
 * width truncation (MATERIALIZED, or DuckDB re-inlines the whole prefix per
 * reference and the plan grows exponentially with depth). Their semantics
 * are additionally unit-tested in RetrieversSpec on hand-built fixtures.
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
      // Both retrievers read the same base, so the union is fused into one
      // pass: each row explodes into 0-2 scored rows (same multiset as
      // filter-A union filter-B) — one scan of the join instead of two.
      val unioned = base.select(col("source_id"), col("topic_id"),
          col("statement_id"),
          explode(concat(
            when(col("l_returnflag") === "R",
              array((col("l_extendedprice") * 100).cast("long")))
              .otherwise(array().cast("array<long>")),
            when(col("l_quantity") > 25,
              array((col("l_quantity") * 100000).cast("long")))
              .otherwise(array().cast("array<long>")))).as("score"))
        .withColumn("score", col("score").cast("double"))
      // two materialization cuts, same finding as q_full_chain below:
      // pruneStatements' scalar-max broadcast subtree re-executes its whole
      // lineage (the dedup aggregate + the lineitem join), and
      // rescoreResults' per-source broadcast subtree re-executes
      // prune+truncate+disaggregate — each cut is a narrow ids+scores frame
      // (MBs) that turns those re-executions into in-memory scans.
      // LAZY checkpoints (round-12): the first consumer of each cut — the
      // prune/rescore broadcast subtree — materializes it as a side effect
      // of its own job, so the cut costs no separate whole-lineage
      // materialization job (the checkpointCount fusion, without the count)
      val chained = Processors.rescoreResults(
        Processors.disaggregateResults(
          Processors.truncateStatements(
            Processors.pruneStatements(
              Processors.dedupResults(unioned).localCheckpoint(false),
              0.05), 3)).localCheckpoint(false))
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
      // statement_id = md5 over the full line tuple: (orderkey, linenumber)
      // collides in the synthetic data, and a collision-keyed side join
      // (facts, chunks) would fan out. Cents-scaled numerics keep the md5
      // input string engine-stable.
      // base is the INDEXED statement store (Tables.retrievalStatements,
      // built + cached once like the lexicalGraph tables — the reference
      // materializes statements at extract-and-build time, not per query):
      // it feeds 5 branches (two retrievers, facts, chunks) without
      // recomputing the lineitem join + md5 ids per branch or per query.
      val base = Tables.retrievalStatements(s, dir)
      val sources = t(s, dir, "customer").select(
        col("c_custkey").as("source_id"),
        map(lit("name"), col("c_name"), lit("segment"), col("c_mktsegment"),
          lit("__graft__versioning__valid_from__"), lit("0"),
          lit("__graft__versioning__build_timestamp__"), lit("0")).as("metadata"),
        col("c_mktsegment").as("segment"))
      val cleanSources = Processors.removeVersioningMetadata(sources)
      // fused two-retriever pass (see q_processor_chain): one checkpoint
      // scan, each row explodes into its 0-2 retriever scores
      // The scored frame enters the chain WITHOUT statement text or the
      // chunk_id copy: no processor before the rank-truncation boundary
      // reads either (dedup keys on statement_id, windows on topic_id,
      // scores are numeric), so carrying them would widen every chain
      // shuffle by ~60 B/row for columns only the ~100 survivors need.
      // They're reattached from the checkpointed base right after the
      // truncation boundary — the projection deferral a columnar optimizer
      // would apply if the processors weren't black-box row transforms.
      val unioned = base.select(col("source_id"), col("topic_id"),
          col("statement_id"),
          explode(col("scores")).as("score"))
        .withColumn("score", col("score").cast("double"))
      val processed = Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        Processors.dedupResults,
        Processors.disaggregateResults,
        df => Processors.filterByMetadata(df, cleanSources,
          graft.filter.FilterAst.Pred("segment", graft.filter.FilterAst.Ne, "FURNITURE")),
        // materialize the chain head ONCE: everything downstream reads this
        // frame through SEPARATE broadcast subtrees — pruneStatements' scalar
        // max, rescoreResults' per-source means, truncateRankResults' rank
        // set — and each such subtree re-EXECUTES its whole lineage when the
        // broadcast materializes, so without a cut here the dedup aggregate
        // + topic window over the exploded statements ran 4x per query
        // (the round-7 "re-derivation" finding). The frame here is narrow
        // ids+scores (statement text reattaches after the truncation
        // boundary below), so the checkpoint is MBs, not the corpus.
        // LAZY (round-12): pruneStatements' scalar-max broadcast job is the
        // first consumer and materializes the cut as a side effect — same
        // persisted frame, one fewer whole-lineage job per invocation.
        df => df.localCheckpoint(false),
        df => Processors.rerankStatements(df, None),
        df => Processors.pruneStatements(df, 0.05),
        // Rank-truncation runs BEFORE statement truncation (reference order
        // is statements-first): the two commute row-identically here —
        // the rank is by result_score, a per-source constant (statement-
        // level truncation can't change it), and each topic_id (orderkey)
        // belongs to exactly one source, so the per-topic top-3 sees the
        // same candidate rows either way. Ordering it rank-first means the
        // top-3-per-topic heap aggregates the ~400 surviving rows of the 10
        // ranked sources instead of all 300k+ scored statements — the
        // single most expensive step of the chain in stage profiles.
        // rescore+rank are FUSED (spec-gated row-identical): the sequential
        // pair shuffled every pruned statement on source_id to attach a
        // result_score the rank step immediately discarded for all but 10
        // sources — the fused form broadcasts the 10-row rank set instead
        // (the round-9 middle-segment finding: 2.9 s → the groupBy + one
        // broadcast scan).
        df => Processors.rescoreAndRank(df, 10),
        df => Processors.truncateStatements(df, 3),
        // materialization boundary: rank-truncation bounds the frame to
        // ≤ max_results sources × topics × 3 statements (the reference's
        // SearchResultCollection is likewise a materialized list after
        // retrieval, before formatting). Checkpointing here caps the plan
        // the formatting tail compiles — without it the whole 16-step
        // lineage re-enters codegen for every tail step. LAZY: the
        // survivor-id broadcast right below materializes it in its own job.
        df => df.localCheckpoint(false),
        // the three deferred enrichments — statement-text reattach,
        // PopulateStatementStrs facts, UpdateChunkMetadata — all key on the
        // SAME surviving statement_id set (chunk_id is a statement_id
        // copy), so ONE broadcast semi-join restricts the 600k-row base to
        // the ≤ ~300 survivors and a tiny eager checkpoint feeds all three,
        // where three separate semi-joins each re-scanned the wide base.
        // PopulateStatementStrs runs here, not in the reference's slot
        // before rerank: with the default reranker='none', statement_str
        // is first consumed by the formatting tail, so the fact enrichment
        // commutes past every score-only processor — the join-deferral a
        // plan optimizer would apply. Output is row-identical; a live
        // reranker reading statement_str would pin it back to its slot.
        df => {
          val surv = broadcast(df.select("statement_id").distinct())
          val survBase = base
            .join(surv, Seq("statement_id"), "left_semi")
            .localCheckpoint(false) // lazy: stmtText's broadcast build materializes it
          // statement_id determines the statement string (it hashes the
          // full source tuple), so the dropDuplicates lookup is exact
          val stmtText = survBase.select(col("statement_id"), col("statement"))
            .dropDuplicates("statement_id")
          val withText = df.join(broadcast(stmtText), Seq("statement_id"))
            .withColumn("chunk_id", col("statement_id"))
          val survFacts = survBase.select(col("statement_id"),
            explode(array(col("fact_part"), col("fact_supp"))).as("fact_value"))
          val populated = Processors.populateStatementStrs(withText, survFacts)
          val survChunks = survBase
            .select(col("statement_id").as("chunk_id"),
              col("chunk_text").as("text")).distinct()
          Processors.updateChunkMetadata(populated, survChunks)
        },
        df => Processors.clearScores(df),
        df => Processors.statementsToStrings(df, includeFacts = true),
        df => Processors.simplifySingleTopicResults(df),
        Processors.clearChunks,
        df => df.withColumn("topic", concat(lit("order-"), col("topic_id"))),
        Processors.clearTopicIds
      ).foldLeft(unioned)((df, p) => p(df))
      // restrict source formatting to the ≤ max_results SURVIVING sources
      // before rendering: a LEFT join on source_id only ever reads the
      // matching ids' source_str, so semi-joining sources first is
      // row-identical and skips map-rendering every corpus source per rep
      val survSources = cleanSources.join(
        broadcast(processed.select("source_id").distinct()),
        Seq("source_id"), "left_semi")
      processed
        .join(Processors.formatSources(survSources)
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

    // §2.11 cross-encoder-shaped reranking through the Reranker seam: the
    // embedding-interaction scorer (bilinear qᵀWᵀt over hash-projection
    // embeddings, byokg.EmbeddingInteractionReranker) ranks by embedding
    // geometry, not token overlap — the BGE contract (bge_reranker.py)
    // with the model forward pass replaced by a deterministic interaction
    // both engines replay exactly: 16-dim md5 embeddings, w = q + 0.5·rot(q),
    // one codegen'd cosine per row, TakeOrderedAndProject top-25.
    "q_rerank_crossenc" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_shipdate").cast("string")).as("statement"))
      new graft.byokg.EmbeddingInteractionReranker(dim = 16)
        .rerankTopK("return flagged shipments 1994", base, "statement",
          topk = 25, orderCol = "statement_id")
        .select(col("statement_id"), col("statement"),
          round(col("rerank_score"), 6).as("rerank_score"))
        .orderBy(desc("rerank_score"), col("statement_id"))
    }),

    // §2.6 RerankTopics: per-topic documents (name + score-desc statement
    // text, 4000-char cap) tfidf-scored against the query, top-5 topics
    // kept, topic relevance propagated onto zero-scored statements
    // (rerank_topics.py:36-124). 'F'-linestatus statements arrive score-0
    // so propagation does real work.
    "q_rerank_topics" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey").as("topic_id"),
          md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_shipdate").cast("string")).as("statement"),
          when(col("l_linestatus") === "F", lit(0.0))
            .otherwise((col("l_quantity") * 100).cast("long").cast("double"))
            .as("score"))
      val topics = base.select(col("topic_id")).distinct()
        .withColumn("value", concat(lit("order-"), col("topic_id")))
      Processors.rerankTopics(base, "1994 r o", maxTopics = 5,
          topics = Some(topics))
        .select(col("topic_id"), col("statement_id"),
          round(col("score"), 6).as("score"),
          round(col("topic_rr_score"), 6).as("topic_rr_score"))
        .orderBy(desc("topic_rr_score"), col("topic_id"), col("statement_id"))
    }),

    // §2.7 context-prefix dedup: drop values that are proper prefixes of
    // another value (entity_context_provider.py:187-249). Sorted-successor
    // plan: `v` is dominated iff its lexicographic successor starts with it,
    // so one range-partitioned sort + lead() replaces the self-join — the
    // round-7 first-character-bucket plan was quadratic in bucket size.
    "q_prefix_dedup" -> ((s, dir) => {
      val names = t(s, dir, "part").select(col("p_name").as("v"))
      graft.ops.Dedup.dropProperPrefixes(names, "v").orderBy(col("v"))
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
        .select(col("doc_id"), col("start").cast("int").as("start"),
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
        |  SELECT *, list_distinct(list_filter(
        |      string_split_regex(lower(statement), '[^a-z0-9]+'),
        |      x -> x <> '')) AS t,
        |    ['r', 'o'] AS q
        |  FROM base)
        |SELECT statement_id, statement,
        |  round(CAST(len(list_intersect(t, q)) AS DOUBLE) /
        |    (len(t) + len(q) - len(list_intersect(t, q))), 4) AS score
        |FROM toks
        |ORDER BY score DESC, statement_id""".stripMargin,

    "q_rerank_crossenc" -> {
      // the 16-dim hash-projection embedding of expression e, as DuckDB
      // (exact replay of VectorFunctions.hashEmbedding / HashEmbedder)
      def embSql(e: String) =
        s"""list_transform(range(0,16), i ->
           |  (CAST(CAST('0x'||substr(md5(i||'#'||$e),1,15) AS BIGINT) AS DOUBLE)
           |   / 1.152921504606847e18) * 2.0 - 1.0)""".stripMargin
      def dotSql(a: String, b: String) =
        s"list_sum(list_transform(range(1,17), i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)))"
      s"""WITH qv AS (SELECT ${embSql("'return flagged shipments 1994'")} AS q),
         |wv AS (SELECT list_transform(range(0,16),
         |    j -> q[j+1] + 0.5*q[((j+1)%16)+1]) AS w FROM qv),
         |base AS (
         |  SELECT md5(l_orderkey||'-'||l_linenumber||'-'||l_partkey||'-'||l_suppkey||'-'||
         |      CAST(trunc(l_extendedprice*100) AS BIGINT)||'-'||
         |      CAST(trunc(l_quantity*100) AS BIGINT)||'-'||
         |      CAST(l_shipdate AS VARCHAR)) AS statement_id,
         |    l_returnflag||' '||l_linestatus||' '||CAST(l_shipdate AS VARCHAR) AS statement
         |  FROM lineitem WHERE l_orderkey < 500),
         |emb AS (SELECT *, ${embSql("statement")} AS tv FROM base),
         |scored AS (
         |  SELECT statement_id, statement,
         |    ${dotSql("tv", "w")} /
         |      (sqrt(${dotSql("tv", "tv")}) * sqrt(${dotSql("w", "w")})) AS score
         |  FROM emb, wv
         |  ORDER BY score DESC, statement_id LIMIT 25)
         |SELECT statement_id, statement, round(score, 6) AS rerank_score
         |FROM scored ORDER BY rerank_score DESC, statement_id""".stripMargin
    },

    "q_rerank_topics" -> {
      val norm = TextQueries.normSql("doc")
      s"""WITH base AS (
         |  SELECT l_orderkey AS topic_id,
         |    md5(l_orderkey||'-'||l_linenumber||'-'||l_partkey||'-'||l_suppkey||'-'||
         |      CAST(trunc(l_extendedprice*100) AS BIGINT)||'-'||
         |      CAST(trunc(l_quantity*100) AS BIGINT)||'-'||
         |      CAST(l_shipdate AS VARCHAR)) AS statement_id,
         |    l_returnflag||' '||l_linestatus||' '||CAST(l_shipdate AS VARCHAR) AS statement,
         |    CASE WHEN l_linestatus = 'F' THEN 0.0
         |      ELSE CAST(CAST(trunc(l_quantity*100) AS BIGINT) AS DOUBLE)
         |    END AS score
         |  FROM lineitem WHERE l_orderkey < 1000),
         |docs AS (
         |  SELECT topic_id,
         |    substr('order-'||topic_id||chr(10)||
         |      string_agg(statement, ' ' ORDER BY score DESC, statement_id),
         |      1, 4000) AS doc
         |  FROM base GROUP BY topic_id),
         |toks AS (
         |  SELECT topic_id, string_split_regex($norm, '\\s+') AS toks FROM docs),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
         |terms(term) AS (VALUES ('1994'), ('r'), ('o')),
         |tf AS (
         |  SELECT topic_id, term, len(list_filter(toks, t -> t = term)) AS tf
         |  FROM toks, terms),
         |dfc AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
         |ts AS (
         |  SELECT topic_id, sum(tf * ln(nn.n / dfc.df)) AS s
         |  FROM tf JOIN dfc USING (term), nn WHERE tf > 0 GROUP BY topic_id),
         |kept AS (
         |  SELECT d.topic_id, coalesce(ts.s, 0.0) AS topic_rr_score
         |  FROM docs d LEFT JOIN ts USING (topic_id)
         |  ORDER BY topic_rr_score DESC, d.topic_id LIMIT 5)
         |SELECT b.topic_id, b.statement_id,
         |  round(CASE WHEN b.score = 0.0 THEN k.topic_rr_score ELSE b.score END, 6)
         |    AS score,
         |  round(k.topic_rr_score, 6) AS topic_rr_score
         |FROM base b JOIN kept k USING (topic_id)
         |ORDER BY round(k.topic_rr_score, 6) DESC, b.topic_id, b.statement_id"""
        .stripMargin
    },

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
         |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_chunk_toks
         |FROM ch WHERE length(chunk_text) > 0
         |ORDER BY doc_id, start""".stripMargin
    },

    // The topic beam replayed end-to-end: LexicalQueries.graphCte rebuilds
    // the graph store (ids, links, deterministic per-topic embeddings),
    // then each depth unrolls to seeds -> expand (shared-chunk/adjacent +
    // strength-capped entity overlap) -> visited anti -> cosine top-20.
    "q_beam_topic" -> {
      def cos(t: String) =
        s"""(list_sum(list_transform(range(1,65), i -> $t.emb[i]*q.emb[i]))
           | / (sqrt(list_sum(list_transform(range(1,65), i -> $t.emb[i]*$t.emb[i])))
           |  * sqrt(list_sum(list_transform(range(1,65), i -> q.emb[i]*q.emb[i])))))""".stripMargin
      def expand(frontier: String, visited: String, d: Int) =
        s"""f${d}c AS (SELECT DISTINCT m.chunk_id FROM gtmi m JOIN $frontier USING (topic_id)),
           |p$d AS MATERIALIZED (
           |  SELECT unnest([c.chunk_id, c.prev_id, c.next_id]) AS chunk_id
           |  FROM gchl c JOIN f${d}c USING (chunk_id)),
           |v$d AS MATERIALIZED (
           |  SELECT m.topic_id FROM gtmi m
           |  JOIN (SELECT DISTINCT chunk_id FROM p$d WHERE chunk_id IS NOT NULL) p
           |    USING (chunk_id)),
           |e$d AS MATERIALIZED (SELECT DISTINCT entity_id FROM gte JOIN $frontier USING (topic_id)),
           |o$d AS MATERIALIZED (
           |  SELECT topic_id FROM (
           |    SELECT g.topic_id, count(*) AS strength
           |    FROM gte g JOIN e$d USING (entity_id)
           |    GROUP BY 1 ORDER BY strength DESC, topic_id LIMIT 100)),
           |c$d AS MATERIALIZED (
           |  SELECT DISTINCT topic_id FROM (
           |    SELECT topic_id FROM v$d UNION ALL SELECT topic_id FROM o$d)
           |  WHERE topic_id NOT IN (SELECT topic_id FROM $visited)),
           |b$d AS MATERIALIZED (
           |  SELECT topic_id, score FROM (
           |    SELECT c.topic_id, ${cos("t")} AS score
           |    FROM c$d c JOIN gtemb t USING (topic_id), gqv q)
           |  ORDER BY score DESC, topic_id LIMIT 20)""".stripMargin
      s"""WITH ${LexicalQueries.graphCte},
         |seeds AS MATERIALIZED (
         |  SELECT topic_id FROM (SELECT DISTINCT topic_id FROM gchunk2)
         |  ORDER BY topic_id LIMIT 3),
         |d0 AS MATERIALIZED (
         |  SELECT s.topic_id, ${cos("t")} AS score, 0 AS depth
         |  FROM seeds s JOIN gtemb t USING (topic_id), gqv q),
         |${expand("seeds", "seeds", 1)},
         |vis2 AS MATERIALIZED (
         |  SELECT topic_id FROM seeds UNION ALL SELECT topic_id FROM b1),
         |${expand("b1", "vis2", 2)}
         |SELECT topic_id, round(score, 6) AS score, depth FROM (
         |  SELECT * FROM d0
         |  UNION ALL SELECT topic_id, score, 1 FROM b1
         |  UNION ALL SELECT topic_id, score, 2 FROM b2)
         |ORDER BY depth, round(score, 6) DESC, topic_id""".stripMargin
    },

    // Chunk beam (width 10 / depth 3, path_weighted): chunk embeddings from
    // chunk text, per-parent top-5 entities by degree, shared-entity
    // candidates capped 20/parent, pair-scored with max-over-parents.
    "q_beam_chunk" -> {
      def cosL(a: String, b: String) =
        s"""(list_sum(list_transform(range(1,65), i -> $a[i]*$b[i]))
           | / (sqrt(list_sum(list_transform(range(1,65), i -> $a[i]*$a[i])))
           |  * sqrt(list_sum(list_transform(range(1,65), i -> $b[i]*$b[i])))))""".stripMargin
      def emb(t: String) =
        s"""list_transform(range(0, 64), i ->
           |      ('0x'||substr(md5(i::VARCHAR||'#'||$t),1,15))::BIGINT
           |        / 1.152921504606847e18 * 2.0 - 1.0)""".stripMargin
      def expand(frontier: String, visited: String, d: Int) =
        s"""fe$d AS (
           |  SELECT parent_id, entity_id FROM (
           |    SELECT f.chunk_id AS parent_id, ce.entity_id,
           |      row_number() OVER (PARTITION BY f.chunk_id
           |        ORDER BY dg.score DESC, ce.entity_id) AS erank
           |    FROM $frontier f JOIN gce ce USING (chunk_id)
           |    LEFT JOIN deg dg USING (entity_id))
           |  WHERE erank <= 5),
           |cn$d AS MATERIALIZED (
           |  SELECT parent_id, chunk_id FROM (
           |    SELECT fe.parent_id, ce.chunk_id, count(*) AS strength
           |    FROM gce ce JOIN fe$d fe USING (entity_id)
           |    WHERE ce.chunk_id <> fe.parent_id
           |    GROUP BY 1, 2
           |    QUALIFY row_number() OVER (PARTITION BY fe.parent_id
           |      ORDER BY count(*) DESC, ce.chunk_id) <= 20)
           |  WHERE chunk_id NOT IN (SELECT chunk_id FROM $visited)),
           |sc$d AS MATERIALIZED (
           |  SELECT chunk_id,
           |    max(${cosL("e.emb", "q.emb")}
           |      * (1.0 + ${cosL("e.emb", "p.emb")}) / 2) AS score
           |  FROM cn$d cn JOIN gcemb e USING (chunk_id)
           |  JOIN gcemb p ON p.chunk_id = cn.parent_id, gqv q
           |  GROUP BY chunk_id),
           |b$d AS MATERIALIZED (
           |  SELECT chunk_id, score FROM sc$d
           |  ORDER BY score DESC, chunk_id LIMIT 10)""".stripMargin
      s"""WITH ${LexicalQueries.graphCte},
         |gce AS MATERIALIZED (
         |  SELECT DISTINCT chunk_id, entity_id FROM (
         |    SELECT chunk_id,
         |      'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS entity_id
         |    FROM gsd
         |    UNION ALL
         |    SELECT chunk_id,
         |      'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8)
         |    FROM gsd)),
         |rels AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS src,
         |    'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8) AS dst
         |  FROM gsm2),
         |deg AS MATERIALIZED (
         |  SELECT e AS entity_id, count(*) AS score FROM (
         |    SELECT src AS e FROM rels UNION ALL SELECT dst FROM rels)
         |  GROUP BY 1),
         |gcemb AS MATERIALIZED (
         |  SELECT chunk_id, ${emb("chunk_text")} AS emb
         |  FROM (SELECT DISTINCT chunk_id, chunk_text FROM gchunk2)),
         |seeds AS MATERIALIZED (
         |  SELECT DISTINCT chunk_id FROM (
         |    SELECT chunk_id FROM gchl ORDER BY chunk_id LIMIT 3)),
         |d0 AS MATERIALIZED (
         |  SELECT c.chunk_id, ${cosL(s"(${emb("c.chunk_text")})", "q.emb")} AS score,
         |    0 AS depth
         |  FROM gchunk2 c JOIN seeds USING (chunk_id), gqv q),
         |${expand("seeds", "seeds", 1)},
         |vis2 AS MATERIALIZED (SELECT chunk_id FROM seeds UNION ALL SELECT chunk_id FROM b1),
         |${expand("b1", "vis2", 2)},
         |vis3 AS MATERIALIZED (SELECT chunk_id FROM vis2 UNION ALL SELECT chunk_id FROM b2),
         |${expand("b2", "vis3", 3)}
         |SELECT chunk_id, round(score, 6) AS score, depth FROM (
         |  SELECT * FROM d0
         |  UNION ALL SELECT chunk_id, score, 1 FROM b1
         |  UNION ALL SELECT chunk_id, score, 2 FROM b2
         |  UNION ALL SELECT chunk_id, score, 3 FROM b3)
         |ORDER BY depth, round(score, 6) DESC, chunk_id""".stripMargin
    },

    // Statement beam (width 10 / depth 3, attention): fact-sharing +
    // prev-link neighbors capped 20/parent, attention-softmaxed per parent
    // batch with a sorted-fold denominator (= the engine's deterministic
    // fold), max over parents.
    "q_beam_statement" -> {
      def cosL(a: String, b: String) =
        s"""(list_sum(list_transform(range(1,65), i -> $a[i]*$b[i]))
           | / (sqrt(list_sum(list_transform(range(1,65), i -> $a[i]*$a[i])))
           |  * sqrt(list_sum(list_transform(range(1,65), i -> $b[i]*$b[i])))))""".stripMargin
      def expand(frontier: String, visited: String, d: Int) =
        s"""vf$d AS (
           |  SELECT pf.parent_id, s.statement_id
           |  FROM (SELECT a.statement_id AS parent_id, a.fact_id
           |        FROM gfs a JOIN $frontier f USING (statement_id)) pf
           |  JOIN gfs s USING (fact_id)
           |  WHERE s.statement_id <> pf.parent_id),
           |lk$d AS MATERIALIZED (
           |  SELECT f.statement_id AS parent_id, s.statement_id
           |  FROM gsd s JOIN $frontier f ON s.prev_statement_id = f.statement_id
           |  UNION ALL
           |  SELECT f.statement_id, s.prev_statement_id
           |  FROM gsd s JOIN $frontier f USING (statement_id)
           |  WHERE s.prev_statement_id IS NOT NULL),
           |cn$d AS MATERIALIZED (
           |  SELECT parent_id, statement_id FROM (
           |    SELECT DISTINCT parent_id, statement_id FROM (
           |      SELECT * FROM vf$d UNION ALL SELECT * FROM lk$d)
           |    QUALIFY row_number() OVER (PARTITION BY parent_id
           |      ORDER BY statement_id) <= 20)
           |  WHERE statement_id NOT IN (SELECT statement_id FROM $visited)),
           |pr$d AS MATERIALIZED (
           |  SELECT cn.parent_id, cn.statement_id,
           |    ${cosL("e.emb", "q.emb")} AS qc,
           |    list_sum(list_transform(range(1,65), i -> e.emb[i]*p.emb[i])) / 8.0
           |      AS logit
           |  FROM cn$d cn JOIN gsemb e USING (statement_id)
           |  JOIN gsemb p ON p.statement_id = cn.parent_id, gqv2 q),
           |at$d AS MATERIALIZED (
           |  SELECT *, exp(logit - max(logit)
           |    OVER (PARTITION BY parent_id)) AS ex FROM pr$d),
           |dn$d AS MATERIALIZED (
           |  SELECT parent_id,
           |    list_reduce(list_sort(list(ex)), (a, b) -> a + b) AS denom
           |  FROM at$d GROUP BY parent_id),
           |sc$d AS MATERIALIZED (
           |  SELECT statement_id, max(qc * (1.0 + ex / denom)) AS score
           |  FROM at$d JOIN dn$d USING (parent_id) GROUP BY statement_id),
           |b$d AS MATERIALIZED (
           |  SELECT statement_id, score FROM sc$d
           |  ORDER BY score DESC, statement_id LIMIT 10)""".stripMargin
      s"""WITH ${LexicalQueries.graphCte},
         |gfs AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'f:'||substr(md5(stoks[1]||'|'||'near'||'|'||stoks[len(stoks)]),1,8)
         |      AS fact_id,
         |    statement_id
         |  FROM gsm2),
         |gsemb AS MATERIALIZED (
         |  SELECT statement_id,
         |    list_transform(range(0, 64), i ->
         |      ('0x'||substr(md5(i::VARCHAR||'#'||stmt_text),1,15))::BIGINT
         |        / 1.152921504606847e18 * 2.0 - 1.0) AS emb
         |  FROM (SELECT DISTINCT statement_id, stmt_text FROM gsm2)),
         |gqv2 AS MATERIALIZED (SELECT list_transform(range(0, 64), i -> cos((i+1)::DOUBLE)) AS emb),
         |seeds AS MATERIALIZED (
         |  SELECT statement_id FROM gsd ORDER BY statement_id LIMIT 3),
         |d0 AS MATERIALIZED (
         |  SELECT s.statement_id, ${cosL("e.emb", "q.emb")} AS score, 0 AS depth
         |  FROM seeds s JOIN gsemb e USING (statement_id), gqv2 q),
         |${expand("seeds", "seeds", 1)},
         |vis2 AS MATERIALIZED (
         |  SELECT statement_id FROM seeds UNION ALL SELECT statement_id FROM b1),
         |${expand("b1", "vis2", 2)},
         |vis3 AS MATERIALIZED (
         |  SELECT statement_id FROM vis2 UNION ALL SELECT statement_id FROM b2),
         |${expand("b2", "vis3", 3)}
         |SELECT statement_id, round(score, 6) AS score, depth FROM (
         |  SELECT * FROM d0
         |  UNION ALL SELECT statement_id, score, 1 FROM b1
         |  UNION ALL SELECT statement_id, score, 2 FROM b2
         |  UNION ALL SELECT statement_id, score, 3 FROM b3)
         |ORDER BY depth, round(score, 6) DESC, statement_id""".stripMargin
    },

    // Entity context tree: 2 unrolled relation hops (src -> dst) from the 5
    // lexicographically-first entities, visited-excluded per layer, with
    // both-direction degree scores joined on the result.
    "q_entity_context" ->
      s"""WITH ${LexicalQueries.graphCte},
         |ents AS MATERIALIZED (
         |  SELECT DISTINCT 'e:'||substr(md5(v||'|'||'Token'||'|'||'t0'),1,8) AS entity_id
         |  FROM (SELECT stoks[1] AS v FROM gsm2
         |        UNION ALL SELECT stoks[len(stoks)] FROM gsm2)),
         |rels AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS src,
         |    'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8) AS dst
         |  FROM gsm2),
         |deg AS MATERIALIZED (
         |  SELECT e AS entity_id, count(*) AS score FROM (
         |    SELECT src AS e FROM rels UNION ALL SELECT dst FROM rels)
         |  GROUP BY 1),
         |seeds AS MATERIALIZED (SELECT entity_id FROM ents ORDER BY entity_id LIMIT 5),
         |l0 AS MATERIALIZED (SELECT entity_id, 0 AS depth FROM seeds),
         |l1 AS MATERIALIZED (
         |  SELECT DISTINCT dst AS entity_id, 1 AS depth
         |  FROM rels JOIN l0 ON rels.src = l0.entity_id
         |  WHERE dst NOT IN (SELECT entity_id FROM l0)),
         |l2 AS MATERIALIZED (
         |  SELECT DISTINCT dst AS entity_id, 2 AS depth
         |  FROM rels JOIN l1 ON rels.src = l1.entity_id
         |  WHERE dst NOT IN (SELECT entity_id FROM l0
         |                    UNION ALL SELECT entity_id FROM l1))
         |SELECT v.entity_id, v.depth, coalesce(d.score, 0) AS score
         |FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
         |      UNION ALL SELECT * FROM l2) v
         |LEFT JOIN deg d USING (entity_id)
         |ORDER BY depth, entity_id""".stripMargin)
}
