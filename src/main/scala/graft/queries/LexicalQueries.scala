package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Oracle gates for the indexing pipeline itself (SURVEY.md §2.12): the
 * DuckDB oracle replays the deterministic extraction grammar — normalize →
 * chunk windows → statement windows → subject/object entities — INCLUDING
 * the md5 id scheme (graft.model.Ids), against the engine's actual built
 * tables from [[Tables.lexicalGraph]]. A drift anywhere in the build DAG
 * (normalization, window arithmetic, id hashing, dedup) breaks the hash
 * match.
 *
 * Output columns are restricted to the id-determined ones (the builder's
 * dropDuplicates keeps an arbitrary row per id; columns like chunk_id that
 * vary across duplicate statement ids are excluded so results stay
 * deterministic).
 */
object LexicalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ext. GraphSAGE-style entity representations: mean of the entity's
    // supporting statements' embeddings (ops.GraphFeatures) — exact
    // micro-unit sums in one 64-slot hash aggregate, oracle-replayed
    // through the full graph grammar + md5 hash-embedding.
    "q_entity_embedding" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val edges = g.factSupports.join(g.facts, "fact_id")
        .select(explode(array(col("subject_entity_id"),
          col("object_entity_id"))).as("entity_id"), col("statement_id"))
        .distinct()
      graft.ops.GraphFeatures.neighborMeanEmbedding(edges, "entity_id",
          "statement_id", g.statements, "statement_id", "embedding", 64)
        .select(col("node").as("entity_id"), col("n_nbrs"), col("dim"),
          col("mean"))
        .orderBy(col("entity_id"), col("dim"))
    }),

    "q_lexical_statements" -> ((s, dir) => {
      Tables.lexicalGraph(s, dir).statements
        .select(col("statement_id"), col("topic_id"), col("value"))
        .orderBy(col("statement_id"), col("topic_id"), col("value"))
    }),

    "q_lexical_entities" -> ((s, dir) => {
      Tables.lexicalGraph(s, dir).entities
        .select(col("entity_id"), col("value"), col("search_str"),
          col("classification"))
        .orderBy(col("entity_id"))
    }),

    "q_lexical_relations" -> ((s, dir) => {
      Tables.lexicalGraph(s, dir).entityRelations
        .select(col("src_entity_id"), col("relation_value"), col("dst_entity_id"))
        .orderBy(col("src_entity_id"), col("dst_entity_id"))
    }),

    // §2.12 InferClassifications → builder wiring: entities built against
    // the inferred classification list hash-pick their class (md5-replayable
    // stand-in for the LLM choosing from the inferred list per extraction);
    // the classification participates in the entity id.
    "q_lexical_classified" -> ((s, dir) => {
      Tables.lexicalGraphClassified(s, dir).entities
        .select(col("entity_id"), col("value"), col("classification"))
        .orderBy(col("entity_id"))
    }),

    // §2.5 lexical graph summary: dominant class-level paths over the BUILT
    // classified graph — the __SYS_Class__ aggregation
    // (graph_summary.py:75-91) as one groupBy.
    "q_lexical_summary" -> ((s, dir) => {
      graft.retrieve.GraphSummary.classPaths(
        Tables.lexicalGraphClassified(s, dir), k = 100)
        .orderBy(desc("score"), col("path"))
    }),

    // §2.12 include_domain_labels (entity_graph_builder.py:115-127 +
    // graph_utils.py label_from): each classified entity's domain label
    // projected from its classification; local entities carry none. The
    // messy-input label grammar (punct/underscore collapse, capwords,
    // `__...__` passthrough) is spec-gated with adversarial fixtures in
    // GraphBuilderSpec; this oracle gates the graph wiring end-to-end.
    "q_domain_labels" -> ((s, dir) => {
      graft.index.DomainLabels.withDomainLabels(
        Tables.lexicalGraphClassified(s, dir).entities)
        .select(col("entity_id"), col("value"), col("classification"),
          col("label"))
        .orderBy(col("entity_id"))
    }),

    // §2.5 tenant-axis graph summary (graph_summary.py:83-138): per-tenant
    // dominant class paths over two coexisting tenants — t0 = full corpus,
    // t1 = the src0 subset — ranked per tenant by the TopKAgg heap.
    "q_tenant_summary" -> ((s, dir) => {
      graft.retrieve.GraphSummary.tenantClassPaths(
        Seq("t0" -> Tables.lexicalGraphClassified(s, dir),
            "t1" -> Tables.lexicalGraphClassifiedT1(s, dir)), k = 10)
        .orderBy(col("tenant_id"), col("rk"))
    }),

    // §2.4 keyword → entity lookup (entity_provider.py:30-110): exact
    // search_str match with optional `kw|Class` filter, fact-degree scores,
    // STARTS WITH fallback for unmatched keywords. 'join' and 'hash|Token'
    // hit exactly; 'fil' only as a prefix; 'row|Zzz' matches nothing.
    "q_keyword_entity" -> ((s, dir) => {
      graft.retrieve.EntityProvider.entitiesForKeywords(
        Tables.lexicalGraph(s, dir),
        Seq("join", "hash|Token", "fil", "row|Zzz"))
        .orderBy(col("keyword"), desc("score"), col("entity_id"))
    }),

    // §2.4 entity reranking (entity_utils.py:15-105): every graph entity's
    // "value (classification)" token tfidf-scored against query + keywords
    // at 4dp, all entities kept (unmatched at 0.0), ordered by
    // (reranking_score, degree score).
    "q_entity_rerank" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      graft.retrieve.EntityProvider.rerankEntities(
        graft.retrieve.EntityProvider.scoredEntities(g),
        "parquet files", Seq("spark", "join"))
        .select(col("entity_id"), col("value"), col("score"),
          col("reranking_score"))
    }),

    // §2.4 vector-seeded entity provider (entity_vss_provider.py:44-77):
    // entities mentioned under the picked topics, fact-degree-scored, top
    // 20. Topic seeds are deterministic (lexicographically-first) so the
    // whole statement→fact→entity→degree pipeline hash-replays; the
    // cosine top-k seeding path is gated separately (q_vector_topk).
    "q_entity_for_topics" -> ((s, dir) => {
      val g = Tables.lexicalGraph(s, dir)
      val seeds = g.topics.orderBy(col("topic_id")).limit(3)
        .select("topic_id")
      graft.retrieve.EntityVSSProvider.entitiesForTopics(g, seeds, limit = 20)
        .orderBy(desc("score"), col("entity_id"))
    }))

  /** Extended oracle prefix for graph-store replays (beam / context
    * expansion): chunk ids with prev/next links, topic→chunk mentions,
    * statement ids, the deterministic per-topic embedding (64-dim md5 hash
    * embedding of the lexicographically-first statement), and the
    * topic→entity projection — the full surface the traversal retrievers
    * probe, ids included (graft.model.Ids / LexicalGraphBuilder). */
  private[queries] val graphCte: String = {
    val norm = TextQueries.normSql("text")
    s"""gbase AS MATERIALIZED (
       |  SELECT doc_id, source, $norm AS nrm FROM documents),
       |gtok AS MATERIALIZED (
       |  SELECT
       |    'g::'||substr(md5(doc_id||'|'||source||'|'||'t0'),1,8)||':'||
       |      substr(md5('t0'||'|'||doc_id||'|'||source),1,4) AS source_id,
       |    string_split_regex(nrm,'\\s+') AS toks FROM gbase),
       |gch AS MATERIALIZED (
       |  SELECT source_id, toks,
       |    unnest(range(0, greatest(((len(toks)-1)//28)*28, 0)+1, 28)) AS cstart
       |  FROM gtok),
       |gchunk AS MATERIALIZED (
       |  SELECT source_id, cstart//28 AS cseq,
       |    array_to_string(list_slice(toks, cstart+1, cstart+32), ' ') AS chunk_text
       |  FROM gch),
       |gchunk2 AS MATERIALIZED (
       |  SELECT *,
       |    source_id||':'||substr(md5(source_id||'|'||chunk_text),1,8) AS chunk_id,
       |    string_split(chunk_text,' ') AS ctoks,
       |    't:'||substr(md5(lower(trim(string_split(chunk_text,' ')[1]))||'|'||'t0'),1,8) AS topic_id
       |  FROM gchunk WHERE length(chunk_text) > 0),
       |gchl AS MATERIALIZED (
       |  SELECT *,
       |    lag(chunk_id) OVER (PARTITION BY source_id ORDER BY cseq) AS prev_id,
       |    lead(chunk_id) OVER (PARTITION BY source_id ORDER BY cseq) AS next_id
       |  FROM gchunk2),
       |gtmi AS MATERIALIZED (SELECT DISTINCT topic_id, chunk_id FROM gchunk2),
       |gst AS MATERIALIZED (
       |  SELECT chunk_id, topic_id, ctoks,
       |    unnest(range(0, greatest(len(ctoks)-1, 0)+1, 8)) AS sstart
       |  FROM gchunk2),
       |gsm AS MATERIALIZED (
       |  SELECT chunk_id, topic_id, sstart//8 AS sseq,
       |    array_to_string(list_slice(ctoks, sstart+1, sstart+8), ' ') AS stmt_text
       |  FROM gst),
       |gsm2 AS MATERIALIZED (
       |  SELECT *, 's:'||substr(md5(topic_id||'|'||stmt_text),1,8) AS statement_id,
       |    string_split(stmt_text,' ') AS stoks
       |  FROM gsm WHERE length(stmt_text) > 0),
       |gsd AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT *, lag(statement_id) OVER (
       |      PARTITION BY chunk_id ORDER BY sseq) AS prev_statement_id
       |    FROM gsm2)
       |  QUALIFY row_number() OVER (
       |    PARTITION BY statement_id ORDER BY chunk_id, sseq) = 1),
       |gtemb AS MATERIALIZED (
       |  SELECT topic_id,
       |    list_transform(range(0, 64), i ->
       |      ('0x'||substr(md5(i::VARCHAR||'#'||stmt_text),1,15))::BIGINT
       |        / 1.152921504606847e18 * 2.0 - 1.0) AS emb
       |  FROM (SELECT DISTINCT topic_id, statement_id, stmt_text FROM gsm2)
       |  QUALIFY row_number() OVER (PARTITION BY topic_id ORDER BY statement_id) = 1),
       |gte AS MATERIALIZED (
       |  SELECT DISTINCT topic_id,
       |    'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS entity_id
       |  FROM gsm2),
       |gqv AS MATERIALIZED (SELECT list_transform(range(0, 64), i -> sin((i+1)::DOUBLE)) AS emb)"""
      .stripMargin
  }

  /** Shared oracle prefix: documents → chunk windows → statement windows,
    * with ids (tenant t0; chunk 32/stride 28, statement windows of 8 —
    * LexicalGraphBuilder constants). */
  private val stmtCte: String = {
    val norm = TextQueries.normSql("text")
    s"""base AS (
       |  SELECT doc_id, source, $norm AS nrm FROM documents),
       |tok AS (
       |  SELECT doc_id, source, string_split_regex(nrm,'\\s+') AS toks FROM base),
       |ch AS (
       |  SELECT doc_id, source, toks,
       |    unnest(range(0, greatest(((len(toks)-1)//28)*28, 0)+1, 28)) AS cstart
       |  FROM tok),
       |chunks AS (
       |  SELECT doc_id, source,
       |    array_to_string(list_slice(toks, cstart+1, cstart+32), ' ') AS chunk_text
       |  FROM ch),
       |chunks2 AS (
       |  SELECT *, string_split(chunk_text, ' ') AS ctoks,
       |    't:'||substr(md5(lower(trim(string_split(chunk_text,' ')[1]))||'|'||'t0'),1,8) AS topic_id
       |  FROM chunks WHERE length(chunk_text) > 0),
       |st AS (
       |  SELECT *, unnest(range(0, greatest(len(ctoks)-1, 0)+1, 8)) AS sstart
       |  FROM chunks2),
       |stmts AS (
       |  SELECT source, topic_id,
       |    array_to_string(list_slice(ctoks, sstart+1, sstart+8), ' ') AS stmt_text
       |  FROM st),
       |stmts2 AS (
       |  SELECT source, topic_id, stmt_text,
       |    's:'||substr(md5(topic_id||'|'||stmt_text),1,8) AS statement_id,
       |    string_split(stmt_text, ' ') AS stoks
       |  FROM stmts WHERE length(stmt_text) > 0)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Entity-embedding replay: the statement hash-embedding (gtemb form),
    // subject/object entity edges, then per-(entity, dim) exact micro-unit
    // sums — same quantize-before-aggregate discipline as the engine.
    // Edges come from ALL statement occurrences (gsm2, the factRaw side)
    // but the embedding per statement_id must be the builder's dedup
    // WINNER (gsd: first by chunk_id, seq) — on an id hash collision the
    // two texts share one id, and a DISTINCT (id, text) pick here would
    // double-join where the engine stores a single winning embedding
    // (caught at sf0.1, where ~38k statements make a 32-bit collision
    // likely).
    "q_entity_embedding" ->
      s"""WITH $graphCte,
         |semb AS (
         |  SELECT statement_id, list_transform(range(0, 64), i ->
         |    ('0x'||substr(md5(i::VARCHAR||'#'||stmt_text),1,15))::BIGINT
         |      / 1.152921504606847e18 * 2.0 - 1.0) AS emb
         |  FROM gsd),
         |ent AS (
         |  SELECT DISTINCT entity_id, statement_id FROM (
         |    SELECT 'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8)
         |      AS entity_id, statement_id FROM gsm2
         |    UNION ALL
         |    SELECT 'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8),
         |      statement_id FROM gsm2)),
         |gdim AS (SELECT unnest(range(0, 64)) AS dim),
         |sums AS (
         |  SELECT e.entity_id, d.dim, CAST(count(*) AS BIGINT) AS n_nbrs,
         |    sum(CAST(floor(s.emb[d.dim+1]*1000000 + 0.5) AS BIGINT)) AS ssum
         |  FROM ent e JOIN semb s USING (statement_id) CROSS JOIN gdim d
         |  GROUP BY e.entity_id, d.dim)
         |SELECT entity_id, n_nbrs, CAST(dim AS INT) AS dim,
         |  CAST(floor(CAST(ssum AS DOUBLE)/n_nbrs + 0.5) AS BIGINT)
         |    / 1000000.0 AS mean
         |FROM sums ORDER BY entity_id, dim""".stripMargin,

    "q_lexical_statements" ->
      s"""WITH $stmtCte
         |SELECT DISTINCT statement_id, topic_id, stmt_text AS value
         |FROM stmts2
         |ORDER BY statement_id, topic_id, value""".stripMargin,

    "q_lexical_entities" ->
      s"""WITH $stmtCte,
         |vals AS (
         |  SELECT stoks[1] AS value FROM stmts2
         |  UNION ALL
         |  SELECT stoks[len(stoks)] FROM stmts2)
         |SELECT DISTINCT
         |  'e:'||substr(md5(value||'|'||'Token'||'|'||'t0'),1,8) AS entity_id,
         |  value, value AS search_str, 'Token' AS classification
         |FROM vals ORDER BY entity_id""".stripMargin,

    "q_lexical_relations" ->
      s"""WITH $stmtCte
         |SELECT DISTINCT
         |  'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS src_entity_id,
         |  'NEAR' AS relation_value,
         |  'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8) AS dst_entity_id
         |FROM stmts2
         |ORDER BY src_entity_id, dst_entity_id""".stripMargin,

    "q_lexical_classified" -> {
      val clsList = Tables.InferredClassifications
        .map(c => s"'$c'").mkString("[", ",", "]")
      def clsSql(v: String) =
        s"list_extract($clsList, CAST(${TextQueries.h60Sql(v)} % ${Tables.InferredClassifications.size} AS INT) + 1)"
      s"""WITH $stmtCte,
         |vals AS (
         |  SELECT stoks[1] AS value FROM stmts2
         |  UNION ALL
         |  SELECT stoks[len(stoks)] FROM stmts2),
         |cl AS (
         |  SELECT DISTINCT value, ${clsSql("value")} AS classification FROM vals)
         |SELECT 'e:'||substr(md5(value||'|'||classification||'|'||'t0'),1,8) AS entity_id,
         |  value, classification
         |FROM cl ORDER BY entity_id""".stripMargin
    },

    "q_lexical_summary" -> {
      val clsList = Tables.InferredClassifications
        .map(c => s"'$c'").mkString("[", ",", "]")
      def clsSql(v: String) =
        s"list_extract($clsList, CAST(${TextQueries.h60Sql(v)} % ${Tables.InferredClassifications.size} AS INT) + 1)"
      s"""WITH $stmtCte,
         |rel AS (
         |  SELECT DISTINCT stoks[1] AS sv, stoks[len(stoks)] AS ov FROM stmts2),
         |cp AS (
         |  SELECT ${clsSql("sv")} AS sc, ${clsSql("ov")} AS dc,
         |    count(*) AS score
         |  FROM rel GROUP BY 1, 2)
         |SELECT '('||sc||')-[NEAR]->('||dc||')' AS path, score
         |FROM cp ORDER BY score DESC, path LIMIT 100""".stripMargin
    },

    "q_domain_labels" -> {
      val clsList = Tables.InferredClassifications
        .map(c => s"'$c'").mkString("[", ",", "]")
      def clsSql(v: String) =
        s"list_extract($clsList, CAST(${TextQueries.h60Sql(v)} % ${Tables.InferredClassifications.size} AS INT) + 1)"
      // label_from replicated: punct/underscore collapse, capwords, join
      val labelSql =
        """CASE WHEN starts_with(classification,'__') AND ends_with(classification,'__')
          |  THEN classification
          |  ELSE array_to_string(list_transform(
          |    list_filter(string_split_regex(trim(regexp_replace(
          |      classification, '([^\s\w]|_)+', ' ', 'g')), '\s+'),
          |      w -> length(w) > 0),
          |    w -> upper(substr(w,1,1))||lower(substr(w,2))), '')
          |END""".stripMargin
      s"""WITH $stmtCte,
         |vals AS (
         |  SELECT stoks[1] AS value FROM stmts2
         |  UNION ALL
         |  SELECT stoks[len(stoks)] FROM stmts2),
         |cl AS (
         |  SELECT DISTINCT value, ${clsSql("value")} AS classification FROM vals)
         |SELECT 'e:'||substr(md5(value||'|'||classification||'|'||'t0'),1,8) AS entity_id,
         |  value, classification, $labelSql AS label
         |FROM cl WHERE classification <> '__Local_Entity__'
         |ORDER BY entity_id""".stripMargin
    },

    "q_tenant_summary" -> {
      val clsList = Tables.InferredClassifications
        .map(c => s"'$c'").mkString("[", ",", "]")
      def clsSql(v: String) =
        s"list_extract($clsList, CAST(${TextQueries.h60Sql(v)} % ${Tables.InferredClassifications.size} AS INT) + 1)"
      s"""WITH $stmtCte,
         |relall AS (
         |  SELECT DISTINCT sv, ov FROM (
         |    SELECT stoks[1] AS sv, stoks[len(stoks)] AS ov FROM stmts2)),
         |rel1 AS (
         |  SELECT DISTINCT stoks[1] AS sv, stoks[len(stoks)] AS ov
         |  FROM stmts2 WHERE source = 'src0'),
         |cp AS (
         |  SELECT 't0' AS tenant_id, ${clsSql("sv")} AS sc, ${clsSql("ov")} AS dc,
         |    count(*) AS score
         |  FROM relall GROUP BY 2, 3
         |  UNION ALL
         |  SELECT 't1', ${clsSql("sv")}, ${clsSql("ov")}, count(*)
         |  FROM rel1 GROUP BY 2, 3),
         |p AS (
         |  SELECT tenant_id, '('||sc||')-[NEAR]->('||dc||')' AS path, score
         |  FROM cp)
         |SELECT tenant_id, path, score, CAST(rk AS INT) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY tenant_id ORDER BY score DESC, path) AS rk
         |  FROM p) WHERE rk <= 10
         |ORDER BY tenant_id, rk""".stripMargin
    },

    "q_keyword_entity" ->
      s"""WITH $stmtCte,
         |facts AS (
         |  SELECT DISTINCT stoks[1] AS subj, stoks[len(stoks)] AS obj FROM stmts2),
         |ents AS (
         |  SELECT stoks[1] AS value FROM stmts2
         |  UNION
         |  SELECT stoks[len(stoks)] FROM stmts2),
         |degree AS (
         |  SELECT e AS value, count(*) AS score FROM (
         |    SELECT subj AS e FROM facts UNION ALL SELECT obj FROM facts)
         |  GROUP BY e),
         |scored AS (
         |  SELECT 'e:'||substr(md5(value||'|'||'Token'||'|'||'t0'),1,8) AS entity_id,
         |    value, value AS search_str, 'Token' AS classification, score
         |  FROM ents JOIN degree USING (value)),
         |kws(keyword, kw_norm, kw_class) AS (VALUES
         |  ('join','join',NULL), ('hash|Token','hash','Token'),
         |  ('fil','fil',NULL), ('row|Zzz','row','Zzz')),
         |exact AS (
         |  SELECT k.keyword, s.entity_id, s.value, s.classification, s.score
         |  FROM kws k JOIN scored s ON s.search_str = k.kw_norm
         |  AND (CASE WHEN k.kw_class IS NOT NULL THEN s.classification = k.kw_class
         |       ELSE s.classification <> '__Local_Entity__' END)),
         |unmatched AS (
         |  SELECT * FROM kws WHERE keyword NOT IN (SELECT keyword FROM exact)),
         |prefix AS (
         |  SELECT k.keyword, s.entity_id, s.value, s.classification, s.score
         |  FROM unmatched k JOIN scored s ON starts_with(s.search_str, k.kw_norm)
         |  AND (CASE WHEN k.kw_class IS NOT NULL THEN starts_with(s.classification, k.kw_class)
         |       ELSE s.classification <> '__Local_Entity__' END))
         |SELECT keyword, entity_id, value, classification, score,
         |  'exact' AS matched FROM exact
         |UNION ALL
         |SELECT keyword, entity_id, value, classification, score, 'prefix'
         |FROM prefix
         |ORDER BY keyword, score DESC, entity_id""".stripMargin,

    "q_entity_rerank" ->
      s"""WITH $stmtCte,
         |facts AS (
         |  SELECT DISTINCT stoks[1] AS subj, stoks[len(stoks)] AS obj FROM stmts2),
         |ents AS (
         |  SELECT stoks[1] AS value FROM stmts2
         |  UNION
         |  SELECT stoks[len(stoks)] FROM stmts2),
         |degree AS (
         |  SELECT e AS value, count(*) AS score FROM (
         |    SELECT subj AS e FROM facts UNION ALL SELECT obj FROM facts)
         |  GROUP BY e),
         |scored AS (
         |  SELECT 'e:'||substr(md5(value||'|'||'Token'||'|'||'t0'),1,8) AS entity_id,
         |    value, score
         |  FROM ents JOIN degree USING (value)),
         |toks AS (
         |  SELECT *, string_split_regex(lower(value)||' token', '[^a-z0-9]+') AS toks
         |  FROM scored),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
         |terms(term) AS (VALUES ('parquet'), ('files'), ('spark'), ('join')),
         |tf AS (
         |  SELECT entity_id, term, len(list_filter(toks, t -> t = term)) AS tf
         |  FROM toks, terms),
         |dfc AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
         |ts AS (
         |  SELECT entity_id, round(sum(tf * ln(nn.n / dfc.df)), 4) AS rr
         |  FROM tf JOIN dfc USING (term), nn WHERE tf > 0 GROUP BY entity_id)
         |SELECT s.entity_id, s.value, s.score,
         |  coalesce(ts.rr, 0.0) AS reranking_score
         |FROM scored s LEFT JOIN ts USING (entity_id)
         |ORDER BY reranking_score DESC, s.score DESC, s.entity_id""".stripMargin,

    // Vector-seeded entity provider: seeds -> statements -> facts ->
    // mentioned entities, degree scored over the GLOBAL deduped fact table
    // (scoredEntities counts one row per fact_id), top 20.
    "q_entity_for_topics" ->
      s"""WITH $graphCte,
         |seeds AS MATERIALIZED (
         |  SELECT topic_id FROM (SELECT DISTINCT topic_id FROM gchunk2)
         |  ORDER BY topic_id LIMIT 3),
         |fstmt AS MATERIALIZED (
         |  SELECT DISTINCT statement_id FROM gsm2 JOIN seeds USING (topic_id)),
         |allf AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'f:'||substr(md5(stoks[1]||'|'||'near'||'|'||stoks[len(stoks)]),1,8) AS fact_id,
         |    'e:'||substr(md5(stoks[1]||'|'||'Token'||'|'||'t0'),1,8) AS subj_eid,
         |    'e:'||substr(md5(stoks[len(stoks)]||'|'||'Token'||'|'||'t0'),1,8) AS obj_eid
         |  FROM gsm2),
         |fsel AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'f:'||substr(md5(stoks[1]||'|'||'near'||'|'||stoks[len(stoks)]),1,8) AS fact_id
         |  FROM gsm2 WHERE statement_id IN (SELECT statement_id FROM fstmt)),
         |ment AS MATERIALIZED (
         |  SELECT DISTINCT e AS entity_id FROM (
         |    SELECT subj_eid AS e FROM allf JOIN fsel USING (fact_id)
         |    UNION ALL
         |    SELECT obj_eid FROM allf JOIN fsel USING (fact_id))),
         |deg AS MATERIALIZED (
         |  SELECT e AS entity_id, count(*) AS score FROM (
         |    SELECT subj_eid AS e FROM allf UNION ALL SELECT obj_eid FROM allf)
         |  GROUP BY 1),
         |ev AS MATERIALIZED (
         |  SELECT DISTINCT
         |    'e:'||substr(md5(v||'|'||'Token'||'|'||'t0'),1,8) AS entity_id,
         |    v AS value
         |  FROM (SELECT stoks[1] AS v FROM gsm2
         |        UNION ALL SELECT stoks[len(stoks)] FROM gsm2))
         |SELECT m.entity_id, ev.value, 'Token' AS classification, d.score
         |FROM ment m
         |JOIN deg d USING (entity_id)
         |JOIN ev USING (entity_id)
         |ORDER BY d.score DESC, m.entity_id LIMIT 20""".stripMargin)
}
