package graft.byokg

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dialect sweep over EVERY cypher string the reference ships in its
  * retrieval tier (everything under `lexical-graph/.../retrieval/`, plus the
  * lexical_graph_index stats queries and the byokg Neptune store
  * client) — the measured contract for "which reference query texts
  * compile, and what the refusal message is for the rest".
  *
  * Each entry carries the reference file:line and the query text
  * adapted ONLY in store naming, per the conventions the flagship
  * statements_cypher gate established (CypherStagesSpec):
  *
  *  - backtick labels map to the store's prefix labels
  *    (`__Entity__`→E, `__Topic__`→T, `__Chunk__`→K, `__Statement__`→L,
  *    `__Fact__`→F, `__Source__`→S, `__SYS_Class__`→C,
  *    `__SYS_Tenant__`→Y); edge labels lowercase similarly
  *    (`__BELONGS_TO__`→belongs_to, ...);
  *  - `{graph_store.node_id("x.yId")}` placeholders → `x.id` (the
  *    store's one node identity), `{node_id("yId")}: $p` → `id: $p`;
  *  - `{node_result('v', node_id, properties=[...])}` →
  *    `v: v{.id, .value, .class}` / `v{.id, .*}` — the helper's map
  *    projection output (graph_utils.py:121-157), which the dialect
  *    supports natively;
  *  - driver-interpolated constants (`{int(self.max_entity_neighbors)}`,
  *    timestamp bounds) → literals; `$params` bind through
  *    substituteParams like the reference binds properties.
  *
  * The sweep runs each text against a fixture graph shaped like the
  * reference's lexical model and records compiles(rows)/refuses(msg).
  * CYPHER_COVERAGE.md is generated from this table
  * (tools.CypherCoverageGen) and CypherCoverageSpec replays it, so a
  * dialect regression fails by name.
  *
  * The indexing/build tier (the graph-builder modules under
  * `indexing/build/`) is MERGE/SET mutation text by construction — the read-only executor
  * refuses the whole family by design (GraphQuerySafety), and the
  * engine implements those writes as the GraphConstruction sink
  * (index/LexicalGraphBuilder.scala). It is recorded as one footnote
  * row, not per-string entries.
  */
object CypherCoverage {

  final case class Entry(id: String, source: String, cypher: String,
                         params: Map[String, Any],
                         expectCompiles: Boolean,
                         note: String = "")

  final case class Outcome(entry: Entry, result: Either[String, Long])

  /** Fixture graph in the reference's lexical shape (entities with
    * relation edges into subject/object facts supporting statements,
    * statements in topics/chunks, chunks from sources, previous/next
    * links) — small enough to read, rich enough that every `compiles`
    * entry also EXECUTES. Edges carry one extra property column
    * (`weight`) so `properties(e)` has something to project. */
  def fixture(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val edges = Seq(
      ("E:1", "F:1", "subject", 1L), ("E:2", "F:1", "object", 1L),
      ("E:2", "F:2", "subject", 2L), ("E:1", "F:2", "object", 2L),
      ("E:3", "F:2", "object", 1L),
      ("F:1", "L:1", "supports", 1L), ("F:2", "L:2", "supports", 1L),
      ("L:1", "T:1", "belongs_to", 1L), ("L:2", "T:1", "belongs_to", 1L),
      ("L:1", "K:1", "mentioned_in", 1L),
      ("L:2", "K:2", "mentioned_in", 1L),
      ("T:1", "K:1", "mentioned_in", 1L),
      ("T:1", "K:2", "mentioned_in", 1L),
      ("L:2", "T:1", "mentioned_in", 1L),
      ("F:2", "L:0", "supports", 1L),
      ("K:1", "S:1", "extracted_from", 1L),
      ("K:2", "S:1", "extracted_from", 1L),
      ("E:1", "E:2", "relation", 3L), ("E:2", "E:3", "relation", 1L),
      ("L:1", "L:0", "previous", 1L),
      ("K:1", "K:2", "next", 1L),
      ("Y:1", "Y:1", "self", 0L))
      .toDF("src", "dst", "label", "weight")
    val nullL: Option[Long] = None
    val props = Seq(
      ("E:1", "alice corp", Some("Org"), Some("alice"), None,
        Some(5L), None, nullL, nullL, nullL, nullL, None),
      ("E:2", "bob", Some("Person"), Some("bob"), None,
        Some(3L), None, nullL, nullL, nullL, nullL, None),
      ("E:3", "loc", Some("__Local_Entity__"), Some("loc"), None,
        Some(1L), None, nullL, nullL, nullL, nullL, None),
      ("T:1", "topic one", Some("topic"), None, None,
        nullL.map(identity), None, nullL, nullL, nullL, nullL, None),
      ("K:1", "chunk text one", Some("chunk"), None, None,
        None, None, nullL, nullL, nullL, nullL, None),
      ("K:2", "chunk text two", Some("chunk"), None, None,
        None, None, nullL, nullL, nullL, nullL, None),
      ("L:0", "stmt zero", Some("statement"), None, Some("d0"),
        None, None, nullL, nullL, nullL, nullL, None),
      ("L:1", "stmt one", Some("statement"), None, Some("d1"),
        None, None, nullL, nullL, nullL, nullL, None),
      ("L:2", "stmt two", Some("statement"), None, Some("d2"),
        None, None, nullL, nullL, nullL, nullL, None),
      ("F:1", "fact one", Some("fact"), None, None,
        None, None, nullL, nullL, nullL, nullL, None),
      ("F:2", "fact two", Some("fact"), None, None,
        None, None, nullL, nullL, nullL, nullL, None),
      ("S:1", "source one", Some("source"), None, None,
        None, None, Some(100L), nullL, Some(50L), nullL,
        Some("doc_id;source")),
      ("C:1", "Org", Some("class"), None, None,
        Some(5L), None, nullL, nullL, nullL, nullL, None),
      ("Y:1", "tenant summary", Some("tenant"), None, None,
        None, Some("2026-01-01"), nullL, nullL, nullL, nullL, None))
      .toDF("id", "value", "class", "search_str", "details", "count",
        "last_updated_datetime", "valid_from", "valid_to",
        "extract_timestamp", "build_timestamp", "id_fields")
    (edges, props)
  }

  private def ids(xs: String*): Seq[String] = xs

  val entries: Seq[Entry] = Seq(
    Entry("gs_entity_counts", "retrieval/summary/graph_summary.py:67",
      """MATCH (n:E)-[r:subject]->()
        |WITH n, count(r) AS score ORDER BY score DESC LIMIT 100
        |RETURN n.value + ' [' + n.class + ']' as entity""".stripMargin,
      Map.empty, expectCompiles = true,
      "string + concatenation; single-WITH stage tail"),
    Entry("gs_class_paths", "retrieval/summary/graph_summary.py:83",
      """MATCH (n:C)
        |WITH n, n.count AS score ORDER BY score DESC LIMIT 10
        |MATCH p=(n)-[r]->()
        |WITH nodes(p) AS nodes, relationships(p) AS rels, r.count AS score ORDER BY score DESC LIMIT 100
        |RETURN '(' + nodes[0].value + ')-[' + rels[0].value + ']->(' + nodes[1].value + ')' AS path""".stripMargin,
      Map.empty, expectCompiles = false,
      "path binding mid-pipeline + relationships() + list indexing; " +
        "implemented natively by GraphSummary (q_graph_summary)"),
    Entry("gs_tenant", "retrieval/summary/graph_summary.py:103",
      """MATCH (n:Y)
        |WHERE n.id = $tenantId
        |RETURN n.value AS summary, n.last_updated_datetime AS last_updated_datetime""".stripMargin,
      Map("tenantId" -> "Y:1"), expectCompiles = true),
    Entry("gs_tenant_merge", "retrieval/summary/graph_summary.py:136",
      """MERGE (n:Y {id: $tenantId})
        |ON CREATE SET n.value = $summary
        |ON MATCH SET n.value = $summary""".stripMargin,
      Map("tenantId" -> "Y:1", "summary" -> "x"), expectCompiles = false,
      "mutation — read-only executor refuses by design; writes are the " +
        "GraphSummary builder sink"),
    Entry("ecp_tree", "retrieval/query_context/entity_context_provider.py:51",
      """// get next level in tree
        |MATCH (entity:E)-[:relation]->(other)
        |      -[r:subject|object]->()
        |WHERE entity.id IN $entityIds
        |AND NOT other.id IN $excludeEntityIds
        |AND other.class <> '__Local_Entity__'
        |WITH entity, other, count(r) AS score ORDER BY score DESC
        |WITH entity, collect(DISTINCT other.id)[0..$numNeighbours] AS others
        |RETURN {
        |entity: entity{.id, .value, .class},
        |others: others
        |} AS result""".stripMargin,
      Map("entityIds" -> ids("E:1"), "excludeEntityIds" -> ids("E:9"),
        "numNeighbours" -> 10), expectCompiles = true,
      "collect slice [0..n]; node_result map projection"),
    Entry("ecp_expand",
      "retrieval/query_context/entity_context_provider.py:126",
      """// expand entities: score entities by number of relations
        |MATCH (entity:E)-[r:subject|object]->()
        |WHERE entity.id IN $entityIds
        |WITH entity, count(r) AS score
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("entityIds" -> ids("E:1", "E:2")), expectCompiles = true),
    Entry("efts_topic",
      "retrieval/query_context/entity_from_top_statement_provider.py:39",
      """// Get statements for top chunk
        |MATCH (t:T)<-[:mentioned_in]-(s:L)
        |WHERE t.id in $nodeIds
        |RETURN {
        |statement: s.value,
        |statementId: id(s)
        |} AS result""".stripMargin,
      Map("nodeIds" -> ids("T:1")), expectCompiles = true, "id(v)"),
    Entry("efts_chunk",
      "retrieval/query_context/entity_from_top_statement_provider.py:51",
      """// Get statements for top chunk
        |MATCH (c:K)<-[:mentioned_in]-(s:L)
        |WHERE c.id in $nodeIds
        |RETURN {
        |statement: s.value,
        |statementId: id(s)
        |} AS result""".stripMargin,
      Map("nodeIds" -> ids("K:1")), expectCompiles = true),
    Entry("efts_entities",
      "retrieval/query_context/entity_from_top_statement_provider.py:87",
      """// Get entities for statement
        |MATCH (s)<-[:supports]-(f)<-[:subject|object]-(entity)
        |WHERE s.id in $statementIds
        |AND entity.class <> '__Local_Entity__'
        |WITH DISTINCT entity
        |OPTIONAL MATCH (entity)-[r:subject|object]->()
        |WITH entity, count(r) AS score ORDER BY score DESC
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("statementIds" -> ids("L:1")), expectCompiles = true,
      "OPTIONAL MATCH mid-pipeline (left join back on the shared " +
        "variable; count(r) over unmatched rows is 0)"),
    Entry("ep_exact_class", "retrieval/query_context/entity_provider.py:30",
      """// get entities for keywords
        |MATCH (entity:E)-[r:subject|object]->()
        |WHERE entity.search_str = $keyword and entity.class = $classification
        |WITH entity, count(r) AS score ORDER BY score DESC
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("keyword" -> "alice", "classification" -> "Org"),
      expectCompiles = true),
    Entry("ep_exact", "retrieval/query_context/entity_provider.py:45",
      """// get entities for keywords
        |MATCH (entity:E)-[r:subject|object]->()
        |WHERE entity.search_str = $keyword
        |AND entity.class <> '__Local_Entity__'
        |WITH entity, count(r) AS score ORDER BY score DESC
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("keyword" -> "bob"), expectCompiles = true),
    Entry("ep_prefix_class", "retrieval/query_context/entity_provider.py:71",
      """// get entities for keywords
        |MATCH (entity:E)-[r:subject|object]->()
        |WHERE entity.search_str STARTS WITH $keyword and entity.class STARTS WITH $classification
        |WITH entity, count(r) AS score ORDER BY score DESC
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("keyword" -> "ali", "classification" -> "Or"),
      expectCompiles = true),
    Entry("ep_prefix", "retrieval/query_context/entity_provider.py:86",
      """// get entities for keywords
        |MATCH (entity:E)-[r:subject|object]->()
        |WHERE entity.search_str STARTS WITH $keyword
        |AND entity.class <> '__Local_Entity__'
        |WITH entity, count(r) AS score ORDER BY score DESC
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("keyword" -> "bo"), expectCompiles = true),
    Entry("evp_topics", "retrieval/query_context/entity_vss_provider.py:46",
      """// get entities for topic ids
        |MATCH (t:T)<-[:belongs_to]-(:L)
        |<-[:supports]-()<-[:subject|object]-(entity)
        |WHERE t.id in $nodeIds
        |AND entity.class <> '__Local_Entity__'
        |WITH DISTINCT entity
        |MATCH (entity)-[r:subject|object]->()
        |WITH entity, count(r) AS score ORDER BY score DESC LIMIT $limit
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("nodeIds" -> ids("T:1"), "limit" -> 10),
      expectCompiles = true,
      "MATCH between WITH stages (piped pattern expansion)"),
    Entry("evp_chunks", "retrieval/query_context/entity_vss_provider.py:61",
      """// get entities for chunk ids
        |MATCH (c:K)<-[:mentioned_in]-(:L)
        |<-[:supports]-()<-[:subject|object]-(entity)
        |WHERE c.id in $nodeIds
        |AND entity.class <> '__Local_Entity__'
        |WITH DISTINCT entity
        |MATCH (entity)-[r:subject|object]->()
        |WITH entity, count(r) AS score ORDER BY score DESC LIMIT $limit
        |RETURN {
        |entity: entity{.id, .value, .class},
        |score: score
        |} AS result""".stripMargin,
      Map("nodeIds" -> ids("K:1"), "limit" -> 10),
      expectCompiles = true,
      "MATCH between WITH stages; as evp_topics"),
    Entry("kvp_chunk", "retrieval/query_context/keyword_vss_provider.py:77",
      """// get chunk content
        |MATCH (c:K)
        |WHERE c.id in $nodeIds
        |RETURN c.value AS content""".stripMargin,
      Map("nodeIds" -> ids("K:1", "K:2")), expectCompiles = true),
    Entry("kvp_topic", "retrieval/query_context/keyword_vss_provider.py:106",
      """// get topic content
        |MATCH (t:T)<-[:belongs_to]-(s)<-[r:supports]-()
        |WHERE t.id = $topicId
        |WITH s, count(r) AS score ORDER BY score DESC
        |RETURN s.value AS statement, s.details AS details LIMIT $statementLimit""".stripMargin,
      Map("topicId" -> "T:1", "statementLimit" -> 10),
      expectCompiles = true),
    Entry("cbs", "retrieval/retrievers/chunk_based_search.py:88",
      """// chunk-based graph search
        |MATCH (l)-[:belongs_to]->()-[:mentioned_in]->(c:K)
        |WHERE c.id = $chunkId
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("chunkId" -> "K:1", "statementLimit" -> 10),
      expectCompiles = true, "anonymous node"),
    Entry("cbss", "retrieval/retrievers/chunk_based_semantic_search.py:97",
      """// chunk-based semantic graph search
        |MATCH (l)-[:belongs_to]->()-[:mentioned_in]->(c:K)
        |WHERE c.id = $chunkId
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("chunkId" -> "K:1", "statementLimit" -> 10),
      expectCompiles = true),
    Entry("ebs_multi", "retrieval/retrievers/entity_based_search.py:150",
      """// multiple entity-based graph search
        |MATCH p=(e1:E {id: $startId})-[:relation*1..2]-(e2:E)
        |WHERE e2.id in $endIds
        |UNWIND nodes(p) AS n
        |WITH DISTINCT COLLECT(n) AS entities
        |MATCH (s)-[:subject]->(f)<-[:object]-(o),
        |      (f)-[:supports]->()-[:previous*0..1]-(l)
        |WHERE s in entities and o in entities
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("startId" -> "E:1", "endIds" -> ids("E:2"),
        "statementLimit" -> 50),
      expectCompiles = true,
      "path binding + nodes(p) + collected-list membership (CypherPaths)"),
    Entry("ebs_single", "retrieval/retrievers/entity_based_search.py:191",
      """// single entity-based graph search
        |MATCH (:E {id: $startId})
        |    -[:subject]->()
        |    -[:supports]->()
        |    -[:previous*0..1]-(l)
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("startId" -> "E:1", "statementLimit" -> 50),
      expectCompiles = true,
      "anonymous anchor with property map; undirected *0..1"),
    Entry("ens_topic", "retrieval/retrievers/entity_network_search.py:65",
      """// topic-based entity network search
        |MATCH (l)-[:belongs_to]->(t:T)
        |WHERE t.id = $nodeId
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("nodeId" -> "T:1", "statementLimit" -> 10),
      expectCompiles = true),
    Entry("ens_chunk", "retrieval/retrievers/entity_network_search.py:71",
      """// chunk-based entity network search
        |MATCH (l)-[:belongs_to]->()-[:mentioned_in]->(c:K)
        |WHERE c.id = $nodeId
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("nodeId" -> "K:1", "statementLimit" -> 10),
      expectCompiles = true),
    Entry("scbs_top_entities",
      "retrieval/retrievers/semantic_chunk_beam_search.py:42",
      """// get top entities for chunk (semantic beam search)
        |MATCH (e)-[:subject|object]->()-[:supports]->(st)-[:mentioned_in]->(c)
        |WHERE c.id = $chunkId
        |WITH DISTINCT e AS entity
        |MATCH (entity)-[r:subject|object]->()
        |RETURN entity.id AS entityId, count(r) AS score ORDER BY score DESC LIMIT $limit""".stripMargin,
      Map("chunkId" -> "K:1", "limit" -> 10), expectCompiles = true,
      "WITH DISTINCT + MATCH tail (pipe stage2)"),
    Entry("scbs_neighbors",
      "retrieval/retrievers/semantic_chunk_beam_search.py:54",
      """// get neighboring chunks for common entities (semantic beam search)
        |MATCH (entity)-[:subject|object]->()-[:supports]->(st)-[:mentioned_in]->(e_neighbors)
        |WHERE entity.id IN $entityIds
        |AND e_neighbors.id <> $chunkId
        |WITH DISTINCT e_neighbors AS neighbors, entity
        |RETURN neighbors.id as chunkId, count(entity) ORDER BY count(entity) DESC LIMIT $limit""".stripMargin,
      Map("entityIds" -> ids("E:1", "E:2"), "chunkId" -> "K:9",
        "limit" -> 10), expectCompiles = true,
      "unaliased count(entity) output column"),
    Entry("tbs", "retrieval/retrievers/topic_based_search.py:98",
      """// topic-based graph search
        |MATCH (f)-[:supports]->()-[:belongs_to]->(tt:T)
        |WHERE tt.id = $topicId
        |WITH f LIMIT $statementLimit
        |MATCH (f)-[:supports]->(l)
        |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin,
      Map("topicId" -> "T:1", "statementLimit" -> 10),
      expectCompiles = true, "WITH + LIMIT before a MATCH tail"),
    Entry("tbs_beam_expand",
      "retrieval/retrievers/topic_beam_search.py:183-229",
      """MATCH (t:T)
        |WHERE t.id IN $topicIds
        |OPTIONAL MATCH (t)<-[:belongs_to]-(s:L)<-[:supports]-(f:F)<-[:subject|object]-(e:E)
        |WITH t, COLLECT(DISTINCT e) AS entities
        |UNWIND CASE WHEN size(entities) = 0 THEN [null] ELSE entities END AS entity
        |OPTIONAL MATCH (entity)-[:subject|object]->(f2:F)-[:supports]->(s2:L)-[:belongs_to]->(nt:T)
        |WHERE entity IS NOT NULL AND nt <> t
        |WITH t, nt.id AS ntid, count(f2) AS strength
        |ORDER BY strength DESC
        |WITH t, COLLECT(DISTINCT ntid)[..10] AS entity_neighbors
        |RETURN t.id AS sourceId, entity_neighbors""".stripMargin,
      Map("topicIds" -> ids("T:1")), expectCompiles = false,
      "CASE WHEN, node<>node, OPTIONAL MATCH and UNWIND mid-pipeline; " +
        "implemented natively by the topic beam (retrieve/BeamSearch" +
        ".scala, q_beam_topic)"),
    Entry("tbs_statements", "retrieval/retrievers/topic_beam_search.py:236",
      """MATCH (s:L)-[:belongs_to]->(t:T)
        |WHERE t.id IN $topicIds
        |RETURN t.id AS topicId,
        |s.id AS statementId""".stripMargin,
      Map("topicIds" -> ids("T:1")), expectCompiles = true),
    Entry("trav_statements",
      "retrieval/retrievers/traversal_based_base_retriever.py:153",
      """// get statements grouped by topic and source
        |MATCH (t)<-[:belongs_to]-(l:L)
        |      -[:mentioned_in]->(c)
        |      -[:extracted_from]->(s)
        |WHERE l.id in $statementIds
        |WITH {
        |        sourceId: s.id,
        |        metadata: properties(s),
        |        versioning: {
        |            valid_from: coalesce(s.valid_from, -1),
        |            valid_to: coalesce(s.valid_to, 10000000000000),
        |            extract_timestamp: coalesce(s.extract_timestamp, -1),
        |            build_timestamp: coalesce(s.build_timestamp, -1),
        |            id_fields: split(coalesce(s.id_fields, ""), ";")
        |        }
        |    } AS source,
        |    t, l, c,
        |    { chunkId: c.id, value: NULL, metadata: properties(c) } AS cc,
        |    { statementId: l.id, statement: l.value, facts: [], details: l.details, chunkId: c.id, score: 0 } as ll
        |WITH source,
        |    t,
        |    collect(distinct cc) as chunks,
        |    collect(ll) as statements
        |WITH source,
        |    {
        |        topic: t.value,
        |        topicId: t.id,
        |        chunks: chunks,
        |        statements: statements
        |    } as topic
        |WITH sum(size(topic.statements)/size(topic.chunks)) AS score, source, collect(topic) AS topics
        |RETURN {
        |    score: score,
        |    source: source,
        |    topics: topics
        |} as result ORDER BY result.score DESC LIMIT $limit""".stripMargin,
      Map("statementIds" -> ids("L:1", "L:2"), "limit" -> 100),
      expectCompiles = true,
      "the flagship statements_cypher (CypherStages; q_cypher_statements)"),
    Entry("trav_facts",
      "retrieval/retrievers/traversal_based_base_retriever.py:193",
      """// get facts for statements
        |MATCH (f)-[:supports]->(l:L)
        |WHERE l.id in $statementIds
        |RETURN l.id AS statementId, collect(distinct f.value) AS facts""".stripMargin,
      Map("statementIds" -> ids("L:1", "L:2")), expectCompiles = true,
      "q_cypher_factslist"),
    Entry("krs_keywords",
      "retrieval/retrievers/deprecated/keyword_ranking_search.py:165",
      """// find statements by keywords
        |UNWIND $keywords AS keyword
        |MATCH (e:E)
        |WHERE e.search_str = keyword
        |WITH e, keyword
        |MATCH (e)-[:subject|object]->()-[:supports]->(statement)
        |WITH statement, COLLECT(DISTINCT keyword) as matched_keywords
        |RETURN {
        |statement: {
        |statementId: id(statement)
        |},
        |matched_keywords: matched_keywords
        |} AS result""".stripMargin,
      Map("keywords" -> ids("alice", "bob")), expectCompiles = false,
      "deprecated retriever: UNWIND + WITH stages + mid-pipeline MATCH; " +
        "keyword→entity lookup is native (retrieve/QueryContext.scala)"),
    Entry("rbs_neighbours",
      "retrieval/retrievers/deprecated/rerank_beam_search.py:148",
      """// get statement neighbours (rerank beam search)
        |MATCH (e)-[:subject|object]->()-[:supports]->(s:L)
        |WHERE s.id = $statementId
        |WITH s, COLLECT(DISTINCT e) AS entities
        |UNWIND entities AS entity
        |MATCH (entity)-[:subject|object]->()-[:supports]->(e_neighbors)
        |RETURN DISTINCT e_neighbors.id as statementId""".stripMargin,
      Map("statementId" -> "L:1"), expectCompiles = false,
      "deprecated retriever: UNWIND of a collected list mid-pipeline; " +
        "statement beams are native (retrieve/BeamSearch.scala)"),
    Entry("sbs_neighbours",
      "retrieval/retrievers/deprecated/semantic_beam_search.py:89",
      """// get statement neighbours (semantic beam search)
        |MATCH (e)-[:subject|object]->()-[:supports]->(s:L)
        |WHERE s.id = $statementId
        |WITH s, COLLECT(DISTINCT e) AS entities
        |UNWIND entities AS entity
        |MATCH (entity)-[:subject|object]->()-[:supports]->(e_neighbors)
        |RETURN DISTINCT e_neighbors.id as statementId""".stripMargin,
      Map("statementId" -> "L:1"), expectCompiles = false,
      "as rbs_neighbours"),
    Entry("cu_chunks", "retrieval/utils/chunk_utils.py:53",
      """MATCH (chunk:K)-[:extracted_from]->(source:S) WHERE chunk.id in $chunk_ids
        |RETURN {
        |source: {
        |sourceId: source.id,
        |metadata: source{.*}
        |},
        |chunk: chunk{.id, .*}
        |} AS result""".stripMargin,
      Map("chunk_ids" -> ids("K:1", "K:2")), expectCompiles = true,
      "node_result `.*` map projections"),
    Entry("su_statements", "retrieval/utils/statement_utils.py:116",
      """MATCH (statement:L)-[:mentioned_in]->(chunk:K)-[:extracted_from]->(source:S) WHERE statement.id in $statement_ids
        |RETURN {
        |statement: statement{.id, .*},
        |source: {
        |sourceId: source.id,
        |metadata: source{.*}
        |},
        |chunk: chunk{.id, .*}
        |} AS result""".stripMargin,
      Map("statement_ids" -> ids("L:1")), expectCompiles = true),
    Entry("vu_topics", "retrieval/utils/vector_utils.py:86",
      """MATCH (t:T)-[:mentioned_in]->(c:K)-[:extracted_from]->(s:S)
        |WHERE t.id IN $topicIds
        |RETURN DISTINCT t.id AS topicId,
        |s.id AS sourceId""".stripMargin,
      Map("topicIds" -> ids("T:1")), expectCompiles = true),
    Entry("lgi_count", "lexical_graph_index.py:669",
      "MATCH (n:E) RETURN count(n) AS count",
      Map.empty, expectCompiles = true),
    Entry("lgi_topic_stats", "lexical_graph_index.py:673",
      """MATCH (t:T)-[r:mentioned_in]->()
        |WITH t, count(r) AS connectingNumChunks WHERE connectingNumChunks > 1
        |RETURN count(t) AS numTopics, connectingNumChunks ORDER BY connectingNumChunks DESC""".stripMargin,
      Map.empty, expectCompiles = true,
      "HAVING-style WHERE + second aggregation stage"),
    Entry("lgi_fact_stats", "lexical_graph_index.py:681",
      """MATCH (f:F)-[r:supports]->()
        |WITH f, count(r) AS connectingNumStatements WHERE connectingNumStatements > 1
        |RETURN count(f) AS numFacts, connectingNumStatements ORDER BY connectingNumStatements DESC""".stripMargin,
      Map.empty, expectCompiles = true),
    Entry("np_nodes_all", "byokg-rag/graphstore/neptune.py:107",
      "MATCH (n) RETURN ID(n) AS node",
      Map.empty, expectCompiles = true, "ID(v) node identity"),
    Entry("np_nodes_typed", "byokg-rag/graphstore/neptune.py:111",
      """MATCH (n:E)
        |RETURN properties(n) as properties, ID(n) as node, labels(n) as node_labels""".stripMargin,
      Map.empty, expectCompiles = true,
      "labels(v) as the id-prefix singleton list"),
    Entry("np_get_nodes_props", "byokg-rag/graphstore/neptune.py:137",
      """MATCH (n)
        |WHERE n.value in $node_ids
        |OR ID(n) IN $node_ids
        |RETURN properties(n) as properties, ID(n) as node""".stripMargin,
      Map("node_ids" -> ids("E:1", "alice corp")), expectCompiles = true,
      "ID(v) in WHERE membership"),
    Entry("np_get_nodes", "byokg-rag/graphstore/neptune.py:143",
      """MATCH (n)
        |WHERE ID(n) IN $node_ids
        |RETURN properties(n) as properties, ID(n) as node""".stripMargin,
      Map("node_ids" -> ids("E:1", "E:2")), expectCompiles = true),
    Entry("np_edges", "byokg-rag/graphstore/neptune.py:157",
      """MATCH ()-[e]-()
        |RETURN ID(e) as edge""".stripMargin,
      Map.empty, expectCompiles = false,
      "edges carry no identity in this store (a relationship binding " +
        "is its type); edge listings are LocalKGStore.edges"),
    Entry("np_get_edges", "byokg-rag/graphstore/neptune.py:172",
      """MATCH ()-[e]-()
        |WHERE ID(e) IN $edge_ids
        |RETURN properties(e) as properties, ID(e) as edge""".stripMargin,
      Map("edge_ids" -> ids("x")), expectCompiles = false,
      "as np_edges"),
    Entry("np_one_hop", "byokg-rag/graphstore/neptune.py:198",
      """MATCH (n) -[e]->(m)
        |WHERE ID(n) IN $node_ids
        |RETURN DISTINCT ID(n) as node, ID(e) as edge, type(e) as edge_type, ID(m) as dst_node""".stripMargin,
      Map("node_ids" -> ids("E:1")), expectCompiles = false,
      "ID(e) again; one-hop expansion is native " +
        "(byokg/Traversal.scala one-hop, q_khop_triplets)"),
    Entry("np_gather_embed", "byokg-rag/graphstore/neptune.py:399",
      """MATCH (n:E)
        |RETURN properties(n) as properties, ID(n) as node""".stripMargin,
      Map.empty, expectCompiles = true),
    Entry("np_edge_props", "byokg-rag/graphstore/neptune.py:482",
      """MATCH ()-[e:relation]->()
        |RETURN properties(e) AS props
        |LIMIT 100""".stripMargin,
      Map.empty, expectCompiles = true, "properties(e) over edge extras"),
    Entry("np_node_props", "byokg-rag/graphstore/neptune.py:511",
      """MATCH (a:E)
        |RETURN properties(a) AS props
        |LIMIT 100""".stripMargin,
      Map.empty, expectCompiles = true),
    Entry("np_triples", "byokg-rag/graphstore/neptune.py:538",
      """MATCH (a)-[e:relation]->(b)
        |WITH a,e,b LIMIT 3000
        |RETURN DISTINCT labels(a) AS from, type(e) AS edge, labels(b) AS to
        |LIMIT 10""".stripMargin,
      Map.empty, expectCompiles = true,
      "bare edge variable through a WITH stage; labels()/type()"))

  /** Run every entry against the fixture. Right = executed row count. */
  def sweep(spark: SparkSession): Seq[Outcome] = {
    val (edges, props) = fixture(spark)
    entries.map { e =>
      val r: Either[String, Long] =
        try CypherLite.run(edges, Some(props), e.cypher, e.params)
          .map(_.count())
        catch { case ex: Exception =>
          Left(s"EXECUTION ERROR: ${ex.getMessage}") }
      Outcome(e, r)
    }
  }

  /** Render the committed CYPHER_COVERAGE.md. */
  def render(outcomes: Seq[Outcome]): String = {
    val sb = new StringBuilder
    val n = outcomes.size
    val ok = outcomes.count(_.result.isRight)
    sb ++= "# Cypher dialect coverage — every retrieval-tier query " +
      "the reference ships\n\n"
    sb ++= "Generated by `graft.tools.CypherCoverageGen` from " +
      "`byokg/CypherCoverage.scala`; replayed by CypherCoverageSpec " +
      "(a dialect regression fails by name). Query texts are the " +
      "reference's own, adapted ONLY in store naming — see the " +
      "conventions in CypherCoverage's scaladoc.\n\n"
    sb ++= s"**$ok of $n compile and execute; ${n - ok} refuse " +
      "with a targeted message.** Every refusal names its native " +
      "engine coverage below. The indexing/build tier " +
      "(`indexing/build/*_graph_builder.py`, version_manager.py, " +
      "delete_sources.py, graph_summary_builder.py) is MERGE/SET " +
      "mutation text: the read-only executor refuses the whole family " +
      "by design (GraphQuerySafety), and those writes are the engine's " +
      "GraphConstruction/DeleteSources/VersionManager sinks " +
      "(index/*.scala) — recorded here once rather than per string.\n\n"
    sb ++= "| # | id | reference source | outcome | note |\n"
    sb ++= "|---|----|------------------|---------|------|\n"
    outcomes.zipWithIndex.foreach { case (o, i) =>
      val outcome = o.result match {
        case Right(rows) => s"compiles, rows=$rows"
        case Left(msg) =>
          val m = msg.replace("|", "\\|").replace("\n", " ")
          s"refuses: ${m.take(110)}${if (m.length > 110) "…" else ""}"
      }
      val note = o.entry.note.replace("|", "\\|")
      sb ++= s"| ${i + 1} | ${o.entry.id} | ${o.entry.source} | " +
        s"$outcome | $note |\n"
    }
    sb.toString
  }
}
