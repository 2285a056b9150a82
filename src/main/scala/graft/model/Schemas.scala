package graft.model

/**
 * Graph + vector data model for the Spark-native lexical-graph engine.
 *
 * Mirrors the reference's three-tier hierarchical lexical graph
 * (reference: docs-site/src/content/docs/lexical-graph/graph-model.mdx:22-127,
 * lexical-graph/src/graphrag_toolkit/lexical_graph/indexing/model.py) re-expressed
 * as columnar Spark tables (SURVEY.md §1.4). Each node label becomes a Dataset of
 * a case class; each edge label becomes an edge table keyed by the two node ids.
 *
 * All ids are deterministic md5-derived strings (see [[Ids]]), so a rebuild from
 * the same inputs is hash-stable — the property the reference gets from
 * indexing/id_generator.py:65-173.
 */
object Schemas {

  /** Sentinel version bounds — reference retrieval/model.py:90-97. */
  val TimestampLowerBound: Long = 0L
  val TimestampUpperBound: Long = 32503680000000L // 3000-01-01 epoch millis

  /** __Source__ node: one ingested document, SCD-2 versioned. */
  final case class Source(
      source_id: String,
      metadata: Map[String, String],
      valid_from: Long,
      valid_to: Long,
      extract_ts: Long,
      build_ts: Long,
      tenant_id: String)

  /** __Chunk__ node with lineage links (__PREVIOUS__/__NEXT__ flattened in). */
  final case class Chunk(
      chunk_id: String,
      source_id: String,
      text: String,
      seq: Int,
      prev_id: Option[String],
      next_id: Option[String],
      embedding: Array[Float],
      tenant_id: String)

  /** __Topic__ node. */
  final case class Topic(topic_id: String, value: String, tenant_id: String)

  /** __MENTIONED_IN__ edge topic -> chunk. */
  final case class TopicMentionedIn(topic_id: String, chunk_id: String)

  /** __Statement__ node; __BELONGS_TO__ + __MENTIONED_IN__ + intra-topic
    * __PREVIOUS__ linked list flattened into columns. */
  final case class Statement(
      statement_id: String,
      topic_id: String,
      chunk_id: String,
      value: String,
      details: Seq[String],
      seq: Int,
      prev_statement_id: Option[String],
      embedding: Array[Float])

  /** __Fact__ node: SPO (object) or SPC (complement) fact. */
  final case class Fact(
      fact_id: String,
      value: String,
      relation: String,
      subject_entity_id: String,
      object_entity_id: Option[String],
      complement: Option[String])

  /** __SUPPORTS__ edge fact -> statement. */
  final case class FactSupports(fact_id: String, statement_id: String)

  /** __Entity__ node; search_str is the normalized lookup key
    * (reference graph_utils.py:19-35). */
  final case class Entity(
      entity_id: String,
      value: String,
      search_str: String,
      classification: String)

  /** __RELATION__ edge entity -> entity. */
  final case class EntityRelation(
      src_entity_id: String,
      relation_value: String,
      dst_entity_id: String)

  /** Generic edge for iterative traversal algorithms (byokg). */
  final case class Edge(src: String, dst: String, label: String)

  /** One row of a named vector index (chunk/statement/topic). */
  final case class VectorRow(
      id: String,
      text: String,
      embedding: Array[Float],
      source_id: String,
      metadata: Map[String, String])
}
