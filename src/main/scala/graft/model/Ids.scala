package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic md5-derived ids, as Column expressions so id generation stays
 * inside codegen (no UDFs).
 *
 * Mirrors the reference's structured id scheme
 * (reference: lexical-graph/src/graphrag_toolkit/lexical_graph/indexing/id_generator.py:65-173):
 * source ids are `aws::<hash8>:<hash4>`, dependent ids are `<prefix>:<hash8>`,
 * all tenant-scoped by hashing the tenant into the key.
 */
object Ids {

  private def h(n: Int, cols: Column*): Column =
    substring(md5(concat_ws("|", cols: _*)), 1, n)

  /** Source id from its identity metadata values + tenant. */
  def sourceId(identity: Column, tenant: Column): Column =
    concat(lit("g::"), h(8, identity, tenant), lit(":"), h(4, tenant, identity))

  /** Chunk id scoped under its source. */
  def chunkId(sourceId: Column, text: Column): Column =
    concat(sourceId, lit(":"), h(8, sourceId, text))

  def topicId(value: Column, tenant: Column): Column =
    concat(lit("t:"), h(8, lower(trim(value)), tenant))

  def statementId(topicId: Column, value: Column): Column =
    concat(lit("s:"), h(8, topicId, value))

  def factId(subject: Column, relation: Column, objOrComplement: Column): Column =
    concat(lit("f:"), h(8, subject, relation, objOrComplement))

  def entityId(searchStr: Column, classification: Column, tenant: Column): Column =
    concat(lit("e:"), h(8, searchStr, classification, tenant))
}
