package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Metadata filter algebra → a single Catalyst `Column`.
 *
 * The reference defines a `MetadataFilter{key, op, value}` AST with AND/OR
 * nesting and compiles it three times — to openCypher WHERE, OpenSearch DSL,
 * and SQL WHERE (reference: metadata.py:175-260, graph_utils.py:159-199 +
 * 320-341, opensearch_vector_indexes.py:807-870, pg_vector_indexes.py:539-542).
 * On Spark one compilation suffices: AST → Column, and Catalyst pushes the
 * predicate down to every scan (parquet row groups included).
 */
object FilterAst {

  sealed trait FilterOp
  case object Eq extends FilterOp
  case object Ne extends FilterOp
  case object Gt extends FilterOp
  case object Gte extends FilterOp
  case object Lt extends FilterOp
  case object Lte extends FilterOp
  case object TextMatch extends FilterOp
  case object TextMatchInsensitive extends FilterOp
  case object StartsWith extends FilterOp
  case object IsEmpty extends FilterOp

  sealed trait Filter
  final case class Pred(key: String, op: FilterOp, value: Any) extends Filter
  final case class And(filters: Seq[Filter]) extends Filter
  final case class Or(filters: Seq[Filter]) extends Filter
  final case class Not(filter: Filter) extends Filter

  object And { def of(fs: Filter*): And = And(fs) }
  object Or { def of(fs: Filter*): Or = Or(fs) }

  /** Compile the AST to one Column; `resolve` maps a metadata key to the
    * column holding it (identity for flat tables, `m => col("metadata")(m)`
    * for map-typed metadata). */
  def compile(f: Filter, resolve: String => Column = col): Column = f match {
    case Pred(k, op, v) =>
      val c = resolve(k)
      op match {
        case Eq                   => c === lit(v)
        case Ne                   => c =!= lit(v)
        case Gt                   => c > lit(v)
        case Gte                  => c >= lit(v)
        case Lt                   => c < lit(v)
        case Lte                  => c <= lit(v)
        case TextMatch            => c.contains(lit(v))
        case TextMatchInsensitive => lower(c).contains(lit(v.toString.toLowerCase))
        case StartsWith           => c.startsWith(lit(v))
        case IsEmpty              => c.isNull || length(c.cast("string")) === 0
      }
    // neutral elements for empty conjunction/disjunction (a
    // programmatically-assembled And(Nil) must not throw empty.reduce)
    case And(fs) => fs.map(compile(_, resolve))
      .reduceOption(_ && _).getOrElse(lit(true))
    case Or(fs)  => fs.map(compile(_, resolve))
      .reduceOption(_ || _).getOrElse(lit(false))
    case Not(g)  => !compile(g, resolve)
  }

  /**
   * As-of versioning predicate: valid_from <= t < valid_to with null
   * coalescing to the sentinel bounds (reference:
   * lexical_graph_query_engine.py:104-110, traversal_based_base_retriever.py:160-168).
   */
  def asOf(tMillis: Long): Column =
    coalesce(col("valid_from"), lit(graft.model.Schemas.TimestampLowerBound)) <= lit(tMillis) &&
      coalesce(col("valid_to"), lit(graft.model.Schemas.TimestampUpperBound)) > lit(tMillis)
}
