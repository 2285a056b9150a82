package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-entity domain labels (`include_domain_labels`): the reference adds a
 * `SET e :Company`-style label derived from each entity's classification to
 * the `__Entity__` node (reference
 * lexical-graph/.../indexing/build/entity_graph_builder.py:115-127), skipping
 * local entities; the graph summary then reads the labels. Spark is the
 * store here, so the label is a projected column, not a stored node label —
 * same derivation, one narrow expression.
 */
object DomainLabels {

  val LocalEntityClass: String = LexicalGraphBuilder.LocalEntityClass
  val DefaultClassification: String = "unknown"

  /** `label_from` (reference storage/graph/graph_utils.py:39-57): reserved
    * `__...__` values pass through; anything else has punctuation and
    * underscores collapsed to spaces, each word capitalized (first char
    * upper, rest lower), and the spaces removed — "data engineer" →
    * "DataEngineer", "metric_v2" → "MetricV2".
    *
    * Deliberately NOT TextFunctions.labelFrom: that port follows the search
    * normalizer (strips symbols entirely), while the graph_utils grammar
    * REPLACES symbol runs with a word boundary — "v2+beta" is "V2Beta"
    * here but "V2beta" there — and only this one honors the reserved
    * passthrough. The q_domain_labels oracle replays this grammar. */
  def labelFrom(c: Column): Column = {
    val cleaned = regexp_replace(c, "([^\\s\\w]|_)+", " ")
    val words = filter(split(trim(cleaned), "\\s+"), w => length(w) > 0)
    val capped = transform(words, w =>
      concat(upper(substring(w, 1, 1)), lower(substring(w, 2, Int.MaxValue))))
    when(c.startsWith("__") && c.endsWith("__"), c)
      .otherwise(array_join(capped, ""))
  }

  /** Entities with their domain label projected from `classification`
    * (null → the reference's DEFAULT_CLASSIFICATION, "unknown" → "Unknown").
    * Local entities carry no domain label in the reference
    * (entity_graph_builder.py insert_domain_entity early-returns), so they
    * are dropped from the labeled projection. */
  def withDomainLabels(entities: DataFrame): DataFrame = {
    val cls = coalesce(col("classification"), lit(DefaultClassification))
    entities
      .filter(coalesce(col("classification"), lit("")) =!= LocalEntityClass)
      .withColumn("label", labelFrom(cls))
  }
}
