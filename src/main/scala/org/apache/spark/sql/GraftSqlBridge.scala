package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` helpers, compiled inside the Spark SQL package
 * the way SparkSessionExtensions implementors reach non-public internals.
 * Keep this file minimal: every member is a thin accessor used by exactly
 * one graft wrapper (see graft.functions.TopKAgg).
 */
object GraftSqlBridge {

  /** Bounded top-k aggregate Column over any orderable sort-key
    * expression: k extreme elements, sorted. reverse=true keeps the k
    * smallest (ascending output), reverse=false the k largest (descending)
    * — spark-catalyst collect.scala CollectTopK semantics, served by
    * graft.functions.BoundedTopKAgg (k-slot sorted array, no per-loser
    * copies; see its doc for the CollectTopK comparison). */
  def collectTopK(sortKey: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      graft.functions.BoundedTopKAgg(
        ExpressionUtils.expression(sortKey), k, reverse)
        .toAggregateExpression())

  /** The stock Catalyst CollectTopK, kept reachable for A/B measurement. */
  def collectTopKCatalyst(sortKey: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      new CollectTopK(ExpressionUtils.expression(sortKey), k, reverse, 0, 0)
        .toAggregateExpression())

  /** Misra-Gries sketch aggregate over a token-array column (see
    * graft.functions.MisraGriesAgg for semantics + guarantee). */
  def misraGries(tokens: Column, capacity: Int): Column =
    ExpressionUtils.column(
      graft.functions.MisraGriesAgg(ExpressionUtils.expression(tokens),
        capacity).toAggregateExpression())

  /** Value-ordered deterministic double sum (see
    * graft.functions.SortedSumAgg — the PageRank/HITS fold primitive). */
  def sortedSum(values: Column): Column =
    ExpressionUtils.column(
      graft.functions.SortedSumAgg(ExpressionUtils.expression(values))
        .toAggregateExpression())
}
