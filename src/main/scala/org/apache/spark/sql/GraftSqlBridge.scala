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

  /** `collect_top_k` aggregate Column over any orderable sort-key
    * expression: k extreme elements, sorted. reverse=true keeps the k
    * smallest (ascending output), reverse=false the k largest (descending)
    * — spark-catalyst collect.scala CollectTopK semantics. */
  def collectTopK(sortKey: Column, k: Int, reverse: Boolean): Column =
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
