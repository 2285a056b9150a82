package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions.{col, explode, posexplode, struct}

/**
 * Bounded top-k-per-key aggregation built on Catalyst's `CollectTopK`
 * (spark-catalyst collect.scala) — a heap-bounded Collect whose partial
 * (map-side) aggregation keeps at most k rows per key per partition.
 *
 * The windowed alternative (`row_number() over (partition by key order by
 * ...) <= k`) shuffles EVERY row to its key's partition and sorts the whole
 * partition before discarding all but k rows. At 100 TB that is the
 * difference between shuffling the corpus and shuffling at most
 * k × |keys| × |map partitions| pre-reduced rows: the per-key truncations in
 * the retrieval chain (top-3 statements per topic, top-10 sources per
 * result — reference truncate_statements.py / truncate_results.py) are
 * bounded-k operators, so the heap aggregate is the right physical shape,
 * with the same rows out.
 *
 * Ordering: rows rank by the BINARY ascending order of a packed sort-key
 * struct; k smallest survive. Descending numeric keys enter negated (the
 * caller builds the key columns), exactly like a sort key list.
 */
object TopKAgg {

  /** Aggregate Column: the k smallest `sortKey`-ordered elements, ascending.
    * `sortKey` must be orderable (struct of orderable fields is fine). */
  def smallestK(sortKey: Column, k: Int): Column =
    GraftSqlBridge.collectTopK(sortKey, k, reverse = true)

  /** Aggregate Column: the k largest elements, descending. */
  def largestK(sortKey: Column, k: Int): Column =
    GraftSqlBridge.collectTopK(sortKey, k, reverse = false)

  /**
   * Keep the top `k` rows per `keyCols` group, ordered by `asc` sort
   * columns ascending (negate numerics in the caller for descending) —
   * the `row_number() over (partition by key order by ...) <= k` pattern
   * as one hash aggregate with map-side heap combine. All input columns
   * survive; output column order is preserved.
   *
   * The sort columns must make the per-group order total (unique tiebreak),
   * or the kept set would be nondeterministic — same contract as the
   * window version, which this replaces row-for-row.
   */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], asc: Seq[Column],
                 k: Int): DataFrame = {
    val payload = struct(df.columns.map(col): _*).as("_row")
    val sortKey = struct(asc.zipWithIndex.map { case (c, i) =>
      c.as(s"_k$i")
    } :+ payload: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(smallestK(sortKey, k).as("_top"))
      .select(explode(col("_top")).as("_e"))
      .select(col("_e._row.*"))
  }

  /** [[topKPerKey]] plus a 1-based within-group rank column in the sort
    * order — `CollectTopK.eval` emits the heap sorted (collect.scala:
    * sorted(ordering.reverse)), so the rank is the array position, free. */
  def topKPerKeyRanked(df: DataFrame, keyCols: Seq[String], asc: Seq[Column],
                       k: Int, rankCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*).as("_row")
    val sortKey = struct(asc.zipWithIndex.map { case (c, i) =>
      c.as(s"_k$i")
    } :+ payload: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(smallestK(sortKey, k).as("_top"))
      .select(posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col("_e._row.*") +: Seq((col("_pos") + 1).as(rankCol)): _*)
  }
}
