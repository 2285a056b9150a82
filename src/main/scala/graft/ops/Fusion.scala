package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid-retrieval rank fusion. The reference fronts both a keyword index
 * and a vector index over the same chunks (OpenSearch keyword search +
 * VectorIndex top_k; hybrid queries there fuse with reciprocal-rank
 * fusion), so the engine needs the fusion step as a first-class operator:
 * RRF(d) = Σ_lists 1 / (k + rank_list(d)) — Cormack et al. 2009.
 *
 * Scale shape: each input is a BOUNDED top-N list by construction (the
 * expensive part — scoring 100 TB of chunks — already happened inside each
 * retriever, which is why fusion composes rather than re-scores). Joining
 * bounded lists is broadcast-sized no matter the corpus size; the fold
 * below keeps one full-outer join per extra list and sums the per-list
 * reciprocal terms in FIXED list order with `coalesce(..., 0.0)` slots, so
 * the double result is partition- and merge-order-independent and replays
 * bit-identically in a SQL oracle.
 */
object Fusion {

  /** 1-based dense rank column over the WHOLE frame in `order` — only for
    * bounded (already top-N-limited) frames: the window is deliberately
    * unpartitioned, which is a single-task sort of ≤N rows, not a
    * scale-path shuffle. */
  def withRank(bounded: DataFrame, order: Seq[Column],
               rankCol: String): DataFrame =
    bounded.withColumn(rankCol,
      row_number().over(Window.orderBy(order: _*)))

  /**
   * Fuse named rank lists; each df must carry (`idCol`, `rankCol`).
   * Output: (id, rrf, r_<name>...) — rrf descending, id tiebreak, top `k`.
   */
  def rrf(lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
          rrfK: Int = 60, k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size,
      s"list names must be distinct, got ${lists.map(_._1)}")
    val named = lists.map { case (n, df) =>
      df.select(col(idCol).as(s"id_$n"), col(rankCol).as(s"r_$n"))
    }
    val joined = named.reduceLeft { (a, b) =>
      val aId = coalesce(a.columns.filter(_.startsWith("id_")).map(a(_)): _*)
      a.join(b, aId === b(b.columns.head), "full_outer")
    }
    val id = coalesce(lists.map { case (n, _) => col(s"id_$n") }: _*)
    val score = lists.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"r_$n").cast("double")), lit(0.0))
    }.reduceLeft(_ + _)
    joined
      .select(id.as("id") +: score.as("rrf") +:
        lists.map { case (n, _) => col(s"r_$n") }: _*)
      .orderBy(desc("rrf"), col("id"))
      .limit(k)
  }
}
