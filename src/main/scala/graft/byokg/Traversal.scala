package graft.byokg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph traversal operators over a generic `edges(src, dst, label)` DataFrame —
 * the Spark re-expression of the reference's adjacency-map traversal
 * (reference: byokg-rag/src/graphrag_toolkit/byokg_rag/graph_retrievers/graph_traversal.py:14-231).
 *
 * Each hop is one join of the frontier against the edge table. The frontier is
 * tiny relative to the graph, so every join broadcasts the frontier; the edge
 * table itself is never shuffled. Depths are bounded (k, metapath length), so
 * the driver loop issues O(depth) jobs, never O(nodes).
 */
object Traversal {

  private def undirect(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("label"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("label")))

  /** The frame every hop of a loop re-probes: cache only the derived
    * undirected union — a directed input is the caller's (already cached,
    * see [[graft.queries.Tables.edges]]) frame and must not be re-cached. */
  private def loopEdges(edges: DataFrame, undirected: Boolean): DataFrame =
    if (undirected) undirect(edges).cache() else edges

  /** One-hop expansion: triplets whose src is in `frontier(node)`
    * (reference graph_traversal.py:14-79). */
  def oneHop(edges: DataFrame, frontier: DataFrame,
             undirected: Boolean = false): DataFrame = {
    val e = if (undirected) undirect(edges) else edges
    e.join(broadcast(frontier.select(col("node").as("src")).distinct()), Seq("src"))
  }

  /** k-hop triplet expansion: union of triplets reached within k hops
    * (reference graph_traversal.py:94-113). The edge frame is cached for the
    * duration of the loop — each hop re-probes it. */
  def kHopTriplets(edges: DataFrame, seeds: DataFrame, k: Int,
                   undirected: Boolean = false): DataFrame = {
    val e = loopEdges(edges, undirected)
    var frontier = seeds.select(col("node")).distinct()
    var acc: DataFrame = null
    for (_ <- 1 to k) {
      val hop = e.join(
        broadcast(frontier.select(col("node").as("src")).distinct()), Seq("src"))
      acc = if (acc == null) hop else acc.union(hop)
      frontier = hop.select(col("dst").as("node")).distinct()
    }
    acc.distinct()
  }

  /** Metapath following: from seeds, follow the exact label sequence; returns
    * the end nodes of complete paths (reference graph_traversal.py:115-154). */
  def followMetapath(edges: DataFrame, seeds: DataFrame,
                     metapath: Seq[String],
                     undirected: Boolean = false): DataFrame = {
    val e = loopEdges(edges, undirected)
    var frontier = seeds.select(col("node")).distinct()
    for (lbl <- metapath) {
      frontier = e.filter(col("label") === lbl)
        .join(broadcast(frontier.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
    }
    frontier
  }

  /**
   * Unit-weight single-source shortest distances via frontier BFS with a
   * visited set, early exit when the frontier drains, bounded by maxDistance
   * (reference graph_traversal.py:156-231). Returns (node, dist).
   */
  def shortestDistances(edges: DataFrame, seeds: DataFrame, maxDistance: Int,
                        undirected: Boolean = false,
                        eager: Boolean = true): DataFrame = {
    if (!eager) return shortestDistancesLazy(edges, seeds, maxDistance, undirected)
    val e = loopEdges(edges, undirected)
    // One eagerly-materialized (localCheckpoint: flat lineage) layer per
    // depth. The visited set probed by the anti-join is the lazy union of the
    // checkpointed layers — small, so it broadcasts; re-checkpointing it
    // every round would double the jobs per hop for nothing.
    val first = seeds.select(col("node")).distinct().localCheckpoint(true)
    val layers = scala.collection.mutable.ArrayBuffer(first)
    var frontier = first
    var d = 0
    var drained = frontier.isEmpty
    while (d < maxDistance && !drained) {
      d += 1
      val visited = layers.reduce(_ union _)
      val next = e
        .join(broadcast(frontier.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      drained = next.isEmpty
      if (!drained) { layers += next; frontier = next }
    }
    layers.zipWithIndex
      .map { case (f, i) => f.withColumn("dist", lit(i)) }
      .reduce(_ union _)
  }

  /** Declarative unrolled BFS: no checkpoints, no per-hop driver jobs — one
    * Catalyst plan, one job at action time. Each layer is `.cache()`d (lazy,
    * no job) because it appears in later layers' plans twice (probe + anti);
    * without the cache the recompute is exponential in depth. Right for
    * small bounded depths where the eager loop's per-hop scheduling overhead
    * dominates; the eager variant remains the scale path for deep/unknown
    * frontiers (flat plan, early exit when the frontier drains). */
  private def shortestDistancesLazy(edges: DataFrame, seeds: DataFrame,
                                    maxDistance: Int,
                                    undirected: Boolean): DataFrame = {
    val e = if (undirected) undirect(edges) else edges
    var frontier = seeds.select(col("node")).distinct().cache()
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to maxDistance) {
      val visited = layers.reduce(_ union _)
      frontier = e
        .join(broadcast(frontier.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(broadcast(visited), Seq("node"), "left_anti")
        .cache()
      layers += frontier
    }
    layers.zipWithIndex
      .map { case (f, i) => f.withColumn("dist", lit(i)) }
      .reduce(_ union _)
  }

  /** Triplet verbalization: "src [relation] dst" lines, one string per path
    * group (reference byokg graph_verbalizer.py:35-233). */
  def verbalizeTriplets(triplets: DataFrame): DataFrame =
    triplets.select(
      concat_ws(" ", col("src"), concat(lit("["), col("label"), lit("]")),
        col("dst")).as("text"))
}
