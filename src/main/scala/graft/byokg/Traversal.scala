package graft.byokg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Joins.gatedBroadcast

/**
 * Graph traversal operators over a generic `edges(src, dst, label)` DataFrame —
 * the Spark re-expression of the reference's adjacency-map traversal
 * (reference: byokg-rag/src/graphrag_toolkit/byokg_rag/graph_retrievers/graph_traversal.py:14-231).
 *
 * Each hop is one join of the frontier against the edge table. Every loop
 * materializes its frontier per hop (localCheckpoint: flat lineage) and
 * broadcasts it only while the counted size stays under
 * [[graft.ops.Joins.BroadcastRowCap]] — a dense graph's layer-2 frontier is
 * not broadcastable, and an unconditional hint would OOM the driver at scale.
 * Depths are bounded (k, metapath length), so the driver loop issues
 * O(depth) jobs, never O(nodes).
 */
object Traversal {

  private def undirect(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("label"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("label")))

  /** The frame every hop of a loop re-probes. Not cached here: loop callers
    * with repeated undirected traversals should pass an already-cached
    * undirected frame (see [[graft.queries.Tables.undirectedEdges]]) —
    * caching per invocation leaked storage until the session died. */
  private def loopEdges(edges: DataFrame, undirected: Boolean): DataFrame =
    if (undirected) undirect(edges) else edges

  /** One-hop expansion: triplets whose src is in `frontier(node)`
    * (reference graph_traversal.py:14-79). */
  def oneHop(edges: DataFrame, frontier: DataFrame,
             undirected: Boolean = false): DataFrame = {
    val e = if (undirected) undirect(edges) else edges
    e.join(broadcast(frontier.select(col("node").as("src")).distinct()), Seq("src"))
  }

  /** k-hop triplet expansion: union of triplets reached within k hops
    * (reference graph_traversal.py:94-113). Each hop's frontier is
    * checkpointed and counted; the count both gates the broadcast and
    * early-exits the loop when the frontier drains. k <= 0 yields an empty
    * triplet frame. */
  def kHopTriplets(edges: DataFrame, seeds: DataFrame, k: Int,
                   undirected: Boolean = false): DataFrame = {
    val e = loopEdges(edges, undirected)
    if (k <= 0) return e.limit(0)
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(true)
    var n = frontier.count()
    var acc: DataFrame = null
    var hops = 0
    while (hops < k && n > 0) {
      hops += 1
      val hop = e.join(
        gatedBroadcast(frontier.select(col("node").as("src")), n), Seq("src"))
      acc = if (acc == null) hop else acc.union(hop)
      if (hops < k) {
        frontier = hop.select(col("dst").as("node")).distinct().localCheckpoint(true)
        n = frontier.count()
      }
    }
    if (acc == null) e.limit(0) else acc.distinct()
  }

  /** Metapath following: from seeds, follow the exact label sequence; returns
    * the end nodes of complete paths (reference graph_traversal.py:115-154). */
  def followMetapath(edges: DataFrame, seeds: DataFrame,
                     metapath: Seq[String],
                     undirected: Boolean = false): DataFrame = {
    val e = loopEdges(edges, undirected)
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(true)
    var n = frontier.count()
    for (lbl <- metapath if n > 0) {
      frontier = e.filter(col("label") === lbl)
        .join(gatedBroadcast(frontier.select(col("node").as("src")), n), Seq("src"))
        .select(col("dst").as("node")).distinct().localCheckpoint(true)
      n = frontier.count()
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
    var n = frontier.count()
    var d = 0
    while (d < maxDistance && n > 0) {
      d += 1
      val visited = layers.reduce(_ union _)
      val next = e
        .join(gatedBroadcast(frontier.select(col("node").as("src")), n), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      n = next.count()
      if (n > 0) { layers += next; frontier = next }
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
      // fully lazy: no counts available, so no broadcast hints — AQE decides
      // per hop from the measured shuffle sizes
      frontier = e
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
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
