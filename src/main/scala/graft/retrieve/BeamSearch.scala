package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => V}
import graft.index.GraphTables

/**
 * Topic beam search: starting from seed topics, iteratively expand to
 * neighbor topics through three join branches — same chunk, adjacent chunk
 * (prev/next links), entity overlap — score each frontier against the query
 * embedding, and keep the best `beamWidth` per depth
 * (reference: retrieval/retrievers/topic_beam_search.py:176-251 — the
 * reference already batches one graph query per depth; here each depth is
 * one Spark job over the frontier DataFrame, never a per-node round trip).
 */
object TopicBeamSearch {

  /** Topic-level embedding view — delegates to the graph's cached member. */
  def topicEmbeddings(g: GraphTables): DataFrame = g.topicEmbeddings

  /** Topic→entity projection — delegates to the graph's cached member. */
  def topicEntityView(g: GraphTables): DataFrame = g.topicEntities

  /** One expansion step: neighbor topics of the frontier via the three
    * branches, each capped, deduped against the visited set. Pass a cached
    * `topicEntities` (from [[topicEntityView]]) when expanding in a loop —
    * rebuilding the three-way join per depth is the slow path.
    *
    * Broadcast hints here are bounded by construction: the frontier is
    * beamWidth-capped by [[search]], and the derived chunk/entity sets are
    * frontier-sized fan-outs, never whole-table frames. */
  def expandOnce(g: GraphTables, frontier: DataFrame, visited: DataFrame,
                 capPerBranch: Int = 100,
                 topicEntities: Option[DataFrame] = None): DataFrame = {
    val f = broadcast(frontier.select(col("topic_id")).distinct())

    // Branches 1 and 2 both probe the frontier's chunk set — build (and
    // broadcast) it once.
    val frontierChunks = broadcast(
      g.topicMentionedIn.join(f, Seq("topic_id"))
        .select(col("chunk_id")).distinct())
    val sameChunk = g.topicMentionedIn
      .join(frontierChunks, Seq("chunk_id"))
      .select(col("topic_id")).distinct().limit(capPerBranch)

    // Branch 2: topics in adjacent (prev/next) chunks.
    val adj = g.chunks
      .join(frontierChunks, Seq("chunk_id"))
      .select(explode(array(col("prev_id"), col("next_id"))).as("chunk_id"))
      .where(col("chunk_id").isNotNull)
    val adjacent = g.topicMentionedIn
      .join(broadcast(adj.distinct()), Seq("chunk_id"))
      .select(col("topic_id")).distinct().limit(capPerBranch)

    // Branch 3: topics sharing entities, ranked by overlap strength.
    val te = topicEntities.getOrElse(topicEntityView(g))
    val frontierEntities = te.join(f, Seq("topic_id"))
      .select(col("entity_id")).distinct()
    val entityOverlap = te
      .join(broadcast(frontierEntities), Seq("entity_id"))
      .groupBy(col("topic_id")).agg(count(lit(1)).as("strength"))
      .orderBy(desc("strength"), col("topic_id"))
      .select(col("topic_id")).limit(capPerBranch)

    sameChunk.union(adjacent).union(entityOverlap).distinct()
      .join(visited.select(col("topic_id")), Seq("topic_id"), "left_anti")
  }

  /** Full beam: `depth` expansion rounds, each scored by cosine against the
    * query and truncated to `beamWidth`. Returns (topic_id, score, depth). */
  def search(g: GraphTables, seedTopics: DataFrame, queryEmbedding: Seq[Double],
             beamWidth: Int = 100, depth: Int = 3): DataFrame = {
    val topicEmb = g.topicEmbeddings
    val topicEntities = Some(g.topicEntities)
    def score(topics: DataFrame): DataFrame =
      topics.join(topicEmb, Seq("topic_id"))
        .select(col("topic_id"),
          V.cosine(col("embedding"), typedLit(queryEmbedding)).as("score"))

    var frontier = seedTopics.select(col("topic_id")).distinct().localCheckpoint(true)
    // visited = lazy union of the checkpointed per-depth layers: each layer
    // is already materialized, so re-checkpointing the union every round
    // would only add driver jobs.
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    var acc = score(frontier).withColumn("depth", lit(0))
    for (d <- 1 to depth) {
      val visited = layers.reduce(_ union _)
      val next = expandOnce(g, frontier, visited, topicEntities = topicEntities)
      val scored = score(next)
        .orderBy(desc("score"), col("topic_id")).limit(beamWidth)
        .localCheckpoint(true)
      acc = acc.union(scored.withColumn("depth", lit(d)))
      // scored is already checkpointed; the projection stays flat for free
      frontier = scored.select(col("topic_id"))
      layers += frontier
    }
    acc
  }
}

/**
 * Entity context tree expansion: iterative relation-frontier growth from
 * seed entities, bounded depth, exclusion sets, degree-scored
 * (reference: retrieval/query_context/entity_context_provider.py:40-141).
 */
object EntityContextProvider {

  /** Degree score per entity over the relation edges (both directions)
    * (reference entity_context_provider.py:126-141). */
  def entityScores(g: GraphTables): DataFrame =
    g.entityRelations.select(col("src_entity_id").as("entity_id"))
      .union(g.entityRelations.select(col("dst_entity_id").as("entity_id")))
      .groupBy("entity_id").agg(count(lit(1)).as("score"))

  /** Expand the relation graph from seeds up to `maxDepth`, excluding
    * `exclude` ids; returns (entity_id, depth) of the context tree. */
  def expand(g: GraphTables, seeds: DataFrame,
             maxDepth: Int = graft.model.Defaults.EcMaxDepth,
             exclude: Option[DataFrame] = None): DataFrame = {
    val excl = exclude.map(_.select(col("entity_id")).distinct())
    var frontier = seeds.select(col("entity_id")).distinct()
    excl.foreach(e => frontier = frontier.join(e, Seq("entity_id"), "left_anti"))
    frontier = frontier.localCheckpoint(true)
    // unlike the topic beam there is no width cap, so the frontier can grow
    // with graph density: gate the broadcast on the counted layer size and
    // stop early once a layer drains
    var n = frontier.count()
    var visited = frontier.withColumn("depth", lit(0))
    var d = 0
    while (d < maxDepth && n > 0) {
      d += 1
      var next = g.entityRelations
        .join(graft.ops.Joins.gatedBroadcast(
          frontier.withColumnRenamed("entity_id", "src_entity_id"), n),
          Seq("src_entity_id"))
        .select(col("dst_entity_id").as("entity_id")).distinct()
        .join(visited.select("entity_id"), Seq("entity_id"), "left_anti")
      excl.foreach(e => next = next.join(e, Seq("entity_id"), "left_anti"))
      frontier = next.localCheckpoint(true)
      n = frontier.count()
      if (n > 0) visited = visited.union(frontier.withColumn("depth", lit(d)))
    }
    visited
  }
}
