package graft.retrieve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{CosineSimilarity, VectorFunctions => V}
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
/** Compiled cosine for the beam scorers — bit-identical to the
  * [[graft.functions.VectorFunctions.cosine]] fold (same sequential double
  * accumulation per term, same zero-norm guard) but a single fused codegen
  * loop with no intermediate arrays, and it keeps the scoring projection
  * inside whole-stage codegen (higher-order functions break the span). */
private[retrieve] object BeamCos {
  def apply(spark: org.apache.spark.sql.SparkSession)(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    CosineSimilarity.register(spark)
    CosineSimilarity.cosine(a, b)
  }
}

object TopicBeamSearch {

  /** Topic-level embedding view — delegates to the graph's cached member. */
  def topicEmbeddings(g: GraphTables): DataFrame = g.topicEmbeddings

  /** Topic→entity projection — delegates to the graph's cached member. */
  def topicEntityView(g: GraphTables): DataFrame = g.topicEntities

  /** One expansion step: neighbor topics of the frontier via the three
    * branches, deduped against the visited set. Pass a cached
    * `topicEntities` (from [[topicEntityView]]) when expanding in a loop —
    * rebuilding the three-way join per depth is the slow path.
    *
    * The same-chunk and adjacent-chunk branches share one probe of
    * `topicMentionedIn` (frontier chunks ∪ their prev/next neighbors) and
    * are naturally bounded by per-chunk topic fan-out; only the
    * entity-overlap branch — where a hub entity can touch an unbounded
    * topic set — carries an explicit strength-ranked `capPerBranch`. The
    * single `distinct` after the union is the only candidate-set shuffle:
    * per-branch distinct/limit chains cost one exchange each per depth and
    * only re-deduped what the union dedup already does.
    *
    * Broadcast hints here are bounded by construction: the frontier is
    * beamWidth-capped by [[search]], and the derived chunk/entity sets are
    * frontier-sized fan-outs, never whole-table frames. */
  def expandOnce(g: GraphTables, frontier: DataFrame, visited: DataFrame,
                 capPerBranch: Int = 100,
                 topicEntities: Option[DataFrame] = None): DataFrame = {
    val f = broadcast(frontier.select(col("topic_id")).distinct())

    val frontierChunks = broadcast(
      g.topicMentionedIn.join(f, Seq("topic_id"))
        .select(col("chunk_id")).distinct())

    // Branches 1+2: topics mentioned in the frontier's chunks or their
    // prev/next-linked neighbors — one probe over the unioned chunk set.
    val probeChunks = g.chunks
      .join(frontierChunks, Seq("chunk_id"))
      .select(explode(array(col("chunk_id"), col("prev_id"), col("next_id")))
        .as("chunk_id"))
      .where(col("chunk_id").isNotNull)
    val viaChunks = g.topicMentionedIn
      .join(broadcast(probeChunks), Seq("chunk_id"))
      .select(col("topic_id"))

    // Branch 3: topics sharing entities, ranked by overlap strength.
    val te = topicEntities.getOrElse(topicEntityView(g))
    val frontierEntities = te.join(f, Seq("topic_id"))
      .select(col("entity_id")).distinct()
    val entityOverlap = te
      .join(broadcast(frontierEntities), Seq("entity_id"))
      .groupBy(col("topic_id")).agg(count(lit(1)).as("strength"))
      .orderBy(desc("strength"), col("topic_id"))
      .select(col("topic_id")).limit(capPerBranch)

    viaChunks.union(entityOverlap).distinct()
      .join(visited.select(col("topic_id")), Seq("topic_id"), "left_anti")
  }

  /** Full beam: `depth` expansion rounds, each scored by cosine against the
    * query and truncated to `beamWidth`. Returns (topic_id, score, depth). */
  def search(g: GraphTables, seedTopics: DataFrame, queryEmbedding: Seq[Double],
             beamWidth: Int = 100, depth: Int = 3): DataFrame =
   graft.ops.Joins.boundedLoop(seedTopics.sparkSession) {
    val topicEmb = g.topicEmbeddings
    val topicEntities = Some(g.topicEntities)
    def score(topics: DataFrame): DataFrame =
      topics.join(topicEmb, Seq("topic_id"))
        .select(col("topic_id"),
          BeamCos(topics.sparkSession)(
            col("embedding"), typedLit(queryEmbedding)).as("score"))

    var frontier = graft.ops.Joins.localize(
      seedTopics.select(col("topic_id")).distinct())
    // visited = union of the driver-local per-depth layers: a union of
    // LocalRelations stays local, so the visited anti-join broadcasts
    // without launching a job.
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    var acc = score(frontier).withColumn("depth", lit(0))
    for (d <- 1 to depth) {
      val visited = layers.reduce(_ union _)
      val next = expandOnce(g, frontier, visited, topicEntities = topicEntities)
      val scored = graft.ops.Joins.localize(score(next)
        .orderBy(desc("score"), col("topic_id")).limit(beamWidth))
      acc = acc.union(scored.withColumn("depth", lit(d)))
      frontier = scored.select(col("topic_id"))
      layers += frontier
    }
    acc
   }
}

/**
 * The four beam scoring modes (reference beam_search_base.py:46-92 /
 * processor_args.py ec_scoring_mode): candidates arrive as
 * (id, embedding, parent_id, parent_embedding) pairs — a node reached from
 * several beam parents is scored per pair and keeps its best score, the
 * DataFrame equivalent of the reference's priority queue taking the highest
 * re-queued entry.
 */
object BeamScoring {

  val Modes = Seq("cosine", "path_weighted", "path_propagated", "attention")

  /** Score candidate pairs against the query; returns (id, score) with the
    * max over parents. All four modes are single-pass column expressions;
    * `attention` adds one window (softmax over each parent's candidate
    * batch — the reference normalizes over exactly that batch).
    *
    * `carry` names columns functionally determined by `id` (e.g. the
    * candidate's own embedding) to pass through the max-over-parents
    * aggregate via `first` — every row of an id group holds the identical
    * value, so the pick is value-deterministic. The beams carry the
    * embedding so the next depth's parent side is assembled from the
    * localized winners instead of re-scanning the embedding table. */
  def score(pairs: DataFrame, queryEmbedding: Seq[Double],
            mode: String = "cosine", carry: Seq[String] = Nil): DataFrame = {
    require(Modes.contains(mode), s"unknown scoring mode $mode")
    val q = typedLit(queryEmbedding)
    val cosC = BeamCos(pairs.sparkSession) _
    val qCos = cosC(col("embedding"), q)
    val scored = mode match {
      case "cosine" =>
        pairs.withColumn("pair_score", qCos)
      case "path_weighted" => // cos(q,n) * (1 + cos(p,n)) / 2
        pairs.withColumn("pair_score",
          qCos * (lit(1.0) + cosC(col("embedding"), col("parent_embedding"))) / 2)
      case "path_propagated" => // cos(q,p) * cos(p,n)
        pairs.withColumn("pair_score",
          cosC(col("parent_embedding"), q) *
            cosC(col("embedding"), col("parent_embedding")))
      case "attention" => // cos(q,n) * (1 + softmax_parent(dot(n,p)/sqrt(d)))
        val dim = queryEmbedding.size
        val logit = V.dot(col("embedding"), col("parent_embedding")) /
          math.sqrt(dim.toDouble)
        val w = Window.partitionBy(col("parent_id"))
        val centered = logit - max(logit).over(w)
        // softmax denominator as a sorted fold: a plain window sum adds in
        // partition order, which is run- and engine-dependent; batches are
        // candidate-cap bounded, so the per-row list is small
        val denom = aggregate(
          sort_array(collect_list(exp(centered)).over(w)),
          lit(0.0), (acc, v) => acc + v)
        pairs.withColumn("_attn", exp(centered) / denom)
          .withColumn("pair_score", qCos * (lit(1.0) + col("_attn")))
          .drop("_attn")
    }
    val aggs = max(col("pair_score")).as("score") +:
      carry.map(c => first(col(c)).as(c))
    scored.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }
}

/**
 * Semantic chunk beam search (reference semantic_chunk_beam_search.py:13-120:
 * width 10, depth 3): chunk neighbors are chunks sharing the frontier
 * chunk's strongest entities — chunk → statements → supporting facts →
 * entities (top per chunk by global degree) → other chunks mentioning those
 * entities, ranked by shared-entity count. Each depth is one Spark job over
 * the (beamWidth-bounded) frontier; candidates carry their beam parent so
 * every [[BeamScoring]] mode can score the (parent, candidate) pair.
 */
object ChunkBeamSearch {

  /** chunk → entity projection — delegates to the graph's cached member
    * (the SUBJECT|OBJECT … MENTIONED_IN chain; see
    * [[graft.index.GraphTables.chunkEntities]]). */
  def chunkEntities(g: GraphTables): DataFrame = g.chunkEntities

  /** One expansion: per frontier chunk take its `topEntities` strongest
    * entities (global degree — the reference's per-chunk entity score
    * query), find chunks sharing them, rank by shared count, cap, drop
    * visited. Returns (parent_id, chunk_id, strength). */
  def expandOnce(g: GraphTables, frontier: DataFrame, visited: DataFrame,
                 ce: DataFrame, topEntities: Int = 5,
                 cap: Int = 20,
                 degrees: Option[DataFrame] = None): DataFrame = {
    val f = broadcast(frontier.select(col("chunk_id").as("parent_id")).distinct())
    // pass precomputed degrees when looping — recomputing the global degree
    // aggregation every depth is the slow path
    val degree = degrees.getOrElse(EntityContextProvider.entityScores(g))
    val frontierEntities = ce.join(f, col("chunk_id") === col("parent_id"))
      .join(degree, Seq("entity_id"), "left")
      .withColumn("erank", row_number().over(
        Window.partitionBy(col("parent_id"))
          .orderBy(desc("score"), col("entity_id"))))
      .filter(col("erank") <= topEntities)
      .select(col("parent_id"), col("entity_id"))
    val candidates = ce
      .join(broadcast(frontierEntities), Seq("entity_id"))
      .filter(col("chunk_id") =!= col("parent_id"))
      .groupBy(col("parent_id"), col("chunk_id"))
      .agg(count(lit(1)).as("strength"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("parent_id"))
          .orderBy(desc("strength"), col("chunk_id"))))
      .filter(col("crank") <= cap)
      .drop("crank")
    candidates.join(visited.select(col("chunk_id")), Seq("chunk_id"), "left_anti")
  }

  /** Full beam: (chunk_id, score, depth), width-bounded per depth. */
  def search(g: GraphTables, seedChunks: DataFrame, queryEmbedding: Seq[Double],
             beamWidth: Int = graft.model.Defaults.ChunkBeamWidth,
             depth: Int = graft.model.Defaults.ChunkBeamDepth,
             scoringMode: String = "cosine"): DataFrame =
   graft.ops.Joins.boundedLoop(seedChunks.sparkSession) {
    // both projections are cached graph members (pre-built store views) —
    // no per-query materialization
    val ce = g.chunkEntities
    val degrees = Some(g.entityDegrees)
    val emb = g.chunks.select(col("chunk_id"), col("embedding"))
    // winners are localized WITH their embeddings: the next depth's parent
    // side is then assembled from driver rows (a LocalRelation broadcast —
    // no job) instead of re-scanning the embedding table every depth
    var scored = graft.ops.Joins.localize(
      seedChunks.select(col("chunk_id")).distinct().join(emb, Seq("chunk_id"))
        .select(col("chunk_id"),
          BeamCos(seedChunks.sparkSession)(
            col("embedding"), typedLit(queryEmbedding)).as("score"),
          col("embedding")))
    var frontier = scored.select(col("chunk_id"))
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    var acc = scored.select(col("chunk_id"), col("score"))
      .withColumn("depth", lit(0))
    for (d <- 1 to depth) {
      val visited = layers.reduce(_ union _)
      val cands = expandOnce(g, frontier, visited, ce, degrees = degrees)
        .join(emb, Seq("chunk_id"))
        .join(broadcast(scored
          .select(col("chunk_id").as("parent_id"),
            col("embedding").as("parent_embedding"))), Seq("parent_id"))
        .select(col("chunk_id").as("id"), col("embedding"),
          col("parent_id"), col("parent_embedding"))
      scored = graft.ops.Joins.localize(
        BeamScoring.score(cands, queryEmbedding, scoringMode,
            carry = Seq("embedding"))
          .orderBy(desc("score"), col("id")).limit(beamWidth)
          .select(col("id").as("chunk_id"), col("score"), col("embedding")))
      acc = acc.union(scored.select(col("chunk_id"), col("score"))
        .withColumn("depth", lit(d)))
      frontier = scored.select(col("chunk_id"))
      layers += frontier
    }
    acc
   }
}

/**
 * Statement beam search (the reference's semantic statement beam family,
 * retrieval/retrievers/deprecated/semantic_beam_search.py): statement
 * neighbors are statements supported by a shared fact, plus the intra-topic
 * PREVIOUS linked-list neighbors. Same width/depth/scoring contract as the
 * chunk beam.
 */
object StatementBeamSearch {

  /** One expansion: fact-sharing statements + prev/next linked statements.
    * Returns (parent_id, statement_id). */
  def expandOnce(g: GraphTables, frontier: DataFrame,
                 visited: DataFrame, cap: Int = 20): DataFrame = {
    val f = broadcast(frontier.select(col("statement_id").as("parent_id")).distinct())
    val viaFacts = g.factSupports
      .join(f, col("statement_id") === col("parent_id"))
      .select(col("parent_id"), col("fact_id"))
      .join(g.factSupports, Seq("fact_id"))
      .filter(col("statement_id") =!= col("parent_id"))
      .select(col("parent_id"), col("statement_id"))
    val linked = g.statements
      .join(f, col("prev_statement_id") === col("parent_id"))
      .select(col("parent_id"), col("statement_id"))
      .union(g.statements
        .join(f, col("statement_id") === col("parent_id"))
        .select(col("parent_id"), col("prev_statement_id").as("statement_id"))
        .filter(col("statement_id").isNotNull))
    // dedup + per-parent cap in ONE exchange: collect_set unions partially
    // map-side, sort_array + slice keep the cap smallest ids — row-identical
    // to distinct + row_number ≤ cap but without the second shuffle. The
    // per-parent agg buffer holds that parent's distinct candidate set; the
    // frontier is width-bounded (≤ beamWidth parents), so a hub fact costs
    // one task a bounded set, not a repartition of the whole candidate pool.
    viaFacts.union(linked)
      .groupBy(col("parent_id"))
      .agg(slice(sort_array(collect_set(col("statement_id"))), 1, cap).as("_s"))
      .select(col("parent_id"), explode(col("_s")).as("statement_id"))
      .join(visited.select(col("statement_id")), Seq("statement_id"), "left_anti")
  }

  /** Full beam: (statement_id, score, depth). */
  def search(g: GraphTables, seedStatements: DataFrame,
             queryEmbedding: Seq[Double],
             beamWidth: Int = 10, depth: Int = 3,
             scoringMode: String = "cosine"): DataFrame =
   graft.ops.Joins.boundedLoop(seedStatements.sparkSession) {
    val emb = g.statements.select(col("statement_id"), col("embedding"))
    // localized winners carry their embeddings — see ChunkBeamSearch.search
    var scored = graft.ops.Joins.localize(
      seedStatements.select(col("statement_id")).distinct()
        .join(emb, Seq("statement_id"))
        .select(col("statement_id"),
          BeamCos(seedStatements.sparkSession)(
            col("embedding"), typedLit(queryEmbedding)).as("score"),
          col("embedding")))
    var frontier = scored.select(col("statement_id"))
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    var acc = scored.select(col("statement_id"), col("score"))
      .withColumn("depth", lit(0))
    for (d <- 1 to depth) {
      val visited = layers.reduce(_ union _)
      val cands = expandOnce(g, frontier, visited)
        .join(emb, Seq("statement_id"))
        .join(broadcast(scored
          .select(col("statement_id").as("parent_id"),
            col("embedding").as("parent_embedding"))), Seq("parent_id"))
        .select(col("statement_id").as("id"), col("embedding"),
          col("parent_id"), col("parent_embedding"))
      scored = graft.ops.Joins.localize(
        BeamScoring.score(cands, queryEmbedding, scoringMode,
            carry = Seq("embedding"))
          .orderBy(desc("score"), col("id")).limit(beamWidth)
          .select(col("id").as("statement_id"), col("score"),
            col("embedding")))
      acc = acc.union(scored.select(col("statement_id"), col("score"))
        .withColumn("depth", lit(d)))
      frontier = scored.select(col("statement_id"))
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

  /** Degree score per entity — delegates to the graph's cached member
    * (reference entity_context_provider.py:126-141). */
  def entityScores(g: GraphTables): DataFrame = g.entityDegrees

  /** Expand the relation graph from seeds up to `maxDepth`, excluding
    * `exclude` ids; returns (entity_id, depth) of the context tree. */
  def expand(g: GraphTables, seeds: DataFrame,
             maxDepth: Int = graft.model.Defaults.EcMaxDepth,
             exclude: Option[DataFrame] = None): DataFrame = {
    val excl = exclude.map(_.select(col("entity_id")).distinct())
    var frontier = seeds.select(col("entity_id")).distinct()
    excl.foreach(e => frontier = frontier.join(e, Seq("entity_id"), "left_anti"))
    // unlike the topic beam there is no width cap, so the frontier can grow
    // with graph density: gate the broadcast on the counted layer size and
    // stop early once a layer drains (persist fused into the count job)
    var (frontier2, n) = graft.ops.Joins.checkpointCount(frontier)
    frontier = frontier2
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
      val (f, c) = graft.ops.Joins.checkpointCount(next)
      frontier = f; n = c
      if (n > 0) visited = visited.union(frontier.withColumn("depth", lit(d)))
    }
    visited
  }
}
