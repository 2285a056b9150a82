package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph-derived ML features — the feature-engineering step between the
 * lexical graph store and model training (GraphSAGE-style neighborhood
 * aggregation: an entity's dense representation is the mean of its
 * neighboring statements' embeddings, the same statement-pooled entity
 * embedding the reference's dense entity-linking path builds its index
 * from; byokg-rag graph_connectors embed entity descriptions — pooling
 * mentions is the store-side equivalent).
 */
object GraphFeatures {

  /**
   * Per-node mean of neighbor embeddings, exact and layout-independent:
   * each dimension quantizes to integer micro-units (`floor(x·10⁶+0.5)`,
   * the corpusRollup discipline) BEFORE aggregation, so the sums are
   * exact longs that commute across any partitioning and the mean
   * replays bit-identically in SQL.
   *
   * Plan shape: one equi-join (edges ⋈ embeddings on the neighbor key)
   * feeding ONE hash aggregate with `dim` codegen'd long-sum slots —
   * map-side combined, O(dim) state per node, no posexplode of the
   * embedding into dim× shuffle rows (the naive (node, dim, value)
   * unpivot would multiply the shuffle by 64). The unpivot to
   * (node, dim, mean) rows happens AFTER aggregation, on |nodes| rows.
   *
   * Output: (node, n_nbrs, dim, mean) — mean quantized half-up to the
   * nearest micro via `floor(ssum/n + 0.5)`, NOT `round(..., 6)`: integer
   * micro sums divided by integer counts land exactly on half-micros
   * (ssum ≡ n/2 mod n), where Spark's round (BigDecimal HALF_UP over the
   * shortest decimal string) and DuckDB's C-style rounding disagree —
   * floor is a pure IEEE op, bit-identical on both engines.
   */
  def neighborMeanEmbedding(edges: DataFrame, nodeCol: String,
                            nbrCol: String, emb: DataFrame, idCol: String,
                            embCol: String, dim: Int): DataFrame = {
    require(dim > 0 && dim <= 4096, s"unreasonable embedding dim $dim")
    val joined = edges
      .select(col(nodeCol).as("node"), col(nbrCol).as("_nbr"))
      .join(emb.select(col(idCol).as("_nbr"), col(embCol).as("_e")), "_nbr")
    val aggs = count(lit(1)).as("n_nbrs") +: (0 until dim).map { i =>
      sum(floor(element_at(col("_e"), i + 1) * lit(1e6) + lit(0.5))
        .cast("long")).as(s"_s$i")
    }
    joined.groupBy(col("node"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("node"), col("n_nbrs"),
        posexplode(array((0 until dim).map(i => col(s"_s$i")): _*))
          .as(Seq("dim", "_ssum")))
      .select(col("node"), col("n_nbrs"), col("dim").cast("int").as("dim"),
        (floor(col("_ssum").cast("double") / col("n_nbrs") + lit(0.5))
          .cast("long").cast("double") / lit(1e6)).as("mean"))
  }

  /**
   * Skip-gram training pairs from a walk corpus
   * ([[graft.byokg.Traversal.randomWalks]] output: (start, wid, step,
   * node), steps ≥ 1): each walk is the sentence [start, n₁, …], and
   * every ordered position pair within `window` emits (center, context) —
   * the word2vec/DeepWalk co-occurrence table, aggregated to counts.
   * The self-join keys on the walk id (start, wid), so fan-out per walk
   * is ≤ len·2w — walk-scale, never graph-scale; the corpus-size shuffle
   * is the final counts aggregate, map-side combined. Walks whose first
   * hop died (no out-edge) contribute no pairs, exactly as a one-token
   * sentence should.
   */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w0 = walks.select(col("start"), col("wid")).distinct()
      .select(col("start"), col("wid"), lit(0).as("pos"),
        col("start").as("node"))
    val sent = w0.union(walks.select(col("start"), col("wid"),
      col("step").cast("int").as("pos"), col("node")))
    sent.as("a").join(sent.as("b"),
        col("a.start") === col("b.start") && col("a.wid") === col("b.wid") &&
          col("a.pos") =!= col("b.pos") &&
          abs(col("a.pos") - col("b.pos")) <= window)
      .groupBy(col("a.node").as("center"), col("b.node").as("context"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * word2vec negative-sampling weights over the same walk corpus: token
   * frequency raised to 3/4, the standard unigram smoothing. n^0.75 is
   * computed as sqrt(n·sqrt(n)) — sqrt and multiply are both correctly
   * rounded IEEE ops, so the weight replays bit-exactly in SQL where a
   * libm pow(x, 0.75) might not. Emits per node
   * (node, n, w_micro, share_e9): w_micro = round(1e6·n^0.75) and the
   * normalized share from the EXACT long total of the micro weights (an
   * integer sum commutes; a double-sum normalizer would be
   * partition-order-dependent).
   */
  def negativeSamplingWeights(walks: DataFrame): DataFrame = {
    val w0 = walks.select(col("start"), col("wid")).distinct()
      .select(col("start").as("node"))
    val counts = w0.union(walks.select(col("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n"))
      .withColumn("w_micro",
        round(lit(1000000.0) *
          sqrt(col("n").cast("double") * sqrt(col("n").cast("double"))))
          .cast("long"))
    val tot = counts.agg(sum(col("w_micro")).as("_tw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_e9",
        round(lit(1.0e9) * col("w_micro").cast("double")
          / col("_tw").cast("double")).cast("long"))
      .select(col("node"), col("n"), col("w_micro"), col("share_e9"))
  }
}
