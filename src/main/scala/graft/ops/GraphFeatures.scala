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
}
