package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph projection, link prediction, and partition-quality scoring over
 * the derived property graphs — the analysis layer a KGQA store runs to
 * propose missing edges (reference byokg graph retrievers rank EXISTING
 * neighborhoods; these score candidate NEW links) and to audit a
 * community assignment (graft.byokg.Traversal.labelPropagation).
 *
 * All three operators share one scale discipline: the quadratic step
 * (neighbor pairing) is generated per CENTER node and the center degree is
 * capped — Σ min(deg, cap)² bounds the blow-up, and dropping hub centers
 * is the standard, documented lever (a hub's co-occurrence pairs carry no
 * signal: everything co-occurs with everything through it). Everything
 * else is equi-joins + map-side-combinable integer aggregates; scores
 * accumulate in integer micro-units so sums are order-independent and
 * replay exactly in SQL.
 */
object LinkPrediction {

  /**
   * Project a bipartite incidence frame (left, right) onto weighted
   * left–left co-occurrence edges: weight = number of distinct shared
   * right nodes, keeping only rights with degree ≤ `maxRightDegree`
   * (the hub cap). Returns (a, b, weight) with a < b.
   *
   * The self-join keys on the right column, so both sides share one
   * exchange (ReusedExchange at runtime); the cap bounds the pair fan-out
   * per right node at cap², which is what makes the projection linear-ish
   * on power-law incidence at 100 TB.
   */
  def projectBipartite(incidence: DataFrame, leftCol: String,
                       rightCol: String, maxRightDegree: Int): DataFrame = {
    require(maxRightDegree >= 2,
      s"maxRightDegree must be >= 2, got $maxRightDegree")
    val inc = incidence.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
    val keep = inc.groupBy(col("r")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxRightDegree && col("deg") >= 2)
      .select("r")
    val bounded = inc.join(keep, "r")
    bounded.as("x").join(bounded.as("y"),
        col("x.r") === col("y.r") && col("x.l") < col("y.l"))
      .groupBy(col("x.l").as("a"), col("y.l").as("b"))
      .agg(count(lit(1)).as("weight"))
  }

  /**
   * Adamic–Adar link prediction over an undirected edge set: for each
   * non-adjacent pair (a, b), score = Σ_{z ∈ N(a) ∩ N(b)} 1/ln(deg z),
   * accumulated as round(1e6/ln(deg z)) micro-unit integers (order-
   * independent sums, exact SQL replay — the BIGINT micro-unit
   * discipline). Centers with degree < 2 contribute nothing (ln 1 = 0);
   * centers with degree > `maxCenterDegree` are dropped (the hub cap —
   * a hub's 1/ln(deg) term is also the smallest, so the cap removes the
   * most pairs and the least score). Existing edges are anti-joined out:
   * the operator proposes NEW links only. Returns
   * (a, b, common_neighbors, aa_micro) with a < b.
   */
  /** `orientedInput = true` asserts the caller's frame is already unique
    * oriented pairs (src < dst, no duplicates — e.g. a
    * [[projectBipartite]] result), skipping the defensive dedup shuffles
    * over the doubled edge frame. */
  def adamicAdar(edges: DataFrame, maxCenterDegree: Int,
                 orientedInput: Boolean = false): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val und =
      if (orientedInput)
        edges.select(col("src"), col("dst"))
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      else {
        val e = edges.select(col("src"), col("dst")).distinct()
          .filter(col("src") =!= col("dst"))
        e.union(e.select(col("dst"), col("src")).toDF("src", "dst"))
          .distinct()
      }
    // (center, neighbor) view with the center's degree + capped centers
    val deg = und.groupBy(col("src").as("z")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxCenterDegree)
    val star = und.join(deg, und("src") === deg("z"))
      .select(col("z"), col("dst").as("n"),
        round(lit(1000000.0) / log(col("deg"))).cast("long").as("term"))
    val pairs = star.as("x").join(star.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("a"), col("y.n").as("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("x.term")).as("aa_micro"))
    // propose NEW links only: drop pairs already adjacent (und holds both
    // directions, so one orientation check suffices under a < b)
    pairs.join(und.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
  }

  /**
   * Jaccard neighborhood-overlap link prediction over an undirected edge
   * set: for each non-adjacent pair (a, b),
   * jac = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, emitted as exact integers
   * (common_neighbors, union_size) plus round(1e6·jac) micro-units — one
   * double division per output row, bit-identical in any IEEE engine.
   * Wedges are generated per CENTER with the same degree cap as
   * [[adamicAdar]] (common counts over centers with 2 ≤ deg ≤ cap; hub
   * wedges dropped), while union sizes use the EXACT uncapped degrees —
   * so under a cap the score is a lower bound, and with
   * `maxCenterDegree` ≥ the max degree it is the exact Jaccard. Returns
   * (a, b, common_neighbors, union_size, jac_micro) with a < b.
   */
  def jaccardLinks(edges: DataFrame, maxCenterDegree: Int,
                   orientedInput: Boolean = false): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val und =
      if (orientedInput)
        edges.select(col("src"), col("dst"))
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      else {
        val e = edges.select(col("src"), col("dst")).distinct()
          .filter(col("src") =!= col("dst"))
        e.union(e.select(col("dst"), col("src")).toDF("src", "dst"))
          .distinct()
      }
    val fullDeg = und.groupBy(col("src").as("z")).agg(count(lit(1)).as("deg"))
    val capped = fullDeg.filter(col("deg") >= 2 &&
      col("deg") <= maxCenterDegree).select("z")
    val star = und.join(capped, und("src") === capped("z"))
      .select(col("z"), col("dst").as("n"))
    val pairs = star.as("x").join(star.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("a"), col("y.n").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
    // exact union from the uncapped endpoint degrees; both joins are on
    // the node key the degree frame is already aggregated on
    pairs
      .join(fullDeg.select(col("z").as("a"), col("deg").as("_da")), "a")
      .join(fullDeg.select(col("z").as("b"), col("deg").as("_db")), "b")
      .withColumn("union_size",
        col("_da") + col("_db") - col("common_neighbors"))
      .withColumn("jac_micro",
        round(lit(1000000.0) * col("common_neighbors") / col("union_size"))
          .cast("long"))
      .drop("_da", "_db")
      .join(und.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
  }

  /**
   * Exact per-community modularity terms of a node→community assignment
   * over an undirected edge set. With 2m = |directed rows|, d_c = degree
   * sum of community c, and int_c = directed rows internal to c:
   * Q = Σ_c (2m·int_c − d_c²) / (2m)² — the numerator is exact int64
   * (q_num), so the only float op is ONE final division, bit-identical in
   * any IEEE engine. Returns per community:
   * (community, internal_edges, degree_sum, modularity_term) plus exact
   * q_num; Q itself is sum(modularity_term).
   *
   * One join of the edge frame against the assignment per endpoint (same
   * key both times), one hash aggregate — no quadratic step at all, so
   * this scores a 100 TB assignment at the cost of two shuffles. Fully
   * LAZY: the 2m scalar is Σ degree_sum over the (small) per-community
   * frame itself, attached as a broadcast cross join — no eager count()
   * pass over the edge frame.
   */
  def modularityTerms(edges: DataFrame, assign: DataFrame,
                      nodeCol: String = "node",
                      communityCol: String = "community"): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .filter(col("src") =!= col("dst"))
    val und = e.union(e.select(col("dst"), col("src")).toDF("src", "dst"))
      .distinct()
    val a = assign.select(col(nodeCol).as("_n"), col(communityCol).as("_c"))
    val labeled = und
      .join(a.select(col("_n"), col("_c").as("ca")), und("src") === col("_n"))
      .drop("_n")
      .join(a.select(col("_n"), col("_c").as("cb")), und("dst") === col("_n"))
      .drop("_n")
    val perC = labeled
      .groupBy(col("ca").as(communityCol))
      .agg((sum(when(col("ca") === col("cb"), 1L).otherwise(0L)) / 2)
          .cast("long").as("internal_edges"),
        count(lit(1)).as("degree_sum"))
    // 2m == Σ degree_sum: recover the scalar from the aggregate itself and
    // attach it as a broadcast 1-row cross join (the bm25-stats pattern)
    val tot = perC.agg(sum(col("degree_sum")).as("_m2"))
    perC.crossJoin(broadcast(tot))
      .withColumn("q_num",
        col("_m2") * col("internal_edges") * 2 -
          col("degree_sum") * col("degree_sum"))
      .withColumn("modularity_term",
        col("q_num").cast("double") /
          (col("_m2").cast("double") * col("_m2").cast("double")))
      .drop("_m2")
  }
}
