package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{CosineSimilarity, VectorFunctions => V, HashFunctions => H}

/**
 * Similarity search over an embedding column.
 *
 * Brute-force top-k is the exact baseline (the reference's pgvector path is
 * the same scan: `embedding <-> q ORDER BY score LIMIT k`,
 * reference pg_vector_indexes.py:539-542). `orderBy(desc).limit(k)` compiles
 * to TakeOrderedAndProject — a per-partition top-k heap plus a driver merge,
 * no global sort, so it scales linearly with executors.
 *
 * The IVF variant is the 100 TB path: assign every vector to its nearest of
 * `nlist` deterministic centroids once (one narrow pass), then probe only
 * `nprobe` cells per query — candidate set shrinks by ~nlist/nprobe.
 */
object Similarity {

  /** The codegen'd cosine (bit-identical to the composed fold, no
    * intermediate arrays); registers the expression on first use. */
  private def cos(df: DataFrame)(a: Column, b: Column): Column = {
    CosineSimilarity.register(df.sparkSession)
    CosineSimilarity.cosine(a, b)
  }

  /** Exact brute-force cosine top-k. Ties broken by id for determinism. */
  def topK(index: DataFrame, embCol: String, idCol: String,
           query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    index
      .select(col(idCol).as("id"), cos(index)(col(embCol), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /**
   * Metadata-filtered exact top-k — the reference's
   * `top_k(query_bundle, top_k, filter_config)` surface
   * (opensearch_vector_indexes.py:807-870 compiles FilterConfig into the
   * k-NN query's filter clause; pg_vector_indexes.py:539-542 renders it as
   * a SQL WHERE). On Spark the algebra compiles ONCE to a `Column` applied
   * BELOW the scoring projection, so Catalyst pushes the predicate into the
   * parquet scan (PushedFilters) — candidates shrink before any cosine is
   * computed, and with a partition / z-order layout on the filter key the
   * predicate becomes file pruning: the 100 TB shape is "read only the
   * matching row groups, score those", never "score then filter".
   *
   * `resolve` maps filter keys to columns (identity for flat tables,
   * `k => col("metadata")(k)` for map-typed metadata — same contract as
   * [[graft.filter.FilterAst.compile]]).
   */
  def filteredTopK(index: DataFrame, embCol: String, idCol: String,
                   filter: graft.filter.FilterAst.Filter,
                   query: Seq[Double], k: Int,
                   resolve: String => Column = col): DataFrame =
    topK(index.filter(graft.filter.FilterAst.compile(filter, resolve)),
      embCol, idCol, query, k)

  /** [[filteredTopK]] down the IVF path: the filter prunes INSIDE the probed
    * cells (both predicates reach the same scan), so cost stays
    * ~nprobe/nlist of the filtered corpus. Same recall contract as
    * [[ivfTopK]] — exact at nprobe = nlist. */
  def ivfFilteredTopK(assigned: DataFrame, embCol: String, idCol: String,
                      filter: graft.filter.FilterAst.Filter,
                      query: Seq[Double], k: Int, nlist: Int, nprobe: Int,
                      resolve: String => Column = col): DataFrame =
    ivfTopK(assigned.filter(graft.filter.FilterAst.compile(filter, resolve)),
      embCol, idCol, query, k, nlist, nprobe)

  /** Cosine top-k with per-group diversity: over-fetch k*diversityFactor, then
    * round-robin across `groupCol` (reference vector_utils.py:109-172's
    * get_diverse_vss_elements as a rank-then-sort window, no driver loop). */
  def diverseTopK(index: DataFrame, embCol: String, idCol: String,
                  groupCol: String, query: Seq[Double], k: Int,
                  diversityFactor: Int = 5): DataFrame = {
    val q = typedLit(query)
    val fetched = index
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        cos(index)(col(embCol), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k * diversityFactor)
    val w = Window.partitionBy(col("grp")).orderBy(desc("score"), col("id"))
    fetched
      .withColumn("rr", row_number().over(w))
      .orderBy(col("rr"), desc("score"), col("id"))
      .limit(k)
  }

  /**
   * Maximal-marginal-relevance top-k (Carbonell & Goldstein 1998): greedy
   * selection maximizing `lambda·rel(c) − (1−lambda)·max_{s∈selected}
   * cos(c, s)` — the diversity re-rank that penalizes redundancy by actual
   * pairwise similarity, where [[diverseTopK]] only round-robins a group
   * column. The distributed part is the prefetch (brute-force cosine
   * top-`prefetch`, a TakeOrderedAndProject over the whole index); the
   * greedy loop runs driver-side over the prefetched candidates — k·n²
   * cosines over at most `maxPrefetch` rows, the same candidates-collected
   * shape as the reference's rerankers (and [[knnJoin]]'s cap contract:
   * refuse loudly rather than quietly melt the driver). Every double op
   * (sequential dot-product fold, λ-blend) mirrors the oracle's
   * list_reduce arithmetic, so q_mmr_topk is a bit-exact hash gate.
   * Reference contract: vector_utils.py get_diverse_vss_elements is the
   * grouped approximation of this; MMR is the principled form.
   */
  def mmrTopK(index: DataFrame, embCol: String, idCol: String,
              query: Seq[Double], k: Int, prefetch: Int = 50,
              lambda: Double = 0.5, maxPrefetch: Int = 10000): DataFrame = {
    require(k >= 1 && prefetch >= k,
      s"need k >= 1 and prefetch >= k; got k=$k prefetch=$prefetch")
    require(prefetch <= maxPrefetch,
      s"prefetch=$prefetch exceeds maxPrefetch=$maxPrefetch — MMR collects " +
        "candidates driver-side; raise maxPrefetch only with driver memory to match")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val q = typedLit(query)
    val spark = index.sparkSession
    val cands = index
      .select(col(idCol).cast("long").as("id"),
        graft.functions.VectorFunctions.toDouble(col(embCol)).as("emb"),
        cos(index)(col(embCol), q).as("rel"))
      .orderBy(desc("rel"), col("id"))
      .limit(prefetch)
      .collect()
    val ids = cands.map(_.getLong(0))
    val embs = cands.map(_.getSeq[Double](1).toArray)
    val rels = cands.map(_.getDouble(2))
    // sequential left fold, index order — bit-identical to the oracle's
    // list_reduce and to the compiled CosineSimilarity
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0.0) 0.0 else dot / n
    }
    val n = ids.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Int)]
    for (rank <- 1 to math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      for (c <- 0 until n if !selected.contains(c)) {
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cosine(embs(c), embs(s))).max
        val sc = lambda * rels(c) - (1.0 - lambda) * maxSim
        if (sc > bestScore || (sc == bestScore && best >= 0 && ids(c) < ids(best))) {
          best = c; bestScore = sc
        }
      }
      selected += best
      out += ((ids(best), rels(best), bestScore, rank))
    }
    import spark.implicits._
    out.toSeq.toDF("id", "rel", "mmr", "rank")
  }

  /** Deterministic centroids: hash-projection vectors, unit-normalized. */
  private def centroid(c: Int, dim: Int): Seq[Double] = {
    val raw = (0 until dim).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ivf#$c#$i".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(h).getLong & 0x0fffffffffffffffL
      v.toDouble / 1.152921504606847e18 * 2.0 - 1.0
    }
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  /** Assign each vector to its nearest centroid cell (one pass, no shuffle). */
  def ivfAssign(index: DataFrame, embCol: String, nlist: Int, dim: Int): DataFrame = {
    val cents = (0 until nlist).map(c => typedLit(centroid(c, dim)))
    val scored = array(cents.zipWithIndex.map { case (ct, i) =>
      struct(V.dot(col(embCol), ct).as("s"), lit(i).as("cell"))
    }: _*)
    val best = aggregate(scored,
      struct(lit(Double.MinValue).as("s"), lit(-1).as("cell")),
      (acc, s) => when(s("s") > acc("s"), s).otherwise(acc))
    index.withColumn("ivf_cell", best("cell"))
  }

  /** IVF top-k: probe the `nprobe` cells whose centroids best match the query.
    * Approximate (recall < 1 when the true neighbor lives in an unprobed cell). */
  def ivfTopK(assigned: DataFrame, embCol: String, idCol: String,
              query: Seq[Double], k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val dim = query.length
    val probeCells = (0 until nlist)
      .map(c => c -> centroid(c, dim).zip(query).map { case (a, b) => a * b }.sum)
      .sortBy(-_._2).take(nprobe).map(_._1)
    val q = typedLit(query)
    assigned
      .filter(col("ivf_cell").isin(probeCells: _*))
      .select(col(idCol).as("id"), cos(assigned)(col(embCol), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** Exact k-NN join: for each left row, its k nearest right rows by cosine.
    * Quadratic — for bounded right sides (broadcast) or verification only;
    * the bound is enforced via `maxRightRows` (an unbounded right side
    * would OOM the driver's broadcast at scale). Route large right sides
    * through [[ivfTopK]] instead.
    *
    * `excludeSelf` (default true) drops pairs with equal ids — correct for
    * the self-join case. Pass false when left and right are DIFFERENT
    * tables whose id spaces merely collide, or a true neighbor that happens
    * to share a query's id is silently dropped. */
  def knnJoin(left: DataFrame, right: DataFrame, embCol: String, idCol: String,
              k: Int, maxRightRows: Long = 100000L,
              excludeSelf: Boolean = true): DataFrame = {
    val l = left.select(col(idCol).as("qid"), col(embCol).as("q_emb"))
    val r = right.select(col(idCol).as("nid"), col(embCol).as("n_emb"))
    val n = r.count()
    require(n <= maxRightRows,
      s"knnJoin is exact-quadratic: right side has $n rows, over " +
        s"maxRightRows=$maxRightRows; use ivfTopK or raise the cap " +
        "explicitly for a verification run")
    // per-query top-k as a k-bounded heap aggregate (TopKAgg): the |L|×|R|
    // scored pairs heap down to ≤ k rows per query in O(n log k) with no
    // sort — the window formulation sorts the full score matrix map-side
    // before its group limit, and again after the shuffle
    val scored = l.crossJoin(Joins.gatedBroadcast(r, n))
      .filter(if (excludeSelf) col("qid") =!= col("nid") else lit(true))
      .withColumn("score", cos(l)(col("q_emb"), col("n_emb")))
      .select(col("qid"), col("nid"), col("score"))
    graft.functions.TopKAgg.topKPerKeyRanked(scored, Seq("qid"),
      Seq(negate(col("score")), col("nid")), k, "rk")
      .select(col("qid"), col("nid"), col("score"), col("rk"))
  }

  /**
   * Johnson-Lindenstrauss sign random projection (Achlioptas 2003):
   * out_j = Σ_i s_ji · x_i / √outDim with s_ji = ±1 from the md5-seeded
   * hash — the dimensionality-reduction lever that cuts ANN scan
   * bandwidth dim/outDim× while preserving pairwise angles within the JL
   * distortion bound (DedupSimilaritySpec measures it).
   *
   * The ±1/√outDim weights depend only on (seed, j, i), so they are
   * computed ONCE on the driver and embedded as literal arrays — the
   * projection is `outDim` compiled dot_product loops over each row, a
   * single codegen stage with no shuffle (the embeddingNearDup
   * hyperplane discipline). Deterministic ascending-index folds make the
   * projected doubles replay bit-identically in SQL.
   */
  def randomProject(df: DataFrame, embCol: String, idCol: String,
                    dim: Int, outDim: Int,
                    seed: String = "jl"): DataFrame = {
    require(outDim > 0 && outDim <= dim,
      s"outDim=$outDim must be in [1, dim=$dim]")
    graft.functions.DotProduct.register(df.sparkSession)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val comps = (0 until outDim).map { j =>
      val w = Array.tabulate(dim) { i =>
        if (jlHash(seed, j, i) % 2 == 0) scale else -scale
      }
      graft.functions.DotProduct.dot(V.toDouble(col(embCol)), typedLit(w))
    }
    df.select(col(idCol).as("id"), array(comps: _*).as("proj"))
  }

  /** Driver-side replica of `H.h60("{seed}#{j}#{i}")` (the planeWeight
    * discipline: md5 hex → first 15 chars → base-16 long, identical to
    * the DuckDB oracle's `('0x'||substr(md5(...),1,15))::BIGINT`). */
  private def jlHash(seed: String, j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed#$j#$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}
