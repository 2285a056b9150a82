package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/**
 * Vector search + embedding dedup inventory (SURVEY.md §2.3, extended ops).
 *
 * Oracle note: DuckDB's list_cosine_similarity computes in float32, so every
 * oracle recomputes cosine as an explicit double fold
 * (list_sum over list_transform) — bit-identical to the engine's
 * deterministic left-fold in [[graft.functions.VectorFunctions]].
 */
object VectorQueries {
  import Tables.t

  private val Dim = 64

  /** The shared DuckDB double-cosine fragment between columns a/b. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1,${Dim + 1}), i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1,${Dim + 1}), i -> CAST($a[i] AS DOUBLE)*CAST($a[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1,${Dim + 1}), i -> CAST($b[i] AS DOUBLE)*CAST($b[i] AS DOUBLE))))))""".stripMargin

  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 VectorIndex.top_k: brute-force cosine top-k (TakeOrderedAndProject).
    "q_vector_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      Similarity.topK(emb, "embedding", "vec_id", queryVec(s, dir), 10)
        .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
    }),

    // §2.3 VectorIndex.top_k(filter_config): metadata-filtered VSS — the
    // FilterAst algebra compiled into the scan BELOW the scoring projection
    // (reference opensearch_vector_indexes.py:807-870 / pg_vector_indexes
    // .py:539-542 push FilterConfig into the store's k-NN query the same
    // way). PlanShapeSpec proves the label predicate reaches PushedFilters.
    "q_filtered_topk" -> ((s, dir) => {
      import graft.filter.FilterAst._
      val f = And.of(Pred("label", Gte, 2), Pred("label", Lte, 6),
        Not(Pred("label", Eq, 4)))
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      Similarity.filteredTopK(emb, "embedding", "vec_id", f,
        queryVec(s, dir), 10)
        .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
    }),

    // §2.3 get_diverse_vss_elements: over-fetch + per-group round-robin.
    "q_vector_diverse_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      Similarity.diverseTopK(emb, "embedding", "vec_id", "label",
        queryVec(s, dir), 10, 5)
        .select(col("id").as("vec_id"), col("grp").as("label"),
          round(col("score"), 6).as("score"), col("rr"))
    }),

    // extended: int8-quantized cosine top-k — the 100 TB storage path
    // (1 byte/dim, 4x less scan bandwidth; per-vector scales cancel in the
    // cosine so the scan is pure integer math). floor(x+0.5) quantization
    // replays bit-identically in DuckDB.
    "q_vector_quantized" -> ((s, dir) => {
      import graft.functions.{CosineSimilarity, VectorFunctions => V}
      CosineSimilarity.register(s)
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(V.quantizeInt8(col("embedding")).getField("q").as("qq"))
      // compiled cosine over the tinyint arrays: bit-identical to the
      // composed fold (same sequential double accumulation), single fused
      // loop inside whole-stage codegen. Spread: the quantize+cosine scan
      // is the whole query and the single-file scan is one task (§2.5).
      graft.ops.Spread.perRowHeavy(emb.filter(col("vec_id") =!= 0))
        .select(col("vec_id"),
          V.quantizeInt8(col("embedding")).getField("q").as("q"))
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          CosineSimilarity.cosine(col("q"), col("qq")).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // extended: hybrid retrieval — reciprocal-rank fusion of the BM25
    // keyword top-50 (documents) with the cosine vector top-50 (embeddings)
    // over the shared id space (ops.Fusion; the reference's OpenSearch
    // keyword + vector hybrid). Both lists are bounded by construction, so
    // fusion is broadcast-sized at any corpus scale.
    "q_rrf_fusion" -> ((s, dir) => {
      import graft.ops.{Fusion, TextAnalysis}
      val bm = TextAnalysis.bm25(t(s, dir, "documents"), "text", "doc_id",
        Seq("filter", "vector", "merge"), k = 50)
      val bmR = Fusion.withRank(bm, Seq(desc("bm25"), col("id")), "rank")
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val vs = Similarity.topK(emb, "embedding", "vec_id",
        queryVec(s, dir), k = 50)
      val vsR = Fusion.withRank(vs, Seq(desc("score"), col("id")), "rank")
      Fusion.rrf(Seq("text" -> bmR, "vec" -> vsR), "id", "rank",
          rrfK = 60, k = 20)
        .select(col("id").as("doc_id"), round(col("rrf"), 6).as("rrf"),
          col("r_text"), col("r_vec"))
    }),

    // extended: Johnson-Lindenstrauss sign projection 64→16 then cosine
    // top-k in the projected space — the scan-bandwidth lever (4× fewer
    // bytes per vector); driver-precomputed ±0.25 weight literals,
    // compiled dot products, exact SQL replay.
    "q_jl_topk" -> ((s, dir) => {
      val proj = Similarity.randomProject(t(s, dir, "embeddings"),
        "embedding", "vec_id", dim = Dim, outDim = 16, seed = "jl1")
      val qv = proj.filter(col("id") === 0).head().getSeq[Double](1)
      Similarity.topK(proj.filter(col("id") =!= 0), "proj", "id", qv, 10)
        .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
    }),

    // extended: exact k-NN join (per-query top-k neighbors).
    "q_knn_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val left = emb.filter(col("vec_id") < 5)
      Similarity.knnJoin(left, emb, "embedding", "vec_id", 3)
        .select(col("qid"), col("nid"), round(col("score"), 6).as("score"), col("rk"))
        .orderBy(col("qid"), col("rk"))
    }),

    // extended: IVF ANN with nprobe = nlist (exact ⇒ must equal brute force;
    // recall<1 configurations are exercised in ScalaTest instead).
    "q_ivf_topk_full_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val assigned = Similarity.ivfAssign(emb, "embedding", 8, Dim)
      Similarity.ivfTopK(assigned, "embedding", "vec_id", queryVec(s, dir),
        10, 8, 8)
        .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
    }),

    // extended: KMeans-IVF ANN (learned centroids, nprobe=2 of 8 cells —
    // real pruning, not full probe). Uses the deterministic Lloyd's trainer
    // (MlAnn.detKmeansIvf: smallest-id init, ordered-fold means), so the
    // whole train→probe path replays in SQL and the gate is a full hash
    // oracle — the RNG-seeded MLlib variant stays spec-covered in MlAnnSpec.
    // The index is trained once in the warmed Tables layer (like
    // lexicalGraph); the timed query only probes it.
    "q_ivf_kmeans" -> ((s, dir) => {
      val (assigned, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      graft.ops.MlAnn.ivfTopK(assigned, centers, queryVec(s, dir),
        k = 10, nprobe = 2)
        .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
    }),

    // extended: incremental index maintenance — route a batch of arriving
    // vectors into the FROZEN deterministic-KMeans codebook without
    // retraining (MlAnn.assignCells: a pure codegen argmin select, no
    // shuffle, no state — the batch twin of StreamingVectors' ingest).
    // The oracle replays training CTEs + the same argmin tie-break.
    "q_ivf_assign" -> ((s, dir) => {
      val (_, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      graft.ops.MlAnn.assignCells(
          t(s, dir, "embeddings").filter(col("vec_id") % 7 === 3),
          "embedding", "vec_id", centers)
        .select(col("id").as("vec_id"), col("ivf_cell"))
        .orderBy(col("vec_id"))
    }),

    // extended: cluster-balanced diversity sampling — up to perCell rows
    // per KMeans cell chosen by content hash (Sampling.clusterBalanced:
    // one TopKAgg heap aggregate, no corpus-wide window sort). The oracle
    // replays the training CTEs + a per-cell hash-ordered row_number.
    "q_cluster_sample" -> ((s, dir) => {
      val (_, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      val asg = graft.ops.MlAnn.assignCells(
          t(s, dir, "embeddings").filter(col("vec_id") =!= 0),
          "embedding", "vec_id", centers)
        .select(col("id"), col("ivf_cell"))
      graft.ops.Sampling.clusterBalanced(asg, "id", "ivf_cell",
          perCell = 10, salt = "cb1")
        .select(col("id").as("vec_id"), col("ivf_cell"), col("rn"))
        .orderBy(col("vec_id"))
    }),

    // extended: population-stability drift between two snapshot slices of
    // the cluster-cell distribution (Profiling.distributionDrift — add-one
    // smoothed shares, exact BIGINT counts into one IEEE psi term/key).
    "q_cluster_drift" -> ((s, dir) => {
      val (_, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      val asg = graft.ops.MlAnn.assignCells(
          t(s, dir, "embeddings").filter(col("vec_id") =!= 0),
          "embedding", "vec_id", centers)
        .select(col("id"), col("ivf_cell"))
      graft.ops.Profiling.distributionDrift(
          asg.filter(col("id") % 2 === 0), asg.filter(col("id") % 2 === 1),
          "ivf_cell")
        .select(col("key").as("ivf_cell"), col("n_a"), col("n_b"),
          col("psi_micro"))
        .orderBy(col("ivf_cell"))
    }),

    // extended: embedding near-dup pairs (exact pairwise over one bucket).
    "q_embedding_neardup" -> ((s, dir) => {
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.3, planes = 0)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // extended: the SCALE path — hyperplane sign-bucketed near-dup. The
    // oracle replays the md5-seeded plane weights and the ordered projection
    // fold bit-exactly (list_reduce, not list_sum: a sign near zero must not
    // flip under a different summation order), then the same-bucket pair
    // join. No crossJoin anywhere.
    "q_embedding_neardup_lsh" -> ((s, dir) => {
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.3, planes = 4)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // extended: SemDeDup — cluster-bounded semantic dedup over the SAME
    // deterministic KMeans index q_ivf_kmeans probes (trained once in the
    // warmed Tables layer). Survivors = rows with no lower-id in-cell
    // neighbor at cosine >= 0.3; the oracle replays the training CTEs and
    // the in-cell pair rule.
    "q_semantic_dedup" -> ((s, dir) => {
      val (assigned, _) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      Dedup.semanticDedup(assigned, threshold = 0.3)
        .select(col("id").as("vec_id"), col("cell").cast("int").as("cell"))
        .orderBy(col("vec_id"))
    }),

    // extended: cell-bounded kNN GRAPH over the SAME deterministic KMeans
    // index — per-row top-3 in-cell cosine neighbors, the input to
    // similarity-graph clustering. TopKAgg heap per source, ties to the
    // lower neighbor id; the oracle replays training + in-cell ranking.
    "q_knn_graph" -> ((s, dir) => {
      val (assigned, _) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      graft.ops.MlAnn.knnGraph(assigned, k = 3)
        .select(col("src").as("src_id"), col("dst").as("dst_id"),
          round(col("cos"), 6).as("cos"), col("rk"))
        .orderBy(col("src_id"), col("rk"))
    }),

    // extended: IVF-PQ top-k — the COMPOSED coarse-route + compressed-score
    // layout (FAISS IndexIVFPQ shape): driver picks 4 of 8 cells from the
    // warmed coarse index, the probed ids semi-join the warmed PQ codes
    // table, and only those codes are ADC-scored. The oracle replays coarse
    // training + probe + both subspace trainings + the gated ADC sum.
    "q_ivf_pq_topk" -> ((s, dir) => {
      val (assigned, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      val (encoded, cbs) = Tables.pqIndex(s, dir, m = 2, codes = 4, iters = 1)
      graft.ops.MlAnn.ivfPqTopK(assigned, centers, encoded, cbs,
        queryVec(s, dir), k = 10, nprobe = 4)
        .select(col("id").as("vec_id"), round(col("adist"), 6).as("adist"))
    }),

    // extended: RESIDUAL IVF-PQ top-k — the FAISS IndexIVFPQ encoding
    // discipline: codebooks train on (vector − coarse centroid) so the
    // m×codes budget quantizes within-cell displacements instead of
    // re-separating cluster centers (raw-vector PQ collapses tight
    // clusters into a few codes — measured on the planted-cluster recall
    // probe, ANN_RECALL.md). The query scores only the probed cells'
    // codes, each against ITS cell's driver-built ADC table (one
    // when-chained lookup column, same pruned scan as q_ivf_pq_topk).
    // The oracle replays coarse training + residual subtraction + both
    // residual-subspace trainings + the per-cell gated ADC sum.
    "q_ivf_pq_residual" -> ((s, dir) => {
      val (_, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      val (encodedR, cbsR) = Tables.pqResidualIndex(s, dir, m = 2,
        codes = 4, iters = 1)
      graft.ops.MlAnn.ivfPqResidualTopK(encodedR, centers, cbsR,
        queryVec(s, dir), k = 10, nprobe = 4)
        .select(col("id").as("vec_id"), round(col("adist"), 6).as("adist"))
    }),

    // extended: REFINED residual IVF-PQ — the FAISS IndexRefineFlat
    // discipline: the ADC pass returns refine=50 candidates, and only
    // those 50 rows re-read their exact vectors for an exact squared-L2
    // rerank to k=10 (a broadcast id join against the assignment layout
    // — R exact reads, no scan). ADC ranking errors INSIDE the top-R
    // cost nothing, so recall climbs steeply in R at a fixed byte
    // budget (ANN_RECALL.md refine rows). Oracle: the residual-ADC
    // replay truncated at R, then the exact rerank as flat SQL.
    "q_ivf_pq_refine" -> ((s, dir) => {
      val (assigned, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      val (encodedR, cbsR) = Tables.pqResidualIndex(s, dir, m = 2,
        codes = 4, iters = 1)
      graft.ops.MlAnn.ivfPqRefineTopK(encodedR, assigned, centers, cbsR,
        queryVec(s, dir), k = 10, nprobe = 4, refine = 50)
        .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
    }),

    // extended: per-cluster balance profile over the SAME deterministic
    // KMeans index (sizes, min id, mean vector norm) — the post-clustering
    // diagnostic a curation run reads before trusting the index. The
    // deterministic mode's id-ordered norm fold replays bit-exactly.
    "q_cluster_profile" -> ((s, dir) => {
      val (assigned, _) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      graft.ops.MlAnn.clusterProfile(assigned, deterministic = true)
        .orderBy(col("cell"))
    }),

    // extended: centroid silhouette (Rousseeuw 1987, simplified form) —
    // the cluster-quality report over the SAME warmed det-KMeans index:
    // per cell, the mean of (b-a)/max(a,b) with a = own-centroid distance
    // and b = nearest-other-centroid distance. |centers| distance folds
    // per row, no join before the per-cell aggregate; id-ordered folds
    // make the mean bit-exact against the training-replay oracle.
    "q_cluster_silhouette" -> ((s, dir) => {
      val (assigned, centers) = Tables.detKmeansIvfIndex(s, dir, nlist = 8,
        iters = 2)
      graft.ops.MlAnn.centroidSilhouette(assigned, centers,
          deterministic = true)
        .orderBy(col("cell"))
    }),

    // extended: product-quantization ADC top-k — the compressed-storage ANN
    // path (m subspace codebooks from the same deterministic Lloyd trainer;
    // the timed query scans ONLY the codes table + a driver-built distance
    // table: two array lookups and an add per row, no join, no shuffle).
    // The oracle replays both subspace trainings and the ADC sum.
    "q_pq_topk" -> ((s, dir) => {
      val (encoded, cbs) = Tables.pqIndex(s, dir, m = 2, codes = 4, iters = 1)
      graft.ops.MlAnn.pqTopK(encoded, cbs, queryVec(s, dir), k = 10)
        .select(col("id").as("vec_id"), round(col("adist"), 6).as("adist"))
    }),

    // extended: MMR diverse top-k — greedy λ·rel − (1−λ)·max-sim selection
    // over a distributed top-50 prefetch; the oracle unrolls all 5 greedy
    // picks as CTEs with the same sequential-fold cosines, so the gate is
    // a bit-exact hash match on every score.
    "q_mmr_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      Similarity.mmrTopK(emb, "embedding", "vec_id", queryVec(s, dir),
        k = 5, prefetch = 50, lambda = 0.5)
        .select(col("id").as("vec_id"), round(col("rel"), 6).as("rel"),
          round(col("mmr"), 6).as("mmr"), col("rank"))
        .orderBy(col("rank"))
    }))

  /**
   * Unrolled deterministic-KMeans IVF oracle: replays MlAnn.detKmeansIvf's
   * exact arithmetic — smallest-id init, per-iteration (argmin assign →
   * id-ordered fold mean), centroid probe ranking, cosine top-k — as a CTE
   * chain. Every fold is an ordered list_reduce/list_sum, which DuckDB
   * evaluates left-to-right like the engine's sequential aggregates, so the
   * hashes are bit-exact, not approximately equal.
   */
  // squared distance between double-list columns: sequential left fold
  private def sqSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1,${Dim + 1}), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x, y) -> x + y)"

  /**
   * The deterministic-KMeans training + assignment replay as a reusable CTE
   * prefix (`pts` → `c0` → `iters` assign/update rounds → final assignment
   * `af(id, emb, cell)`) — the oracle-side mirror of
   * [[graft.ops.MlAnn.detKmeansIvf]]. Shared by q_ivf_kmeans (probe on top)
   * and q_semantic_dedup (in-cell pair join on top).
   */
  private def detAssignCtes(nlist: Int, iters: Int): String = {
    val R = s"range(1,${Dim + 1})"
    val zero = s"list_transform($R, i -> 0.0)"
    // argmin-of-sqdist assignment against centroid CTE `cN`
    def assign(aName: String, cName: String): String =
      s"""$aName AS (
         |  SELECT id, emb, cell FROM (
         |    SELECT p.id, p.emb, c.cell,
         |      row_number() OVER (PARTITION BY p.id
         |        ORDER BY ${sqSql("p.emb", "c.c")}, c.cell) AS rn
         |    FROM pts p CROSS JOIN $cName c) WHERE rn = 1)""".stripMargin
    // id-ordered elementwise mean per cell; empty cells keep prev centroid
    def update(aName: String, prevC: String, cName: String): String =
      s"""${cName}_s AS (
         |  SELECT cell, count(*) AS n,
         |    list_reduce(list_prepend($zero, list(emb ORDER BY id)),
         |      (x, y) -> list_transform($R, i -> x[i] + y[i])) AS s
         |  FROM $aName GROUP BY cell),
         |$cName AS (
         |  SELECT p.cell,
         |    CASE WHEN s.n IS NULL THEN p.c
         |         ELSE list_transform($R, i -> s.s[i] / s.n) END AS c
         |  FROM $prevC p LEFT JOIN ${cName}_s s USING (cell))""".stripMargin
    val iterCtes = (1 to iters).map { it =>
      assign(s"a$it", s"c${it - 1}") + ",\n" +
        update(s"a$it", s"c${it - 1}", s"c$it")
    }.mkString(",\n")
    s"""pts AS (
       |  SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings WHERE vec_id <> 0),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, emb AS c
       |  FROM pts ORDER BY id LIMIT $nlist),
       |$iterCtes,
       |${assign("af", s"c$iters")}""".stripMargin
  }

  private def detKmeansOracle(nlist: Int, iters: Int, nprobe: Int,
                              k: Int): String =
    s"""WITH ${detAssignCtes(nlist, iters)},
       |q AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |  FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cell FROM c$iters c CROSS JOIN q
       |  ORDER BY ${sqSql("c.c", "q.qe")}, cell LIMIT $nprobe)
       |SELECT id AS vec_id, round(${cosSql("af.emb", "q.qe")}, 6) AS score
       |FROM af JOIN probe USING (cell) CROSS JOIN q
       |ORDER BY ${cosSql("af.emb", "q.qe")} DESC, id LIMIT $k""".stripMargin

  /**
   * Unrolled MMR oracle: top-`prefetch` cosine candidates, then `k` greedy
   * CTEs — pick r maximizes λ·rel − (1−λ)·max cosine against the union of
   * picks 1..r−1 (correlated max subquery), ties to the lower id. The same
   * sequential double folds as the engine's driver loop.
   */
  private def mmrOracle(k: Int, prefetch: Int, lambda: Double): String = {
    val lm = lambda.toString
    val om = (1.0 - lambda).toString
    val picks = (2 to k).map { r =>
      // join + GROUP BY, not a correlated subquery: DuckDB lambdas (inside
      // the cosine fold) cannot capture correlated outer columns
      s"""ms$r AS (
         |  SELECT c.id, c.embedding, c.rel,
         |    max(${cosSql("c.embedding", "s.embedding")}) AS msim
         |  FROM cands c CROSS JOIN selu${r - 1} s
         |  WHERE c.id NOT IN (SELECT id FROM selu${r - 1})
         |  GROUP BY c.id, c.embedding, c.rel),
         |sel$r AS (
         |  SELECT id, embedding, rel, ($lm * rel - $om * msim) AS mmr,
         |    $r AS rank
         |  FROM ms$r ORDER BY ($lm * rel - $om * msim) DESC, id LIMIT 1),
         |selu$r AS (SELECT * FROM selu${r - 1} UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cands AS (
       |  SELECT vec_id AS id, embedding, ${cosSql("embedding", "qe")} AS rel
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY ${cosSql("embedding", "qe")} DESC, vec_id LIMIT $prefetch),
       |sel1 AS (
       |  SELECT id, embedding, rel, ($lm * rel - $om * 0.0) AS mmr, 1 AS rank
       |  FROM cands ORDER BY ($lm * rel - $om * 0.0) DESC, id LIMIT 1),
       |selu1 AS (SELECT * FROM sel1),
       |$picks
       |SELECT id AS vec_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr,
       |  CAST(rank AS INT) AS rank
       |FROM selu$k ORDER BY rank""".stripMargin
  }

  /**
   * Unrolled product-quantization oracle (m=2 subspaces hardcoded): replays
   * [[graft.ops.MlAnn.pqTrain]]'s per-subspace deterministic-KMeans training
   * (smallest-id init, argmin assign with ties to the lower code, id-ordered
   * fold means), the per-row encoding, and the ADC score — each subspace's
   * contribution is sqdist(query_sub, centroid_of_assigned_code), summed in
   * subspace order. (a−b)² ≡ (b−a)² exactly in IEEE, so centroid−query vs
   * query−centroid order doesn't matter; the fold order does, and both sides
   * fold left-to-right over the subspace indices.
   */
  /** One PQ subspace's training + per-id ADC part as CTEs (pts$s ... d$s) —
    * shared by [[pqOracle]] and [[ivfPqOracle]]. */
  private def pqSubspaceCtes(s0: Int, codes: Int, iters: Int): String = {
    val subDim = Dim / 2
    val r = s"range(1,${subDim + 1})"
    val zero = s"list_transform($r, i -> 0.0)"
    def sq(a: String, b: String): String =
      s"list_reduce(list_transform($r, i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x, y) -> x + y)"
    def subspace(s: Int): String = {
      val lo = s * subDim + 1
      def assign(aName: String, cName: String): String =
        s"""$aName AS (
           |  SELECT id, emb, cell FROM (
           |    SELECT p.id, p.emb, c.cell,
           |      row_number() OVER (PARTITION BY p.id
           |        ORDER BY ${sq("p.emb", "c.c")}, c.cell) AS rn
           |    FROM pts$s p CROSS JOIN $cName c) WHERE rn = 1)""".stripMargin
      def update(aName: String, prevC: String, cName: String): String =
        s"""${cName}_s AS (
           |  SELECT cell, count(*) AS n,
           |    list_reduce(list_prepend($zero, list(emb ORDER BY id)),
           |      (x, y) -> list_transform($r, i -> x[i] + y[i])) AS s
           |  FROM $aName GROUP BY cell),
           |$cName AS (
           |  SELECT p.cell,
           |    CASE WHEN s.n IS NULL THEN p.c
           |         ELSE list_transform($r, i -> s.s[i] / s.n) END AS c
           |  FROM $prevC p LEFT JOIN ${cName}_s s USING (cell))""".stripMargin
      val iterCtes = (1 to iters).map { it =>
        assign(s"asg${s}_$it", s"cs${s}_${it - 1}") + ",\n" +
          update(s"asg${s}_$it", s"cs${s}_${it - 1}", s"cs${s}_$it")
      }.mkString(",\n")
      s"""pts$s AS (
         |  SELECT vec_id AS id,
         |    list_transform(range($lo,${lo + subDim}),
         |      i -> CAST(embedding[i] AS DOUBLE)) AS emb
         |  FROM embeddings WHERE vec_id <> 0),
         |cs${s}_0 AS (
         |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, emb AS c
         |  FROM pts$s ORDER BY id LIMIT $codes),
         |$iterCtes,
         |${assign(s"af$s", s"cs${s}_$iters")},
         |q$s AS (
         |  SELECT list_transform(range($lo,${lo + subDim}),
         |    i -> CAST(embedding[i] AS DOUBLE)) AS qe
         |  FROM embeddings WHERE vec_id = 0),
         |d$s AS (
         |  SELECT a.id, ${sq("c.c", "q.qe")} AS d
         |  FROM af$s a JOIN cs${s}_$iters c USING (cell) CROSS JOIN q$s q)""".stripMargin
    }
    subspace(s0)
  }

  /** RESIDUAL PQ subspace replay: identical training arithmetic to
    * [[pqSubspaceCtes]], but the points come from `rfull` (the coarse
    * residuals — requires [[detAssignCtes]] + an `rfull(id, ccell, emb)`
    * CTE upstream) and the query side is PER COARSE CELL: each row's ADC
    * term scores its code's centroid against (query − that row's coarse
    * centroid) sliced to the subspace. */
  private def pqResidualSubspaceCtes(s: Int, codes: Int, iters: Int,
                                     ivfIters: Int): String = {
    val subDim = Dim / 2
    val r = s"range(1,${subDim + 1})"
    val zero = s"list_transform($r, i -> 0.0)"
    def sq(a: String, b: String): String =
      s"list_reduce(list_transform($r, i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x, y) -> x + y)"
    val lo = s * subDim + 1
    def assign(aName: String, cName: String): String =
      s"""$aName AS (
         |  SELECT id, emb, cell FROM (
         |    SELECT p.id, p.emb, c.cell,
         |      row_number() OVER (PARTITION BY p.id
         |        ORDER BY ${sq("p.emb", "c.c")}, c.cell) AS rn
         |    FROM rpts$s p CROSS JOIN $cName c) WHERE rn = 1)""".stripMargin
    def update(aName: String, prevC: String, cName: String): String =
      s"""${cName}_s AS (
         |  SELECT cell, count(*) AS n,
         |    list_reduce(list_prepend($zero, list(emb ORDER BY id)),
         |      (x, y) -> list_transform($r, i -> x[i] + y[i])) AS s
         |  FROM $aName GROUP BY cell),
         |$cName AS (
         |  SELECT p.cell,
         |    CASE WHEN s.n IS NULL THEN p.c
         |         ELSE list_transform($r, i -> s.s[i] / s.n) END AS c
         |  FROM $prevC p LEFT JOIN ${cName}_s s USING (cell))""".stripMargin
    val iterCtes = (1 to iters).map { it =>
      assign(s"rasg${s}_$it", s"rcs${s}_${it - 1}") + ",\n" +
        update(s"rasg${s}_$it", s"rcs${s}_${it - 1}", s"rcs${s}_$it")
    }.mkString(",\n")
    s"""rpts$s AS (
       |  SELECT id, list_transform(range($lo,${lo + subDim}),
       |    i -> emb[i]) AS emb
       |  FROM rfull),
       |rcs${s}_0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, emb AS c
       |  FROM rpts$s ORDER BY id LIMIT $codes),
       |$iterCtes,
       |${assign(s"raf$s", s"rcs${s}_$iters")},
       |rqr$s AS (
       |  SELECT cc.cell AS ccell,
       |    list_transform(range($lo,${lo + subDim}),
       |      i -> qf.qe[i] - cc.c[i]) AS qe
       |  FROM c$ivfIters cc CROSS JOIN qf),
       |rd$s AS (
       |  SELECT a.id, ${sq("c.c", "q.qe")} AS d
       |  FROM raf$s a
       |  JOIN rcs${s}_$iters c ON c.cell = a.cell
       |  JOIN rfull rf ON rf.id = a.id
       |  JOIN rqr$s q ON q.ccell = rf.ccell)""".stripMargin
  }

  /** Residual IVF-PQ replay: coarse training + probe + residual
    * subtraction + both residual-subspace trainings + the per-cell gated
    * ADC sum. */
  private def ivfPqResidualOracle(nlist: Int, ivfIters: Int, codes: Int,
                                  pqIters: Int, nprobe: Int,
                                  k: Int): String =
    s"""WITH ${detAssignCtes(nlist, ivfIters)},
       |qf AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |  FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cell FROM c$ivfIters c CROSS JOIN qf
       |  ORDER BY ${sqSql("c.c", "qf.qe")}, cell LIMIT $nprobe),
       |rfull AS (
       |  SELECT af.id, af.cell AS ccell,
       |    list_transform(range(1,${Dim + 1}),
       |      i -> af.emb[i] - cc.c[i]) AS emb
       |  FROM af JOIN c$ivfIters cc ON cc.cell = af.cell),
       |${pqResidualSubspaceCtes(0, codes, pqIters, ivfIters)},
       |${pqResidualSubspaceCtes(1, codes, pqIters, ivfIters)}
       |SELECT rd0.id AS vec_id, round(rd0.d + rd1.d, 6) AS adist
       |FROM rd0 JOIN rd1 USING (id) JOIN rfull USING (id)
       |WHERE rfull.ccell IN (SELECT cell FROM probe)
       |ORDER BY rd0.d + rd1.d, rd0.id LIMIT $k""".stripMargin

  /** Refine replay: the residual-ADC ranking truncated at `refine`,
    * then an exact squared-L2 rerank of just those ids. */
  private def ivfPqRefineOracle(nlist: Int, ivfIters: Int, codes: Int,
                                pqIters: Int, nprobe: Int, k: Int,
                                refine: Int): String =
    s"""WITH ${detAssignCtes(nlist, ivfIters)},
       |qf AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |  FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cell FROM c$ivfIters c CROSS JOIN qf
       |  ORDER BY ${sqSql("c.c", "qf.qe")}, cell LIMIT $nprobe),
       |rfull AS (
       |  SELECT af.id, af.cell AS ccell,
       |    list_transform(range(1,${Dim + 1}),
       |      i -> af.emb[i] - cc.c[i]) AS emb
       |  FROM af JOIN c$ivfIters cc ON cc.cell = af.cell),
       |${pqResidualSubspaceCtes(0, codes, pqIters, ivfIters)},
       |${pqResidualSubspaceCtes(1, codes, pqIters, ivfIters)},
       |cand AS (
       |  SELECT rd0.id
       |  FROM rd0 JOIN rd1 USING (id) JOIN rfull USING (id)
       |  WHERE rfull.ccell IN (SELECT cell FROM probe)
       |  ORDER BY rd0.d + rd1.d, rd0.id LIMIT $refine)
       |SELECT af.id AS vec_id,
       |  round(${sqSql("af.emb", "qf.qe")}, 6) AS dist
       |FROM af CROSS JOIN qf
       |WHERE af.id IN (SELECT id FROM cand)
       |ORDER BY ${sqSql("af.emb", "qf.qe")}, af.id LIMIT $k""".stripMargin

  private def pqOracle(codes: Int, iters: Int, k: Int): String =
    s"""WITH ${pqSubspaceCtes(0, codes, iters)},
       |${pqSubspaceCtes(1, codes, iters)}
       |SELECT d0.id AS vec_id, round(d0.d + d1.d, 6) AS adist
       |FROM d0 JOIN d1 USING (id)
       |ORDER BY d0.d + d1.d, d0.id LIMIT $k""".stripMargin

  /** IVF-PQ replay: the coarse training + probe-cell CTEs of
    * [[detKmeansOracle]] composed with both PQ subspace replays — the ADC
    * sum is scored only where af.cell survives the probe. */
  private def ivfPqOracle(nlist: Int, ivfIters: Int, codes: Int,
                          pqIters: Int, nprobe: Int, k: Int): String =
    s"""WITH ${detAssignCtes(nlist, ivfIters)},
       |qf AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |  FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cell FROM c$ivfIters c CROSS JOIN qf
       |  ORDER BY ${sqSql("c.c", "qf.qe")}, cell LIMIT $nprobe),
       |${pqSubspaceCtes(0, codes, pqIters)},
       |${pqSubspaceCtes(1, codes, pqIters)}
       |SELECT d0.id AS vec_id, round(d0.d + d1.d, 6) AS adist
       |FROM d0 JOIN d1 USING (id) JOIN af USING (id)
       |WHERE af.cell IN (SELECT cell FROM probe)
       |ORDER BY d0.d + d1.d, d0.id LIMIT $k""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ivf_kmeans" -> detKmeansOracle(nlist = 8, iters = 2, nprobe = 2, k = 10),

    // incremental-assign replay: the same trained-centroid CTEs, then the
    // argmin (sqdist asc, cell asc — Spark's first-min-index tie-break)
    // over the arriving batch.
    "q_ivf_assign" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |nv AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE vec_id % 7 = 3),
         |asg AS (
         |  SELECT id, cell FROM (
         |    SELECT nv.id, c.cell,
         |      row_number() OVER (PARTITION BY nv.id
         |        ORDER BY ${sqSql("nv.emb", "c.c")}, c.cell) AS rn
         |    FROM nv CROSS JOIN c2 c) WHERE rn = 1)
         |SELECT id AS vec_id, CAST(cell AS INT) AS ivf_cell
         |FROM asg ORDER BY vec_id""".stripMargin,

    // cluster-balanced sample replay: the same trained assignment, then a
    // hash-ordered row_number per cell (BIGINT hash, not its double
    // image — the engine orders by the same 60-bit integer)
    "q_cluster_sample" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |r AS (
         |  SELECT id, cell,
         |    row_number() OVER (PARTITION BY cell
         |      ORDER BY ${TextQueries.h60Sql("'cb1'||'#'||id")}, id) AS rn
         |  FROM af)
         |SELECT id AS vec_id, CAST(cell AS INT) AS ivf_cell,
         |  CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 10 ORDER BY vec_id""".stripMargin,

    // drift replay: the same assignment split even/odd, full-outer joined
    // per cell, totals from the joined frame, the same
    // ((1e6·(pa−pb))·ln(pa/pb)) expression tree with add-one smoothing.
    "q_cluster_drift" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |ca AS (SELECT cell, count(*) AS n_a FROM af
         |       WHERE id % 2 = 0 GROUP BY cell),
         |cb AS (SELECT cell, count(*) AS n_b FROM af
         |       WHERE id % 2 = 1 GROUP BY cell),
         |j AS (SELECT coalesce(ca.cell, cb.cell) AS cell,
         |        coalesce(n_a, CAST(0 AS BIGINT)) AS n_a,
         |        coalesce(n_b, CAST(0 AS BIGINT)) AS n_b
         |      FROM ca FULL OUTER JOIN cb ON ca.cell = cb.cell),
         |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
         |               CAST(sum(n_b) AS BIGINT) AS tb,
         |               count(*) AS k FROM j)
         |SELECT CAST(cell AS INT) AS ivf_cell, n_a, n_b,
         |  CAST(round(1000000.0
         |    * (CAST(n_a + 1 AS DOUBLE) / CAST(ta + k AS DOUBLE)
         |       - CAST(n_b + 1 AS DOUBLE) / CAST(tb + k AS DOUBLE))
         |    * ln((CAST(n_a + 1 AS DOUBLE) / CAST(ta + k AS DOUBLE))
         |         / (CAST(n_b + 1 AS DOUBLE) / CAST(tb + k AS DOUBLE))),
         |    0) AS BIGINT) AS psi_micro
         |FROM j, tot ORDER BY ivf_cell""".stripMargin,

    "q_pq_topk" -> pqOracle(codes = 4, iters = 1, k = 10),

    "q_ivf_pq_topk" -> ivfPqOracle(nlist = 8, ivfIters = 2, codes = 4,
      pqIters = 1, nprobe = 4, k = 10),

    "q_ivf_pq_refine" -> ivfPqRefineOracle(nlist = 8, ivfIters = 2,
      codes = 4, pqIters = 1, nprobe = 4, k = 10, refine = 50),

    "q_ivf_pq_residual" -> ivfPqResidualOracle(nlist = 8, ivfIters = 2,
      codes = 4, pqIters = 1, nprobe = 4, k = 10),

    "q_mmr_topk" -> mmrOracle(k = 5, prefetch = 50, lambda = 0.5),

    "q_cluster_profile" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |norms AS (
         |  SELECT cell, id,
         |    sqrt(list_reduce(list_transform(range(1,${Dim + 1}),
         |      i -> emb[i]*emb[i]), (x, y) -> x + y)) AS nrm
         |  FROM af)
         |SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n,
         |  min(id) AS min_id,
         |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(nrm ORDER BY id)), (x, y) -> x + y) / count(*), 6)
         |    AS mean_norm
         |FROM norms GROUP BY cell ORDER BY cell""".stripMargin,

    // silhouette replay: training CTEs + per-(point, centroid) distances,
    // a/b via conditional aggregates, id-ordered per-cell mean fold.
    "q_cluster_silhouette" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |pd AS (
         |  SELECT a.id, a.cell AS own, c.cell AS ccell,
         |    sqrt(${sqSql("a.emb", "c.c")}) AS dist
         |  FROM af a CROSS JOIN c2 c),
         |ab AS (
         |  SELECT id, own AS cell,
         |    max(CASE WHEN ccell = own THEN dist END) AS a,
         |    min(CASE WHEN ccell <> own THEN dist END) AS b
         |  FROM pd GROUP BY id, own),
         |sv AS (
         |  SELECT id, cell,
         |    CASE WHEN greatest(a, b) = 0.0 THEN 0.0
         |         ELSE (b - a) / greatest(a, b) END AS s
         |  FROM ab)
         |SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n,
         |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(s ORDER BY id)), (x, y) -> x + y) / count(*), 6)
         |    AS mean_silhouette
         |FROM sv GROUP BY cell ORDER BY cell""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)},
         |dropped AS (
         |  SELECT DISTINCT b.id FROM af a JOIN af b
         |    ON a.cell = b.cell AND a.id < b.id
         |  WHERE ${cosSql("a.emb", "b.emb")} >= CAST(0.3 AS DOUBLE))
         |SELECT p.id AS vec_id, CAST(p.cell AS INT) AS cell
         |FROM af p LEFT JOIN dropped d ON p.id = d.id
         |WHERE d.id IS NULL
         |ORDER BY p.id""".stripMargin,
    "q_knn_graph" ->
      s"""WITH ${detAssignCtes(nlist = 8, iters = 2)}
         |SELECT src_id, dst_id, round(cos, 6) AS cos, CAST(rk AS INT) AS rk
         |FROM (
         |  SELECT a.id AS src_id, b.id AS dst_id,
         |    ${cosSql("a.emb", "b.emb")} AS cos,
         |    row_number() OVER (PARTITION BY a.id
         |      ORDER BY ${cosSql("a.emb", "b.emb")} DESC, b.id) AS rk
         |  FROM af a JOIN af b ON a.cell = b.cell AND a.id <> b.id)
         |WHERE rk <= 3 ORDER BY src_id, rk""".stripMargin,

    // RRF replay: ranks come from the UNROUNDED bm25/cosine orderings
    // (bm25Cte's s CTE), exactly like the engine; the reciprocal terms sum
    // in fixed (text, vec) order so the fused double is bit-identical.
    "q_rrf_fusion" ->
      s"""WITH ${TextQueries.bm25Cte(Seq("filter", "vector", "merge"),
             k1 = 1.2, b = 0.75)},
         |bmtop AS (
         |  SELECT doc_id, bm25 FROM s WHERE bm25 > 0.0
         |  ORDER BY bm25 DESC, doc_id LIMIT 50),
         |bm AS (
         |  SELECT doc_id AS id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
         |  FROM bmtop),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vstop AS (
         |  SELECT vec_id, ${cosSql("embedding", "qe")} AS score
         |  FROM embeddings, q WHERE vec_id <> 0
         |  ORDER BY score DESC, vec_id LIMIT 50),
         |vs AS (
         |  SELECT vec_id AS id,
         |    row_number() OVER (ORDER BY score DESC, vec_id) AS r
         |  FROM vstop),
         |f AS (
         |  SELECT coalesce(bm.id, vs.id) AS id, bm.r AS rt, vs.r AS rv
         |  FROM bm FULL OUTER JOIN vs ON bm.id = vs.id)
         |SELECT id AS doc_id,
         |  round(coalesce(1.0/(60 + rt), 0.0)
         |      + coalesce(1.0/(60 + rv), 0.0), 6) AS rrf,
         |  CAST(rt AS INT) AS r_text, CAST(rv AS INT) AS r_vec
         |FROM f
         |ORDER BY (coalesce(1.0/(60 + rt), 0.0)
         |        + coalesce(1.0/(60 + rv), 0.0)) DESC, id
         |LIMIT 20""".stripMargin,

    // JL replay: same ±0.25 sign weights from the md5 hash, same
    // ascending-index projection folds, 16-dim double cosine.
    "q_jl_topk" -> {
      def cos16(a: String, b: String): String =
        s"""(list_sum(list_transform(range(1,17), i -> $a[i]*$b[i]))
           | / (sqrt(list_sum(list_transform(range(1,17), i -> $a[i]*$a[i])))
           |  * sqrt(list_sum(list_transform(range(1,17), i -> $b[i]*$b[i])))))""".stripMargin
      s"""WITH proj AS (
         |  SELECT vec_id, list_transform(range(0, 16), j ->
         |    list_reduce(list_transform(range(0, $Dim), i ->
         |      CAST(embedding[i+1] AS DOUBLE) *
         |      (CASE WHEN (('0x'||substr(md5('jl1'||'#'||j||'#'||i),1,15))::BIGINT % 2) = 0
         |            THEN 0.25 ELSE -0.25 END)),
         |      (a, b) -> a + b)) AS p
         |  FROM embeddings),
         |q AS (SELECT p AS qp FROM proj WHERE vec_id = 0)
         |SELECT vec_id, round(${cos16("p", "qp")}, 6) AS score
         |FROM proj, q WHERE vec_id <> 0
         |ORDER BY ${cos16("p", "qp")} DESC, vec_id LIMIT 10""".stripMargin
    },

    "q_vector_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosSql("embedding", "qe")}, 6) AS score
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY ${cosSql("embedding", "qe")} DESC, vec_id LIMIT 10""".stripMargin,

    "q_filtered_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosSql("embedding", "qe")}, 6) AS score
         |FROM embeddings, q
         |WHERE vec_id <> 0
         |  AND (label >= 2 AND label <= 6 AND NOT (label = 4))
         |ORDER BY ${cosSql("embedding", "qe")} DESC, vec_id LIMIT 10""".stripMargin,

    "q_vector_diverse_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT vec_id, label, ${cosSql("embedding", "qe")} AS score
         |  FROM embeddings, q WHERE vec_id <> 0
         |  ORDER BY score DESC, vec_id LIMIT 50),
         |ranked AS (
         |  SELECT vec_id, label, score,
         |    row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id) AS rr
         |  FROM scored)
         |SELECT vec_id, label, round(score, 6) AS score, CAST(rr AS INT) AS rr FROM ranked
         |ORDER BY rr, score DESC, vec_id LIMIT 10""".stripMargin,

    "q_vector_quantized" ->
      s"""WITH mx AS (
         |  SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
         |  FROM embeddings),
         |qz AS (
         |  SELECT e.vec_id,
         |    list_transform(e.embedding, x -> floor(
         |      CAST(x AS DOUBLE) *
         |        (CASE WHEN mx.m = 0.0 THEN 1.0 ELSE 127.0 / mx.m END) + 0.5))
         |      AS q
         |  FROM embeddings e JOIN mx USING (vec_id)),
         |qv AS (SELECT q AS qq FROM qz WHERE vec_id = 0)
         |SELECT vec_id, round(${cosSql("q", "qq")}, 6) AS score
         |FROM qz, qv WHERE vec_id <> 0
         |ORDER BY ${cosSql("q", "qq")} DESC, vec_id LIMIT 10""".stripMargin,

    "q_knn_join" ->
      s"""SELECT qid, nid, round(score, 6) AS score, CAST(rk AS INT) AS rk FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    ${cosSql("a.embedding", "b.embedding")} AS score,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rk
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id)
         |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,

    "q_ivf_topk_full_probe" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosSql("embedding", "qe")}, 6) AS score
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY ${cosSql("embedding", "qe")} DESC, vec_id LIMIT 10""".stripMargin,

    "q_embedding_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a, embeddings b
         |WHERE a.vec_id < b.vec_id
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "q_embedding_neardup_lsh" -> {
      // sign of the md5-seeded hyperplane projection, ordered fold
      def signSql(p: Int): String =
        s"""(CASE WHEN list_reduce(list_transform(range(0, $Dim), i ->
           |  CAST(embedding[i+1] AS DOUBLE) *
           |  (CAST(('0x'||substr(md5('plane#'||$p||'#'||i),1,15)) AS BIGINT)
           |     / 1.152921504606847e18 * 2.0 - 1.0)),
           |  (a, b) -> a + b) >= 0 THEN '1' ELSE '0' END)""".stripMargin
      val bucket = (0 until 4).map(signSql).mkString("||")
      s"""WITH buck AS (
         |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
         |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM buck a JOIN buck b USING (bucket)
         |WHERE a.vec_id < b.vec_id
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY id_a, id_b""".stripMargin
    })
}
