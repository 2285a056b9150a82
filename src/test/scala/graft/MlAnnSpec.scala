package graft

import org.apache.spark.sql.functions._
import graft.ops.{MlAnn, Similarity}

class MlAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val index = {
    // three well-separated clusters in 4-d
    val rows = (0 until 30).map { i =>
      val base = i % 3 match {
        case 0 => Array(10.0, 0.0, 0.0, 1.0)
        case 1 => Array(0.0, 10.0, 0.0, 1.0)
        case _ => Array(0.0, 0.0, 10.0, 1.0)
      }
      (i.toLong, base.map(_ + (i % 7) * 0.01))
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private val query = Seq(10.0, 0.1, 0.0, 1.0)

  test("filteredTopK == brute top-k over the pre-filtered frame; the " +
    "filter binds (results differ from unfiltered)") {
    import graft.filter.FilterAst._
    val labeled = index.withColumn("label", (col("vec_id") % 3).cast("int"))
    // query points at cluster 0; restricting to label=1 must surface the
    // orthogonal cluster instead — proof the predicate ran BEFORE scoring
    val f = Pred("label", Eq, 1)
    val got = Similarity.filteredTopK(labeled, "embedding", "vec_id", f,
      query, 5).select("id").as[Long].collect().toSeq
    val manual = Similarity.topK(labeled.filter(col("label") === 1),
      "embedding", "vec_id", query, 5).select("id").as[Long].collect().toSeq
    val unfiltered = Similarity.topK(labeled, "embedding", "vec_id",
      query, 5).select("id").as[Long].collect().toSeq
    assert(got == manual)
    assert(got.forall(_ % 3 == 1))
    assert(got != unfiltered)
  }

  test("ivfFilteredTopK at full probe == filteredTopK (exact under filter)") {
    import graft.filter.FilterAst._
    val labeled = index.withColumn("label", (col("vec_id") % 3).cast("int"))
    val f = Or.of(Pred("label", Eq, 1), Pred("label", Eq, 2))
    val assigned = Similarity.ivfAssign(labeled, "embedding", nlist = 4,
      dim = 4)
    val ivf = Similarity.ivfFilteredTopK(assigned, "embedding", "vec_id", f,
      query, k = 5, nlist = 4, nprobe = 4)
      .select("id").as[Long].collect().toSeq
    val brute = Similarity.filteredTopK(labeled, "embedding", "vec_id", f,
      query, 5).select("id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("KMeans IVF with full probe equals brute-force top-k") {
    val (assigned, centers) = MlAnn.kmeansIvf(index, "embedding", "vec_id", nlist = 3)
    val ivf = MlAnn.ivfTopK(assigned, centers, query, k = 5, nprobe = 3)
      .select("id").as[Long].collect().toSeq
    val brute = Similarity.topK(index, "embedding", "vec_id", query, 5)
      .select("id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("KMeans IVF with nprobe=1 stays within the query's cluster") {
    val (assigned, centers) = MlAnn.kmeansIvf(index, "embedding", "vec_id", nlist = 3)
    val ids = MlAnn.ivfTopK(assigned, centers, query, k = 5, nprobe = 1)
      .select("id").as[Long].collect().toSeq
    assert(ids.size == 5)
    assert(ids.forall(_ % 3 == 0)) // cluster 0 members are i % 3 == 0
  }

  test("deterministic KMeans IVF: full probe equals brute force") {
    val (assigned, centers) =
      MlAnn.detKmeansIvf(index, "embedding", "vec_id", nlist = 3, iters = 2)
    val ivf = MlAnn.ivfTopK(assigned, centers, query, k = 5, nprobe = 3)
      .select("id").as[Long].collect().toSeq
    val brute = Similarity.topK(index, "embedding", "vec_id", query, 5)
      .select("id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("deterministic KMeans is partition-layout-independent") {
    val (a1, c1) =
      MlAnn.detKmeansIvf(index, "embedding", "vec_id", nlist = 3, iters = 2)
    val (a2, c2) = MlAnn.detKmeansIvf(index.repartition(7), "embedding",
      "vec_id", nlist = 3, iters = 2)
    // bit-equal centroids and identical cell assignments: the ordered-fold
    // means never see partitioning, which is the whole oracle contract
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(a1.orderBy("id").select("id", "ivf_cell").collect().toSeq ==
      a2.orderBy("id").select("id", "ivf_cell").collect().toSeq)
  }

  test("deterministic KMeans separates the three planted clusters") {
    val (assigned, _) =
      MlAnn.detKmeansIvf(index, "embedding", "vec_id", nlist = 3, iters = 2)
    // every planted cluster (id % 3) maps to exactly one learned cell
    val m = assigned.select((col("id") % 3).as("truth"), col("ivf_cell"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(m.size == 3 && m.map(_._2).distinct.size == 3)
  }

  test("LSH top-k finds the true nearest neighbors on separated clusters") {
    val out = MlAnn.lshTopK(index, "embedding", "vec_id", query, k = 5)
      .select("id").as[Long].collect().toSeq
    val brute = Similarity.topK(index, "embedding", "vec_id", query, 5)
      .select("id").as[Long].collect().toSeq
    assert(out.toSet == brute.toSet)
  }

  test("mmrTopK: lambda trades relevance against redundancy; caps are loud") {
    // a = query direction, b = near-duplicate of a, c = orthogonal
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(1.0, 0.1)),   // cos(b, a) = cos(b, query) ≈ 0.995
      (3L, Seq(0.0, 1.0))    // rel 0, but novel
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    // relevance-heavy: the near-duplicate still wins slot 2
    val hi = Similarity.mmrTopK(vecs, "embedding", "vec_id", q, k = 2,
        prefetch = 3, lambda = 0.9)
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(hi == Seq((1L, 1), (2L, 2)))
    // diversity-heavy: the orthogonal vector displaces the near-duplicate
    val lo = Similarity.mmrTopK(vecs, "embedding", "vec_id", q, k = 2,
        prefetch = 3, lambda = 0.3)
      .select("id", "rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(lo == Seq((1L, 1), (3L, 2)))
    // first pick's score is exactly lambda * rel(best)
    val first = Similarity.mmrTopK(vecs, "embedding", "vec_id", q, k = 1,
        prefetch = 3, lambda = 0.3)
      .select("rel", "mmr").as[(Double, Double)].head()
    assert(math.abs(first._2 - 0.3 * first._1) < 1e-15)
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(vecs, "embedding", "vec_id", q, k = 2,
        prefetch = 20000)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(vecs, "embedding", "vec_id", q, k = 5, prefetch = 2)
    }
  }

  test("clusterProfile: hand-computed per-cell stats; deterministic mode " +
    "equals the plain-sum scale path") {
    val assigned = Seq(
      (1L, Seq(3.0, 4.0), 0),   // norm 5
      (2L, Seq(0.0, 2.0), 0),   // norm 2
      (5L, Seq(6.0, 8.0), 1)    // norm 10
    ).toDF("id", "emb", "ivf_cell")
    val det = MlAnn.clusterProfile(assigned, deterministic = true)
      .select("cell", "n", "min_id", "mean_norm")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(det == Seq((0, 2L, 1L, 3.5), (1, 1L, 5L, 10.0)))
    val plain = MlAnn.clusterProfile(assigned.repartition(5))
      .select("cell", "n", "min_id", "mean_norm")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(plain.size == det.size && plain.zip(det).forall { case (a, b) =>
      a._1 == b._1 && a._2 == b._2 && a._3 == b._3 &&
        math.abs(a._4 - b._4) < 1e-9
    })
  }

  test("centroidSilhouette: hand-computed scores, misassignment goes " +
    "negative, centroid-coincident point scores 0, cluster-count guard") {
    val centers = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val assigned = Seq(
      (1L, Seq(0.0, 0.0), 0),  // ON centroid 0: a=0, b=10 -> s=1
      (2L, Seq(4.0, 0.0), 0),  // a=4, b=6 -> s=(6-4)/6
      (3L, Seq(9.0, 0.0), 0),  // misassigned: a=9, b=1 -> s=(1-9)/9
      (4L, Seq(10.0, 0.0), 1)  // ON centroid 1: a=0, b=10 -> s=1
    ).toDF("id", "emb", "ivf_cell")
    val det = MlAnn.centroidSilhouette(assigned, centers,
        deterministic = true)
      .select("cell", "n", "mean_silhouette")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    val cell0 = (1.0 + 2.0 / 6.0 + -8.0 / 9.0) / 3.0
    assert(det.map(_._1) == Seq(0, 1) && det.map(_._2) == Seq(3L, 1L))
    assert(math.abs(det(0)._3 - BigDecimal(cell0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(det(1)._3 == 1.0)
    // a point equal to EVERY centroid: max(a,b)=0 -> defined as 0
    val deg = MlAnn.centroidSilhouette(
      Seq((1L, Seq(0.0, 0.0), 0)).toDF("id", "emb", "ivf_cell"),
      Array(Array(0.0, 0.0), Array(0.0, 0.0)), deterministic = true)
      .select("mean_silhouette").as[Double].head()
    assert(deg == 0.0)
    // scale path agrees within float tolerance under repartitioning
    val plain = MlAnn.centroidSilhouette(assigned.repartition(5), centers)
      .select("cell", "mean_silhouette")
      .as[(Int, Double)].collect().sortBy(_._1).toSeq
    assert(plain.zip(det).forall { case ((c, m), (c2, _, m2)) =>
      c == c2 && math.abs(m - m2) < 1e-9 })
    intercept[IllegalArgumentException] {
      MlAnn.centroidSilhouette(assigned, Array(Array(0.0, 0.0)))
    }
  }

  test("PQ: codebook shapes, encode assigns planted clusters per subspace") {
    // dim=4, m=2 subspaces of 2 dims; subspace clusters are well separated:
    // first half clusters on i%2, second half on i%3
    val rows = (0 until 24).map { i =>
      (i.toLong, Array(
        if (i % 2 == 0) 10.0 else -10.0, (i % 5) * 0.01,
        (i % 3) * 10.0, 1.0 + (i % 4) * 0.01))
    }
    val df = rows.toDF("vec_id", "embedding")
    // codes=2: init = ids 0,1 → one centroid per planted sub0 cluster
    // (codes=3 would seed two inits inside the same cluster and split it)
    val cbs = MlAnn.pqTrain(df, "embedding", "vec_id", dim = 4, m = 2,
      codes = 2, iters = 2)
    assert(cbs.length == 2 && cbs.forall(_.length == 2) &&
      cbs.forall(_.forall(_.length == 2)))
    val codes = MlAnn.pqEncode(df, "embedding", "vec_id", cbs)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    // same subspace-cluster members must share a code
    val bySub0 = codes.groupBy { case (id, c) => id % 2 }.values
      .map(_.map(_._2(0)).toSet)
    assert(bySub0.forall(_.size == 1))
    val bySub1 = codes.groupBy { case (id, c) => id % 3 }.values
      .map(_.map(_._2(1)).toSet)
    assert(bySub1.forall(_.size == 1))
  }

  test("PQ ADC top-k equals the hand-computed table-lookup ranking") {
    val rows = (0 until 24).map { i =>
      (i.toLong, Array(
        if (i % 2 == 0) 10.0 else -10.0, (i % 5) * 0.01,
        (i % 3) * 10.0, 1.0 + (i % 4) * 0.01))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = Seq(10.0, 0.0, 20.0, 1.0)
    val cbs = MlAnn.pqTrain(df, "embedding", "vec_id", dim = 4, m = 2,
      codes = 3, iters = 2)
    val encoded = MlAnn.pqEncode(df, "embedding", "vec_id", cbs).cache()
    val got = MlAnn.pqTopK(encoded, cbs, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // hand-compute: per-subspace sqdist table, sum, rank (dist asc, id asc)
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val table = cbs.zipWithIndex.map { case (cb, s) =>
      cb.map(c => sq(q.slice(s * 2, s * 2 + 2), c.toSeq))
    }
    val want = encoded.collect()
      .map { r =>
        val cs = r.getSeq[Int](1)
        (r.getLong(0), table(0)(cs(0)) + table(1)(cs(1)))
      }
      .sortBy { case (id, d) => (d, id) }.take(5)
    assert(got.toSeq == want.toSeq)
  }

  test("knnGraph: edges stay in-cell, ranks follow cosine, mutual filter " +
    "keeps only symmetric edges") {
    val (assigned, _) =
      MlAnn.detKmeansIvf(index, "embedding", "vec_id", nlist = 3, iters = 2)
    val g = MlAnn.knnGraph(assigned, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // every node has exactly k = 3 neighbors (cells hold 10 planted rows)
    assert(g.groupBy(_._1).forall(_._2.size == 3))
    // neighbors never leave the source's planted cluster (≡ its cell)
    assert(g.forall { case (s, d, _, _) => s % 3 == d % 3 })
    // ranks are ordered by descending cosine within each source
    g.groupBy(_._1).values.foreach { es =>
      val byRank = es.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // mutual mode returns a subset closed under edge reversal
    val m = MlAnn.knnGraph(assigned, k = 1, mutual = true)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(m.nonEmpty && m.forall { case (s, d) => m.contains((d, s)) })
    assert(m.subsetOf(MlAnn.knnGraph(assigned, k = 1)
      .select("src", "dst").as[(Long, Long)].collect().toSet))
    intercept[IllegalArgumentException] { MlAnn.knnGraph(assigned, k = 0) }
  }

  test("ivfPqTopK: full probe equals plain PQ; nprobe=1 stays in the " +
    "query's cell") {
    val (assigned, centers) =
      MlAnn.detKmeansIvf(index, "embedding", "vec_id", nlist = 3, iters = 2)
    val (encoded, cbs) =
      MlAnn.pqTrain(index, "embedding", "vec_id", dim = 4, m = 2, codes = 3,
        iters = 2) match {
        case cb => (MlAnn.pqEncode(index, "embedding", "vec_id", cb), cb)
      }
    val full = MlAnn.ivfPqTopK(assigned, centers, encoded, cbs, query,
      k = 5, nprobe = 3).select("id").as[Long].collect().toSeq
    val plain = MlAnn.pqTopK(encoded, cbs, query, k = 5)
      .select("id").as[Long].collect().toSeq
    assert(full == plain, "nprobe = nlist must degenerate to plain PQ")
    // nprobe=1: every result comes from the cell nearest the query, which
    // on the planted clusters is the id%3==0 cluster
    val one = MlAnn.ivfPqTopK(assigned, centers, encoded, cbs, query,
      k = 5, nprobe = 1).select("id").as[Long].collect().toSeq
    assert(one.nonEmpty && one.forall(_ % 3 == 0))
    intercept[IllegalArgumentException] {
      MlAnn.ivfPqTopK(assigned, centers, encoded, cbs, query, 0, 1)
    }
  }

  test("PQ rejects a dim that does not divide into m subspaces") {
    val df = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      MlAnn.pqTrain(df, "embedding", "vec_id", dim = 3, m = 2, codes = 2)
    }
  }
}
