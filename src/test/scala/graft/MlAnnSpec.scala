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
}
