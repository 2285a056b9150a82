package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{MlAnn, Similarity}

/** Pins the recall contracts behind ANN_RECALL.md: IVF at full probe IS
  * the brute-force cosine ranking (ties resolved identically), and the
  * probe's recall arithmetic is honest (monotone in nprobe). */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  // 60 deterministic 8-dim vectors in 3 loose clusters + noise — small
  // enough to brute-force, structured enough that partial probes miss
  private lazy val vecs: DataFrame = (1 to 60).map { i =>
    val c = i % 3
    val base = Array.tabulate(8)(j => if (j % 3 == c) 1.0 else 0.1)
    val v = base.zipWithIndex.map { case (x, j) =>
      (x + 0.01 * ((i * 7 + j * 13) % 17)).toFloat }
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  test("IVF recall@k at nprobe = nlist is exactly 1.0 (same ranking AND " +
    "same tie resolution as brute-force cosine); recall is monotone-ish " +
    "in nprobe and < 1 when cells go unprobed") {
    val k = 10
    val (assigned, centers) =
      MlAnn.detKmeansIvf(vecs, "embedding", "vec_id", nlist = 4, iters = 2)
    val queries = vecs.filter(col("vec_id") <= 5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
    def recallAt(np: Int): Double = {
      val per = queries.map { case (_, q) =>
        val exact = ids(Similarity.topK(vecs, "embedding", "vec_id", q, k))
        val approx = ids(MlAnn.ivfTopK(assigned, centers, q, k, np))
        (approx.toSet & exact.toSet).size.toDouble / k
      }
      per.sum / per.length
    }
    val rFull = recallAt(4)
    assert(rFull == 1.0, s"recall@full = $rFull")
    // full probe must reproduce the EXACT ORDERED list, not just the set
    queries.foreach { case (_, q) =>
      val exact = ids(Similarity.topK(vecs, "embedding", "vec_id", q, k))
      val full = ids(MlAnn.ivfTopK(assigned, centers, q, k, 4))
      assert(full == exact, s"ordered mismatch: $full vs $exact")
    }
    val r1 = recallAt(1)
    assert(r1 < 1.0, "nprobe=1 should miss cross-cell neighbors on " +
      "clustered data — if it doesn't, the fixture stopped exercising " +
      "the approximation")
    assert(r1 <= rFull)
  }

  test("residual IVF-PQ recovers the recall raw-vector PQ loses on a " +
    "clustered corpus at equal m x codes (the ANN_RECALL.md clustered-" +
    "table contract: raw PQ collapses tight clusters into a few codes " +
    "— measured 0.29 vs 0.65 residual at m=16x32 on the probe corpus)") {
    val n = 240; val dim = 32; val k = 10; val m = 8; val codes = 16
    val clu = MlAnn.plantedClusterCorpus(spark, n, dim, clusters = 8,
      noise = 0.15)
    val rows = clu.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val queries = rows.sortBy(_._1).take(8)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def exactTop(q: Array[Double]): Set[Long] =
      rows.map { case (id, v) => (l2(q, v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
    def recallOf(approx: Array[Double] => Set[Long]): Double = {
      val per = queries.map { case (_, q) =>
        (approx(q) & exactTop(q)).size.toDouble / k }
      per.sum / per.length
    }
    // raw-vector PQ at the budget
    val cbsRaw = MlAnn.pqTrain(clu, "embedding", "vec_id",
      dim = dim, m = m, codes = codes, iters = 1)
    val encRaw = MlAnn.pqEncode(clu, "embedding", "vec_id", cbsRaw)
    encRaw.cache().count()
    val rRaw = recallOf(q => ids(MlAnn.pqTopK(encRaw, cbsRaw, q.toSeq, k))
      .toSet)
    encRaw.unpersist()
    // residual IVF-PQ at the SAME budget, coarse cells sized to the
    // cluster structure (nlist = clusters; residuals are then the small
    // within-cluster displacements the codebooks can actually resolve)
    val (assigned, centers) =
      MlAnn.detKmeansIvf(clu, "embedding", "vec_id", nlist = 8, iters = 2)
    assigned.cache().count()
    val cbsRes = MlAnn.pqTrainResidual(assigned, centers,
      dim = dim, m = m, codes = codes, iters = 1)
    val encRes = MlAnn.pqEncodeResidual(assigned, centers, cbsRes)
    encRes.cache().count()
    val rRes = recallOf(q => ids(MlAnn.ivfPqResidualTopK(encRes, centers,
      cbsRes, q.toSeq, k, nprobe = 8)).toSet)
    // refine stage: ADC top-R candidates, exact rerank to k (the FAISS
    // IndexRefineFlat discipline) — R-bounded exact reads buy back the
    // compression error inside the candidate set
    val rRef = recallOf(q => ids(MlAnn.ivfPqRefineTopK(encRes, assigned,
      centers, cbsRes, q.toSeq, k, nprobe = 8, refine = 8 * k)).toSet)
    encRes.unpersist(); assigned.unpersist()
    assert(rRes > rRaw,
      f"residual IVF-PQ recall $rRes%.3f should beat raw-vector PQ " +
        f"$rRaw%.3f on a clustered corpus at equal m x codes")
    assert(rRef >= rRes,
      f"refine $rRef%.3f must not lose to its own candidate ranking " +
        f"$rRes%.3f")
    assert(rRef >= 0.9,
      f"refine at R=8k should reach >=0.9 recall on the clustered " +
        f"corpus; got $rRef%.3f")
  }
}
