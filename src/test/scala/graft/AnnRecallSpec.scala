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
}
