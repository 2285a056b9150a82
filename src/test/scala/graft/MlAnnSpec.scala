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

  test("LSH top-k finds the true nearest neighbors on separated clusters") {
    val out = MlAnn.lshTopK(index, "embedding", "vec_id", query, k = 5)
      .select("id").as[Long].collect().toSeq
    val brute = Similarity.topK(index, "embedding", "vec_id", query, 5)
      .select("id").as[Long].collect().toSeq
    assert(out.toSet == brute.toSet)
  }
}
