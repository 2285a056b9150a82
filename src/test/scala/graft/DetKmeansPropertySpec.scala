package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MlAnn

/** Property gate for the deterministic KMeans trainer: on random inputs the
  * distributed implementation must agree exactly with a straightforward
  * single-threaded Lloyd's that follows the same published rules
  * (smallest-id init, strict-less argmin with lower-index ties, id-ordered
  * summation, empty cells keep their centroid). Exact double equality, not
  * tolerance — the ordered folds are the contract the DuckDB oracle relies
  * on. */
class DetKmeansPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveLloyd(rows: Seq[(Long, Array[Double])], k: Int,
                         iters: Int): (Map[Long, Int], Array[Array[Double]]) = {
    val sorted = rows.sortBy(_._1)
    var centers = sorted.take(k).map(_._2.clone()).toArray
    def sq(a: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - c(i); s = s + d * d; i += 1 }
      s
    }
    def cell(a: Array[Double]): Int = {
      var best = 0; var bestD = sq(a, centers(0)); var i = 1
      while (i < centers.length) {
        val d = sq(a, centers(i))
        if (d < bestD) { best = i; bestD = d }
        i += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val assigned = sorted.map { case (id, a) => (id, a, cell(a)) }
      val next = centers.map(_.clone())
      assigned.groupBy(_._3).foreach { case (c, members) =>
        val dim = members.head._2.length
        val acc = Array.fill(dim)(0.0)
        // id order: members of a sorted seq stay sorted under groupBy's
        // value lists? Not guaranteed — enforce it.
        members.sortBy(_._1).foreach { case (_, a, _) =>
          var i = 0; while (i < dim) { acc(i) = acc(i) + a(i); i += 1 }
        }
        next(c) = acc.map(_ / members.size)
      }
      centers = next
    }
    (sorted.map { case (id, a) => id -> cell(a) }.toMap, centers)
  }

  test("detKmeansIvf matches a naive ordered Lloyd's bit-for-bit on random data") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 25
      val dim = 3 + trial
      val k = 2 + trial
      val rows = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)(rnd.nextDouble() * 10 - 5))
      }
      val df = rows.map { case (id, a) => (id, a.toSeq) }
        .toDF("vec_id", "embedding")
      val (assigned, centers) =
        MlAnn.detKmeansIvf(df, "embedding", "vec_id", nlist = k, iters = 2)
      val (expAssign, expCenters) = naiveLloyd(rows, k, iters = 2)
      val gotCenters = centers.map(_.toSeq).toSeq
      assert(gotCenters == expCenters.map(_.toSeq).toSeq,
        s"trial $trial centroids diverge")
      val gotAssign = assigned.select(col("id"), col("ivf_cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(gotAssign == expAssign, s"trial $trial assignments diverge")
    }
  }
}
