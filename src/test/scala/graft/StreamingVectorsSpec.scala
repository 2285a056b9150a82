package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.MlAnn
import graft.streaming.StreamingVectors

/** Incremental IVF assignment: the stream must route every vector to the
  * SAME cell the batch index assigns, across micro-batch boundaries, and
  * the cell-load monitor must count exactly the arrivals per cell. */
class StreamingVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range): Seq[(Long, Array[Double])] =
    ids.map { i =>
      val base = i % 3 match {
        case 0 => Array(10.0, 0.0, 0.0, 1.0)
        case 1 => Array(0.0, 10.0, 0.0, 1.0)
        case _ => Array(0.0, 0.0, 10.0, 1.0)
      }
      (i.toLong, base.map(_ + (i % 7) * 0.01))
    }

  test("streamed cell assignment equals the batch index across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // train once on an initial corpus; the stream then rides the frozen
    // codebook
    val train = vecs(0 until 30).toDF("vec_id", "embedding")
    val (_, centers) = MlAnn.detKmeansIvf(train, "embedding", "vec_id",
      nlist = 3, iters = 2)

    val input = MemoryStream[(Long, Array[Double])]
    val assigned = StreamingVectors.assignCells(
      input.toDS().toDF("vec_id", "embedding"), "embedding", "vec_id",
      centers)
    val q = assigned.writeStream.format("memory").queryName("sv_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(vecs(100 until 110): _*)
    q.processAllAvailable()
    input.addData(vecs(110 until 120): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sv_out")
      .select(col("id"), col("ivf_cell")).as[(Long, Int)].collect().toMap
    val batch = MlAnn.assignCells(
        vecs(100 until 120).toDF("vec_id", "embedding"),
        "embedding", "vec_id", centers)
      .select(col("id"), col("ivf_cell")).as[(Long, Int)].collect().toMap
    assert(streamed == batch && streamed.size == 20)

    // the load monitor counts arrivals per cell, state bounded by nlist
    val loads = StreamingVectors.cellLoad(spark.table("sv_out"))
      .as[(Int, Long)].collect().toMap
    assert(loads.values.sum == 20 && loads.keySet.subsetOf(Set(0, 1, 2)))
    // planted clusters land together: same i%3 class -> same cell
    val byClass = streamed.groupBy { case (id, _) => id % 3 }.values
      .map(_.values.toSet)
    assert(byClass.forall(_.size == 1))
  }
}
