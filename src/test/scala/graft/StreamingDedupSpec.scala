package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** Streaming minhash-LSH near-dup: the incremental operator must surface
  * the same candidate PAIR SET as the batch [[graft.ops.Dedup.minhashLsh]]
  * run over the union of everything ingested (modulo the documented
  * at-least-once multiplicity), across micro-batch boundaries.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range, dup: Boolean): Seq[(Long, String)] =
    ids.map { i =>
      val base = s"the quick brown fox number $i jumps over the lazy dog " +
        s"while counting ${i * 7} beans in the warehouse yard"
      (i.toLong, base)
    } ++ (if (dup) Seq((900L,
      "the quick brown fox number 3 jumps over the lazy dog while " +
        "counting 21 beans in the warehouse yard")) else Nil)

  test("streaming pairs across batches equal the batch operator's pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.nearDupPairs(
      input.toDS().toDF("doc_id", "text"), "text", "doc_id")
    val q = pairs.writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()

    // batch 1: docs 1-5; batch 2: docs 6-8 plus an exact near-dup of doc 3
    // (id 900) — the cross-batch pair MUST surface even though doc 3's
    // batch is long finished
    input.addData(corpus(1 to 5, dup = false): _*)
    q.processAllAvailable()
    input.addData(corpus(6 to 8, dup = true).filter(_._1 > 5): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sdedup_out")
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    val everything = corpus(1 to 8, dup = true).toDF("doc_id", "text")
    val batch = graft.ops.Dedup.minhashLsh(everything, "text", "doc_id")
      .select(col("id_a").cast("string"), col("id_b").cast("string"))
      .as[(String, String)].collect().toSet
    assert(streamed == batch,
      s"stream=${streamed.toSeq.sorted} batch=${batch.toSeq.sorted}")
    assert(streamed.contains(("3", "900")), "cross-batch near-dup missing")
  }

  test("re-delivered ids are dropped and bucket state stays capped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // identical text → every doc shares every bucket; cap 3 bounds state
    val pairs = StreamingDedup.nearDupPairs(
      input.toDS().toDF("doc_id", "text"), "text", "doc_id",
      maxBucketSize = 3)
    val q = pairs.writeStream.format("memory").queryName("sdedup_cap")
      .outputMode(OutputMode.Append()).start()
    val same = "completely identical text for every single arriving document"
    input.addData((1L, same), (2L, same), (1L, same))
    q.processAllAvailable()
    input.addData((3L, same), (4L, same), (5L, same))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sdedup_cap")
      .select("id_a", "id_b").distinct().as[(String, String)].collect().toSet
    // doc 1's re-delivery emits nothing twice: pair (1,2) appears, and the
    // stored membership caps at 3, so docs 4 and 5 pair only against the
    // stored {1,2,3} — never against each other
    assert(got.contains(("1", "2")) && got.contains(("1", "4")))
    assert(!got.contains(("4", "5")),
      "cap exceeded: members beyond maxBucketSize were stored")
    // all surfaced pairs are exact dups → jaccard_est 1.0
    val ests = spark.table("sdedup_cap")
      .select("jaccard_est").as[Double].collect()
    assert(ests.forall(_ == 1.0))
  }
}
