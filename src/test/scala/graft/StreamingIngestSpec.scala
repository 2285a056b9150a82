package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("JSONL stream ingests per-file micro-batches with checkpoint dedup") {
    val srcDir = Files.createTempDirectory("jsonl_src").toFile
    val ckDir = Files.createTempDirectory("jsonl_ck").toFile
    def writeFile(name: String, docs: Seq[(Long, String)]): Unit = {
      val f = new java.io.File(srcDir, name)
      val w = new java.io.PrintWriter(f)
      docs.foreach { case (id, t) => w.println(s"""{"doc_id":$id,"text":"$t"}""") }
      w.close()
    }
    writeFile("a.jsonl", Seq((1L, "alpha doc"), (2L, "beta doc")))
    writeFile("b.jsonl", Seq((2L, "beta doc again"), (3L, "gamma doc")))

    // doc 2 is already built — the checkpoint anti-join must drop BOTH its
    // re-deliveries even though they arrive in different micro-batches.
    val processed = Seq(Tuple1(2L)).toDF("doc_id")

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val stream = StreamingIngest.jsonlStream(
      spark, srcDir.getAbsolutePath, schema, filesPerTrigger = 1)
    val q = StreamingIngest.ingest(stream, processed, "doc_id",
      ckDir.getAbsolutePath) { (batch, batchId) =>
      batch.select(col("doc_id")).as[Long](spark.implicits.newLongEncoder)
        .collect().foreach(id => seen.add((batchId, id)))
    }
    q.awaitTermination(60000)

    val ids = seen.toArray.map(_.asInstanceOf[(Long, Long)]._2).toSet
    assert(ids == Set(1L, 3L))
    // per-file micro-batching: the two fresh ids arrived in different batches
    val batches = seen.toArray.map(_.asInstanceOf[(Long, Long)]._1).toSet
    assert(batches.size == 2)
  }

  test("dedupStream drops re-delivered ids inside the watermark window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp((100 + min) * 60000L)
    val deduped = StreamingIngest.dedupStream(
      input.toDS().toDF("doc_id", "event_time", "text"),
      "doc_id", "event_time")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, ts(0), "a"), (1L, ts(0), "a dup"), (2L, ts(1), "b"))
    q.processAllAvailable()
    input.addData((2L, ts(1), "b dup"), (3L, ts(2), "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("doc_id")
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("micro-batch pipeline: graph build inside foreachBatch, MERGE across batches") {
    val srcDir = Files.createTempDirectory("mb_src").toFile
    val ckDir = Files.createTempDirectory("mb_ck").toFile
    val outDir = Files.createTempDirectory("mb_out").toString
    def writeFile(name: String, docs: Seq[(Long, String)]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(srcDir, name))
      docs.foreach { case (id, t) => w.println(s"""{"doc_id":$id,"text":"$t"}""") }
      w.close()
    }
    // identical text in both batches: the per-table append + dedup-on-read
    // must converge to one topic/statement set (MERGE semantics)
    writeFile("a.jsonl", Seq((1L, "spark joins tables fast " * 8)))
    writeFile("b.jsonl", Seq((2L, "spark joins tables fast " * 8)))

    val stream = StreamingIngest.jsonlStream(
      spark, srcDir.getAbsolutePath, schema, filesPerTrigger = 1)
    val q = StreamingIngest.ingest(stream,
      Seq.empty[Tuple1[Long]].toDF("doc_id"), "doc_id",
      ckDir.getAbsolutePath) { (batch, batchId) =>
      if (!batch.isEmpty) {
        val g = graft.index.LexicalGraphBuilder.fromDocuments(
          batch.withColumn("source", lit(s"b$batchId")),
          "text", Seq("doc_id", "source"))
        g.statements.write.mode("append").parquet(s"$outDir/statements")
      }
    }
    q.awaitTermination(120000)

    val all = spark.read.parquet(s"$outDir/statements")
    // two per-batch builds appended; the dedup-on-read (MERGE) collapses the
    // identical statement ids to one row each
    assert(all.count() > all.dropDuplicates("statement_id").count())
    val merged = all.dropDuplicates("statement_id")
    assert(merged.count() > 0)
  }
}
