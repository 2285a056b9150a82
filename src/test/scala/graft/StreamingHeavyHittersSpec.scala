package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingHeavyHitters
import graft.ops.TextAnalysis

/** The streamed Misra-Gries summary must (a) keep the superset guarantee
  * under any batching of the stream, and (b) after the exact recount,
  * EQUAL the batch heavy-hitters answer on the accumulated corpus. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("mgMerge: folded chunk summaries keep the superset guarantee and " +
    "lower-bound counts (undercount <= n/(capacity+1))") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish corpus: token k appears ~ 400/k times
    val tokens = (1 to 40).flatMap(k =>
      Seq.fill(400 / k)(s"t$k")).map(t => (t, rnd.nextInt()))
      .sortBy(_._2).map(_._1) // shuffle deterministically
    val capacity = 8
    val n = tokens.size.toLong
    val exact = tokens.groupBy(identity).map { case (t, g) =>
      t -> g.size.toLong }
    // fold 7 uneven chunks through mgMerge (each chunk's exact counts
    // squeezed to a valid MG summary by merging against the empty one)
    val chunks = tokens.grouped(97).toSeq
    val folded = chunks.foldLeft(Seq.empty[(String, Long)]) { (acc, ch) =>
      val chunkExact = ch.groupBy(identity).toSeq
        .map { case (t, g) => (t, g.size.toLong) }
      StreamingHeavyHitters.mgMerge(acc,
        StreamingHeavyHitters.mgMerge(chunkExact, Nil, capacity), capacity)
    }
    val foldedMap = folded.toMap
    assert(folded.size <= capacity)
    val bound = n / (capacity + 1)
    exact.foreach { case (t, c) =>
      if (c > bound)
        assert(foldedMap.contains(t), s"$t (count $c > $bound) was lost")
    }
    folded.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(exact(t) - c <= bound, s"$t undercounted past the bound")
    }
  }

  test("streamed state + exact recount == batch heavyHitters; redelivered " +
    "batch ids fold exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("shh").toString
    val statePath = s"$dir/state"
    val capacity = 8
    val docs1 = Seq("spark spark join filter", "spark join scan",
      "alpha beta gamma", "spark filter filter")
    val docs2 = Seq("join join spark", "delta epsilon spark",
      "filter join spark spark")
    val input = MemoryStream[String]
    def start() = input.toDS().toDF("text").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) =>
        StreamingHeavyHitters.mergeBatch(b, "text", statePath, capacity, id))
      .start()
    input.addData(docs1: _*)
    val q1 = start(); q1.awaitTermination()
    input.addData(docs2: _*)
    val q2 = start(); q2.awaitTermination()
    val corpus = (docs1 ++ docs2).toDF("text")
    def latest() = StreamingHeavyHitters
      .latestStatePath(spark, statePath).get
    val state = spark.read.parquet(latest())
    // explicit redelivery of an already-folded batch id is a no-op
    val before = state.collect().toSet
    StreamingHeavyHitters.mergeBatch(
      docs1.toDF("text"), "text", statePath, capacity, batchId = 0L)
    assert(spark.read.parquet(latest()).collect().toSet == before)
    // atomic-commit contract: exactly one committed version remains
    // (older ones GC'd after the rename), and crash leftovers — a stale
    // _tmp_ dir from a fold that died mid-write — are invisible to reads
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(root).count(_.getPath.getName.startsWith("v-")) == 1)
    val junk = new org.apache.hadoop.fs.Path(root, "_tmp_v-99")
    fs.mkdirs(junk)
    val (sumAfter, _, batchAfter) =
      StreamingHeavyHitters.readState(spark, statePath)
    assert(sumAfter.toSet == before.collect {
      case r if !r.isNullAt(0) => (r.getString(0), r.getLong(1)) })
    assert(batchAfter >= 0 && batchAfter < 99)
    // token total carried in the state equals the corpus total
    val nStream = state.head().getAs[Long]("n_tokens")
    val nBatch = corpus.select(
      sum(size(split(col("text"), "\\s+")))).as[Long].head()
    assert(nStream == nBatch)
    // exact finisher over the accumulated corpus == the batch operator
    // (phi = 1/10, capacity 8 > 1/phi... needs capacity > 10 — use 1/6)
    val streamed = StreamingHeavyHitters.finishExact(
        corpus, "text", state, phiNum = 1, phiDen = 6)
      .as[(String, Long)].collect().toSeq
    val batch = TextAnalysis.heavyHitters(corpus, "text", n = 1,
        phiNum = 1, phiDen = 6, capacity = capacity)
      .as[(String, Long)].collect().toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty) // 'spark' is a true 1/6-hitter here
  }

  test("legacy flat state layout (parquet at the root, no version dirs) " +
    "is refused loudly, never silently read as empty") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shh-flat").toString
    val statePath = s"$dir/state"
    // simulate the pre-versioned mode("overwrite") layout
    Seq(("spark", 3L, 10L, 2L)).toDF("token", "cnt", "n_tokens", "batch_id")
      .coalesce(1).write.mode("overwrite").parquet(statePath)
    val e = intercept[IllegalStateException] {
      StreamingHeavyHitters.readState(spark, statePath)
    }
    assert(e.getMessage.contains("legacy FLAT layout"))
    val e2 = intercept[IllegalStateException] {
      StreamingHeavyHitters.mergeBatch(Seq("a b").toDF("text"), "text",
        statePath, capacity = 4, batchId = 3L)
    }
    assert(e2.getMessage.contains("v-"))
  }
}
