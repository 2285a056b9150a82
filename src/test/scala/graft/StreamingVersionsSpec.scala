package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.VersionManager
import graft.streaming.StreamingVersions

/** Streaming CDC apply must converge to the batch mergeVersions result
  * over the union of all delivered changes — across micro-batch
  * boundaries, under redelivery, without touching cold vids. */
class StreamingVersionsSpec extends SparkSpec {
  import spark.implicits._

  private val vidCols = Seq("vid")

  private def asSet(df: DataFrame) =
    df.select("vid", "doc", "valid_from", "valid_to")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("incremental mergeBatch equals batch mergeVersions; cold vids " +
    "pass through untouched") {
    val initial = VersionManager.mergeVersions(
      Seq((1L, 10L, 100L), (1L, 11L, 200L), (2L, 20L, 100L))
        .toDF("vid", "doc", "valid_from"),
      vidCols, "valid_from", Seq("doc"))
    // batch: new version for vid 1, brand-new vid 3, redelivery of
    // (1, 200) which must NOT mint a duplicate interval
    val batch = Seq((1L, 12L, 300L), (3L, 30L, 150L), (1L, 11L, 200L))
      .toDF("vid", "doc", "valid_from")
    val out = StreamingVersions.mergeBatch(initial, batch, vidCols,
      "valid_from", Seq("doc"))
    val expected = VersionManager.mergeVersions(
      Seq((1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 300L),
        (2L, 20L, 100L), (3L, 30L, 150L)).toDF("vid", "doc", "valid_from"),
      vidCols, "valid_from", Seq("doc"))
    assert(asSet(out) == asSet(expected))
  }

  test("applyChanges over micro-batches converges to the batch store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("svers").toString
    val storePath = s"$dir/store"
    // empty store with the right schema
    Seq.empty[(Long, Long, Long)].toDF("vid", "doc", "valid_from")
      .withColumn("valid_to", lit(0L))
      .write.parquet(storePath)
    val input = MemoryStream[(Long, Long, Long)]
    def start() = StreamingVersions.applyChanges(
      input.toDS().toDF("vid", "doc", "valid_from"), vidCols,
      "valid_from", Seq("doc"), s"$dir/ckpt")(
      () => spark.read.parquet(storePath),
      out => {
        val tmp = s"$dir/store_next_${System.nanoTime()}"
        out.write.parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(storePath)
      })
    // AvailableNow drains what's queued, then stops — the restart with the
    // SAME checkpoint must resume past batch 1 (no double-apply) and pick
    // up the second delivery
    input.addData((1L, 10L, 100L), (2L, 20L, 100L))
    val q1 = start(); q1.awaitTermination()
    input.addData((1L, 11L, 200L), (3L, 30L, 150L), (1L, 10L, 100L))
    val q2 = start(); q2.awaitTermination()
    val expected = VersionManager.mergeVersions(
      Seq((1L, 10L, 100L), (1L, 11L, 200L), (2L, 20L, 100L),
        (3L, 30L, 150L)).toDF("vid", "doc", "valid_from"),
      vidCols, "valid_from", Seq("doc"))
    assert(asSet(spark.read.parquet(storePath)) == asSet(expected))
  }
}
