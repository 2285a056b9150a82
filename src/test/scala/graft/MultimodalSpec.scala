package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "imagebytes-one"), (2L, "imagebytes-two"), (3L, null))
      .toDF("id", "payload")
      .withColumn("payload", encode(col("payload"), "UTF-8")),
    "id", "payload", "image")

  test("asMedia produces the typed media schema") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.count() == 3)
  }

  test("decodeFeatures: fixed dims, deterministic, null passthrough") {
    val out = Multimodal.decodeFeatures(media, featureDim = 8).cache()
    assert(out.count() == 3)
    val feats = out.filter(col("media_id") === "1")
      .select("features").as[Seq[Float]].head()
    assert(feats.length == 8 && feats.forall(f => f >= -1.0f && f <= 1.0f))
    val again = Multimodal.decodeFeatures(media, featureDim = 8)
      .filter(col("media_id") === "1").select("features").as[Seq[Float]].head()
    assert(feats == again)
    assert(out.filter(col("media_id") === "3").select("features").head().isNullAt(0))
  }

  test("sampleFramePlan explodes metadata only") {
    val video = media
      .withColumn("media_type", lit("video"))
      .withColumn("duration_ms", lit(1000L))
    val plan = Multimodal.sampleFramePlan(video, everyMs = 250)
    assert(plan.count() == 3 * 5) // 0,250,500,750,1000
    assert(!plan.columns.contains("content"))
  }

  test("repartitionByBytes derives partitions from data size") {
    val out = Multimodal.repartitionByBytes(media, targetBytesPerPartition = 10)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 3)
  }
}
