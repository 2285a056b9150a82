package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / resize / frame-sample
 * stages.
 *
 * The Spark-side plumbing (schemas, batched mapPartitions, partition sizing)
 * is real; the codec step is a clearly-marked deterministic STUB — the
 * image/audio libraries are not in this container, and in production the stub
 * body is the only thing that changes (swap in the real decoder; signature,
 * batching and schema stay).
 *
 * Scale notes: media rows are large and skewed, so every stage (a) keeps the
 * binary column out of shuffles (features are extracted first, bytes dropped
 * before any wide operation), and (b) repartitions by target byte budget,
 * not row count.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  /** Wrap a raw bytes frame into the typed media schema. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
              mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("string").as("media_id"),
      lit(mediaType).as("media_type"),
      col(bytesCol).cast("binary").as("content"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      lit(null).cast("string").as("codec"))

  /**
   * STUB decode: deterministic pseudo-features from the content bytes.
   * Replace the body with a real codec call (PIL/ffmpeg equivalent) in
   * production; everything around it — per-partition batching, output
   * schema, null passthrough — is the real plumbing.
   */
  def decodeFeatures(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", StringType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions { rows =>
        // Batch shape: one digest instance per partition, reused across rows
        // (where a real decoder would hold its codec context).
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getString(0)
          val tpe = r.getString(1)
          val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val feats: Array[Float] =
            if (bytes.isEmpty) null
            else {
              // ??? real decode goes here — stub: md5-seeded pseudo-features
              // (double math, final float rounding: reproducible anywhere)
              val d = md.digest(bytes)
              Array.tabulate(featureDim) { i =>
                ((d((i * 3) % d.length) & 0xff) / 255.0 * 2.0 - 1.0).toFloat
              }
            }
          Row(id, tpe, bytes.length.toLong, feats)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: records the target dims; a real impl rewrites content. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling plan for videos: one row per sampled frame timestamp —
    * the explode happens on metadata only; bytes stay with the parent row. */
  def sampleFramePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .drop("content")

  /** Byte-budget repartitioning: media tables skew by row size, so partition
    * count derives from total bytes, not row count. */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = media
      .agg(sum(coalesce(length(col("content")), lit(0)))).head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
}
