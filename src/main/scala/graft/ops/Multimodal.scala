package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / resize / frame-sample
 * stages.
 *
 * The IMAGE path is real: [[decodeImage]] decodes png/jpeg bytes with
 * `javax.imageio` (JDK-only, no new dependencies) into width / height /
 * channels / per-channel means / luminance, and [[resizeImages]] rewrites
 * the bytes through a deterministic nearest-neighbor rescale. Audio/video
 * codecs are not in the JDK, so [[decodeFeatures]] remains the
 * clearly-marked deterministic stub for those modalities — the per-partition
 * batching, output schema and null passthrough around it are the real
 * plumbing and identical to the image path's.
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

  /** Real image decode (javax.imageio: png/jpeg/gif/bmp). One decoder pass
    * per partition; bytes are consumed here and DROPPED from the output, so
    * nothing downstream shuffles the binary column. Undecodable rows pass
    * through with null features and a `decode_error` — at corpus scale a
    * corrupt image must quarantine the row, not kill the job. Sums are
    * integer-exact (long accumulators); means are one double division at
    * the end, so results replay bit-identically anywhere. */
  def decodeImage(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true),
      StructField("decode_error", StringType, nullable = true)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      // in-memory ImageIO streams: the default file cache writes a temp
      // file PER read/write call (~2 ms each) — for small in-memory images
      // that disk churn IS the cost, measured ~3x on the decode query
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getString(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty)
          Row(id, null, null, null, null, null, null, null, "empty content")
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null)
            Row(id, null, null, null, null, null, null, null,
              "unreadable image bytes")
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            // bulk row reads: per-pixel getRGB pays a ColorModel conversion
            // and bounds check per call — a row at a time is several times
            // faster with identical integer sums
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val (mr, mg, mb) =
              (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
            Row(id, w, h, img.getRaster.getNumBands,
              mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb, null)
          }
        } catch {
          case e: Exception =>
            Row(id, null, null, null, null, null, null, null,
              s"decode failed: ${e.getMessage}")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic synthetic PNG corpus: REAL encoded bytes whose decoded
    * features are analytically computable, so the real decoder can be
    * oracle-gated. Per row, an md5 of `seedCol` drives a checkerboard:
    *   width  = 4 + digest[0] % 13, height = 3 + digest[1] % 7,
    *   color1 = digest[2..4], color2 = digest[5..7],
    *   pixel(x,y) = if ((x+y) even) color1 else color2
    * — the same derivation a SQL oracle replays from `md5(seed)` hex. */
  def synthPngMedia(df: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("string"), col(seedCol).cast("string"))
      .rdd.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file per encode
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val (id, seed) = (r.getString(0), r.getString(1))
          if (seed == null) {
            // mirror SQL's md5(NULL) = NULL: a null seed yields a null-byte
            // row instead of killing the task (decodeImage then quarantines
            // it like any other undecodable row)
            Row(id, "image", null, null, null, null, null)
          } else synthRow(md, id, seed)
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private def synthRow(md: java.security.MessageDigest, id: String,
                       seed: String): Row = {
    val d = md.digest(seed.getBytes("UTF-8"))
    val w = 4 + ((d(0) & 0xff) % 13)
    val h = 3 + ((d(1) & 0xff) % 7)
    val c1 = ((d(2) & 0xff) << 16) | ((d(3) & 0xff) << 8) | (d(4) & 0xff)
    val c2 = ((d(5) & 0xff) << 16) | ((d(6) & 0xff) << 8) | (d(7) & 0xff)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (((x + y) & 1) == 0) c1 else c2)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Row(id, "image", bos.toByteArray, w: Integer, h: Integer, null, "png")
  }

  /** Real resize: decode, nearest-neighbor rescale (deterministic — no
    * interpolation rounding to chase across platforms), re-encode png.
    * Content is rewritten; width/height metadata updated; undecodable rows
    * pass through unchanged with their original bytes. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content", "width",
      "height", "duration_ms", "codec").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per call
      rows.map { r =>
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val decoded =
          if (bytes == null || bytes.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (decoded == null)
          // undecodable rows really do pass through unchanged — including
          // their original width/height metadata, not nulled copies
          Row(r.getString(0), r.getString(1), bytes,
            if (r.isNullAt(3)) null else r.getInt(3): Integer,
            if (r.isNullAt(4)) null else r.getInt(4): Integer,
            if (r.isNullAt(5)) null else r.getLong(5): java.lang.Long,
            if (r.isNullAt(6)) null else r.getString(6))
        else {
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // row-buffered: one bulk read of each sampled source row and one
          // bulk write per output row (identical pixels to per-pixel
          // get/setRGB, several times fewer ColorModel conversions)
          val srcW = decoded.getWidth
          val srcBuf = new Array[Int](srcW)
          val outBuf = new Array[Int](targetW)
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * decoded.getHeight / targetH).toInt
            decoded.getRGB(0, sy, srcW, 1, srcBuf, 0, srcW)
            var x = 0
            while (x < targetW) {
              outBuf(x) = srcBuf((x.toLong * srcW / targetW).toInt)
              x += 1
            }
            out.setRGB(0, y, targetW, 1, outBuf, 0, targetW)
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(r.getString(0), r.getString(1), bos.toByteArray,
            targetW: Integer, targetH: Integer,
            if (r.isNullAt(5)) null else r.getLong(5): java.lang.Long, "png")
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Real audio decode (javax.sound.sampled: RIFF/WAVE PCM — the one codec
    * family the JDK ships). Same plumbing contract as [[decodeImage]]: one
    * pass per partition, bytes consumed here and DROPPED from the output,
    * undecodable rows quarantine with a `decode_error` instead of killing
    * the job. Amplitude sums are integer-exact (long accumulators over the
    * 16-bit samples); mean and RMS are one double division / sqrt at the
    * end, so results replay bit-identically anywhere. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", StringType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mean_amp", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("peak", IntegerType, nullable = true),
      StructField("decode_error", StringType, nullable = true)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty)
          Row(id, null, null, null, null, null, null, null, "empty content")
        else try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian)
              Row(id, null, null, null, null, null, null, null,
                s"unsupported format: ${fmt.getSampleSizeInBits}-bit " +
                  s"${fmt.getChannels}ch ${if (fmt.isBigEndian) "BE" else "LE"}")
            else {
              val raw = in.readAllBytes()
              val n = raw.length / 2
              var (sum, sumSq) = (0L, 0L)
              var peak = 0
              var i = 0
              while (i < n) {
                val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
                sum += s
                sumSq += s.toLong * s
                val a = math.abs(s)
                if (a > peak) peak = a
                i += 1
              }
              val rate = fmt.getSampleRate.toInt
              Row(id, rate, 1, n.toLong, n.toLong * 1000L / rate,
                if (n == 0) null else sum.toDouble / n,
                if (n == 0) null else math.sqrt(sumSq.toDouble / n),
                peak: Integer, null)
            }
          } finally in.close()
        } catch {
          case e: Exception =>
            Row(id, null, null, null, null, null, null, null,
              s"decode failed: ${e.getMessage}")
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame RMS energy over fixed sample windows (the audio analogue of
    * [[sampleFramePlan]], but with real feature extraction): one row per
    * frame, frame boundaries at multiples of `frameSamples`, ragged tail
    * kept. Bytes are consumed in the same pass that computes the energies,
    * so only (media_id, frame_idx, frame RMS) rows — not audio bytes — ever
    * reach a shuffle. Undecodable rows are dropped here (quarantine first
    * with [[decodeAudio]] if you need them). */
  def audioFrameEnergy(media: DataFrame, frameSamples: Int): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", StringType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian) Iterator.empty
            else {
              val raw = in.readAllBytes()
              val n = raw.length / 2
              val id = r.getString(0)
              (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
                val lo = f * frameSamples
                val hi = math.min(lo + frameSamples, n)
                var sumSq = 0L
                var i = lo
                while (i < hi) {
                  val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
                  sumSq += s.toLong * s
                  i += 1
                }
                Row(id, f, hi - lo, math.sqrt(sumSq.toDouble / (hi - lo)))
              }
            }
          } finally in.close()
        } catch { case _: Exception => Iterator.empty }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic synthetic WAV corpus: REAL RIFF/WAVE PCM16LE mono bytes
    * whose decoded stats are analytically computable, so the real decoder can
    * be oracle-gated (the audio twin of [[synthPngMedia]]). Per row, an md5
    * of `seedCol` drives the clip:
    *   n_samples = 64 + digest[0] % 192,  sample rate 8000 Hz,
    *   sample[i] = signed(digest[1 + (i % 15)]) * 256
    * — a 15-byte cycle (co-prime with typical frame sizes), replayable from
    * `md5(seed)` hex with integer cycle math. */
  def synthWavMedia(df: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("string"), col(seedCol).cast("string"))
      .rdd.mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val (id, seed) = (r.getString(0), r.getString(1))
          if (seed == null) Row(id, "audio", null, null, null, null, null)
          else {
            val d = md.digest(seed.getBytes("UTF-8"))
            val n = 64 + ((d(0) & 0xff) % 192)
            val pcm = new Array[Byte](2 * n)
            var i = 0
            while (i < n) {
              val s = d(1 + (i % 15)).toInt * 256 // signed byte → 16-bit
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm),
              new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false),
              n.toLong)
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            Row(id, "audio", bos.toByteArray, null, null,
              n.toLong * 1000L / 8000L, "pcm_s16le")
          }
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Metadata-only resize plan: records the target dims without touching
    * bytes (the cheap path when downstream only needs the plan); use
    * [[resizeImages]] to actually rewrite content. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Frame sampling plan for videos: one row per sampled frame timestamp —
    * the explode happens on metadata only; bytes stay with the parent row. */
  def sampleFramePlan(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    media.filter(col("media_type") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .drop("content")
  }

  /** Byte-budget repartitioning: media tables skew by row size, so partition
    * count derives from total bytes, not row count. */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    // sum over zero rows is NULL — an empty frame gets one partition, not
    // an NPE out of getLong
    val row = media.agg(sum(coalesce(length(col("content")), lit(0)))).head()
    val totalBytes = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
}
