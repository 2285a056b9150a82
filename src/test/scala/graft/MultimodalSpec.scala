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

  test("synthPngMedia -> decodeImage roundtrip matches the analytic oracle") {
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val out = Multimodal.decodeImage(
      Multimodal.synthPngMedia(docs, "doc_id", "text"))
      .orderBy("media_id").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(8))) // no decode_error
    // replay the derivation for row 1 directly
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha doc".getBytes("UTF-8"))
    val (w, h) = (4 + ((d(0) & 0xff) % 13), 3 + ((d(1) & 0xff) % 7))
    val ce = (w * h + (w % 2) * (h % 2)) / 2
    val npx = w * h
    val r = out.head
    assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 3)
    val expMeanR = (ce.toLong * (d(2) & 0xff) +
      (npx - ce).toLong * (d(5) & 0xff)).toDouble / npx
    assert(r.getDouble(4) == expMeanR)
  }

  test("decodeImage quarantines undecodable rows instead of failing") {
    val bad = Multimodal.asMedia(
      Seq((9L, "not an image")).toDF("id", "payload")
        .withColumn("payload", encode(col("payload"), "UTF-8")),
      "id", "payload", "image")
    val row = Multimodal.decodeImage(bad).head()
    assert(row.isNullAt(1) && row.isNullAt(4))
    assert(row.getString(8) != null)
    // and a null-content row reports empty, not a crash
    val nullRow = Multimodal.decodeImage(
      Multimodal.asMedia(Seq((10L, null: Array[Byte])).toDF("id", "b"),
        "id", "b", "image")).head()
    assert(nullRow.getString(8) == "empty content")
  }

  test("resizeImages rewrites bytes with deterministic nearest-neighbor") {
    val docs = Seq((5L, "resize seed")).toDF("doc_id", "text")
    val src = Multimodal.synthPngMedia(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(src, 6, 4)
    val decoded = Multimodal.decodeImage(resized).head()
    assert(decoded.getInt(1) == 6 && decoded.getInt(2) == 4)
    // deterministic: byte-identical across two runs
    val b1 = resized.select("content").head().getAs[Array[Byte]](0)
    val b2 = Multimodal.resizeImages(src, 6, 4)
      .select("content").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b2))
    // undecodable content passes through unchanged — bytes AND any
    // pre-existing width/height metadata (not nulled copies)
    val bad = Multimodal.resize(Multimodal.asMedia(
      Seq((1L, "junk")).toDF("id", "p")
        .withColumn("p", encode(col("p"), "UTF-8")),
      "id", "p", "image"), 9, 7)
    val kept = Multimodal.resizeImages(bad, 6, 4).head()
    assert(new String(kept.getAs[Array[Byte]](2), "UTF-8") == "junk")
    assert(kept.getInt(3) == 9 && kept.getInt(4) == 7)
  }

  test("synthWavMedia -> decodeAudio roundtrip matches the md5 replay") {
    val docs = Seq((1L, "audio seed one"), (2L, "audio seed two"))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeAudio(
      Multimodal.synthWavMedia(docs, "doc_id", "text"))
      .orderBy("media_id").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(8))) // no decode_error
    // replay the derivation for row 1 directly
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("audio seed one".getBytes("UTF-8"))
    val n = 64 + ((d(0) & 0xff) % 192)
    val cycle = Array.tabulate(15)(j => d(1 + j).toInt * 256)
    val samples = Array.tabulate(n)(i => cycle(i % 15))
    val r = out.head
    assert(r.getInt(1) == 8000 && r.getInt(2) == 1)
    assert(r.getLong(3) == n)
    assert(r.getLong(4) == n.toLong * 1000 / 8000)
    assert(r.getDouble(5) == samples.map(_.toLong).sum.toDouble / n)
    assert(r.getDouble(6) ==
      math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / n))
    assert(r.getInt(7) == samples.map(math.abs).max)
  }

  test("decodeAudio quarantines empty and garbage bytes") {
    val bad = Multimodal.asMedia(
      Seq((1L, "not a wav"), (2L, null)).toDF("id", "p")
        .withColumn("p", encode(col("p"), "UTF-8")),
      "id", "p", "audio")
    val rows = Multimodal.decodeAudio(bad).orderBy("media_id").collect()
    assert(rows.forall(r => !r.isNullAt(8))) // both carry decode_error
    assert(rows(1).getString(8) == "empty content")
  }

  test("audioFrameEnergy: hand-computed frame RMS, ragged tail kept") {
    val docs = Seq((7L, "frame energy seed")).toDF("doc_id", "text")
    val media = Multimodal.synthWavMedia(docs, "doc_id", "text")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("frame energy seed".getBytes("UTF-8"))
    val n = 64 + ((d(0) & 0xff) % 192)
    val cycle = Array.tabulate(15)(j => d(1 + j).toInt * 256)
    val samples = Array.tabulate(n)(i => cycle(i % 15))
    val frames = Multimodal.audioFrameEnergy(media, frameSamples = 50)
      .orderBy("frame_idx").collect()
    assert(frames.length == (n + 49) / 50)
    // first frame: exact hand-computed RMS
    val sq0 = samples.take(50).map(s => s.toLong * s).sum
    assert(frames.head.getDouble(3) == math.sqrt(sq0.toDouble / 50))
    // ragged tail frame has n % 50 samples (when n is not a multiple)
    if (n % 50 != 0) assert(frames.last.getInt(2) == n % 50)
    // garbage bytes are dropped, not crashed on
    val bad = Multimodal.asMedia(
      Seq((9L, "junk")).toDF("id", "p")
        .withColumn("p", encode(col("p"), "UTF-8")), "id", "p", "audio")
    assert(Multimodal.audioFrameEnergy(bad, 50).count() == 0)
  }

  test("dHash56: analytic replay of one gradient image, twin within " +
    "hamming 1, hash fits 56 positive bits") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (7L, "gamma"))
      .toDF("doc_id", "text")
    val hashed = Multimodal.dHash56(
        Multimodal.synthGradientPngMedia(docs, "doc_id", "text",
          variantEvery = 7))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Long]("phash"))).toMap
    // ids 0 and 7 carry twins; 1 does not
    assert(hashed.keySet == Set("0", "1", "7", "0_v", "7_v"))
    // replay id 0's hash from the md5-derived field in plain Scala
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8"))
    val w = 16 + ((d(0) & 0xff) % 9); val h = 12 + ((d(1) & 0xff) % 7)
    val (a, b, c) = (d(2) & 0xff, 1 + ((d(3) & 0xff) % 7),
      1 + ((d(4) & 0xff) % 7))
    val e = 1 + ((d(5) & 0xff) % 13)
    def luma(x: Int, y: Int) =
      (a + b * x + c * y + 7 * x * x + 11 * y * y + e * x * y) % 256
    var expect = 0L
    for (j <- 0 until 8; i <- 0 until 7) {
      val (x1, x2) = ((2 * i + 1) * w / 16, (2 * i + 3) * w / 16)
      val y = (2 * j + 1) * h / 16
      if (luma(x1, y) > luma(x2, y)) expect |= 1L << (55 - (j * 7 + i))
    }
    assert(hashed("0") == ((w, h, expect)))
    hashed.values.foreach { case (_, _, ph) =>
      assert(ph >= 0L && ph < (1L << 56)) }
    // each twin differs from its base in exactly the one sampled cell
    Seq("0", "7").foreach { id =>
      val ham = java.lang.Long.bitCount(
        hashed(id)._3 ^ hashed(id + "_v")._3)
      assert(ham <= 1, s"twin hamming $ham for id $id")
    }
  }

  test("phashNearDup: planted twins surface, unrelated images don't; " +
    "banded join is exact for hamming <= bands-1; guards enforced") {
    val docs = (0L to 20L).map(i => (i, s"doc text $i")).toDF("doc_id", "text")
    val hashed = Multimodal.dHash56(
      Multimodal.synthGradientPngMedia(docs, "doc_id", "text",
        variantEvery = 7))
    val pairs = Multimodal.phashNearDup(hashed, maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("0", "0_v"), ("14", "14_v"), ("7", "7_v")))
    // banded-exactness contract: threshold >= bands is refused loudly
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(hashed, maxHamming = 4, bands = 4) }
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(hashed, bands = 5) } // 5 doesn't divide 56
    // undecodable rows never reach the join
    val withBad = hashed.union(Seq(("bad", null, null, null, "boom"))
      .toDF("media_id", "width", "height", "phash", "decode_error")
      .select(col("media_id"), col("width").cast("int"),
        col("height").cast("int"), col("phash").cast("long"),
        col("decode_error")))
    assert(Multimodal.phashNearDup(withBad, maxHamming = 3).count() ==
      pairs.size)
  }
}
