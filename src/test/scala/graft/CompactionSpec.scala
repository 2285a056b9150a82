package graft

import graft.index.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("assignBins: contiguous bins, streaming-fill bound, " +
    "layout-independent") {
    val files = (1 to 200).map(i => (f"f$i%03d", (i * 37 % 90) + 10L))
    val target = 300L
    val out = Compaction.assignBins(
        files.toDF("path", "bytes").repartition(7), "path", "bytes", target)
      .as[(String, Long, Long)].collect().toSeq
    val byBin = out.groupBy(_._3)
    // bins are contiguous from 0
    assert(byBin.keySet == (0L until byBin.size).toSet)
    // each bin's payload < target + its largest member (overflow is at
    // most the one file that straddled the boundary)
    byBin.values.foreach { fs =>
      assert(fs.map(_._2).sum < target + fs.map(_._2).max)
    }
    // bins fill before a new one opens: the running total consumed by
    // bins 0..n-2 is at least (n-1) * target (no sparse bins)
    val binTotals = byBin.toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
    assert(binTotals.init.sum >= (byBin.size - 1) * target)
    // deterministic: same assignment from a different input layout
    val again = Compaction.assignBins(
        files.reverse.toDF("path", "bytes").coalesce(1), "path", "bytes",
        target)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(again == out.sortBy(_._1))
  }

  test("a file larger than the target gets a bin to itself plus only " +
    "boundary spill") {
    val files = Seq(("big", 1000L), ("a", 10L), ("b", 10L))
    val out = Compaction.assignBins(files.toDF("path", "bytes"), "path",
        "bytes", 100L)
      .as[(String, Long, Long)].collect()
      .map { case (p, _, b) => (p, b) }.toMap
    assert(out("big") == 0L) // nothing before it
    assert(out("a") == 10L && out("b") == 10L) // past the big file's span
  }

  test("compactParquet rewrites many small files into the planned bin " +
    "count, rows intact") {
    val in = java.nio.file.Files.createTempDirectory("cmp_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("cmp_out").toString
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(in) // 64 small files
    val stats = Compaction.fileStats(spark, in)
    val nIn = stats.count()
    assert(nIn == 64L)
    val total = stats.agg(sum("bytes")).head().getLong(0)
    val target = total / 4 + 1
    val bins = Compaction.compactParquet(spark, in, outDir, target,
      sortCols = Seq("id"))
    assert(bins == 4)
    val written = Compaction.fileStats(spark, outDir)
      .filter(col("path").endsWith(".parquet")).count()
    assert(written == 4L)
    val back = spark.read.parquet(outDir)
    assert(back.count() == 5000L)
    assert(back.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
  }

  test("guards: non-positive target is loud") {
    intercept[IllegalArgumentException] {
      Compaction.assignBins(Seq(("a", 1L)).toDF("path", "bytes"), "path",
        "bytes", 0L)
    }
    intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, "/tmp/x", "/tmp/y", -1L)
    }
  }
}
