package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.index.{RangeLayout, ZOrderLayout}
import scala.jdk.CollectionConverters._

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try {
          val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == column)
              .map(c => (c.getStatistics.genericGetMin
                .asInstanceOf[java.lang.Long].longValue(),
                c.getStatistics.genericGetMax
                  .asInstanceOf[java.lang.Long].longValue()))
          }
          (stats.map(_._1).min, stats.map(_._2).max)
        } finally reader.close()
      }
  }

  /** Files a scan with predicate `col < threshold` can skip via min stats. */
  private def prunedBelow(rs: Seq[(Long, Long)], threshold: Long): Int =
    rs.count(_._1 >= threshold)

  test("zValue interleaves bits (hand-computed Morton codes)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 5L))
      .toDF("a", "b")
      .select(ZOrderLayout.zValue(col("a"), col("b"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // interleave(a,b) with b's bit above a's: (2,3)=b11,a10 -> 1110=14;
    // (7,5)=b101,a111 -> 110111=55
    assert(out == Seq(0L, 1L, 2L, 3L, 14L, 55L))
  }

  test("z-order layout bounds BOTH columns per file; range layout only its " +
    "own sort column") {
    // scrambled 128x128 grid
    val n = 128
    val df = (0 until n * n).map { i =>
      val j = (i * 2654435761L) % (n * n)
      (j / n, j % n)
    }.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zo").toString

    ZOrderLayout.write(df, s"$base/zorder", "x", "y", partitions = 8, bits = 7)
    val zx = fileRanges(s"$base/zorder", "x")
    val zy = fileRanges(s"$base/zorder", "y")
    assert(zx.size >= 4, s"expected several files: $zx")
    // a predicate on EITHER column prunes files
    assert(prunedBelow(zx, 32) > 0, s"x<32 should skip files: $zx")
    assert(prunedBelow(zy, 32) > 0, s"y<32 should skip files: $zy")
    // and files cover bounded rectangles on average — a file inside one
    // aligned Morton block spans ≤ half the domain per axis; only boundary
    // straddlers can span more, so the mean stays well under the full range
    def meanSpan(rs: Seq[(Long, Long)]): Double =
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    assert(meanSpan(zx) < n - 16, s"x spans: $zx")
    assert(meanSpan(zy) < n - 16, s"y spans: $zy")

    // control: range layout on x alone — every file spans ~all of y,
    // so a y predicate prunes nothing
    RangeLayout.write(df, s"$base/range", Seq("x"), partitions = 8)
    val ry = fileRanges(s"$base/range", "y")
    assert(prunedBelow(ry, 32) == 0,
      s"single-column layout should not bound y: $ry")

    // data round-trips unchanged and the _z helper column is not persisted
    val back = spark.read.parquet(s"$base/zorder")
    assert(back.columns.toSeq.sorted == Seq("x", "y"))
    assert(back.count() == n * n)
    assert(back.agg(sum(col("x") * lit(10000) + col("y"))).as[Long].head() ==
      df.agg(sum(col("x") * lit(10000) + col("y"))).as[Long].head())

    // guards are loud
    intercept[IllegalArgumentException] {
      ZOrderLayout.write(df, s"$base/bad", "x", "y", partitions = 0)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.zValue(col("x"), col("y"), bits = 0)
    }
  }

  test("validate=true fails loudly on keys that would alias on the curve") {
    val base = java.nio.file.Files.createTempDirectory("zov").toString
    val inDomain = (0 until 64).map(i => (i.toLong, (63 - i).toLong))
      .toDF("x", "y")
    // in-domain keys pass the debug check and the write succeeds
    ZOrderLayout.write(inDomain, s"$base/ok", "x", "y",
      partitions = 2, bits = 7, validate = true)
    assert(spark.read.parquet(s"$base/ok").count() == 64)
    // a key >= 2^bits aliases (x and x + 2^bits share a z) — loud, names
    // the offending range
    val tooBig = inDomain.union(Seq((128L, 1L)).toDF("x", "y"))
    val e1 = intercept[IllegalArgumentException] {
      ZOrderLayout.write(tooBig, s"$base/big", "x", "y",
        partitions = 2, bits = 7, validate = true)
    }
    assert(e1.getMessage.contains("alias"))
    // negative keys interleave sign bits — also loud
    val neg = inDomain.union(Seq((-1L, 1L)).toDF("x", "y"))
    intercept[IllegalArgumentException] {
      ZOrderLayout.write(neg, s"$base/neg", "x", "y",
        partitions = 2, bits = 7, validate = true)
    }
    // without validate the aliasing write is permitted (documented trade:
    // pruning stays correct, clustering degrades)
    ZOrderLayout.write(tooBig, s"$base/silent", "x", "y",
      partitions = 2, bits = 7)
    assert(spark.read.parquet(s"$base/silent").count() == 65)
    // an all-NULL key column must NOT silently disable the check for the
    // other columns (the pre-fix behavior): the out-of-domain x is still
    // caught, and the all-NULL y is itself named as a failure
    val nullY = tooBig.select(col("x"),
      lit(null).cast("long").as("y"))
    val e2 = intercept[IllegalArgumentException] {
      ZOrderLayout.write(nullY, s"$base/nully", "x", "y",
        partitions = 2, bits = 7, validate = true)
    }
    assert(e2.getMessage.contains("x in ["), e2.getMessage)
    assert(e2.getMessage.contains("y is all-NULL"), e2.getMessage)
    // a fully-empty frame skips the check (nothing to validate) and writes
    val empty = inDomain.filter(lit(false))
    ZOrderLayout.write(empty, s"$base/empty", "x", "y",
      partitions = 1, bits = 7, validate = true)
    assert(spark.read.parquet(s"$base/empty").count() == 0)
  }

  test("3-column z-order bounds ALL three columns per file") {
    // hand-computed 3-D Morton (1 bit/col, x lowest): (1,1,1)→7,
    // (1,0,1)→5, (0,1,0)→2
    val m = Seq((1L, 1L, 1L), (1L, 0L, 1L), (0L, 1L, 0L))
      .toDF("x", "y", "z")
      .select(ZOrderLayout.zValueN(
        Seq(col("x"), col("y"), col("z")), bits = 1).as("m"))
      .as[Long].collect().toSeq
    assert(m == Seq(7L, 5L, 2L))
    // the 2-column specialization is bit-identical to zValue
    val eq = Seq((2L, 3L), (7L, 5L), (123L, 77L)).toDF("a", "b")
      .select((ZOrderLayout.zValueN(Seq(col("a"), col("b")), 8) ===
        ZOrderLayout.zValue(col("a"), col("b"), 8)).as("ok"))
      .as[Boolean].collect()
    assert(eq.forall(identity))

    // scrambled 32^3 cube → every axis bounded per file, every axis prunes
    val n = 32
    val df = (0 until n * n * n).map { i =>
      val j = (i * 2654435761L) % (n * n * n)
      (j / (n * n), (j / n) % n, j % n)
    }.toDF("x", "y", "z")
    val base = java.nio.file.Files.createTempDirectory("zo3").toString
    ZOrderLayout.writeN(df, s"$base/z3", Seq("x", "y", "z"),
      partitions = 8, bits = 5, validate = true)
    def meanSpan(rs: Seq[(Long, Long)]): Double =
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    for (c <- Seq("x", "y", "z")) {
      val rs = fileRanges(s"$base/z3", c)
      assert(rs.size >= 4, s"$c: expected several files: $rs")
      assert(prunedBelow(rs, 8) > 0, s"$c<8 should skip files: $rs")
      assert(meanSpan(rs) < n - 4, s"$c spans: $rs")
    }
    // out-of-domain keys fail the k-D validate loudly too
    intercept[IllegalArgumentException] {
      ZOrderLayout.writeN(df, s"$base/bad", Seq("x", "y", "z"),
        partitions = 2, bits = 3, validate = true)
    }
    // k*bits must fit a positive long
    intercept[IllegalArgumentException] {
      ZOrderLayout.zValueN(Seq(col("x"), col("y"), col("z")), bits = 22)
    }
  }
}
