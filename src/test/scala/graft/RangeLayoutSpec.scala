package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.index.RangeLayout
import scala.jdk.CollectionConverters._

class RangeLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file [min, max] of a long column, straight from parquet footers. */
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

  private def overlaps(rs: Seq[(Long, Long)]): Int = {
    val pairs = for {
      i <- rs.indices; j <- rs.indices if i < j
    } yield if (rs(i)._1 <= rs(j)._2 && rs(j)._1 <= rs(i)._2) 1 else 0
    pairs.sum
  }

  test("range layout writes disjoint per-file key intervals; the default " +
    "layout does not") {
    val n = 10000
    // write in a scrambled order so the default layout's files all span
    // nearly the whole key range
    val df = (0 until n).map(i => ((i * 2654435761L) % n, s"payload$i"))
      .toDF("k", "v")
    val base = java.nio.file.Files.createTempDirectory("rl").toString

    RangeLayout.write(df, s"$base/sorted", Seq("k"), partitions = 4)
    val sortedRanges = fileRanges(s"$base/sorted", "k")
    assert(sortedRanges.size >= 2, s"expected several files: $sortedRanges")
    assert(overlaps(sortedRanges) == 0,
      s"range layout must produce disjoint intervals: $sortedRanges")

    df.repartition(4).write.mode("overwrite").parquet(s"$base/plain")
    val plainRanges = fileRanges(s"$base/plain", "k")
    assert(overlaps(plainRanges) > 0,
      s"control layout should overlap (else the assertion above is vacuous): $plainRanges")

    // the data itself round-trips unchanged
    val back = spark.read.parquet(s"$base/sorted")
    assert(back.count() == n)
    assert(back.agg(sum("k")).as[Long].head() ==
      df.agg(sum("k")).as[Long].head())

    // guards are loud
    intercept[IllegalArgumentException] {
      RangeLayout.write(df, s"$base/x", Seq.empty, 4)
    }
    intercept[IllegalArgumentException] {
      RangeLayout.write(df, s"$base/x", Seq("k"), 0)
    }
  }

  test("bloomCols writes parquet bloom filters, provable from the footer") {
    val df = (0 until 5000).map(i => (i.toLong, s"id-${i * 7919 % 5000}"))
      .toDF("k", "v")
    val base = java.nio.file.Files.createTempDirectory("rlb").toString
    RangeLayout.write(df, s"$base/bloom", Seq("k"), partitions = 2,
      bloomCols = Seq("v"))
    RangeLayout.write(df, s"$base/plain", Seq("k"), partitions = 2)
    def bloomOffsets(dir: String, column: String): Seq[Long] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
          try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala
            .filter(_.getPath.toDotString == column)
            .map(_.getBloomFilterOffset))
          finally r.close()
        }
    }
    val withBloom = bloomOffsets(s"$base/bloom", "v")
    assert(withBloom.nonEmpty && withBloom.forall(_ >= 0),
      s"expected bloom filters on v: $withBloom")
    val without = bloomOffsets(s"$base/plain", "v")
    assert(without.forall(_ < 0),
      s"control should have no bloom filters: $without")
  }
}
