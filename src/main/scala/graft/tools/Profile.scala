package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H}

/** Dev harness: stage-by-stage timing of a query, to localize bench cost.
  * Usage: runMain graft.tools.Profile <sfDir> <what>. */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "minhash"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    what match {
      case "minhash" =>
        time("normalize+tokenize") {
          docs.select(split(graft.functions.TextFunctions.searchStr(col("text")), "\\s+").as("t"))
            .select(sum(size(col("t")))).collect(); docs.count()
        }
        time("shingles") {
          docs.select(H.shingles(col("text"), 3).as("sh"))
            .select(sum(size(col("sh")))).collect(); docs.count()
        }
        time("bases (md5/shingle)") {
          docs.select(transform(H.shingles(col("text"), 3), s => H.h60(s)).as("b"))
            .select(sum(size(col("b")))).collect(); docs.count()
        }
        time("full signature (composed)") {
          docs.select(H.minhashSignature(col("text"), 16, 3).as("sig"))
            .select(sum(element_at(col("sig"), 1))).collect(); docs.count()
        }
        time("full signature (native)") {
          graft.functions.MinhashSignature.register(spark)
          docs.select(graft.functions.MinhashSignature
            .signature(col("text"), 16, 3).as("sig"))
            .select(sum(element_at(col("sig"), 1))).collect(); docs.count()
        }
        time("minhashLsh end-to-end") {
          graft.ops.Dedup.minhashLsh(docs, "text", "doc_id").count()
        }
      case "explain" =>
        // plan audit: dump formatted physical plans for selected queries
        val names = if (args.length > 2) args(2).split(",").toSeq
          else Seq("q_metadata_filter", "q_vector_topk", "q_join_chain",
            "q_agg_sums", "q_central_materialization", "q_minhash_lsh")
        graft.GraftExtensions.registerAll(spark)
        names.foreach { n =>
          println(s"===== $n =====")
          graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
        }
      case _ => sys.error(s"unknown profile target $what")
    }
    spark.stop()
  }
}
