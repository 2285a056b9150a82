package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises SparkEntry.entry the way the driver does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = 120)
    println(s"[smoke] entry rows = ${df.count()}")
    val mp = graft.pipeline.LexicalPipeline
      .flagshipMultipart(spark, "/root/testdata/sf0.001")
    println(s"[smoke] multipart rows = ${mp.count()}")
    val fc = graft.pipeline.LexicalPipeline
      .flagshipFullChain(spark, "/root/testdata/sf0.001")
    println(s"[smoke] full-chain rows = ${fc.count()}")
    spark.stop()
  }
}
