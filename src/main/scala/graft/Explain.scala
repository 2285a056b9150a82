package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args(1).split(",")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, args(0))
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(150)).take(45).mkString("\n"))
    }
    spark.stop()
  }
}
