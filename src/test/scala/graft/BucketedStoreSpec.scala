package graft

import org.apache.spark.sql.functions._
import graft.index.BucketedStore

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables sort-merge-join without a shuffle exchange") {
    val edges = (1 to 1000).map(i => (s"n${i % 50}", s"n${(i * 7) % 50}", "r"))
      .toDF("src", "dst", "label")
    val scores = (0 until 50).map(i => (s"n$i", i * 1.0)).toDF("src", "score")

    BucketedStore.writeBucketed(edges, "bk_edges", "src", 4)
    BucketedStore.writeBucketed(scores, "bk_scores", "src", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.readTable(spark, "bk_edges")
        .join(BucketedStore.readTable(spark, "bk_scores"), Seq("src"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, plan was:\n$plan")
      assert(joined.count() == 1000)
      // and the values survive the round trip
      val one = joined.filter(col("src") === "n1")
        .select("score").distinct().as[Double].head()
      assert(one == 1.0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_edges")
      spark.sql("DROP TABLE IF EXISTS bk_scores")
    }
  }
}
