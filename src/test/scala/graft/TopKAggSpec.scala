package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** The heap-bounded top-k-per-key aggregate must be row-for-row equal to the
  * window-rank pattern it replaces, emit ranks in sorted order, and plan as
  * an aggregate with a partial (map-side) phase — not a window sort. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("t1", "s1", 5.0, "a"), ("t1", "s2", 9.0, "b"), ("t1", "s3", 9.0, "c"),
    ("t1", "s4", 1.0, "d"), ("t2", "s5", 2.0, "e"), ("t2", "s6", 7.0, "f"),
    ("t3", "s7", 4.0, "g")
  ).toDF("topic_id", "statement_id", "score", "payload")

  test("topKPerKey == window row_number pattern, all columns preserved") {
    val df = fixture
    val viaAgg = TopKAgg.topKPerKey(df, Seq("topic_id"),
      Seq(negate(col("score")), col("statement_id")), 2)
    val w = Window.partitionBy("topic_id")
      .orderBy(desc("score"), col("statement_id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(viaAgg.columns.toSeq == df.columns.toSeq)
    assert(viaAgg.orderBy("topic_id", "statement_id").collect().toSeq ==
      viaWindow.orderBy("topic_id", "statement_id").collect().toSeq)
  }

  test("topKPerKeyRanked ranks match window row_number exactly") {
    val df = fixture
    val viaAgg = TopKAgg.topKPerKeyRanked(df, Seq("topic_id"),
      Seq(negate(col("score")), col("statement_id")), 3, "rk")
    val w = Window.partitionBy("topic_id")
      .orderBy(desc("score"), col("statement_id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    assert(viaAgg.orderBy("topic_id", "rk").collect().toSeq ==
      viaWindow.orderBy("topic_id", "rk").collect().toSeq)
  }

  test("plan is a partial-agg ObjectHashAggregate, not a window sort") {
    val plan = TopKAgg.topKPerKey(fixture, Seq("topic_id"),
      Seq(negate(col("score")), col("statement_id")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bounded_top_k"), plan)
    assert(plan.toLowerCase.contains("partial_bounded_top_k") ||
      plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("property: agg == window on random frames, several k") {
    val r = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (s"k${r.nextInt(12)}", f"id$i%04d", r.nextInt(50).toDouble)
    }
    val df = rows.toDF("key", "id", "score")
    for (k <- Seq(1, 3, 10)) {
      val viaAgg = TopKAgg.topKPerKey(df, Seq("key"),
        Seq(negate(col("score")), col("id")), k)
        .orderBy("key", "id").collect().toSeq
      val w = Window.partitionBy("key").orderBy(desc("score"), col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("key", "id").collect().toSeq
      assert(viaAgg == viaWindow, s"k=$k")
    }
  }

  /** The round-12 BoundedTopKAgg (k-slot sorted array, losers never copied)
    * must be element-for-element identical to the stock Catalyst CollectTopK
    * it replaced — both directions, several k, across a multi-partition frame
    * so partial/merge/serialize paths all exercise. */
  test("bounded_top_k == Catalyst collect_top_k, both directions") {
    val r = new scala.util.Random(11)
    val rows = (1 to 1000).map { i =>
      (s"g${r.nextInt(40)}", r.nextInt(200).toDouble, f"id$i%04d")
    }
    val df = rows.toDF("key", "score", "id").repartition(7)
    val sortKey = struct(col("score").as("_k0"), col("id").as("_k1"))
    for (k <- Seq(1, 2, 5); rev <- Seq(true, false)) {
      val ours = df.groupBy("key")
        .agg(org.apache.spark.sql.GraftSqlBridge
          .collectTopK(sortKey, k, rev).as("top"))
        .orderBy("key").collect().toSeq.map(_.toString)
      val stock = df.groupBy("key")
        .agg(org.apache.spark.sql.GraftSqlBridge
          .collectTopKCatalyst(sortKey, k, rev).as("top"))
        .orderBy("key").collect().toSeq.map(_.toString)
      assert(ours == stock, s"k=$k reverse=$rev")
    }
  }
}
