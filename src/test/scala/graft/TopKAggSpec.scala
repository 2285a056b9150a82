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
    assert(plan.contains("collect_top_k"), plan)
    assert(plan.toLowerCase.contains("partial_collect_top_k") ||
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
}
