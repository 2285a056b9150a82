package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/**
 * Misra-Gries sketch aggregate + the exact heavy-hitter pipeline built on
 * it. The oracle gate (q_heavy_hitters) runs at a capacity ABOVE the
 * corpus vocabulary, so eviction/merge-compaction behavior under real
 * capacity pressure is proven here instead, on skewed data with
 * capacity ≪ distinct tokens, across partitionings.
 */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed stream: token "h{i}" appears 200-40i times (i<5, the heavy
    * set), plus 2000 singleton tokens t0..t1999. */
  private def skewed = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(200 - 40 * i)(s"h$i"))
    val tail = (0 until 2000).map(i => s"t$i")
    new scala.util.Random(7).shuffle(heavy ++ tail)
  }

  private def sketchTokens(rows: Seq[String], capacity: Int,
                           parts: Int): Map[String, Long] = {
    val df = rows.grouped(10).map(_.toArray).toSeq.toDF("toks")
      .repartition(parts)
    df.agg(GraftSqlBridge.misraGries(col("toks"), capacity).as("s"))
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("superset guarantee: true heavy tokens survive any partitioning " +
    "with capacity pressure") {
    val rows = skewed
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32); capacity <- Seq(8, 16)) {
      val sketch = sketchTokens(rows, capacity, parts)
      assert(sketch.size <= capacity, s"parts=$parts cap=$capacity")
      // every token with true count > n/(capacity+1) must survive
      val mustSurvive = exact.filter(_._2 > n.toDouble / (capacity + 1)).keySet
      assert(mustSurvive.subsetOf(sketch.keySet),
        s"parts=$parts cap=$capacity missing ${mustSurvive -- sketch.keySet}")
      // sketch counts are lower bounds with bounded undercount
      sketch.foreach { case (t, c) =>
        val truth = exact(t)
        assert(c <= truth, s"overcount for $t")
        assert(truth - c <= n.toDouble / (capacity + 1), s"undercount bound $t")
      }
    }
  }

  test("heavyHitters pipeline equals brute force on skewed text, " +
    "independent of layout") {
    val docs = skewed.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    // phi = 1/30 of ~2600 tokens -> threshold ~87: exactly the h* tokens
    val expected = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count()
      .filter(col("count") >= (2600 * 1 + 29) / 30) // provisional; recompute
    val out = TextAnalysis.heavyHitters(docs, "text", n = 1,
      phiNum = 1, phiDen = 30, capacity = 64)
      .as[(String, Long)].collect().toSeq
    val nTok = skewed.size
    val thr = (nTok + 29) / 30
    val brute = skewed.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSeq.sortBy { case (t, c) => (-c, t) }
    assert(out == brute)
    val out7 = TextAnalysis.heavyHitters(docs.repartition(7), "text", n = 1,
      phiNum = 1, phiDen = 30, capacity = 64)
      .as[(String, Long)].collect().toSeq
    assert(out7 == brute)
    assert(expected.count() == brute.size.toLong)
  }

  test("heavyHittersByKey equals per-group brute force; key cap trips") {
    val rows = skewed
    val docs = (rows.grouped(25).map(g => ("s0", g.mkString(" "))).toSeq ++
      rows.take(600).grouped(25).map(g => ("s1", g.mkString(" "))).toSeq)
      .toDF("src", "text")
    val out = TextAnalysis.heavyHittersByKey(docs, "text", "src", n = 1,
      phiNum = 1, phiDen = 30, capacity = 64)
      .as[(String, String, Long)].collect().toSeq
    def brute(key: String, toks: Seq[String]) = {
      val thr = (toks.size + 29) / 30
      toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).toSeq
        .map { case (t, c) => (key, t, c) }
        .sortBy { case (_, t, c) => (-c, t) }
    }
    assert(out == brute("s0", rows) ++ brute("s1", rows.take(600)))
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHittersByKey(docs, "text", "src", n = 1,
        phiNum = 1, phiDen = 30, capacity = 64, maxKeys = 1)
    }
  }

  test("capacity below 1/phi is refused loudly") {
    val docs = Seq("a b c").toDF("text")
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", n = 1,
        phiNum = 1, phiDen = 100, capacity = 50)
    }
  }

  test("empty corpus and all-empty text yield an empty result") {
    val docs = Seq("", "   ").toDF("text")
    assert(TextAnalysis.heavyHitters(docs, "text", n = 2,
      phiNum = 1, phiDen = 2, capacity = 8).count() == 0L)
  }
}
