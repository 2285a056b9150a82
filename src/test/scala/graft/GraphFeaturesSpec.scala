package graft

import org.apache.spark.sql.functions._
import graft.byokg.Traversal
import graft.ops.GraphFeatures

class GraphFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("neighborMeanEmbedding is the exact micro-unit mean, " +
    "layout-independent") {
    val edges = Seq(("a", 1L), ("a", 2L), ("b", 2L)).toDF("ent", "sid")
    val emb = Seq(
      (1L, Seq(0.1, 0.2)), (2L, Seq(0.3, -0.4)), (3L, Seq(9.9, 9.9))
    ).toDF("sid", "e")
    def run(e: org.apache.spark.sql.DataFrame) =
      GraphFeatures.neighborMeanEmbedding(e, "ent", "sid", emb, "sid", "e", 2)
        .as[(String, Long, Int, Double)].collect().toSeq.sorted
    val out = run(edges)
    // a: mean(0.1,0.3)=0.2, mean(0.2,-0.4)=-0.1; b: 0.3, -0.4
    assert(out == Seq(
      ("a", 2L, 0, 0.2), ("a", 2L, 1, -0.1),
      ("b", 1L, 0, 0.3), ("b", 1L, 1, -0.4)))
    assert(run(edges.repartition(7)) == out)
  }

  test("randomWalks follows the hash-picked ranked neighbor and stops " +
    "at sinks") {
    // graph: s -> {x, y}; x -> {z}; y, z sinks
    val edges = Seq(("s", "x"), ("s", "y"), ("x", "z"))
      .toDF("src", "dst")
    val ranked = Traversal.rankedAdjacency(edges)
    val seeds = Seq("s").toDF("node")
    val out = Traversal.randomWalks(ranked, seeds, steps = 2,
      walksPerNode = 2, seed = "t")
      .as[(String, Int, Int, String)].collect().toSeq
      .sortBy(r => (r._2, r._3))
    // replay the pick by hand: idx = h60("t#s#w#step") % deg + 1 over
    // dst-ascending ranks {x=1, y=2}
    def h60(sIn: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sIn.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val expected = (0 until 2).flatMap { w =>
      val first = if (h60(s"t#s#$w#1") % 2 == 0) "x" else "y"
      val rest = if (first == "x") Seq(("s", w, 2, "z")) else Nil
      ("s", w, 1, first) +: rest
    }
    assert(out == expected)
    // layout independence: same walks from a repartitioned adjacency
    val out7 = Traversal.randomWalks(
      Traversal.rankedAdjacency(edges.repartition(5)), seeds,
      steps = 2, walksPerNode = 2, seed = "t")
      .as[(String, Int, Int, String)].collect().toSeq
      .sortBy(r => (r._2, r._3))
    assert(out7 == expected)
  }
}
