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

  test("randomWalks on random graphs: steps chain, every hop is a real " +
    "edge, walks are reproducible") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 2) {
      val edgeSeq = (0 until 300).map { _ =>
        (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")
      }.distinct
      val edges = edgeSeq.toDF("src", "dst")
      val edgeSet = edgeSeq.toSet
      val ranked = Traversal.rankedAdjacency(edges)
      val seeds = Seq("n0", "n1", "n2").toDF("node")
      def run() = Traversal.randomWalks(ranked, seeds, steps = 4,
        walksPerNode = 3, seed = s"p$trial")
        .as[(String, Int, Int, String)].collect().toSeq.sorted
      val out = run()
      assert(out == run(), "walks must be reproducible")
      // chain continuity: step t's position follows step t-1's (or the
      // start), and each transition is a real directed edge
      out.groupBy(w => (w._1, w._2)).foreach { case ((start, _), steps) =>
        val byStep = steps.sortBy(_._3)
        assert(byStep.map(_._3) == (1 to byStep.size), "steps contiguous")
        var cur = start
        byStep.foreach { case (_, _, _, node) =>
          assert(edgeSet.contains((cur, node)),
            s"($cur,$node) is not an edge")
          cur = node
        }
      }
    }
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

  test("skipGramPairs emits within-window ordered pairs, counting repeats") {
    // walk 0: sentence [x, a, b, c]; walk 1: [x, a, x] (repeated token)
    val walks = Seq(
      ("x", 0, 1, "a"), ("x", 0, 2, "b"), ("x", 0, 3, "c"),
      ("x", 1, 1, "a"), ("x", 1, 2, "x"))
      .toDF("start", "wid", "step", "node")
    val got = GraphFeatures.skipGramPairs(walks, window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // walk 0 pairs: x→{a,b}, a→{x,b,c}, b→{x,a,c}, c→{a,b}
    // walk 1 ([x,a,x]) pairs: x→a ×2, x→x ×2, a→x ×2
    assert(got === Map(
      ("x", "a") -> 3L, ("x", "b") -> 1L, ("x", "x") -> 2L,
      ("a", "x") -> 3L, ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "x") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "a") -> 1L, ("c", "b") -> 1L))
  }

  test("negativeSamplingWeights: unigram^0.75 micro weights, exact-total " +
    "shares") {
    val walks = Seq(
      ("x", 0, 1, "a"), ("x", 0, 2, "b"), ("x", 0, 3, "c"),
      ("x", 1, 1, "a"), ("x", 1, 2, "x"))
      .toDF("start", "wid", "step", "node")
    val got = GraphFeatures.negativeSamplingWeights(walks)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // token counts: x 3 (2 starts + 1 step), a 2, b 1, c 1
    def w(n: Long): Long =
      math.round(1000000.0 * math.sqrt(n.toDouble * math.sqrt(n.toDouble)))
    val tot = w(3) + w(2) + w(1) + w(1)
    def share(n: Long): Long =
      math.round(1.0e9 * w(n).toDouble / tot.toDouble)
    assert(got === Map(
      "x" -> ((3L, w(3), share(3))), "a" -> ((2L, w(2), share(2))),
      "b" -> ((1L, w(1), share(1))), "c" -> ((1L, w(1), share(1)))))
  }
}
