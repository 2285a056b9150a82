package graft

import org.apache.spark.sql.functions._
import graft.ops.LinkPrediction

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("projectBipartite counts shared rights and drops hubs") {
    // r1 shared by l1,l2; r2 shared by l1,l2,l3; rHub (4 lefts) over cap 3
    val inc = Seq(
      ("l1", "r1"), ("l2", "r1"),
      ("l1", "r2"), ("l2", "r2"), ("l3", "r2"),
      ("l1", "rH"), ("l2", "rH"), ("l3", "rH"), ("l4", "rH"),
      ("l5", "rSolo")
    ).toDF("l", "r")
    val got = LinkPrediction.projectBipartite(inc, "l", "r", 3)
      .orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("l1", "l2", 2L), ("l1", "l3", 1L), ("l2", "l3", 1L)))
  }

  test("adamicAdar scores non-adjacent pairs through capped centers") {
    // path a–z–b plus z–c: pairs through center z (deg 3):
    // (a,b), (a,c), (b,c) each with one common neighbor z; none adjacent
    val e = Seq(("z", "a"), ("z", "b"), ("z", "c")).toDF("src", "dst")
    val got = LinkPrediction.adamicAdar(e, maxCenterDegree = 10)
      .orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val term = math.round(1000000.0 / math.log(3.0)) // deg(z) = 3
    assert(got === Seq(("a", "b", 1L, term), ("a", "c", 1L, term),
      ("b", "c", 1L, term)))
  }

  test("adamicAdar excludes already-adjacent pairs") {
    // triangle a–b–c: every 2-path closes an existing edge → no proposals
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    assert(LinkPrediction.adamicAdar(e, 10).count() === 0L)
  }

  test("jaccardLinks scores exact intersection/union on a star") {
    // star z–a, z–b, z–c: each leaf pair shares exactly {z} and each leaf's
    // whole neighborhood is {z} → jac = 1/1 = 1.0
    val e = Seq(("z", "a"), ("z", "b"), ("z", "c")).toDF("src", "dst")
    val got = LinkPrediction.jaccardLinks(e, maxCenterDegree = 10)
      .orderBy("a", "b").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("common_neighbors"), r.getAs[Long]("union_size"),
        r.getAs[Long]("jac_micro"))).toSeq
    assert(got === Seq(("a", "b", 1L, 1L, 1000000L),
      ("a", "c", 1L, 1L, 1000000L), ("b", "c", 1L, 1L, 1000000L)))
  }

  test("jaccardLinks caps centers but keeps exact union degrees") {
    // (a,b) reachable through z1 (deg 2, kept) and z2 (deg 3, dropped by
    // cap 2) → common counts 1 wedge only, but deg(a)=deg(b)=2 exactly:
    // union = 2+2-1 = 3, jac_micro = round(1e6/3)
    val e = Seq(("z1", "a"), ("z1", "b"), ("z2", "a"), ("z2", "b"),
      ("z2", "c")).toDF("src", "dst")
    val got = LinkPrediction.jaccardLinks(e, maxCenterDegree = 2)
      .filter(col("a") === "a" && col("b") === "b").collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("common_neighbors") === 1L)
    assert(r.getAs[Long]("union_size") === 3L)
    assert(r.getAs[Long]("jac_micro") === 333333L)
  }

  test("jaccardLinks excludes already-adjacent pairs") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    assert(LinkPrediction.jaccardLinks(e, 10).count() === 0L)
  }

  test("adamicAdar drops hub centers") {
    // star center h with 4 leaves, cap 3: all pairs vanish with the hub
    val e = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
      .toDF("src", "dst")
    assert(LinkPrediction.adamicAdar(e, maxCenterDegree = 3).count() === 0L)
    assert(LinkPrediction.adamicAdar(e, maxCenterDegree = 4).count() === 6L)
  }

  test("modularityTerms is exact on a two-clique graph") {
    // two triangles joined by one bridge; communities = the cliques.
    // und rows: 2 * (3 + 3 + 1) = 14 = 2m; per community: internal
    // directed rows 6 → internal_edges 3; degree_sum 7 (bridge endpoint
    // has deg 3). q_num = 14*3*2 - 49 = 35; term = 35/196.
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")).toDF("src", "dst")
    val assign = Seq(("a", "left"), ("b", "left"), ("c", "left"),
      ("x", "right"), ("y", "right"), ("z", "right"))
      .toDF("node", "community")
    val got = LinkPrediction.modularityTerms(e, assign)
      .orderBy("community").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq(("left", 3L, 7L, 35L), ("right", 3L, 7L, 35L)))
    val q = got.map(_.getDouble(4)).sum
    assert(math.abs(q - 70.0 / 196.0) < 1e-12)
  }

  test("modularity of a single community is 0 by definition") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val assign = Seq(("a", "one"), ("b", "one"), ("c", "one"))
      .toDF("node", "community")
    val got = LinkPrediction.modularityTerms(e, assign).collect()
    assert(got.length === 1 && got.head.getLong(3) === 0L)
  }
}
