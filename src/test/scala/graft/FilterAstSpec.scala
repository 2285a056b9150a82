package graft

import org.apache.spark.sql.functions._
import graft.filter.FilterAst
import graft.filter.FilterAst._

class FilterAstSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 10, "Open"), ("b", 25, "closed"), ("c", 40, "OPEN"), ("d", 5, ""))
    .toDF("k", "v", "status")

  test("nested AND/OR compiles to one predicate") {
    val f = Or.of(
      And.of(Pred("v", Gte, 20), Pred("status", TextMatchInsensitive, "open")),
      Pred("v", Lt, 8))
    val keys = df.filter(FilterAst.compile(f)).select("k").as[String].collect()
    assert(keys.sorted.toSeq == Seq("c", "d"))
  }

  test("NOT and IsEmpty") {
    val f = And.of(Not(Pred("status", IsEmpty, "")), Pred("v", Lte, 25))
    val keys = df.filter(FilterAst.compile(f)).select("k").as[String].collect()
    assert(keys.sorted.toSeq == Seq("a", "b"))
  }

  test("map-typed metadata resolution") {
    val md = Seq(Map("source" -> "web", "year" -> "2024"),
      Map("source" -> "pdf", "year" -> "2020")).toDF("metadata")
    val f = Pred("source", Eq, "web")
    val n = md.filter(FilterAst.compile(f, k => col("metadata")(k))).count()
    assert(n == 1)
  }

  test("asOf keeps rows whose interval covers t, with null sentinels") {
    val rows = Seq(
      (1L, Some(100L), Some(200L)), (2L, Some(100L), None),
      (3L, None, Some(150L)), (4L, Some(160L), Some(170L)))
      .toDF("id", "valid_from", "valid_to")
    val ids = rows.filter(FilterAst.asOf(150L)).select("id").as[Long].collect()
    assert(ids.sorted.toSeq == Seq(1L, 2L))
  }
}
