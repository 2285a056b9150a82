package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.plans.TenantScopingRule

class TenantScopingSpec extends SparkSpec {
  import spark.implicits._

  test("tenant conf scopes every tenant_id-bearing scan, plan-wide") {
    val dir = Files.createTempDirectory("tenants").toString
    Seq(("a", 1, "t0"), ("b", 2, "t0"), ("c", 3, "t1"))
      .toDF("v", "n", "tenant_id").write.parquet(s"$dir/chunks")
    Seq(("a", "x", "t0"), ("c", "y", "t1"))
      .toDF("v", "w", "tenant_id").write.parquet(s"$dir/stmts")
    TenantScopingRule.install(spark)
    try {
      spark.conf.set(TenantScopingRule.ConfKey, "t0")
      val chunks = spark.read.parquet(s"$dir/chunks")
      // filter applies even when the query never mentions tenant_id
      assert(chunks.select("v").as[String].collect().sorted.toSeq ==
        Seq("a", "b"))
      // both sides of a join are scoped independently
      val stmts = spark.read.parquet(s"$dir/stmts")
      val joined = chunks.join(stmts, Seq("v")).select("v", "w")
      assert(joined.as[(String, String)].collect().toSeq == Seq(("a", "x")))
      // switching tenants re-plans with the new literal
      spark.conf.set(TenantScopingRule.ConfKey, "t1")
      assert(spark.read.parquet(s"$dir/chunks").select("v")
        .as[String].collect().toSeq == Seq("c"))
      // frames without a tenant_id column are untouched
      assert(spark.range(3).count() == 3)
    } finally spark.conf.unset(TenantScopingRule.ConfKey)
    // conf unset -> rule inert again
    assert(spark.read.parquet(s"$dir/chunks").count() == 3)
  }

  test("FilterAst predicates reach the parquet scan as pushed filters") {
    import graft.filter.FilterAst
    val dir = Files.createTempDirectory("pushdown").toString + "/t"
    Seq(("a", 5, "web", "pad"), ("b", 9, "pdf", "pad"), ("c", 2, "web", "pad"))
      .toDF("id", "score", "source", "unused").write.parquet(dir)
    val pred = FilterAst.And(Seq(
      FilterAst.Pred("source", FilterAst.Eq, "web"),
      FilterAst.Pred("score", FilterAst.Gt, 3)))
    val q = spark.read.parquet(dir)
      .filter(FilterAst.compile(pred, col)).select("id")
    assert(q.as[String].collect().toSeq == Seq("a"))
    // the compiled Column lands in the scan's PushedFilters, not a
    // post-scan Filter-only plan — the §4 pushdown guarantee
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:"), scan)
    assert(scan.contains("EqualTo(source,web)") &&
      scan.contains("GreaterThan(score,3)"), scan)
    // and column pruning: the unreferenced column never reaches the scan
    assert(scan.contains("ReadSchema") && !scan.contains("unused"), scan)
  }
}
