package graft

import org.apache.spark.sql.functions._
import graft.byokg.{AgenticRetriever, ByoKGQueryEngine, EntityLinker}
import graft.llm.StubLLM

class ByokgEngineSpec extends SparkSpec {
  import spark.implicits._

  //  acme -founded_by-> alice ; acme -located_in-> berlin ;
  //  alice -works_at-> acme ; berlin -capital_of-> germany
  private lazy val edges = Seq(
    ("acme", "alice", "founded_by"),
    ("acme", "berlin", "located_in"),
    ("alice", "acme", "works_at"),
    ("berlin", "germany", "capital_of"))
    .toDF("src", "dst", "label")

  test("fuzzyLink ranks closest node names with a length gate") {
    val nodes = Seq("acme", "alice", "berlin", "germany").toDF("name")
    val out = EntityLinker.fuzzyLink(nodes, "name", Seq("acmee", "berlln"), k = 1)
      .select("mention", "node").as[(String, String)].collect().toMap
    assert(out("acmee") == "acme")
    assert(out("berlln") == "berlin")
  }

  test("denseLink returns cosine top-k") {
    val emb = Seq(
      ("a", Array(1.0, 0.0)), ("b", Array(0.0, 1.0)), ("c", Array(0.7, 0.7)))
      .toDF("name", "emb")
    val out = EntityLinker.denseLink(emb, "name", "emb", Seq(1.0, 0.0), k = 2)
      .select("node").as[String].collect()
    assert(out.toSeq == Seq("a", "c"))
  }

  test("agentic retrieval follows question-relevant relations") {
    val out = AgenticRetriever.retrieve(
      edges, Seq("acme").toDF("node"), "who founded acme", new StubLLM,
      iterations = 1)
      .select("src", "dst", "label").as[(String, String, String)]
      .collect().toSet
    // "founded" matches founded_by; located_in does not match the question
    assert(out == Set(("acme", "alice", "founded_by")))
  }

  test("agentic retrieval keeps all relations when none match (fallback)") {
    val out = AgenticRetriever.retrieve(
      edges, Seq("acme").toDF("node"), "zzz qqq", new StubLLM, iterations = 1)
      .count()
    assert(out == 2) // both out-edges of acme survive
  }

  test("ByoKGQueryEngine assembles deduped verbalized context") {
    val engine = new ByoKGQueryEngine(edges, new StubLLM, iterations = 2)
    val ctx = engine.retrieveContext("who founded acme", Seq("acmee"))
    val lines = ctx.orderBy(col("first_seen")).select("text").as[String].collect()
    assert(lines.contains("acme [founded_by] alice"))
    assert(lines.distinct.length == lines.length)
    assert(lines.nonEmpty)
  }
}
