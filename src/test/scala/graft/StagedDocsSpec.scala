package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.StagedDocs

class StagedDocsSpec extends SparkSpec {
  import spark.implicits._

  private def chunkDocs = Seq(
    ("s1", "c1", "alpha text", Map("graft:propositions" -> "p1",
      "author" -> "ann", "secret" -> "x")),
    ("s1", "c2", "beta text", Map("graft:topics" -> "t1", "secret" -> "y")),
    ("s2", "c3", "gamma text", Map("author" -> "bob")))
    .toDF("source_id", "chunk_id", "text", "metadata")

  test("stage filters metadata to extraction keys plus the allowlist") {
    val dir = Files.createTempDirectory("staged").toString
    StagedDocs.stage(chunkDocs, dir, "col1", metadataKeys = Some(Seq("author")))
    val back = StagedDocs.read(spark, dir, "col1")
    assert(back.count() == 3)
    val m = back.filter(col("chunk_id") === "c1").head()
      .getMap[String, String](back.columns.indexOf("metadata"))
    assert(m.keySet == Set("graft:propositions", "author"))
    val m2 = back.filter(col("chunk_id") === "c3").head()
      .getMap[String, String](back.columns.indexOf("metadata"))
    assert(m2.keySet == Set("author"))
  }

  test("round-trip preserves rows and the open metadata map type") {
    val dir = Files.createTempDirectory("staged").toString
    StagedDocs.stage(chunkDocs, dir, "col1")
    val back = StagedDocs.read(spark, dir, "col1")
    assert(back.schema("metadata").dataType.typeName == "map")
    assert(back.select("source_id", "chunk_id", "text").as[(String, String, String)]
      .collect().toSet ==
      chunkDocs.select("source_id", "chunk_id", "text")
        .as[(String, String, String)].collect().toSet)
    // metadata values survive unfiltered
    val m = back.filter(col("chunk_id") === "c1").head()
      .getMap[String, String](back.columns.indexOf("metadata"))
    assert(m("secret") == "x")
  }

  test("collections are isolated and listable without a data scan") {
    val dir = Files.createTempDirectory("staged").toString
    StagedDocs.stage(chunkDocs, dir, "col1")
    StagedDocs.stage(chunkDocs.filter(col("source_id") === "s1"), dir, "col2")
    assert(StagedDocs.collections(spark, dir) == Seq("col1", "col2"))
    assert(StagedDocs.read(spark, dir, "col2").count() == 2)
    assert(StagedDocs.read(spark, dir, "col1").count() == 3)
  }

  test("build-artifact chunks (index routing key) are not staged") {
    val dir = Files.createTempDirectory("staged").toString
    val withArtifacts = chunkDocs.union(
      Seq(("s9", "c9", "built", Map("graft:index" -> "chunk")))
        .toDF("source_id", "chunk_id", "text", "metadata"))
    StagedDocs.stage(withArtifacts, dir, "col1")
    val back = StagedDocs.read(spark, dir, "col1")
    assert(back.count() == 3)
    assert(back.filter(col("chunk_id") === "c9").count() == 0)
  }

  test("staged replay feeds the builder identically to the direct path") {
    val dir = Files.createTempDirectory("staged").toString
    val docs = Seq(
      ("d1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("d2", "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    // stage at document grain (chunk_id = doc_id pre-chunking, like the
    // reference staging whole source docs when extraction is deferred)
    StagedDocs.stage(docs.select(col("doc_id").as("source_id"),
      col("doc_id").as("chunk_id"), col("text"),
      map().cast("map<string,string>").as("metadata")), dir, "run1")
    val replayed = StagedDocs.read(spark, dir, "run1")
      .select(col("source_id").as("doc_id"), col("text"))
    val direct = graft.index.LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id"))
    val staged = graft.index.LexicalGraphBuilder
      .fromDocuments(replayed, "text", Seq("doc_id"))
    assert(staged.statements.select("statement_id").as[String].collect().sorted.toSeq ==
      direct.statements.select("statement_id").as[String].collect().sorted.toSeq)
    assert(staged.entities.count() == direct.entities.count())
  }
}
