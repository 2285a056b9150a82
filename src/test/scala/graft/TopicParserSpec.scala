package graft

import org.apache.spark.sql.functions._
import graft.index.{LexicalGraphBuilder, TopicParser}
import graft.index.TopicParser._

/** Mirrors the reference's parser unit tests
  * (lexical-graph/tests/unit/indexing/utils/test_topic_utils.py). */
class TopicParserSpec extends SparkSpec {
  import spark.implicits._

  test("helpers: format, clean, classification, full stop") {
    assert(formatValue("entity_name") == "entity name")
    assert(formatValue(null) == "")
    assert(formatClassification("person_entity") == "Person Entity")
    assert(stripFullStop("Technology.") == "Technology")
    assert(clean("The company (founded 2020)") == "company")
    assert(clean("an organization") == "organization")
    assert(clean("entity_name_here") == "entity name here")
  }

  test("parses topics, entities, propositions, and fact triples") {
    val raw =
      """topic: AI Systems
        |entities:
        |Machine Learning|Technology
        |AI systems|Technology
        |proposition: Machine learning enables AI systems
        |Machine Learning|enables|AI systems
        |""".stripMargin
    val (topics, garbage) = parseExtractedTopics(raw)
    assert(garbage.isEmpty)
    assert(topics.size == 1)
    val t = topics.head
    assert(t.value == "AI Systems")
    assert(t.entities.map(_.value) == Seq("Machine Learning", "AI systems"))
    assert(t.statements.size == 1)
    val st = t.statements.head
    assert(st.value == "Machine learning enables AI systems")
    assert(st.facts.size == 1)
    val f = st.facts.head
    assert(f.subject.value == "Machine Learning")
    assert(f.predicate == "enables")
    assert(f.obj.map(_.value).contains("AI systems"))
  }

  test("multiple topics; full stop stripped; default topic unused") {
    val raw =
      """topic: Topic 1.
        |entities:
        |Entity1|Type1
        |
        |topic: Topic 2
        |entities:
        |Entity2|Type2
        |""".stripMargin
    val (topics, _) = parseExtractedTopics(raw)
    assert(topics.map(_.value) == Seq("Topic 1", "Topic 2"))
    assert(topics(0).entities.head.classification == "Type1")
  }

  test("unresolved object/subject fall back to local entities") {
    val raw =
      """topic: Relationships
        |entities:
        |Alice|Person
        |proposition: Alice knows Bob
        |Alice|knows|Bob
        |Carol|likes|Dave
        |""".stripMargin
    val (topics, _) = parseExtractedTopics(raw)
    val facts = topics.head.statements.head.facts
    assert(facts.size == 2)
    // Bob unresolved -> complement local entity
    assert(facts(0).obj.isEmpty)
    assert(facts(0).complement.map(_.classification)
      .contains(LocalEntityClassification))
    // Carol unresolved subject -> local subject AND a details line
    assert(facts(1).subject.classification == LocalEntityClassification)
    assert(topics.head.statements.head.details == Seq("Carol likes Dave"))
  }

  test("garbage collection of unparseable lines; empty input") {
    val raw =
      """topic: Test
        |entities:
        |InvalidEntity
        |proposition: Test statement
        |stray prose line
        |""".stripMargin
    val (topics, garbage) = parseExtractedTopics(raw)
    assert(garbage.exists(_.startsWith("UNPARSEABLE ENTITY")))
    // prose in relationship state with 1 part becomes a details line
    assert(topics.head.statements.head.details == Seq("stray prose line"))
    assert(parseExtractedTopics("")._1.isEmpty)
  }

  test("fromExtractions builds consistent graph tables from raw text") {
    val raw1 =
      """topic: Databases
        |entities:
        |Spark|System
        |Parquet|Format
        |proposition: Spark reads Parquet
        |Spark|reads|Parquet
        |proposition: Spark joins tables
        |Spark|joins|Tables
        |""".stripMargin
    val raw2 =
      """topic: Animals
        |entities:
        |Cat|Animal
        |proposition: Cats chase mice
        |Cat|chases|Mouse
        |""".stripMargin
    val chunksRaw = Seq(
      (1L, "w", 0, "spark text one", raw1),
      (1L, "w", 1, "cats text two", raw2))
      .toDF("doc_id", "source", "seq", "text", "raw")
    val g = LexicalGraphBuilder.fromExtractions(
      chunksRaw, "text", "raw", Seq("doc_id", "source"))
    assert(g.sources.count() == 1)
    assert(g.chunks.count() == 2)
    assert(g.topics.select("value").as[String].collect().toSet ==
      Set("Databases", "Animals"))
    assert(g.statements.count() == 3)
    // prev-statement chain within the first chunk
    val dbStmts = g.statements.filter(col("chunk_id").startsWith("g::"))
      .orderBy("seq").select("prev_statement_id").collect()
    assert(dbStmts.head.isNullAt(0))
    // facts resolved against topic entities; Tables/Mouse become locals
    assert(g.facts.count() == 3)
    val locals = g.entities
      .filter(col("classification") === TopicParser.LocalEntityClassification)
    assert(locals.select("value").as[String].collect().toSet ==
      Set("Tables", "Mouse"))
    // local rewrite composes: no non-local twins here, so a no-op
    val rewritten = LexicalGraphBuilder.rewriteLocalEntities(g)
    assert(rewritten.entities.count() == g.entities.count())
    // relation names are UPPER_UNDERSCORE of the predicate
    assert(g.entityRelations.select("relation_value").as[String]
      .collect().toSet == Set("READS", "JOINS", "CHASES"))
    // referential integrity
    assert(g.factSupports.join(g.statements, Seq("statement_id"), "left_anti")
      .count() == 0)
    assert(g.factSupports.join(g.facts, Seq("fact_id"), "left_anti")
      .count() == 0)
  }
}
