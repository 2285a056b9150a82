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

  test("render -> parse round-trips arbitrary well-formed extractions") {
    import org.scalacheck.Gen
    // values chosen fixed-point under the parser's normalization (no
    // underscores/articles/parens/colons/pipes, classifications Title-case)
    val word = Gen.choose(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val cls = word.map(w => w.capitalize)
    val entGen = Gen.zip(word, cls)
      .map { case (v, c) => TopicParser.ParsedEntity(v, c) }
    (1 to 10).foreach { _ =>
      val nTopics = Gen.choose(1, 3).sample.get
      val topics = (1 to nTopics).map { ti =>
        val ents = Gen.listOfN(Gen.choose(2, 4).sample.get, entGen).sample.get
          .distinctBy(_.value)
        val stmts = (1 to Gen.choose(1, 3).sample.get).map { si =>
          val s = ents(Gen.choose(0, ents.size - 1).sample.get)
          val o = ents(Gen.choose(0, ents.size - 1).sample.get)
          val pred = word.sample.get
          TopicParser.ParsedStatement(
            s"stmt $ti $si ${word.sample.get}", Seq.empty,
            Seq(TopicParser.ParsedFact(s, pred, Some(o), None)))
        }
        TopicParser.ParsedTopic(s"topic $ti ${word.sample.get}", ents, stmts)
      }
      // render in the reference's response format
      val raw = topics.map { t =>
        (Seq(s"topic: ${t.value}", "entities:") ++
          t.entities.map(e => s"${e.value}|${e.classification}") ++
          t.statements.flatMap(st =>
            s"proposition: ${st.value}" +:
              st.facts.map(f =>
                s"${f.subject.value}|${f.predicate}|${f.obj.get.value}"))
          ).mkString("\n")
      }.mkString("\n")
      val (parsed, garbage) = TopicParser.parseExtractedTopics(raw)
      assert(garbage.isEmpty, s"garbage=$garbage\nraw=$raw")
      assert(parsed == topics, s"raw=$raw")
    }
  }

  test("two-turn extraction pipeline: prompts -> parser -> graph tables") {
    import graft.index.ExtractionPipeline
    // deterministic stand-ins emitting the reference response formats:
    // turn 1 returns "title\nproposition..." from the <text> section;
    // turn 2 renders <propositions> into the delimited topic format
    class PropStub extends graft.llm.LLM {
      override def complete(prompt: String): String = {
        val text = prompt.split("<text>\n")(1).split("\n</text>")(0)
        val toks = text.trim.split("\\s+")
        val props = toks.grouped(4).map(_.mkString(" ")).toSeq
        (toks.head +: props).mkString("\n")
      }
    }
    class TopicStub extends graft.llm.LLM {
      override def complete(prompt: String): String = {
        val lines = prompt.split("<propositions>\n")(1)
          .split("\n</propositions>")(0).split("\n").filter(_.nonEmpty)
        val (title, props) = (lines.head, lines.tail)
        val ents = props.flatMap(p => {
          val w = p.split(" "); Seq(w.head, w.last)
        }).distinct
        (Seq(s"topic: $title", "entities:") ++
          ents.map(e => s"$e|Token") ++
          props.flatMap(p => {
            val w = p.split(" ")
            Seq(s"proposition: $p", s"${w.head}|NEAR|${w.last}")
          })).mkString("\n")
      }
    }
    val chunks = Seq(
      (1L, "w", 0, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "w", 1, "one two three four five six seven eight"),
      (2L, "x", 0, "red green blue cyan magenta yellow black white"))
      .toDF("doc_id", "source", "seq", "text")
    val g = ExtractionPipeline.extract(chunks, "text",
      Seq("doc_id", "source"), () => new PropStub, () => new TopicStub)
    assert(g.sources.count() == 2)
    assert(g.chunks.count() == 3)
    assert(g.topics.select("value").as[String].collect().toSet ==
      Set("alpha", "one", "red"))
    assert(g.statements.count() == 6) // two 4-token propositions per chunk
    assert(g.facts.count() == 6)
    assert(g.entities.filter(col("classification") === "Token").count() > 0)
    // deterministic end to end
    val g2 = ExtractionPipeline.extract(chunks, "text",
      Seq("doc_id", "source"), () => new PropStub, () => new TopicStub)
    assert(g2.statements.select("statement_id").as[String].collect().sorted.toSeq ==
      g.statements.select("statement_id").as[String].collect().sorted.toSeq)
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
