package graft

import org.apache.spark.sql.functions._
import graft.index.{DeleteSources, GraphTables, LexicalGraphBuilder}

class GraphBuilderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta " * 8, "web"),
    (2L, "one two three four five six seven eight " * 8, "pdf"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta " * 8, "web2"))
    .toDF("doc_id", "text", "source")

  private lazy val g: GraphTables =
    LexicalGraphBuilder.fromDocuments(docs, "text", Seq("doc_id", "source"))

  test("build is deterministic: same input, same ids") {
    val g2 = LexicalGraphBuilder.fromDocuments(docs, "text", Seq("doc_id", "source"))
    val a = g.statements.select("statement_id").as[String].collect().sorted
    val b = g2.statements.select("statement_id").as[String].collect().sorted
    assert(a.toSeq == b.toSeq)
    assert(g.sources.count() == 3)
  }

  test("chunk linked list is consistent per source") {
    val chunks = g.chunks.select("source_id", "chunk_id", "seq", "prev_id", "next_id")
      .collect().groupBy(_.getString(0))
    chunks.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.head.isNullAt(3)) // first has no prev
      assert(sorted.last.isNullAt(4)) // last has no next
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(4) == b.getString(1)) // a.next == b
          assert(b.getString(3) == a.getString(1)) // b.prev == a
        case _ =>
      }
    }
  }

  test("referential integrity across the graph tables") {
    val chunkIds = g.chunks.select("chunk_id")
    assert(g.statements.join(chunkIds, Seq("chunk_id"), "left_anti").count() == 0)
    assert(g.topicMentionedIn.join(chunkIds, Seq("chunk_id"), "left_anti").count() == 0)
    val topicIds = g.topics.select("topic_id")
    assert(g.statements.join(topicIds, Seq("topic_id"), "left_anti").count() == 0)
    val stmtIds = g.statements.select("statement_id")
    assert(g.factSupports.join(stmtIds, Seq("statement_id"), "left_anti").count() == 0)
    val factIds = g.facts.select("fact_id")
    assert(g.factSupports.join(factIds, Seq("fact_id"), "left_anti").count() == 0)
    val entityIds = g.entities.select(col("entity_id"))
    assert(g.facts.select(col("subject_entity_id").as("entity_id"))
      .join(entityIds, Seq("entity_id"), "left_anti").count() == 0)
  }

  test("identical text under different sources yields distinct chunk ids") {
    // doc 1 and doc 3 share text; chunk ids are source-scoped so they differ
    val bySource = g.chunks.groupBy("source_id").count().as[(String, Long)].collect()
    assert(bySource.length == 3)
    assert(g.chunks.select("chunk_id").distinct().count() == g.chunks.count())
  }

  test("DeleteSources cascades and GCs orphans; shared topics survive") {
    val delId = g.chunks.join(
      g.sources.filter(element_at(col("metadata"), "doc_id") === "2")
        .select("source_id"), Seq("source_id"), "left_semi")
      .select("source_id").distinct()
    val after = DeleteSources(g, delId)
    assert(after.sources.count() == 2)
    // all of doc 2's chunks/statements gone
    assert(after.chunks.count() < g.chunks.count())
    assert(after.statements.join(after.chunks.select("chunk_id"),
      Seq("chunk_id"), "left_anti").count() == 0)
    // doc 1 == doc 3 text, so their (identical) topics survive
    assert(after.topics.count() > 0)
    // no orphan facts: every fact still supports a live statement
    assert(after.facts.join(after.factSupports.select("fact_id"),
      Seq("fact_id"), "left_anti").count() == 0)
    // deleting everything empties every table
    val none = DeleteSources(g, g.sources.select("source_id"))
    assert(none.chunks.count() == 0 && none.topics.count() == 0 &&
      none.facts.count() == 0 && none.entities.count() == 0)
  }

  test("classified build hash-picks entity classes from the inferred list") {
    val docs = Seq((1L, "alpha beta gamma delta " * 10, "x"))
      .toDF("doc_id", "text", "source")
    val cls = Seq("Concept", "System", "Metric")
    val g = graft.index.LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source"), classifications = cls)
    val classes = g.entities.select("classification").distinct()
      .as[String].collect().toSet
    assert(classes.subsetOf(cls.toSet) && classes.nonEmpty)
    // same value always maps to the same class, and the class is baked into
    // the entity id (rebuild-stable)
    val g2 = graft.index.LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source"), classifications = cls)
    assert(g.entities.select("entity_id", "classification").collect().toSet ==
      g2.entities.select("entity_id", "classification").collect().toSet)
    // single-element list degrades to the constant class
    val g1 = graft.index.LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source"))
    assert(g1.entities.select("classification").distinct()
      .as[String].collect().toSeq == Seq("Token"))
  }

  test("InferClassifications: propose -> rank -> top-n, defaults on failure") {
    import graft.index.InferClassifications
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f"))
      .toDF("chunk_id", "text")
    val propose = "<entity_classifications>\nwidget\nGadget\n</entity_classifications>"
    val rank = "<entity_classifications>\nGadget\nWidget\n</entity_classifications>"
    val out = InferClassifications.infer(docs, "text",
      new ScriptedLLM(Seq(propose, rank)), numSamples = 2,
      numClassifications = 1)
    assert(out == Seq("Gadget")) // ranked, capped at 1
    // LLM yields nothing -> defaults
    val fallback = InferClassifications.infer(docs, "text",
      new ScriptedLLM(Seq("no tags")), numSamples = 2)
    assert(fallback == InferClassifications.DefaultClassifications)
    assert(InferClassifications.parseClassifications(propose) ==
      Seq("widget", "Gadget"))
  }

  test("GraphSummary renders entity and class-path lines and summarizes") {
    import graft.retrieve.GraphSummary
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta " * 8, "x"))
      .toDF("doc_id", "text", "source")
    val g = graft.index.LexicalGraphBuilder
      .fromDocuments(docs, "text", Seq("doc_id", "source"),
        classifications = Seq("Concept", "System"))
    val ents = GraphSummary.entityLines(g, 10).select("entity").as[String].collect()
    assert(ents.nonEmpty && ents.forall(e => e.contains(" [") && e.endsWith("]")))
    val paths = GraphSummary.classPaths(g, 10).select("path").as[String].collect()
    assert(paths.nonEmpty &&
      paths.forall(p => p.matches("""\(.+\)-\[NEAR\]->\(.+\)""")))
    val summary = GraphSummary.summarize(g, new graft.llm.StubLLM)
    assert(summary.nonEmpty)
  }

  test("build filters drop ignored topics/statements/sources before build") {
    import graft.index.BuildFilters
    import graft.filter.FilterAst
    val filtered = LexicalGraphBuilder.fromDocuments(docs, "text",
      Seq("doc_id", "source"),
      buildFilters = BuildFilters(
        ignoreTopic = _ === "one",
        ignoreStatement = _.startsWith("alpha"),
        sourceFilter = Some(FilterAst.Pred("source", FilterAst.Ne, "web2"))))
    // source web2 never ingested
    assert(filtered.sources.count() == 2)
    // topic "one" (doc 2's chunks start with "one") gone with its statements
    assert(filtered.topics.filter(col("value") === "one").count() == 0)
    val oneTopicStmts = g.topics.filter(col("value") === "one")
      .join(g.statements, Seq("topic_id"))
    assert(oneTopicStmts.count() > 0) // existed unfiltered
    // no surviving statement text starts with alpha
    assert(filtered.statements.filter(col("value").startsWith("alpha")).count() == 0)
    assert(g.statements.filter(col("value").startsWith("alpha")).count() > 0)
    // filtered build remains referentially intact
    val orphan = filtered.factSupports.join(filtered.statements,
      Seq("statement_id"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("local-entity rewrite re-points facts and drops rewritten locals") {
    import LexicalGraphBuilder.LocalEntityClass
    val entities = Seq(
      ("e1", "spark", "spark", "System"),
      ("eL", "spark", "spark", LocalEntityClass),   // local twin of e1
      ("eX", "flink", "flink", LocalEntityClass))   // local, no twin
      .toDF("entity_id", "value", "search_str", "classification")
    val facts = Seq(("f1", "v", "near", "eL", "eX"))
      .toDF("fact_id", "value", "relation", "subject_entity_id", "object_entity_id")
    val rels = Seq(("eL", "NEAR", "e1")).toDF(
      "src_entity_id", "relation_value", "dst_entity_id")
    val empty = spark.emptyDataFrame
    val g0 = GraphTables(empty, empty, empty, empty, empty,
      facts, empty, entities, rels)
    val out = LexicalGraphBuilder.rewriteLocalEntities(g0)
    val f = out.facts.select("subject_entity_id", "object_entity_id")
      .as[(String, String)].head()
    assert(f == (("e1", "eX"))) // eL -> e1; eX keeps (no non-local twin)
    assert(out.entityRelations.as[(String, String, String)].collect().toSeq ==
      Seq(("e1", "NEAR", "e1")))
    assert(out.entities.select("entity_id").as[String].collect().toSet ==
      Set("e1", "eX")) // rewritten local dropped, unmatched local kept
  }

  test("domain labels: label_from grammar + local-entity exclusion") {
    import graft.index.DomainLabels
    // the adversarial label inputs the oracle's clean class list never
    // exercises: multi-word, punctuation, underscores, mixed case, dunder
    // passthrough, null → default
    val fixtures = Seq(
      ("e1", "a", "a", "data engineer"),
      ("e2", "b", "b", "half-baked  idea"),
      ("e3", "c", "c", "metric_v2"),
      ("e4", "d", "d", "SYS metric"),
      ("e5", "e", "e", "__SYS_Class__"),
      ("e6", "f", "f", LexicalGraphBuilder.LocalEntityClass),
      ("e7", "g", "g", null))
      .toDF("entity_id", "value", "search_str", "classification")
    val out = DomainLabels.withDomainLabels(fixtures)
      .select("entity_id", "label").as[(String, String)].collect().toMap
    assert(out == Map(
      "e1" -> "DataEngineer",
      "e2" -> "HalfBakedIdea",
      "e3" -> "MetricV2",
      "e4" -> "SysMetric",
      "e5" -> "__SYS_Class__",   // reserved dunder passes through
      "e7" -> "Unknown"))        // null → DEFAULT_CLASSIFICATION
    assert(!out.contains("e6"))  // local entities carry no domain label
  }

  test("tenantClassPaths keeps tenants separate and ranks per tenant") {
    import graft.index.GraphTables
    val empty = spark.emptyDataFrame
    def g(ids: Seq[(String, String)], rels: Seq[(String, String)]) = {
      val ents = ids.map { case (id, c) => (id, id, id, c) }
        .toDF("entity_id", "value", "search_str", "classification")
      val r = rels.map { case (a, b) => (a, "NEAR", b) }
        .toDF("src_entity_id", "relation_value", "dst_entity_id")
      GraphTables(empty, empty, empty, empty, empty, empty, empty, ents, r)
    }
    val g0 = g(Seq("a" -> "A", "b" -> "B", "c" -> "A"),
      Seq("a" -> "b", "c" -> "b", "a" -> "c"))
    val g1 = g(Seq("x" -> "X", "y" -> "Y"), Seq("x" -> "y"))
    val out = graft.retrieve.GraphSummary
      .tenantClassPaths(Seq("t0" -> g0, "t1" -> g1), k = 2)
      .select("tenant_id", "path", "score", "rk")
      .as[(String, String, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(out.toSeq == Seq(
      ("t0", "(A)-[NEAR]->(B)", 2L, 1),   // a->b and c->b collapse by class
      ("t0", "(A)-[NEAR]->(A)", 1L, 2),
      ("t1", "(X)-[NEAR]->(Y)", 1L, 1)))
  }

  test("extraction dedup picks deterministic winners under any partitioning") {
    // engineered id collisions: case-variant topic ("Paris Metro" vs
    // "paris metro" share a topic_id), case-variant entity ("Paris"/"paris"
    // with the same class share an entity_id), conflicting classifications
    // on the same fact triple (fact_id excludes them), and a repeated chunk
    // text (chunk_id hashes source+text only)
    val raw1 =
      """topic: Paris Metro
        |entities:
        |Paris|City
        |France|Country
        |proposition: Paris sits in France
        |Paris|is_in|France
        |""".stripMargin
    val raw2 =
      """topic: paris metro
        |entities:
        |paris|City
        |France|Country
        |proposition: Paris sits in France
        |Paris|is_in|France
        |""".stripMargin
    val raw3 =
      """topic: paris metro
        |entities:
        |Paris|Place
        |France|Country
        |proposition: Paris sits in France
        |Paris|is_in|France
        |""".stripMargin
    val rows = Seq(
      ("d1", 0, "paris text", raw1),
      ("d1", 5, "second chunk", raw2),
      ("d1", 9, "paris text", raw1), // duplicate chunk text, later seq
      ("d2", 0, "third chunk", raw3))
    def build(parts: Int) = LexicalGraphBuilder.fromExtractions(
      rows.toDF("doc", "seq", "text", "_raw").repartition(parts),
      "text", "_raw", Seq("doc"))
    val ga = build(1)
    val gb = build(7)
    // chunk dedup: unique ids, the repeated text kept its FIRST occurrence
    val chunks = ga.chunks.select("chunk_id", "seq").collect()
    assert(chunks.map(_.getString(0)).distinct.length == chunks.length)
    assert(ga.chunks.filter(col("text") === "paris text")
      .select("seq").as[Int].collect().toSeq == Seq(0))
    // topic case variants collapse to the lexicographic-min display value
    assert(ga.topics.filter(lower(col("value")) === "paris metro")
      .select("value").as[String].collect().toSeq == Seq("Paris Metro"))
    // one fact row per fact_id despite the City/Place classification clash
    val factIds = ga.facts.select("fact_id").as[String].collect()
    assert(factIds.distinct.length == factIds.length)
    // entity case variants collapse to the lexicographic-min raw value
    assert(ga.entities.filter(col("classification") === "City")
      .filter(lower(col("value")) === "paris")
      .select("value").as[String].collect().toSeq == Seq("Paris"))
    // and every table is identical whatever the input partitioning
    for ((ta, tb) <- Seq(
        (ga.chunks, gb.chunks), (ga.topics, gb.topics),
        (ga.statements, gb.statements), (ga.facts, gb.facts),
        (ga.entities, gb.entities))) {
      val ca = ta.orderBy(ta.columns.map(col).toIndexedSeq: _*).collect().toSeq
      val cb = tb.orderBy(tb.columns.map(col).toIndexedSeq: _*).collect().toSeq
      assert(ca == cb)
    }
  }
}
