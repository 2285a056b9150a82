package graft

import graft.byokg.{CypherLite, CypherStages}
import org.apache.spark.sql.Row

/** Staged-pipeline compiler gates: the reference's own statements_cypher
  * shape (traversal_based_base_retriever.py:153-190) — four chained WITH
  * stages, nested map literals, properties(), collect(distinct), integer
  * division scoring, ORDER BY on a returned map field — plus the loud
  * refusals. */
class CypherStagesSpec extends SparkSpec {
  import spark.implicits._

  // statement graph: statements (L) belong to topics (T), are mentioned in
  // chunks (K), chunks extracted from sources (S) — the reference's
  // lexical-graph retrieval shape
  private lazy val edges = {
    val belongs = Seq(
      "L:1-1" -> "T:1", "L:1-2" -> "T:1", "L:1-3" -> "T:1", "L:1-4" -> "T:1",
      "L:3-1" -> "T:3",
      "L:2-1" -> "T:2", "L:2-2" -> "T:2", "L:2-3" -> "T:2")
      .map { case (a, b) => (a, b, "belongs_to") }
    val mentioned = Seq(
      "L:1-1" -> "K:1-7", "L:1-2" -> "K:1-7",
      "L:1-3" -> "K:1-8", "L:1-4" -> "K:1-8",
      "L:3-1" -> "K:3-1",
      "L:2-1" -> "K:2-9", "L:2-2" -> "K:2-9", "L:2-3" -> "K:2-10")
      .map { case (a, b) => (a, b, "mentioned_in") }
    val extracted = Seq(
      "K:1-7" -> "S:1", "K:1-8" -> "S:1", "K:3-1" -> "S:1",
      "K:2-9" -> "S:2", "K:2-10" -> "S:2")
      .map { case (a, b) => (a, b, "extracted_from") }
    (belongs ++ mentioned ++ extracted).toDF("src", "dst", "label")
  }

  private lazy val props = Seq(
    ("S:1", "alice", Some(100L), Some("a;b")),
    ("S:2", "bob", None, None),
    ("T:1", "topic one", None, None),
    ("T:2", "topic two", None, None),
    ("T:3", "topic three", None, None),
    ("L:1-1", "s11", None, None), ("L:1-2", "s12", None, None),
    ("L:1-3", "s13", None, None), ("L:1-4", "s14", None, None),
    ("L:2-1", "s21", None, None), ("L:2-2", "s22", None, None),
    ("L:2-3", "s23", None, None), ("L:3-1", "s31", None, None),
    ("K:1-7", "k17", None, None), ("K:1-8", "k18", None, None),
    ("K:2-9", "k29", None, None), ("K:2-10", "k210", None, None),
    ("K:3-1", "k31", None, None))
    .toDF("id", "value", "valid_from", "id_fields")

  /** The reference's statements_cypher, adapted only in store naming
    * (backtick labels → prefix labels, node_id(...) → .id, store property
    * names) — the grammar surface is VERBATIM:
    * traversal_based_base_retriever.py:153-190. */
  private val statementsCypher =
    """// get statements grouped by topic and source
      |MATCH (t)<-[:belongs_to]-(l:L)
      |      -[:mentioned_in]->(c)
      |      -[:extracted_from]->(s)
      |WHERE l.id in $statementIds
      |WITH {
      |        sourceId: s.id,
      |        metadata: properties(s),
      |        versioning: {
      |            valid_from: coalesce(s.valid_from, -1),
      |            id_fields: split(coalesce(s.id_fields, ""), ";")
      |        }
      |    } AS source,
      |    t, l, c,
      |    { chunkId: c.id, value: NULL, metadata: properties(c) } AS cc,
      |    { statementId: l.id, statement: l.value, facts: [], chunkId: c.id, score: 0 } as ll
      |WITH source,
      |    t,
      |    collect(distinct cc) as chunks,
      |    collect(ll) as statements
      |WITH source,
      |    {
      |        topic: t.value,
      |        topicId: t.id,
      |        chunks: chunks,
      |        statements: statements
      |    } as topic
      |WITH sum(size(topic.statements)/size(topic.chunks)) AS score, source, collect(topic) AS topics
      |RETURN {
      |    score: score,
      |    source: source,
      |    topics: topics
      |} as result ORDER BY result.score DESC LIMIT $limit""".stripMargin

  private val allStatementIds = Seq(
    "L:1-1", "L:1-2", "L:1-3", "L:1-4", "L:2-1", "L:2-2", "L:2-3", "L:3-1")

  test("the reference's statements_cypher compiles and scores per source " +
    "(4 WITH stages, maps, collect(distinct), integer division)") {
    val out = CypherLite.run(edges, Some(props), statementsCypher,
        Map("statementIds" -> allStatementIds, "limit" -> 10))
      .fold(e => fail(e), identity)
    val rows = out.collect()
    assert(rows.length == 2)
    val r0 = rows(0).getStruct(0)
    val r1 = rows(1).getStruct(0)
    // S:1 — T:1: 4 statements / 2 chunks = 2; T:3: 1/1 = 1 → score 3
    // S:2 — T:2: 3 statements / 2 chunks = 1 (INTEGER division) → score 1
    assert(r0.getAs[Long]("score") == 3L)
    assert(r1.getAs[Long]("score") == 1L)
    val src0 = r0.getStruct(r0.fieldIndex("source"))
    assert(src0.getAs[String]("sourceId") == "S:1")
    val ver0 = src0.getStruct(src0.fieldIndex("versioning"))
    assert(ver0.getAs[Long]("valid_from") == 100L)
    assert(ver0.getSeq[String](ver0.fieldIndex("id_fields")) ==
      Seq("a", "b"))
    val meta0 = src0.getStruct(src0.fieldIndex("metadata"))
    assert(meta0.getAs[String]("value") == "alice")
    val src1 = r1.getStruct(r1.fieldIndex("source"))
    val ver1 = src1.getStruct(src1.fieldIndex("versioning"))
    assert(ver1.getAs[Long]("valid_from") == -1L) // coalesce fallback
    assert(ver1.getSeq[String](ver1.fieldIndex("id_fields")) == Seq(""))
    // topics: S:1 carries two, sorted collect; chunks deduped
    val topics0 = r0.getSeq[Row](r0.fieldIndex("topics"))
    assert(topics0.size == 2)
    val t1 = topics0.find(_.getAs[String]("topicId") == "T:1").get
    assert(t1.getAs[String]("topic") == "topic one")
    assert(t1.getSeq[Row](t1.fieldIndex("chunks")).size == 2)
    val stmts = t1.getSeq[Row](t1.fieldIndex("statements"))
    assert(stmts.size == 4)
    assert(stmts.map(_.getAs[String]("statementId")) ==
      Seq("L:1-1", "L:1-2", "L:1-3", "L:1-4")) // sorted collect
    assert(stmts.forall(s => s.getSeq[String](s.fieldIndex("facts")).isEmpty))
    assert(stmts.forall(s => s.getAs[Long]("score") == 0L))
    val chunks1 = t1.getSeq[Row](t1.fieldIndex("chunks"))
    assert(chunks1.forall(c => c.isNullAt(c.fieldIndex("value"))))
  }

  test("LIMIT and the statementIds parameter restrict the result") {
    val out = CypherLite.run(edges, Some(props), statementsCypher,
        Map("statementIds" -> Seq("L:2-1", "L:2-2"), "limit" -> 1))
      .fold(e => fail(e), identity)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0).getStruct(0)
    val src = r.getStruct(r.fieldIndex("source"))
    assert(src.getAs[String]("sourceId") == "S:2")
    // only the two selected statements count: 2 statements / 1 chunk = 2
    assert(r.getAs[Long]("score") == 2L)
  }

  test("single-stage collect(distinct ...) routes to the staged compiler") {
    val q = "MATCH (l:L)-[:mentioned_in]->(c) " +
      "RETURN c.id AS chunk, collect(distinct l.id) AS stmts " +
      "ORDER BY chunk"
    assert(CypherStages.applies(q))
    val out = CypherLite.run(edges, q).fold(e => fail(e), identity)
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[String]("chunk") == "K:1-7")
    assert(rows.head.getSeq[String](1) == Seq("L:1-1", "L:1-2"))
  }

  test("map literal in a plain RETURN routes staged and projects a struct") {
    val q = "MATCH (c)-[:extracted_from]->(s) " +
      "RETURN { chunk: c.id, source: s.id, name: s.value } AS m " +
      "ORDER BY m.chunk LIMIT 2"
    val out = CypherLite.run(edges, Some(props), q)
      .fold(e => fail(e), identity)
    val rows = out.collect()
    assert(rows.length == 2)
    val m = rows.head.getStruct(0)
    assert(m.getAs[String]("chunk") == "K:1-7")
    assert(m.getAs[String]("source") == "S:1")
    assert(m.getAs[String]("name") == "alice")
  }

  test("refusals are loud: empty map, aggregate inside a map, MATCH or " +
    "WHERE after a chained stage, missing AS, bad ORDER BY field") {
    def err(q: String): String =
      CypherLite.run(edges, Some(props), q).swap
        .getOrElse(fail(s"expected Left for: $q"))
    assert(err("MATCH (a)-[:belongs_to]->(t) RETURN {} AS m")
      .contains("empty map"))
    assert(err("MATCH (a)-[:belongs_to]->(t) RETURN {x: count(a)} AS m")
      .contains("aggregate"))
    assert(err("MATCH (a)-[:belongs_to]->(t) WITH {x: a.id} AS m, t " +
      "WITH m, collect(t) AS ts MATCH (t)-[:x]->(z) RETURN z")
      .contains("MATCH after a WITH stage"))
    // stage clauses out of Cypher's order (WHERE before ORDER BY)
    assert(err("MATCH (a)-[:belongs_to]->(t) WITH a, t " +
      "WITH t, count(a) AS n WHERE n > 0 ORDER BY n RETURN t, n")
      .contains("Cypher's order"))
    assert(err("MATCH (a)-[:belongs_to]->(t) " +
      "RETURN {x: a.id} AS m WHERE m = 'z'")
      .contains("WHERE cannot follow RETURN"))
    assert(err("MATCH (a)-[:belongs_to]->(t) RETURN {x: a.id}")
      .contains("needs an alias"))
    assert(err("MATCH (a)-[:belongs_to]->(t) " +
      "RETURN {x: a.id} AS m ORDER BY m.nope")
      .contains("no field 'nope'"))
    // multi-level paths on a PATTERN variable are refused (properties are
    // flat); deeper-than-schema paths on a MAP output name the fields
    assert(err("MATCH (a)-[:belongs_to]->(t) WITH {x: a.id} AS m, t " +
      "WITH m, collect(t.deep.path) AS ts RETURN m, ts")
      .contains("flat properties"))
  }

  test("bare relationship variables in expressions are refused with a " +
    "type(r) hint (legacy path)") {
    val e = CypherLite.run(edges,
      "MATCH (a)-[r:belongs_to]->(t) WHERE toLower(r) = 'x' RETURN a.id")
      .swap.getOrElse(fail("expected Left"))
    assert(e.contains("type(r)"))
  }

  test("parameter substitution: unbound and quoted parameters are loud") {
    assert(CypherLite.substituteParams("MATCH (a) WHERE a.id IN $ids " +
      "RETURN a", Map.empty).swap.exists(_.contains("unbound")))
    assert(CypherLite.substituteParams("RETURN $x",
      Map("x" -> "it's")).swap.exists(_.contains("quote")))
    assert(CypherLite.substituteParams(
      "WHERE a.id IN $ids LIMIT $n",
      Map("ids" -> Seq("a", "b"), "n" -> 5)) ==
      Right("WHERE a.id IN ['a', 'b'] LIMIT 5"))
    // $ inside a string literal is untouched
    assert(CypherLite.substituteParams("WHERE a.id = '$ids'", Map.empty) ==
      Right("WHERE a.id = '$ids'"))
  }

  test("double parameters render plain decimal (no scientific notation) " +
    "and non-finite doubles are refused") {
    assert(CypherLite.substituteParams("WHERE a.score > $t",
      Map("t" -> 1.0e7)) == Right("WHERE a.score > 10000000"))
    assert(CypherLite.substituteParams("WHERE a.score > $t",
      Map("t" -> 2.5e-4)) == Right("WHERE a.score > 0.00025"))
    assert(CypherLite.substituteParams("WHERE a.score > $t",
      Map("t" -> 0.5)) == Right("WHERE a.score > 0.5"))
    assert(CypherLite.substituteParams("RETURN $t",
      Map("t" -> Double.NaN)).swap.exists(_.contains("finite")))
  }

  test("RETURN-stage ORDER BY on a pattern property outside the " +
    "projection does not leak the hidden pass-through column") {
    val q = "MATCH (t)<-[:belongs_to]-(l:L) " +
      "WITH t, collect(distinct l.id) AS ls " +
      "RETURN t, ls ORDER BY t.value DESC"
    val out = CypherLite.run(edges, Some(props), q)
      .fold(e => fail(e), identity)
    assert(out.columns.toSeq == Seq("t", "ls"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("T:2", "T:3", "T:1"))
  }

  test("comment lines strip outside string literals") {
    assert(CypherLite.stripComments("// lead\nMATCH (a) // tail\nRETURN a")
      == "\nMATCH (a) \nRETURN a")
    assert(CypherLite.stripComments("WHERE a.id = 'http://x'") ==
      "WHERE a.id = 'http://x'")
  }

  test("stage-level WHERE / ORDER BY / LIMIT — the Cypher WITH clause " +
    "tail (HAVING across chained stages, mid-pipeline top-k)") {
    // sources with >= 2 distinct chunks, scored by chunk count
    val q = "MATCH (l:L)-[:mentioned_in]->(c)-[:extracted_from]->(s) " +
      "WITH s, collect(distinct c.id) AS cs WHERE size(cs) >= 2 " +
      "WITH s, cs " +
      "RETURN { src: s.id, n: size(cs) } AS m ORDER BY m.src"
    val rows = CypherLite.run(edges, Some(props), q)
      .fold(e => fail(e), identity).collect()
    assert(rows.length == 2)
    val m0 = rows(0).getStruct(0); val m1 = rows(1).getStruct(0)
    assert(m0.getAs[String]("src") == "S:1" && m0.getAs[Int]("n") == 3)
    assert(m1.getAs[String]("src") == "S:2" && m1.getAs[Int]("n") == 2)
    // the >= filter actually filters: raise the threshold
    val q3 = q.replace(">= 2", ">= 3")
    assert(CypherLite.run(edges, Some(props), q3)
      .fold(e => fail(e), identity).count() == 1L)
    // mid-pipeline ORDER BY + LIMIT: top-1 source by distinct chunks
    val q2 = "MATCH (c)-[:extracted_from]->(s) " +
      "WITH s.id AS src, count(distinct c.id) AS n " +
      "ORDER BY n DESC, src LIMIT 1 " +
      "WITH src, n RETURN src, n"
    val top = CypherLite.run(edges, q2).fold(e => fail(e), identity)
      .collect()
    assert(top.length == 1)
    assert(top(0).getString(0) == "S:1" && top(0).getLong(1) == 3L)
  }

  test("huge literal lists parse linearly — a 6k-id IN list (and UNWIND " +
    "twin) must not blow the regex stack (the sf0.1 statements failure)") {
    val ids = (1 to 6000).map(i => s"'L:$i-1'").mkString("[", ", ", "]")
    // of the 6k ids only L:1-1 / L:2-1 / L:3-1 exist in the fixture
    val q = s"MATCH (l:L)-[:mentioned_in]->(c) WHERE l.id IN $ids " +
      "RETURN l.id AS sid, c.id AS cid"
    val out = CypherLite.run(edges, q)
    assert(out.isRight, out.left.getOrElse(""))
    assert(out.toOption.get.count() == 3L)
    val uq = s"UNWIND $ids AS l MATCH (l)-[:mentioned_in]->(c) " +
      "RETURN c.id AS cid"
    val uo = CypherLite.run(edges, uq)
    assert(uo.isRight, uo.left.getOrElse(""))
    // malformed lists still refuse: trailing comma, unquoted element
    assert(CypherLite.run(edges,
      "MATCH (l:L)-[:x]->(c) WHERE l.id IN ['a',] RETURN l.id AS s").isLeft)
    assert(CypherLite.run(edges,
      "UNWIND ['a', b] AS l MATCH (l)-[:x]->(c) RETURN c.id AS s").isLeft)
  }

  test("stage DISTINCT and SKIP: pagination + projection dedup in the " +
    "clause tail") {
    // distinct chunk ids per statement link, paginated
    val q = "MATCH (l:L)-[:mentioned_in]->(c) " +
      "WITH DISTINCT c.id AS chunk " +
      "WITH chunk ORDER BY chunk SKIP 1 LIMIT 2 " +
      "RETURN chunk ORDER BY chunk"
    val rows = CypherLite.run(edges, q).fold(e => fail(e), identity)
      .collect().map(_.getString(0)).toSeq
    // all chunks sorted: K:1-7, K:1-8, K:2-10, K:2-9, K:3-1 → skip 1 take 2
    assert(rows == Seq("K:1-8", "K:2-10"))
    // DISTINCT beside an aggregate refuses
    assert(CypherLite.run(edges,
      "MATCH (l:L)-[:mentioned_in]->(c) " +
        "WITH DISTINCT c.id AS chunk, count(*) AS n WITH chunk " +
        "RETURN chunk").swap.exists(_.contains("DISTINCT cannot combine")))
  }

  test("a single WITH stage with its own ORDER BY / LIMIT routes staged " +
    "(legacy speaks only the items [WHERE] form)") {
    val q = "MATCH (l:L)-[:belongs_to]->(t) " +
      "WITH t.id AS topic, count(*) AS n ORDER BY n DESC, topic LIMIT 2 " +
      "RETURN topic, n ORDER BY topic"
    assert(CypherStages.applies(q))
    val rows = CypherLite.run(edges, q).fold(e => fail(e), identity)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("T:1", 4L), ("T:2", 3L)))
  }

  test("large IN lists hoist to a broadcast LEFT SEMI join (an InSet " +
    "literal with thousands of ids bloats plan/codegen/task " +
    "serialization at scale); small lists stay pushed-down isin") {
    val big = (1 to 200).map(i => s"'L:$i-1'").mkString("[", ", ", "]")
    val q = s"MATCH (l:L)-[:mentioned_in]->(c) WHERE l.id IN $big " +
      "RETURN l.id AS sid, c.id AS cid ORDER BY sid, cid"
    val out = CypherLite.run(edges, q).fold(e => fail(e), identity)
    assert(out.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("L:1-1", "L:2-1", "L:3-1"))
    // residual conjuncts still filter after the hoist
    val q2 = s"MATCH (l:L)-[:mentioned_in]->(c) WHERE l.id IN $big " +
      "AND c.id STARTS WITH 'K:1' RETURN l.id AS sid ORDER BY sid"
    assert(CypherLite.run(edges, q2).fold(e => fail(e), identity)
      .collect().map(_.getString(0)).toSeq == Seq("L:1-1"))
    val small = "MATCH (l:L)-[:mentioned_in]->(c) " +
      "WHERE l.id IN ['L:1-1', 'L:2-1'] RETURN l.id AS sid ORDER BY sid"
    val outS = CypherLite.run(edges, small).fold(e => fail(e), identity)
    assert(!outS.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(outS.count() == 2L)
  }

  test("mid-pipeline MATCH expands the running frame (piped join on " +
    "the shared variable) and OPTIONAL MATCH left-joins — unmatched " +
    "rows count 0") {
    // chunks per source, through a WITH DISTINCT + MATCH pipeline
    val q = "MATCH (l:L)-[:mentioned_in]->(c) " +
      "WITH DISTINCT c " +
      "MATCH (c)-[:extracted_from]->(s) " +
      "WITH s, count(c) AS n " +
      "RETURN s.id AS src, n ORDER BY src"
    val rows = CypherLite.run(edges, Some(props), q)
      .fold(e => fail(e), identity).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("S:1", 3L), ("S:2", 2L)))
    // OPTIONAL: statements-mentioning-K:1-7 per topic; topics without
    // any survive the left join with count 0 (Cypher semantics)
    val q2 = "MATCH (t)<-[:belongs_to]-(l0:L) " +
      "WITH DISTINCT t " +
      "OPTIONAL MATCH (t)<-[:belongs_to]-(l:L)" +
      "-[:mentioned_in]->(c {id: 'K:1-7'}) " +
      "WITH t, count(l) AS n " +
      "RETURN t.id AS topic, n ORDER BY topic"
    val rows2 = CypherLite.run(edges, Some(props), q2)
      .fold(e => fail(e), identity).collect()
    assert(rows2.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("T:1", 2L), ("T:2", 0L), ("T:3", 0L)))
    // an unanchored mid-MATCH is still a loud cartesian refusal
    assert(CypherLite.run(edges, Some(props),
      "MATCH (l:L)-[:mentioned_in]->(c) WITH DISTINCT c " +
        "MATCH (a)-[:extracted_from]->(b) WITH b, count(a) AS n " +
        "RETURN b, n").swap.exists(_.contains("cartesian")))
  }

  test("existing single-stage grammar does NOT route staged") {
    assert(!CypherStages.applies(
      "MATCH (c:c)-[:placed]->(o:o) RETURN c.id AS cust, count(*) AS n " +
        "ORDER BY n DESC LIMIT 10"))
    assert(!CypherStages.applies(
      "MATCH (c)-[:placed]->(o) WITH c.id AS cust, count(*) AS n " +
        "WHERE n > 15 RETURN cust, n"))
    // single WITH ... MATCH tail with a property-map anchor stays legacy
    assert(!CypherStages.applies(
      "MATCH (c)-[:placed]->(o) WITH c.id AS cust, count(*) AS n " +
        "MATCH (cust)-[:placed]->(o2 {id: 'o:1'}) RETURN cust, n"))
  }
}
