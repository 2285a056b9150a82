package graft

import graft.byokg.{CypherLite, CypherPaths}

/** Path-collect pipeline gates: the reference's multiple-entity graph
  * search (entity_based_search.py:150-159) — `p=` path binding over an
  * undirected var-length hop, `UNWIND nodes(p)`, `WITH DISTINCT
  * COLLECT(n)`, a second MATCH with collected-list membership — plus
  * the loud refusals for the unsupported remainder. */
class CypherPathsSpec extends SparkSpec {
  import spark.implicits._

  // entity graph in the reference's lexical shape: RELATION between
  // entities (traversed undirected), entity-[:SUBJECT/:OBJECT]->fact,
  // fact-[:SUPPORTS]->statement, statement-[:PREVIOUS]-statement
  private lazy val edges = Seq(
    ("E:1", "E:2", "RELATION"), ("E:2", "E:3", "RELATION"),
    ("E:1", "E:4", "RELATION"), ("E:4", "E:5", "RELATION"),
    ("E:3", "E:5", "RELATION"), ("E:4", "E:6", "RELATION"),
    ("E:1", "F:a", "SUBJECT"), ("E:3", "F:a", "OBJECT"),
    ("E:2", "F:b", "SUBJECT"), ("E:6", "F:b", "OBJECT"),
    ("E:4", "F:c", "SUBJECT"), ("E:5", "F:c", "OBJECT"),
    ("F:a", "L:1", "SUPPORTS"), ("F:b", "L:3", "SUPPORTS"),
    ("F:c", "L:2", "SUPPORTS"),
    ("L:1", "L:0", "PREVIOUS")).toDF("src", "dst", "label")

  /** The reference's multiple-entity search, adapted only in store
    * naming (backtick labels → prefix labels, node_id(...) → .id):
    * entity_based_search.py:150-159 — the grammar surface is VERBATIM. */
  private val pathCypher =
    """// multiple entity-based graph search
      |MATCH p=(e1:E {id: $startId})-[:RELATION*1..2]-(e2:E)
      |WHERE e2.id in $endIds
      |UNWIND nodes(p) AS n
      |WITH DISTINCT COLLECT(n) AS entities
      |MATCH (s)-[:SUBJECT]->(f)<-[:OBJECT]-(o),
      |      (f)-[:SUPPORTS]->()-[:PREVIOUS*0..1]-(l)
      |WHERE s in entities and o in entities
      |RETURN DISTINCT l.id AS l LIMIT $statementLimit""".stripMargin

  test("the reference's multiple-entity path search compiles and " +
    "returns the statements between path-collected entities") {
    val out = CypherLite.run(edges, None, pathCypher,
      Map("startId" -> "E:1", "endIds" -> Seq("E:3", "E:5"),
        "statementLimit" -> 50)).fold(e => fail(e), identity)
    assert(out.columns.toSeq == Seq("l"))
    // paths: E:1-E:2-E:3, E:1-E:4-E:5 → entities {E:1..E:5} (E:6 is
    // only reachable through a non-endId endpoint and stays out);
    // F:a(E:1,E:3) → L:1 and its PREVIOUS L:0; F:c(E:4,E:5) → L:2;
    // F:b touches E:6 → excluded
    assert(out.as[String].collect().toSet == Set("L:0", "L:1", "L:2"))
  }

  test("endIds restrict the collected entity set (a start with no " +
    "matching endpoints collects nothing)") {
    val out = CypherLite.run(edges, None, pathCypher,
      Map("startId" -> "E:1", "endIds" -> Seq("E:6"),
        "statementLimit" -> 50)).fold(e => fail(e), identity)
    // only path E:1-E:4-E:6 → entities {E:1,E:4,E:6}; no fact has both
    // subject and object inside that set... F:b is (E:2,E:6) — E:2 out
    assert(out.count() == 0L)
  }

  test("NOT membership compiles as an anti join") {
    val q =
      """MATCH p=(e1:E {id: 'E:1'})-[:RELATION*1..2]-(e2:E)
        |WHERE e2.id in ['E:3', 'E:5']
        |UNWIND nodes(p) AS n
        |WITH COLLECT(DISTINCT n) AS entities
        |MATCH (s)-[:SUBJECT]->(f)
        |WHERE NOT s in entities
        |RETURN DISTINCT s.id AS s""".stripMargin
    val out = CypherLite.run(edges, None, q).fold(e => fail(e), identity)
    // subjects are E:1, E:2, E:4; all in entities except... all three
    // ARE in {E:1..E:5} → empty; narrow endIds instead
    assert(out.count() == 0L)
    val q2 = q.replace("['E:3', 'E:5']", "['E:3']")
    // entities {E:1,E:2,E:3} → subjects not in set: E:4
    assert(CypherLite.run(edges, None, q2).fold(e => fail(e), identity)
      .as[String].collect().toSet == Set("E:4"))
  }

  test("the membership frame is a broadcast semi-join, not a driver " +
    "list — and both memberships share one broadcast") {
    val out = CypherLite.run(edges, None, pathCypher,
      Map("startId" -> "E:1", "endIds" -> Seq("E:3", "E:5"),
        "statementLimit" -> 50)).fold(e => fail(e), identity)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"expected broadcast left-semi membership joins in:\n$plan")
  }

  test("refusals are loud and name the supported shape") {
    def left(q: String): String =
      CypherLite.run(edges, None, q, Map.empty).swap
        .getOrElse(fail(s"expected refusal for: $q"))
    // no UNWIND
    assert(left("MATCH p=(a)-[:RELATION]-(b) RETURN a.id")
      .contains("UNWIND"))
    // nodes(x) over the wrong variable
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(q) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE s in xs RETURN s.id").contains("path variable"))
    // collect of the wrong variable
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(m) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE s in xs RETURN s.id").contains("UNWIND variable"))
    // unused collected list
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "RETURN s.id").contains("never used"))
    // membership under OR
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE s in xs OR s.id = 'E:1' RETURN s.id")
      .contains("top-level AND"))
    // membership against an unknown list (beside a valid one — alone,
    // the unknown name already fails the "never used" gate above)
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE s in xs AND f in ys RETURN s.id")
      .contains("only collected list"))
    // comma patterns under a path binding
    assert(left("MATCH p=(a)-[:RELATION]-(b), (c)-[:SUBJECT]->(f) " +
      "UNWIND nodes(p) AS n WITH DISTINCT COLLECT(n) AS xs " +
      "MATCH (s)-[:SUBJECT]->(f) WHERE s in xs RETURN s.id")
      .contains("one chain"))
    // *0.. on the bound chain
    assert(left("MATCH p=(a)-[:RELATION*0..2]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE s in xs RETURN s.id").contains("*0.."))
    // membership variable not bound by a mandatory pattern
    assert(left("MATCH p=(a)-[:RELATION]-(b) UNWIND nodes(p) AS n " +
      "WITH DISTINCT COLLECT(n) AS xs MATCH (s)-[:SUBJECT]->(f) " +
      "WHERE z in xs RETURN s.id").contains("membership variable"))
  }

  test("head WHERE beyond the endpoint filter rides into every " +
    "length variant") {
    // exclude E:2 as an endpoint: only the E:4 arm survives
    val q =
      """MATCH p=(e1:E {id: 'E:1'})-[:RELATION*1..2]-(e2:E)
        |WHERE e2.id in ['E:3', 'E:5'] AND e2.id <> 'E:3'
        |UNWIND nodes(p) AS n
        |WITH DISTINCT COLLECT(n) AS entities
        |MATCH (s)-[:SUBJECT]->(f)<-[:OBJECT]-(o)
        |WHERE s in entities AND o in entities
        |RETURN DISTINCT f.id AS f""".stripMargin
    // entities {E:1, E:4, E:5} → only F:c qualifies
    assert(CypherLite.run(edges, None, q).fold(e => fail(e), identity)
      .as[String].collect().toSet == Set("F:c"))
  }
}
