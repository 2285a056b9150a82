package graft

import org.apache.spark.sql.functions._
import graft.byokg.{AgenticRetriever, ByoKGIterativeEngine, ByoKGQueryEngine,
  EntityLinker, GraphQueryRetriever, GraphQuerySafety, KGLinker,
  TokenOverlapReranker, Traversal}
import graft.llm.{LLM, StubLLM}

/** Replays canned responses in order — the deterministic stand-in for the
  * multi-turn KGLinker protocol. */
final class ScriptedLLM(responses: Seq[String]) extends LLM {
  private var i = -1
  override def complete(prompt: String): String = {
    i = math.min(i + 1, responses.length - 1)
    responses(i)
  }
}

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

  test("retrieveContext preserves first-seen order: agentic before khop-only") {
    val engine = new ByoKGQueryEngine(edges, new StubLLM, iterations = 1)
    val ctx = engine.retrieveContext("who founded acme", Seq("acmee"))
      .orderBy(col("first_seen")).select("text").as[String].collect().toSeq
    // agentic (priority 0) keeps only founded_by for this question; the
    // khop context (priority 1) adds located_in. first-seen order must put
    // every agentic line before any khop-only line — NOT alphabetical order,
    // which would interleave them.
    val agenticLine = ctx.indexOf("acme [founded_by] alice")
    val khopOnly = ctx.indexOf("acme [located_in] berlin")
    assert(agenticLine >= 0 && khopOnly >= 0 && agenticLine < khopOnly)
  }

  // ----- KGLinker artifact protocol (kg_linker.py:15-140) -----

  test("KGLinker parses per-task artifacts and task completion") {
    val resp =
      """<entities>
        |acme corp
        |alice
        |</entities>
        |<paths>
        |acme -> founded_by
        |</paths>
        |<opencypher>SELECT 1</opencypher>
        |<answers>alice</answers>
        |<task-completion>FINISH</task-completion>""".stripMargin
    val a = KGLinker.parseResponse(resp)
    assert(a("entity-extraction") == Seq("acme corp", "alice"))
    assert(a("path-extraction") == Seq("acme -> founded_by"))
    assert(a("opencypher") == Seq("SELECT 1"))
    assert(a("draft-answer-generation") == Seq("alice"))
    assert(KGLinker.taskCompletion(resp) == Seq("FINISH"))
    assert(KGLinker.parseTag("no tags here", "entities").isEmpty)
  }

  test("KGLinker prompt embeds question, schema, context and task tags") {
    val p = KGLinker.buildPrompt("who?", "Relations: a, b", "ctx line",
      iterative = true)
    assert(p.contains("who?") && p.contains("Relations: a, b") &&
      p.contains("ctx line") && p.contains("<entities>") &&
      p.contains("iterative"))
    val p0 = KGLinker.buildPrompt("q", "s", "")
    assert(p0.contains("No graph context provided"))
  }

  // ----- read-only query gate (graph_retrievers.py:376-414) -----

  test("isQuerySafe blocks modification keywords through evasion tricks") {
    assert(GraphQuerySafety.isQuerySafe("MATCH (n) RETURN n"))
    assert(GraphQuerySafety.isQuerySafe("SELECT src, dst FROM edges"))
    assert(!GraphQuerySafety.isQuerySafe("CREATE (n:Node)"))
    assert(!GraphQuerySafety.isQuerySafe("match (n) delete n"))
    // keyword hidden behind a block comment
    assert(!GraphQuerySafety.isQuerySafe("/* x */ DROP TABLE edges"))
    // keyword only inside a comment is fine
    assert(GraphQuerySafety.isQuerySafe("SELECT 1 // DELETE nothing"))
    assert(GraphQuerySafety.isQuerySafe("SELECT 1 -- DROP nothing"))
    // fullwidth lookalikes collapse under NFKC
    assert(!GraphQuerySafety.isQuerySafe("ＤＥＬＥＴＥ x"))
    // substring inside a word is not a keyword
    assert(GraphQuerySafety.isQuerySafe("SELECT created_at FROM edges"))
    assert(GraphQuerySafety.isQuerySafe("DROP ANYTHING", blockModification = false))
  }

  test("GraphQueryRetriever executes safe SQL and verbalizes rows") {
    edges.createOrReplaceTempView("kg_edges")
    val r = new GraphQueryRetriever(spark)
    val ok = r.retrieve(
      "SELECT src, label FROM kg_edges WHERE dst = 'alice' ORDER BY src")
    assert(ok == Seq("src: acme, label: founded_by"))
    val blocked = r.retrieve("DELETE FROM kg_edges")
    assert(blocked.head.startsWith("Error executing query"))
    val bad = r.retrieve("SELECT nope FROM kg_edges")
    assert(bad.head.startsWith("Error executing query"))
  }

  // ----- reranker seam (graph_reranker.py:32-133) -----

  test("TokenOverlapReranker keeps top-k by query overlap, stable on ties") {
    val in = Seq((0L, "acme founded by alice"), (1L, "berlin capital"),
      (2L, "alice founded acme today")).toDF("ord", "text")
    val out = new TokenOverlapReranker()
      .rerankTopK("who founded acme", in, "text", 2, "ord")
      .select("ord").as[Long].collect()
    assert(out.toSeq == Seq(0L, 2L)) // both mention founded+acme; 0 is shorter
  }

  // ----- path verbalizer parity (graph_verbalizer.py:108-254) -----

  test("verbalizeTripletsMerged groups tails per (head, relation)") {
    val t = Seq(("a", "x", "r"), ("a", "y", "r"), ("b", "z", "s"))
      .toDF("src", "dst", "label")
    val out = Traversal.verbalizeTripletsMerged(t)
      .select("text").as[String].collect().sorted
    assert(out.toSeq == Seq("a -> r -> x | y", "b -> s -> z"))
  }

  test("metapathPaths keeps full paths; verbalizePaths merges ends") {
    val paths = Traversal.metapathPaths(edges, Seq("acme").toDF("node"),
      Seq("located_in", "capital_of"))
    assert(paths.count() == 1)
    val lines = Traversal.verbalizePaths(paths).select("text").as[String].collect()
    assert(lines.toSeq ==
      Seq("acme -> located_in > berlin > capital_of -> germany"))
    val single = Traversal.verbalizePaths(
      Traversal.metapathPaths(edges, Seq("acme").toDF("node"), Seq("founded_by")))
      .select("text").as[String].collect()
    assert(single.toSeq == Seq("acme -> founded_by -> alice"))
  }

  // ----- full iterate loop (byokg_query_engine.py:151-188) -----

  test("ByoKGIterativeEngine runs the artifact-driven loop and stops on FINISH") {
    edges.createOrReplaceTempView("kg_edges")
    val turn1 =
      """<entities>
        |acmee
        |</entities>
        |<paths>
        |located_in -> capital_of
        |</paths>
        |<opencypher>SELECT 'extra: line' AS note</opencypher>""".stripMargin
    val turn2 = "<entities>\nFINISH\n</entities>" +
      "<task-completion>FINISH</task-completion>"
    val engine = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(turn1, turn2)),
      queryRetriever = Some(new GraphQueryRetriever(spark)))
    val ctx = engine.query("who founded acme", iterations = 3)
    // triplet context from the linked entity, path context from the metapath,
    // query context from the safe SQL — in arrival order, deduped
    assert(ctx.exists(_.contains("founded_by")))
    assert(ctx.contains("acme -> located_in > berlin > capital_of -> germany"))
    assert(ctx.exists(_.startsWith("note:")))
    assert(ctx.distinct.length == ctx.length)
    // second turn FINISHed: the scripted LLM would replay turn2 forever, so
    // reaching here without a 3rd-iteration context change proves the break
    val engine2 = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(turn1, turn2)),
      queryRetriever = Some(new GraphQueryRetriever(spark)))
    assert(engine2.query("who founded acme", iterations = 10) == ctx)
  }

  test("ByoKGIterativeEngine applies the reranker to triplet context") {
    val turn =
      """<entities>
        |acmee
        |</entities><task-completion>FINISH</task-completion>""".stripMargin
    val engine = new ByoKGIterativeEngine(edges, new ScriptedLLM(Seq(turn)),
      reranker = Some(new TokenOverlapReranker))
    val ctx = engine.query("who founded acme", iterations = 1)
    assert(ctx.nonEmpty)
  }

  test("GraphScoringRetriever composes k-hop, relation pruning, and rerank") {
    import graft.byokg.GraphScoringRetriever
    val out = GraphScoringRetriever.retrieve(edges,
      Seq("acme").toDF("node"), "who founded acme",
      new TokenOverlapReranker, hops = 2, topk = 3, maxRelations = 2)
    val lines = out.select("text").as[String].collect()
    assert(lines.nonEmpty && lines.length <= 3)
    // merged verbalization shape, query-relevant relation survives pruning
    assert(lines.exists(_.contains("-> founded_by ->")))
    assert(lines.forall(_.contains(" -> ")))
    // maxRelations=2 prunes the vocabulary: at most 2 distinct relations
    val relCount = lines.map(_.split(" -> ")(1)).distinct.length
    assert(relCount <= 2)
  }

  test("ByoKGIterativeEngine executes property-returning cypher from the " +
    "LLM through the CypherGraphRetriever (the reference's node_result " +
    "projection shape); an invented property becomes retry feedback") {
    import graft.byokg.CypherGraphRetriever
    val nodeProps = Seq(
      ("acme", "Acme Corp", "company"), ("alice", "Alice Liddell", "person"),
      ("berlin", "Berlin", "city"), ("germany", "Germany", "country"))
      .toDF("id", "value", "class")
    // turn 1: ordinary LLM-authored cypher projecting node properties
    val turn1 =
      """<entities>
        |acmee
        |</entities>
        |<opencypher>MATCH (a)-[:founded_by]->(f) WHERE a.class = 'company' RETURN a.value AS org, f.value AS founder</opencypher>"""
        .stripMargin
    val turn2 = "<entities>\nFINISH\n</entities>" +
      "<task-completion>FINISH</task-completion>"
    val engine = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(turn1, turn2)),
      cypherRetriever = Some(new CypherGraphRetriever(edges,
        nodeProps = Some(nodeProps))))
    val ctx = engine.query("who founded acme", iterations = 3)
    assert(ctx.contains("org: Acme Corp, founder: Alice Liddell"), ctx)
    // an invented property surfaces the schema in the retry-feedback line
    val badTurn = turn1.replace("a.class", "a.chunkId")
    val engine2 = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(badTurn, turn2)),
      cypherRetriever = Some(new CypherGraphRetriever(edges,
        nodeProps = Some(nodeProps))))
    val ctx2 = engine2.query("who founded acme", iterations = 3)
    val err = ctx2.find(_.startsWith("Error executing query:"))
    assert(err.nonEmpty && err.get.contains("chunkId") &&
      err.get.contains("class"), ctx2)
  }

  test("ByoKGIterativeEngine executes expression cypher from the LLM " +
    "(coalesce / toLower / property arithmetic — the reference's own " +
    "retrieval-cypher shapes); an unknown function becomes retry feedback") {
    import graft.byokg.CypherGraphRetriever
    val nodeProps = Seq(
      ("acme", "Acme Corp", "company", 50.0),
      ("alice", "Alice Liddell", "person", 150.0),
      ("berlin", "Berlin", "city", 10.0),
      ("germany", "Germany", "country", 20.0))
      .toDF("id", "value", "class", "score")
    val turn1 =
      """<entities>
        |acmee
        |</entities>
        |<opencypher>MATCH (a)-[:founded_by]->(f) WHERE f.score > a.score * 2.0 RETURN toLower(a.value) AS org, coalesce(f.value, 'unknown') AS founder</opencypher>"""
        .stripMargin
    val turn2 = "<entities>\nFINISH\n</entities>" +
      "<task-completion>FINISH</task-completion>"
    val engine = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(turn1, turn2)),
      cypherRetriever = Some(new CypherGraphRetriever(edges,
        nodeProps = Some(nodeProps))))
    val ctx = engine.query("who founded acme", iterations = 3)
    assert(ctx.contains("org: acme corp, founder: Alice Liddell"), ctx)
    // an unknown function surfaces BY NAME in the retry-feedback line,
    // with the supported list — the LLM's budget goes to semantics
    val badTurn = turn1.replace("toLower(a.value)", "initCap(a.value)")
    val engine2 = new ByoKGIterativeEngine(edges,
      new ScriptedLLM(Seq(badTurn, turn2)),
      cypherRetriever = Some(new CypherGraphRetriever(edges,
        nodeProps = Some(nodeProps))))
    val ctx2 = engine2.query("who founded acme", iterations = 3)
    val err = ctx2.find(_.startsWith("Error executing query:"))
    assert(err.nonEmpty && err.get.contains("initCap") &&
      err.get.contains("coalesce"), ctx2)
  }

  test("engine schema lists sorted relation labels") {
    val engine = new ByoKGIterativeEngine(edges, new StubLLM)
    assert(engine.schema() ==
      "Relations: capital_of, founded_by, located_in, works_at")
  }

  test("edgesFromCsv loads triplets, skips short rows, ignores extras") {
    val dir = java.nio.file.Files.createTempDirectory("kgcsv").toFile
    val f = new java.io.File(dir, "kg.csv")
    val w = new java.io.PrintWriter(f)
    w.println("source,relation,target,weight")
    w.println("a,knows,b,3")
    w.println("b,likes,c,1")
    w.println("broken,row")
    w.close()
    val e = graft.byokg.Traversal.edgesFromCsv(spark, f.getAbsolutePath)
    assert(e.columns.toSeq == Seq("src", "dst", "label"))
    assert(e.as[(String, String, String)].collect().toSet ==
      Set(("a", "b", "knows"), ("b", "c", "likes")))
    // loaded edges drive the traversals directly
    val hop = graft.byokg.Traversal.oneHop(e, Seq("a").toDF("node"))
    assert(hop.select("dst").as[String].collect().toSeq == Seq("b"))
  }

  test("EmbeddingInteractionReranker ranks by embedding geometry through " +
    "the stored-embedding column") {
    import graft.byokg.EmbeddingInteractionReranker
    // dim=4; the scorer's effective query vector is w_j = q_j + 0.5·q_{j+1}
    // (cyclic). Candidates with embeddings aligned to w must outrank
    // orthogonal and anti-aligned ones REGARDLESS of their text — the
    // ranking the token-overlap stand-in cannot produce.
    val q = new graft.llm.HashEmbedder(4).embed("the query")
    val w = Array.tabulate(4)(j => q(j) + 0.5 * q((j + 1) % 4))
    val orth = Array(-w(1), w(0), -w(3), w(2)) // ⟂ w by construction
    val rows = Seq(
      ("aligned", w.map(_ * 2.0).toSeq),   // cos = 1 (scale-invariant)
      ("anti", w.map(-_).toSeq),           // cos = -1
      ("ortho", orth.toSeq))               // cos = 0
      .toDF("statement_id", "emb").withColumn("statement", lit("same text"))
    val rr = new EmbeddingInteractionReranker(dim = 4, embCol = Some("emb"))
    val out = rr.rerankTopK("the query", rows, "statement",
        topk = 3, orderCol = "statement_id")
      .select("statement_id").as[String].collect().toSeq
    assert(out == Seq("aligned", "ortho", "anti"))
    // top-k truncation keeps the highest scores
    val top1 = rr.rerankTopK("the query", rows, "statement", 1, "statement_id")
    assert(top1.select("statement_id").as[String].collect().toSeq ==
      Seq("aligned"))
    // identical texts tie exactly on the text-derived path; order falls
    // back to orderCol (the stable-argsort contract)
    val tie = new EmbeddingInteractionReranker(dim = 4)
      .rerankTopK("the query", rows, "statement", 3, "statement_id")
      .select("statement_id").as[String].collect().toSeq
    assert(tie == Seq("aligned", "anti", "ortho"))
  }
}
