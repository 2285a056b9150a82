package graft

import org.apache.spark.sql.functions._
import graft.retrieve.Processors

class ProcessorsSpec extends SparkSpec {
  import spark.implicits._

  // (source_id, topic_id, statement_id, chunk_id, statement, score)
  private lazy val df = Seq(
    ("s1", "t1", "st1", "c1", "alpha one", 4.0),
    ("s1", "t1", "st2", "c1", "alpha two", 2.0),
    ("s1", "t2", "st3", "c2", "beta one", 1.0),
    ("s2", "t3", "st4", "c3", "gamma one", 3.0),
    ("s2", "t3", "st5", "c3", "gamma two", 0.1),
    ("s3", "t4", "st6", "c4", "delta one", 0.05))
    .toDF("source_id", "topic_id", "statement_id", "chunk_id", "statement", "score")

  test("truncateStatements keeps top-n per topic") {
    val out = Processors.truncateStatements(df, 1)
      .select("statement_id").as[String].collect().sorted
    assert(out.toSeq == Seq("st1", "st3", "st4", "st6"))
  }

  test("truncateResults keeps top-n sources by max score") {
    val out = Processors.truncateResults(df, 2)
      .select("source_id").distinct().as[String].collect().sorted
    assert(out.toSeq == Seq("s1", "s2"))
  }

  test("pruneStatements drops below max*factor") {
    val out = Processors.pruneStatements(df, pruningFactor = 0.5)
      .select("statement_id").as[String].collect().sorted
    assert(out.toSeq == Seq("st1", "st2", "st4")) // max=4.0, floor=2.0
  }

  test("pruneResults drops sources with low mean score") {
    val out = Processors.pruneResults(df, threshold = 1.0)
      .select("source_id").distinct().as[String].collect().sorted
    assert(out.toSeq == Seq("s1", "s2"))
  }

  test("dedupResults keeps best-scored duplicate") {
    val dup = df.union(Seq(("s9", "t9", "st1", "c9", "alpha one", 9.0))
      .toDF("source_id", "topic_id", "statement_id", "chunk_id", "statement", "score"))
    val out = Processors.dedupResults(dup)
      .filter(col("statement_id") === "st1")
      .select("source_id", "score").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("s9", 9.0)))
  }

  test("rescoreResults: source score = mean of per-topic means") {
    val out = Processors.rescoreResults(df)
      .filter(col("source_id") === "s1")
      .select("result_score").as[Double].head()
    assert(math.abs(out - 2.0) < 1e-12) // topics: mean(4,2)=3, mean(1)=1 -> 2
  }

  test("rescoreAndRank is row-identical to rescoreResults -> " +
    "truncateRankResults (same rows, columns, ranks, tie resolution)") {
    for (maxResults <- Seq(1, 2, 3, 10)) {
      val fused = Processors.rescoreAndRank(df, maxResults)
      val sequential = Processors.truncateRankResults(
        Processors.rescoreResults(df), maxResults)
      assert(fused.columns.toSeq == sequential.columns.toSeq)
      val f = fused.collect().map(_.toSeq).toSet
      val s = sequential.collect().map(_.toSeq).toSet
      assert(f == s, s"maxResults=$maxResults: $f vs $s")
    }
    // result-score tie between sources resolves by source_id both ways
    val tied = Seq(
      ("a", "t1", "x1", "c", "s", 2.0), ("b", "t2", "x2", "c", "s", 2.0),
      ("c", "t3", "x3", "c", "s", 1.0))
      .toDF("source_id", "topic_id", "statement_id", "chunk_id",
        "statement", "score")
    val f1 = Processors.rescoreAndRank(tied, 1)
      .select("source_id", "source_rank").as[(String, Int)].collect().toSeq
    assert(f1 == Seq(("a", 1)))
  }

  test("truncateByTokens respects the running budget in score order") {
    val out = Processors.truncateByTokens(df, maxTokens = 6)
      .select("statement_id").as[String].collect().sorted
    // score order st1(2 toks), st4(4), st2(6); st3 would push past 6
    assert(out.toSeq == Seq("st1", "st2", "st4"))
  }

  test("truncateByTokens two-pass prefix sum matches the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val big = (1 to 200).map(i =>
      ("s" + i % 7, "t" + i % 13, f"st$i%03d", "c1",
        Seq.fill(i % 5 + 1)("w").mkString(" "), (i * 37 % 100).toDouble))
      .toDF("source_id", "topic_id", "statement_id", "chunk_id", "statement", "score")
      .repartition(8)
    val naive = big
      .withColumn("tok_len", graft.functions.TextFunctions.tokenCount(col("statement")))
      .withColumn("run", sum("tok_len").over(
        Window.orderBy(desc("score"), col("statement_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("run") <= 150)
      .select("statement_id").as[String].collect().sorted.toSeq
    val scalable = Processors.truncateByTokens(big, 150)
      .select("statement_id").as[String].collect().sorted.toSeq
    assert(scalable == naive)
  }

  test("formatContext nests topics and statements, ordered by score") {
    val out = Processors.formatContext(df)
    val first = out.select("source_id").as[String].head()
    assert(first == "s1")
    val json = out.filter(col("source_id") === "s1")
      .select("context_json").as[String].head()
    assert(json.contains("\"topics\"") && json.contains("st1"))
  }

  test("formatContextText renders indented blocks in score order") {
    val txt = Processors.formatContextText(df)
      .filter(col("source_id") === "s1")
      .select("context_text").as[String].head()
    assert(txt.startsWith("source: s1\n  topic: t1\n    - alpha one"))
    assert(txt.contains("  topic: t2\n    - beta one"))
  }

  test("formatContextXml nests source/topic/statement tags") {
    val xml = Processors.formatContextXml(df)
      .filter(col("source_id") === "s2")
      .select("context_xml").as[String].head()
    assert(xml ==
      "<source id=\"s2\"><topic id=\"t3\"><statement>gamma one</statement>" +
        "<statement>gamma two</statement></topic></source>")
  }

  test("no broadcast hints on unbounded per-source aggregate frames") {
    // rescoreResults / pruneResults / filterByMetadata join frames whose
    // cardinality grows with the data — a forced broadcast() would OOM the
    // driver at scale, so the plans must leave the strategy to AQE
    def hints(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(!hints(Processors.rescoreResults(df)))
    assert(!hints(Processors.pruneResults(df, 1.0)))
    val sources = Seq(("s1", "x")).toDF("source_id", "seg")
    assert(!hints(Processors.filterByMetadata(df, sources,
      graft.filter.FilterAst.Pred("seg", graft.filter.FilterAst.Eq, "x"))))
    // but genuinely bounded frames DO keep the hint: truncateResults'
    // top-n id set is limit'd
    assert(Processors.truncateResults(df, 2)
      .queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  // ----- default-chain tail (traversal_based_base_retriever.py:24-46) -----

  test("removeVersioningMetadata strips only versioning keys") {
    val src = Seq(("s1", Map("title" -> "Doc",
      "__graft__versioning__valid_from__" -> "0",
      "__graft__versioning__build_timestamp__" -> "1")))
      .toDF("source_id", "metadata")
    val out = Processors.removeVersioningMetadata(src)
      .select("metadata").as[Map[String, String]].head()
    assert(out == Map("title" -> "Doc"))
  }

  test("populateStatementStrs appends sorted facts and details") {
    val facts = Seq(("st1", "b-fact"), ("st1", "a-fact"))
      .toDF("statement_id", "fact_value")
    val out = Processors.populateStatementStrs(df, facts)
      .select("statement_id", "statement_str")
      .as[(String, String)].collect().toMap
    assert(out("st1") == "alpha one (details: a-fact, b-fact)")
    assert(out("st3") == "beta one") // no facts -> bare statement
  }

  test("statementsToStrings collapses to statement_str when includeFacts") {
    val facts = Seq(("st1", "f1")).toDF("statement_id", "fact_value")
    val pop = Processors.populateStatementStrs(df, facts)
    val withFacts = Processors.statementsToStrings(pop, includeFacts = true)
    assert(withFacts.filter(col("statement_id") === "st1")
      .select("statement").as[String].head() == "alpha one (details: f1)")
    assert(!withFacts.columns.contains("statement_str"))
    val without = Processors.statementsToStrings(pop, includeFacts = false)
    assert(without.filter(col("statement_id") === "st1")
      .select("statement").as[String].head() == "alpha one")
  }

  test("updateChunkMetadata joins chunk values; clearChunks removes them") {
    val chunks = Seq(("c1", "chunk text one")).toDF("chunk_id", "text")
    val out = Processors.updateChunkMetadata(df, chunks)
    assert(out.filter(col("statement_id") === "st1")
      .select("chunk_value").as[String].head() == "chunk text one")
    assert(out.filter(col("statement_id") === "st4" &&
      col("chunk_value").isNull).count() == 1) // null for missing chunk
    val cleared = Processors.clearChunks(out)
    assert(!cleared.columns.contains("chunk_value") &&
      !cleared.columns.contains("chunk_id"))
  }

  test("clearScores nulls result score only; zeroScores zeroes both") {
    val rescored = Processors.rescoreResults(df)
    val cleared = Processors.clearScores(rescored)
    assert(cleared.filter(col("result_score").isNotNull).isEmpty)
    assert(cleared.filter(col("score").isNull).isEmpty)
    val zeroed = Processors.zeroScores(rescored)
    assert(zeroed.agg(sum("score"), sum("result_score"))
      .as[(Double, Double)].head() == ((0.0, 0.0)))
  }

  test("formatSources: longest metadata value first, rest parenthesized") {
    val src = Seq(
      ("s1", Map("a" -> "Very Long Title Value", "b" -> "short", "c" -> "mid-size")),
      ("s2", Map("a" -> "only")),
      ("s3", Map.empty[String, String]))
      .toDF("source_id", "metadata")
    val out = Processors.formatSources(src)
      .select("source_id", "source_str").as[(String, String)].collect().toMap
    assert(out("s1") == "Very Long Title Value (mid-size, short)")
    assert(out("s2") == "only")
    assert(out("s3") == "s3")
  }

  test("simplifySingleTopicResults flags single-topic sources") {
    val out = Processors.simplifySingleTopicResults(df)
      .select("source_id", "single_topic").distinct()
      .as[(String, Boolean)].collect().toMap
    assert(!out("s1")) // t1 + t2
    assert(out("s2") && out("s3"))
  }

  test("truncateRankResults ranks by result score and keeps top-n") {
    val rescored = Processors.rescoreResults(df)
    val out = Processors.truncateRankResults(rescored, 2)
    val ranks = out.select("source_id", "source_rank").distinct()
      .as[(String, Int)].collect().toMap
    // result scores: s1 -> 2.0, s2 -> 1.55, s3 -> 0.05
    assert(ranks == Map("s1" -> 1, "s2" -> 2))
  }

  test("rerankStatements: None is identity, Some applies the scorer") {
    assert(Processors.rerankStatements(df, None).collect().toSeq ==
      df.collect().toSeq)
    val doubled = Processors.rerankStatements(df,
      Some(d => d.withColumn("score", col("score") * 2)))
    assert(doubled.agg(max("score")).as[Double].head() == 8.0)
  }

  test("formatContextYaml renders block lists in score order") {
    val yaml = Processors.formatContextYaml(df)
      .filter(col("source_id") === "s1")
      .select("context_yaml").as[String].head()
    assert(yaml.startsWith("- source: s1\n  topics:\n  - topic: t1\n    statements:\n    - alpha one"))
  }

  test("enrichSourceDetails: template, key-list, and fallback accessors") {
    import graft.retrieve.PostProcessors
    val results = Seq(("s1", "x"), ("s2", "y"), ("s3", "z"))
      .toDF("source_id", "statement")
    val sources = Seq(
      ("s1", Map("title" -> "Doc One", "author" -> "Ada")),
      ("s2", Map("author" -> "Bob")))
      .toDF("source_id", "metadata")
    // $key template; unknown keys stay as-is (safe_substitute)
    val templ = PostProcessors.enrichSourceDetails(results, sources,
      m => PostProcessors.sourceInfoTemplate("$title by ${author} ($nope)", m))
      .select("source_id", "source_str").as[(String, String)].collect().toMap
    assert(templ("s1") == "Doc One by Ada ($nope)")
    assert(templ("s3") == "s3") // no metadata row -> source id fallback
    // first-present key
    val keyed = PostProcessors.enrichSourceDetails(results, sources,
      m => PostProcessors.sourceInfoKeys(Seq("title", "author"), m))
      .select("source_id", "source_str").as[(String, String)].collect().toMap
    assert(keyed("s1") == "Doc One" && keyed("s2") == "Bob")
  }

  test("rerankResults wraps the reranker seam; tokenOverlapScorer rescores") {
    import graft.retrieve.PostProcessors
    val frame = Seq(("st1", "alpha beta"), ("st2", "alpha query match"))
      .toDF("statement_id", "statement")
    val top = PostProcessors.rerankResults(frame, "query match",
      new graft.byokg.TokenOverlapReranker, topN = 1)
      .select("statement_id").as[String].collect()
    assert(top.toSeq == Seq("st2"))
    val scored = Processors.rerankStatements(frame,
      Some(Processors.tokenOverlapScorer("alpha beta")))
      .orderBy(desc("score")).select("statement_id").as[String].collect()
    assert(scored.head == "st1") // exact token match outranks partial
  }

  test("statementEnhancement keeps the original on a tag-less response") {
    import graft.retrieve.PostProcessors
    val df = Seq(("st1", "alpha", "ctx")).toDF("statement_id", "statement", "chunk_value")
    val enhanced = PostProcessors.statementEnhancement(df,
      () => new graft.llm.UppercaseEnhancerStub)
      .select("statement").as[String].head()
    assert(enhanced == "ALPHA")
    val kept = PostProcessors.statementEnhancement(df,
      () => new graft.llm.StubLLM) // never emits the protocol tag
      .select("statement").as[String].head()
    assert(kept == "alpha")
  }

  test("formatContextBedrock numbers sources and statements") {
    val sources = Seq(
      ("s1", Map("title" -> "Doc A")), ("s2", Map("title" -> "Doc B")),
      ("s3", Map("title" -> "Doc C")))
      .toDF("source_id", "metadata")
    val out = Processors.formatContextBedrock(df, sources)
      .select("source_id", "context_bedrock").as[(String, String)]
      .collect().toMap
    // s1 has the best score -> source_1
    assert(out("s1").startsWith(
      "<source_1>\n<source_1_metadata>\n\t<title>Doc A</title>\n</source_1_metadata>\n"))
    assert(out("s1").contains("<statement_1.1>alpha one</statement_1.1>"))
    assert(out("s1").endsWith("</source_1>"))
    assert(out("s2").contains("<statement_2.1>gamma one</statement_2.1>"))
  }

  test("rerankTopics keeps top topics by tfidf and propagates to unscored") {
    val df = Seq(
      // t1: matches "spark" twice; one zero-scored statement
      ("s1", "t1", "a1", "spark joins spark tables", 3.0),
      ("s1", "t1", "a2", "more rows here", 0.0),
      // t2: one "spark" match
      ("s1", "t2", "b1", "spark streams", 2.0),
      // t3: no match at all
      ("s2", "t3", "c1", "cats and dogs", 9.0))
      .toDF("source_id", "topic_id", "statement_id", "statement", "score")
    val top2 = Processors.rerankTopics(df, "spark", maxTopics = 2)
    // t3 never matches -> dropped; t1 outscores t2 (higher tf)
    assert(top2.select("topic_id").distinct().as[String].collect().toSet ==
      Set("t1", "t2"))
    val t1Score = top2.filter($"topic_id" === "t1")
      .select("topic_rr_score").as[Double].head()
    // zero-scored a2 inherits t1's topic relevance; scored rows keep theirs
    assert(top2.filter($"statement_id" === "a2")
      .select("score").as[Double].head() == t1Score)
    assert(top2.filter($"statement_id" === "a1")
      .select("score").as[Double].head() == 3.0)
    // with maxTopics = 3 the zero-relevance topic survives (scored 0.0)
    val top3 = Processors.rerankTopics(df, "spark", maxTopics = 3)
    assert(top3.filter($"topic_id" === "t3")
      .select("topic_rr_score").as[Double].head() == 0.0)
  }
}
