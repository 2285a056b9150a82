package graft

import graft.pipeline.{LexicalGraphQueryEngine, QaEvaluation}
import graft.pipeline.QaEvaluation.{QaPair, TokenTrackingLLM}
import graft.llm.StubLLM

/**
 * QA-eval loop driver (reference benchmark_query.py:29-106 +
 * metrics_summary.py:43-137): the deterministic parts of the metrics table
 * — counts, token totals, correctness, percentile math, JSON shapes — are
 * asserted exactly; wall-clock values only structurally (> 0, p50 <= p95).
 */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark streams batch the join window", "src0"),
    (1L, "merge sort join the window table scan", "src1"),
    (2L, "the batch join filter window merge", "src2"))
    .toDF("doc_id", "text", "source")

  private lazy val pairs = Seq(
    QaPair("what happens to the window", "window"),
    QaPair("which join runs", "join"),
    QaPair("is there a unicorn", "unicorn-gold-never-matches"))

  test("run drives qa pairs through engine.answer; per-query rows carry " +
    "latency, token, and correctness fields") {
    val tracked = new TokenTrackingLLM(new StubLLM)
    val engine = LexicalGraphQueryEngine.fromDocuments(
      spark, docs, "text", metadataCols = Seq("source"), llm = tracked)
    val perQuery = QaEvaluation.runWithEngine(engine, tracked, pairs)
    assert(perQuery.size == 3)
    perQuery.foreach { pq =>
      assert(pq.totalMs > 0 && pq.retrievalMs > 0)
      assert(pq.totalMs >= pq.retrievalMs)
      // stub responses are the top-5 prompt tokens — never empty here
      assert(pq.response.nonEmpty)
      // every prompt carries the question + context: input tokens dominate
      assert(pq.inputTokens > pq.outputTokens)
      assert(pq.retrievalContextTokens > 0)
      assert(pq.retrievalContextTokens < pq.inputTokens)
    }
    // the unicorn gold can never appear in a top-5-token stub response
    assert(!perQuery.last.correct)
    // determinism of everything non-clock: same corpus + question => same
    // response, tokens, and verdicts on a second run
    val tracked2 = new TokenTrackingLLM(new StubLLM)
    val engine2 = new LexicalGraphQueryEngine(engine.graph, spark, tracked2)
    val again = QaEvaluation.runWithEngine(engine2, tracked2, pairs)
    assert(again.map(_.response) == perQuery.map(_.response))
    assert(again.map(_.inputTokens) == perQuery.map(_.inputTokens))
    assert(again.map(_.correct) == perQuery.map(_.correct))

    val s = QaEvaluation.summarize(perQuery, dataset = "spec")
    assert(s.numQueries == 3 && s.numEmptyResponses == 0)
    assert(s.numCorrect == perQuery.count(_.correct))
    assert(s.totalInputTokens == perQuery.map(_.inputTokens).sum)
    assert(s.totalRetrievalContextTokens ==
      perQuery.map(_.retrievalContextTokens).sum)
    assert(s.avgInputTokensPerQuery ==
      math.round(s.totalInputTokens * 100.0 / 3) / 100.0)
    s.latency.values.foreach { l =>
      assert(l.p50 <= l.p95 && l.avg > 0)
    }
    // JSON payloads carry the reference's keys
    val js = QaEvaluation.summaryJson(s)
    Seq("\"num_queries\": 3", "\"latency\"", "\"retrieval_ms\"",
      "\"total_input_tokens\"", "\"p95\"").foreach(k =>
      assert(js.contains(k), s"missing $k in:\n$js"))
    val lines = QaEvaluation.responsesJsonl(perQuery).trim.split("\n")
    assert(lines.length == 3 &&
      lines.forall(_.startsWith("{\"raw_example\"")))
  }

  test("percentile matches the reference's exclusive linear interpolation " +
    "(metrics_summary.py:63-79)") {
    import QaEvaluation.percentile
    assert(percentile(Seq(1.0, 2.0, 3.0, 4.0), 50) == 2.5)
    assert(math.abs(percentile(Seq(1.0, 2.0, 3.0, 4.0), 95) - 3.85) < 1e-9)
    assert(percentile(Seq(5.0), 95) == 5.0)
    assert(percentile(Seq.empty, 50) == 0.0)
    assert(percentile(Seq(3.0, 1.0, 2.0), 100) == 3.0) // sorts internally
    assert(percentile(Seq(1.0, 2.0), 50) == 1.5)
  }

  test("containment judge normalizes case and whitespace; empty gold " +
    "never passes") {
    import QaEvaluation.containmentJudge
    assert(containmentJudge("The  Answer IS Berlin", "answer is berlin"))
    assert(!containmentJudge("no match here", "berlin"))
    assert(!containmentJudge("anything", "  "))
  }

  test("IDK detection: phrase heuristic, LLM-judged variant, and the " +
    "correctness-on-answerable summary metric") {
    import QaEvaluation._
    assert(phraseIdkDetector("I don't know the answer to that."))
    assert(phraseIdkDetector("There is NOT ENOUGH INFORMATION here."))
    assert(!phraseIdkDetector("The answer is Berlin."))
    assert(llmIdkDetector(new ScriptedLLM(Seq("Unanswerable")))("x"))
    assert(!llmIdkDetector(new ScriptedLLM(Seq("Answerable")))("x"))
    // summary math: 3 queries — 1 unanswerable, 1 of the 2 answerable
    // correct → correctness_on_answerable = 0.5
    def pq(correct: Boolean, answerable: Boolean) =
      PerQuery("q", "g", "r", 1, 1, 1, 3, 10, 2, 5, 1,
        correct = correct, answerable = answerable)
    val s = summarize(Seq(pq(true, true), pq(false, true),
      pq(false, false)), dataset = "idk")
    assert(s.numUnanswerable == 1)
    assert(s.correctOnAnswerable.contains(0.5))
    assert(summaryJson(s).contains("\"correctness_on_answerable\": 0.5"))
    // all-unanswerable → metric is null, never a division by zero
    val s2 = summarize(Seq(pq(false, false)), dataset = "idk")
    assert(s2.correctOnAnswerable.isEmpty)
    assert(summaryJson(s2).contains("\"correctness_on_answerable\": null"))
  }

  test("classifyHop mirrors the reference's keyword heuristics " +
    "(hop_classifier.py fallback path)") {
    import QaEvaluation.classifyHop
    assert(classifyHop("What is the capital of France") == "single-hop")
    assert(classifyHop("who was the first person on the moon?") ==
      "single-hop")
    // multi-hop markers beat single-hop openers
    assert(classifyHop(
      "What is the city where Alice was born and the company she " +
        "founded and sold") == "multi-hop")
    assert(classifyHop("Which teams won both cups") == "multi-hop")
    assert(classifyHop("Who ruled before the revolution") == "multi-hop")
    assert(classifyHop("Revenue compared to last year?") == "multi-hop")
    assert(classifyHop("How many products that shipped late") ==
      "multi-hop")
    // inconclusive → unknown
    assert(classifyHop("Tell me about the merger") == "unknown")
    assert(classifyHop("   ") == "unknown")
  }

  test("llmJudge parses the grader's first token as the verdict " +
    "(the reference's LLM grading seam, run_evaluation.py)") {
    import QaEvaluation.llmJudge
    val yes = llmJudge(new ScriptedLLM(Seq("YES — the response matches")))
    assert(yes("anything", "gold"))
    val no = llmJudge(new ScriptedLLM(Seq("NO. The answer is missing.")))
    assert(!no("anything", "gold"))
    // garbage verdicts grade as incorrect, never as a crash
    val junk = llmJudge(new ScriptedLLM(Seq("maybe? YES later in text")))
    assert(!junk("anything", "gold"))
    // the judge prompt carries both the gold answer and the response
    var seen = ""
    val probe = new graft.llm.LLM {
      override def complete(p: String): String = { seen = p; "NO" }
    }
    llmJudge(probe)("the response text", "the gold text")
    assert(seen.contains("the response text") &&
      seen.contains("the gold text"))
  }

  test("token tracking counts whitespace tokens per call; loadQaPairs " +
    "reads the qa.json array shape") {
    val t = new TokenTrackingLLM(new StubLLM)
    t.complete("one two  three")
    assert(t.totalInputTokens == 3L)
    assert(t.totalOutputTokens == QaEvaluation.tokens(
      new StubLLM().complete("one two  three")))
    assert(QaEvaluation.tokens("") == 0L && QaEvaluation.tokens("  ") == 0L)
    val pairs = QaEvaluation.loadQaPairs(spark,
      "src/test/resources/fixtures/qa_eval/qa.json")
    assert(pairs.size == 5)
    assert(pairs.head.question.nonEmpty && pairs.head.answer.nonEmpty)
  }
}
