package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{LexicalGraphQueryEngine, QaEvaluation}

/**
 * QA-eval loop driver main (the reference's benchmark_query.py entry):
 * build the lexical graph over a documents parquet, drive a qa.json
 * {question, answer} dataset through engine.answer with the stub LLM, and
 * write responses.jsonl + metrics_summary.json (avg/p50/p95 latency,
 * token totals, correctness counts).
 *
 * Usage: runMain graft.tools.QaEval <docsParquet> <qaJson> <outDir>
 */
object QaEval {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption
      .getOrElse("/root/testdata/sf0.001/documents.parquet")
    val qaPath = if (args.length > 1) args(1)
      else "src/test/resources/fixtures/qa_eval/qa.json"
    val outDir = if (args.length > 2) args(2) else "eval"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(docsPath)
    val tracked = new QaEvaluation.TokenTrackingLLM(new graft.llm.StubLLM)
    val engine = LexicalGraphQueryEngine.fromDocuments(
      spark, docs, "text", metadataCols = Seq("source"), llm = tracked)
    val pairs = QaEvaluation.loadQaPairs(spark, qaPath)
    val perQuery = QaEvaluation.runWithEngine(engine, tracked, pairs)
    val summary = QaEvaluation.summarize(perQuery,
      dataset = qaPath.split("/").takeRight(2).head)

    new java.io.File(outDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/responses.jsonl"),
      QaEvaluation.responsesJsonl(perQuery))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/metrics_summary.json"),
      QaEvaluation.summaryJson(summary) + "\n")
    println(s"[qaeval] ${summary.numQueries} queries, " +
      s"${summary.numCorrect} correct, " +
      s"${summary.numEmptyResponses} empty -> $outDir")
    spark.stop()
  }
}
