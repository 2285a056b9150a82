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
}
