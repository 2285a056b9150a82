package graft

import org.apache.spark.sql.functions._
import graft.llm._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("StubLLM is deterministic and prompt-dependent") {
    val llm = new StubLLM
    assert(llm.complete("alpha beta alpha") == llm.complete("alpha beta alpha"))
    assert(llm.complete("alpha beta alpha") != llm.complete("gamma delta"))
    assert(llm.complete("alpha beta alpha").startsWith("alpha"))
  }

  test("CachedLLM returns cached responses and counts hits") {
    val cached = new CachedLLM(new StubLLM)
    val a = cached.complete("the same prompt")
    val b = cached.complete("the same prompt")
    assert(a == b)
    assert(cached.hits == 1)
    cached.complete("a different prompt")
    assert(cached.hits == 1)
  }

  test("HashEmbedder matches the Column-side hashEmbedding") {
    val emb = new HashEmbedder(16).embed("doc one")
    val colSide = Seq("doc one").toDF("s")
      .select(graft.functions.VectorFunctions.hashEmbedding(col("s"), 16))
      .as[Seq[Double]].head()
    assert(emb.toSeq == colSide)
  }

  test("LLMOps.completeAll runs one client per partition over a DataFrame") {
    val df = (1 to 10).map(i => (i.toLong, s"prompt number $i")).toDF("id", "text")
      .repartition(3)
    val out = LLMOps.completeAll(df, "id", "text", () => new StubLLM)
    assert(out.count() == 10)
    val one = out.filter(col("id") === "7").select("response").as[String].head()
    assert(one == new StubLLM().complete("prompt number 7"))
  }

  test("LLMOps.embedAll produces dim-length vectors") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val out = LLMOps.embedAll(df, "id", "text", () => new HashEmbedder(8))
    val rows = out.select("embedding").as[Seq[Double]].collect()
    assert(rows.forall(_.size == 8))
  }

  test("QueryOps decomposition and keywords") {
    val llm = new StubLLM
    assert(QueryOps.decompose(llm, "who founded acme and where is it based") ==
      Seq("who founded acme", "where is it based"))
    assert(QueryOps.decompose(llm, "single question") == Seq("single question"))
    val kws = QueryOps.keywords(llm, "spark spark streaming joins")
    assert(kws.nonEmpty && kws.head == "spark")
  }

  test("GraftExtensions.registerAll exposes both functions in SQL") {
    GraftExtensions.registerAll(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("ext_v")
    assert(spark.sql("SELECT cosine_sim(a, b) FROM ext_v").as[Double].head() == 1.0)
    assert(spark.sql("SELECT minhash_sig('a b c d', 4, 3) FROM ext_v")
      .as[Seq[Long]].head().size == 4)
    assert(new GraftExtensions() != null) // class form instantiable (spark.sql.extensions)
  }
}
