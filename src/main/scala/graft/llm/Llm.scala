package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Pluggable model-call layer (SURVEY.md §2.11): every LLM/embedding touch
 * point in the reference — proposition/topic extraction, keyword extraction,
 * query decomposition, reranking, answer generation — is an external function
 * around deterministic dataflow. The engine depends only on these traits;
 * production wires a real client, tests wire the deterministic stubs so the
 * whole DAG is hash-stable (reference: the LLMCache content-hash cache,
 * lexical_graph/utils/llm_cache.py, and the llama-index LLM seams across
 * the indexing/extract modules).
 */
trait LLM extends Serializable {
  def complete(prompt: String): String
}

trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Double]
}

/**
 * Deterministic stub LLM: responses derive only from the prompt text, so
 * extraction pipelines built on it are bit-reproducible (SURVEY.md §5's
 * "deterministic stubs" test strategy).
 */
final class StubLLM extends LLM {
  override def complete(prompt: String): String = {
    val toks = prompt.toLowerCase.split("\\W+").filter(_.nonEmpty)
    // echo the most frequent tokens — a stand-in "summary"
    toks.groupBy(identity).toSeq
      .map { case (t, g) => (t, g.length) }
      .sortBy { case (t, n) => (-n, t) }
      .take(5).map(_._1).mkString(" ")
  }
}

/** Deterministic statement-enhancement stub: echoes the prompt's statement
  * uppercased inside the `<modified_statement>` protocol tag — replayable in
  * SQL (upper), so the distributed enhancement plumbing can be oracle-gated
  * end to end. */
final class UppercaseEnhancerStub extends LLM {
  override def complete(prompt: String): String = {
    val m = "(?s)Statement: (.*?)\nContext:".r.findFirstMatchIn(prompt)
    m.map(x => s"<modified_statement>${x.group(1).toUpperCase}</modified_statement>")
      .getOrElse("no tag")
  }
}

/** Driver-side twin of graft.functions.VectorFunctions.hashEmbedding: a
  * deterministic hash-projection embedding for tests and local runs. */
final class HashEmbedder(val dim: Int) extends Embedder {
  override def embed(text: String): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      md.reset()
      val d = md.digest(s"$i#$text".getBytes("UTF-8"))
      var b = 0L
      var j = 0
      while (j < 8) { b = (b << 8) | (d(j) & 0xffL); j += 1 }
      (b >>> 4).toDouble / 1.152921504606847e18 * 2.0 - 1.0
    }.toArray
  }
}

/**
 * Content-hash response cache around any LLM (reference llm_cache.py keys
 * responses by prompt hash on the filesystem; this is the in-process
 * analogue — wrap per executor, or on the driver for the agentic loops).
 */
final class CachedLLM(underlying: LLM) extends LLM {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile var hits: Long = 0L

  private def key(prompt: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(prompt.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  override def complete(prompt: String): String = {
    val k = key(prompt)
    val cached = cache.get(k)
    if (cached != null) { hits += 1; cached }
    else {
      val v = underlying.complete(prompt)
      cache.put(k, v)
      v
    }
  }
}

/**
 * Distributed model-call plumbing: one client per partition, batched rows —
 * the Spark shape of the reference's ThreadPoolExecutor fan-outs
 * (chunk_based_search.py:163-174). `llmFactory` runs on the executor, so
 * clients (connections, caches) are created executor-side, never serialized.
 */
object LLMOps {

  private implicit val tupleEnc: Encoder[(String, String)] =
    Encoders.product[(String, String)]

  /** Complete `promptCol` for every row; returns (id, response) pairs. */
  def completeAll(df: DataFrame, idCol: String, promptCol: String,
                  llmFactory: () => LLM): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("string"), col(promptCol))
      .as[(String, String)]
      .mapPartitions { rows =>
        val llm = llmFactory() // one client per partition
        rows.map { case (id, prompt) => (id, llm.complete(prompt)) }
      }
      .toDF(idCol, "response")
  }

  /** Embed `textCol` for every row; returns (id, embedding) pairs. */
  def embedAll(df: DataFrame, idCol: String, textCol: String,
               embedderFactory: () => Embedder): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { rows =>
        val emb = embedderFactory()
        rows.map { case (id, text) => (id, emb.embed(text)) }
      }
      .toDF(idCol, "embedding")
  }
}

/**
 * Query-side LLM helpers (reference retrieval/utils/query_decomposition.py:19+
 * and keyword providers, traversal_base:219-257): both are thin prompt
 * wrappers whose outputs seed the retrieval dataflow.
 */
object QueryOps {

  /** Decompose a complex question into subqueries. The stub splits on
    * coordinating conjunctions — the LLM path sends the reference's
    * decomposition prompt. */
  def decompose(llm: LLM, query: String): Seq[String] = {
    val parts = query.split("(?i)\\s+(?:and|then|also)\\s+|;\\s*")
      .map(_.trim).filter(_.nonEmpty).toSeq
    if (parts.size <= 1) Seq(query)
    else parts
  }

  /** Extract ranked keywords from a question (stub = most frequent non-stop
    * tokens via the LLM's summary; graph keyword lookup consumes these). */
  def keywords(llm: LLM, query: String, maxKeywords: Int = 5): Seq[String] =
    llm.complete(query).split("\\s+").filter(_.nonEmpty).take(maxKeywords).toSeq
}
