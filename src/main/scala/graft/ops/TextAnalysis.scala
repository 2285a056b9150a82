package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/**
 * Text analysis over a document corpus: language id, quality scoring, token
 * counting, fingerprinting. All pure Catalyst expressions — one narrow pass
 * over the corpus, no shuffle, which is what makes them viable as a first
 * filter stage over 100 TB of raw text.
 */
object TextAnalysis {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "that", "it",
      "for", "on", "with", "as", "at", "by", "this")

  /** Full per-document profile in one pass. */
  def profile(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("token_count", T.tokenCount(t))
      .withColumn("bpe_token_est", T.bpeTokenEstimate(t))
      .withColumn("punct_ratio", T.punctRatio(t))
      .withColumn("stopword_ratio", T.stopwordRatio(t, defaultStopwords))
      .withColumn("mean_word_len", T.meanWordLen(t))
      .withColumn("quality_score", T.qualityScore(t, defaultStopwords))
      .withColumn("lang_pred", T.langId(t))
      .withColumn("fingerprint", T.fingerprint(t))
  }

  /** Corpus quality filter: keep docs above a score threshold and within a
    * token-length band — the standard pre-training corpus gate. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    minScore: Double = 0.5,
                    minTokens: Int = 5,
                    maxTokens: Int = 1000000): DataFrame = {
    val t = col(textCol)
    docs.filter(
      T.qualityScore(t, defaultStopwords) >= minScore &&
        T.tokenCount(t).between(minTokens, maxTokens))
  }
}
