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

  /** Corpus n-gram frequency table: normalized tokens (n=1) or word
    * shingles (n>1), counted corpus-wide, top `k` with a deterministic
    * rank. The vocabulary-statistics pass of tokenizer training — one
    * explode + one map-side-combined aggregation, top-k via
    * TakeOrderedAndProject, so the only full shuffle is the count. */
  def ngramFrequencies(docs: DataFrame, textCol: String,
                       n: Int = 1, k: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    // every occurrence counts, so no shingle dedup (WordShingles is a
    // set-sketch primitive): raw sliding windows over the token array
    val toks = split(T.searchStr(col(textCol)), "\\s+")
    val grams =
      if (n == 1) toks
      else when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    docs.select(explode(grams).as("gram"))
      .filter(length(col("gram")) > 0)
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("gram"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("freq"), col("gram"))))
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
