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

  /** The metric columns derived from one compiled [[graft.functions.TextStats]]
    * scan — bit-identical to the composed [[graft.functions.TextFunctions]]
    * forms (spec-tested), at one scan + one split per row instead of five. */
  private def derived(st: org.apache.spark.sql.Column): Map[String, org.apache.spark.sql.Column] = {
    val tokenCount = st("token_count")
    val punctRatio = when(st("char_len") === 0, 0.0)
      .otherwise(st("punct_count").cast("double") / st("char_len").cast("double"))
    val stopRatio = when(st("trimmed_empty"), 0.0)
      .otherwise(st("stop_count").cast("double") / st("token_count").cast("double"))
    val meanWordLen = when(st("trimmed_empty"), 0.0)
      .otherwise(st("word_len_sum").cast("double") / st("token_count").cast("double"))
    val lenScore = least(tokenCount.cast("double") / 20.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 4.0)
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    Map(
      "token_count" -> tokenCount,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "mean_word_len" -> meanWordLen,
      "quality_score" -> ((lenScore + punctScore + stopScore) / 3.0),
      "lang_pred" -> st("lang"))
  }

  /** Full per-document profile in one pass. */
  def profile(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextStats.register(docs.sparkSession)
    graft.functions.FingerprintHash.register(docs.sparkSession)
    val t = col(textCol)
    val d = derived(graft.functions.TextStats.stats(t))
    docs
      .withColumn("token_count", d("token_count"))
      .withColumn("bpe_token_est", T.bpeTokenEstimate(t))
      .withColumn("punct_ratio", d("punct_ratio"))
      .withColumn("stopword_ratio", d("stopword_ratio"))
      .withColumn("mean_word_len", d("mean_word_len"))
      .withColumn("quality_score", d("quality_score"))
      .withColumn("lang_pred", d("lang_pred"))
      .withColumn("fingerprint", graft.functions.FingerprintHash.fingerprint(t))
  }

  /**
   * Language-ID evaluation: the confusion matrix of the stopword-n-gram
   * heuristic's prediction against a labeled language column — the
   * quality check a pipeline runs before trusting lang routing (and the
   * template for evaluating any heuristic classifier against labels).
   * Returns (lang, lang_pred, n, label_total, share_e6); diagonal rows
   * are the per-language recall. The window runs over the |langs|²
   * COUNTS frame, so nothing beyond the profile scan is corpus-scale.
   */
  def langidConfusion(docs: DataFrame, textCol: String,
                      labelCol: String): DataFrame = {
    val counts = profile(docs, textCol)
      .groupBy(col(labelCol).as("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    counts
      .withColumn("label_total", sum(col("n")).over(w))
      .withColumn("share_e6",
        round(lit(1000000.0) * col("n") / col("label_total")).cast("long"))
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
    // set-sketch primitive): the compiled all-occurrence gram pass — one
    // tight loop per row instead of the interpreted transform/slice chain
    graft.functions.WordGrams.register(docs.sparkSession)
    val grams = graft.functions.WordGrams.grams(col(textCol), n)
    Spread.perRowHeavy(docs).select(explode(grams).as("gram"))
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
    graft.functions.TextStats.register(docs.sparkSession)
    val d = derived(graft.functions.TextStats.stats(col(textCol)))
    docs.filter(
      d("quality_score") >= minScore &&
        d("token_count").between(minTokens, maxTokens))
  }

  /** Per-document n-gram repetition metrics — the Gopher-style repetition
    * rules (fraction of duplicate n-grams, most-frequent-n-gram share) that
    * gate machine-generated or boilerplate text out of a pre-training mix.
    *
    * Emits one row per document having at least one n-gram:
    * (id, total_grams, distinct_grams, dup_gram_frac, top_gram_frac,
    * repetitive). The explode feeds a two-level aggregation whose first
    * level is map-side combined on (id, gram) — the shuffle carries one row
    * per distinct gram per document, never the raw token stream. */
  def repetitionProfile(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 2,
                        maxDupFrac: Double = 0.3,
                        maxTopFrac: Double = 0.2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    graft.functions.WordGrams.register(docs.sparkSession)
    val grams = graft.functions.WordGrams.grams(col(textCol), n)
    // Thresholds as integer micro-units so the gate is exact integer
    // arithmetic (no IEEE division in the comparison path) — engine- and
    // partitioning-independent, and replayable bit-for-bit by any SQL oracle.
    val dupE6 = math.round(maxDupFrac * 1e6)
    val topE6 = math.round(maxTopFrac * 1e6)
    docs.select(col(idCol), explode(grams).as("gram"))
      .filter(length(col("gram")) > 0)
      .groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol).agg(
        sum("cnt").as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        max("cnt").as("_top"))
      .withColumn("dup_gram_frac",
        lit(1.0) - col("distinct_grams").cast("double") / col("total_grams"))
      .withColumn("top_gram_frac",
        col("_top").cast("double") / col("total_grams"))
      // Exact BIGINT micro-unit twins of the fractions (floor division) —
      // the canonical output for hash-compared pipelines, since a rounded
      // DOUBLE can render differently across engines while the underlying
      // values are equal.
      .withColumn("dup_gram_e6",
        expr("(1000000L * (total_grams - distinct_grams)) div total_grams"))
      .withColumn("top_gram_e6", expr("(1000000L * _top) div total_grams"))
      .withColumn("repetitive",
        (col("total_grams") - col("distinct_grams")) * lit(1000000L) >
          lit(dupE6) * col("total_grams") ||
        col("_top") * lit(1000000L) > lit(topE6) * col("total_grams"))
      .drop("_top")
  }

  /** Deterministic stand-in for a fasttext-style linear quality classifier:
    * every token gets an integer pseudo-weight in [-1000, 1000] derived from
    * its md5 hash, the document score is the mean weight scaled to [-1, 1],
    * and the label is the sign. The integer sum makes the score exact under
    * any partitioning (and DuckDB-replayable); a trained model plugs in by
    * replacing the hash weight with a broadcast vocabulary lookup — the
    * Spark-side shape (one narrow in-row pass, no shuffle) is identical. */
  def hashClassifierScore(docs: DataFrame, textCol: String,
                          salt: String = "clf"): DataFrame = {
    val toks = filter(split(T.searchStr(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val raw = aggregate(toks, lit(0L), (acc, t) =>
      acc + (graft.functions.HashFunctions.h60(
        concat_ws("#", lit(salt), t)) % 2001L - 1000L))
    docs
      .withColumn("_n", size(toks))
      .withColumn("clf_score",
        when(col("_n") === 0, lit(0.0))
          .otherwise(round(raw / (lit(1000.0) * col("_n")), 6)))
      .withColumn("clf_keep", when(col("_n") === 0, lit(false))
        .otherwise(raw > 0))
      .drop("_n")
  }

  /**
   * Corpus-trained unigram language-model surprisal — the CCNet-style
   * "perplexity bucket" quality signal (Wenzek et al. 2020, CCNet): train a
   * unigram LM on the corpus itself, score each document by its mean token
   * surprisal in nats,
   *
   *   surprisal(d) = -(1/|d|) * sum over tokens t of ln(count(t) / N)
   *               =  ln(N) - (1/|d|) * sum over tokens of ln(count(t)),
   *
   * so boilerplate-heavy documents (all high-frequency tokens) score LOW and
   * lexically unusual ones score HIGH — the tails a curation pipeline trims.
   *
   * Two hash aggregates (per-doc term counts, corpus term counts — both
   * map-side combined so the shuffle carries distinct terms, not the token
   * stream) plus one join on the term key; no driver collect, no UDF. The
   * per-document sum folds (term, m·ln c) pairs in ascending-term order —
   * ONE floating-point order under any partitioning, which is what lets
   * q_unigram_surprisal carry a bit-exact DuckDB hash oracle. Documents with
   * zero tokens are absent from the output (no LM evidence), matching
   * [[repetitionProfile]]'s contract.
   */
  def unigramSurprisal(docs: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    val toks = Spread.perRowHeavy(docs).select(col(idCol).as("id"),
      explode(graft.functions.WordGrams.grams(col(textCol), 1)).as("tok"))
      .filter(length(col("tok")) > 0)
    val dt = toks.groupBy("id", "tok").agg(count(lit(1)).as("m"))
    val f = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = f.agg(sum("c").cast("double").as("n"))
    val per = dt.join(f, "tok")
      .groupBy("id").agg(
        sum("m").as("n_tokens"),
        aggregate(array_sort(collect_list(struct(col("tok"),
          (col("m").cast("double") * log(col("c").cast("double"))).as("v")))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("_s"))
    per.crossJoin(broadcast(tot))
      .select(col("id"), col("n_tokens"),
        (log(col("n")) - col("_s") / col("n_tokens").cast("double"))
          .as("surprisal"))
  }

  /**
   * Corpus-trained BIGRAM language-model surprisal with unigram
   * interpolation — the KenLM-shaped conditional-perplexity filter the
   * CCNet/LLaMA data pipelines run after the unigram pass (Wenzek et al.
   * 2020 trains a 5-gram KenLM; the bigram form is the smallest model
   * with CONTEXT, which is what separates fluent text from word salad
   * that unigram frequency alone scores well):
   *
   *   p(b | a) = lambda * c(ab)/ctx(a) + (1 - lambda) * c(b)/N
   *   surprisal(d) = -(1/(|d|-1)) * sum over bigram positions ln p
   *
   * ctx(a) = occurrences of `a` as a bigram CONTEXT (= the proper ML
   * conditional that sums to 1 — NOT the raw unigram count, which is
   * deficient on document-final tokens); the unigram back-off term keeps
   * unseen-in-context pairs finite, so no zero-prob ln(-inf) row exists
   * by construction. Documents with < 2 tokens carry n_bigrams = 0 and a
   * NULL surprisal (no conditional evidence) instead of vanishing.
   *
   * Scale shape mirrors [[unigramSurprisal]]: every count is a map-side
   * combined hash aggregate (the shuffle carries distinct bigrams, not
   * the token stream), the probability join is vocabulary-keyed, N is a
   * 1-row broadcast, and the per-document sum folds (bigram, m*ln p) in
   * ascending-bigram order — one floating-point order under any
   * partitioning, so the DuckDB oracle replays bit-exactly.
   */
  def bigramSurprisal(docs: DataFrame, textCol: String, idCol: String,
                      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"lambda must be in (0, 1) — 1 would zero unseen pairs, got $lambda")
    graft.functions.WordGrams.register(docs.sparkSession)
    val spreadDocs = Spread.perRowHeavy(docs)
    val uni = spreadDocs.select(col(idCol).as("id"),
      explode(graft.functions.WordGrams.grams(col(textCol), 1)).as("tok"))
      .filter(length(col("tok")) > 0)
    val bi = spreadDocs.select(col(idCol).as("id"),
      explode(graft.functions.WordGrams.grams(col(textCol), 2)).as("bg"))
    val dbg = bi.groupBy("id", "bg").agg(count(lit(1)).as("m"))
    val cab = bi.groupBy("bg").agg(count(lit(1)).as("c_ab"))
    // context counts derive from the bigram table itself (first token),
    // so sum_b p_ML(b|a) = 1 exactly
    val ctx = cab.withColumn("a", split(col("bg"), " ").getItem(0))
      .groupBy("a").agg(sum(col("c_ab")).as("c_ctx"))
    val cb = uni.groupBy("tok").agg(count(lit(1)).as("c_b"))
    val tot = cb.agg(sum("c_b").cast("double").as("n"))
    val terms = dbg.join(cab, "bg")
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
      .join(ctx, "a")
      .join(cb.withColumnRenamed("tok", "b"), "b")
      .crossJoin(broadcast(tot))
      .withColumn("lp", log(
        lit(lambda) * (col("c_ab").cast("double") / col("c_ctx").cast("double")) +
          (lit(1.0) - lit(lambda)) * (col("c_b").cast("double") / col("n"))))
    val per = terms.groupBy("id").agg(
      sum("m").as("n_bigrams"),
      aggregate(array_sort(collect_list(struct(col("bg"),
        (col("m").cast("double") * col("lp")).as("v")))),
        lit(0.0), (acc, s) => acc + s.getField("v")).as("_s"))
      .select(col("id"), col("n_bigrams"),
        (negate(col("_s")) / col("n_bigrams").cast("double")).as("surprisal"))
    // keep <2-token documents visible: n_bigrams = 0, surprisal NULL
    docs.select(col(idCol).as("id")).distinct()
      .join(per, Seq("id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /**
   * Exact per-group quantile profile of a numeric column — the corpus
   * length-distribution report every curation run starts from (which
   * cut-offs would a min/max-length gate imply? how skewed is each
   * source?). Uses Spark's EXACT `percentile` aggregate, not
   * percentile_approx: the exact form is a per-group sort of a numeric
   * scalar (cheap — the groups here are sources, the values one long per
   * row), interpolates identically to DuckDB's quantile_cont, and so
   * carries a full hash oracle where the t-digest sketch could not. One
   * hash aggregate; the explode after it touches |groups|·|qs| rows only.
   */
  def lengthQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                      qs: Seq[Double], approx: Boolean = false,
                      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1], got $qs")
    val qArr = typedlit(qs)
    // approx = the scale twin (same trade as [[vocabStats]]'s HLL mode):
    // percentile_approx's fixed-size sketch state merges map-side, so the
    // shuffle carries one sketch per (partition, group) instead of every
    // value — the right plan when a group's values no longer fit one
    // executor's sort buffer. Exact mode stays the oracle-gated default.
    val agg =
      if (approx) percentile_approx(col(valueCol), qArr, lit(accuracy))
      else percentile(col(valueCol), qArr)
    df.groupBy(col(groupCol))
      .agg(agg.cast("array<double>").as("_qv"))
      .select(col(groupCol), posexplode(col("_qv")).as(Seq("_i", "_v")))
      .select(col(groupCol), element_at(qArr, col("_i") + 1).as("q"),
        round(col("_v"), 6).as("qval"))
  }

  /**
   * BM25 keyword scoring (Okapi, the ranking function behind the
   * reference's OpenSearch keyword search path): per-document score
   * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
   * idf(t) = ln((N−df+0.5)/(df+0.5) + 1).
   *
   * Two passes, both cheap: ONE aggregate computes N, Σdl, and per-term
   * document frequencies (a handful of longs to the driver — query terms
   * are few), then the scoring scan is pure codegen over the token arrays
   * (per-term `size(filter(...))` term frequencies, no explode, no join)
   * feeding a TakeOrderedAndProject. Constants (idf, avgdl) embed as
   * literals computed driver-side with the exact double arithmetic the
   * oracle re-derives in SQL, and terms sum left-to-right in query order,
   * so scores replay bit-identically.
   */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    graft.functions.WordGrams.register(docs.sparkSession)
    // Spread: both the stats pass and the scoring pass re-tokenize the
    // corpus; all aggregates are exact long sums, the score is per-row
    val base = Spread.perRowHeavy(docs).select(col(idCol).as("id"),
      graft.functions.WordGrams.grams(col(textCol), 1).as("toks"))
      .withColumn("dl", size(col("toks")))
    val aggCols: Seq[org.apache.spark.sql.Column] =
      sum(col("dl").cast("long")).as("sdl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
            .as(s"df_$i")
        }
    val statRow = base.agg(count(lit(1)).as("n"), aggCols: _*).head()
    val n = statRow.getLong(0)
    require(n > 0, "empty corpus")
    val avgdl = statRow.getLong(1).toDouble / n
    val idfs = queryTerms.indices.map { i =>
      val df = statRow.getLong(2 + i)
      math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    }
    val dlD = col("dl").cast("double")
    val score = queryTerms.zip(idfs).map { case (t, idf) =>
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / lit(avgdl)))
    }.reduceLeft(_ + _)
    base.select(col("id"), score.as("bm25"))
      .filter(col("bm25") > 0.0)
      .orderBy(desc("bm25"), col("id")).limit(k)
  }

  /**
   * Exact corpus heavy hitters (n-grams with frequency ≥ n·φ) via the
   * sketch-then-verify pattern: pass 1 is ONE scalar aggregate combining
   * the total token count with a [[graft.functions.MisraGriesAgg]] sketch
   * (O(capacity) state, map-side partials — no full-vocabulary groupBy);
   * pass 2 recounts ONLY the ≤`capacity` surviving candidates exactly and
   * applies the threshold. Because the sketch provably retains every
   * token with true count > n/(capacity+1) under any partitioning/merge
   * order, the final output is the EXACT heavy-hitter set whenever
   * `capacity·φ > 1` (enforced) — deterministic and oracle-gateable even
   * though the intermediate sketch counts are not.
   *
   * φ is passed as the rational `phiNum/phiDen` so the threshold
   * `ceil(n·φ)` is computed in exact integer arithmetic on both engines.
   */
  def heavyHitters(docs: DataFrame, textCol: String, n: Int,
                   phiNum: Long, phiDen: Long, capacity: Int): DataFrame = {
    require(phiNum > 0 && phiDen > 0, "phi must be positive")
    require(capacity.toLong * phiNum > phiDen,
      s"capacity=$capacity too small for phi=$phiNum/$phiDen: the " +
        "Misra-Gries superset guarantee needs capacity > 1/phi")
    val s = docs.sparkSession
    graft.functions.WordGrams.register(s)
    import org.apache.spark.sql.GraftSqlBridge
    val base = Spread.perRowHeavy(docs).select(
      graft.functions.WordGrams.grams(col(textCol), n).as("toks"))
    val row = base.agg(
      coalesce(sum(size(col("toks")).cast("long")), lit(0L)).as("ntok"),
      GraftSqlBridge.misraGries(col("toks"), capacity).as("sketch")).head()
    val ntok = row.getLong(0)
    val thr = if (ntok == 0) 1L else (ntok * phiNum + phiDen - 1) / phiDen
    val cands = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    base.select(explode(col("toks")).as("token"))
      .filter(col("token").isin(cands: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(desc("cnt"), col("token"))
  }

  /**
   * Per-key exact heavy hitters — [[heavyHitters]] grouped by a
   * low-cardinality key (source / tenant / language: the per-slice vocab
   * mining a curation pipeline runs). ONE grouped aggregate builds an
   * independent Misra-Gries sketch per key (the superset guarantee holds
   * per group — each group's n bounds its own undercount), candidates
   * come back bounded by keys × capacity, and the exact recount joins the
   * broadcast candidate frame. `maxKeys` enforces the low-cardinality
   * contract — a high-cardinality key would make the driver-side
   * candidate set keys×capacity large (use plain per-key groupBy counts
   * there instead; the sketch buys nothing once keys shard the space).
   */
  def heavyHittersByKey(docs: DataFrame, textCol: String, keyCol: String,
                        n: Int, phiNum: Long, phiDen: Long, capacity: Int,
                        maxKeys: Int = 1000): DataFrame = {
    require(phiNum > 0 && phiDen > 0, "phi must be positive")
    require(capacity.toLong * phiNum > phiDen,
      s"capacity=$capacity too small for phi=$phiNum/$phiDen: the " +
        "Misra-Gries superset guarantee needs capacity > 1/phi")
    val s = docs.sparkSession
    graft.functions.WordGrams.register(s)
    import org.apache.spark.sql.GraftSqlBridge
    // key rides as STRING (numeric tenant ids render deterministically) so
    // the driver-side candidate frame round-trips any key type; NULL keys
    // are excluded explicitly — an equi-join could never match them, and
    // dropping them silently would misread as "no heavy hitters there"
    val base = Spread.perRowHeavy(docs.filter(col(keyCol).isNotNull))
      .select(col(keyCol).cast("string").as("k"),
        graft.functions.WordGrams.grams(col(textCol), n).as("toks"))
    val perKey = base.groupBy(col("k")).agg(
      coalesce(sum(size(col("toks")).cast("long")), lit(0L)).as("ntok"),
      GraftSqlBridge.misraGries(col("toks"), capacity).as("sketch"))
      .collect()
    require(perKey.length <= maxKeys,
      s"heavyHittersByKey saw ${perKey.length} keys, over maxKeys=" +
        s"$maxKeys — the candidate set is keys x capacity driver rows; " +
        "use a plain grouped count for high-cardinality keys")
    val cands = perKey.toIndexedSeq.flatMap { r =>
      val ntok = r.getLong(1)
      val thr = if (ntok == 0) 1L else (ntok * phiNum + phiDen - 1) / phiDen
      r.getSeq[org.apache.spark.sql.Row](2).map(e =>
        (r.getString(0), e.getString(0), thr))
    }
    import s.implicits._
    val candFrame = cands.toDF("k", "token", "thr")
    base.select(col("k"), explode(col("toks")).as("token"))
      .join(broadcast(candFrame), Seq("k", "token"))
      .groupBy(col("k"), col("token"), col("thr"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= col("thr"))
      .select(col("k"), col("token"), col("cnt"))
      .orderBy(col("k"), desc("cnt"), col("token"))
  }

  /**
   * Multi-axis corpus report in ONE aggregation pass: ROLLUP over
   * (source, predicted language) — per-(source, lang) detail rows, per-
   * source subtotals, and the grand total evaluate in a single shuffle
   * (Spark expands grouping sets map-side) instead of one aggregation job
   * per axis. Quality aggregates in integer micro-units
   * (`floor(q·10⁶ + 0.5)` per doc, summed exactly as longs, one division
   * at the end) so the mean is partition-order-independent and the query
   * carries a full hash oracle — a double `avg` would drift with the fold
   * order on both engines.
   */
  def corpusRollup(docs: DataFrame, textCol: String,
                   sourceCol: String): DataFrame = {
    val p = profile(docs, textCol)
      .select(col(sourceCol).as("source"), col("lang_pred"),
        col("token_count"),
        floor(col("quality_score") * 1e6 + 0.5).cast("long").as("qmicro"))
    p.rollup(col("source"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_count").cast("long")).as("n_tokens"),
        round(sum(col("qmicro")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_quality"),
        grouping_id().cast("int").as("gid"))
  }

  /**
   * Document-level co-occurrence + PMI over the top-`vocabSize` vocabulary:
   * for every vocab token pair (a < b), the number of docs containing both
   * (df_ab) plus each side's doc frequency and the pointwise mutual
   * information ln(n·df_ab / (df_a·df_b)) — the corpus-association pass
   * behind collocation mining and embedding-evaluation probes.
   *
   * Scale shape: doc frequencies are one map-side-combinable aggregate;
   * the vocabulary is top-K (tiny — broadcast); the quadratic step is the
   * per-doc pair self-join RESTRICTED to vocab tokens, so fan-out is
   * ≤ C(K,2) per doc regardless of document length — the vocab cap is the
   * lever, exactly like the projection's hub cap. Counts are exact
   * integers; PMI is one ln over a rational of exact ints, 6dp.
   */
  def cooccurrenceStats(docs: DataFrame, textCol: String, idCol: String,
                        vocabSize: Int = 20): DataFrame = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    val dt = Spread.perRowHeavy(docs).select(col(idCol).as("id"),
        explode(array_distinct(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => length(t) > 0))).as("tok"))
    val vocab = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("tok")).limit(vocabSize)
    val dv = dt.join(broadcast(vocab), Seq("tok"))
    val nDocs = dt.select(col("id")).distinct()
      .agg(count(lit(1)).as("_n"))
    dv.as("x").join(dv.as("y"),
        col("x.id") === col("y.id") && col("x.tok") < col("y.tok"))
      .groupBy(col("x.tok").as("tok_a"), col("y.tok").as("tok_b"))
      .agg(count(lit(1)).as("df_ab"))
      .join(broadcast(vocab.select(col("tok").as("tok_a"),
        col("df").as("df_a"))), Seq("tok_a"))
      .join(broadcast(vocab.select(col("tok").as("tok_b"),
        col("df").as("df_b"))), Seq("tok_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"),
        col("df_ab"),
        round(log(col("_n").cast("double") * col("df_ab").cast("double") /
          (col("df_a").cast("double") * col("df_b").cast("double"))), 6)
          .as("pmi"))
  }

  /**
   * Per-group corpus vocabulary statistics: document count, token count,
   * distinct-token count. `approx = false` uses Spark's exact
   * count(DISTINCT) (two-phase expand — carries a full hash oracle);
   * `approx = true` swaps in the HyperLogLog++ sketch
   * (`approx_count_distinct`, relative error `rsd`) — the 100 TB path,
   * where the distinct count per group is a fixed-size sketch merged
   * map-side instead of a shuffle of every distinct token. Same schema
   * either way, so pipelines flip the flag by scale.
   */
  /**
   * Corpus-health statistics per group: unigram-distribution entropy and
   * the Zipf rank-frequency slope — the two "does this source look like
   * natural language" diagnostics (entropy collapses on template floods,
   * a healthy Zipf slope sits near −1; crawler traps and machine-generated
   * text bend it). Returns per group
   * (group, n_tokens, vocab, entropy_micro, zipf_slope_micro).
   *
   * Determinism discipline (the PageRank/micro-unit rule): every
   * order-dependent double sum is replaced by a sum of per-row INTEGER
   * micro-units — entropy's Σc·ln(c) folds as Σ round(1e6·c·ln c) (exact
   * longs commute), and the Zipf least-squares terms x=ln(rank),
   * y=ln(count) quantize to e6 before Σx, Σy, Σxy, Σx² (products of two
   * e6-longs stay < 2⁶³ for topN ≤ ~1000). The final entropy
   * H = ln(N) − Σc·ln(c)/N and slope
   * (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) are then single fixed-order IEEE
   * expressions over exact integers — bit-identical in SQL. Slope is NULL
   * when a group has < 2 ranked terms (degenerate denominator).
   *
   * Scale shape: one (group, token) count aggregate (map-side combined),
   * one TopKAgg heap for the top-`topN` ranks (no corpus-wide window
   * sort), two small per-group aggregates — nothing after the first
   * shuffle scales with the corpus.
   *
   * Integer-overflow bounds of the deterministic mode (the vocabStats/
   * pageRank two-mode contract): the entropy micro-sum Σ round(1e6·c·ln c)
   * stays inside a long only while a group has ≲ 10¹⁰ tokens, and the
   * slope cross-terms bound topN at ~200 under worst-case counts. Past
   * either bound, profile with `deterministic = false`: plain double
   * sums — partition-order-dependent in the last ulps, which a health
   * metric tolerates and an exact-hash oracle does not.
   */
  def zipfEntropy(docs: DataFrame, textCol: String, groupCol: String,
                  topN: Int = 100, deterministic: Boolean = true): DataFrame = {
    require(topN >= 2 && topN <= (if (deterministic) 200 else 100000),
      s"topN $topN out of range for deterministic=$deterministic " +
        "(micro-unit cross-terms overflow past ~200; use " +
        "deterministic = false for wider fits)")
    graft.functions.WordGrams.register(docs.sparkSession)
    val counts = Spread.perRowHeavy(docs).select(col(groupCol).as("grp"),
        explode(graft.functions.WordGrams.grams(col(textCol), 1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
    val cD = col("c").cast("double")
    val ranked = graft.functions.TopKAgg.topKPerKeyRanked(counts,
      Seq("grp"), Seq(negate(col("c")), col("tok")), topN, "rank")
    if (deterministic) {
      val ent = counts.groupBy(col("grp")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(round(lit(1000000.0) * cD * log(cD)).cast("long")).as("_s_e6"))
      val terms = ranked.select(col("grp"),
        round(lit(1000000.0) * log(col("rank").cast("double")))
          .cast("long").as("x"),
        round(lit(1000000.0) * log(col("c").cast("double")))
          .cast("long").as("y"))
      val z = terms.groupBy(col("grp")).agg(
        count(lit(1)).as("_n"), sum(col("x")).as("_sx"),
        sum(col("y")).as("_sy"), sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      val den = col("_n") * col("_sxx") - col("_sx") * col("_sx")
      val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
      ent.join(z, Seq("grp"))
        .select(col("grp").as(groupCol), col("n_tokens"), col("vocab"),
          round(lit(1000000.0) * log(col("n_tokens").cast("double"))
            - col("_s_e6").cast("double") / col("n_tokens").cast("double"))
            .cast("long").as("entropy_micro"),
          when(den =!= 0,
            round(lit(1000000.0) * num.cast("double") / den.cast("double"))
              .cast("long")).as("zipf_slope_micro"))
    } else {
      // scale path: plain double folds — no overflow cliff, same outputs
      // to the micro unit up to summation-order ulps
      val ent = counts.groupBy(col("grp")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(cD * log(cD)).as("_s"))
      val terms = ranked.select(col("grp"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      val z = terms.groupBy(col("grp")).agg(
        count(lit(1)).cast("double").as("_n"), sum(col("x")).as("_sx"),
        sum(col("y")).as("_sy"), sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      val den = col("_n") * col("_sxx") - col("_sx") * col("_sx")
      val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
      ent.join(z, Seq("grp"))
        .select(col("grp").as(groupCol), col("n_tokens"), col("vocab"),
          round(lit(1000000.0) * (log(col("n_tokens").cast("double"))
            - col("_s") / col("n_tokens").cast("double")))
            .cast("long").as("entropy_micro"),
          when(abs(den) > 1e-12,
            round(lit(1000000.0) * num / den).cast("long"))
            .as("zipf_slope_micro"))
    }
  }

  def vocabStats(docs: DataFrame, textCol: String, groupCol: String,
                 approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    graft.functions.WordGrams.register(docs.sparkSession)
    val toks = Spread.perRowHeavy(docs).select(col(groupCol).as("grp"),
      explode(graft.functions.WordGrams.grams(col(textCol), 1)).as("tok"))
      .filter(length(col("tok")) > 0)
    val distinctAgg =
      if (approx) approx_count_distinct(col("tok"), rsd)
      else countDistinct(col("tok"))
    val tokAgg = toks.groupBy("grp").agg(count(lit(1)).as("n_tokens"),
      distinctAgg.as("distinct_tokens"))
    docs.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n_docs"))
      .join(tokAgg, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("distinct_tokens"), lit(0L)).as("distinct_tokens"))
  }

  /**
   * BPE merge-rule training: `rounds` greedy rounds of the classic
   * byte-pair-encoding algorithm (Sennrich et al. 2016) over the corpus
   * word vocabulary — the step that turns "BPE-ish token ESTIMATES"
   * ([[graft.functions.TextFunctions.bpeTokenEstimate]]) into actually
   * LEARNED subword merges. Words are lowercase ASCII-alpha runs (so
   * char-splitting replays identically in SQL); each word becomes a
   * space-separated symbol string, and each round (a) counts adjacent
   * symbol pairs weighted by word frequency — one explode + one map-side-
   * combined hash aggregate over the VOCABULARY (distinct words), never the
   * corpus, (b) picks the most frequent pair (ties to the lexicographically
   * smallest — a total order, so the training is deterministic), and (c)
   * rewrites the vocabulary with one literal `replace` of the space-padded
   * pair — left-to-right non-overlapping, which matches BPE's greedy-left
   * merge except on runs of a repeated pair ("y y y y"), where the shared
   * boundary space makes the padded scan skip every other occurrence until
   * a later round. That deviation is deterministic and engine-independent:
   * SQL `replace` scans identically, which is what lets q_bpe_merges carry
   * a full hash oracle with every round unrolled. Only the single winning pair
   * crosses to the driver per round; the vocabulary stays distributed and
   * is lazily checkpointed each round so round r never recomputes rounds
   * 1..r−1. Returns (round, pair, merged, cnt).
   */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    var vocab = words.select(
      concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")).as("s"),
      col("wc")).localCheckpoint(false)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val a = split(trim(col("s")), " ")
      val winner = vocab
        .filter(size(a) >= 2) // sequence(0, -1) would run DESCENDING
        .select(col("wc"), explode(transform(sequence(lit(0), size(a) - 2),
          i => concat_ws(" ", element_at(a, i + 1), element_at(a, i + 2))))
          .as("p"))
        .groupBy("p").agg(sum(col("wc")).as("cnt"))
        .orderBy(desc("cnt"), col("p")).limit(1)
        .collect()
      require(winner.nonEmpty, s"vocabulary exhausted before round $r")
      val (pair, cnt) = (winner(0).getString(0), winner(0).getLong(1))
      val merged = pair.replace(" ", "")
      merges += ((r, pair, merged, cnt))
      vocab = vocab.select(
        replace(col("s"), lit(s" $pair "), lit(s" $merged ")).as("s"),
        col("wc")).localCheckpoint(false)
    }
    import spark.implicits._
    merges.result().toDF("round", "pair", "merged", "cnt")
  }

  /**
   * BPE ENCODING under a trained merge-rule list — the apply side of
   * [[bpeMerges]]: how many tokens does each document cost under the
   * learned vocabulary (the number a sequence-packing / token-budget stage
   * actually needs). Each distinct WORD is encoded once — char-split into
   * the padded " h e l l o " form, then every rule applied in training
   * order via the same literal `replace` scan the trainer used (identical
   * left-to-right semantics, so training and encoding can never disagree
   * on a merge's effect) — and per-document counts come from an integer
   * m·tokens(w) join-aggregate. The heavy string work runs over the
   * distinct-word vocabulary, not the token stream; everything is codegen
   * string/array functions; all outputs are exact integers (no float folds
   * to align in the oracle).
   */
  def bpeEncode(docs: DataFrame, textCol: String, idCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "need at least one merge rule (train bpeMerges)")
    val wpd = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("id", "w").agg(count(lit(1)).as("m"))
    var enc = wpd.select("w").distinct()
      .select(col("w"),
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")).as("s"))
    for ((pair, merged) <- merges)
      enc = enc.select(col("w"),
        replace(col("s"), lit(s" $pair "), lit(s" $merged ")).as("s"))
    val tc = enc.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("tc"))
    wpd.join(tc, "w").groupBy("id")
      .agg(sum(col("m")).as("n_words"),
        sum(col("m") * col("tc")).as("n_bpe_tokens"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
   * group (language, source) into head / middle / tail thirds by the
   * corpus-LM surprisal from [[unigramSurprisal]] — the standard "keep the
   * head, inspect the middle, drop the tail" curation gate. Cutoffs are
   * the exact per-group terciles (Spark's exact `percentile`, whose
   * interpolation matches DuckDB quantile_cont — the [[lengthQuantiles]]
   * parity), computed over the UNROUNDED surprisal so the bucket decision
   * replays bit-exactly. The cutoff frame is |groups| rows — broadcast;
   * everything else rides the surprisal aggregates.
   */
  def surprisalBuckets(docs: DataFrame, textCol: String, idCol: String,
                       groupCol: String): DataFrame = {
    val qs = Seq(1.0 / 3, 2.0 / 3)
    val s = unigramSurprisal(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("id"), col(groupCol).as("grp")), "id")
    val cuts = s.groupBy("grp")
      .agg(percentile(col("surprisal"), typedlit(qs)).as("_c"))
      .select(col("grp"), element_at(col("_c"), 1).as("_c1"),
        element_at(col("_c"), 2).as("_c2"))
    s.join(broadcast(cuts), "grp")
      .select(col("id"), col("grp"), col("n_tokens"), col("surprisal"),
        when(col("surprisal") <= col("_c1"), lit("head"))
          .when(col("surprisal") <= col("_c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /**
   * DSIR-style hashed n-gram importance weights (Xie et al. 2023, "Data
   * Selection for Language Models via Importance Resampling"): score every
   * document by how much more likely its features are under a TARGET
   * distribution (the quality corpus rows matching `targetPred`) than
   * under the RAW corpus —
   *
   *   w(d) = Σ_b m_db · ( ln p̂_T[b] − ln p̂_R[b] ),
   *   p̂[b] = (count[b] + 1) / (N + B)          (add-one smoothing),
   *
   * with features = uni- and bigrams hashed into B buckets by the md5-based
   * [[graft.functions.HashFunctions.h60]] (engine-portable, so the oracle
   * recomputes the same buckets). High-w documents look like the target;
   * resampling by exp(w) (see [[Sampling.weightedSample]]) is the DSIR
   * selection step.
   *
   * Scale shape: one gram scan feeds three hash aggregates (per-doc bucket
   * counts; target and raw bucket counts — B rows each); the B-row ratio
   * table broadcasts into the per-doc join. The per-document sum folds
   * (bucket, m·lr) pairs in ascending-bucket order — one float order under
   * any partitioning, the [[unigramSurprisal]] discipline that lets the
   * oracle hash-match.
   */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
                  targetPred: org.apache.spark.sql.Column,
                  buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = docs.sparkSession
    graft.functions.WordGrams.register(spark)
    import graft.functions.{HashFunctions => H}
    val base = Spread.perRowHeavy(docs)
      .select(col(idCol).as("id"), targetPred.as("is_t"),
        col(textCol).as("_t"))
    val feats = base.select(col("id"), col("is_t"),
      explode(flatten(array(
        graft.functions.WordGrams.grams(col("_t"), 1),
        graft.functions.WordGrams.grams(col("_t"), 2)))).as("g"))
      .filter(length(col("g")) > 0)
      .select(col("id"), col("is_t"),
        pmod(H.h60(col("g")), lit(buckets.toLong)).as("b"))
    val db = feats.groupBy("id", "b").agg(count(lit(1)).as("m"))
    val perB = feats.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val tot = perB.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val ratio = spark.range(buckets).select(col("id").as("b"))
      .join(perB, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
          (col("nt").cast("double") + lit(buckets.toDouble))) -
          log((coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0)) /
            (col("nr").cast("double") + lit(buckets.toDouble)))).as("lr"))
    db.join(broadcast(ratio), "b")
      .groupBy("id").agg(
        sum("m").as("n_feats"),
        aggregate(array_sort(collect_list(struct(col("b"),
          (col("m").cast("double") * col("lr")).as("v")))),
          lit(0.0), (acc, s) => acc + s.getField("v")).as("log_weight"))
  }
}
