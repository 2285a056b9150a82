package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text normalization / analysis as Catalyst expressions.
 *
 * searchStr/label/relationName mirror the reference's normalization trio
 * (reference: lexical-graph/src/graphrag_toolkit/lexical_graph/storage/graph/graph_utils.py:19-57,105-119).
 * The analysis functions (token counting, quality scoring, language id,
 * fingerprinting) are the training-data-pipeline operators layered on top.
 */
object TextFunctions {

  /** Normalized entity lookup key: strip punctuation, collapse whitespace,
    * lowercase (reference graph_utils.py:19-35 `search_string_from`). */
  def searchStr(c: Column): Column =
    lower(trim(regexp_replace(regexp_replace(c, "[\\p{Punct}]", " "), "\\s+", " ")))

  /** URL pattern: scheme, authority, path, optional query (fragment is
    * stripped before matching). */
  private val UrlRe = "^(?i)(https?)://([^/?#]+)([^?#]*)(?:\\?(.*))?$"
  /** Tracking params a crawler-dedup canonicalizer drops (full-key match,
    * with or without a value). */
  private val TrackingParamRe =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)(=.*)?$"

  /**
   * Crawl-URL canonicalization — the dedup key a web-corpus pipeline
   * groups on before any content hashing (the same page is crawled as
   * `HTTP://WWW.Site.com/a//b/?utm_source=x&b=2&a=1#top` and
   * `http://site.com/a/b?a=1&b=2`; URL-level dedup collapses them
   * without reading a byte of content). Normalizations, in order:
   * fragment dropped; scheme + host lowercased; leading `www.` and the
   * scheme's default port stripped; duplicate slashes collapsed and
   * trailing slashes removed from the path; tracking params
   * (`utm_*`/gclid/fbclid/msclkid/ref) dropped; surviving query params
   * sorted bytewise. Non-http(s) input passes through trimmed and
   * untouched (canonicalizing what we can't parse would corrupt the
   * key). Pure per-row column program — no UDF, no shuffle; replays
   * identically in any engine with RE2-compatible regexes.
   */
  def canonicalUrl(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#[\\s\\S]*$", "")
    val scheme = lower(regexp_extract(noFrag, UrlRe, 1))
    val hostRaw = lower(regexp_extract(noFrag, UrlRe, 2))
    val noWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(regexp_replace(noWww, ":443$", ""))
    val path = regexp_replace(
      regexp_replace(regexp_extract(noFrag, UrlRe, 3), "/{2,}", "/"),
      "/+$", "")
    val params = array_sort(filter(
      split(regexp_extract(noFrag, UrlRe, 4), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val query = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(scheme === "", t)
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** Capitalized node label (reference graph_utils.py:105-111 `label_from`). */
  def labelFrom(c: Column): Column =
    regexp_replace(initcap(searchStr(c)), "\\s+", "")

  /** UPPER_UNDERSCORE relationship name (reference graph_utils.py:113-119). */
  def relationshipName(c: Column): Column =
    upper(regexp_replace(searchStr(c), "\\s+", "_"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0)
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword estimate: words + digit runs + punctuation marks. */
  def bpeTokenEstimate(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character ratio in [0,1]. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(
        length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") /
          length(c).cast("double"))

  /** Ratio of tokens that belong to `stopwords`. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val stops = array(stopwords.map(lit): _*)
    when(length(trim(c)) === 0, 0.0)
      .otherwise(
        size(filter(toks, t => array_contains(stops, t))).cast("double") /
          size(toks).cast("double"))
  }

  /** Mean token length. */
  def meanWordLen(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    when(length(trim(c)) === 0, 0.0)
      .otherwise(
        aggregate(toks, lit(0.0), (acc, t) => acc + length(t)) /
          size(toks).cast("double"))
  }

  /**
   * Composite quality score in [0,1]: favors mid-length docs, low punctuation
   * density, and a healthy stopword ratio — the standard heuristic trio used
   * by LLM-corpus quality filters.
   */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 20.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val stopScore = least(stopwordRatio(c, stopwords) * 5.0, lit(1.0))
    (lenScore + punctScore + stopScore) / 3.0
  }

  /** Per-language stopword seeds for the n-gram/stopword language heuristic. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "you", "he", "ren", "zhe", "zhong"))

  /**
   * Stopword-vote language id: score each candidate language by its stopword
   * hit ratio, pick the argmax (ties broken by language code). Returns the
   * language code, "und" when nothing matches.
   */
  def langId(c: Column, langs: Map[String, Seq[String]] = langStopwords): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val scored = langs.toSeq.sortBy(_._1).map { case (code, stops) =>
      val stopArr = array(stops.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(stopArr, t))).cast("double").as("score"),
        lit(code).as("code"))
    }
    val best = aggregate(
      array(scored: _*),
      struct(lit(-1.0).as("score"), lit("und").as("code")),
      (acc, s) => when(s("score") > acc("score"), s).otherwise(acc))
    when(best("score") <= 0.0, "und").otherwise(best("code"))
  }

  /**
   * Document fingerprint: min-of-shingle-hashes (a 1-row minhash), stable
   * across whitespace differences. 60-bit positive value from md5.
   */
  /** PII redaction: emails → `<EMAIL>`, phone-shaped sequences → `<PHONE>`,
    * long bare digit runs → `<NUMBER>`. Pure regex columns (codegen'd, one
    * narrow pass — viable as a first scrub over raw corpora); patterns are
    * deliberately RE2-compatible so the same rules replay in any engine. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    // a phone shape needs at least one separator after the prefix digits,
    // else every long digit run would claim <PHONE> and <NUMBER> never fires
    val phone = regexp_replace(email,
      "\\+?[0-9]{1,3}[ ().\\-][0-9().\\- ]{5,}[0-9]", "<PHONE>")
    regexp_replace(phone, "\\b[0-9]{9,}\\b", "<NUMBER>")
  }

  def fingerprint(c: Column, shingle: Int = 3): Column = {
    val toks = split(searchStr(c), "\\s+")
    val n = size(toks)
    val idx = sequence(lit(0), greatest(n - shingle, lit(0)))
    val shingles = transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(shingle))))
    array_min(transform(shingles, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
  }
}
