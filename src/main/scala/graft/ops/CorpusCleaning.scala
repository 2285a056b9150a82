package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The two canonical published web-corpus cleaning rule sets, as pure
 * in-row column programs — no shuffle, no UDF, whole-stage codegen over
 * the scan, so both operators are strictly map-parallel at any corpus
 * size (the 100 TB shape: cleaning is a projection, never a join).
 *
 * They complement the sibling operators: [[TextAnalysis.repetitionProfile]]
 * does the n-GRAM repetition rules, [[Dedup.windowedChunkDedup]] the
 * three-sentence-span dedup, [[TextAnalysis.qualityFilter]] the
 * score-threshold gate; this file adds the LINE-level C4 pipeline and the
 * Gopher document-quality rule battery those operators don't cover.
 *
 * References: C4 (Raffel et al. 2020, "Exploring the Limits of Transfer
 * Learning...", §2.2 heuristics) and Gopher (Rae et al. 2021, "Scaling
 * Language Models...", Table A1 quality rules). The reference toolkit has
 * no cleaning stage (its readers ingest curated sources) — these belong to
 * the training-data pipeline surface this engine adds.
 */
object CorpusCleaning {

  /** C4 line-level cleaning: keep only lines that (a) end in a terminal
    * punctuation mark, (b) carry at least `minWordsPerLine` whitespace
    * words, and (c) contain no line-blocklist phrase (case-insensitive;
    * C4 drops "javascript" lines). Pages fail wholesale (`kept = false`)
    * when a page-blocklist phrase appears anywhere ("lorem ipsum", the
    * code marker "{") or fewer than `minKeptLines` lines survive — the
    * stand-in for C4's "at least 3 sentences" page rule, counted over
    * kept lines (each kept line ends in terminal punctuation, so kept
    * lines are a lower bound on sentences).
    *
    * Returns one row per input row: (id, n_lines, n_lines_kept,
    * text_clean, kept) — callers filter on `kept` and project
    * `text_clean`; emitting the drops keeps the yield auditable
    * ([[Dedup.yieldReport]] discipline). Exact integer/string logic only:
    * replays bit-for-bit in any SQL engine. */
  def c4LineClean(docs: DataFrame, textCol: String, idCol: String,
                  minWordsPerLine: Int = 5, minKeptLines: Int = 3,
                  lineBlocklist: Seq[String] = Seq("javascript"),
                  pageBlocklist: Seq[String] = Seq("lorem ipsum", "{"))
  : DataFrame = {
    require(minWordsPerLine >= 1 && minKeptLines >= 0,
      s"bad thresholds $minWordsPerLine/$minKeptLines")
    val terminal = Seq(".", "!", "?", "\"")
    val lines = split(col(textCol), "\n")
    def keep(l: Column): Column = {
      val words = size(filter(split(l, "\\s+"), w => length(w) > 0))
      val blockOk = lineBlocklist.map(b => !lower(l).contains(b.toLowerCase))
        .reduceOption(_ && _).getOrElse(lit(true))
      words >= minWordsPerLine &&
        substring(l, -1, 1).isin(terminal: _*) && blockOk
    }
    val keptLines = filter(lines, keep(_))
    val pageOk = pageBlocklist.map(p => !lower(col(textCol)).contains(p.toLowerCase))
      .reduceOption(_ && _).getOrElse(lit(true))
    docs.select(col(idCol),
      size(lines).as("n_lines"),
      size(keptLines).as("n_lines_kept"),
      concat_ws("\n", keptLines).as("text_clean"),
      (pageOk && size(keptLines) >= minKeptLines).as("kept"))
  }

  /** Gopher's stopword battery (Table A1): a document with fewer than two
    * of these is flagged as non-natural-language. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, Table A1), one row
    * per document with the measured statistics (exact integer micro-units
    * where a ratio is involved — the hash-compare discipline), one boolean
    * per rule, and the conjunction `pass`:
    *
    *  - r_word_count:   `minWords ≤ words ≤ maxWords` (50 / 100k)
    *  - r_mean_word_len: mean word length in [3, 10] chars
    *  - r_symbol_ratio: (# count + "..." count) / words ≤ 0.1
    *  - r_bullet_lines: ≤ 10% of lines start with a bullet (-, *, •)
    *  - r_ellipsis_lines: < 30% of lines end with "..."
    *  - r_alpha_words:  ≥ 80% of words contain an alphabetic character
    *  - r_stopwords:    ≥ 2 distinct [[GopherStopwords]] present
    *  - r_dup_lines:    duplicate (beyond-first) line share ≤ 30%
    *  - r_dup_line_chars: characters in beyond-first duplicate lines
    *    ≤ 20% of line characters
    *
    * All thresholds compare as cross-multiplied integers — no IEEE
    * division in any gate, so the booleans are partitioning- and
    * engine-independent. Every aggregate is a higher-order function over
    * the row's own token/line arrays: the operator never shuffles. */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val text = col(textCol)
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val wc = size(toks).cast("long")
    val totalChars = aggregate(toks, lit(0L), (a, x) => a + length(x))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, lower(_))),
      lit(stopwords.toArray))).cast("long")
    val hashCount = (length(text) - length(translate(text, "#", ""))).cast("long")
    // the length delta is an exact multiple of 3 (each removed "..." is 3
    // chars), so the double division below is exactly the integer count
    val ellipsisCount =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", "")))
        .cast("long") / 3).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => {
      val t = ltrim(l)
      t.startsWith("- ") || t.startsWith("* ") || t.startsWith("• ")
    })).cast("long")
    val ellipsisLines = size(filter(lines,
      l => rtrim(l).endsWith("..."))).cast("long")
    val nel = filter(lines, l => length(l) > 0)
    val nelN = size(nel).cast("long")
    val distinctN = size(array_distinct(nel)).cast("long")
    val lineChars = aggregate(nel, lit(0L), (a, x) => a + length(x))
    val distinctChars = aggregate(array_distinct(nel), lit(0L),
      (a, x) => a + length(x))
    val symCount = hashCount + ellipsisCount
    // exact integer floor division without expr-SQL round-trips (lambda
    // columns don't re-parse): subtract pmod so the numerator is an exact
    // multiple of den — double division of an exact multiple is exact
    def e6(num: Column, den: Column): Column = {
      val n6 = lit(1000000L) * num
      when(den > 0, ((n6 - pmod(n6, den)) / den).cast("long"))
    }
    docs.select(col(idCol),
      wc.as("word_count"), nLines.as("n_lines"),
      e6(totalChars, wc).as("mean_word_len_e6"),
      e6(symCount, wc).as("symbol_ratio_e6"),
      e6(bulletLines, nLines).as("bullet_line_e6"),
      e6(ellipsisLines, nLines).as("ellipsis_line_e6"),
      e6(alphaWords, wc).as("alpha_word_e6"),
      stopHits.as("stop_hits"),
      e6(nelN - distinctN, nelN).as("dup_line_e6"),
      e6(lineChars - distinctChars, lineChars).as("dup_line_char_e6"),
      wc.between(minWords, maxWords).as("r_word_count"),
      (totalChars >= lit(3L) * wc && totalChars <= lit(10L) * wc)
        .as("r_mean_word_len"),
      (lit(10L) * symCount <= wc).as("r_symbol_ratio"),
      (lit(10L) * bulletLines <= nLines).as("r_bullet_lines"),
      (lit(10L) * ellipsisLines < lit(3L) * nLines).as("r_ellipsis_lines"),
      (lit(10L) * alphaWords >= lit(8L) * wc).as("r_alpha_words"),
      (stopHits >= 2).as("r_stopwords"),
      (lit(10L) * (nelN - distinctN) <= lit(3L) * nelN).as("r_dup_lines"),
      (lit(5L) * (lineChars - distinctChars) <= lineChars)
        .as("r_dup_line_chars"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stopwords") && col("r_dup_lines") && col("r_dup_line_chars"))
  }
}
