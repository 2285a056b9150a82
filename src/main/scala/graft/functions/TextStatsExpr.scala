package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text statistics for the corpus quality/profile operators.
 *
 * [[graft.ops.TextAnalysis.profile]] needs token count, punctuation density,
 * stopword ratio, mean word length, and a stopword-vote language id — five
 * metrics whose composed Column forms each re-split and re-scan the document
 * (interpreted higher-order functions), which measured ~3 s for 5k docs at
 * sf0.1. This expression computes the underlying counts in one scan + one
 * split per row; the ratios are then cheap arithmetic on the struct fields,
 * reproducing the composed forms' values bit-for-bit:
 *
 *  - `trimmed_empty`  — `length(trim(c)) = 0` (Spark trim: spaces only)
 *  - `token_count`    — `size(split(trim(c), "\\s+"))`, 0 when trimmed empty
 *                       (Java split semantics with limit -1, like Spark)
 *  - `char_len`       — `length(c)` in code points
 *  - `punct_count`    — code points matching Java `\p{Punct}` (ASCII set)
 *  - `word_len_sum`   — sum of token code-point lengths
 *  - `stop_count`     — tokens whose UTF8String-lowercase is in `stopwords`
 *  - `lang`           — argmax of per-language stopword hits over `langs`
 *                       (codes in sorted order, strict >, "und" when 0 hits)
 */
case class TextStats(child: Expression, stopwords: Seq[String],
                     langs: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires STRING input, got ${dt.sql}")
  }

  override def dataType: DataType = TextStats.Schema

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  @transient private lazy val langTable: Array[(String, java.util.HashSet[String])] =
    langs.sortBy(_._1).map { case (code, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      (code, s)
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopSet, langTable)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  val FnName = "text_stats"

  val Schema: StructType = StructType(Seq(
    StructField("trimmed_empty", BooleanType, nullable = false),
    StructField("token_count", IntegerType, nullable = false),
    StructField("char_len", IntegerType, nullable = false),
    StructField("punct_count", IntegerType, nullable = false),
    StructField("word_len_sum", LongType, nullable = false),
    StructField("stop_count", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private val WsRe = Pattern.compile("\\s+")

  private def isAsciiPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  /** Spark `trim`: strip ' ' (0x20) only, not general whitespace. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  def compute(text: UTF8String,
              stopSet: java.util.HashSet[String],
              langTable: Array[(String, java.util.HashSet[String])]): InternalRow = {
    val raw = text.toString
    // one scan of the original string: code-point length + punct count
    var charLen = 0
    var punct = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      charLen += 1
      if (isAsciiPunct(cp)) punct += 1
      i += Character.charCount(cp)
    }
    val trimmed = trimSpaces(raw)
    if (trimmed.isEmpty)
      return InternalRow(true, 0, charLen, punct, 0L, 0,
        UTF8String.fromString("und"))
    // one split, shared by every token-derived metric
    val toks = WsRe.split(trimmed, -1)
    var wordLenSum = 0L
    var stops = 0
    val langHits = new Array[Int](langTable.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      wordLenSum += tok.codePointCount(0, tok.length)
      // stopword + language membership test Spark's lower(): UTF8String case
      val lowered = UTF8String.fromString(tok).toLowerCase.toString
      if (stopSet.contains(lowered)) stops += 1
      var l = 0
      while (l < langTable.length) {
        if (langTable(l)._2.contains(lowered)) langHits(l) += 1
        l += 1
      }
      t += 1
    }
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < langTable.length) {
      if (langHits(l) > bestHits) { best = l; bestHits = langHits(l) }
      l += 1
    }
    val lang = if (best < 0) "und" else langTable(best)._1
    InternalRow(false, toks.length, charLen, punct, wordLenSum, stops,
      UTF8String.fromString(lang))
  }

  /** Register `text_stats(text)` with the canonical stopword/language lists
    * (graft.ops.TextAnalysis.defaultStopwords, TextFunctions.langStopwords). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[TextStats],
      exprs => TextStats(exprs.head,
        graft.ops.TextAnalysis.defaultStopwords,
        TextFunctions.langStopwords.toSeq))

  /** Column API ([[register]] first). */
  def stats(text: Column): Column = call_function(FnName, text)
}

/**
 * Compiled document fingerprint: min of the 60-bit md5 hashes of the
 * document's word shingles — identical to [[TextFunctions.fingerprint]]
 * (including the short-shingle tail for sub-`shingle`-length docs and the
 * md5("") hash for empty docs) in one pass instead of the interpreted
 * shingle-array transform.
 */
case class FingerprintHash(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fingerprint_hash requires STRING input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    FingerprintHash.compute(input.asInstanceOf[UTF8String], shingleSize)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintHash {

  val FnName = "fingerprint_hash"

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def h60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var b64 = 0L
    var i = 0
    while (i < 8) { b64 = (b64 << 8) | (d(i) & 0xffL); i += 1 }
    b64 >>> 4
  }

  def compute(text: UTF8String, shingleSize: Int): Long = {
    val md = digest.get()
    val shingles = WordShingles.compute(text, shingleSize)
    var min = Long.MaxValue
    var i = 0
    while (i < shingles.length) {
      val h = h60(md, shingles(i))
      if (h < min) min = h
      i += 1
    }
    min
  }

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[FingerprintHash],
      exprs => FingerprintHash(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))

  /** Column API ([[register]] first). */
  def fingerprint(text: Column, shingleSize: Int = 3): Column =
    call_function(FnName, text, lit(shingleSize))
}
