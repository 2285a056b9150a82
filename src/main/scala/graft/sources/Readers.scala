package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document reader providers (SURVEY.md §2.1; reference:
 * lexical-graph/.../indexing/load/readers/providers/ — 18 provider classes).
 *
 * Spark-native formats map straight onto `spark.read` (the provider
 * abstraction collapses: DataSource V2 already does listing, splitting,
 * schema, and predicate pushdown). Text-ish markup formats are native
 * parse Columns. Binary document formats (pdf, docx, pptx) need external
 * codecs that are not in this container — those raise with a clear message
 * and are the ONLY unimplemented seam (same stub discipline as
 * graft.ops.Multimodal.decodeFeatures).
 *
 * Every reader lands on the same contract: a DataFrame with at least
 * (doc_id, text, metadata columns), ready for LexicalGraphBuilder.
 */
object Readers {

  /** Directory/file of JSON-lines documents (StreamingJSONLReaderProvider's
    * batch twin; the streaming twin is graft.streaming.StreamingIngest). */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def json(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    spark.read.option("multiLine", multiLine).json(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", true).csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Whole-file plain text: one row per file with its path as doc id
    * (directory reader provider). */
  def textFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .withColumn("doc_id", input_file_name())
      .select(col("doc_id"), col("value").as("text"))

  /** Markdown → plain text: strips headings, emphasis, links (keeping link
    * text), code fences, list markers (markdown reader provider). */
  def markdownToText(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", " ")
    val noInlineCode = regexp_replace(noFence, "`([^`]*)`", "$1")
    val noHeading = regexp_replace(noInlineCode, "(?m)^#{1,6}\\s*", "")
    val noLink = regexp_replace(noHeading, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noEmph = regexp_replace(noLink, "(\\*\\*|__|\\*|_)([^*_]+)\\1", "$2")
    val noBullet = regexp_replace(noEmph, "(?m)^\\s*([-*+]|\\d+\\.)\\s+", "")
    trim(regexp_replace(noBullet, "\\s+", " "))
  }

  /** HTML → plain text: drops script/style subtrees, strips tags, decodes
    * the common entities (web reader provider). */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Binary document formats: require an external codec (PDFBox/POI
    * equivalents), not available here — fail loudly rather than silently
    * mis-parse. */
  def pdf(spark: SparkSession, path: String): DataFrame =
    unsupported("pdf")
  def docx(spark: SparkSession, path: String): DataFrame =
    unsupported("docx")
  def pptx(spark: SparkSession, path: String): DataFrame =
    unsupported("pptx")

  private def unsupported(fmt: String): Nothing =
    throw new UnsupportedOperationException(
      s"$fmt reading requires an external codec; wire a parser into " +
        "binaryFiles + mapPartitions (see graft.ops.Multimodal for the " +
        "batching shape)")
}
