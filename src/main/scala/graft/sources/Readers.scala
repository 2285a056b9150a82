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
    // &amp; decodes LAST: decoding it first would double-decode
    // '&amp;lt;' into '<' where a browser renders the literal '&lt;'
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Database reader (database_reader_provider.py): a SQL query against any
    * JDBC source, pushed down to the database — Spark's JDBC source
    * partitions the read when bounds are supplied. Rows land as documents
    * via [[rowsToDocuments]], mirroring the reference's row→Document
    * verbalization. */
  def jdbc(spark: SparkSession, url: String, query: String,
           properties: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("query", query)
    properties.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Structured-data reader (structured_data_reader_provider.py): any
    * tabular frame (csv/json/parquet/jdbc) becomes documents — one per row,
    * text = "col: value" pairs, id from `idCols` (or a row hash when empty).
    * One narrow projection; the reference loops pandas rows. */
  def rowsToDocuments(df: DataFrame, idCols: Seq[String] = Seq.empty): DataFrame = {
    val cols = df.columns.toSeq
    val text = concat_ws(", ",
      cols.map(c => concat_ws(": ", lit(c), col(c).cast("string"))): _*)
    val id =
      if (idCols.nonEmpty) concat_ws("|", idCols.map(col(_).cast("string")): _*)
      else md5(text)
    df.select(id.as("doc_id"), text.as("text"),
      map(cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*).as("metadata"))
  }

  /** Web reader (web_reader_provider.py): URLs → fetched pages → text. The
    * HTTP fetch is an injected seam (this engine keeps network effects out
    * of the dataflow the same way the LLM sits behind [[graft.llm.LLM]]);
    * the fetch runs distributed via mapPartitions — one client per
    * partition — and the HTML strip is the shared [[htmlToText]] column. */
  def web(spark: SparkSession, urls: Seq[String],
          fetch: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[(String, String)] = Encoders.product[(String, String)]
    val fetched = spark.createDataFrame(urls.map(Tuple1(_))).toDF("url")
      .select(col("url").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(u => (u, fetch(u))))
      .toDF("doc_id", "html")
    fetched.select(col("doc_id"), htmlToText(col("html")).as("text"))
  }

  private def defaultFetch(url: String): String =
    throw new UnsupportedOperationException(
      "no HTTP client wired: pass fetch = (url => body) to Readers.web " +
        "(this environment has no egress)")

  /** Wikipedia reader (wikipedia_reader_provider.py): page titles → the
    * per-language article URL → the shared web fetch seam. */
  def wikipedia(spark: SparkSession, titles: Seq[String], lang: String = "en",
                fetch: String => String = defaultFetch): DataFrame =
    web(spark, titles.map(t =>
      s"https://$lang.wikipedia.org/wiki/${t.replace(' ', '_')}"), fetch)

  /** Wikipedia API reader — the payload-parsing path of the wikipedia
    * provider: instead of scraping article HTML, fetch the REST summary
    * endpoint and parse the recorded JSON payload (title / extract /
    * description) into the document contract. The fetch is the same
    * injected seam as [[web]]; the JSON parse is pure column work
    * (get_json_object), so replayed fixtures exercise the exact
    * distributed path production runs. Pages the API can't resolve
    * (payload without an `extract`) are dropped — the reference provider
    * likewise skips unfetchable titles. */
  def wikipediaApi(spark: SparkSession, titles: Seq[String],
                   lang: String = "en",
                   fetch: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.Encoders
    val urls = titles.map(t =>
      s"https://$lang.wikipedia.org/api/rest_v1/page/summary/${t.replace(' ', '_')}")
    spark.createDataFrame(urls.map(Tuple1(_))).toDF("url")
      .select(col("url").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(u => (u, fetch(u))))(
        Encoders.product[(String, String)])
      .toDF("url", "json")
      .select(
        get_json_object(col("json"), "$.title").as("doc_id"),
        get_json_object(col("json"), "$.extract").as("text"),
        map(
          lit("url"), col("url"),
          lit("lang"), lit(lang),
          lit("description"),
          get_json_object(col("json"), "$.description")).as("metadata"))
      .filter(col("text").isNotNull)
  }

  /** GitHub contents-API reader — the payload-parsing path of the github
    * provider: the API returns file metadata plus BASE64 content (wrapped
    * with newlines every 60 chars, per the API contract); the decode is
    * pure column work (strip whitespace → unbase64 → utf8), so replayed
    * fixtures drive the identical distributed decode production runs.
    * Returns (doc_id = repo-relative path, text, metadata{url, sha}). */
  def githubApi(spark: SparkSession, owner: String, repo: String, ref: String,
                paths: Seq[String],
                fetch: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.Encoders
    val urls = paths.map(p =>
      s"https://api.github.com/repos/$owner/$repo/contents/$p?ref=$ref")
    spark.createDataFrame(urls.map(Tuple1(_))).toDF("url")
      .select(col("url").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(u => (u, fetch(u))))(
        Encoders.product[(String, String)])
      .toDF("url", "json")
      .select(
        get_json_object(col("json"), "$.path").as("doc_id"),
        // the API contract: "encoding":"base64", content chunked by \n
        when(get_json_object(col("json"), "$.encoding") === "base64",
          unbase64(regexp_replace(
            get_json_object(col("json"), "$.content"), "\\s", ""))
            .cast("string"))
          .otherwise(get_json_object(col("json"), "$.content")).as("text"),
        map(lit("url"), col("url"),
          lit("sha"), get_json_object(col("json"), "$.sha")).as("metadata"))
      .filter(col("doc_id").isNotNull)
  }

  /** YouTube transcript-API reader — the payload-parsing path of the
    * youtube provider: the transcript API returns a JSON ARRAY of timed
    * segments `[{"text","start","duration"}, ...]`; the reader joins the
    * segments in start order into one transcript per video (the
    * reference's transcript assembly), all as column work (from_json +
    * array_sort + transform). */
  def youtubeSegments(spark: SparkSession, videoIds: Seq[String],
                      fetch: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.Encoders
    val segSchema = "array<struct<text:string,start:double,duration:double>>"
    spark.createDataFrame(videoIds.map(Tuple1(_))).toDF("video_id")
      .select(col("video_id").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(v => (v, fetch(v))))(
        Encoders.product[(String, String)])
      .toDF("doc_id", "json")
      .select(col("doc_id"),
        from_json(col("json"), lit(segSchema)).as("segs"))
      .filter(col("segs").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", transform(
          array_sort(col("segs"), (a, b) =>
            when(a.getField("start") < b.getField("start"), -1)
              .when(a.getField("start") > b.getField("start"), 1)
              .otherwise(0)),
          s => s.getField("text"))).as("text"),
        size(col("segs")).as("n_segments"))
  }

  /** GitHub reader (github_reader_provider.py): repo file paths → raw
    * content URLs → fetch seam. Returns (doc_id=url, text=raw content) —
    * raw files are not HTML, so no tag strip. */
  def github(spark: SparkSession, owner: String, repo: String, ref: String,
             paths: Seq[String],
             fetch: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.Encoders
    val urls = paths.map(p =>
      s"https://raw.githubusercontent.com/$owner/$repo/$ref/$p")
    spark.createDataFrame(urls.map(Tuple1(_))).toDF("url")
      .select(col("url").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(u => (u, fetch(u))))(
        org.apache.spark.sql.Encoders.product[(String, String)])
      .toDF("doc_id", "text")
  }

  /** YouTube transcript reader (youtube_reader_provider.py): video ids →
    * the transcript fetch seam (the reference wraps a transcript API; the
    * seam returns the transcript text per id). */
  def youtube(spark: SparkSession, videoIds: Seq[String],
              fetchTranscript: String => String = defaultFetch): DataFrame = {
    import org.apache.spark.sql.Encoders
    spark.createDataFrame(videoIds.map(Tuple1(_))).toDF("video_id")
      .select(col("video_id").cast("string")).as[String](Encoders.STRING)
      .mapPartitions(it => it.map(v => (v, fetchTranscript(v))))(
        org.apache.spark.sql.Encoders.product[(String, String)])
      .toDF("doc_id", "text")
  }

  /** Pluggable binary-parser registry: `(format, bytes => text)`. The
    * external codecs the reference wraps (pdf/docx/pptx provider classes)
    * are not in this container, so the parse step is an injected seam —
    * same discipline as the LLM and HTTP-fetch seams. A registered parser
    * runs distributed inside mapPartitions over Spark's `binaryFile`
    * source (which already does listing, splitting, and file-size
    * metadata); with no parser registered the format readers keep failing
    * loudly instead of silently mis-parsing. */
  private val parsers =
    scala.collection.concurrent.TrieMap.empty[String, Array[Byte] => String]

  def registerParser(format: String, parse: Array[Byte] => String): Unit =
    parsers.put(format.toLowerCase, parse)

  def unregisterParser(format: String): Unit =
    parsers.remove(format.toLowerCase)

  /** Binary files under `path` with extension `format`, parsed to the
    * (doc_id, text) contract by the registered parser. The parser function
    * is captured by value into the task closure — executors never consult
    * the driver-side registry. Files stream through `binaryFile`'s lazy
    * content column, one parse call per file, partitioned by the source's
    * file-splitting (binary content never enters a shuffle). */
  def binaryDocuments(spark: SparkSession, path: String,
                      format: String): DataFrame = {
    // explicit registration overrides the JDK-only built-ins (pdf/docx/
    // pptx, BinaryParsers.scala); unknown formats stay loud
    val parse = parsers.get(format.toLowerCase)
      .orElse(BinaryParsers.builtin(format))
      .getOrElse(unsupported(format))
    import org.apache.spark.sql.Encoders
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.${format.toLowerCase}")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.product[(String, Array[Byte])])
      .mapPartitions(it => it.map { case (p, bytes) => (p, parse(bytes)) })(
        Encoders.product[(String, String)])
      .toDF("doc_id", "text")
  }

  /** Binary document formats: parsed by the JDK-only built-in extractors
    * (BinaryParsers) unless a codec is registered to override them;
    * formats with neither fail loudly rather than silently mis-parse. */
  def pdf(spark: SparkSession, path: String): DataFrame =
    binaryDocuments(spark, path, "pdf")
  def docx(spark: SparkSession, path: String): DataFrame =
    binaryDocuments(spark, path, "docx")
  def pptx(spark: SparkSession, path: String): DataFrame =
    binaryDocuments(spark, path, "pptx")

  private def unsupported(fmt: String): Nothing =
    throw new UnsupportedOperationException(
      s"$fmt reading requires an external codec: register one with " +
        s"Readers.registerParser(\"$fmt\", bytes => text) — it runs " +
        "distributed via binaryFile + mapPartitions (see " +
        "graft.ops.Multimodal for the batching shape)")
}

/**
 * Extraction artifact tee (reference indexing/extract/file_system_tap.py):
 * persists the pipeline's intermediate frames (raw sources, chunks,
 * processed sources) under an output directory while passing the frame
 * through unchanged — a debugging/audit tap. Each tee is one parquet write;
 * the returned frame is the input, so the tap composes inside a pipeline
 * without changing its plan.
 */
final class FileSystemTap(outputDir: String, subdirectory: String) {
  private def dir(name: String) = s"$outputDir/$subdirectory/$name"

  def tapRawSources(docs: DataFrame): DataFrame = tee(docs, "raw_sources")
  def tapChunks(chunks: DataFrame): DataFrame = tee(chunks, "chunks")
  def tapSources(sources: DataFrame): DataFrame = tee(sources, "sources")

  private def tee(df: DataFrame, name: String): DataFrame = {
    df.write.mode("overwrite").parquet(dir(name))
    // re-read the written copy: downstream reuse scans the materialized tap
    // instead of recomputing the upstream plan (same role as the reference
    // writing then re-listing its tap directories)
    df.sparkSession.read.parquet(dir(name))
  }
}
