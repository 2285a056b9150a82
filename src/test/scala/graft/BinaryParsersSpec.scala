package graft

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.sources.{BinaryParsers, Readers}
import org.apache.spark.sql.functions.col

/** Golden-file tests for the JDK-only binary document extractors. The
  * fixtures are synthesized here byte-for-byte (a spec-conformant OOXML
  * zip, a spec-conformant two-object PDF) — no binary blobs in the repo,
  * and the construction doubles as documentation of exactly which subset
  * of each format the built-ins cover. */
class BinaryParsersSpec extends SparkSpec {

  // ---------------------------------------------------------------- OOXML

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val wNs = "xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\""
  private val aNs = "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\""

  private def docxBytes: Array[Byte] = zip(
    "[Content_Types].xml" ->
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""",
    "word/document.xml" ->
      s"""<?xml version="1.0"?><w:document $wNs><w:body>
         |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>World</w:t></w:r></w:p>
         |<w:p><w:r><w:t>Tab</w:t><w:tab/><w:t>separated</w:t></w:r></w:p>
         |</w:body></w:document>""".stripMargin)

  test("docx: runs concatenate, paragraphs break, tabs survive") {
    assert(BinaryParsers.docxText(docxBytes) == "Hello World\nTab\tseparated")
  }

  test("docx: non-docx zip fails loudly") {
    val e = intercept[IllegalArgumentException](
      BinaryParsers.docxText(zip("other.xml" -> "<x/>")))
    assert(e.getMessage.contains("word/document.xml"))
  }

  private def slideXml(texts: String*): String =
    s"""<?xml version="1.0"?><p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" $aNs><p:cSld>
       |${texts.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString}
       |</p:cSld></p:sld>""".stripMargin

  test("pptx: slides in numeric order, blank line between slides") {
    // slide10 after slide2 proves numeric (not lexicographic) ordering
    val bytes = zip(
      "ppt/slides/slide10.xml" -> slideXml("Last slide"),
      "ppt/slides/slide1.xml" -> slideXml("Title", "Subtitle"),
      "ppt/slides/slide2.xml" -> slideXml("Middle"))
    assert(BinaryParsers.pptxText(bytes) ==
      "Title\nSubtitle\n\nMiddle\n\nLast slide")
  }

  // ------------------------------------------------------------------ PDF

  /** Minimal one-page PDF whose content stream is `content`, optionally
    * Flate-compressed — header, one stream object, trailer. */
  private def pdfBytes(content: String, flate: Boolean): Array[Byte] = {
    val body: Array[Byte] =
      if (flate) {
        val d = new Deflater()
        d.setInput(content.getBytes("ISO-8859-1")); d.finish()
        val buf = new Array[Byte](content.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      } else content.getBytes("ISO-8859-1")
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val filter = if (flate) " /Filter /FlateDecode" else ""
    w(s"1 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
    bos.write(body)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("pdf: Tj and TJ strings extracted, Td breaks lines") {
    val content =
      "BT /F1 12 Tf 72 712 Td (Hello PDF) Tj 0 -14 Td [(frag) -250 (mented)] TJ ET"
    assert(BinaryParsers.pdfText(pdfBytes(content, flate = false)) ==
      "Hello PDF\nfragmented")
  }

  test("pdf: FlateDecode stream inflates; escapes and hex strings decode") {
    val content =
      "BT (paren \\(x\\) octal \\101 line one) Tj T* <48692E> Tj ET"
    assert(BinaryParsers.pdfText(pdfBytes(content, flate = true)) ==
      "paren (x) octal A line one\nHi.")
  }

  test("pdf: ' operator breaks line; non-text operators don't leak strings") {
    // the (skipme) string is an argument to a non-text operator (Tf here
    // takes a name+number, but any op clears pending args)
    val content = "BT (first) Tj (skipme) Tf (second)' ET"
    assert(BinaryParsers.pdfText(pdfBytes(content, flate = false)) ==
      "first\nsecond")
  }

  test("pdf: non-pdf bytes fail loudly") {
    val e = intercept[IllegalArgumentException](
      BinaryParsers.pdfText("not a pdf".getBytes("UTF-8")))
    assert(e.getMessage.contains("%PDF-"))
  }

  // ------------------------------------------------------- PDF: CID/CMap

  /** Multi-object PDF: catalog → page tree → page with /Resources /Font
    * bindings → Type0 font (optionally carrying a /ToUnicode CMap stream)
    * → content stream showing 2-byte glyph codes. */
  private def cidPdfBytes(withToUnicode: Boolean,
                          codespace: String = "<0000> <FFFF>"): Array[Byte] = {
    // 0048→H 0065→e via bfchar; 006C..006F→l.. via bfrange increment;
    // 0040..0041→[X Y] via bfrange array form
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |$codespace
        |endcodespacerange
        |2 beginbfchar
        |<0048> <0048>
        |<0065> <0065>
        |endbfchar
        |2 beginbfrange
        |<006C> <006F> <006C>
        |<0040> <0041> [<0058> <0059>]
        |endbfrange
        |endcmap
        |end""".stripMargin
    val content = "BT /F1 12 Tf <00480065006C006C006F> Tj <0041> Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val toUni = if (withToUnicode) " /ToUnicode 6 0 R" else ""
    w(s"4 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Test " +
      s"/Encoding /Identity-H$toUni >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    if (withToUnicode)
      w(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("pdf: Type0 font decodes 2-byte codes through its ToUnicode CMap") {
    // bfchar, bfrange-increment, and bfrange-array entries all exercised
    assert(BinaryParsers.pdfText(cidPdfBytes(withToUnicode = true)) ==
      "HelloY")
  }

  test("pdf: CID font without ToUnicode fails loudly, not silent-garbage") {
    val e = intercept[IllegalArgumentException](
      BinaryParsers.pdfText(cidPdfBytes(withToUnicode = false)))
    assert(e.getMessage.contains("ToUnicode"))
    assert(e.getMessage.contains("F1"))
  }

  test("pdf: mixed-width ToUnicode codespace fails loudly, not silent-garbage") {
    // Shift-JIS-style CMap: 1-byte ASCII range plus 2-byte CJK range — a
    // single global code length would shred every 2-byte code into two
    // bogus 1-byte lookups
    val e = intercept[IllegalArgumentException](
      BinaryParsers.pdfText(cidPdfBytes(withToUnicode = true,
        codespace = "<00> <80>\n<8140> <9FFC>")))
    assert(e.getMessage.contains("mixed-width"))
  }

  test("pdf: /Length protects stream data containing 'endstream' bytes") {
    // the literal string holds the endstream keyword — a first-occurrence
    // scan would truncate the stream mid-string
    val content = "BT (before endstream after) Tj ET"
    assert(BinaryParsers.pdfText(pdfBytes(content, flate = false)) ==
      "before endstream after")
  }

  test("pdf: nested /DecodeParms dict doesn't hide the owning /Filter") {
    val content = "BT (nested dict ok) Tj ET"
    val d = new Deflater()
    d.setInput(content.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](content.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    val body = java.util.Arrays.copyOf(buf, n)
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    // /Filter BEFORE the nested dict: a lastIndexOf("<<") dict scan sees
    // only "<< /Predictor 1 >> /Length ... >>" and misses /FlateDecode
    w(s"1 0 obj\n<< /Filter /FlateDecode /DecodeParms << /Predictor 1 >> " +
      s"/Length ${body.length} >>\nstream\n")
    bos.write(body)
    w("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n")
    assert(BinaryParsers.pdfText(bos.toByteArray) == "nested dict ok")
  }

  test("zip entries are capped against decompression bombs") {
    // ~70 MB of NULs deflates to ~70 KB; inflating it must trip the cap,
    // not balloon the heap
    val big = new String(new Array[Char](70 << 20))
    val e = intercept[IllegalArgumentException](
      BinaryParsers.docxText(zip("word/document.xml" -> big)))
    assert(e.getMessage.contains("bomb"))
  }

  // ------------------------------------------- distributed via the seam

  test("Readers.docx/pptx/pdf parse real files distributed by default") {
    val dir = java.nio.file.Files.createTempDirectory("builtindocs").toFile
    def put(name: String, bytes: Array[Byte]): Unit = {
      val out = new FileOutputStream(new File(dir, name))
      out.write(bytes); out.close()
    }
    put("a.docx", docxBytes)
    put("deck.pptx", zip("ppt/slides/slide1.xml" -> slideXml("One slide")))
    put("doc.pdf", pdfBytes("BT (From pdf) Tj ET", flate = true))

    def text(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("text")).collect().map(_.getString(0)).toSeq

    assert(text(Readers.docx(spark, dir.getAbsolutePath)) ==
      Seq("Hello World\nTab\tseparated"))
    assert(text(Readers.pptx(spark, dir.getAbsolutePath)) == Seq("One slide"))
    assert(text(Readers.pdf(spark, dir.getAbsolutePath)) == Seq("From pdf"))
  }

  test("registered parser overrides the built-in; unknown format stays loud") {
    Readers.registerParser("pdf", _ => "override wins")
    try {
      val dir = java.nio.file.Files.createTempDirectory("overridedocs").toFile
      val out = new FileOutputStream(new File(dir, "x.pdf"))
      out.write(pdfBytes("BT (builtin) Tj ET", flate = false)); out.close()
      val got = Readers.pdf(spark, dir.getAbsolutePath)
        .select(col("text")).collect().map(_.getString(0)).toSeq
      assert(got == Seq("override wins"))
    } finally Readers.unregisterParser("pdf")
    val e = intercept[UnsupportedOperationException](
      Readers.binaryDocuments(spark, "/tmp/x", "epub"))
    assert(e.getMessage.contains("registerParser"))
  }
}
