package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipEntry, ZipInputStream}

import javax.xml.parsers.SAXParserFactory
import org.xml.sax.helpers.DefaultHandler
import org.xml.sax.{Attributes, InputSource}

/**
 * Built-in `(bytes) => text` codecs for the three binary document formats
 * the reference wraps external libraries for (indexing/load/readers/
 * providers/pdf_reader_provider.py, docx_reader_provider.py,
 * pptx_reader_provider.py — each delegates to pypdf / python-docx /
 * python-pptx). This container has no such libraries, so these are
 * self-contained JDK-only extractors:
 *
 *  - docx / pptx are OOXML: a zip (java.util.zip) of XML parts; text lives
 *    in `<w:t>` runs (word/document.xml) and `<a:t>` runs
 *    (ppt/slides/slideN.xml). Parsed with the JDK SAX parser, external
 *    entities disabled.
 *  - pdf: objects are scanned for `stream…endstream` bodies; FlateDecode
 *    streams are inflated (java.util.zip.Inflater); content streams are
 *    tokenized for the text-showing operators Tj / ' / " / TJ between
 *    BT…ET, decoding literal `(…)` escapes and `<…>` hex strings.
 *
 * Coverage contract (documented, loud): this handles single-byte-encoded
 * PDFs (the overwhelmingly common case for machine-generated text PDFs)
 * and any spec-conformant docx/pptx. PDFs using CID/CMap font encodings
 * need a real codec — register one via `Readers.registerParser` to
 * override these defaults; the seam takes precedence over the built-ins.
 *
 * All three functions are pure `Array[Byte] => String` and serialize into
 * task closures, so parsing runs distributed inside `binaryFile` +
 * mapPartitions (see Readers.binaryDocuments) — bytes never shuffle.
 */
object BinaryParsers {

  /** Built-in codec for `format`, if one exists. */
  def builtin(format: String): Option[Array[Byte] => String] =
    format.toLowerCase match {
      case "docx" => Some(docxText)
      case "pptx" => Some(pptxText)
      case "pdf"  => Some(pdfText)
      case _      => None
    }

  // ---------------------------------------------------------------- OOXML

  /** word/document.xml: `<w:t>` runs concatenated; `<w:p>` ends and
    * `<w:br/>` emit newlines, `<w:tab/>` a tab. */
  def docxText(bytes: Array[Byte]): String = {
    val doc = zipEntry(bytes, _ == "word/document.xml").getOrElse(
      throw new IllegalArgumentException(
        "not a docx: no word/document.xml entry"))
    val sb = new java.lang.StringBuilder
    saxParse(doc, new DefaultHandler {
      private var inT = false
      override def startElement(uri: String, local: String, qn: String,
                                at: Attributes): Unit = name(local, qn) match {
        case "t"   => inT = true
        case "tab" => sb.append('\t')
        case "br"  => sb.append('\n')
        case _     =>
      }
      override def endElement(uri: String, local: String, qn: String): Unit =
        name(local, qn) match {
          case "t" => inT = false
          case "p" => sb.append('\n')
          case _   =>
        }
      override def characters(ch: Array[Char], st: Int, len: Int): Unit =
        if (inT) sb.append(ch, st, len)
    })
    sb.toString.stripLineEnd
  }

  /** ppt/slides/slideN.xml in slide order: `<a:t>` runs; `<a:p>` paragraph
    * ends emit newlines; slides are separated by a blank line. */
  def pptxText(bytes: Array[Byte]): String = {
    val SlideName = """ppt/slides/slide(\d+)\.xml""".r
    val slides = zipEntries(bytes, n => SlideName.pattern.matcher(n).matches())
      .sortBy { case (n, _) => n match { case SlideName(i) => i.toInt } }
    if (slides.isEmpty)
      throw new IllegalArgumentException("not a pptx: no ppt/slides/ entries")
    slides.map { case (_, xml) =>
      val sb = new java.lang.StringBuilder
      saxParse(xml, new DefaultHandler {
        private var inT = false
        override def startElement(uri: String, local: String, qn: String,
                                  at: Attributes): Unit =
          if (name(local, qn) == "t") inT = true
        override def endElement(uri: String, local: String, qn: String): Unit =
          name(local, qn) match {
            case "t" => inT = false
            case "p" => sb.append('\n')
            case _   =>
          }
        override def characters(ch: Array[Char], st: Int, len: Int): Unit =
          if (inT) sb.append(ch, st, len)
      })
      sb.toString.stripLineEnd
    }.mkString("\n\n")
  }

  /** Namespace-aware and namespace-oblivious parsers disagree on which of
    * (localName, qName) is populated; take whichever carries the tag. */
  private def name(local: String, qn: String): String =
    if (local.nonEmpty) local else qn.substring(qn.indexOf(':') + 1)

  private def saxParse(xml: Array[Byte], handler: DefaultHandler): Unit = {
    val f = SAXParserFactory.newInstance()
    f.setNamespaceAware(true)
    // OOXML parts never need DTDs; disabling them blocks XXE by construction
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newSAXParser().parse(
      new InputSource(new ByteArrayInputStream(xml)), handler)
  }

  private def zipEntry(bytes: Array[Byte],
                       want: String => Boolean): Option[Array[Byte]] =
    zipEntries(bytes, want).headOption.map(_._2)

  private def zipEntries(bytes: Array[Byte],
                         want: String => Boolean): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (want(e.getName)) out += ((e.getName, zin.readAllBytes()))
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // ------------------------------------------------------------------ PDF

  /** Latin-1 view of the raw bytes: structure keywords are ASCII and
    * Latin-1 maps bytes 1:1, so offsets in the string are byte offsets. */
  def pdfText(bytes: Array[Byte]): String = {
    val raw = new String(bytes, "ISO-8859-1")
    if (!raw.startsWith("%PDF-"))
      throw new IllegalArgumentException("not a pdf: missing %PDF- header")
    val out = new java.lang.StringBuilder
    var from = 0
    var streamAt = raw.indexOf("stream", from)
    while (streamAt >= 0) {
      // the dict preceding this `stream` keyword decides the filter
      val dictStart = raw.lastIndexOf("<<", streamAt)
      val dict = if (dictStart >= 0) raw.substring(dictStart, streamAt) else ""
      // stream data starts after the keyword's EOL (CRLF or LF per spec)
      var dataStart = streamAt + "stream".length
      if (raw.startsWith("\r\n", dataStart)) dataStart += 2
      else if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
      val end = raw.indexOf("endstream", dataStart)
      if (end < 0) { streamAt = -1 }
      else {
        var dataEnd = end
        if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
        if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
        val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        val decoded =
          if (dict.contains("/FlateDecode")) inflate(data)
          else if (dict.contains("/Filter")) null // unsupported filter: skip
          else data
        if (decoded != null) {
          val content = new String(decoded, "ISO-8859-1")
          if (content.contains("BT")) out.append(contentText(content))
        }
        from = end + "endstream".length
        streamAt = raw.indexOf("stream", from)
      }
    }
    out.toString.stripLineEnd
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new java.io.ByteArrayOutputStream(data.length * 4)
    val chunk = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) buf.write(chunk, 0, n)
        else if (n == 0 && !inf.finished()) return null // truncated/dict
      }
      buf.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }
    finally inf.end()
  }

  /** Walk a content stream, collecting the strings shown by Tj / ' / " /
    * TJ. Line-positioning operators (Td TD T* ' ") break lines — enough to
    * keep reading order for linearly laid-out text. */
  private def contentText(s: String): String = {
    val out = new java.lang.StringBuilder
    val pending = new java.lang.StringBuilder // strings since last operator
    var i = 0
    def newline(): Unit =
      if (out.length > 0 && out.charAt(out.length - 1) != '\n') out.append('\n')
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i)
          pending.append(str); i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val end = s.indexOf('>', i)
          if (end < 0) i = s.length
          else { pending.append(hexString(s.substring(i + 1, end))); i = end + 1 }
        case '%' => // comment to EOL
          val eol = s.indexWhere(c => c == '\n' || c == '\r', i)
          i = if (eol < 0) s.length else eol
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val j = tokenEnd(s, i)
          s.substring(i, j) match {
            case "Tj"        => out.append(pending); pending.setLength(0)
            case "TJ"        => out.append(pending); pending.setLength(0)
            case "'" | "\""  => newline(); out.append(pending); pending.setLength(0)
            case "Td" | "TD" | "T*" => newline(); pending.setLength(0)
            case "BT" | "ET" => pending.setLength(0)
            case _           => pending.setLength(0) // other op: args weren't text
          }
          i = j
        case _ => i += 1
      }
    }
    out.toString
  }

  private def tokenEnd(s: String, i: Int): Int = {
    var j = i
    while (j < s.length && (s.charAt(j).isLetterOrDigit ||
      s.charAt(j) == '*' || s.charAt(j) == '\'' || s.charAt(j) == '"')) j += 1
    math.max(j, i + 1)
  }

  /** `(...)` literal with \-escapes and balanced nested parens (spec
    * 7.3.4.2). Returns (decoded, index after closing paren). */
  private def literalString(s: String, open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append((v & 0xff).toChar); i = j
            case '\n' => i += 2 // line continuation
            case c => sb.append(c); i += 2 // includes \( \) \\
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1; if (depth > 0) sb.append(')'); i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  /** `<hex>` string: pairs of hex digits, odd final digit padded with 0. */
  private def hexString(hex: String): String = {
    val clean = hex.filter(c => !c.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    val sb = new java.lang.StringBuilder(padded.length / 2)
    var i = 0
    while (i < padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    sb.toString
  }
}
