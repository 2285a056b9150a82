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
 *    BT…ET, decoding literal `(…)` escapes and `<…>` hex strings. Type0
 *    (CID-keyed) fonts are decoded through their embedded /ToUnicode CMap
 *    (bfchar + bfrange), resolved per content-stream font via the
 *    /Resources /Font name bindings and the document's object table.
 *
 * Coverage contract (documented, loud): this handles single-byte-encoded
 * PDFs (the overwhelmingly common case for machine-generated text PDFs),
 * CID-keyed PDFs that carry a ToUnicode CMap (what office-suite exporters
 * emit), and any spec-conformant docx/pptx. A CID-keyed font WITHOUT a
 * ToUnicode CMap cannot be mapped to text at all — text shown with one
 * throws a loud unsupported-format error instead of emitting garbage.
 * Register a full codec via `Readers.registerParser` to override these
 * defaults; the seam takes precedence over the built-ins.
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

  /** Cap on a single zip entry's INFLATED size: untrusted docs can carry
    * decompression bombs (a few KB inflating to GBs); a real OOXML text
    * part never approaches this. */
  private val MaxZipEntryBytes: Long = 64L << 20

  private def zipEntries(bytes: Array[Byte],
                         want: String => Boolean): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (want(e.getName)) {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var total = 0L
          var n = zin.read(buf)
          while (n >= 0) {
            total += n
            if (total > MaxZipEntryBytes)
              throw new IllegalArgumentException(
                s"zip entry ${e.getName} inflates past $MaxZipEntryBytes " +
                  "bytes — refusing (decompression bomb guard)")
            bos.write(buf, 0, n)
            n = zin.read(buf)
          }
          out += ((e.getName, bos.toByteArray))
        }
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
    val objs = scanObjects(raw)
    val fonts = fontResources(raw, bytes, objs)
    val out = new java.lang.StringBuilder
    var at = 0
    var st = nextStream(raw, bytes, at, objs)
    while (st.isDefined) {
      val (dict, data, after) = st.get
      val decoded =
        if (dict.contains("/FlateDecode")) inflate(data)
        else if (dict.contains("/Filter")) null // unsupported filter: skip
        else data
      if (decoded != null) {
        val content = new String(decoded, "ISO-8859-1")
        if (content.contains("BT")) out.append(contentText(content, fonts))
      }
      at = after
      st = nextStream(raw, bytes, at, objs)
    }
    out.toString.stripLineEnd
  }

  /** All `N G obj … endobj` bodies, by object number (first wins: updated
    * PDFs append replacements, but without xref parsing the first body is
    * the linear-scan convention and matches how streams are walked). */
  private def scanObjects(raw: String): Map[Int, (Int, Int)] = {
    val m = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b")
      .matcher(raw)
    val out = Map.newBuilder[Int, (Int, Int)]
    val seen = scala.collection.mutable.Set[Int]()
    while (m.find()) {
      val num = m.group(1).toInt
      val end = raw.indexOf("endobj", m.end)
      if (end >= 0 && seen.add(num)) out += (num -> ((m.end, end)))
    }
    out.result()
  }

  /** The stream at/after `from`: (owning dict text, data bytes, index past
    * `endstream`). Two hardening rules over a naive scan: the dict is found
    * by BALANCED backward matching (a nested /DecodeParms dict must not
    * shadow the owner's /Filter), and a parseable /Length wins over the
    * first literal `endstream` byte sequence (uncompressed data may contain
    * those bytes). */
  private def nextStream(raw: String, bytes: Array[Byte], from: Int,
                         objs: Map[Int, (Int, Int)])
      : Option[(String, Array[Byte], Int)] = {
    var streamAt = raw.indexOf("stream", from)
    // "endstream" contains "stream": skip keyword hits that are its tail
    while (streamAt >= 3 && raw.regionMatches(streamAt - 3, "end", 0, 3))
      streamAt = raw.indexOf("stream", streamAt + 6)
    if (streamAt < 0) return None
    val dict = owningDict(raw, streamAt)
    var dataStart = streamAt + "stream".length
    if (raw.startsWith("\r\n", dataStart)) dataStart += 2
    else if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
    // honor /Length when it parses and lands on an endstream keyword
    val byLength = streamLength(dict, objs, raw).flatMap { len =>
      val e = dataStart.toLong + len
      if (e <= raw.length) {
        val k = raw.indexOf("endstream", e.toInt)
        if (k >= 0 && k - e <= 2) Some((e.toInt, k)) else None
      } else None
    }
    val (dataEnd, endKeyword) = byLength.getOrElse {
      val end = raw.indexOf("endstream", dataStart)
      if (end < 0) return None
      var de = end
      if (de > dataStart && raw.charAt(de - 1) == '\n') de -= 1
      if (de > dataStart && raw.charAt(de - 1) == '\r') de -= 1
      (de, end)
    }
    Some((dict, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd),
      endKeyword + "endstream".length))
  }

  /** The dict that OWNS the `stream` keyword: match the `>>` immediately
    * before it backward through nested `<< … >>` pairs to its opening
    * `<<` (lastIndexOf("<<") would pick a nested dict like /DecodeParms). */
  private def owningDict(raw: String, streamAt: Int): String = {
    val close = raw.lastIndexOf(">>", streamAt)
    if (close < 0) return ""
    var depth = 1
    var i = close - 1
    while (i > 0 && depth > 0) {
      if (raw.charAt(i) == '<' && raw.charAt(i - 1) == '<') {
        depth -= 1; i -= 2
      } else if (raw.charAt(i) == '>' && raw.charAt(i - 1) == '>') {
        depth += 1; i -= 2
      } else i -= 1
    }
    if (depth == 0) raw.substring(math.max(0, i), streamAt) else ""
  }

  private val LengthRe =
    """/Length\s+(\d+)(\s+\d+\s+R)?""".r

  /** /Length as a long: direct integer, or an indirect reference resolved
    * against the object table (`/Length 7 0 R` → object 7's integer body). */
  private def streamLength(dict: String, objs: Map[Int, (Int, Int)],
                           raw: String): Option[Long] =
    LengthRe.findFirstMatchIn(dict).flatMap { m =>
      if (m.group(2) == null) Some(m.group(1).toLong)
      else objs.get(m.group(1).toInt).flatMap { case (s, e) =>
        val body = raw.substring(s, e).trim
        if (body.nonEmpty && body.forall(_.isDigit)) Some(body.toLong)
        else None
      }
    }

  // ----------------------------------------------------- fonts / ToUnicode

  /** One font binding visible to content streams: resource name (`/F1`),
    * whether it is CID-keyed (Type0), and its ToUnicode CMap if present. */
  private final case class FontInfo(name: String, isType0: Boolean,
                                    cmap: Option[CMap])

  /** code → unicode from a ToUnicode CMap; codes are `codeLen` bytes. */
  private final case class CMap(codeLen: Int, map: Map[Int, String]) {
    def decode(byteStr: String): String = {
      if (byteStr.length % codeLen != 0)
        throw new IllegalArgumentException(
          s"pdf: ${byteStr.length}-byte string is not a whole number of " +
            s"$codeLen-byte CID codes — refusing to drop trailing bytes")
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + codeLen <= byteStr.length) {
        var code = 0
        var j = 0
        while (j < codeLen) {
          code = (code << 8) | (byteStr.charAt(i + j) & 0xff); j += 1
        }
        sb.append(map.getOrElse(code, "�"))
        i += codeLen
      }
      sb.toString
    }
  }

  private val FontPairRe =
    """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** Every `/Font` resource binding in the document, name → FontInfo.
    * Handles both inline dicts (`/Font << /F1 5 0 R >>`) and indirect
    * resource dicts (`/Font 9 0 R`). First binding of a name wins —
    * single-generator PDFs use document-unique names. */
  private def fontResources(raw: String, bytes: Array[Byte],
                            objs: Map[Int, (Int, Int)]): Map[String, FontInfo] = {
    val out = scala.collection.mutable.LinkedHashMap[String, FontInfo]()
    def addPairs(dictText: String): Unit =
      FontPairRe.findAllMatchIn(dictText).foreach { m =>
        val name = m.group(1)
        if (!out.contains(name)) objs.get(m.group(2).toInt).foreach {
          case (s, e) =>
            val body = raw.substring(s, e)
            val cmap = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
              .findFirstMatchIn(body)
              .flatMap(r => objectStream(raw, bytes, objs, r.group(1).toInt))
              .map(parseCMap)
            out += name -> FontInfo(name, body.contains("/Type0"), cmap)
        }
      }
    var at = raw.indexOf("/Font")
    while (at >= 0) {
      var i = at + "/Font".length
      while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
      if (raw.startsWith("<<", i)) addPairs(balancedDict(raw, i))
      else {
        // `/Font 9 0 R`: the resource dict lives in its own object
        val ref = """^(\d+)\s+\d+\s+R""".r.findFirstMatchIn(raw.substring(i,
          math.min(raw.length, i + 24)))
        ref.flatMap(m => objs.get(m.group(1).toInt)).foreach { case (s, e) =>
          addPairs(raw.substring(s, e))
        }
      }
      at = raw.indexOf("/Font", at + 5)
    }
    out.toMap
  }

  /** The balanced `<< … >>` dict starting at `open` (nested dicts kept). */
  private def balancedDict(raw: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i + 1 < raw.length) {
      if (raw.charAt(i) == '<' && raw.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (raw.charAt(i) == '>' && raw.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return raw.substring(open, i)
      }
      else i += 1
    }
    raw.substring(open)
  }

  /** Decoded stream data of object `num`, if that object holds a stream. */
  private def objectStream(raw: String, bytes: Array[Byte],
                           objs: Map[Int, (Int, Int)],
                           num: Int): Option[Array[Byte]] =
    objs.get(num).flatMap { case (s, e) =>
      nextStream(raw, bytes, s, objs) match {
        case Some((dict, data, after)) if after <= e + 1 =>
          if (dict.contains("/FlateDecode")) Option(inflate(data))
          else if (dict.contains("/Filter")) None
          else Some(data)
        case _ => None
      }
    }

  private val BfCharSecRe = java.util.regex.Pattern.compile(
    "beginbfchar(.*?)endbfchar", java.util.regex.Pattern.DOTALL)
  private val BfRangeSecRe = java.util.regex.Pattern.compile(
    "beginbfrange(.*?)endbfrange", java.util.regex.Pattern.DOTALL)
  private val HexPairRe = java.util.regex.Pattern.compile(
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
  private val RangeRe = java.util.regex.Pattern.compile(
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(?:<([0-9A-Fa-f]+)>|\\[(.*?)\\])",
    java.util.regex.Pattern.DOTALL)
  private val HexTokenRe = java.util.regex.Pattern.compile("<([0-9A-Fa-f]+)>")

  /** Entry cap: a hostile bfrange like `<0000> <FFFFFFFF>` must not
    * materialize billions of map entries. */
  private val MaxCMapEntries = 1 << 20

  /** Parse a ToUnicode CMap: codespace length, bfchar pairs, bfranges
    * (both `<lo> <hi> <dstStart>` and `<lo> <hi> [<d0> <d1> …]` forms).
    * Destination hex is UTF-16BE code units. */
  private def parseCMap(data: Array[Byte]): CMap = {
    val s = new String(data, "ISO-8859-1")
    // every codespace range's byte width, across every codespacerange
    // section — a mixed-width CMap (1-byte ASCII plus 2-byte CJK ranges,
    // Shift-JIS style) cannot be decoded with a single global code length,
    // so refuse loudly rather than split multi-byte codes into garbage
    val csSections = """(?s)begincodespacerange(.*?)endcodespacerange""".r
      .findAllMatchIn(s).map(_.group(1)).toSeq
    val widths = csSections
      .flatMap(sec => """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(sec)
        .map(m => math.max(1, m.group(1).length / 2)))
      .distinct
    if (widths.length > 1)
      throw new IllegalArgumentException(
        s"pdf: mixed-width ToUnicode codespace (${widths.mkString("/")}" +
          " bytes) is unsupported — refusing to decode with one code length")
    val codeLen = widths.headOption.getOrElse(2)
    val map = scala.collection.mutable.HashMap[Int, String]()
    def hexUtf16(h: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + 4 <= h.length) {
        sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
        i += 4
      }
      if (i < h.length) sb.append(Integer.parseInt(h.substring(i), 16).toChar)
      sb.toString
    }
    val bc = BfCharSecRe.matcher(s)
    while (bc.find()) {
      val p = HexPairRe.matcher(bc.group(1))
      while (p.find() && map.size < MaxCMapEntries)
        map.put(Integer.parseInt(p.group(1), 16), hexUtf16(p.group(2)))
    }
    val br = BfRangeSecRe.matcher(s)
    while (br.find()) {
      val r = RangeRe.matcher(br.group(1))
      while (r.find() && map.size < MaxCMapEntries) {
        val lo = Integer.parseInt(r.group(1), 16)
        val hi = Integer.parseInt(r.group(2), 16)
        if (r.group(3) != null) {
          val base = hexUtf16(r.group(3))
          var k = 0
          while (lo + k <= hi && map.size < MaxCMapEntries) {
            val arr = base.toCharArray
            arr(arr.length - 1) = (arr(arr.length - 1) + k).toChar
            map.put(lo + k, new String(arr))
            k += 1
          }
        } else {
          val t = HexTokenRe.matcher(r.group(4))
          var k = 0
          while (t.find() && lo + k <= hi && map.size < MaxCMapEntries) {
            map.put(lo + k, hexUtf16(t.group(1)))
            k += 1
          }
        }
      }
    }
    CMap(codeLen, map.toMap)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    // safe initial size (data.length * 4 overflows negative past ~512 MB)
    val buf = new java.io.ByteArrayOutputStream(
      math.min(math.max(data.length.toLong * 4, 64L), 1L << 20).toInt)
    val chunk = new Array[Byte](8192)
    try {
      var total = 0L
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) {
          total += n
          // same decompression-bomb cap as the zip path
          if (total > MaxZipEntryBytes)
            throw new IllegalArgumentException(
              s"pdf stream inflates past $MaxZipEntryBytes bytes — refusing")
          buf.write(chunk, 0, n)
        }
        else if (n == 0 && !inf.finished()) return null // truncated/dict
      }
      buf.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }
    finally inf.end()
  }

  /** Walk a content stream, collecting the strings shown by Tj / ' / " /
    * TJ. Line-positioning operators (Td TD T* ' ") break lines — enough to
    * keep reading order for linearly laid-out text. `Tf` tracks the active
    * font: strings shown with a Type0 (CID-keyed) font decode through its
    * ToUnicode CMap, and throw loudly when it has none — glyph codes
    * without a CMap are not text in any recoverable sense. */
  private def contentText(s: String, fonts: Map[String, FontInfo]): String = {
    val out = new java.lang.StringBuilder
    val pending = new java.lang.StringBuilder // strings since last operator
    var lastName: String = null // most recent /Name token (Tf operand)
    var font: FontInfo = null
    var i = 0
    def newline(): Unit =
      if (out.length > 0 && out.charAt(out.length - 1) != '\n') out.append('\n')
    def emit(byteStr: String): Unit =
      if (font != null && font.isType0) font.cmap match {
        case Some(cm) => pending.append(cm.decode(byteStr))
        case None => throw new IllegalArgumentException(
          s"pdf: text shown with CID-keyed font /${font.name} that has no " +
            "ToUnicode CMap — glyph codes cannot be mapped to text; " +
            "register a full PDF codec via Readers.registerParser")
      } else pending.append(byteStr)
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i)
          emit(str); i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' =>
          // inline dictionary (e.g. '/Span <</ActualText (x)>> BDC' in
          // tagged PDFs): skip the balanced << >> — treating it as a hex
          // string would crash on the first non-hex char
          var depth = 0
          var j = i
          while (j + 1 < s.length && (depth > 0 || j == i)) {
            if (s.charAt(j) == '<' && s.charAt(j + 1) == '<') { depth += 1; j += 2 }
            else if (s.charAt(j) == '>' && s.charAt(j + 1) == '>') { depth -= 1; j += 2 }
            else j += 1
          }
          i = if (depth > 0) s.length else j
        case '<' =>
          val end = s.indexOf('>', i)
          if (end < 0) i = s.length
          else { emit(hexString(s.substring(i + 1, end))); i = end + 1 }
        case '/' =>
          var j = i + 1
          while (j < s.length && !s.charAt(j).isWhitespace &&
            "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
          lastName = s.substring(i + 1, j)
          i = j
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
            case "Tf" =>
              font = if (lastName != null) fonts.getOrElse(lastName, null)
                     else null
              pending.setLength(0)
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
    // lenient: keep hex digits only (spec allows interspersed whitespace;
    // anything else is malformed — skip it rather than kill the task)
    val clean = hex.filter(c => (c >= '0' && c <= '9') ||
      (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
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
