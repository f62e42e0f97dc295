package graft

import java.nio.file.Files
import graft.sources.{DocumentSources, Ocr}
import graft.sources.DocFormats.MinimalPdf

/** The scanned-page OCR tier (round 13): glyph atlas, raster round trip,
  * page-tree walk, quarantine posture, lenient-ingestion integration.
  */
class OcrSpec extends SparkSpec {

  /** The q153 reconstruction: wrap at `cols`, rtrim each line (no ink ⇒
    * trailing spaces unrecoverable), join with \n — the same formula the
    * DuckDB oracle spells with generate_series + rtrim + string_agg.
    */
  private def expectedOcr(text: String, cols: Int): String =
    Ocr.wrap(text, cols).map(_.replaceAll(" +$", "")).mkString("\n")

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(b); d.close(); bos.toByteArray
  }

  /** The SourcesSpec multi-object builder (spec-local by design there too). */
  private def buildPdf(objs: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = Array.newBuilder[Int]
    w("%PDF-1.4\n")
    objs.foreach { case (n, dict, st) =>
      offsets += out.size()
      st match {
        case None => w(s"$n 0 obj $dict endobj\n")
        case Some(b) =>
          w(s"$n 0 obj $dict stream\n"); out.write(b); w("\nendstream endobj\n")
      }
    }
    val xrefAt = out.size()
    val offs = offsets.result()
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer << /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** A gray image XObject page (obj 3 page, 4 content, 5 image). */
  private def grayImagePdf(img: Ocr.GrayImage,
      extraPage: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val z = deflate(img.pixels)
    val imgC = s"q ${img.width} 0 0 ${img.height} 72 72 cm /Im0 Do Q"
      .getBytes("ISO-8859-1")
    val base = Seq(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, if (extraPage.isDefined)
            "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>"
          else "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources " +
        "<< /XObject << /Im0 5 0 R >> >> >>", None),
      (4, s"<< /Length ${imgC.length} >>", Some(imgC)),
      (5, "<< /Type /XObject /Subtype /Image " +
        s"/Width ${img.width} /Height ${img.height} /ColorSpace /DeviceGray " +
        s"/BitsPerComponent 8 /Filter /FlateDecode /Length ${z.length} >>",
        Some(z)))
    extraPage match {
      case None => buildPdf(base)
      case Some((_, textC)) => buildPdf(base ++ Seq(
        (6, "<< /Type /Page /Parent 2 0 R /Contents 7 0 R /Resources " +
          "<< /Font << /F1 8 0 R >> >> >>", None),
        (7, s"<< /Length ${textC.length} >>", Some(textC)),
        (8, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None)))
    }
  }

  test("glyph atlas: 94 distinct nonzero ink glyphs, blank space, charset guard") {
    val pats = (Ocr.CharsetFirst to Ocr.CharsetLast).map(Ocr.glyphPattern)
    assert(pats.size == 95)
    assert(Ocr.glyphPattern(' ') == 0L)
    val ink = pats.filter(_ != 0L)
    assert(ink.size == 94 && ink.distinct.size == 94)
    // single-pixel noise can never alias to another glyph: min pairwise
    // Hamming distance over ink glyphs is 7 (measured once, frozen here)
    val minHam = (for {
      i <- ink.indices; j <- (i + 1) until ink.size
    } yield java.lang.Long.bitCount(ink(i) ^ ink(j))).min
    assert(minHam == 7)
    intercept[IllegalArgumentException](Ocr.glyphPattern('\n'))
    intercept[IllegalArgumentException](Ocr.glyphPattern('é'))
  }

  test("wrap: exact multiples, shorter tail, empty text") {
    assert(Ocr.wrap("", 10).isEmpty)
    assert(Ocr.wrap("abcde", 5) == Seq("abcde"))
    assert(Ocr.wrap("abcdef", 5) == Seq("abcde", "f"))
    assert(Ocr.wrap("abcdefghij", 5) == Seq("abcde", "fghij"))
  }

  test("render -> ocr round trip: rtrim semantics, property over the charset") {
    import org.scalacheck.{Gen, Prop}
    val lineGen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Ocr.CharsetFirst.toInt, Ocr.CharsetLast.toInt)
        .map(_.toChar)).map(_.mkString))
    val pageGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, lineGen))
    checkProp(Prop.forAll(pageGen) { lines =>
      val got = Ocr.ocr(Ocr.renderPage(lines, 24)).get
      got == lines.map(_.replaceAll(" +$", "")).mkString("\n")
    })
    // trailing spaces are the ONLY loss: a page with none round-trips exactly
    val exact = Seq("no trailing here", "  leading kept", "", "x")
    assert(Ocr.ocr(Ocr.renderPage(exact, 20)).get == exact.mkString("\n"))
  }

  test("ocr refusals: gap ink, non-binary level, unknown glyph; off-grid skipped") {
    val img = Ocr.renderPage(Seq("AB"), 4)
    def withPixel(x: Int, y: Int, v: Byte): Ocr.GrayImage = {
      val px = img.pixels.clone(); px(y * img.width + x) = v
      Ocr.GrayImage(img.width, img.height, px)
    }
    // ink in the 1-px cell gap (x=5 is col 0's gap column)
    intercept[IllegalArgumentException](Ocr.ocr(withPixel(5, 0, Ocr.Ink)))
    // a gray (non-binary) pixel level
    intercept[IllegalArgumentException](Ocr.ocr(withPixel(0, 0, 0x80.toByte)))
    // flip one in-glyph pixel: min atlas Hamming 7 means the result can
    // only be an UNKNOWN pattern, never another char
    val inGlyph = (0 until Ocr.GlyphW * Ocr.GlyphH).find { bit =>
      val x = bit % Ocr.GlyphW; val y = bit / Ocr.GlyphW
      img.pixels(y * img.width + x) == Ocr.Bg
    }.get
    intercept[IllegalArgumentException](Ocr.ocr(
      withPixel(inGlyph % Ocr.GlyphW, inGlyph / Ocr.GlyphW, Ocr.Ink)))
    // rasters off the cell pitch are not scans: skipped, never a throw
    assert(Ocr.ocr(Ocr.GrayImage(7, 9, Array.fill(63)(Ocr.Bg))).isEmpty)
    assert(Ocr.ocr(Ocr.GrayImage(0, 0, Array.empty)).isEmpty)
  }

  test("writeScanned -> extractTextOcr: the q153 round trip; default path stays empty") {
    val text = "The quick brown fox! 0123456789 (all printable ASCII ok) " +
      "and a second wrapped line with    interior   spaces kept"
    val pdf = MinimalPdf.writeScanned(text, cols = 40)
    assert(MinimalPdf.extractTextOcr(pdf) == expectedOcr(text, 40))
    // without OCR the scan is EMPTY text — reference parity unchanged
    assert(MinimalPdf.extractText(pdf) == "")
    // cols boundary: text an exact multiple of cols
    val exact40 = "x" * 80
    assert(MinimalPdf.extractTextOcr(MinimalPdf.writeScanned(exact40, 40)) ==
      ("x" * 40) + "\n" + ("x" * 40))
  }

  test("extractTextOcr == extractText on every text-writer fixture") {
    val text = "line one\nline two (with) escapes\\ and\ttabs\n\nafter blank"
    for (pdf <- Seq(MinimalPdf.write(text), MinimalPdf.writeObjStm(text),
        MinimalPdf.writeObjStm(text, usePredictor = true),
        MinimalPdf.writeWithToUnicode(text)))
      assert(MinimalPdf.extractTextOcr(pdf) == MinimalPdf.extractText(pdf))
  }

  test("mixed document: scanned page OCR'd, text page extracted, page order kept") {
    val img = Ocr.renderPage(Seq("scanned words"), 16)
    val textC = "BT /F1 12 Tf (typed words) Tj ET".getBytes("ISO-8859-1")
    val pdf = grayImagePdf(img, Some(("p2", textC)))
    assert(MinimalPdf.extractTextOcr(pdf) == "scanned words\ntyped words")
    // the default walk sees only the text page (no text operators on p1)
    assert(MinimalPdf.extractText(pdf) == "typed words")
  }

  test("unreadable scan quarantines; unsupported rasters are skipped silently") {
    // grid-aligned raster with one flipped pixel: unknown glyph -> throw
    val img = Ocr.renderPage(Seq("AB"), 4)
    val px = img.pixels.clone()
    val flipAt = (0 until Ocr.GlyphW * Ocr.GlyphH).find { bit =>
      px((bit / Ocr.GlyphW) * img.width + bit % Ocr.GlyphW) == Ocr.Bg
    }.get
    px((flipAt / Ocr.GlyphW) * img.width + flipAt % Ocr.GlyphW) = Ocr.Ink
    intercept[IllegalArgumentException](MinimalPdf.extractTextOcr(
      grayImagePdf(Ocr.GrayImage(img.width, img.height, px))))
    // an off-grid gray raster (a real photo shape): empty text, no throw
    val photo = Ocr.GrayImage(7, 9, Array.fill(63)(Ocr.Bg))
    assert(MinimalPdf.extractTextOcr(grayImagePdf(photo)) == "")
  }

  test("ingestion: ocrExtractors read scans, quarantine unreadable, default unchanged") {
    val dir = Files.createTempDirectory("ocrdocs").toFile
    Files.write(new java.io.File(dir, "scan.pdf").toPath,
      MinimalPdf.writeScanned("recovered by ocr", 20))
    Files.write(new java.io.File(dir, "typed.pdf").toPath,
      MinimalPdf.write("plain typed text"))
    // unreadable: valid gray raster, unknown glyph pattern
    val img = Ocr.renderPage(Seq("Z"), 2)
    val px = img.pixels.clone()
    val at = (0 until Ocr.GlyphW * Ocr.GlyphH)
      .find(b => px((b / Ocr.GlyphW) * img.width + b % Ocr.GlyphW) == Ocr.Bg).get
    px((at / Ocr.GlyphW) * img.width + at % Ocr.GlyphW) = Ocr.Ink
    Files.write(new java.io.File(dir, "noisy.pdf").toPath,
      grayImagePdf(Ocr.GrayImage(img.width, img.height, px)))
    val rows = DocumentSources.readDocumentsLenient(spark, dir.getAbsolutePath,
        DocumentSources.ocrExtractors)
      .collect().map(r => r._1.filename -> (r._1.text, r._2)).toMap
    assert(rows("scan.pdf") == (("recovered by ocr", None)))
    assert(rows("typed.pdf") == (("plain typed text", None)))
    assert(rows("noisy.pdf")._1 == "")
    assert(rows("noisy.pdf")._2.exists(_.contains("unknown glyph")))
    // the DEFAULT extractors still extract scans as empty (reference parity)
    val defaults = DocumentSources.readDocumentsLenient(spark, dir.getAbsolutePath)
      .collect().map(r => r._1.filename -> (r._1.text, r._2)).toMap
    assert(defaults("scan.pdf") == (("", None)))
    assert(defaults("noisy.pdf") == (("", None)))
    assert(defaults("typed.pdf") == (("plain typed text", None)))
  }
}
