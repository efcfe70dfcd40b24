package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Handwritten minimal PDFs as string literals: classic table, /Prev
  * chain first-seen-wins, recovery from broken offsets
  * (SURVEY.md §5.3 xref cases; generator covers xref-stream/ObjStm).
  */
class XrefDocSpec extends AnyFunSuite {

  private val inf = new java.util.zip.Inflater()

  /** Assemble a PDF from parts, computing real offsets. */
  private def pdf(objs: Seq[(Int, String)], trailerExtra: String = ""): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, body) =>
      offsets(n) = sb.length
      sb.append(s"$n 0 obj\n$body\nendobj\n")
    }
    val xref = sb.length
    val maxN = objs.map(_._1).max
    sb.append(s"xref\n0 ${maxN + 1}\n")
    (0 to maxN).foreach { n =>
      if (n == 0) sb.append(f"${0}%010d 65535 f \n")
      else sb.append(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")
    }
    sb.append(s"trailer\n<< /Size ${maxN + 1} /Root 1 0 R$trailerExtra >>\nstartxref\n$xref\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  private val baseObjs = Seq(
    1 -> "<< /Type /Catalog /Pages 2 0 R >>",
    2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    3 -> "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    4 -> "<< /Length 44 >>\nstream\nBT /F1 12 Tf 72 720 Td (Hello World) Tj ET\nstream_pad".replace("\nstream_pad", "\nendstream"),
    5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")

  test("classic xref table end-to-end") {
    val doc = new PdfDocument(pdf(baseObjs), inf)
    assert(doc.pages.size == 1)
    val r = PdfExtractor.extract(pdf(baseObjs), inf)
    assert(r.text == "Hello World")
    assert(r.spans.head.kind == "pdf-text")
  }

  test("incremental update: /Prev chain, first-seen wins") {
    // base file, then an update section overriding object 4
    val base = new String(pdf(baseObjs), "ISO-8859-1")
    val xref1 = base.lastIndexOf("xref\n0 ")
    val sb = new StringBuilder(base)
    val newOff = sb.length
    sb.append("4 0 obj\n<< /Length 42 >>\nstream\nBT /F1 12 Tf 72 720 Td (Updated!!) Tj ET\nendstream\nendobj\n")
    val xref2 = sb.length
    sb.append(s"xref\n4 1\n${"%010d".format(newOff)} 00000 n \n")
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $xref1 >>\nstartxref\n$xref2\n%%EOF\n")
    val r = PdfExtractor.extract(sb.toString.getBytes("ISO-8859-1"), inf)
    assert(r.text == "Updated!!")
  }

  test("incremental update frees an object: newer free entry shadows older in-use") {
    // page with TWO content streams; the update deletes the second one
    val objs = baseObjs.map {
      case (3, _) => 3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents [4 0 R 6 0 R] >>")
      case o => o
    } :+ (6 -> "<< /Length 40 >>\nstream\nBT /F1 12 Tf 72 700 Td (Extra) Tj ET\nendstream")
    val base = new String(pdf(objs), "ISO-8859-1")
    assert(PdfExtractor.extract(base.getBytes("ISO-8859-1"), inf).text.contains("Extra"))
    val xref1 = base.lastIndexOf("xref\n0 ")
    val sb = new StringBuilder(base)
    val xref2 = sb.length
    sb.append("xref\n6 1\n0000000000 00001 f \n")
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $xref1 >>\nstartxref\n$xref2\n%%EOF\n")
    val r = PdfExtractor.extract(sb.toString.getBytes("ISO-8859-1"), inf)
    assert(!r.text.contains("Extra"), s"freed object resurrected: '${r.text}'")
    assert(r.text.contains("Hello World"))
  }

  test("wrong startxref offset: recovery via object scan") {
    val good = new String(pdf(baseObjs), "ISO-8859-1")
    // corrupt the startxref number
    val broken = good.replaceAll("startxref\n\\d+", "startxref\n999999")
    val r = PdfExtractor.extract(broken.getBytes("ISO-8859-1"), inf)
    assert(r.text == "Hello World")
  }

  test("xref with only the free head usable (corrupt in-use rows): object-scan recovery") {
    // damage every in-use offset column so the tolerant lexer skips the
    // rows; entries become {0 -> Free}. The Free sentinel must NOT
    // satisfy the recovery gate — extraction must still fall through to
    // the object scan and find the text
    val good = new String(pdf(baseObjs), "ISO-8859-1")
    val broken = "(?m)^\\d{10} 00000 n ".r.replaceAllIn(good, "xxxxxxxxxx 00000 n ")
    val r = PdfExtractor.extract(broken.getBytes("ISO-8859-1"), inf)
    assert(r.text == "Hello World", s"got '${r.text}'")
  }

  test("no trailer at all: catalog discovered by scan") {
    val sb = new StringBuilder("%PDF-1.7\n")
    baseObjs.foreach { case (n, body) => sb.append(s"$n 0 obj\n$body\nendobj\n") }
    val r = PdfExtractor.extract(sb.toString.getBytes("ISO-8859-1"), inf)
    assert(r.text == "Hello World")
  }

  test("encrypted documents are rejected with a typed error") {
    val bytes = pdf(baseObjs, trailerExtra = " /Encrypt 9 0 R")
    val e = intercept[Exception] { PdfExtractor.extract(bytes, inf) }
    assert(e.getMessage == "encrypted")
  }

  test("Type3 widths are glyph-space: scaled by /FontMatrix (§9.6.5)") {
    // FontMatrix a=0.01, /Widths 50 => advance 0.5 em per glyph (not
    // 50/1000 em). Two shows on one line: gap = 13.2 - 2*6.0 = 1.2pt
    // = 0.1 em < 0.18 => NO space. Misreading widths as 1000-em units
    // would compute gap 12pt = 1.0 em and insert a bogus space.
    val t3 = "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 100 100] " +
      "/FontMatrix [0.01 0 0 0.01 0 0] " +
      "/CharProcs << /A 6 0 R /B 6 0 R /C 6 0 R /D 6 0 R >> " +
      "/Encoding << /Type /Encoding /Differences [65 /A /B /C /D] >> " +
      "/FirstChar 65 /LastChar 68 /Widths [50 50 50 50] >>"
    val objs = baseObjs.map {
      case (4, _) => 4 -> ("<< /Length 60 >>\nstream\n" +
        "BT /F1 12 Tf 72 720 Td (AB) Tj 13.2 0 Td (CD) Tj ET\nendstream")
      case (5, _) => 5 -> t3
      case o => o
    } :+ (6 -> "<< /Length 4 >>\nstream\nnull\nendstream")
    val r = PdfExtractor.extract(pdf(objs), inf)
    assert(r.text == "ABCD", s"got '${r.text}'")
  }

  test("per-font degradation: an unsupported font mutes ITS shows, not the document") {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R /F2 6 0 R >> >> /Contents 4 0 R >>"),
      4 -> {
        val c = "BT /F1 12 Tf 72 720 Td (Good text) Tj " +
          "/F2 12 Tf 0 -14.4 Td <81308130> Tj /F1 12 Tf 0 -14.4 Td (more good) Tj ET"
        s"<< /Length ${c.length} >>\nstream\n$c\nendstream"
      },
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>",
      // Hiragana (Adobe-Japan1 1-byte CID CMap) is predefined but not a
      // byte-oriented national-charset family — still typed-degraded
      6 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
        "/Encoding /Hiragana /DescendantFonts [7 0 R] >>"),
      7 -> "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light >>")
    val r = PdfExtractor.extract(pdf(objs), inf)
    assert(r.text == "Good text\nmore good", r.text)
    assert(r.warns == Vector("unsupported-cmap:Hiragana"), r.warns)
  }

  test("Type0 with the 4-byte GB18030 predefined CMap decodes (r5)") {
    // Uni*-UCS2/UTF16 CMaps decode as UTF-16BE since r3, byte-oriented
    // families (GBK-EUC-H etc.) via JDK charsets since r4, and GBK2K's
    // 4-byte codespace via the JDK GB18030 charset since r5
    val objs = baseObjs.map {
      case (5, _) => 5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
        "/Encoding /GBK2K-H /DescendantFonts [6 0 R] >>")
      case (4, _) =>
        val hex4 = "\u2603".getBytes("GB18030").map(b => f"${b & 0xff}%02X").mkString
        val c = s"BT /F1 12 Tf 72 720 Td <BABA$hex4> Tj ET" // \u6C49 + 4-byte \u2603
        4 -> s"<< /Length ${c.length} >>\nstream\n$c\nendstream"
      case o => o
    } :+ (6 -> "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light >>")
    val r = PdfExtractor.extract(pdf(objs), inf)
    assert(r.text == "\u6C49\u2603", r.text)
  }

  test("image-only page classifies no-text-layer; image + text stays clean") {
    val content = "q 200 0 0 200 100 500 cm /Im1 Do Q"
    val imgObjs = baseObjs.map {
      case (3, _) => 3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> /XObject << /Im1 6 0 R >> >> /Contents 4 0 R >>")
      case (4, _) => 4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      case o => o
    } :+ (6 -> ("<< /Subtype /Image /Width 4 /Height 4 /ColorSpace /DeviceGray " +
      "/BitsPerComponent 8 /Length 16 >>\nstream\n0123456789abcdef\nendstream"))
    val e = intercept[Exception] { PdfExtractor.extract(pdf(imgObjs), inf) }
    assert(e.getMessage == "no-text-layer")
    // same image + real text: full text, and the sentinel never leaks
    // into the warn column
    val both = s"$content BT /F1 12 Tf 72 720 Td (With text) Tj ET"
    val bothObjs = imgObjs.map {
      case (4, _) => 4 -> s"<< /Length ${both.length} >>\nstream\n$both\nendstream"
      case o => o
    }
    val r = PdfExtractor.extract(pdf(bothObjs), inf)
    assert(r.text == "With text" && r.warns.isEmpty, (r.text, r.warns))
  }

  test("/Length as indirect reference") {
    val objs = baseObjs.map {
      case (4, _) => 4 -> "<< /Length 6 0 R >>\nstream\nBT /F1 12 Tf 72 720 Td (Indirect) Tj ET\nendstream"
      case o => o
    } :+ (6 -> "41")
    val r = PdfExtractor.extract(pdf(objs), inf)
    assert(r.text == "Indirect")
  }
}
