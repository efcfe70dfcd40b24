package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** CMap + glyph mapping cases (SURVEY.md §5.3; ISO 32000-1 §9.10). */
class FontsSpec extends AnyFunSuite {

  test("bfchar: hex destinations incl. multi-char") {
    val cmap = ToUnicodeCMap.parse(
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <00> <FF> endcodespacerange
        |3 beginbfchar
        |<41> <0041>
        |<42> <03B2>
        |<43> <00660066>
        |endbfchar
        |endcmap end""".stripMargin.getBytes("ISO-8859-1"))
    assert(cmap.lookup(0x41).contains("A"))
    assert(cmap.lookup(0x42).contains("β"))
    assert(cmap.lookup(0x43).contains("ff"))
    assert(cmap.lookup(0x44).isEmpty)
  }

  test("bfrange: incrementing form and array form") {
    val cmap = ToUnicodeCMap.parse(
      """begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfrange
        |<0200> <0219> <0061>
        |endbfrange
        |1 beginbfrange
        |<0100> <0102> [<0058> <0059> <005A>]
        |endbfrange
        |endcmap""".stripMargin.getBytes("ISO-8859-1"))
    assert(cmap.lookup(0x0200).contains("a"))
    assert(cmap.lookup(0x0219).contains("z"))
    assert(cmap.lookup(0x0100).contains("X"))
    assert(cmap.lookup(0x0102).contains("Z"))
  }

  test("bfrange with surrogate pair destination") {
    val cmap = ToUnicodeCMap.parse(
      """begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfchar
        |<0400> <D835DC9C>
        |endbfchar
        |endcmap""".stripMargin.getBytes("ISO-8859-1"))
    assert(cmap.lookup(0x0400).contains(new String(Character.toChars(0x1D49C))))
  }

  test("codespace drives variable code lengths") {
    val cmap = ToUnicodeCMap.parse(
      """begincmap
        |2 begincodespacerange
        |<00> <80>
        |<8140> <FFFF>
        |endcodespacerange
        |endcmap""".stripMargin.getBytes("ISO-8859-1"))
    assert(cmap.codeLen(Array(0x41.toByte, 0x42.toByte), 0) == 1)
    assert(cmap.codeLen(Array(0x81.toByte, 0x42.toByte), 0) == 2)
  }

  test("simple font always consumes 1 byte per code despite a 2-byte template codespace") {
    // real-world simple fonts often ship template ToUnicode CMaps with
    // <0000> <FFFF> — must NOT fuse byte pairs for non-Type0 fonts
    val cmap = ToUnicodeCMap.parse(
      """begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<48> <0048>
        |<69> <0069>
        |endbfchar
        |endcmap""".stripMargin.getBytes("ISO-8859-1"))
    val font = FontInfo("F1", "Type1", 1, cmap, Glyphs.winAnsi, Map.empty,
      Map.empty, 500, isType0 = false, identityCid = false)
    assert(font.codes(Array(0x48.toByte, 0x69.toByte)).toSeq == Seq(0x48, 0x69))
    // Type0 with the same codespace DOES split 2-byte codes
    val t0 = FontInfo("F2", "Type0", 2, cmap, null, Map.empty,
      Map.empty, 1000, isType0 = true, identityCid = true)
    assert(t0.codes(Array(0x48.toByte, 0x69.toByte)).toSeq == Seq(0x4869))
  }

  test("AGL: names, uniXXXX, uXXXXX, suffixed") {
    assert(Glyphs.glyphToUnicode("alpha").contains("α"))
    assert(Glyphs.glyphToUnicode("Euro").contains("€"))
    assert(Glyphs.glyphToUnicode("uni0041").contains("A"))
    assert(Glyphs.glyphToUnicode("uni00480049").contains("HI"))
    assert(Glyphs.glyphToUnicode("u1D49C").contains(new String(Character.toChars(0x1D49C))))
    assert(Glyphs.glyphToUnicode("a.sc").contains("a"))
    assert(Glyphs.glyphToUnicode("g123").isEmpty)
  }

  test("Core-14 AFM widths: families, aliases, accent fallback") {
    val h = Glyphs.afmTable("Helvetica").get
    assert(Glyphs.afmWidthAt(h, ' ') == 278)
    assert(Glyphs.afmWidthAt(h, 'i') == 222)
    assert(Glyphs.afmWidthAt(h, 'W') == 944)
    assert(Glyphs.afmWidthAt(h, '@') == 1015)
    // oblique shares upright metrics; bold differs
    assert(Glyphs.afmTable("Helvetica-Oblique").get eq h)
    assert(Glyphs.afmWidthAt(Glyphs.afmTable("Helvetica-Bold").get, 'a') == 556)
    val t = Glyphs.afmTable("Times-Roman").get
    assert(Glyphs.afmWidthAt(t, ' ') == 250)
    assert(Glyphs.afmWidthAt(t, 'f') == 333)
    assert(Glyphs.afmWidthAt(Glyphs.afmTable("Times-BoldItalic").get, 'M') == 889)
    // accented Latin falls back to the base letter's width
    assert(Glyphs.afmWidthAt(h, 'é') == Glyphs.afmWidthAt(h, 'e'))
    assert(Glyphs.afmWidthAt(h, 'Ä') == Glyphs.afmWidthAt(h, 'A'))
    // fixed-pitch + aliases + subset prefixes
    assert(Glyphs.stdWidth("Courier-BoldOblique", 'm') == 600)
    assert(Glyphs.stdWidth("ABCDEF+ArialMT", 'i') == 222)
    assert(Glyphs.stdWidth("TimesNewRomanPSMT", ' ') == 250)
    // non-base-14 → class-average fallback
    assert(Glyphs.afmTable("SomeCustomFont").isEmpty)
    assert(Glyphs.stdWidth("SomeCustomFont", 'x') == 500)
    // exotic glyph in a base-14 font → fallback
    assert(Glyphs.stdWidth("Helvetica", '漢') == 500)
  }

  test("WinAnsi spot checks") {
    assert(Glyphs.winAnsi('A') == 'A'.toInt)
    assert(Glyphs.winAnsi(0x80) == 0x20AC) // €
    assert(Glyphs.winAnsi(0x93) == 0x201C) // "
    assert(Glyphs.winAnsi(0xE9) == 0x00E9) // é
    assert(Glyphs.winAnsi(0x9F) == 0x0178) // Ÿ
    assert(Glyphs.winAnsi(0x8D) == -1) // undefined slot
  }

  test("MacRoman + Standard spot checks") {
    assert(Glyphs.macRoman(0x8E) == 0x00E9) // é
    assert(Glyphs.macRoman(0xD0) == 0x2013) // –
    assert(Glyphs.standard(0x27) == 0x2019) // quoteright
    assert(Glyphs.standard(0xA4) == 0x2044) // fraction
  }

  /** Minimal one-page PDF with a Type0 font bound to a predefined CMap
    * by NAME (no /ToUnicode anywhere) and a hex show string.
    */
  private def cmapDoc(cmap: String, hexCodes: String): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> {
        val content = s"BT /F1 12 Tf 72 720 Td <$hexCodes> Tj ET"
        s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      },
      5 -> (s"<< /Type /Font /Subtype /Type0 /BaseFont /Synth /Encoding /$cmap " +
        "/DescendantFonts [6 0 R] >>"),
      6 -> ("<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Synth " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) /Supplement 5 >> /DW 1000 >>"))
    val sb = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, body) =>
      offsets(n) = sb.length
      sb.append(s"$n 0 obj\n$body\nendobj\n")
    }
    val xref = sb.length
    sb.append("xref\n0 7\n")
    (0 to 6).foreach { n =>
      if (n == 0) sb.append(f"${0}%010d 65535 f \n")
      else sb.append(f"${offsets(n)}%010d 00000 n \n")
    }
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  test("predefined Uni*-UCS2/UTF16 CMaps decode as UTF-16BE without ToUnicode") {
    val inflater = new java.util.zip.Inflater()
    // BMP CJK through UniGB-UCS2-H
    val r1 = PdfExtractor.extract(cmapDoc("UniGB-UCS2-H", "6F225B576587672C"), inflater)
    assert(r1.text == "\u6f22\u5b57\u6587\u672c", r1.text) // 漢字文本
    // surrogate pair (U+1D49C) through UniJIS-UTF16-H: two 2-byte codes
    val r2 = PdfExtractor.extract(cmapDoc("UniJIS-UTF16-H", "D835DC9C0041"), inflater)
    assert(r2.text == new String(Character.toChars(0x1D49C)) + "A", r2.text)
    // Korean family name variant
    val r3 = PdfExtractor.extract(cmapDoc("UniKS-UCS2-V", "D55CAE00"), inflater)
    assert(r3.text == "\ud55c\uae00", r3.text) // 한글
    // a BYTE-oriented predefined CMap must stay a typed error row
    val ex = intercept[Exception] {
      PdfExtractor.extract(cmapDoc("GBK-EUC-H", "BABA"), inflater)
    }
    assert(ex.getMessage == "unsupported-cmap:GBK-EUC-H")
  }

  test("Symbol/ZapfDingbats built-in encodings + Symbol AFM widths") {
    assert(Glyphs.symbol('a') == 0x03B1) // alpha
    assert(Glyphs.symbol('q') == 0x03B8) // theta (Symbol layout)
    assert(Glyphs.symbol('W') == 0x03A9) // Omega
    assert(Glyphs.symbol('J') == 0x03D1) // theta1
    assert(Glyphs.symbol('5') == '5'.toInt)
    assert(Glyphs.symbol(0x2D) == 0x2212) // minus sign
    assert(Glyphs.dingbats(0x21) == 0x2701 && Glyphs.dingbats(0x7E) == 0x275E)
    assert(Glyphs.symbolCodeWidths('a') == 631)
    assert(Glyphs.symbolCodeWidths('m') == 576)
    assert(Glyphs.symbolCodeWidths(0x20) == 250)
    assert(Glyphs.defaultWidth("ZapfDingbats") == 740)
  }

  test("a /Symbol font without /Encoding or /Widths extracts Greek") {
    val inflater = new java.util.zip.Inflater()
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> {
        val content = "BT /F1 12 Tf 72 720 Td (abgd wq) Tj ET"
        s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      },
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")
    val sb = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, body) =>
      offsets(n) = sb.length
      sb.append(s"$n 0 obj\n$body\nendobj\n")
    }
    val xref = sb.length
    sb.append("xref\n0 6\n")
    (0 to 5).foreach { n =>
      if (n == 0) sb.append(f"${0}%010d 65535 f \n")
      else sb.append(f"${offsets(n)}%010d 00000 n \n")
    }
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = PdfExtractor.extract(sb.toString.getBytes("ISO-8859-1"), inflater)
    assert(r.text == "\u03b1\u03b2\u03b3\u03b4 \u03c9\u03b8", r.text) // αβγδ ωθ
  }
}
