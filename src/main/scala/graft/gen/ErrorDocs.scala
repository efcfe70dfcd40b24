package graft.gen

/** Deterministic mini-corpus of DEFECTIVE payloads for the error
  * taxonomy query (x6): at 100 TB every failure class must surface as
  * a countable, distinctly-tagged error row — never a silent empty
  * text (SURVEY.md §2.7; VERDICT r1 item 10).
  */
object ErrorDocs {

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Minimal valid PDF around `extraObjs` (object 5 is the /F1 font). */
  private def pdf(font: String, trailerExtra: String = "",
                  extraObjs: Seq[(Int, String)] = Nil,
                  show: String = "(Hello World) Tj",
                  rawContent: Option[String] = None,
                  resExtra: String = ""): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        s"<< /Font << /F1 5 0 R >>$resExtra >> /Contents 4 0 R >>"),
      4 -> {
        val content = rawContent.getOrElse(s"BT /F1 12 Tf 72 720 Td $show ET")
        s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      },
      5 -> font,
      6 -> "<< /Type /CIDFontType0 /BaseFont /STSong-Light >>") ++ extraObjs
    val maxNum = objs.map(_._1).max
    val sb = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, body) =>
      offsets(n) = sb.length
      sb.append(s"$n 0 obj\n$body\nendobj\n")
    }
    val xref = sb.length
    sb.append(s"xref\n0 ${maxNum + 1}\n")
    (0 to maxNum).foreach { n =>
      if (n == 0) sb.append(f"${0}%010d 65535 f \n")
      else sb.append(f"${offsets(n)}%010d 00000 n \n")
    }
    sb.append(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R$trailerExtra >>\nstartxref\n$xref\n%%EOF\n")
    latin1(sb.toString)
  }

  private val helvetica =
    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
  /** Byte-oriented predefined CMap (r4: DECODES — code bytes are GBK
    * text, recovered through the JDK charset decoder; pdf/PredefCMaps).
    * The ASCII show string below is valid single-byte GBK.
    */
  private val cjkNoToUnicode =
    "<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
      "/Encoding /GBK-EUC-H /DescendantFonts [6 0 R] >>"
  private val cjkUcs2 =
    "<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
      "/Encoding /UniGB-UCS2-H /DescendantFonts [6 0 R] >>"
  /** GB18030 (GBK2K family): r5 DECODES, including the 4-byte
    * codespace <81308130> <FE39FE39> — the show below mixes a 2-byte
    * GBK code with a genuine 4-byte one.
    */
  private val cjkGb18030 =
    "<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
      "/Encoding /GBK2K-H /DescendantFonts [6 0 R] >>"
  private val gb18030Show = {
    def hex(cp: String) = cp.getBytes("GB18030").map(b => f"${b & 0xff}%02X").mkString
    // U+6C49 (2-byte) + U+2603 (4-byte, first byte 0x81) + U+4DB6
    // (4-byte, FIRST BYTE 0x82: its leading two bytes pack >= 0x8140,
    // so only BYTE-WISE codespace matching splits it correctly —
    // ADVICE r5 high, exercised end-to-end here since r6)
    s"<BABA${hex("\u2603")}${hex("\u4db6")}BABA> Tj"
  }

  private def cmapObj(body: String): String =
    s"<< /Length ${body.length} >>\nstream\n$body\nendstream"

  /** Embedded CMap stream as /Encoding (legal, §9.7.6.2), inheriting a
    * byte-oriented base via usecmap (r4: DECODES — overrides touch only
    * glyph selection/widths; the code bytes stay GBK text).
    */
  private val embeddedCMapFont =
    "<< /Type /Font /Subtype /Type0 /BaseFont /Custom-CID " +
      "/Encoding 7 0 R /DescendantFonts [6 0 R] >>"
  private val embeddedCMapStream = cmapObj(
    "%!PS-Adobe-3.0 Resource-CMap\n/GBK-EUC-H usecmap\n" +
      "1 begincidchar\n<8140> 9999\nendcidchar\n")

  /** Embedded CMap with raw Identity-ordering CIDs and no /ToUnicode:
    * genuinely unmappable → DISTINCT typed tag (ADVICE r2), not the
    * generic `:none`.
    */
  private val embeddedIdentityStream = cmapObj(
    "%!PS-Adobe-3.0 Resource-CMap\n1 begincidrange\n<00> <FF> 0\nendcidrange\n")

  /** /Encrypt dict with a /U that matches NO password (all-zero O/U):
    * decryptable-looking structure, wrong credentials → the empty-user-
    * password attempt must fail TYPED, not garble text.
    */
  private val zeros64 = "0" * 64
  private val encPassword =
    s"<< /Filter /Standard /V 2 /R 3 /Length 128 /O <$zeros64> /U <$zeros64> /P -44 >>"
  private val encUnsupported = // /V 3 is the unpublished Adobe algorithm
    s"<< /Filter /Standard /V 3 /R 3 /Length 128 /O <$zeros64> /U <$zeros64> /P -44 >>"

  /** (url, payload) rows covering the error taxonomy + healthy rows. */
  def docs(): Seq[(String, Array[Byte])] = Seq(
    ("err://ok-pdf", pdf(helvetica)),
    ("err://ok-html", latin1("<html><head><title>T</title></head><body><p>Fine paragraph content here.</p></body></html>")),
    ("err://encrypted", pdf(helvetica, trailerExtra = " /Encrypt 9 0 R")),
    ("err://encrypted-password",
      pdf(helvetica, trailerExtra = " /Encrypt 7 0 R", extraObjs = Seq(7 -> encPassword))),
    ("err://encrypted-unsupported",
      pdf(helvetica, trailerExtra = " /Encrypt 7 0 R", extraObjs = Seq(7 -> encUnsupported))),
    ("err://cjk-cmap", pdf(cjkNoToUnicode)),
    ("err://cmap-gb18030", pdf(cjkGb18030, show = gb18030Show)),
    ("err://cmap-embedded",
      pdf(embeddedCMapFont, extraObjs = Seq(7 -> embeddedCMapStream))),
    ("err://cmap-embedded-identity",
      pdf(embeddedCMapFont, extraObjs = Seq(7 -> embeddedIdentityStream))),
    // a scanned-style page: one image XObject, zero text operators —
    // must classify as the countable no-text-layer class (r4), never a
    // silent empty row
    ("err://image-only",
      pdf(helvetica,
        rawContent = Some("q 200 0 0 200 100 500 cm /Im1 Do Q"),
        resExtra = " /XObject << /Im1 7 0 R >>",
        extraObjs = Seq(7 -> ("<< /Subtype /Image /Width 4 /Height 4 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 16 >>\nstream\n" +
          "0123456789abcdef" + "\nendstream")))),
    // UTF-16BE hex codes for 漢字文本 — decodes via the CMap name alone
    ("err://ok-cjk-ucs2", pdf(cjkUcs2, show = "<6F225B576587672C> Tj")),
    ("err://pdf-junk", latin1("%PDF-1.7\njust junk, no objects at all")),
    // 30 bytes cuts inside the catalog dict: recovery finds the object
    // header but no /Root -> hard error (at 80 bytes the object scan
    // would "succeed" into a 0-page doc — the silent-empty case is
    // covered by err://empty instead)
    ("err://pdf-truncated", pdf(helvetica).take(30)),
    ("err://empty", Array.empty[Byte]))
}
