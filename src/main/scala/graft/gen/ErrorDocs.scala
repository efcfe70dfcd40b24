package graft.gen

/** Deterministic mini-corpus of DEFECTIVE payloads for the error
  * taxonomy query (x6): at 100 TB every failure class must surface as
  * a countable, distinctly-tagged error row — never a silent empty
  * text (SURVEY.md §2.7; VERDICT r1 item 10).
  */
object ErrorDocs {

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Minimal valid PDF around `extraObjs` (object 5 is the /F1 font). */
  private def pdf(font: String, trailerExtra: String = ""): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> {
        val content = "BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"
        s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      },
      5 -> font,
      6 -> "<< /Type /CIDFontType0 /BaseFont /STSong-Light >>")
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
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R$trailerExtra >>\nstartxref\n$xref\n%%EOF\n")
    latin1(sb.toString)
  }

  private val helvetica =
    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
  private val cjkNoToUnicode =
    "<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light " +
      "/Encoding /UniGB-UCS2-H /DescendantFonts [6 0 R] >>"

  /** (url, payload) rows covering the error taxonomy + healthy rows. */
  def docs(): Seq[(String, Array[Byte])] = Seq(
    ("err://ok-pdf", pdf(helvetica)),
    ("err://ok-html", latin1("<html><head><title>T</title></head><body><p>Fine paragraph content here.</p></body></html>")),
    ("err://encrypted", pdf(helvetica, trailerExtra = " /Encrypt 9 0 R")),
    ("err://cjk-cmap", pdf(cjkNoToUnicode)),
    ("err://pdf-junk", latin1("%PDF-1.7\njust junk, no objects at all")),
    // 30 bytes cuts inside the catalog dict: recovery finds the object
    // header but no /Root -> hard error (at 80 bytes the object scan
    // would "succeed" into a 0-page doc — the silent-empty case is
    // covered by err://empty instead)
    ("err://pdf-truncated", pdf(helvetica).take(30)),
    ("err://empty", Array.empty[Byte]))
}
