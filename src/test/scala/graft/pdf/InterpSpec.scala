package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import PdfObj._
import scala.collection.mutable

/** Per-operator micro content streams (SURVEY.md §5.3; §2.3 semantics). */
class InterpSpec extends AnyFunSuite {

  private val inf = new java.util.zip.Inflater()

  /** Minimal doc whose page 1 has the given content + WinAnsi /F1. */
  private def runContent(content: String): String = {
    val doc = new PdfDocument(minimalPdf, inf)
    ContentInterp.run(doc, content.getBytes("ISO-8859-1"),
      doc.pages.head.resources, mutable.Map.empty)
  }

  private lazy val minimalPdf: Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> >>",
      4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val sb = new StringBuilder("%PDF-1.7\n")
    val off = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, b) => off(n) = sb.length; sb.append(s"$n 0 obj\n$b\nendobj\n") }
    val x = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    (1 to 4).foreach(n => sb.append(f"${off(n)}%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  test("Tj basic show") {
    assert(runContent("BT /F1 12 Tf 72 720 Td (Hi there) Tj ET") == "Hi there")
  }

  test("TJ kerning gaps: below threshold no space, above threshold space") {
    // -20/1000 em = 0.02 < 0.18: glued; -250/1000 em = 0.25 >= 0.18: space
    assert(runContent("BT /F1 12 Tf 72 720 Td [(Ker) -20 (ned)] TJ ET") == "Kerned")
    assert(runContent("BT /F1 12 Tf 72 720 Td [(two) -250 (words)] TJ ET") == "two words")
    // threshold boundary: exactly 0.18 em => space (>=)
    assert(runContent("BT /F1 12 Tf 72 720 Td [(a) -180 (b)] TJ ET") == "a b")
    assert(runContent("BT /F1 12 Tf 72 720 Td [(a) -179 (b)] TJ ET") == "ab")
  }

  test("line breaks: Td dy classifies line vs paragraph") {
    assert(runContent("BT /F1 12 Tf 72 720 Td (l1) Tj 0 -14.4 Td (l2) Tj ET") == "l1\nl2")
    assert(runContent("BT /F1 12 Tf 72 720 Td (p1) Tj 0 -28.8 Td (p2) Tj ET") == "p1\n\np2")
    // tiny dy: same line, no break, gap-driven space only if x advances
    assert(runContent("BT /F1 12 Tf 72 720 Td (a) Tj 0 -2 Td (b) Tj ET") == "ab")
  }

  test("T* with TL; ' and \" quote forms") {
    assert(runContent("BT /F1 12 Tf 14.4 TL 72 720 Td (l1) Tj T* (l2) Tj ET") == "l1\nl2")
    assert(runContent("BT /F1 12 Tf 14.4 TL 72 720 Td (l1) Tj (l2) ' ET") == "l1\nl2")
    assert(runContent("BT /F1 12 Tf 14.4 TL 72 720 Td (l1) Tj 0.5 0.1 (l2) \" ET") == "l1\nl2")
  }

  test("Tm absolute positioning line breaks") {
    assert(runContent("BT /F1 12 Tf 1 0 0 1 72 720 Tm (l1) Tj 1 0 0 1 72 705.6 Tm (l2) Tj ET") == "l1\nl2")
  }

  test("WinAnsi high bytes decode (é = 0xE9, € = 0x80)") {
    assert(runContent("BT /F1 12 Tf 72 720 Td (caf\\351 \\200) Tj ET") == "café €")
  }

  test("form XObject recursion shares assembly state") {
    // XObject missing from resources: Do is a safe no-op
    assert(runContent("BT /F1 12 Tf 72 720 Td (a) Tj ET /Missing Do BT /F1 12 Tf 1 0 0 1 72 691.2 Tm (b) Tj ET") == "a\n\nb")
  }

  test("inline image with embedded EI bytes does not desync the lexer") {
    val c = "BT /F1 12 Tf 72 720 Td (before) Tj ET " +
      "BI /W 2 /H 2 /BPC 8 /CS /G ID EIxyEIzw8 EI " +
      "BT /F1 12 Tf 1 0 0 1 72 691.2 Tm (after) Tj ET"
    assert(runContent(c) == "before\n\nafter")
  }

  test("marked content and unknown operators are arity-safe no-ops") {
    val c = "/Artifact BMC BT /F1 12 Tf 72 720 Td (kept) Tj ET EMC " +
      "0.5 0.5 0.5 rg 1 2 3 4 re f 9 9 moveto_unknown"
    assert(runContent(c) == "kept")
  }

  test("q/Q preserve text state; render mode 3 still extracted") {
    val c = "q BT /F1 12 Tf 3 Tr 72 720 Td (invisible) Tj ET Q"
    assert(runContent(c) == "invisible")
  }

  test("render-mode-3 ranges are tracked and span-tagged; text bytes unchanged (r5)") {
    val doc = new PdfDocument(minimalPdf, inf)
    def page(c: String) = ContentInterp.runPage(doc, c.getBytes("ISO-8859-1"),
      doc.pages.head.resources, mutable.Map.empty)
    // visible line, then an invisible one (the OCR-overlay shape)
    val c = "BT /F1 12 Tf 72 720 Td (seen) Tj 3 Tr 0 -14.4 Td (ghost text) Tj 0 Tr ET"
    val (text, hid) = page(c)
    assert(text == "seen\nghost text", text)
    assert(hid == Vector((5, 15)), hid.toString) // exactly "ghost text"
    // TJ kern-split inside Tr 3 merges into ONE range across the gap space
    val c2 = "BT /F1 12 Tf 3 Tr 72 720 Td [(ab) -250 (cd)] TJ ET"
    val (t2, h2) = page(c2)
    assert(t2 == "ab cd", t2)
    assert(h2 == Vector((0, 5)), h2.toString)
    // no Tr 3 -> no ranges
    assert(page("BT /F1 12 Tf 72 720 Td (plain) Tj ET")._2.isEmpty)
  }

  test("word spacing applies to advance only, not output") {
    assert(runContent("BT /F1 12 Tf 5 Tw 72 720 Td (a b) Tj ET") == "a b")
  }

  test("rotated text matrices assemble via baseline projections (r5)") {
    // quarter-turn CCW: baseline +y, lines advance +x. Two lines 14.4pt
    // apart -> '\n'; paragraph step 28.8 -> '\n\n'
    val c = "BT /F1 12 Tf " +
      "0 1 -1 0 72 72 Tm (first line) Tj " +
      "0 1 -1 0 86.4 72 Tm (second line) Tj " +
      "0 1 -1 0 115.2 72 Tm (new para) Tj ET"
    assert(runContent(c) == "first line\nsecond line\n\nnew para")
    // same rotated line, a wide along-baseline (y) gap reads as a space:
    // "AB" advances pen to y = 72 + ~2*6.67... use an explicit re-Tm at
    // a y well past the pen (72 + 40): gap >> 0.18 em
    val c2 = "BT /F1 12 Tf 0 1 -1 0 72 72 Tm (AB) Tj 0 1 -1 0 72 120 Tm (CD) Tj ET"
    assert(runContent(c2) == "AB CD")
    // and a kern-sized move stays seamless (pen after (AB) at
    // y = 72 + 2*width; width(A)=width(B)=667/1000*12=8.004 -> pen 88.008;
    // next Tm at 88.2 -> gap 0.192pt = 0.016 em < 0.18)
    val c3 = "BT /F1 12 Tf 0 1 -1 0 72 72 Tm (AB) Tj 0 1 -1 0 72 88.2 Tm (CD) Tj ET"
    assert(runContent(c3) == "ABCD")
    // axis-aligned documents are BIT-identical through the projection
    // (a=1,b=0: hypot=1 exactly): same content both ways
    assert(runContent("BT /F1 12 Tf 72 720 Td (Hi there) Tj ET") == "Hi there")
  }
}
