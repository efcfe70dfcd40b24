package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.CorpusGen
import graft.pdf.PdfExtractor
import graft.html.HtmlExtractor

/** Golden roundtrip: generator output must extract byte-identically
  * (SURVEY.md §5.2 — the correctness gate of BASELINE.json:15).
  */
class RoundtripSpec extends AnyFunSuite {

  private val inflater = new java.util.zip.Inflater()

  /** Compare with a readable diff on mismatch. */
  private def assertTextEqual(url: String, got: String, want: String): Unit = {
    if (got != want) {
      val i = got.zip(want).indexWhere { case (a, b) => a != b }
      val at = if (i < 0) math.min(got.length, want.length) else i
      val lo = math.max(0, at - 60)
      fail(
        s"""text mismatch for $url at char $at (got len ${got.length}, want len ${want.length})
           |  got:  ...${got.slice(lo, at + 60).replace("\n", "\\n")}
           |  want: ...${want.slice(lo, at + 60).replace("\n", "\\n")}""".stripMargin)
    }
  }

  test("PDF docs roundtrip byte-identically across the feature matrix") {
    // docIds 0,3,6,... are PDFs; 700 PDFs covers all axis combinations
    (0 until 2100 by 3).foreach { id =>
      val g = CorpusGen.doc(id.toLong)
      assert(g.kind == "pdf")
      val r = PdfExtractor.extract(g.payload, inflater)
      assertTextEqual(g.url, r.text, g.expectedText)
      assert(r.spans == g.expectedSpans, s"span mismatch for ${g.url}")
    }
  }

  test("HTML docs roundtrip byte-identically across the feature matrix") {
    val ids = (0 until 2100).filter(_ % 3 != 0)
    ids.foreach { id =>
      val g = CorpusGen.doc(id.toLong)
      assert(g.kind == "html")
      val r = HtmlExtractor.extract(g.payload)
      assertTextEqual(g.url, r.text, g.expectedText)
      assert(r.spans == g.expectedSpans, s"span mismatch for ${g.url}")
    }
  }

  test("span invariants: sorted, non-overlapping, within text") {
    (0 until 90).foreach { id =>
      val g = CorpusGen.doc(id.toLong)
      var prevEnd = -1
      g.expectedSpans.foreach { s =>
        assert(s.start >= 0 && s.end <= g.expectedText.length && s.start <= s.end)
        assert(s.start >= prevEnd, s"overlap in ${g.url}")
        prevEnd = s.end
      }
    }
  }
}
