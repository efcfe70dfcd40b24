package graft.pdf

import graft.job.{Assembly, Span}
import scala.collection.mutable

/** Top-level PDF text extraction: bytes → (text, spans, nPages)
  * (SURVEY.md §3.1 lifecycle; the `Tj/TJ` capability of BASELINE.json:6).
  *
  * Page texts are joined with Assembly.UnitJoin; one Span per non-empty
  * page, kind "pdf-text" (Appendix A).
  */
object PdfExtractor {

  final case class PdfResult(text: String, spans: Vector[Span], nPages: Int,
                             warns: Vector[String] = Vector.empty)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  /** Extract; throws on unrecoverable structure errors (caller maps to
    * an error row). `inflater` comes from the per-partition ExtractCtx.
    *
    * `columnAware = true` (r5, OPT-IN — off the byte-identity path):
    * pages that confidently detect as two side-by-side columns are
    * re-assembled left-column-then-right from show geometry
    * (pdf/Columns.scala); every other page keeps the default
    * (Appendix A) show-order assembly byte-identically. Hidden-span
    * tagging applies only to default-assembled pages (a re-ordered
    * page's offsets no longer map to Tr-3 show ranges).
    */
  def extract(bytes: Array[Byte], inflater: java.util.zip.Inflater,
              columnAware: Boolean = false): PdfResult = {
    val doc = new PdfDocument(bytes, inflater)
    val fontCache = mutable.Map.empty[PdfObj, FontInfo]
    val warns = mutable.LinkedHashSet.empty[String] // first-seen order
    val sb = new java.lang.StringBuilder(1024)
    val spans = Vector.newBuilder[Span]
    var pageIdx = 0
    var emitted = 0
    doc.pages.foreach { page =>
      val content = doc.pageContent(page)
      val (text, hid) =
        if (content.isEmpty) ("", Vector.empty[(Int, Int)])
        else if (columnAware) {
          val (t, h, evs) =
            ContentInterp.runPageWithEvents(doc, content, page.resources, fontCache, warns)
          Columns.assemble(evs) match {
            case Some(colText) => (colText, Vector.empty[(Int, Int)])
            case None => (t, h)
          }
        } else ContentInterp.runPage(doc, content, page.resources, fontCache, warns)
      if (text.nonEmpty) {
        if (emitted > 0) sb.append(Assembly.UnitJoin)
        val start = sb.length
        sb.append(text)
        if (hid.isEmpty) spans += Span(start, sb.length, pageIdx, "pdf-text")
        else {
          // Tr-3 segments get their own span kind (r5): page text is
          // partitioned; separator chars between segments stay
          // "pdf-text". Text bytes are identical either way.
          var pos = 0
          hid.foreach { case (hs, he) =>
            if (hs > pos) spans += Span(start + pos, start + hs, pageIdx, "pdf-text")
            spans += Span(start + hs, start + he, pageIdx, "pdf-text-hidden")
            pos = he
          }
          if (pos < text.length)
            spans += Span(start + pos, start + text.length, pageIdx, "pdf-text")
        }
        emitted += 1
      }
      pageIdx += 1
    }
    // the image-presence sentinel never reaches the warn column
    val sawImage = warns.remove(ContentInterp.ImageSeen)
    // per-font degradation recovered NOTHING → the whole document is
    // the countable error row it always was (x6 taxonomy contract)
    if (sb.length == 0 && warns.nonEmpty)
      throw new RuntimeException(warns.head)
    // images drawn but zero text anywhere: the scanned-PDF class, a
    // COUNTED error row (OCR-recoverable downstream), not a silent
    // empty (SURVEY §7.2 r5 #3, pulled into r4)
    if (sb.length == 0 && sawImage && doc.pages.nonEmpty)
      throw new RuntimeException("no-text-layer")
    PdfResult(sb.toString, spans.result(), doc.pages.size, warns.toVector)
  }
}
