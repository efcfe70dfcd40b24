package graft.gen

import graft.job.Span
import scala.util.Random

/** Deterministic corpus generator (FIXTURES.md; SURVEY.md §5.2).
  *
  * Seed = 42; per-doc RNG = Random(seed + docId) so generation is
  * order-independent and distributable (each Spark task generates its
  * own id range with no coordination).
  */
object CorpusGen {

  val Seed = 42L
  private val langs = Vector("en", "fr", "es", "zh", "de")

  /** One corpus row + its golden expectation. */
  final case class GoldenDoc(
      url: String,
      warcTsMicros: Long, // µs since epoch, deterministic
      payload: Array[Byte], // PDF or HTML bytes
      wetText: String, // WET-style raw text (not the oracle)
      lang: String,
      kind: String, // "pdf" | "html"
      expectedText: String,
      expectedSpans: Vector[Span])

  /** Base timestamp 2026-01-01T00:00:00Z in µs. */
  private val T0 = 1767225600000000L

  def isPdfDoc(docId: Long): Boolean = docId % 3 == 0

  def langOf(docId: Long): String = langs((docId % langs.size).toInt)

  /** Generate document `docId` of the corpus. `paraScale` grows doc
    * sizes for bench tiers (goldens always use 1).
    */
  def doc(docId: Long, paraScale: Int = 1): GoldenDoc = {
    val rng = new Random(Seed + docId)
    val lang = langOf(docId)
    val url = s"https://synth.test/$lang/$docId"
    val ts = T0 + docId * 61000000L
    val big = rng.nextInt(100) == 0 // 1% big-doc tail (skew exercise)
    if (isPdfDoc(docId)) {
      val spec = pdfSpec(docId, lang, rng)
      val pool = TextGen.pool(lang, spec.fontKind)
      val paras = TextGen.docParagraphs(rng, pool, big, paraScale)
      // distribute paragraphs over pages
      val pages: Vector[PdfBuilder.PageParas] =
        if (spec.nPages == 1) Vector(paras)
        else {
          val per = math.max(1, paras.size / spec.nPages)
          val grouped = paras.grouped(per).toVector
          // merge overflow into the last page; pad empty pages
          val g = if (grouped.size > spec.nPages)
            grouped.take(spec.nPages - 1) :+ grouped.drop(spec.nPages - 1).flatten
          else grouped
          g.padTo(spec.nPages, Vector.empty[PdfBuilder.Para])
        }
      val built = PdfBuilder.build(spec, pages, rng)
      GoldenDoc(url, ts, built.bytes, wetOf(built.text), lang, "pdf",
        built.text, built.spans)
    } else {
      val spec = HtmlBuilder.specFor(docId, rng)
      val pool = TextGen.pool(lang, -1)
      val paras = TextGen.docParagraphs(rng, pool, big, paraScale)
      val built = HtmlBuilder.build(spec, paras.map(_.map(_.mkString(" "))), rng)
      GoldenDoc(url, ts, built.bytes, built.wetText, lang, "html",
        built.text, built.spans)
    }
  }

  /** PDF feature axes per doc — cycling assignment guarantees full
    * coverage of each axis over any ~60 consecutive PDF docs
    * (FIXTURES.md §3.1), with rng jitter for the extras.
    */
  def pdfSpec(docId: Long, lang: String, rng: Random): PdfBuilder.Spec = {
    val i = (docId / 3).toInt // dense index over PDF docs
    // zh needs Type0: cycle Identity-H+ToUnicode (3), the predefined
    // UniGB-UCS2-H CMap with NO ToUnicode (6), and the byte-oriented
    // GBK-EUC-H CMap with NO ToUnicode (9, r4). Non-zh docs cycle the
    // other kinds incl. the embedded-CMap /Encoding stream (8, r4),
    // ZapfDingbats per-glyph AFM (10, r4) and the symbolic embedded
    // TrueType whose text is recoverable only through its sfnt
    // cmap/post program (11, r4).
    val fontKind =
      if (lang == "zh") Vector(3, 6, 9, 12)((i / 2) % 4) // 12 = vertical (r4)
      else Vector(0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 13, 14)(i % 13) // 14 = embedded CFF (r5)
    PdfBuilder.Spec(
      xrefKind = i % 5,
      filterKind = (i / 5) % 7,
      showKind = (i / 35) % 3,
      posKind = (i / 105) % 3,
      fontKind = fontKind,
      nPages = if (i % 7 == 4) 3 else 1,
      formXObject = rng.nextInt(4) == 0,
      inlineImage = rng.nextInt(4) == 0,
      markedContent = rng.nextInt(3) == 0,
      junkAfterEof = rng.nextInt(5) == 0,
      indirectLength = rng.nextInt(4) == 0,
      splitShow = i % 2 == 0, // fires when the showKind/posKind/fontKind gates align
      // ~14% of PDFs ship encrypted with an empty user password,
      // cycling RC4-40 / RC4-128 / AES-128 / AES-256 (crawl-realistic
      // owner-locked share, same band as r3's ~13%). r4 un-gates Type0
      // kinds — the builder now encrypts CIDSystemInfo strings too
      // (VERDICT r3 "next" #2). Gate period 7 is coprime to the
      // fontKind cycle (10), the zh cycle (6), xref (5) and splitShow
      // (2), so every (flavor × fontKind) pair occurs over a 280-PDF
      // window without inflating the overall share the way the initial
      // r4 ungate did (25% measurably dragged the 16-core leg at the
      // box's decrypt-bandwidth knee).
      encryptKind = if (i % 7 == 1) 1 + ((i / 7) % 4) else 0,
      // render-mode-3 axis (r5): ~1/11 of PDFs carry an invisible
      // (OCR-overlay-style) last line, span-tagged pdf-text-hidden.
      // 11 is coprime to the fontKind cycle (13), zh (8), encrypt (7),
      // xref (5) and splitShow (2) gates.
      hiddenLine = i % 11 == 5,
      // rotated-page axis (r5): ~1/9 of PDFs are quarter-turned
      // sideways scans (never combined with the vertical CMap kind,
      // whose own branch wins); 9 is coprime to every other gate.
      rotated = i % 9 == 7 && fontKind != 12)
  }

  /** WET-style flattened text: expected text with newlines as spaces —
    * plus it is NOT the oracle, so exact shape is unimportant.
    */
  private def wetOf(text: String): String =
    text.replace("\n\n", " ").replace('\n', ' ')
}
