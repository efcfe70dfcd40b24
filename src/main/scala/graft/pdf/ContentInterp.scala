package graft.pdf

import PdfObj._
import graft.job.Assembly
import scala.collection.mutable

/** Content-stream interpreter: text-state machine + canonical text
  * assembly (SURVEY.md §2.3 + Appendix A; ISO 32000-1 §8–9).
  *
  * One interpreter instance per page; fonts cached at the document level
  * via `fontCache` (keyed by the unresolved font entry, usually a PRef).
  */
object ContentInterp {

  /** Internal sentinel added to `warns` when a page draws an image
    * (XObject or inline): PdfExtractor strips it and, if NO text was
    * recovered anywhere, classifies the document `no-text-layer` — the
    * countable scanned-PDF class (never silently empty at crawl scale).
    */
  val ImageSeen = "\u0000image-seen"

  /** 2D affine matrix [a b 0; c d 0; e f 1]. */
  final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    /** this × other (PDF convention: row vector · M). */
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
  }
  object Mat {
    val I = Mat(1, 0, 0, 1, 0, 0)
    def translate(tx: Double, ty: Double) = Mat(1, 0, 0, 1, tx, ty)
  }

  /** Canonical per-page text assembler (SURVEY.md Appendix A).
    * `lineY` is the current output line's text-space origin; it lives
    * here (not in the interpreter) so form-XObject recursion shares it —
    * a page/form boundary must still produce correct breaks.
    */
  final class PageAssembler {
    var lineY: Double = Double.NaN
    private val sb = new java.lang.StringBuilder(256)

    def emit(s: String): Unit = sb.append(s)

    // --- hidden-text tracking (Tr 3, r5): ranges of OUTPUT chars shown
    // with render mode 3 (invisible — the OCR-overlay double-text class
    // in scanned PDFs). Text bytes are NOT affected (Appendix A output
    // is frozen); the ranges only drive span tagging so 100 TB
    // consumers can filter duplicate hidden layers.
    private val hidden = mutable.ArrayBuffer.empty[(Int, Int)]

    /** Record [from, length) as hidden. Adjacent hidden ranges merge
      * across assembler-inserted whitespace (gap spaces / breaks
      * between two invisible shows), so one hidden line reads as one
      * range despite kerning-split shows.
      */
    def markHidden(from: Int): Unit = {
      val to = sb.length
      if (to > from) {
        def wsOnly(a: Int, b: Int): Boolean = {
          var i = a
          while (i < b) {
            val c = sb.charAt(i)
            if (c != ' ' && c != '\n') return false
            i += 1
          }
          true
        }
        if (hidden.nonEmpty && hidden.last._2 >= from) {
          val (s, e) = hidden.last
          hidden(hidden.length - 1) = (s, math.max(e, to))
        } else if (hidden.nonEmpty && wsOnly(hidden.last._2, from)) {
          val (s, _) = hidden.last
          hidden(hidden.length - 1) = (s, to)
        } else hidden += ((from, to))
      }
    }

    /** Hidden ranges clamped to the final (trailing-trimmed) length. */
    def hiddenRanges(finalLen: Int): Vector[(Int, Int)] =
      hidden.iterator.map { case (s, e) => (s, math.min(e, finalLen)) }
        .filter { case (s, e) => e > s }.toVector

    /** At most one space; never leading, never after whitespace. */
    def space(): Unit = {
      val n = sb.length
      if (n > 0) {
        val last = sb.charAt(n - 1)
        if (last != ' ' && last != '\n') sb.append(' ')
      }
    }

    private def trimTrailingSpaces(): Unit = {
      var n = sb.length
      while (n > 0 && sb.charAt(n - 1) == ' ') n -= 1
      sb.setLength(n)
    }

    /** Line break; consecutive breaks collapse unless paragraph. */
    def lineBreak(para: Boolean): Unit = {
      trimTrailingSpaces()
      val n = sb.length
      if (n == 0) return
      if (para) {
        if (n >= 2 && sb.charAt(n - 1) == '\n' && sb.charAt(n - 2) == '\n') ()
        else if (sb.charAt(n - 1) == '\n') sb.append('\n')
        else sb.append("\n\n")
      } else {
        if (sb.charAt(n - 1) != '\n') sb.append('\n')
      }
    }

    /** Final page text: no trailing whitespace. */
    def result(): String = {
      var n = sb.length
      while (n > 0 && (sb.charAt(n - 1) == ' ' || sb.charAt(n - 1) == '\n')) n -= 1
      sb.setLength(n)
      sb.toString
    }

    def length: Int = sb.length
  }

  private final case class GState(
      ctm: Mat, font: FontInfo, tfs: Double, tc: Double, tw: Double,
      tz: Double, tl: Double, ts: Double, tr: Int)

  /** Hard caps so a hostile/corrupt document can't wedge an executor
    * task (100 TB-scale safety; SURVEY.md §7 hazard 6).
    */
  private val MaxOps = 2000000
  private val MaxChars = 1 << 24
  private val MaxFormDepth = 12

  /** Interpret one page's (decoded) content; returns assembled text.
    * `warns` (when non-null) collects per-FONT degradation tags: a font
    * whose CMap is unsupported mutes ITS shows and records the tag,
    * instead of failing the whole document — one exotic font must not
    * cost the rest of an otherwise extractable document (ADVICE r2).
    * The caller decides doc-level error when ALL text was lost.
    */
  def run(doc: PdfDocument, content: Array[Byte], resources: PDict,
          fontCache: mutable.Map[PdfObj, FontInfo],
          warns: mutable.Set[String] = null): String =
    runPage(doc, content, resources, fontCache, warns)._1

  /** As `run`, additionally returning the Tr-3 hidden-text ranges of
    * the page text (for `pdf-text-hidden` span tagging, r5).
    */
  def runPage(doc: PdfDocument, content: Array[Byte], resources: PDict,
              fontCache: mutable.Map[PdfObj, FontInfo],
              warns: mutable.Set[String] = null): (String, Vector[(Int, Int)]) = {
    val asm = new PageAssembler
    exec(doc, content, resources, fontCache, asm, Mat.I, 0, warns)
    val text = asm.result()
    (text, asm.hiddenRanges(text.length))
  }

  /** As `runPage`, additionally collecting raw show GEOMETRY events for
    * the opt-in column-aware re-assembly (pdf/Columns.scala, r5). The
    * default text is still produced — callers fall back to it when
    * column detection declines.
    */
  def runPageWithEvents(doc: PdfDocument, content: Array[Byte], resources: PDict,
                        fontCache: mutable.Map[PdfObj, FontInfo],
                        warns: mutable.Set[String] = null)
      : (String, Vector[(Int, Int)], Vector[Columns.ShowEv]) = {
    val asm = new PageAssembler
    val events = new mutable.ArrayBuffer[Columns.ShowEv](64)
    exec(doc, content, resources, fontCache, asm, Mat.I, 0, warns, events)
    val text = asm.result()
    (text, asm.hiddenRanges(text.length), events.toVector)
  }

  /** A font whose every code decodes to "" (degraded rendering). */
  private def mutedFont(name: String): FontInfo =
    FontInfo(name, "Type0", 2, ToUnicodeCMap.empty, null, Map.empty,
      Map.empty, 1000, isType0 = true, identityCid = false)

  private def exec(doc: PdfDocument, content: Array[Byte], resources: PDict,
                   fontCache: mutable.Map[PdfObj, FontInfo],
                   asm: PageAssembler, ctm0: Mat, depth: Int,
                   warns: mutable.Set[String] = null,
                   events: mutable.ArrayBuffer[Columns.ShowEv] = null): Unit = {
    if (depth > MaxFormDepth) return
    val lx = new Lexer(content)
    val stack = new mutable.ArrayBuffer[PdfObj](8)
    val gsStack = new mutable.ArrayBuffer[GState](8)

    var ctm = ctm0
    var font: FontInfo = null
    var tfs = 0.0
    var tc = 0.0
    var tw = 0.0
    var tz = 100.0
    var tl = 0.0
    var ts = 0.0
    var tr = 0
    var tm = Mat.I
    var tlm = Mat.I
    var nOps = 0

    @inline def numAt(i: Int): Double = // i from top: 0 = last pushed
      if (stack.length > i) num(stack(stack.length - 1 - i)).getOrElse(0.0) else 0.0

    def fontDicts: PDict = doc.dictOf(resources.get("Font").getOrElse(PNull))

    def setFont(name: String, size: Double): Unit = {
      tfs = size
      val entry = fontDicts.get(name).getOrElse(PNull)
      if (entry != PNull) {
        font =
          try fontCache.getOrElseUpdate(entry, {
            doc.resolve(entry) match {
              case d: PDict => Fonts.load(doc, name, d)
              case _ => FontInfo(name, "Type1", 1, ToUnicodeCMap.empty,
                Glyphs.standard, Map.empty, Map.empty, 500, isType0 = false, identityCid = false)
            }
          })
          catch {
            case e: Fonts.UnsupportedCMapException if warns != null =>
              warns += e.getMessage
              val m = mutedFont(name)
              fontCache.update(entry, m) // don't re-load (and re-throw) per Tf
              m
          }
      } else if (font == null) {
        font = FontInfo(name, "Type1", 1, ToUnicodeCMap.empty,
          Glyphs.standard, Map.empty, Map.empty, 500, isType0 = false, identityCid = false)
      }
    }

    @inline def effTfs: Double = math.max(math.abs(tfs), 1e-9)

    /** Line-origin coordinate: the projection of (e, f) onto the
      * BASELINE NORMAL (r5 — generalizes the raw-y rule to rotated
      * text matrices). For the axis-aligned case (a=1, b=0) this is
      * bit-identical to m.f (hypot(1,0) = 1 exactly), so Appendix A
      * output is unchanged for every non-rotated document; a
      * quarter-turned scan's lines (baseline along ±y) now get their
      * origins from ∓x and assemble correctly instead of colliding on
      * a constant y. Vertical-CMap fonts keep their own rule (origin =
      * column x).
      */
    @inline def originOf(m: Mat): Double = {
      if (font != null && font.vertical) m.e
      else {
        val len = math.hypot(m.a, m.b)
        if (len < 1e-12) m.f else (m.a * m.f - m.b * m.e) / len
      }
    }

    /** In-line coordinate: projection of (e, f) onto the baseline
      * direction (= raw x for axis-aligned matrices, bit-identically).
      */
    @inline def alongOf(m: Mat): Double = {
      val len = math.hypot(m.a, m.b)
      if (len < 1e-12) m.e else (m.a * m.e + m.b * m.f) / len
    }

    /** Positioning move to a new text-line origin: decide break/space
      * per Appendix A using the pre-move position (tm) and the new one.
      * For VERTICAL fonts the axes flip (Appendix A vertical rule, r4):
      * a "line" is a COLUMN whose origin coordinate is X (columns
      * progress right-to-left, so a LEFTWARD x move breaks), and the
      * same-column positional gap is the DOWNWARD y-delta. `asm.lineY`
      * holds the current line/column origin in either mode. r5: both
      * coordinates are baseline projections, so rotated pages follow
      * the same rules in their own frame.
      */
    def positionMoved(): Unit = {
      val vert = font != null && font.vertical
      val newOrigin = originOf(tlm)
      if (asm.lineY.isNaN) { asm.lineY = newOrigin; tm = tlm; return }
      // next line is DOWNWARD (horizontal) / next column LEFTWARD
      // (vertical): both are negative deltas on their origin coordinate
      val d = newOrigin - asm.lineY
      if (d < -Assembly.ParaBreakEm * effTfs) {
        asm.lineBreak(para = true); asm.lineY = newOrigin
      } else if (math.abs(d) > Assembly.LineBreakEm * effTfs) {
        asm.lineBreak(para = false); asm.lineY = newOrigin
      } else {
        // same line/column: positional gap beyond the pending advance
        val gap = if (vert) tm.f - tlm.f else alongOf(tlm) - alongOf(tm)
        if (gap / effTfs >= Assembly.SpaceGapEm) asm.space()
      }
      tm = tlm
    }

    /** Show a string's bytes through the current font. */
    def show(bytes: Array[Byte]): Unit = {
      if (font == null) setFont("", if (tfs == 0) 12.0 else tfs)
      if (asm.length > MaxChars) return
      if (asm.lineY.isNaN) asm.lineY = originOf(tm) // text before any positioning op
      val cs = font.codes(bytes)
      var i = 0
      var advance = 0.0
      val sb = new java.lang.StringBuilder(cs.length)
      while (i < cs.length) {
        val code = cs(i)
        val u = font.codeToUnicode(code)
        if (u.nonEmpty) sb.append(u)
        if (font.vertical) {
          // vertical displacement w1: /DW2 default [880 -1000] → one em
          // DOWN per glyph (§9.7.4.3); Tz scales horizontally only
          advance += 1.0 * tfs + tc
        } else {
          var adv = font.width(code) / 1000.0 * tfs + tc
          if (code == 32 && !font.isType0) adv += tw
          advance += adv * tz / 100.0
        }
        i += 1
      }
      val before = asm.length
      asm.emit(sb.toString)
      if (tr == 3) asm.markHidden(before) // invisible text: tag, don't drop
      if (events != null && sb.length > 0)
        events += Columns.ShowEv(tm.e, tm.f, sb.toString, advance, effTfs,
          // rotated shows poison x/y-based column geometry: flag them
          // so Columns.assemble declines the page (r5)
          font.vertical || math.abs(tm.b) > 1e-9 || tm.a <= 0)
      tm = (if (font.vertical) Mat.translate(0, -advance) else Mat.translate(advance, 0)) * tm
    }

    def inlineImageSkip(): Unit = {
      if (warns != null) warns += ContentInterp.ImageSeen
      // operands until ID are dict key/values already on the stack; look
      // for /L or /Length to skip exactly, else resync on ws-EI-ws.
      var declaredLen = -1
      var i = 0
      while (i + 1 < stack.length) {
        (stack(i), stack(i + 1)) match {
          case (PName("L"), PInt(v)) => declaredLen = v.toInt
          case (PName("Length"), PInt(v)) => declaredLen = v.toInt
          case _ => ()
        }
        i += 1
      }
      // data starts after a single whitespace byte past `ID`
      if (lx.isWs(lx.cur)) lx.pos += 1
      if (declaredLen >= 0 && lx.pos + declaredLen <= lx.end) {
        lx.pos += declaredLen
        // expect EI after optional ws
        lx.skipWs()
        if (matches(lx, "EI")) { lx.pos += 2; return }
        // declared length was wrong: fall through to scan
      }
      // resync: whitespace-delimited EI (SURVEY §2.3 hazard)
      var p = lx.pos
      while (p + 1 < lx.end) {
        if (lx.buf(p) == 'E' && lx.buf(p + 1) == 'I' &&
          (p == 0 || lx.isWs(lx.buf(p - 1) & 0xff)) &&
          (p + 2 >= lx.end || lx.isWs(lx.buf(p + 2) & 0xff) || lx.isDelim(lx.buf(p + 2) & 0xff))) {
          lx.pos = p + 2
          return
        }
        p += 1
      }
      lx.pos = lx.end
    }

    /** TJ numeric element: n/1000 em gap in the WRITING direction;
      * space iff >= threshold (rightward horizontal, downward vertical).
      */
    def tjGap(n: Double): Unit = {
      val gapEm = -n / 1000.0 // positive = advance-direction visual gap
      if (gapEm >= Assembly.SpaceGapEm) asm.space()
      if (font != null && font.vertical)
        tm = Mat.translate(0, -gapEm * tfs) * tm
      else
        tm = Mat.translate(gapEm * tfs * tz / 100.0, 0) * tm
    }

    def matches(l: Lexer, s: String): Boolean =
      l.pos + s.length <= l.end &&
        (0 until s.length).forall(i => l.buf(l.pos + i) == s.charAt(i).toByte)

    def doXObject(name: String): Unit = {
      val xobjs = doc.dictOf(resources.get("XObject").getOrElse(PNull))
      doc.resolve(xobjs.get(name).getOrElse(PNull)) match {
        case s @ PStream(d, _) =>
          doc.resolve(d.get("Subtype").getOrElse(PNull)) match {
            case PName("Form") =>
              val mtx = doc.resolve(d.get("Matrix").getOrElse(PNull)) match {
                case PArray(it) if it.size == 6 =>
                  val v = it.flatMap(x => num(doc.resolve(x)))
                  if (v.size == 6) Mat(v(0), v(1), v(2), v(3), v(4), v(5)) else Mat.I
                case _ => Mat.I
              }
              val formRes = d.get("Resources").map(doc.dictOf).filter(_.m.nonEmpty)
                .getOrElse(resources)
              val data = try doc.decodeStream(s) catch { case _: Exception => Array.empty[Byte] }
              if (data.nonEmpty)
                exec(doc, data, formRes, fontCache, asm, mtx * ctm, depth + 1, warns, events)
            case _ =>
              // Image XObject: no text, but its PRESENCE is the
              // image-only-document signal (scanned-PDF observability;
              // sentinel stripped before warns reach the output row)
              if (warns != null) warns += ContentInterp.ImageSeen
          }
        case _ => ()
      }
    }

    // --- operand/operator loop ----------------------------------------

    def parseArray(): PArray = {
      val items = Vector.newBuilder[PdfObj]
      var go = true
      while (go) {
        lx.next() match {
          case Tok.TInt(v) => items += PInt(v)
          case Tok.TReal(v) => items += PReal(v)
          case Tok.TStr(b) => items += PString(b)
          case Tok.TName(n) => items += PName(n)
          case Tok.TArrOpen => items += parseArray()
          case Tok.TArrClose | Tok.TEof => go = false
          case _ => ()
        }
      }
      PArray(items.result())
    }

    def parseDict(): PDict = {
      val m = Map.newBuilder[String, PdfObj]
      var go = true
      while (go) {
        lx.next() match {
          case Tok.TName(k) =>
            lx.next() match {
              case Tok.TInt(v) => m += k -> PInt(v)
              case Tok.TReal(v) => m += k -> PReal(v)
              case Tok.TStr(b) => m += k -> PString(b)
              case Tok.TName(n) => m += k -> PName(n)
              case Tok.TArrOpen => m += k -> parseArray()
              case Tok.TDictOpen => m += k -> parseDict()
              case _ => go = false
            }
          case Tok.TDictClose | Tok.TEof => go = false
          case _ => ()
        }
      }
      PDict(m.result())
    }

    var running = true
    while (running && nOps < MaxOps) {
      lx.next() match {
        case Tok.TEof => running = false
        case Tok.TInt(v) => stack += PInt(v)
        case Tok.TReal(v) => stack += PReal(v)
        case Tok.TStr(b) => stack += PString(b)
        case Tok.TName(n) => stack += PName(n)
        case Tok.TArrOpen => stack += parseArray()
        case Tok.TDictOpen => stack += parseDict()
        case Tok.TJunk(_) => ()
        case Tok.TArrClose | Tok.TDictClose => ()
        case Tok.TKw(op) =>
          nOps += 1
          op match {
            case "BT" => tm = Mat.I; tlm = Mat.I
            case "ET" => ()
            case "Tf" =>
              val size = numAt(0)
              val fname = stack.lift(stack.length - 2) match {
                case Some(PName(n)) => n
                case _ => ""
              }
              setFont(fname, size)
            case "Td" =>
              tlm = Mat.translate(numAt(1), numAt(0)) * tlm
              positionMoved()
            case "TD" =>
              tl = -numAt(0)
              tlm = Mat.translate(numAt(1), numAt(0)) * tlm
              positionMoved()
            case "Tm" =>
              tlm = Mat(numAt(5), numAt(4), numAt(3), numAt(2), numAt(1), numAt(0))
              positionMoved()
            case "T*" =>
              tlm = Mat.translate(0, -tl) * tlm
              positionMoved()
            case "TL" => tl = numAt(0)
            case "Tc" => tc = numAt(0)
            case "Tw" => tw = numAt(0)
            case "Tz" => tz = numAt(0)
            case "Ts" => ts = numAt(0)
            case "Tr" => tr = num(stack.lastOption.getOrElse(PInt(0))).getOrElse(0.0).toInt
            case "Tj" =>
              stack.lastOption match {
                case Some(PString(b)) => show(b)
                case _ => ()
              }
            case "'" =>
              tlm = Mat.translate(0, -tl) * tlm
              positionMoved()
              stack.lastOption match {
                case Some(PString(b)) => show(b)
                case _ => ()
              }
            case "\"" =>
              // aw ac (s) "
              tw = numAt(2)
              tc = numAt(1)
              tlm = Mat.translate(0, -tl) * tlm
              positionMoved()
              stack.lastOption match {
                case Some(PString(b)) => show(b)
                case _ => ()
              }
            case "TJ" =>
              stack.lastOption match {
                case Some(PArray(items)) =>
                  var i = 0
                  while (i < items.length) {
                    items(i) match {
                      case PString(b) => show(b)
                      case PInt(n) => tjGap(n.toDouble)
                      case PReal(n) => tjGap(n)
                      case _ => ()
                    }
                    i += 1
                  }
                case _ => ()
              }
            case "q" =>
              gsStack += GState(ctm, font, tfs, tc, tw, tz, tl, ts, tr)
            case "Q" =>
              if (gsStack.nonEmpty) {
                val g = gsStack.remove(gsStack.length - 1)
                ctm = g.ctm; font = g.font; tfs = g.tfs; tc = g.tc; tw = g.tw
                tz = g.tz; tl = g.tl; ts = g.ts; tr = g.tr
              }
            case "cm" =>
              ctm = Mat(numAt(5), numAt(4), numAt(3), numAt(2), numAt(1), numAt(0)) * ctm
            case "Do" =>
              stack.lastOption match {
                case Some(PName(n)) => doXObject(n)
                case _ => ()
              }
            case "BI" =>
              // inline image: parse `key value …` until ID, then raw-skip
              stack.clear()
              var inDict = true
              while (inDict) {
                lx.next() match {
                  case Tok.TKw("ID") => inDict = false
                  case Tok.TEof => inDict = false
                  case Tok.TInt(v) => stack += PInt(v)
                  case Tok.TReal(v) => stack += PReal(v)
                  case Tok.TName(n) => stack += PName(n)
                  case Tok.TStr(b) => stack += PString(b)
                  case Tok.TArrOpen => stack += parseArray()
                  case Tok.TDictOpen => stack += parseDict()
                  case _ => ()
                }
              }
              inlineImageSkip()
            case "BMC" | "BDC" | "EMC" | "MP" | "DP" => () // marked content: no-op
            case _ => () // path/color/shading/d0/d1/unknown: arity-safe no-op
          }
          stack.clear()
      }
    }
  }
}
