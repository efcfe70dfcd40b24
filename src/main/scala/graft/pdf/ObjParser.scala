package graft.pdf

import scala.collection.mutable.ArrayBuffer

/** PDF object ADT (SURVEY.md §1.5; ISO 32000-1 §7.3). */
sealed trait PdfObj
object PdfObj {
  case object PNull extends PdfObj
  final case class PBool(v: Boolean) extends PdfObj
  final case class PInt(v: Long) extends PdfObj
  final case class PReal(v: Double) extends PdfObj
  final case class PString(bytes: Array[Byte]) extends PdfObj
  final case class PName(v: String) extends PdfObj
  final case class PArray(items: Vector[PdfObj]) extends PdfObj
  final case class PDict(m: Map[String, PdfObj]) extends PdfObj {
    def get(k: String): Option[PdfObj] = m.get(k)
  }
  /** Stream: dict + the RAW (still encoded) data bytes. */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PdfObj
  /** Indirect reference `n g R`. */
  final case class PRef(num: Int, gen: Int) extends PdfObj

  val Empty: PDict = PDict(Map.empty)

  def num(o: PdfObj): Option[Double] = o match {
    case PInt(v) => Some(v.toDouble)
    case PReal(v) => Some(v)
    case _ => None
  }
  def int(o: PdfObj): Option[Long] = o match {
    case PInt(v) => Some(v)
    case PReal(v) => Some(v.toLong)
    case _ => None
  }
}

/** Tokens → PdfObj (SURVEY.md §2.2 L2; §7.3.8, §7.3.10).
  *
  * `resolveLen` supplies /Length resolution for streams whose length is
  * an indirect reference (two-phase load, see XrefWalk). A `null`
  * resolver falls back to scanning for `endstream`.
  */
final class ObjParser(lx: Lexer, resolveLen: PdfObj => Option[Long]) {
  import PdfObj._
  import Tok._

  /** Parse one object starting at the lexer cursor. Returns PNull at EOF
    * or on junk. Indirect refs `n g R` and headers `n g obj` handled by
    * 2-token lookahead on integers.
    */
  def parseObj(): PdfObj = parseTok(lx.next())

  private def parseTok(t: Tok): PdfObj = t match {
    case TInt(a) =>
      // Possible `a g R` reference. Backtrack-safe lookahead.
      val save = lx.pos
      lx.next() match {
        case TInt(g) =>
          lx.next() match {
            case TKw("R") => PRef(a.toInt, g.toInt)
            case _ => lx.pos = save; PInt(a)
          }
        case _ => lx.pos = save; PInt(a)
      }
    case TReal(v) => PReal(v)
    case TName(v) => PName(v)
    case TStr(b) => PString(b)
    case TArrOpen =>
      val items = Vector.newBuilder[PdfObj]
      var go = true
      while (go) {
        val save = lx.pos
        lx.next() match {
          case TArrClose | TEof => go = false
          case tt => lx.pos = save; items += parseObj()
        }
      }
      PArray(items.result())
    case TDictOpen => parseDictOrStream()
    case TKw("true") => PBool(true)
    case TKw("false") => PBool(false)
    case TKw("null") => PNull
    case TEof => PNull
    case _ => PNull // junk / stray keyword at object position
  }

  private def parseDictOrStream(): PdfObj = {
    val m = Map.newBuilder[String, PdfObj]
    var go = true
    while (go) {
      val save = lx.pos
      lx.next() match {
        case TDictClose | TEof => go = false
        case TName(k) => m += k -> parseObj()
        case _ => () // skip junk key
      }
      if (go && lx.pos == save) go = false // safety: no progress
    }
    val dict = PDict(m.result())
    // stream keyword may follow (§7.3.8)
    val save = lx.pos
    lx.next() match {
      case TKw("stream") =>
        // data begins after CRLF or LF exactly (§7.3.8.1)
        if (lx.cur == 0x0d) lx.pos += 1
        if (lx.cur == 0x0a) lx.pos += 1
        val dataStart = lx.pos
        val len: Option[Long] = dict.get("Length").flatMap {
          case PInt(v) => Some(v)
          case r @ PRef(_, _) => if (resolveLen ne null) resolveLen(r) else None
          case _ => None
        }
        val dataEnd: Int = len match {
          case Some(n) if dataStart + n <= lx.end =>
            // trust /Length, but verify endstream follows (tolerate EOLs)
            val e = (dataStart + n).toInt
            if (endstreamAt(e)) e else scanEndstream(dataStart)
          case _ => scanEndstream(dataStart)
        }
        val raw = java.util.Arrays.copyOfRange(lx.buf, dataStart, dataEnd)
        lx.pos = dataEnd
        // consume optional EOL + `endstream`
        lx.skipWs()
        val s2 = lx.pos
        lx.next() match {
          case TKw("endstream") => ()
          case _ => lx.pos = s2
        }
        PStream(dict, raw)
      case _ =>
        lx.pos = save
        dict
    }
  }

  private def endstreamAt(i: Int): Boolean = {
    var p = i
    // allow up to 2 EOL bytes before the keyword
    var n = 0
    while (n < 2 && p < lx.end && (lx.buf(p) == 0x0d || lx.buf(p) == 0x0a)) { p += 1; n += 1 }
    matchesKw(p, "endstream")
  }

  private def matchesKw(p: Int, kw: String): Boolean = {
    if (p + kw.length > lx.end) return false
    var i = 0
    while (i < kw.length) { if (lx.buf(p + i) != kw.charAt(i).toByte) return false; i += 1 }
    true
  }

  /** Fallback: scan forward for the `endstream` keyword. */
  private def scanEndstream(from: Int): Int = {
    var p = from
    while (p < lx.end) {
      if (lx.buf(p) == 'e' && matchesKw(p, "endstream")) {
        // strip at most one preceding EOL from the data
        var e = p
        if (e > from && lx.buf(e - 1) == 0x0a) e -= 1
        if (e > from && lx.buf(e - 1) == 0x0d) e -= 1
        return e
      }
      p += 1
    }
    lx.end
  }
}

object ObjParser {
  /** Parse a single object from `buf` at `offset` (no /Length resolver). */
  def parseAt(buf: Array[Byte], offset: Int): PdfObj = {
    val lx = new Lexer(buf, offset, buf.length)
    new ObjParser(lx, null).parseObj()
  }
}
