package graft.pdf

import scala.collection.mutable

/** /ToUnicode CMap parser (SURVEY.md §2.4 FN4; ISO 32000-1 §9.10.3 and
  * the Adobe CMap/CIDFont spec).
  *
  * Parses the PostScript-subset stream grammar with the shared Lexer:
  * codespacerange (code byte lengths), bfchar (src → dst), bfrange
  * (lo hi dst-hex with last-unit increment, or lo hi [dst array]).
  * UTF-16BE destinations are kept as Java Strings (surrogate pairs work
  * out naturally).
  */
/** Shared codespace-driven code splitting (ISO 32000-1 §9.7.6.2: a
  * show-string is partitioned into codes by matching byte prefixes
  * against the declared codespace ranges).
  */
object CodeSpace {

  /** Number of bytes the code starting at `bytes(pos)` occupies per the
    * `ranges` (lo, hi, nBytes); `fallback` when nothing matches.
    *
    * Matching is BYTE-WISE, not packed-integer: ISO 32000-1 §9.7.6.2
    * defines a codespace range as a per-byte box — byte k of the code
    * must lie within [byte k of lo, byte k of hi] independently. The
    * distinction matters for GB18030: the 2-byte GBK range
    * <8140>-<FEFE> and the 4-byte range <81308130>-<FE39FE39> are
    * byte-wise disjoint (2nd byte ≥ 0x40 vs 0x30-0x39), but a packed
    * comparison would claim any 4-byte code whose first two bytes pack
    * ≥ 0x8140 (i.e. first byte ≥ 0x82, e.g. U+4DB6 = 82 35 87 39) for
    * the 2-byte range and mis-split it (ADVICE r5 high).
    */
  def codeLen(ranges: Vector[(Long, Long, Int)], bytes: Array[Byte], pos: Int,
              fallback: Int): Int = {
    val remain = bytes.length - pos
    var i = 0
    while (i < ranges.length) {
      val (lo, hi, n) = ranges(i)
      if (n <= remain) {
        var ok = true
        var k = 0
        while (ok && k < n) {
          val shift = 8 * (n - 1 - k)
          val b = bytes(pos + k) & 0xff
          if (b < ((lo >> shift) & 0xff) || b > ((hi >> shift) & 0xff)) ok = false
          k += 1
        }
        if (ok) return n
      }
      i += 1
    }
    math.min(math.max(fallback, 1), math.max(remain, 1))
  }
}

final class ToUnicodeCMap(
    val codeSpace: Vector[(Long, Long, Int)], // (lo, hi, nBytes)
    singles: Map[Long, String],
    ranges: Vector[(Long, Long, Either[String, Vector[String]])]) {

  /** Code byte-lengths present in the codespace (ascending). */
  val codeLengths: Vector[Int] =
    if (codeSpace.isEmpty) Vector(1) else codeSpace.map(_._3).distinct.sorted

  def lookup(code: Long): Option[String] =
    singles.get(code).orElse {
      ranges.collectFirst {
        case (lo, hi, dst) if code >= lo && code <= hi =>
          dst match {
            case Left(base) =>
              if (base.isEmpty) ""
              else {
                val delta = (code - lo).toInt
                val chars = base.toCharArray
                chars(chars.length - 1) = (chars(chars.length - 1) + delta).toChar
                new String(chars)
              }
            case Right(arr) =>
              val i = (code - lo).toInt
              if (i < arr.length) arr(i) else ""
          }
      }
    }

  /** Number of bytes the code starting at `bytes(pos)` occupies, per the
    * codespace ranges; falls back to the longest declared code length.
    */
  def codeLen(bytes: Array[Byte], pos: Int): Int =
    CodeSpace.codeLen(codeSpace, bytes, pos, codeLengths.last)

  def isEmpty: Boolean = singles.isEmpty && ranges.isEmpty
}

object ToUnicodeCMap {

  val empty = new ToUnicodeCMap(Vector.empty, Map.empty, Vector.empty)

  private def hexToLong(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < b.length) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** Destination hex bytes are UTF-16BE. */
  private def utf16be(b: Array[Byte]): String = {
    val n = b.length / 2
    val chars = new Array[Char](n)
    var i = 0
    while (i < n) {
      chars(i) = (((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)).toChar
      i += 1
    }
    new String(chars)
  }

  def parse(data: Array[Byte]): ToUnicodeCMap = {
    val lx = new Lexer(data)
    val codeSpace = Vector.newBuilder[(Long, Long, Int)]
    val singles = mutable.Map.empty[Long, String]
    val ranges = Vector.newBuilder[(Long, Long, Either[String, Vector[String]])]
    var tok = lx.next()
    while (tok != Tok.TEof) {
      tok match {
        case Tok.TKw("begincodespacerange") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(lo) =>
                lx.next() match {
                  case Tok.TStr(hi) =>
                    codeSpace += ((hexToLong(lo), hexToLong(hi), lo.length))
                  case _ => go = false
                }
              case _ => go = false // endcodespacerange or junk
            }
          }
        case Tok.TKw("beginbfchar") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(src) =>
                lx.next() match {
                  case Tok.TStr(dst) => singles(hexToLong(src)) = utf16be(dst)
                  case Tok.TName(n) =>
                    singles(hexToLong(src)) = Glyphs.glyphToUnicode(n).getOrElse("")
                  case _ => go = false
                }
              case _ => go = false
            }
          }
        case Tok.TKw("beginbfrange") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(lo) =>
                (lx.next(), lx.next()) match {
                  case (Tok.TStr(hi), Tok.TStr(dst)) =>
                    ranges += ((hexToLong(lo), hexToLong(hi), Left(utf16be(dst))))
                  case (Tok.TStr(hi), Tok.TArrOpen) =>
                    val arr = Vector.newBuilder[String]
                    var inArr = true
                    while (inArr) {
                      lx.next() match {
                        case Tok.TStr(d) => arr += utf16be(d)
                        case Tok.TName(n) => arr += Glyphs.glyphToUnicode(n).getOrElse("")
                        case _ => inArr = false // ]
                      }
                    }
                    ranges += ((hexToLong(lo), hexToLong(hi), Right(arr.result())))
                  case _ => go = false
                }
              case _ => go = false
            }
          }
        case _ => () // def / dict / usecmap etc: skip
      }
      tok = lx.next()
    }
    new ToUnicodeCMap(codeSpace.result(), singles.toMap, ranges.result())
  }
}

/** Embedded CMap stream parser — the code→CID half of a Type0 font's
  * /Encoding when it is a stream rather than a predefined name
  * (SURVEY.md §2.4 FN3; ISO 32000-1 §9.7.5.3 and the Adobe CMap spec).
  *
  * Same PostScript-subset grammar as /ToUnicode, with the CID operators:
  * codespacerange, cidrange (lo hi startCid), cidchar (src cid), and the
  * `/Name usecmap` inheritance form. The parsed map drives code
  * SPLITTING (authoritative codespace — template ToUnicode codespaces
  * are often wrong) and CID-keyed /W width lookup; Unicode text comes
  * from /ToUnicode or the inherited base CMap's semantics (Uni* = codes
  * are UTF-16BE; byte-oriented = codes are national-charset bytes).
  */
final class CidCMap(
    val codeSpace: Vector[(Long, Long, Int)],
    singles: Map[Long, Int],
    ranges: Vector[(Long, Long, Int)], // (lo, hi, startCid)
    /** Base CMap name from `usecmap` ("" when absent). */
    val useCMap: String) {

  private val maxLen: Int =
    if (codeSpace.isEmpty) 2 else codeSpace.map(_._3).max

  def codeLen(bytes: Array[Byte], pos: Int): Int =
    CodeSpace.codeLen(codeSpace, bytes, pos, maxLen)

  /** code → CID, -1 when unmapped by this (embedded) layer. */
  def cid(code: Long): Int = singles.get(code) match {
    case Some(c) => c
    case None =>
      var i = 0
      while (i < ranges.length) {
        val (lo, hi, start) = ranges(i)
        if (code >= lo && code <= hi) return start + (code - lo).toInt
        i += 1
      }
      -1
  }

  def hasCids: Boolean = singles.nonEmpty || ranges.nonEmpty

  /** This map's codespace prepended with the base CMap's (usecmap
    * inherits codespace ranges; own ranges take precedence by order).
    */
  def withBaseCodeSpace(base: Vector[(Long, Long, Int)]): CidCMap =
    if (base.isEmpty) this
    else new CidCMap(codeSpace ++ base.filterNot(codeSpace.contains), singles, ranges, useCMap)
}

object CidCMap {

  private def hexToLong(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < b.length) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  def parse(data: Array[Byte]): CidCMap = {
    val lx = new Lexer(data)
    val codeSpace = Vector.newBuilder[(Long, Long, Int)]
    val singles = Map.newBuilder[Long, Int]
    val ranges = Vector.newBuilder[(Long, Long, Int)]
    var use = ""
    var lastName = "" // `/Base usecmap` — the name precedes the keyword
    var tok = lx.next()
    while (tok != Tok.TEof) {
      tok match {
        case Tok.TName(n) => lastName = n
        case Tok.TKw("usecmap") => use = lastName
        case Tok.TKw("begincodespacerange") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(lo) =>
                lx.next() match {
                  case Tok.TStr(hi) => codeSpace += ((hexToLong(lo), hexToLong(hi), lo.length))
                  case _ => go = false
                }
              case _ => go = false
            }
          }
        case Tok.TKw("begincidchar") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(src) =>
                lx.next() match {
                  case Tok.TInt(c) => singles += hexToLong(src) -> c.toInt
                  case _ => go = false
                }
              case _ => go = false
            }
          }
        case Tok.TKw("begincidrange") =>
          var go = true
          while (go) {
            lx.next() match {
              case Tok.TStr(lo) =>
                (lx.next(), lx.next()) match {
                  case (Tok.TStr(hi), Tok.TInt(c)) =>
                    ranges += ((hexToLong(lo), hexToLong(hi), c.toInt))
                  case _ => go = false
                }
              case _ => go = false
            }
          }
        case _ => ()
      }
      tok = lx.next()
    }
    new CidCMap(codeSpace.result(), singles.result(), ranges.result(), use)
  }
}
