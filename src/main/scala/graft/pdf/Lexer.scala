package graft.pdf

import scala.collection.mutable.ArrayBuffer

/** PDF token lexer (SURVEY.md §2.2 L1; ISO 32000-1 §7.2–7.3).
  *
  * Operates over raw bytes with an explicit cursor so the same lexer
  * serves file-level object parsing and decoded content streams.
  * Never throws on junk input: unlexable bytes yield TJunk tokens the
  * callers skip (arity-safe unknown-operator handling depends on this).
  */
sealed trait Tok
object Tok {
  final case class TInt(v: Long) extends Tok
  final case class TReal(v: Double) extends Tok
  /** /Name with #xx escapes already decoded. */
  final case class TName(v: String) extends Tok
  /** Literal or hex string, raw decoded bytes. */
  final case class TStr(v: Array[Byte]) extends Tok
  /** Bare keyword or operator: obj endobj stream R true false null BT Tj ... */
  final case class TKw(v: String) extends Tok
  case object TArrOpen extends Tok
  case object TArrClose extends Tok
  case object TDictOpen extends Tok
  case object TDictClose extends Tok
  /** Unlexable byte (skipped by parsers). */
  final case class TJunk(b: Int) extends Tok
  case object TEof extends Tok
}

final class Lexer(val buf: Array[Byte], var pos: Int, val end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  import Tok._

  @inline private def at(i: Int): Int = if (i < end) buf(i) & 0xff else -1
  @inline def cur: Int = at(pos)

  /** PDF whitespace classes incl. NUL (ISO 32000-1 §7.2.3, Table 1). */
  @inline def isWs(c: Int): Boolean =
    c == 0x20 || c == 0x0a || c == 0x0d || c == 0x09 || c == 0x0c || c == 0x00
  /** Delimiters (§7.2.3, Table 2). */
  @inline def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'
  @inline def isRegular(c: Int): Boolean = c >= 0 && !isWs(c) && !isDelim(c)

  /** Skip whitespace and %-comments (§7.2.4). */
  def skipWs(): Unit = {
    var go = true
    while (go) {
      while (isWs(cur)) pos += 1
      if (cur == '%') { // comment to EOL
        while (pos < end && cur != 0x0a && cur != 0x0d) pos += 1
      } else go = false
    }
  }

  /** Consume an end-of-line: CRLF, CR, or LF. Returns bytes consumed. */
  def consumeEol(): Int = {
    if (cur == 0x0d) { pos += 1; if (cur == 0x0a) { pos += 1; 2 } else 1 }
    else if (cur == 0x0a) { pos += 1; 1 }
    else 0
  }

  private def hexVal(c: Int): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Literal string (…) with escapes and balanced parens (§7.3.4.2). */
  private def lexLiteralString(): TStr = {
    pos += 1 // past '('
    val out = new ArrayBuffer[Byte](32)
    var depth = 1
    while (depth > 0 && pos < end) {
      val c = cur
      if (c == '\\') {
        pos += 1
        val e = cur
        e match {
          case 'n' => out += '\n'; pos += 1
          case 'r' => out += '\r'; pos += 1
          case 't' => out += '\t'; pos += 1
          case 'b' => out += '\b'; pos += 1
          case 'f' => out += '\f'; pos += 1
          case '(' => out += '('; pos += 1
          case ')' => out += ')'; pos += 1
          case '\\' => out += '\\'; pos += 1
          case 0x0d => // line continuation: backslash-EOL drops both
            pos += 1; if (cur == 0x0a) pos += 1
          case 0x0a => pos += 1
          case d if d >= '0' && d <= '7' => // \ddd octal, 1-3 digits
            var v = 0; var n = 0
            while (n < 3 && cur >= '0' && cur <= '7') { v = v * 8 + (cur - '0'); pos += 1; n += 1 }
            out += (v & 0xff).toByte
          case -1 => // truncated
          case other => out += other.toByte; pos += 1 // unknown escape: byte as-is
        }
      } else if (c == '(') { depth += 1; out += '('.toByte; pos += 1 }
      else if (c == ')') {
        depth -= 1; if (depth > 0) out += ')'.toByte
        pos += 1
      } else if (c == 0x0d) {
        // EOL in string: CRLF and CR both record as LF (§7.3.4.2)
        out += '\n'; pos += 1; if (cur == 0x0a) pos += 1
      } else { out += c.toByte; pos += 1 }
    }
    TStr(out.toArray)
  }

  /** Hex string <…>; odd final digit implies trailing 0 (§7.3.4.3). */
  private def lexHexString(): TStr = {
    pos += 1 // past '<'
    val out = new ArrayBuffer[Byte](16)
    var hi = -1
    var go = true
    while (go && pos < end) {
      val c = cur
      if (c == '>') { pos += 1; go = false }
      else {
        val v = hexVal(c)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out += ((hi << 4) | v).toByte; hi = -1 }
        } // whitespace / junk inside hex string: ignored
        pos += 1
      }
    }
    if (hi >= 0) out += (hi << 4).toByte
    TStr(out.toArray)
  }

  /** /Name with #xx decoding (§7.3.5). */
  private def lexName(): TName = {
    pos += 1 // past '/'
    val sb = new StringBuilder
    while (isRegular(cur)) {
      if (cur == '#' && hexVal(at(pos + 1)) >= 0 && hexVal(at(pos + 2)) >= 0) {
        sb.append(((hexVal(at(pos + 1)) << 4) | hexVal(at(pos + 2))).toChar)
        pos += 3
      } else { sb.append(cur.toChar); pos += 1 }
    }
    TName(sb.toString)
  }

  /** Number: int or real, optional sign, forms like 4. .5 -.002
    * (§7.3.3). Allocation-free: numbers dominate content streams.
    */
  private def lexNumber(): Tok = {
    val start = pos
    var neg = false
    if (cur == '+' || cur == '-') { neg = cur == '-'; pos += 1 }
    var intPart = 0L
    var nInt = 0
    var overflow = false
    while (cur >= '0' && cur <= '9') {
      if (intPart > (Long.MaxValue - 9) / 10) overflow = true
      else intPart = intPart * 10 + (cur - '0')
      nInt += 1
      pos += 1
    }
    if (cur == '.') {
      pos += 1
      // fraction as exact integer digits / 10^n: one correctly-rounded
      // division, same result as Double.parseDouble for short decimals
      var fracDigits = 0L
      var nFrac = 0
      while (cur >= '0' && cur <= '9') {
        if (nFrac < 18) { fracDigits = fracDigits * 10 + (cur - '0'); nFrac += 1 }
        pos += 1
      }
      var pow = 1.0
      var k = 0
      while (k < nFrac) { pow *= 10.0; k += 1 }
      val v = intPart.toDouble + (if (nFrac > 0) fracDigits / pow else 0.0)
      TReal(if (neg) -v else v)
    } else if (nInt == 0) TJunk(at(start))
    else if (overflow) TReal(if (neg) -9.223372036854776e18 else 9.223372036854776e18)
    else TInt(if (neg) -intPart else intPart)
  }

  /** Next token. Keywords/operators come back as TKw. */
  def next(): Tok = {
    skipWs()
    if (pos >= end) return TEof
    val c = cur
    c match {
      case '(' => lexLiteralString()
      case '<' =>
        if (at(pos + 1) == '<') { pos += 2; TDictOpen }
        else lexHexString()
      case '>' =>
        if (at(pos + 1) == '>') { pos += 2; TDictClose }
        else { pos += 1; TJunk('>') }
      case '[' => pos += 1; TArrOpen
      case ']' => pos += 1; TArrClose
      case '/' => lexName()
      case '{' => pos += 1; TKw("{") // PostScript-calc braces: pass through
      case '}' => pos += 1; TKw("}")
      case ')' => pos += 1; TJunk(')')
      case d if (d >= '0' && d <= '9') || d == '+' || d == '-' || d == '.' =>
        lexNumber()
      case r if isRegular(r) =>
        val start = pos
        while (isRegular(cur)) pos += 1
        TKw(new String(buf, start, pos - start, "ISO-8859-1"))
      case other => pos += 1; TJunk(other)
    }
  }

  /** Peek without consuming. */
  def peek(): Tok = { val p = pos; val t = next(); pos = p; t }
}
