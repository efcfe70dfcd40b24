package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression
  * (SURVEY.md §2.7 training-data surface; VERDICT r3 "next" #7).
  *
  * Spark ships no normalization function, and a Scala UDF would force
  * the whole stage out of codegen plus pay SerDe per row. This stays a
  * tight UnaryExpression: an `isNormalized` fast path (UAX #15 quick
  * check — virtually all crawl text is already NFC, making the common
  * case an O(n) scan with no allocation) and `Normalizer.normalize`
  * (ICU-equivalent JDK implementation) on the slow path. Both calls are
  * plain JDK statics, so the generated code inlines into
  * WholeStageCodegen without reference objects.
  *
  * Extraction output is deliberately NOT normalized by default — the
  * golden byte-identity invariant (BASELINE.json north_rule) pins the
  * extractor's bytes; NFC is an opt-in transform for tokenizer-bound
  * pipelines (q16).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.NfcName

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $x.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $x;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Language-ID scorer as a codegen'd Catalyst expression (r6).
  *
  * Same formula as `TextAnalysis.langIdColFormula` (the DuckDB-oracled
  * Catalyst/SQL mirror), but computed by one static single-pass scorer:
  * the composable formulation expands to hundreds of nested
  * `length(replace(...))` calls whose generated Java overflows janino's
  * 64 KB method limit — Spark logged "Whole-stage codegen disabled" and
  * fell back to interpreted eval for the whole projection. At crawl
  * scale langid runs per-document on the hot path; this expression is
  * one tight method call that stays inside WholeStageCodegen.
  * Equivalence with the portable formula is asserted in
  * TextAnalysisSpec on real sentences in all nine languages.
  */
case class LangId(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.LangIdName

  override protected def nullSafeEval(input: Any): Any =
    LangIdImpl.detect(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.LangIdImpl.detect($x);")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** URL percent-encoding normalization as a codegen'd expression (r6;
  * RFC 3986 §2.3/§6.2.2.1-2): hex digits of every percent escape are
  * uppercased, and escapes of UNRESERVED characters (ALPHA / DIGIT /
  * "-" / "." / "_" / "~") are decoded to the literal character —
  * `%7e` ≡ `~`, `%41` ≡ `A` name one resource but would dedup as two
  * keys raw. Escapes of reserved characters (`%2F`, `%3D`, …) are NOT
  * decoded (decoding would change URL structure), only case-folded. A
  * `%` not followed by two hex digits is copied through verbatim.
  * Applied by `Urls.canonicalize` to path and query; the q18 DuckDB
  * oracle computes the same rules independently with list/string SQL.
  */
case class PercentNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.PctNormName

  override protected def nullSafeEval(input: Any): Any =
    PercentNormalizeImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.PercentNormalizeImpl.normalize($x);")

  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

/** IDN host normalization as a codegen'd expression (r6; RFC 3490 /
  * 5890): internationalized hostnames convert to their punycode ASCII
  * compatible encoding (`bücher.example` ≡ `xn--bcher-kva.example` ≡
  * `B%C3%BCcher.example` after percent-decoding — three spellings of
  * one authority that would dedup as three keys raw). ASCII hosts pass
  * through untouched (the overwhelmingly common case: one scan, no
  * allocation); conversion failures (malformed labels) keep the input
  * verbatim — canonicalization must never lose a row. The q18 oracle
  * cannot express punycode in SQL, so planted q18 hosts stay ASCII
  * (where this is the identity) and the IDN rule is value-gated in
  * UrlsSpec instead.
  */
case class IdnAscii(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.IdnName

  override protected def nullSafeEval(input: Any): Any =
    IdnAsciiImpl.toAscii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.IdnAsciiImpl.toAscii($x);")

  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

object IdnAsciiImpl {

  def toAscii(u: UTF8String): UTF8String = {
    // fast path: pure-ASCII host is already its own ACE form
    val n = u.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((u.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return u
    try {
      // ALLOW_UNASSIGNED: crawl hosts include post-2003 codepoints
      val ace = java.net.IDN.toASCII(u.toString, java.net.IDN.ALLOW_UNASSIGNED)
      UTF8String.fromString(ace.toLowerCase(java.util.Locale.ROOT))
    } catch {
      case _: IllegalArgumentException => u // malformed label: keep verbatim
    }
  }
}

object PercentNormalizeImpl {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def unreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('%') < 0) return u // common case: no escapes, no alloc
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h1 = hexVal(s.charAt(i + 1))
        val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = h1 * 16 + h2
          if (unreserved(v)) out.append(v.toChar)
          else {
            out.append('%')
            out.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
            out.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

/** The langid scorer body — static so generated code calls it directly.
  *
  * MUST stay formula-identical to `TextAnalysis.langIdColFormula` (and
  * the q12 DuckDB oracle SQL): script-class counts are per-BMP-char
  * range counts; Latin evidence counts non-overlapping occurrences on
  * the space-padded lowercase text exactly like
  * `(length(p) - length(replace(p, s, ''))) / length(s)`.
  */
object LangIdImpl {

  private def count(p: String, s: String): Long = {
    var n = 0L
    var i = p.indexOf(s)
    while (i >= 0) { n += 1; i = p.indexOf(s, i + s.length) }
    n
  }

  private def word(p: String, s: String): Long = count(p, " " + s + " ")

  def detect(u: UTF8String): UTF8String = {
    val text = u.toString
    // script-decisive classes, one pass over the chars
    var kana, hangul, cyr, arab, cjk = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '\u3040' && c <= '\u30ff') kana += 1
      else if (c >= '\uac00' && c <= '\ud7af') hangul += 1
      else if (c >= '\u0400' && c <= '\u04ff') cyr += 1
      else if (c >= '\u0600' && c <= '\u06ff') arab += 1
      else if (c >= '\u4e00' && c <= '\u9fff') cjk += 1
      i += 1
    }
    // kana wins over ideographs (ja text mixes both); hangul/cyrillic/
    // arabic are unambiguous scripts
    if (kana > 0) return UTF8String.fromString("ja")
    if (hangul > 0) return UTF8String.fromString("ko")
    if (cyr > 0) return UTF8String.fromString("ru")
    if (arab > 0) return UTF8String.fromString("ar")
    if (cjk > 0) return UTF8String.fromString("zh")
    val p = " " + text.toLowerCase + " "
    def c(s: String) = count(p, s)
    def w(s: String) = word(p, s)
    val de = c("\u00df") * 3 + c("\u00e4") + c("\u00f6") + c("\u00fc") +
      (w("und") + w("der") + w("die") + w("das") + w("ist") + w("nicht") + w("mit")) * 2
    val fr = c("\u00e9") + c("\u00e8") + c("\u00ea") + c("\u00e7") + c("\u00f4") + c("\u00ee") + c("\u00e2") +
      (w("le") + w("la") + w("les") + w("et") + w("des") + w("est") + w("dans")) * 2
    val es = (c("\u00f1") + c("\u00bf") + c("\u00a1")) * 3 + c("\u00e1") + c("\u00ed") + c("\u00f3") + c("\u00fa") +
      (w("el") + w("los") + w("las") + w("que") + w("por") + w("con") + w("una")) * 2
    val en = (w("the") + w("and") + w("of") + w("to") + w("is") + w("in") + w("that")) * 2
    val out =
      if (de >= fr && de >= es && de >= en && de > 0) "de"
      else if (fr >= es && fr >= en && fr > 0) "fr"
      else if (es >= en && es > 0) "es"
      else "en"
    UTF8String.fromString(out)
  }
}

/** Mojibake (double-encoded UTF-8) repair as a codegen'd expression
  * (r6). The classic crawl corruption: a page's UTF-8 bytes were
  * decoded as windows-1252 somewhere upstream and re-encoded, so
  * "café — naïve" arrives as "cafÃ© â€” naÃ¯ve". The repair inverts
  * that exact transform — map each char back to its windows-1252 byte
  * and strictly re-decode as UTF-8 — and ONLY fires when the inverse
  * exists for the whole string AND the bytes form valid (shorter)
  * UTF-8: genuine Latin-1 prose like "déjà vu" has no valid UTF-8
  * reading (0xE9 expects two continuation bytes), genuine Cyrillic/CJK
  * text has chars outside windows-1252 entirely, and pure ASCII exits
  * on a scan-only fast path — so clean text is a fixed point (the q25
  * oracle asserts identity-on-clean over every fixture document by
  * hash). Up to 3 rounds handle doubly-mojibaked text. The inverse is
  * the "sloppy windows-1252" reading (ftfy's convention): Latin-1
  * identity — covering ISO-8859-1 mis-decodes, whose 0x80–0x9F bytes
  * arrive as C1 controls — overlaid with the cp1252 specials read from
  * the JDK charset, so both common mis-decode flavors invert through
  * one table. U+FFFD is deliberately NOT invertible: a strict cp1252
  * decoder collapses its five undefined bytes (81 8D 8F 90 9D) onto
  * the replacement char, so such text is information-theoretically
  * unrecoverable — and U+FFFD is common in honest crawl text, which
  * must never be "repaired".
  */
case class FixMojibake(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.MojibakeName

  override protected def nullSafeEval(input: Any): Any =
    MojibakeImpl.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.MojibakeImpl.fix($x);")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object MojibakeImpl {
  /** char → byte inverse of the "sloppy windows-1252" reading (the
    * ftfy convention): Latin-1 identity for every char < 0x100 —
    * including the C1 controls, which is what an ISO-8859-1 mis-decode
    * produces for bytes 0x80–0x9F — overlaid with the 27 cp1252
    * specials (€ ‚ ƒ … ™ œ ž Ÿ, …) above U+00FF, read from the JDK
    * decoder itself. The two char sets are disjoint, so every mapped
    * char has an unambiguous byte, and both windows-1252 and latin-1
    * mis-decodes invert through the one table. U+FFFD is unmapped on
    * purpose: a strict cp1252 decoder collapses its five undefined
    * bytes onto the replacement char, destroying the byte — strings
    * carrying U+FFFD decline repair.
    */
  private val invHighChars = new Array[Char](32)
  private val invHighBytes = new Array[Byte](32)
  private var invHighN = 0
  locally {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    var b = 0x80
    while (b < 0xA0) {
      val ch = new String(Array(b.toByte), cs).charAt(0)
      // cp1252 special; the 5 undefined bytes decode to U+FFFD and must
      // NOT be invertible (no unique inverse)
      if (ch >= 0x100 && ch != '�') {
        invHighChars(invHighN) = ch; invHighBytes(invHighN) = b.toByte; invHighN += 1
      }
      b += 1
    }
  }

  def fix(u: UTF8String): UTF8String = {
    // fast path: ASCII-only bytes can't be mojibake — no allocation
    val nb = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return u
    val s = u.toString
    val out = fixStr(s)
    if (out eq s) u else UTF8String.fromString(out)
  }

  def fixStr(s: String): String = {
    var cur = s
    var round = 0
    while (round < 3) {
      val next = once(cur)
      if (next eq cur) return cur
      cur = next
      round += 1
    }
    cur
  }

  /** One inversion round; returns the input reference unchanged when
    * the repair doesn't apply (no full inverse / invalid UTF-8 / no
    * multi-byte lead present).
    */
  private def once(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var hasLead = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val b: Int =
        if (c < 0x100) c.toInt // latin-1 identity incl. C1 controls
        else {
          var j = 0
          var found = -1
          while (found < 0 && j < invHighN) {
            if (invHighChars(j) == c) found = invHighBytes(j) & 0xFF
            j += 1
          }
          if (found < 0) return s
          found
        }
      if (b >= 0xC2 && b <= 0xF4) hasLead = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!hasLead) return s
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < s.length) out else s
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }
}
