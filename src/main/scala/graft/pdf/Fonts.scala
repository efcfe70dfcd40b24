package graft.pdf

import PdfObj._

/** Font model + glyph decoding (SURVEY.md §2.4 FN1–FN3, FN6;
  * ISO 32000-1 §9.5–9.10).
  *
  * Unicode preference order per §9.10.2: (a) /ToUnicode CMap,
  * (b) /Encoding (+/Differences) glyph names via AGL,
  * (c) fallback: the base encoding's codepoint, else U+FFFD-free skip.
  */
final case class FontInfo(
    name: String, // resource name, diagnostics only
    subtype: String,
    bytesPerCode: Int, // 1 simple, 2 Identity-H (refined by CMap codespace)
    toUnicode: ToUnicodeCMap,
    encTable: Array[Int], // simple fonts: code -> codepoint (may be null)
    diffNames: Map[Int, String], // /Differences overrides: code -> glyph name
    widths: Map[Int, Int], // code -> width (1000-em units)
    defaultWidth: Int,
    isType0: Boolean,
    identityCid: Boolean,
    /** Predefined Uni*-UCS2/UTF16 CMap (§9.7.5.2): codes ARE UTF-16BE
      * code units, so code→Unicode needs no table at all.
      */
    utf16Codes: Boolean = false,
    /** Embedded /Encoding CMap stream (§9.7.5.3): authoritative code
      * splitting + code→CID for CID-keyed /W widths.
      */
    cidMap: CidCMap = null,
    /** Byte-oriented predefined CMap family (PredefCMaps): code bytes
      * decode to Unicode through this JDK charset.
      */
    byteCharset: java.nio.charset.Charset = null,
    /** Vertical writing mode (a `*-V` predefined CMap or a usecmap of
      * one, §9.7.5.2 Table 118): glyphs advance DOWN the column and
      * columns progress right-to-left — the interpreter flips its
      * advance/break axes (SURVEY Appendix A vertical rule, r4).
      */
    vertical: Boolean = false,
    /** Symbolic-TrueType recovery table (Sfnt): code → Unicode via the
      * embedded font program's (3,0) cmap + post/inverse-Unicode-cmap.
      * Null when absent; "" entries fall through to the encoding chain.
      */
    sfntMap: Array[String] = null) {

  // decode caches: glyph decoding is the hottest per-character path of
  // the whole engine; caching turns repeated map lookups + String
  // allocations into an array/hash hit (per font instance, which the
  // interpreter already caches per document)
  private[this] val cache256: Array[String] =
    if (!isType0) new Array[String](256) else null
  private[this] val cacheWide = new scala.collection.mutable.LongMap[String](64)

  /** Decode one code to its Unicode string ("" = unmapped). */
  def codeToUnicode(code: Int): String = {
    if (cache256 != null && code >= 0 && code < 256) {
      val c = cache256(code)
      if (c != null) return c
      val v = decodeUncached(code)
      cache256(code) = v
      v
    } else {
      cacheWide.getOrElseUpdate(code.toLong, decodeUncached(code))
    }
  }

  private def decodeUncached(code: Int): String = {
    if (!toUnicode.isEmpty) {
      toUnicode.lookup(code.toLong) match {
        case Some(s) if s.nonEmpty => return s
        case _ => ()
      }
    }
    diffNames.get(code).flatMap(Glyphs.glyphToUnicode) match {
      case Some(s) => s
      case None =>
        if (sfntMap != null && code >= 0 && code < 256 && sfntMap(code).nonEmpty)
          // symbolic TrueType: the embedded font program is the ONLY
          // truthful route — a Standard/WinAnsi fallback would emit
          // wrong Latin letters for symbol codes
          sfntMap(code)
        else if (!isType0 && encTable != null && code >= 0 && code < 256 && encTable(code) >= 0)
          new String(Character.toChars(encTable(code)))
        else if (byteCharset != null) {
          // byte-oriented predefined CMap (or a usecmap base): the code
          // bytes ARE national-charset text; stateless CJK charsets
          // decode per-code identically to whole-string decode
          val b =
            if ((code >>> 16) != 0) // 4-byte GB18030 code (top bit may be set: compare unsigned)
              Array[Byte]((code >>> 24).toByte, ((code >> 16) & 0xff).toByte,
                ((code >> 8) & 0xff).toByte, (code & 0xff).toByte)
            else if (code > 0xFF) Array[Byte](((code >> 8) & 0xff).toByte, (code & 0xff).toByte)
            else Array[Byte]((code & 0xff).toByte)
          val s = new String(b, byteCharset)
          if (s.indexOf('�') >= 0) "" else s
        }
        else if (utf16Codes && code >= 0 && code <= 0xFFFF)
          // one UTF-16 code unit per code; adjacent surrogate halves
          // reassemble naturally when the shown codes concatenate
          String.valueOf(code.toChar)
        else if (isType0)
          "" // Identity CID with no ToUnicode: unmappable (SURVEY §2.4 FN3)
        else if (code >= 0x20 && code <= 0xFF)
          code.toChar.toString // last-resort Latin-1 passthrough (§9.10.2 c)
        else ""
    }
  }

  /** /W is CID-keyed (§9.7.4.3): with an embedded CMap the width key is
    * cid(code); everywhere else code IS the key (simple fonts, and
    * Identity-H where CID = code).
    */
  @inline private def widthKey(code: Int): Int =
    if (cidMap != null && cidMap.hasCids) {
      val c = cidMap.cid(code.toLong)
      if (c >= 0) c else code
    } else code

  private[this] val widthCache256: Array[Int] = {
    val a = new Array[Int](256)
    var i = 0
    while (i < 256) { a(i) = widths.getOrElse(widthKey(i), defaultWidth); i += 1 }
    a
  }

  /** Glyph advance width in text-space units per em-1000. */
  def width(code: Int): Int =
    if (code >= 0 && code < 256) widthCache256(code)
    else widths.getOrElse(widthKey(code), defaultWidth)

  /** Split a show-string's bytes into codes.
    *
    * Simple (non-Type0) fonts ALWAYS consume exactly 1 byte per code
    * (§9.6.6: byte codes); real-world simple fonts often ship template
    * ToUnicode CMaps declaring a 2-byte codespace (<0000> <FFFF>), which
    * must not change the code length. Codespace-driven splitting applies
    * only to Type0 composite fonts (§9.7.6.2).
    */
  def codes(bytes: Array[Byte]): Array[Int] = {
    if (!isType0) {
      val out = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
      out
    } else if (cidMap != null && cidMap.codeSpace.nonEmpty) {
      // embedded or byte-oriented /Encoding CMap: ITS codespace is the
      // authoritative splitter (§9.7.6.2) — template ToUnicode
      // codespaces routinely disagree with it
      val out = Array.newBuilder[Int]
      var p = 0
      while (p < bytes.length) {
        val n = cidMap.codeLen(bytes, p)
        var v = 0
        var k = 0
        while (k < n && p + k < bytes.length) { v = (v << 8) | (bytes(p + k) & 0xff); k += 1 }
        out += v
        p += math.max(n, 1)
      }
      out.result()
    } else if (bytesPerCode == 2 && toUnicode.codeSpace.isEmpty) {
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)
        i += 1
      }
      out
    } else {
      // variable-length codes per the ToUnicode codespace
      val out = Array.newBuilder[Int]
      var p = 0
      while (p < bytes.length) {
        val n = toUnicode.codeLen(bytes, p)
        var v = 0
        var k = 0
        while (k < n && p + k < bytes.length) { v = (v << 8) | (bytes(p + k) & 0xff); k += 1 }
        out += v
        p += math.max(n, 1)
      }
      out.result()
    }
  }
}

object Fonts {

  /** Build a FontInfo from a font dict (cached per (doc, resource name)
    * by the interpreter).
    */
  def load(doc: PdfDocument, resName: String, fontDict: PDict): FontInfo = {
    val subtype = doc.resolve(fontDict.get("Subtype").getOrElse(PNull)) match {
      case PName(s) => s
      case _ => "Type1"
    }
    val baseFont = doc.resolve(fontDict.get("BaseFont").getOrElse(PNull)) match {
      case PName(s) => s
      case _ => ""
    }
    val toUni: ToUnicodeCMap = doc.resolve(fontDict.get("ToUnicode").getOrElse(PNull)) match {
      case s: PStream =>
        try ToUnicodeCMap.parse(doc.decodeStream(s))
        catch { case _: Exception => ToUnicodeCMap.empty }
      case _ => ToUnicodeCMap.empty
    }

    if (subtype == "Type0") loadType0(doc, resName, fontDict, toUni)
    else loadSimple(doc, resName, fontDict, subtype, baseFont, toUni)
  }

  private def loadSimple(doc: PdfDocument, resName: String, fontDict: PDict,
                         subtype: String, baseFont: String,
                         toUni: ToUnicodeCMap): FontInfo = {
    // symbolic base-14 fonts use their BUILT-IN encoding (§9.6.6.4)
    // unless /Encoding overrides it
    val bfLower = {
      val i = baseFont.lastIndexOf('+') // subset prefix
      (if (i >= 0) baseFont.substring(i + 1) else baseFont).toLowerCase
    }
    val isSymbol = bfLower.contains("symbol")
    val isDingbats = bfLower.contains("dingbat")
    // /Encoding: name, or dict {/BaseEncoding, /Differences}
    var encTable: Array[Int] =
      if (isSymbol) Glyphs.symbol
      else if (isDingbats) Glyphs.dingbats
      else Glyphs.standard
    var diffs = Map.empty[Int, String]
    def baseByName(n: String): Array[Int] = n match {
      case "WinAnsiEncoding" => Glyphs.winAnsi
      case "MacRomanEncoding" => Glyphs.macRoman
      case "StandardEncoding" => Glyphs.standard
      case _ => Glyphs.standard
    }
    doc.resolve(fontDict.get("Encoding").getOrElse(PNull)) match {
      case PName(n) => encTable = baseByName(n)
      case d: PDict =>
        d.get("BaseEncoding").map(doc.resolve) match {
          case Some(PName(n)) => encTable = baseByName(n)
          case _ => ()
        }
        d.get("Differences").map(doc.resolve) match {
          case Some(PArray(items)) =>
            var code = 0
            val b = Map.newBuilder[Int, String]
            items.foreach {
              case PInt(v) => code = v.toInt
              case PName(g) => b += code -> g; code += 1
              case _ => ()
            }
            diffs = b.result()
          case _ => ()
        }
      case _ => ()
    }

    // widths: /FirstChar + /Widths, /MissingWidth. Type3 widths are in
    // GLYPH SPACE (§9.6.5): scale by the /FontMatrix a-coefficient into
    // the 1000-em units the interpreter's advance math expects (for the
    // common [0.001 0 0 0.001 0 0] this is the identity).
    val glyphScale: Double =
      if (subtype != "Type3") 1.0
      else doc.resolve(fontDict.get("FontMatrix").getOrElse(PNull)) match {
        case PArray(items) if items.nonEmpty =>
          num(doc.resolve(items.head)).map(_ * 1000.0).getOrElse(1.0)
        case _ => 1.0
      }
    val firstChar = doc.resolve(fontDict.get("FirstChar").getOrElse(PNull)) match {
      case PInt(v) => v.toInt
      case _ => 0
    }
    val widths: Map[Int, Int] = doc.resolve(fontDict.get("Widths").getOrElse(PNull)) match {
      case PArray(items) =>
        items.zipWithIndex.flatMap { case (w, i) =>
          num(doc.resolve(w)).map(v => (firstChar + i) -> (v * glyphScale).round.toInt)
        }.toMap
      case _ => Map.empty
    }
    val missing = doc.dictOf(fontDict.get("FontDescriptor").getOrElse(PNull))
      .get("MissingWidth").map(doc.resolve).flatMap(int).map(_.toInt)
      .getOrElse(Glyphs.defaultWidth(baseFont))

    // FN6: base-14 fonts may legally omit /Widths (§9.6.2.2 note) — the
    // viewer is expected to know the AFM metrics. Synthesize code→width
    // from the Core-14 AFM tables composed with the active encoding
    // (+/Differences); only the positional-gap heuristic consumes these.
    val effWidths: Map[Int, Int] =
      if (widths.nonEmpty) widths
      else if (isSymbol) Glyphs.symbolCodeWidths // code-keyed (own encoding)
      else if (isDingbats) Glyphs.dingbatsCodeWidths // code-keyed (own encoding)
      else Glyphs.afmTable(baseFont) match {
        case Some(tbl) =>
          val b = Map.newBuilder[Int, Int]
          var c = 0
          while (c < 256) {
            val cp = diffs.get(c)
              .flatMap(Glyphs.glyphToUnicode).filter(_.length == 1)
              .map(_.charAt(0).toInt)
              .orElse(if (encTable != null && encTable(c) >= 0) Some(encTable(c)) else None)
            cp.foreach { p =>
              val w = Glyphs.afmWidthAt(tbl, p)
              if (w >= 0) b += c -> w
            }
            c += 1
          }
          b.result()
        case None => Map.empty
      }

    // symbolic embedded-font recovery (SURVEY §7.2 r5 #1, pulled into
    // r4): a font with NO /Encoding uses its built-in mapping
    // (§9.6.6.4), which for subset fonts lives only in the embedded
    // program. TrueType: sfnt (3,0) cmap code→GID, then post names /
    // inverse Unicode cmap. Type1: the cleartext `dup code /name put`
    // encoding array (Type1Enc). Unmapped codes fall through to the
    // encoding-table chain.
    val sfntMap: Array[String] =
      if (fontDict.get("Encoding").isDefined || isSymbol || isDingbats) null
      else {
        val fd = doc.dictOf(fontDict.get("FontDescriptor").getOrElse(PNull))
        def streamOf(key: String): Option[PStream] =
          fd.get(key).map(doc.resolve).collect { case s: PStream => s }
        val viaSfnt: Option[Array[String]] =
          if (subtype != "TrueType") None
          else streamOf("FontFile2").orElse(streamOf("FontFile3")).flatMap { s =>
            // whole resolution inside the try: a malformed table must
            // degrade this font, never fail the document (per-font
            // fallback contract)
            try {
              val maps = Sfnt.parse(doc.decodeStream(s))
              if (!maps.usable) None
              else Some(Array.tabulate(256)(maps.symbolCodeToUnicode))
            } catch { case _: Exception => None }
          }
        val viaType1: Option[Array[String]] =
          if (viaSfnt.isDefined || subtype == "TrueType") None
          else streamOf("FontFile").flatMap { s =>
            val names =
              try Type1Enc.parse(doc.decodeStream(s))
              catch { case _: Exception => Map.empty[Int, String] }
            if (names.isEmpty) None
            else Some(Array.tabulate(256)(c =>
              names.get(c).flatMap(Glyphs.glyphToUnicode).getOrElse("")))
          }
        // bare CFF (/FontFile3 Subtype /Type1C, r5): custom
        // charset/encoding resolve code → SID name → AGL/uniXXXX
        val viaCff: Option[Array[String]] =
          if (viaSfnt.isDefined || viaType1.isDefined || subtype == "TrueType") None
          else streamOf("FontFile3").flatMap { s =>
            try {
              val names = Cff.parse(doc.decodeStream(s))
              if (names.isEmpty) None
              else Some(Array.tabulate(256)(c =>
                names.get(c).flatMap(Glyphs.glyphToUnicode).getOrElse("")))
            } catch { case _: Exception => None }
          }
        viaSfnt.orElse(viaType1).orElse(viaCff).filter(_.exists(_.nonEmpty)).orNull
      }

    FontInfo(resName, subtype, 1, toUni, encTable, diffs, effWidths, missing,
      isType0 = false, identityCid = false, sfntMap = sfntMap)
  }

  /** Thrown for Type0 fonts using a predefined CID CMap (UniGB-UCS2-H
    * etc.) with no /ToUnicode: text would be silently unmappable, so
    * the document becomes an error row with a DISTINCT countable tag —
    * at corpus scale these (mostly CJK) documents must be observable,
    * not silently emptied (VERDICT r1 item 10).
    */
  final class UnsupportedCMapException(cmapName: String)
    extends RuntimeException(s"unsupported-cmap:$cmapName")

  private def loadType0(doc: PdfDocument, resName: String, fontDict: PDict,
                        toUni: ToUnicodeCMap): FontInfo = {
    val encObj = doc.resolve(fontDict.get("Encoding").getOrElse(PNull))
    val encName = encObj match {
      case PName(s) => s
      case _ => ""
    }
    var identity = encName == "Identity-H" || encName == "Identity-V"
    // Every predefined Uni*-UCS2-* / Uni*-UTF16-* CMap (UniGB, UniCNS,
    // UniJIS, UniJIS2004, UniJISX0213, UniKS × H/V/HW; Adobe
    // cmap-resources registry) maps UTF-16BE code units to CIDs — so for
    // TEXT extraction the code IS the Unicode, no CID table needed. This
    // recovers most CJK crawl PDFs that lack /ToUnicode (VERDICT r2
    // "what's missing" #2).
    def isUtf16Name(n: String): Boolean =
      n.startsWith("Uni") && (n.contains("-UCS2-") || n.contains("-UTF16-"))
    var utf16 = isUtf16Name(encName)
    // byte-oriented predefined CMaps (GBK-EUC-H, 90ms-RKSJ-H, …): code
    // bytes decode through the JDK national-charset decoder (r4;
    // VERDICT r3 "next" #6)
    var byteCMap: Option[PredefCMaps.ByteCMap] =
      if (encName.nonEmpty && !identity && !utf16) PredefCMaps.lookup(encName) else None
    // embedded CMap stream (§9.7.5.3): parse code→CID + codespace; text
    // comes from /ToUnicode or the usecmap base's semantics (r4;
    // VERDICT r3 "next" #1)
    var cidMap: CidCMap = encObj match {
      case s: PStream =>
        try {
          var cm = CidCMap.parse(doc.decodeStream(s))
          if (cm.useCMap.nonEmpty) {
            if (isUtf16Name(cm.useCMap)) {
              utf16 = true
              cm = cm.withBaseCodeSpace(Vector((0x0000L, 0xFFFFL, 2)))
            } else if (cm.useCMap.startsWith("Identity")) {
              identity = true
              cm = cm.withBaseCodeSpace(Vector((0x0000L, 0xFFFFL, 2)))
            } else {
              byteCMap = PredefCMaps.lookup(cm.useCMap)
              byteCMap.foreach(b => cm = cm.withBaseCodeSpace(b.codeSpace))
            }
          }
          cm
        } catch { case _: Exception => null }
      case _ => byteCMap.map(b => new CidCMap(b.codeSpace, Map.empty, Vector.empty, "")).orNull
    }
    if (!identity && !utf16 && byteCMap.isEmpty && toUni.isEmpty) {
      // no Unicode route at all: /ToUnicode absent AND the CMap (name or
      // embedded stream) resolves to raw CIDs under an ordering we ship
      // no tables for — tag DISTINCTLY, per shape (ADVICE r2)
      encObj match {
        case _: PStream => throw new UnsupportedCMapException("embedded")
        case _ =>
          throw new UnsupportedCMapException(if (encName.isEmpty) "none" else encName)
      }
    }
    // /DescendantFonts [ CIDFont ] → /W ranges, /DW default 1000 (§9.7.4.3)
    val desc: PDict = doc.resolve(fontDict.get("DescendantFonts").getOrElse(PNull)) match {
      case PArray(items) if items.nonEmpty => doc.dictOf(items.head)
      case _ => Empty
    }
    val dw = desc.get("DW").map(doc.resolve).flatMap(int).map(_.toInt).getOrElse(1000)
    val widths: Map[Int, Int] = doc.resolve(desc.get("W").getOrElse(PNull)) match {
      case PArray(items) =>
        // forms: `c [w1 w2 …]` or `cFirst cLast w`
        val b = Map.newBuilder[Int, Int]
        var i = 0
        val v = items.map(doc.resolve)
        while (i < v.length) {
          (v.lift(i), v.lift(i + 1)) match {
            case (Some(PInt(c)), Some(PArray(ws))) =>
              ws.zipWithIndex.foreach { case (w, k) =>
                num(doc.resolve(w)).foreach(x => b += (c.toInt + k) -> x.toInt)
              }
              i += 2
            case (Some(PInt(c1)), Some(PInt(c2))) =>
              v.lift(i + 2).flatMap(x => num(x)).foreach { w =>
                var c = c1.toInt
                while (c <= c2.toInt) { b += c -> w.toInt; c += 1 }
              }
              i += 3
            case _ => i += 1
          }
        }
        b.result()
      case _ => Map.empty
    }
    // NOTE under utf16/byte-oriented names: /W is keyed by CID, and
    // code→CID needs the Adobe ordering tables we deliberately don't
    // ship — /DW (CJK fonts are overwhelmingly full-width 1000) feeds
    // the gap heuristic instead; only spacing inference is affected,
    // never the glyph text. An EMBEDDED CMap carries its own code→CID,
    // so /W stays live through FontInfo.widthKey.
    val cidKeyed = cidMap != null && cidMap.hasCids
    val vertical = encName.endsWith("-V") ||
      (cidMap != null && cidMap.useCMap.endsWith("-V"))
    FontInfo(resName, "Type0", 2, toUni, null, Map.empty,
      if ((utf16 || byteCMap.nonEmpty) && !cidKeyed) Map.empty else widths, dw,
      isType0 = true, identityCid = identity, utf16Codes = utf16,
      cidMap = cidMap, byteCharset = byteCMap.map(_.charset).orNull,
      vertical = vertical)
  }
}
