package graft.pdf

import scala.collection.mutable

/** Minimal sfnt (TrueType/OpenType) table parser — the Unicode source
  * of LAST resort for simple TrueType fonts with neither /ToUnicode
  * nor a decodable /Encoding (SURVEY §7.2 r5 #1, pulled into r4).
  *
  * Symbolic subsetted TrueType fonts are a large real-crawl class:
  * their show codes resolve only through the embedded font program —
  * code → GID via the (3,0) symbol cmap (codes live at 0xF000+code by
  * Microsoft convention, sometimes at the raw code), then GID →
  * Unicode via the `post` table's glyph names (AGL/uniXXXX) or by
  * inverting a coexisting (3,1)/(0,x) Unicode cmap.
  *
  * Parses only what extraction needs: the table directory, `cmap`
  * subtable formats 0/4/6/12, and `post` format 2.0. Structures are
  * public data (Apple "TrueType Reference Manual", Microsoft OpenType
  * spec §cmap/§post). Malformed tables degrade to empty maps — the
  * caller falls back to its encoding chain, never throws.
  */
object Sfnt {

  final case class FontMaps(
      /** Unicode codepoint → glyph id ((3,1), (0,x) or format-12). */
      uniToGid: Map[Int, Int],
      /** Symbol-cmap code → glyph id ((3,0); keys as stored, incl. 0xF0xx). */
      symToGid: Map[Int, Int],
      /** Glyph id → PostScript glyph name (`post` 2.0). */
      gidName: Map[Int, String]) {

    private lazy val gidToUni: Map[Int, Int] =
      uniToGid.groupBy(_._2).map { case (g, m) => g -> m.keys.min }

    /** 1-byte show code → Unicode string ("" unmapped): symbol cmap
      * (0xF000+code, then raw code) → glyph name (AGL/uniXXXX) or
      * inverted Unicode cmap.
      */
    def symbolCodeToUnicode(code: Int): String = {
      val gid = symToGid.get(0xF000 | code).orElse(symToGid.get(code))
      gid match {
        case Some(g) =>
          gidName.get(g).flatMap(Glyphs.glyphToUnicode)
            .orElse(gidToUni.get(g).filter(Character.isValidCodePoint)
              .map(cp => new String(Character.toChars(cp))))
            .getOrElse("")
        case None => ""
      }
    }

    def usable: Boolean = symToGid.nonEmpty && (gidName.nonEmpty || uniToGid.nonEmpty)
  }

  val empty = FontMaps(Map.empty, Map.empty, Map.empty)

  private def u8(b: Array[Byte], p: Int): Int = b(p) & 0xff
  private def u16(b: Array[Byte], p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) | ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  def parse(data: Array[Byte]): FontMaps = {
    try parseUnsafe(data)
    catch { case _: Exception => empty }
  }

  private def parseUnsafe(data: Array[Byte]): FontMaps = {
    if (data.length < 12) return empty
    // sfnt version: 0x00010000, 'true', or 'OTTO' (CFF outlines still
    // carry cmap/post in the sfnt wrapper)
    val numTables = u16(data, 4)
    var cmapOff = -1L
    var postOff = -1L
    var i = 0
    while (i < numTables) {
      val rec = 12 + i * 16
      if (rec + 16 > data.length) return empty
      val tag = new String(data, rec, 4, "ISO-8859-1")
      val off = u32(data, rec + 8)
      if (tag == "cmap") cmapOff = off
      if (tag == "post") postOff = off
      i += 1
    }
    val (uni, sym) = if (cmapOff >= 0 && cmapOff < data.length) parseCmap(data, cmapOff.toInt)
      else (Map.empty[Int, Int], Map.empty[Int, Int])
    val names = if (postOff >= 0 && postOff < data.length) parsePost(data, postOff.toInt)
      else Map.empty[Int, String]
    FontMaps(uni, sym, names)
  }

  /** Returns (unicodeSubtable, symbolSubtable) code→gid maps. */
  private def parseCmap(b: Array[Byte], off: Int): (Map[Int, Int], Map[Int, Int]) = {
    val n = u16(b, off + 2)
    var uni = Map.empty[Int, Int]
    var sym = Map.empty[Int, Int]
    var i = 0
    while (i < n) {
      val rec = off + 4 + i * 8
      val platform = u16(b, rec)
      val encoding = u16(b, rec + 2)
      val sub = off + u32(b, rec + 4).toInt
      val isUnicode = platform == 0 || (platform == 3 && (encoding == 1 || encoding == 10))
      val isSymbol = platform == 3 && encoding == 0
      if ((isUnicode || isSymbol) && sub + 4 <= b.length) {
        val m = parseSubtable(b, sub)
        if (isSymbol) sym = m ++ sym
        // prefer the widest Unicode subtable (format 12 > 4)
        else if (m.size > uni.size) uni = m
      }
      i += 1
    }
    (uni, sym)
  }

  private def parseSubtable(b: Array[Byte], p: Int): Map[Int, Int] = {
    val out = mutable.Map.empty[Int, Int]
    u16(b, p) match {
      case 0 => // byte encoding
        var c = 0
        while (c < 256 && p + 6 + c < b.length) {
          val g = u8(b, p + 6 + c)
          if (g != 0) out(c) = g
          c += 1
        }
      case 4 =>
        val segX2 = u16(b, p + 6)
        val segs = segX2 / 2
        val endP = p + 14
        val startP = endP + segX2 + 2
        val deltaP = startP + segX2
        val rangeP = deltaP + segX2
        var s = 0
        while (s < segs) {
          val end = u16(b, endP + s * 2)
          val start = u16(b, startP + s * 2)
          val delta = u16(b, deltaP + s * 2)
          val rangeOff = u16(b, rangeP + s * 2)
          if (start != 0xFFFF || end != 0xFFFF) {
            var c = start
            while (c <= end && c != 0x10000) {
              val g =
                if (rangeOff == 0) (c + delta) & 0xFFFF
                else {
                  // glyphIdArray indexing: address arithmetic relative
                  // to the idRangeOffset slot itself (OpenType §cmap)
                  val gp = rangeP + s * 2 + rangeOff + (c - start) * 2
                  if (gp + 1 < b.length) {
                    val gi = u16(b, gp)
                    if (gi == 0) 0 else (gi + delta) & 0xFFFF
                  } else 0
                }
              if (g != 0) out(c) = g
              c += 1
            }
          }
          s += 1
        }
      case 6 =>
        val first = u16(b, p + 6)
        val cnt = u16(b, p + 8)
        var k = 0
        while (k < cnt && p + 10 + k * 2 + 1 < b.length) {
          val g = u16(b, p + 10 + k * 2)
          if (g != 0) out(first + k) = g
          k += 1
        }
      case 12 =>
        val nGroups = u32(b, p + 12).toInt
        var k = 0
        while (k < nGroups && p + 16 + k * 12 + 11 < b.length) {
          val gp = p + 16 + k * 12
          val startC = u32(b, gp).toInt
          val endC = u32(b, gp + 4).toInt
          val startG = u32(b, gp + 8).toInt
          var c = startC
          while (c <= endC && c - startC < 0x10000) { // runaway guard
            out(c) = startG + (c - startC)
            c += 1
          }
          k += 1
        }
      case _ => ()
    }
    out.toMap
  }

  /** Standard Macintosh glyph order, indices 0..96: .notdef/.null/CR
    * then the ASCII range 0x20..0x7E under AGL names (Apple TrueType
    * Reference Manual `post` table; the non-ASCII tail 97..257 is
    * omitted — unmapped indices degrade to "").
    */
  private lazy val macGlyphNames: Array[String] = {
    val ascii = Array(
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quotesingle", "parenleft", "parenright", "asterisk",
      "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
      "three", "four", "five", "six", "seven", "eight", "nine", "colon",
      "semicolon", "less", "equal", "greater", "question", "at",
      "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
      "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
      "bracketleft", "backslash", "bracketright", "asciicircum",
      "underscore", "grave",
      "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
      "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
      "braceleft", "bar", "braceright", "asciitilde")
    Array(".notdef", ".null", "nonmarkingreturn") ++ ascii
  }

  private def parsePost(b: Array[Byte], p: Int): Map[Int, String] = {
    if (u32(b, p) != 0x00020000L) return Map.empty // only format 2.0 carries names
    val numGlyphs = u16(b, p + 32)
    val idxP = p + 34
    val poolP = idxP + numGlyphs * 2
    // read the Pascal-string pool
    val pool = mutable.ArrayBuffer.empty[String]
    var q = poolP
    while (q < b.length && q + u8(b, q) < b.length && pool.size < numGlyphs) {
      val len = u8(b, q)
      pool += new String(b, q + 1, len, "ISO-8859-1")
      q += 1 + len
    }
    val out = mutable.Map.empty[Int, String]
    var g = 0
    while (g < numGlyphs && idxP + g * 2 + 1 < b.length) {
      val idx = u16(b, idxP + g * 2)
      if (idx >= 258) {
        val k = idx - 258
        if (k < pool.size) out(g) = pool(k)
      } else if (idx < macGlyphNames.length && idx >= 3) {
        out(g) = macGlyphNames(idx)
      }
      g += 1
    }
    out.toMap
  }
}
