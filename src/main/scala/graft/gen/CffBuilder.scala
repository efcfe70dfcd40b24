package graft.gen

import java.io.ByteArrayOutputStream

/** Minimal honest bare-CFF (Type1C) builder for the embedded-CFF axis
  * (fontKind 14): real header, Name/Top-DICT/String INDEX structures,
  * a format-0 charset, a format-0 CUSTOM encoding, and a CharStrings
  * INDEX of endchar stubs (glyph outlines are never needed for text).
  * The extractor must recover text through exactly the
  * code→GID→SID→name→Unicode chain real subset CFF fonts require
  * (pdf/Cff.scala). Layout per Adobe Tech Note #5176.
  *
  * SIDs are deliberately MIXED: ASCII letters/digits/space use the
  * spec's standard SIDs (computed here independently of the parser's
  * table — a genuine cross-check), everything else gets a custom
  * `uniXXXX` string (SID 391+k).
  *
  * `codes` maps show-code (1 byte) → Unicode codepoint; glyph id for
  * the k-th entry (insertion order) is k+1 (0 = .notdef).
  */
object CffBuilder {

  /** Standard SID for a codepoint, per Tech Note #5176 Appendix A
    * ordering: space=1, digits 17-26, A-Z 34-59, a-z 66-91.
    */
  private def standardSid(cp: Int): Int =
    if (cp == ' ') 1
    else if (cp >= '0' && cp <= '9') 17 + (cp - '0')
    else if (cp >= 'A' && cp <= 'Z') 34 + (cp - 'A')
    else if (cp >= 'a' && cp <= 'z') 66 + (cp - 'a')
    else -1

  def build(codes: Seq[(Int, Int)]): Array[Byte] = {
    val n = codes.size // glyphs 1..n; gid 0 = .notdef
    def u8(v: Int) = Array(v.toByte)
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    // INDEX with 1-byte offsets (all our payloads are tiny)
    def index(items: Seq[Array[Byte]]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(u16(items.size), 0, 2)
      if (items.nonEmpty) {
        o.write(1) // offSize
        var off = 1
        o.write(off)
        items.foreach { it => off += it.length; o.write(off) }
        items.foreach(it => o.write(it, 0, it.length))
      }
      o.toByteArray
    }

    // custom strings for non-standard glyphs, assigned SIDs 391+k in
    // insertion order
    val customStrings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val glyphSids: Seq[Int] = codes.map { case (_, cp) =>
      val std = standardSid(cp)
      if (std >= 0) std
      else {
        val name = f"uni$cp%04X"
        customStrings.getOrElseUpdate(name, 391 + customStrings.size)
      }
    }

    val header = Array[Byte](1, 0, 4, 1) // major 1, minor 0, hdrSize 4, offSize 1
    val nameIndex = index(Seq("SynthCFF".getBytes("ISO-8859-1")))
    val stringIndex = index(customStrings.keys.toSeq.map(_.getBytes("ISO-8859-1")))
    val gsubrIndex = index(Seq.empty)
    // Top DICT uses fixed 5-byte (op 29) ints so its size is layout-
    // independent: charset(15), Encoding(16), CharStrings(17)
    def dictInt(v: Int, op: Int): Array[Byte] =
      Array(29.toByte, ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte, op.toByte)
    val topDictLen = 3 * 6
    val topDictIndexLen = 2 + 1 + 2 + topDictLen // count, offSize, 2 offsets, dict

    val charsetLen = 1 + n * 2 // format 0: SID per glyph 1..n
    val encodingLen = 2 + n // format 0: nCodes, code per glyph 1..n
    val charsetOff = header.length + nameIndex.length + topDictIndexLen +
      stringIndex.length + gsubrIndex.length
    val encodingOff = charsetOff + charsetLen
    val charStringsOff = encodingOff + encodingLen

    val topDict = dictInt(charsetOff, 15) ++ dictInt(encodingOff, 16) ++
      dictInt(charStringsOff, 17)
    require(topDict.length == topDictLen)
    val topDictIndex = index(Seq(topDict))
    require(topDictIndex.length == topDictIndexLen)

    val o = new ByteArrayOutputStream()
    o.write(header, 0, header.length)
    o.write(nameIndex, 0, nameIndex.length)
    o.write(topDictIndex, 0, topDictIndex.length)
    o.write(stringIndex, 0, stringIndex.length)
    o.write(gsubrIndex, 0, gsubrIndex.length)
    o.write(0) // charset format 0
    glyphSids.foreach(sid => o.write(u16(sid), 0, 2))
    o.write(0) // encoding format 0 (no supplements)
    o.write(n)
    codes.foreach { case (code, _) => o.write(code) }
    // CharStrings INDEX: n+1 single-byte endchar (0x0e) stubs
    val endchar = Array[Byte](0x0e)
    val cs = index(Seq.fill(n + 1)(endchar))
    o.write(cs, 0, cs.length)
    val out = o.toByteArray
    require(out.length == charStringsOff + cs.length)
    out
  }
}
