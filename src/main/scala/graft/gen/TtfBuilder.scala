package graft.gen

import java.io.ByteArrayOutputStream

/** Minimal honest TrueType builder for the symbolic-font axis
  * (fontKind 11): real sfnt directory with computed checksums, `head`/
  * `maxp` stubs, a (3,0) symbol `cmap` (format 4, codes at
  * 0xF000+code), and a `post` 2.0 whose custom names are `uniXXXX` of
  * the intended character. The extractor must recover text through
  * exactly the code→GID→name→Unicode chain real symbolic subset fonts
  * require (pdf/Sfnt.scala).
  *
  * `codes` maps show-code (0x20..0xFE) → Unicode codepoint; glyph id
  * for the k-th entry (insertion order) is k+1 (0 = .notdef).
  */
object TtfBuilder {

  def build(codes: Seq[(Int, Int)]): Array[Byte] = {
    val sorted = codes.sortBy(_._1)
    val gidOf: Map[Int, Int] = codes.zipWithIndex.map { case ((c, _), i) => c -> (i + 1) }.toMap
    val numGlyphs = codes.size + 1

    def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    // --- head (54 bytes; magic at +12) --------------------------------
    val head = {
      val o = new ByteArrayOutputStream()
      o.write(u32(0x00010000L)); o.write(u32(0)) // version, fontRevision
      o.write(u32(0)) // checkSumAdjustment (left 0; directory sums are real)
      o.write(u32(0x5F0F3CF5L)) // magicNumber
      o.write(u16(0)); o.write(u16(1000)) // flags, unitsPerEm
      o.write(new Array[Byte](8 * 2)) // created/modified
      o.write(u16(0)); o.write(u16(0)); o.write(u16(1000)); o.write(u16(1000)) // bbox
      o.write(u16(0)); o.write(u16(8)) // macStyle, lowestRecPPEM
      o.write(u16(2)); o.write(u16(0)) // fontDirectionHint, indexToLocFormat
      o.write(u16(0)) // glyphDataFormat
      o.toByteArray
    }

    // --- maxp (version 0.5 stub) --------------------------------------
    val maxp = {
      val o = new ByteArrayOutputStream()
      o.write(u32(0x00005000L)); o.write(u16(numGlyphs))
      o.toByteArray
    }

    // --- cmap: (3,0) format 4, one segment per code + terminator ------
    val cmap = {
      val segs = sorted.map { case (c, _) => 0xF000 | c } :+ 0xFFFF
      val segCount = segs.size
      val sub = new ByteArrayOutputStream()
      sub.write(u16(4)) // format
      sub.write(u16(16 + segCount * 8)) // length
      sub.write(u16(0)) // language
      sub.write(u16(segCount * 2))
      val floorLog = 31 - Integer.numberOfLeadingZeros(segCount)
      sub.write(u16(2 * (1 << floorLog))) // searchRange
      sub.write(u16(floorLog)) // entrySelector
      sub.write(u16(segCount * 2 - 2 * (1 << floorLog))) // rangeShift
      segs.foreach(e => sub.write(u16(e))) // endCode[]
      sub.write(u16(0)) // reservedPad
      segs.foreach(e => sub.write(u16(e))) // startCode[] (= endCode: 1-code segs)
      // idDelta[]: gid = code + delta (mod 2^16); terminator maps to 0
      sorted.foreach { case (c, _) =>
        sub.write(u16((gidOf(c) - (0xF000 | c)) & 0xFFFF))
      }
      sub.write(u16(1))
      segs.foreach(_ => sub.write(u16(0))) // idRangeOffset[]
      val o = new ByteArrayOutputStream()
      o.write(u16(0)); o.write(u16(1)) // version, numTables
      o.write(u16(3)); o.write(u16(0)); o.write(u32(12)) // (3,0) at offset 12
      val subB = sub.toByteArray
      o.write(subB, 0, subB.length)
      o.toByteArray
    }

    // --- post 2.0: custom names "uniXXXX" -----------------------------
    val post = {
      val o = new ByteArrayOutputStream()
      o.write(u32(0x00020000L))
      o.write(new Array[Byte](28)) // italicAngle..maxMemType1
      o.write(u16(numGlyphs))
      o.write(u16(0)) // gid 0 -> .notdef (standard index 0)
      codes.zipWithIndex.foreach { case (_, i) => o.write(u16(258 + i)) }
      codes.foreach { case (_, cp) =>
        val name = f"uni$cp%04X"
        o.write(name.length)
        o.write(name.getBytes("ISO-8859-1"))
      }
      o.toByteArray
    }

    // --- assemble: directory sorted by tag, 4-byte-aligned tables -----
    val tables = Seq(("cmap", cmap), ("head", head), ("maxp", maxp), ("post", post))
    def pad4(b: Array[Byte]): Array[Byte] =
      if (b.length % 4 == 0) b else b ++ new Array[Byte]((4 - b.length % 4) % 4)
    def checksum(b: Array[Byte]): Long = {
      val p = pad4(b)
      var s = 0L
      var i = 0
      while (i < p.length) {
        s = (s + (((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL))) & 0xFFFFFFFFL
        i += 4
      }
      s
    }
    val out = new ByteArrayOutputStream()
    out.write(u32(0x00010000L))
    out.write(u16(tables.size))
    val fl = 31 - Integer.numberOfLeadingZeros(tables.size)
    out.write(u16(16 * (1 << fl)))
    out.write(u16(fl))
    out.write(u16(16 * tables.size - 16 * (1 << fl)))
    var off = 12 + tables.size * 16
    tables.foreach { case (tag, body) =>
      out.write(tag.getBytes("ISO-8859-1"))
      out.write(u32(checksum(body)))
      out.write(u32(off))
      out.write(u32(body.length))
      off += pad4(body).length
    }
    tables.foreach { case (_, body) => out.write(pad4(body)) }
    out.toByteArray
  }
}
