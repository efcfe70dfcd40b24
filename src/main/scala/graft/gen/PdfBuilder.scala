package graft.gen

import graft.job.Span
import graft.pdf.Glyphs
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic PDF builder — the extraction oracle's input half
  * (FIXTURES.md §3.1; SURVEY.md §5.2).
  *
  * Renders known paragraph text into honest PDF bytes (real offsets,
  * real xref tables / xref streams / ObjStm, real Flate via Deflater,
  * real fonts incl. /Differences, /ToUnicode bfchar+bfrange and Type0
  * Identity-H) and returns the canonical expected text per
  * SURVEY.md Appendix A. The extractor must invert this byte-for-byte.
  */
object PdfBuilder {

  final case class Built(bytes: Array[Byte], text: String, spans: Vector[Span])

  type Line = Vector[String] // words
  type Para = Vector[Line]
  type PageParas = Vector[Para]

  /** Feature axes (FIXTURES.md §3.1). */
  final case class Spec(
      xrefKind: Int, // 0 classic | 1 xref stream | 2 classic+Prev | 3 ObjStm | 4 hybrid /XRefStm
      filterKind: Int, // 0 none | 1 flate | 2 ahx | 3 a85 | 4 a85+flate chain | 5 rle | 6 lzw
      showKind: Int, // 0 Tj | 1 TJ kerning | 2 '/" forms
      posKind: Int, // 0 Td | 1 Tm | 2 T*+TL
      fontKind: Int, // 0 WinAnsi | 1 Differences | 2 ToUnicode bfchar | 3 Type0 Identity-H | 4 MacRoman | 5 Type3 | 6 Type0 UniGB-UCS2-H (UTF-16BE codes, NO ToUnicode) | 7 Symbol (built-in encoding, no /Widths) | 8 Type0 EMBEDDED CMap /Encoding stream (mixed 1/2-byte codespace) + ToUnicode | 9 Type0 GBK-EUC-H (byte-oriented predefined CMap, GBK bytes, NO ToUnicode) | 10 ZapfDingbats (built-in encoding, no /Widths, per-glyph AFM) | 11 symbolic EMBEDDED TrueType (FontFile2 sfnt: (3,0) cmap at 0xF000+code + post 2.0 uniXXXX names; NO /Encoding, NO ToUnicode) | 12 Type0 UniGB-UCS2-V VERTICAL (UTF-16BE codes; columns right-to-left, glyphs advance down) | 13 symbolic EMBEDDED Type1 (FontFile cleartext dup-put /Encoding with uniXXXX names; NO /Encoding dict entry) | 14 symbolic EMBEDDED bare CFF (FontFile3 Type1C: charset fmt 0 w/ mixed standard+custom SIDs, custom encoding fmt 0; NO /Encoding, NO /ToUnicode)
      nPages: Int, // 1 | 3 (intermediate /Pages node when 3)
      formXObject: Boolean,
      inlineImage: Boolean,
      markedContent: Boolean,
      junkAfterEof: Boolean,
      indirectLength: Boolean,
      /** AFM axis: split lines into two Td-positioned shows whose gap is
        * only decodable with real Core-14 widths (no /Widths in the font
        * dict). Applies when showKind=0, posKind∈{0,1}, fontKind∈{0,4}.
        */
      splitShow: Boolean = false,
      /** Standard security handler, EMPTY user password (ISO 32000-1
        * §7.6.3): 0 none | 1 RC4-40 /V1 /R2 | 2 RC4-128 /V2 /R3 |
        * 3 AES-128 /V4 /R4 /AESV2 | 4 AES-256 /V5 /R6 /AESV3
        * (ISO 32000-2). Applies to EVERY font kind since r4 — Type0
        * CIDSystemInfo strings encrypt per §7.6.2 via FileAsm.str.
        */
      encryptKind: Int = 0,
      /** Render-mode-3 axis (r5): the page's LAST line is shown with
        * `3 Tr` (invisible — the scanned-PDF OCR-overlay class). Text
        * bytes are unchanged; the line's span kind becomes
        * `pdf-text-hidden`.
        */
      hiddenLine: Boolean = false,
      /** Rotated-page axis (r5): text matrices quarter-turned CCW
        * ([0 1 -1 0 x y] — the sideways-scan class): baselines run
        * along +y, successive lines advance in +x. The extractor must
        * assemble via baseline projections (Appendix A rotation rule).
        */
      rotated: Boolean = false)

  private val FS = 12.0 // font size
  private val LineDy = 14.4 // 1.2 em -> single \n (App. A: 0.5 < 1.2 < 1.8)
  private val ParaDy = 28.8 // 2.4 em -> "\n\n"
  private val WordGapTJ = -250 // -0.25 em >= 0.18 -> space
  private val KernGapTJ = -20 // -0.02 em < 0.18 -> no space

  /** Unicode → WinAnsi code (generator-side reverse of Glyphs.winAnsi). */
  private lazy val winAnsiRev: Map[Int, Int] =
    Glyphs.winAnsi.zipWithIndex.collect { case (cp, code) if cp >= 0 => cp -> code }
      .groupBy(_._1).map { case (cp, xs) => cp -> xs.map(_._2).min }

  /** Unicode → Symbol code (generator-side reverse of Glyphs.symbol). */
  private lazy val symbolRev: Map[Int, Int] =
    Glyphs.symbol.zipWithIndex.collect { case (cp, code) if cp >= 0 => cp -> code }
      .groupBy(_._1).map { case (cp, xs) => cp -> xs.map(_._2).min }

  /** Unicode → ZapfDingbats code (generator-side reverse of Glyphs.dingbats). */
  private lazy val dingbatsRev: Map[Int, Int] =
    Glyphs.dingbats.zipWithIndex.collect { case (cp, code) if cp >= 0 => cp -> code }
      .groupBy(_._1).map { case (cp, xs) => cp -> xs.map(_._2).min }

  /** Unicode → MacRoman code. */
  private lazy val macRomanRev: Map[Int, Int] =
    Glyphs.macRoman.zipWithIndex.collect { case (cp, code) if cp >= 0 => cp -> code }
      .groupBy(_._1).map { case (cp, xs) => cp -> xs.map(_._2).min }

  /** Differences remaps used by fontKind 1: code → (glyphName, unicode). */
  private val diffMap: Vector[(Int, String, Char)] = Vector(
    (200, "alpha", 'α'), (201, "beta", 'β'),
    (202, "gamma", 'γ'), (203, "Euro", '€'))

  // ------------------------------------------------------------------
  // low-level file assembler
  // ------------------------------------------------------------------

  private final class FileAsm {
    final case class Obj(num: Int, body: Array[Byte], packable: Boolean)
    val objs = new ArrayBuffer[Obj]
    val updates = new ArrayBuffer[(Int, Array[Byte])] // for /Prev incremental
    private var next = 1

    def alloc(): Int = { val n = next; next += 1; n }
    def add(body: String, packable: Boolean = false): Int = {
      val n = alloc(); objs += Obj(n, latin1(body), packable); n
    }
    def addAt(num: Int, body: String, packable: Boolean = false): Int = {
      objs += Obj(num, latin1(body), packable); num
    }
    def addBytes(body: Array[Byte]): Int = {
      val n = alloc(); objs += Obj(n, body, packable = false); n
    }
    def addUpdate(num: Int, body: String): Unit = updates += ((num, latin1(body)))
    def maxNum: Int = next - 1

    // --- standard security handler state (Spec.encryptKind > 0) -----
    var crypt: Option[graft.pdf.Crypt.StdDecryptor] = None
    var cryptRng: Random = null
    /** ` /Encrypt N 0 R /ID [...]` — appended to every trailer flavor. */
    var trailerExtra: String = ""

    /** Encrypt stream/string data under object `num`'s key (AES IVs come
      * from the deterministic doc rng). Identity when not encrypting.
      */
    def enc(num: Int, data: Array[Byte]): Array[Byte] = crypt match {
      case Some(c) =>
        val iv = if (c.aes) Array.fill(16)(cryptRng.nextInt(256).toByte) else null
        c.encrypt(num, 0, data, iv)
      case None => data
    }

    /** A literal string for object `num`'s body: encrypted-hex under
      * encryption (§7.6.2: ALL strings outside the /Encrypt dict are
      * encrypted — incl. CIDSystemInfo's), plain `(s)` otherwise.
      */
    def str(num: Int, s: String): String = crypt match {
      case Some(_) => enc(num, latin1(s)).map(b => f"${b & 0xff}%02X").mkString("<", "", ">")
      case None => s"($s)"
    }

    /** Add a stream object; data is encrypted (keyed by the allocated
      * object number) before /Length is computed. `dictPrefix` is the
      * dict body without the surrounding << >> or /Length.
      */
    def addStream(dictPrefix: String, data: Array[Byte],
                  indirectLen: Boolean = false): Int = {
      val n = alloc()
      val ed = enc(n, data)
      if (indirectLen) {
        val lenNum = alloc()
        objs += Obj(n, latin1(s"<< $dictPrefix/Length $lenNum 0 R >>\nstream\n") ++
          ed ++ latin1("\nendstream"), packable = false)
        addAt(lenNum, ed.length.toString, packable = true)
      } else {
        objs += Obj(n, latin1(s"<< $dictPrefix/Length ${ed.length} >>\nstream\n") ++
          ed ++ latin1("\nendstream"), packable = false)
      }
      n
    }

    /** Serialize with the requested xref flavor. */
    def finish(xrefKind: Int, junk: Boolean, rng: Random): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(16384)
      def w(s: String): Unit = out.write(latin1(s))
      def wB(b: Array[Byte]): Unit = out.write(b, 0, b.length)
      w("%PDF-1.7\n%âãÏÓ\n")
      val offsets = scala.collection.mutable.Map.empty[Int, Long]

      def writeObj(num: Int, body: Array[Byte]): Unit = {
        offsets(num) = out.size().toLong
        w(s"$num 0 obj\n"); wB(body); w("\nendobj\n")
      }

      xrefKind match {
        case 0 | 2 =>
          objs.foreach(o => writeObj(o.num, o.body))
          val xref1 = out.size().toLong
          writeClassicXref(out, offsets.toMap, 0 to maxNum, trailer(None))
          if (xrefKind == 2 && updates.nonEmpty) {
            // incremental update: overriding bodies + xref2 with /Prev
            updates.foreach { case (num, body) => writeObj(num, body) }
            val xref2 = out.size().toLong
            writeClassicXref(out, offsets.toMap, updates.map(_._1).sorted.toSeq,
              trailer(Some(xref1)))
            w(s"startxref\n$xref2\n%%EOF\n")
          } else {
            w(s"startxref\n$xref1\n%%EOF\n")
          }
        case 1 =>
          objs.foreach(o => writeObj(o.num, o.body))
          (updates.toSeq).foreach { case (num, body) => writeObj(num, body) }
          val xn = alloc()
          val xoff = out.size().toLong
          offsets(xn) = xoff
          wB(xrefStreamObj(xn, offsets.toMap, Map.empty))
          w(s"startxref\n$xoff\n%%EOF\n")
        case 4 =>
          // hybrid (§7.5.8.4): classic table covers the plain objects,
          // its trailer's /XRefStm points at an xref stream covering
          // the stream objects (+ itself); first-seen-wins on overlap
          objs.foreach(o => writeObj(o.num, o.body))
          val xn = alloc()
          val xoff = out.size().toLong
          offsets(xn) = xoff
          val streamCovered = objs.filterNot(_.packable).map(_.num).toSet + xn
          wB(xrefStreamObj(xn,
            offsets.toMap.filter { case (k, _) => streamCovered.contains(k) }, Map.empty))
          val classicOff = out.size().toLong
          val classicNums = 0 +: objs.filter(_.packable).map(_.num).toSeq
          writeClassicXref(out, offsets.toMap, classicNums,
            s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R /XRefStm $xoff$trailerExtra >>\n")
          w(s"startxref\n$classicOff\n%%EOF\n")
        case 3 =>
          // pack packable objects into an ObjStm; streams stay top-level
          val packed = objs.filter(_.packable).toVector
          val loose = objs.filterNot(_.packable).toVector
          loose.foreach(o => writeObj(o.num, o.body))
          val stmNum = alloc()
          val header = new StringBuilder
          val bodyB = new java.io.ByteArrayOutputStream()
          var off = 0
          packed.foreach { o =>
            header.append(s"${o.num} $off ")
            bodyB.write(o.body, 0, o.body.length)
            bodyB.write(' ')
            off += o.body.length + 1
          }
          val hdr = latin1(header.toString)
          val raw = hdr ++ bodyB.toByteArray
          // the ObjStm stream body is the encrypted unit; its contained
          // objects are NOT individually encrypted (§7.5.7)
          val defl = enc(stmNum, flate(raw))
          offsets(stmNum) = out.size().toLong
          w(s"$stmNum 0 obj\n<< /Type /ObjStm /N ${packed.size} /First ${hdr.length} " +
            s"/Filter /FlateDecode /Length ${defl.length} >>\nstream\n")
          wB(defl)
          w("\nendstream\nendobj\n")
          val typ2 = packed.zipWithIndex.map { case (o, i) => o.num -> ((stmNum, i)) }.toMap
          val xn = alloc()
          val xoff = out.size().toLong
          offsets(xn) = xoff
          val looseOffsets = offsets.toMap -- typ2.keys
          wB(xrefStreamObj(xn, looseOffsets, typ2))
          w(s"startxref\n$xoff\n%%EOF\n")
      }
      if (junk) w("% trailing junk the lexer must tolerate\nGARBAGE bytes \n")
      out.toByteArray
    }

    private def trailer(prev: Option[Long]): String = {
      val p = prev.map(o => s" /Prev $o").getOrElse("")
      s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R$p$trailerExtra >>\n"
    }

    private def writeClassicXref(out: java.io.ByteArrayOutputStream,
                                 offsets: Map[Int, Long], nums: Seq[Int],
                                 trailerStr: String): Unit = {
      def w(s: String): Unit = out.write(latin1(s))
      w("xref\n")
      // contiguous subsections
      val sorted = nums.distinct.sorted
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1) == sorted(j) + 1) j += 1
        val start = sorted(i)
        val hasFree = start == 0
        w(s"$start ${j - i + 1}\n")
        (i to j).foreach { k =>
          val n = sorted(k)
          if (n == 0) w(f"${0}%010d ${65535}%05d f \n")
          else w(f"${offsets.getOrElse(n, 0L)}%010d ${0}%05d n \n")
        }
        i = j + 1
      }
      w(trailerStr)
    }

    /** /Type/XRef stream with PNG Up predictor (exercises F1* + X4). */
    private def xrefStreamObj(selfNum: Int, inFile: Map[Int, Long],
                              inStm: Map[Int, (Int, Int)]): Array[Byte] = {
      val size = maxNum + 1
      val rowLen = 7 // W [1 4 2]
      val rows = new Array[Byte](size * rowLen)
      def putRow(num: Int, t: Int, f2: Long, f3: Int): Unit = {
        val p = num * rowLen
        rows(p) = t.toByte
        rows(p + 1) = ((f2 >> 24) & 0xff).toByte
        rows(p + 2) = ((f2 >> 16) & 0xff).toByte
        rows(p + 3) = ((f2 >> 8) & 0xff).toByte
        rows(p + 4) = (f2 & 0xff).toByte
        rows(p + 5) = ((f3 >> 8) & 0xff).toByte
        rows(p + 6) = (f3 & 0xff).toByte
      }
      putRow(0, 0, 0, 65535)
      inFile.foreach { case (n, off) => putRow(n, 1, off, 0) }
      inStm.foreach { case (n, (stm, idx)) => putRow(n, 2, stm.toLong, idx) }
      // PNG Up predictor encode
      val enc = new Array[Byte](size * (rowLen + 1))
      val prev = new Array[Byte](rowLen)
      var r = 0
      while (r < size) {
        enc(r * (rowLen + 1)) = 2 // Up
        var c = 0
        while (c < rowLen) {
          enc(r * (rowLen + 1) + 1 + c) = (rows(r * rowLen + c) - prev(c)).toByte
          c += 1
        }
        System.arraycopy(rows, r * rowLen, prev, 0, rowLen)
        r += 1
      }
      // xref streams are NEVER encrypted (§7.5.8.2); their dict is the
      // trailer, so it carries /Encrypt + /ID when encryption is on
      val defl = flate(enc)
      val dict = s"<< /Type /XRef /Size $size /W [1 4 2] /Index [0 $size] /Root 1 0 R " +
        s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowLen >> " +
        s"/Length ${defl.length}$trailerExtra >>"
      val out = new java.io.ByteArrayOutputStream()
      out.write(latin1(s"$selfNum 0 obj\n$dict\nstream\n"))
      out.write(defl, 0, defl.length)
      out.write(latin1("\nendstream\nendobj\n"))
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // filter encoders (inverse of graft.pdf.Filters)
  // ------------------------------------------------------------------

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def flate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  private def ahxEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 2 + 8)
    var i = 0
    while (i < data.length) {
      sb.append(f"${data(i) & 0xff}%02X")
      if (i % 32 == 31) sb.append('\n')
      i += 1
    }
    sb.append('>')
    latin1(sb.toString)
  }

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i + 4 <= data.length) {
      val v = ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
        ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
      if (v == 0) sb.append('z')
      else {
        var x = v
        val grp = new Array[Char](5)
        var k = 4
        while (k >= 0) { grp(k) = ('!' + (x % 85)).toChar; x /= 85; k -= 1 }
        sb.appendAll(grp)
      }
      if (i % 60 == 56) sb.append('\n')
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < rem) data(i + k) & 0xffL else 0L); k += 1 }
      val grp = new Array[Char](5)
      var x = v
      k = 4
      while (k >= 0) { grp(k) = ('!' + (x % 85)).toChar; x /= 85; k -= 1 }
      sb.appendAll(grp.take(rem + 1))
    }
    sb.append("~>")
    latin1(sb.toString)
  }

  /** RunLengthDecode encoder (§7.4.5): repeat runs >= 3 as (257-n, b),
    * literals in <=128-byte chunks, 128 EOD.
    */
  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var i = 0
    val n = data.length
    while (i < n) {
      var run = 1
      while (i + run < n && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i)); i += run
      } else {
        // literal chunk up to 128 bytes, stopping before a >=3 run
        var j = i
        while (j < n && j - i < 128 &&
          !(j + 2 < n && data(j) == data(j + 1) && data(j) == data(j + 2))) j += 1
        out.write(j - i - 1)
        out.write(data, i, j - i)
        i = j
      }
    }
    out.write(128)
    out.toByteArray
  }

  /** LZWDecode encoder (§7.4.4.2): 9→12-bit variable codes, clear=256,
    * EOD=257, EarlyChange=1 (width bumps one code early, mirroring the
    * decoder in graft.pdf.Filters).
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[(Int, Byte), Int]
    var nextCode = 258
    emit(256) // clear
    if (data.nonEmpty) {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i)
        dict.get((w, b)) match {
          case Some(code) => w = code
          case None =>
            emit(w)
            if (nextCode < 4096) {
              dict((w, b)) = nextCode
              nextCode += 1
              // EarlyChange=1, mirrored to the decoder in Filters.lzw:
              // the decoder adds its table entries one code LATER than
              // the encoder (none on the first data code), so its size
              // is nextCode-1; it widens when that reaches (1<<w)-1,
              // i.e. when our nextCode reaches (1<<w)
              if (nextCode >= (1 << width) && width < 12) width += 1
            }
            w = b & 0xff
        }
        i += 1
      }
      emit(w)
    }
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** Encode stream data per filterKind; returns (filterClause, bytes). */
  private def encodeStream(data: Array[Byte], filterKind: Int): (String, Array[Byte]) =
    filterKind match {
      case 0 => ("", data)
      case 1 => ("/Filter /FlateDecode ", flate(data))
      case 2 => ("/Filter /ASCIIHexDecode ", ahxEncode(data))
      case 3 => ("/Filter /ASCII85Decode ", a85Encode(data))
      case 4 => ("/Filter [/ASCII85Decode /FlateDecode] ", a85Encode(flate(data)))
      case 5 => ("/Filter /RunLengthDecode ", rleEncode(data))
      case 6 => ("/Filter /LZWDecode ", lzwEncode(data))
      case _ => ("", data)
    }

  // ------------------------------------------------------------------
  // string encoding per font kind
  // ------------------------------------------------------------------

  /** Escape + encode a text run as a PDF literal string for 1-byte fonts.
    * `codeOf` maps a char to its byte code. Occasionally uses octal
    * escapes for high bytes (exercises the lexer).
    */
  private def literalString(s: String, codeOf: Char => Int, rng: Random): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('(')
    s.foreach { ch =>
      val code = codeOf(ch)
      code match {
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case c if c >= 0x80 =>
          if (rng.nextInt(3) == 0) sb.append(f"\\${c}%03o")
          else sb.append(c.toChar)
        case c if c < 0x20 => sb.append(f"\\${c}%03o")
        case c => sb.append(c.toChar)
      }
    }
    sb.append(')')
    sb.toString
  }

  /** Hex string of 2-byte codes for Type0 fonts. */
  private def hexString(codes: Seq[Int]): String =
    codes.map(c => f"$c%04X").mkString("<", "", ">")

  // ------------------------------------------------------------------
  // the builder
  // ------------------------------------------------------------------

  /** Font-kind-specific encoder state. */
  private final class FontEnc(fontKind: Int) {
    // fontKind 3: char → 2-byte code assignments
    val cidOf = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    private var nextCid = 0x0100

    def cid(ch: Char): Int = {
      if (ch >= 'a' && ch <= 'z') 0x0200 + (ch - 'a') // incrementing bfrange
      else cidOf.getOrElseUpdate(ch, { val c = nextCid; nextCid += 1; c })
    }

    // fontKind 2: chars deliberately remapped away from their WinAnsi slot
    val bfcharRemap: Map[Char, Int] = Map('ω' -> 0xD7, '✓' -> 0xD8)

    // fontKind 11: every char gets an arbitrary 1-byte code (space
    // pinned at 0x20); the TTF's cmap/post carry the only Unicode route
    val symOf = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    private var nextSymCode = 0x21
    def symCode(ch: Char): Int = symOf.getOrElseUpdate(ch,
      if (ch == ' ') 0x20
      else { val c = nextSymCode; nextSymCode += 1; c })

    // fontKind 8: non-ASCII chars get 2-byte codes inside the embedded
    // CMap's <8140> <FEFE> codespace range (low byte kept >= 0x40);
    // ASCII shows as 1-byte codes straight from the <20> <7E> range
    val wideOf = scala.collection.mutable.LinkedHashMap.empty[Char, Int]
    private var wideHi = 0x81
    private var wideLo = 0x40
    def wideCode(ch: Char): Int = wideOf.getOrElseUpdate(ch, {
      val c = (wideHi << 8) | wideLo
      wideLo += 1
      if (wideLo > 0xFE) { wideLo = 0x40; wideHi += 1 }
      c
    })

    def codeOf(ch: Char): Int = fontKind match {
      case 1 =>
        diffMap.find(_._3 == ch) match {
          case Some((code, _, _)) => code
          case None => winAnsiRev.getOrElse(ch.toInt, '?'.toInt)
        }
      case 2 =>
        bfcharRemap.getOrElse(ch, winAnsiRev.getOrElse(ch.toInt, '?'.toInt))
      case 4 => macRomanRev.getOrElse(ch.toInt, '?'.toInt)
      case 5 => ch.toInt // Type3: ASCII via /Differences glyph names
      case 7 => symbolRev.getOrElse(ch.toInt, '?'.toInt) // Symbol built-in
      case 10 => dingbatsRev.getOrElse(ch.toInt, 0x20) // Dingbats built-in
      case 11 | 13 | 14 => symCode(ch) // symbolic TTF/Type1/CFF: arbitrary codes
      case _ => winAnsiRev.getOrElse(ch.toInt, '?'.toInt)
    }

    /** The codepoint the EXTRACTOR will see for `ch` (code → encoding
      * table), used to mirror its AFM advance computation exactly.
      */
    def cpOf(ch: Char): Int = fontKind match {
      case 4 => Glyphs.macRoman(macRomanRev.getOrElse(ch.toInt, '?'.toInt))
      case 7 => Glyphs.symbol(symbolRev.getOrElse(ch.toInt, '?'.toInt))
      case 10 => Glyphs.dingbats(dingbatsRev.getOrElse(ch.toInt, 0x20))
      case _ => Glyphs.winAnsi(winAnsiRev.getOrElse(ch.toInt, '?'.toInt))
    }

    /** Text run → show-string (literal for 1-byte kinds, hex for Type0).
      * For Type0, surrogate pairs consume one CID per code point.
      */
    def showString(s: String, rng: Random): String = {
      if (fontKind == 6 || fontKind == 12) {
        // UTF-16BE code units verbatim (surrogate pairs = two codes)
        hexString(s.map(_.toInt))
      } else if (fontKind == 8) {
        // embedded-CMap mixed codespace: ASCII = its own 1-byte code,
        // everything else = an allocated 2-byte code
        val b = ArrayBuffer.empty[Int] // raw BYTES, not codes
        s.foreach { ch =>
          if (ch >= 0x20 && ch <= 0x7E) b += ch.toInt
          else { val c = wideCode(ch); b += (c >> 8); b += (c & 0xff) }
        }
        b.map(x => f"$x%02X").mkString("<", "", ">")
      } else if (fontKind == 9) {
        // byte-oriented GBK-EUC-H: the show bytes ARE GBK text
        s.getBytes("GBK").map(x => f"${x & 0xff}%02X").mkString("<", "", ">")
      } else if (fontKind == 3) {
        val codes = ArrayBuffer.empty[Int]
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          if (Character.isSupplementaryCodePoint(cp)) {
            codes += cidOf.getOrElseUpdate(('￿'), 0x0400) // sentinel slot
            i += Character.charCount(cp)
          } else {
            codes += cid(s.charAt(i))
            i += 1
          }
        }
        hexString(codes.toSeq)
      } else literalString(s, codeOf, rng)
    }
  }

  /** Build the /ToUnicode CMap stream body for the font kind. */
  private def toUnicodeBody(fontKind: Int, enc: FontEnc): String = {
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CMapName /Synth-UCS def\n/CMapType 2 def\n")
    if (fontKind == 3) {
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      // incrementing bfrange for a-z at 0x0200
      sb.append("1 beginbfrange\n<0200> <0219> <0061>\nendbfrange\n")
      // array-form bfrange over the ad-hoc CID slots
      val adhoc = enc.cidOf.toVector.sortBy(_._2)
      if (adhoc.nonEmpty) {
        adhoc.grouped(64).foreach { chunk =>
          // chunk entries may be non-contiguous; emit contiguous runs
          var i = 0
          val runs = ArrayBuffer.empty[Vector[(Char, Int)]]
          var cur = Vector(chunk.head)
          chunk.tail.foreach { e =>
            if (e._2 == cur.last._2 + 1) cur :+= e
            else { runs += cur; cur = Vector(e) }
          }
          runs += cur
          sb.append(s"${runs.size} beginbfrange\n")
          runs.foreach { run =>
            val lo = run.head._2; val hi = run.last._2
            val dsts = run.map { case (ch, _) =>
              if (ch == '￿') "<D835DC9C>" // U+1D49C surrogate pair
              else f"<${ch.toInt}%04X>"
            }
            sb.append(f"<$lo%04X> <$hi%04X> [${dsts.mkString(" ")}]\n")
          }
          sb.append("endbfrange\n")
        }
      }
    } else if (fontKind == 2) {
      sb.append("1 begincodespacerange\n<00> <FF>\nendcodespacerange\n")
      // remapped codes via bfchar; base chars fall through to WinAnsi? No:
      // ToUnicode wins (§9.10.2a), so cover ALL printable codes used.
      // bfchar for remaps + identity bfranges for ASCII + Latin-1.
      sb.append(s"${enc.bfcharRemap.size} beginbfchar\n")
      enc.bfcharRemap.foreach { case (ch, code) =>
        sb.append(f"<$code%02X> <${ch.toInt}%04X>\n")
      }
      sb.append("endbfchar\n")
      sb.append("2 beginbfrange\n<20> <7E> <0020>\n<A0> <FF> <00A0>\nendbfrange\n")
    } else if (fontKind == 8) {
      // deliberately-sloppy TEMPLATE codespace (all-2-byte): splitting
      // must come from the embedded /Encoding CMap, not from here
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      sb.append("1 beginbfrange\n<20> <7E> <0020>\nendbfrange\n")
      val wides = enc.wideOf.toVector
      if (wides.nonEmpty) {
        wides.grouped(100).foreach { chunk =>
          sb.append(s"${chunk.size} beginbfchar\n")
          chunk.foreach { case (ch, code) =>
            sb.append(f"<$code%04X> <${ch.toInt}%04X>\n")
          }
          sb.append("endbfchar\n")
        }
      }
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString
  }

  // ------------------------------------------------------------------

  /** Build a document. `pageParas(p)` = paragraphs of page p; each
    * paragraph is a list of lines; each line a list of words.
    * Returns the canonical expected text per Appendix A.
    */
  def build(spec: Spec, pageParas: Vector[PageParas], rng: Random): Built = {
    val asm = new FileAsm
    val enc = new FontEnc(spec.fontKind)

    // --- reserve core object numbers
    val catalogNum = asm.alloc() // 1
    val pagesNum = asm.alloc() // 2
    val fontNum = asm.alloc()

    // --- standard security handler (must precede every stream add:
    // stream data is encrypted at add time, keyed by object number)
    if (spec.encryptKind > 0) {
      import graft.pdf.Crypt
      def hx(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
      val fileId = Array.fill(16)(rng.nextInt(256).toByte)
      val perm = -44 // owner-locked permissions; the crawl-typical shape
      val (encBody, decryptor) =
        if (spec.encryptKind == 4) {
          // AES-256 /V 5 /R 6 (ISO 32000-2): random file key wrapped by
          // the empty-password KDF hashes; no per-object derivation
          def salt8() = Array.fill(8)(rng.nextInt(256).toByte)
          val none = Array.empty[Byte]
          val (vS, kS, ovS, okS) = (salt8(), salt8(), salt8(), salt8())
          val key = Array.fill(32)(rng.nextInt(256).toByte)
          val u48 = Crypt.hash2B(6, none, vS, none) ++ vS ++ kS
          val ue = Crypt.aesZeroIv(Crypt.hash2B(6, none, kS, none), key, encrypt = true)
          val o48 = Crypt.hash2B(6, none, ovS, u48) ++ ovS ++ okS
          val oe = Crypt.aesZeroIv(Crypt.hash2B(6, none, okS, u48), key, encrypt = true)
          val body = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
            "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
            s"/StmF /StdCF /StrF /StdCF /O <${hx(o48)}> /U <${hx(u48)}> " +
            s"/OE <${hx(oe)}> /UE <${hx(ue)}> /P $perm >>"
          (body, new Crypt.StdDecryptor(key, aes = true, direct = true))
        } else {
          val (v, r, bits, aes) = spec.encryptKind match {
            case 1 => (1, 2, 40, false)
            case 2 => (2, 3, 128, false)
            case _ => (4, 4, 128, true)
          }
          val n = bits / 8
          val oBytes = Crypt.ownerBytes(r, n) // empty owner AND user password
          val key = Crypt.fileKey(oBytes, perm, fileId, r, n)
          val uBytes = {
            val u = Crypt.userBytes(key, r, fileId)
            if (r == 2) u else u ++ Array.fill(16)(rng.nextInt(256).toByte) // §Alg 5 f: 16 arbitrary pad bytes
          }
          val body = v match {
            case 1 => s"<< /Filter /Standard /V 1 /R 2 /O <${hx(oBytes)}> /U <${hx(uBytes)}> /P $perm >>"
            case 2 => s"<< /Filter /Standard /V 2 /R 3 /Length $bits /O <${hx(oBytes)}> " +
              s"/U <${hx(uBytes)}> /P $perm >>"
            case _ => s"<< /Filter /Standard /V 4 /R 4 /Length $bits " +
              "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
              s"/StmF /StdCF /StrF /StdCF /O <${hx(oBytes)}> /U <${hx(uBytes)}> /P $perm >>"
          }
          (body, new Crypt.StdDecryptor(key, aes))
        }
      // never packable: the /Encrypt dict may not live in an ObjStm (§7.5.7)
      val encNum = asm.add(encBody, packable = false)
      asm.crypt = Some(decryptor)
      asm.cryptRng = rng
      asm.trailerExtra = s" /Encrypt $encNum 0 R /ID [<${hx(fileId)}> <${hx(fileId)}>]"
    }

    // font + ToUnicode + descendants (capture the alloc'd helper object
    // numbers — the /Encrypt object may sit between fontNum and them)
    var tuNumA = -1 // ToUnicode stream (fontKind 2, 3, 8)
    var descNumA = -1 // descendant CIDFont (fontKind 3, 6, 8, 9)
    var procNumA = -1 // Type3 glyph proc (fontKind 5)
    var cmNumA = -1 // embedded /Encoding CMap stream (fontKind 8)
    val fontBody: String = spec.fontKind match {
      case 0 =>
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
      case 1 =>
        val diffs = diffMap.map { case (c, n, _) => s"$c /$n" }.mkString(" ")
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences [$diffs] >> >>"
      case 2 =>
        val tuNum = asm.alloc(); tuNumA = tuNum
        s"<< /Type /Font /Subtype /TrueType /BaseFont /Synthetica /Encoding /WinAnsiEncoding /ToUnicode $tuNum 0 R >>"
      case 4 =>
        "<< /Type /Font /Subtype /TrueType /BaseFont /Times-Roman /Encoding /MacRomanEncoding >>"
      case 7 =>
        // symbolic base-14: built-in encoding, no /Encoding, no /Widths —
        // the extractor must supply BOTH from its Symbol tables
        "<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>"
      case 10 =>
        // same deal for the other symbolic base-14: per-glyph AFM widths
        // (a1..a94) drive the splitShow gap axis
        "<< /Type /Font /Subtype /Type1 /BaseFont /ZapfDingbats >>"
      case 11 =>
        // symbolic EMBEDDED TrueType: no /Encoding, no /ToUnicode —
        // text is recoverable ONLY through the FontFile2 sfnt program
        // (code → GID via the (3,0) cmap, GID → uniXXXX via post 2.0)
        val descNum = asm.alloc(); descNumA = descNum
        val ffNum = asm.alloc(); procNumA = ffNum // reuse slot for the font file
        val widths = (0x20 to 0x7E).map(_ => 500).mkString(" ")
        s"<< /Type /Font /Subtype /TrueType /BaseFont /SynthSym " +
          s"/FirstChar 32 /LastChar 126 /Widths [$widths] /FontDescriptor $descNum 0 R >>"
      case 5 =>
        // Type3 with /CharProcs + /Differences over the ASCII range; the
        // glyph procedures are inert (text extraction never renders them)
        val procNum = asm.alloc(); procNumA = procNum
        val names = "32 /space 97" + (97 to 122).map(c => s" /${c.toChar}").mkString("") +
          " 46 /period 44 /comma"
        val widths = (32 to 122).map(_ => 500).mkString(" ")
        s"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] " +
          s"/FontMatrix [0.001 0 0 0.001 0 0] " +
          s"/CharProcs << ${("space" +: ('a' to 'z').map(_.toString) :+ "period" :+ "comma").map(n => s"/$n $procNum 0 R").mkString(" ")} >> " +
          s"/Encoding << /Type /Encoding /Differences [$names] >> " +
          s"/FirstChar 32 /LastChar 122 /Widths [$widths] >>"
      case 3 =>
        val descNum = asm.alloc(); descNumA = descNum
        val tuNum = asm.alloc(); tuNumA = tuNum
        s"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID /Encoding /Identity-H " +
          s"/DescendantFonts [$descNum 0 R] /ToUnicode $tuNum 0 R >>"
      case 6 =>
        // predefined CMap: codes are UTF-16BE units; deliberately NO
        // /ToUnicode — the extractor must decode via the CMap name alone
        val descNum = asm.alloc(); descNumA = descNum
        s"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light /Encoding /UniGB-UCS2-H " +
          s"/DescendantFonts [$descNum 0 R] >>"
      case 8 =>
        // EMBEDDED CMap stream as /Encoding (§9.7.5.3): mixed 1/2-byte
        // codespace the extractor must use for splitting (the ToUnicode
        // below ships a deliberately-sloppy all-2-byte template
        // codespace, as real producers do)
        val cmNum = asm.alloc(); cmNumA = cmNum
        val descNum = asm.alloc(); descNumA = descNum
        val tuNum = asm.alloc(); tuNumA = tuNum
        s"<< /Type /Font /Subtype /Type0 /BaseFont /Embed-CID /Encoding $cmNum 0 R " +
          s"/DescendantFonts [$descNum 0 R] /ToUnicode $tuNum 0 R >>"
      case 9 =>
        // byte-oriented predefined CMap, NO /ToUnicode: the show bytes
        // are GBK text the extractor decodes via the JDK charset
        val descNum = asm.alloc(); descNumA = descNum
        s"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light /Encoding /GBK-EUC-H " +
          s"/DescendantFonts [$descNum 0 R] >>"
      case 12 =>
        // VERTICAL predefined CMap: same UTF-16BE code semantics as
        // UniGB-UCS2-H, but columns advance right-to-left and glyphs
        // down — the extractor's break/space axes must flip
        val descNum = asm.alloc(); descNumA = descNum
        s"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light /Encoding /UniGB-UCS2-V " +
          s"/DescendantFonts [$descNum 0 R] >>"
      case 13 =>
        // symbolic EMBEDDED Type1: the built-in encoding lives ONLY in
        // the /FontFile cleartext (dup code /name put)
        val descNum = asm.alloc(); descNumA = descNum
        val ffNum = asm.alloc(); procNumA = ffNum
        val widths = (0x20 to 0x7E).map(_ => 500).mkString(" ")
        s"<< /Type /Font /Subtype /Type1 /BaseFont /SynthT1 " +
          s"/FirstChar 32 /LastChar 126 /Widths [$widths] /FontDescriptor $descNum 0 R >>"
      case 14 =>
        // symbolic EMBEDDED bare CFF (/FontFile3 Type1C, r5): the
        // built-in encoding lives ONLY in the CFF charset/encoding
        val descNum = asm.alloc(); descNumA = descNum
        val ffNum = asm.alloc(); procNumA = ffNum
        val widths = (0x20 to 0x7E).map(_ => 500).mkString(" ")
        s"<< /Type /Font /Subtype /Type1 /BaseFont /SynthCFF " +
          s"/FirstChar 32 /LastChar 126 /Widths [$widths] /FontDescriptor $descNum 0 R >>"
      case _ => "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    }

    // --- render pages
    val pageTexts = ArrayBuffer.empty[String]
    val pageHidden = ArrayBuffer.empty[Option[(Int, Int)]] // Tr-3 range per page (r5)
    val contentNums = ArrayBuffer.empty[Int]
    val formNums = ArrayBuffer.empty[(String, Int)] // resource name -> obj

    pageParas.zipWithIndex.foreach { case (paras, pIdx) =>
      val (content, expected, forms, hidRange) = renderPage(spec, paras, enc, rng, pIdx)
      pageTexts += expected
      pageHidden += hidRange
      forms.foreach { case (rn, body) =>
        val (fc, data) = encodeStream(latin1(body), 1) // forms always Flate
        val n = asm.addStream(s"/Subtype /Form /Type /XObject /BBox [0 0 612 792] $fc", data)
        formNums += ((rn, n))
      }
      val (fc, data) = encodeStream(latin1(content), spec.filterKind)
      contentNums += asm.addStream(fc, data, indirectLen = spec.indirectLength)
    }

    // decoy override for xrefKind 2: page 0 content is superseded via /Prev
    if (spec.xrefKind == 2) {
      // the object written in the main body is a DECOY; the update wins
      val decoy = "BT /F1 12 Tf 72 720 Td (DECOY TEXT not extracted) Tj ET"
      val (fc, data0) = encodeStream(latin1(decoy), spec.filterKind)
      val data = asm.enc(contentNums(0), data0) // same object number, same key
      val real = asm.objs.find(_.num == contentNums(0)).get
      val decoyBody = latin1(s"<< $fc/Length ${data.length} >>\nstream\n") ++
        data ++ latin1("\nendstream")
      // swap: body1 gets decoy, update gets the real content
      val idx = asm.objs.indexWhere(_.num == contentNums(0))
      asm.objs(idx) = asm.objs(idx).copy(body = decoyBody)
      asm.addUpdate(contentNums(0), new String(real.body, "ISO-8859-1"))
    }

    // --- resources
    val fontsRes = s"/Font << /F1 $fontNum 0 R >>"
    val xobjRes =
      if (formNums.isEmpty) ""
      else " /XObject << " + formNums.map { case (rn, n) => s"/$rn $n 0 R" }.mkString(" ") + " >>"
    val resBody = s"<< $fontsRes$xobjRes >>"
    val resNum = asm.add(resBody, packable = true)

    // --- page tree
    val pageNums = contentNums.zipWithIndex.map { case (cNum, i) =>
      // pages inherit /Resources and /MediaBox from the tree when nPages=3
      val own = if (spec.nPages == 1)
        s"/Resources $resNum 0 R /MediaBox [0 0 612 792] "
      else ""
      asm.add(s"<< /Type /Page /Parent $pagesNum 0 R $own/Contents $cNum 0 R >>",
        packable = true)
    }
    if (spec.nPages == 1) {
      asm.addAt(pagesNum,
        s"<< /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count ${pageNums.size} >>",
        packable = true)
    } else {
      // intermediate /Pages node carrying inherited attributes (X6)
      val midNum = asm.alloc()
      asm.addAt(midNum,
        s"<< /Type /Pages /Parent $pagesNum 0 R /Resources $resNum 0 R /MediaBox [0 0 612 792] " +
          s"/Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count ${pageNums.size} >>",
        packable = true)
      asm.addAt(pagesNum, s"<< /Type /Pages /Kids [$midNum 0 R] /Count ${pageNums.size} >>",
        packable = true)
    }
    asm.addAt(catalogNum, s"<< /Type /Catalog /Pages $pagesNum 0 R >>", packable = true)
    asm.addAt(fontNum, fontBody, packable = spec.fontKind <= 1)

    // ToUnicode / descendant font objects (numbers were reserved in order)
    if (spec.fontKind == 2) {
      val tuNum = tuNumA
      val body = toUnicodeBody(2, enc)
      val defl = asm.enc(tuNum, flate(latin1(body)))
      asm.addAt(tuNum, s"<< /Filter /FlateDecode /Length ${defl.length} >>\nstream\n" +
        new String(defl, "ISO-8859-1") + "\nendstream")
    } else if (spec.fontKind == 3) {
      val descNum = descNumA
      val tuNum = tuNumA
      // CIDSystemInfo strings go through asm.str: under encryption ALL
      // strings outside /Encrypt are encrypted (§7.6.2) — and an object
      // with individually-encrypted strings must stay out of ObjStms
      asm.addAt(descNum,
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-CID " +
          s"/CIDSystemInfo << /Registry ${asm.str(descNum, "Adobe")} " +
          s"/Ordering ${asm.str(descNum, "Identity")} /Supplement 0 >> /DW 500 " +
          "/W [512 [600 600 600]] >>",
        packable = asm.crypt.isEmpty)
      val body = toUnicodeBody(3, enc)
      val defl = asm.enc(tuNum, flate(latin1(body)))
      asm.addAt(tuNum, s"<< /Filter /FlateDecode /Length ${defl.length} >>\nstream\n" +
        new String(defl, "ISO-8859-1") + "\nendstream")
    } else if (spec.fontKind == 6 || spec.fontKind == 9 || spec.fontKind == 12) {
      val descNum = descNumA
      asm.addAt(descNum,
        "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light " +
          s"/CIDSystemInfo << /Registry ${asm.str(descNum, "Adobe")} " +
          s"/Ordering ${asm.str(descNum, "GB1")} /Supplement 5 >> /DW 1000 >>",
        packable = asm.crypt.isEmpty)
    } else if (spec.fontKind == 8) {
      val cmNum = cmNumA
      val descNum = descNumA
      val tuNum = tuNumA
      // the embedded /Encoding CMap stream: authoritative mixed
      // codespace + cidrange/cidchar (code→CID for the CID-keyed /W)
      val cm = new StringBuilder
      cm.append("%!PS-Adobe-3.0 Resource-CMap\n")
      cm.append("/CIDSystemInfo << /Registry (Synth) /Ordering (Embed) /Supplement 0 >> def\n")
      cm.append("/CMapName /Synth-Embed-H def\n/CMapType 1 def\n")
      cm.append("2 begincodespacerange\n<20> <7E>\n<8140> <FEFE>\nendcodespacerange\n")
      cm.append("1 begincidrange\n<20> <7E> 32\nendcidrange\n")
      val wides = enc.wideOf.toVector
      if (wides.nonEmpty) {
        wides.zipWithIndex.grouped(100).foreach { chunk =>
          cm.append(s"${chunk.size} begincidchar\n")
          chunk.foreach { case ((_, code), i) =>
            cm.append(f"<$code%04X> ${0x1000 + i}\n")
          }
          cm.append("endcidchar\n")
        }
      }
      cm.append("endcmap\n")
      val cmDefl = asm.enc(cmNum, flate(latin1(cm.toString)))
      asm.addAt(cmNum,
        s"<< /Type /CMap /CMapName /Synth-Embed-H /Filter /FlateDecode /Length ${cmDefl.length} >>\nstream\n" +
          new String(cmDefl, "ISO-8859-1") + "\nendstream")
      // /W keyed by the CIDs the embedded CMap assigns (wide chars 1000,
      // ASCII CIDs 32..126 at 600 via the range form)
      asm.addAt(descNum,
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Embed-CID " +
          s"/CIDSystemInfo << /Registry ${asm.str(descNum, "Synth")} " +
          s"/Ordering ${asm.str(descNum, "Embed")} /Supplement 0 >> /DW 1000 " +
          s"/W [32 126 600 4096 ${4096 + math.max(wides.size, 1) - 1} 1000] >>",
        packable = asm.crypt.isEmpty)
      val body = toUnicodeBody(8, enc)
      val defl = asm.enc(tuNum, flate(latin1(body)))
      asm.addAt(tuNum, s"<< /Filter /FlateDecode /Length ${defl.length} >>\nstream\n" +
        new String(defl, "ISO-8859-1") + "\nendstream")
    } else if (spec.fontKind == 11) {
      val descNum = descNumA
      val ffNum = procNumA
      val ttf = TtfBuilder.build(enc.symOf.toSeq.map { case (ch, code) => code -> ch.toInt })
      val ff = asm.enc(ffNum, flate(ttf))
      asm.addAt(ffNum,
        s"<< /Filter /FlateDecode /Length1 ${ttf.length} /Length ${ff.length} >>\nstream\n" +
          new String(ff, "ISO-8859-1") + "\nendstream")
      asm.addAt(descNum,
        "<< /Type /FontDescriptor /FontName /SynthSym /Flags 4 /ItalicAngle 0 " +
          "/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 " +
          s"/FontBBox [0 -200 1000 800] /FontFile2 $ffNum 0 R >>",
        packable = true)
    } else if (spec.fontKind == 13) {
      val descNum = descNumA
      val ffNum = procNumA
      // Type1 cleartext: standard program shape, encoding as dup-puts
      // with uniXXXX names; a fake eexec section keeps the /Length1-3
      // accounting spec-shaped (charstrings are never needed for text)
      val encLines = enc.symOf.toSeq.map { case (ch, code) =>
        f"dup $code%d /uni${ch.toInt}%04X put"
      }.mkString("\n")
      val clear = "%!PS-AdobeFont-1.0: SynthT1\n" +
        "/FontName /SynthT1 def\n/PaintType 0 def\n/FontType 1 def\n" +
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n" +
        "/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n" +
        s"$encLines\nreadonly def\ncurrentdict end\ncurrentfile eexec\n"
      val fakeEnc = "0123456789abcdef" * 32 + "\n"
      val zeros = ("0" * 64 + "\n") * 8 + "cleartomark\n"
      val prog = clear + fakeEnc + zeros
      val ff = asm.enc(ffNum, latin1(prog))
      asm.addAt(ffNum,
        s"<< /Length1 ${clear.length} /Length2 ${fakeEnc.length} /Length3 ${zeros.length} " +
          s"/Length ${ff.length} >>\nstream\n" +
          new String(ff, "ISO-8859-1") + "\nendstream")
      asm.addAt(descNum,
        "<< /Type /FontDescriptor /FontName /SynthT1 /Flags 4 /ItalicAngle 0 " +
          "/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 " +
          s"/FontBBox [0 -200 1000 800] /FontFile $ffNum 0 R >>",
        packable = true)
    } else if (spec.fontKind == 14) {
      val descNum = descNumA
      val ffNum = procNumA
      val cff = CffBuilder.build(enc.symOf.toSeq.map { case (ch, code) => code -> ch.toInt })
      val ff = asm.enc(ffNum, flate(cff))
      asm.addAt(ffNum,
        s"<< /Subtype /Type1C /Filter /FlateDecode /Length ${ff.length} >>\nstream\n" +
          new String(ff, "ISO-8859-1") + "\nendstream")
      asm.addAt(descNum,
        "<< /Type /FontDescriptor /FontName /SynthCFF /Flags 4 /ItalicAngle 0 " +
          "/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 " +
          s"/FontBBox [0 -200 1000 800] /FontFile3 $ffNum 0 R >>",
        packable = true)
    } else if (spec.fontKind == 5) {
      // inert Type3 glyph procedure shared by every /CharProcs entry
      val procNum = procNumA
      val proc = asm.enc(procNum, latin1("500 0 0 0 1000 1000 d1"))
      asm.addAt(procNum, s"<< /Length ${proc.length} >>\nstream\n" +
        new String(proc, "ISO-8859-1") + "\nendstream")
    }

    val bytes = asm.finish(spec.xrefKind, spec.junkAfterEof, rng)

    // canonical text: pages joined "\n\n", one span per page
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var emitted = 0
    pageTexts.zipWithIndex.foreach { case (t, p) =>
      if (t.nonEmpty) {
        if (emitted > 0) sb.append("\n\n")
        val start = sb.length
        sb.append(t)
        pageHidden(p) match {
          // Tr-3 line: page span partitions around the hidden range
          // (separator chars stay "pdf-text", mirroring the extractor)
          case Some((hs, he)) if he > hs =>
            if (hs > 0) spans += Span(start, start + hs, p, "pdf-text")
            spans += Span(start + hs, start + he, p, "pdf-text-hidden")
            if (he < t.length) spans += Span(start + he, start + t.length, p, "pdf-text")
          case _ =>
            spans += Span(start, sb.length, p, "pdf-text")
        }
        emitted += 1
      }
    }
    Built(bytes, sb.toString, spans.result())
  }

  /** Locale-safe 1-decimal formatting (never a decimal comma). */
  private def d1(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))

  /** Render one page's content stream. Returns (content, expectedText,
    * form xobjects to register).
    * The expected text is built IN LOCKSTEP with the emitted operators,
    * applying Appendix A: lines joined '\n', paragraphs '\n\n'.
    */
  private def renderPage(spec: Spec, paras: PageParas,
                         enc: FontEnc, rng: Random,
                         pIdx: Int): (String, String, Vector[(String, String)], Option[(Int, Int)]) = {
    val ops = new StringBuilder
    val exp = new java.lang.StringBuilder
    val forms = Vector.newBuilder[(String, String)]

    // render-mode-3 axis: (paraIdx, lineIdx) of the page's last line
    val hiddenPos: Option[(Int, Int)] =
      if (!spec.hiddenLine) None
      else paras.zipWithIndex.reverse.collectFirst {
        case (ls, pi) if ls.nonEmpty => (pi, ls.size - 1)
      }
    var hidRange: Option[(Int, Int)] = None

    // VERTICAL axis (fontKind 12): each source line becomes a COLUMN —
    // columns placed right-to-left via Tm x-steps (LineDy within a
    // paragraph, ParaDy between), glyphs advancing down inside each
    // column by the font's natural 1-em vertical displacement. The
    // expected text is identical in shape to the horizontal case; only
    // the geometry differs (Appendix A vertical rule, r4).
    if (spec.fontKind == 12) {
      ops.append("% synthetic vertical page content\n")
      if (spec.markedContent) ops.append("/Synth BMC\n")
      ops.append("BT\n/F1 12 Tf\n")
      var x = 540.0
      var vFirst = true
      paras.zipWithIndex.foreach { case (lines, paraIdx) =>
        lines.zipWithIndex.foreach { case (words, li) =>
          x -= (if (vFirst) 0.0 else if (li == 0) ParaDy else LineDy)
          val lineText = words.mkString(" ")
          val hide = hiddenPos.contains((paraIdx, li))
          ops.append(s"1 0 0 1 ${d1(x)} 720 Tm\n")
          if (hide) ops.append("3 Tr\n")
          ops.append(enc.showString(lineText, rng)).append(" Tj\n")
          if (hide) ops.append("0 Tr\n")
          if (!vFirst) exp.append(if (li == 0) "\n\n" else "\n")
          if (hide) hidRange = Some((exp.length, exp.length + lineText.length))
          exp.append(lineText)
          vFirst = false
        }
      }
      ops.append("ET\n")
      if (spec.markedContent) ops.append("EMC\n")
      return (ops.toString, exp.toString, Vector.empty, hidRange)
    }

    // ROTATED axis (r5, fontKind-agnostic except vertical): quarter-
    // turn CCW text matrices — in-line direction +y, line advance +x.
    // Same expected text shape; only the geometry differs (Appendix A
    // rotation rule: origins/gaps are baseline projections).
    if (spec.rotated) {
      ops.append("% synthetic rotated page content\n")
      if (spec.markedContent) ops.append("/Synth BMC\n")
      ops.append("BT\n/F1 12 Tf\n")
      var x = 72.0
      var rFirst = true
      paras.zipWithIndex.foreach { case (lines, paraIdx) =>
        lines.zipWithIndex.foreach { case (words, li) =>
          x += (if (rFirst) 0.0 else if (li == 0) ParaDy else LineDy)
          val lineText = words.mkString(" ")
          val hide = hiddenPos.contains((paraIdx, li))
          ops.append(s"0 1 -1 0 ${d1(x)} 72 Tm\n")
          if (hide) ops.append("3 Tr\n")
          ops.append(enc.showString(lineText, rng)).append(" Tj\n")
          if (hide) ops.append("0 Tr\n")
          if (!rFirst) exp.append(if (li == 0) "\n\n" else "\n")
          if (hide) hidRange = Some((exp.length, exp.length + lineText.length))
          exp.append(lineText)
          rFirst = false
        }
      }
      ops.append("ET\n")
      if (spec.markedContent) ops.append("EMC\n")
      return (ops.toString, exp.toString, Vector.empty, hidRange)
    }

    var y = 720.0
    var first = true // no line emitted yet on this page
    var needAbsolute = true // BT was (re)opened: next line positions absolutely

    ops.append("% synthetic page content\n")
    if (spec.markedContent) ops.append("/Synth BMC\n")
    ops.append("BT\n/F1 12 Tf\n")

    // a paragraph rendered inside a form XObject (extra axis)
    val formParaIdx = if (spec.formXObject && paras.size >= 2) 1 else -1

    // AFM split axis (see Spec.splitShow): only meaningful where each
    // line is a single Td-positioned Tj on a base-14 font WITHOUT
    // /Widths — the x-advance of the first segment is then computable
    // only from the Core-14 AFM metrics (Glyphs.stdWidth)
    val splitApplies = spec.splitShow && spec.showKind == 0 && spec.posKind <= 1 &&
      (spec.fontKind == 0 || spec.fontKind == 4 || spec.fontKind == 7 ||
        spec.fontKind == 10)
    val baseFontName = if (spec.fontKind == 4) "Times-Roman" else "Helvetica"

    /** Mirror of the interpreter's advance for a shown segment:
      * Σ width(code)/1000 · Tfs (tc = tw = 0, tz = 100 here).
      */
    def advancePts(s: String): Double = {
      var a = 0.0
      var i = 0
      while (i < s.length) {
        val w =
          if (spec.fontKind == 7) // Symbol widths are CODE-keyed
            Glyphs.symbolCodeWidths.getOrElse(enc.codeOf(s.charAt(i)), 500)
          else if (spec.fontKind == 10) // Dingbats too (a1..a94 AFM)
            Glyphs.dingbatsCodeWidths.getOrElse(enc.codeOf(s.charAt(i)), 740)
          else Glyphs.stdWidth(baseFontName, enc.cpOf(s.charAt(i)))
        a += w / 1000.0 * FS
        i += 1
      }
      a
    }

    /** Show a line as two Td-positioned segments: a word-boundary split
      * with a ≥-threshold gap (reads back as a space) or an intra-word
      * split with a kern-sized gap (reads back seamless). Both require
      * the extractor's pen x to track real AFM advances.
      */
    def emitSplitShow(lineText: String): Unit = {
      val words = lineText.split(' ')
      def plain(): Unit = emitShow(ops, spec, lineText, enc, rng)
      val wordSplit = rng.nextInt(2) == 0
      val (s1, s2, gapEm) =
        if (wordSplit && words.length >= 2) {
          val k = 1 + rng.nextInt(words.length - 1)
          (words.take(k).mkString(" "), words.drop(k).mkString(" "), 0.25)
        } else {
          val k = words.indexWhere(_.length >= 4)
          if (k < 0) { plain(); return }
          val cut = 1 + rng.nextInt(words(k).length - 2)
          ((words.take(k) :+ words(k).substring(0, cut)).mkString(" "),
            (words(k).substring(cut) +: words.drop(k + 1)).mkString(" "), 0.02)
        }
      val dx = advancePts(s1) + gapEm * FS
      ops.append(enc.showString(s1, rng)).append(" Tj\n")
      ops.append(s"${d1(dx)} 0 Td\n")
      ops.append(enc.showString(s2, rng)).append(" Tj\n")
      // restore the line origin so subsequent relative Td lines don't
      // inherit a cumulatively growing x offset (extraction-neutral:
      // a same-line negative gap emits nothing)
      ops.append(s"${d1(-dx)} 0 Td\n")
    }

    /** Position to the next line and show it. dy = 0 for page's first line. */
    def emitLine(lineText: String, dy: Double): Unit = {
      val useQuote = spec.showKind == 2 && !needAbsolute && dy > 0
      if (useQuote) {
        // '/" forms carry their own T* line advance via TL
        if (dy != LineDy) ops.append(s"${d1(dy)} TL\n")
        val s = enc.showString(lineText, rng)
        if (rng.nextInt(3) == 0) ops.append(s"0.5 0.1 $s \"\n")
        else ops.append(s"$s '\n")
        if (dy != LineDy) ops.append(s"${d1(LineDy)} TL\n")
      } else {
        spec.posKind match {
          case 0 =>
            if (needAbsolute) ops.append(s"72 ${d1(y)} Td\n")
            else ops.append(s"0 ${d1(-dy)} Td\n")
          case 1 =>
            ops.append(s"1 0 0 1 72 ${d1(y)} Tm\n")
          case _ =>
            if (needAbsolute) ops.append(s"${d1(LineDy)} TL\n72 ${d1(y)} Td\n")
            else if (dy == LineDy) ops.append("T*\n")
            else ops.append(s"${d1(dy)} TL\nT*\n${d1(LineDy)} TL\n")
        }
        if (splitApplies && lineText.length >= 8) emitSplitShow(lineText)
        else emitShow(ops, spec, lineText, enc, rng)
      }
      needAbsolute = false
    }

    paras.zipWithIndex.foreach { case (lines, paraIdx) =>
      if (paraIdx == formParaIdx) {
        // close the text object, draw this paragraph inside a form XObject
        ops.append("ET\n")
        val rn = s"Fx$pIdx"
        val formOps = new StringBuilder
        formOps.append("BT\n/F1 12 Tf\n")
        lines.zipWithIndex.foreach { case (words, li) =>
          y -= (if (first) 0 else if (li == 0) ParaDy else LineDy)
          val lineText = words.mkString(" ")
          val hide = hiddenPos.contains((paraIdx, li))
          formOps.append(s"1 0 0 1 72 ${d1(y)} Tm\n")
          if (hide) formOps.append("3 Tr\n")
          formOps.append(enc.showString(lineText, rng)).append(" Tj\n")
          if (hide) formOps.append("0 Tr\n")
          if (!first) exp.append(if (li == 0) "\n\n" else "\n")
          if (hide) hidRange = Some((exp.length, exp.length + lineText.length))
          exp.append(lineText)
          first = false
        }
        formOps.append("ET\n")
        forms += ((rn, formOps.toString))
        ops.append(s"q 1 0 0 1 0 0 cm /$rn Do Q\n")
        ops.append("BT\n/F1 12 Tf\n")
        needAbsolute = true
      } else {
        lines.zipWithIndex.foreach { case (words, li) =>
          val dy = if (first) 0.0 else if (li == 0) ParaDy else LineDy
          y -= dy
          val lineText = words.mkString(" ")
          val hide = hiddenPos.contains((paraIdx, li))
          if (hide) ops.append("3 Tr\n")
          // quote-flow needs a TL before the first positioned line
          if (spec.showKind == 2 && needAbsolute) {
            ops.append(s"${d1(LineDy)} TL\n72 ${d1(y)} Td\n")
            emitShow(ops, spec, lineText, enc, rng)
            needAbsolute = false
          } else emitLine(lineText, dy)
          if (hide) ops.append("0 Tr\n")
          if (!first) exp.append(if (li == 0) "\n\n" else "\n")
          if (hide) hidRange = Some((exp.length, exp.length + lineText.length))
          exp.append(lineText)
          first = false
        }
        // inline image between paragraphs (extra axis)
        if (spec.inlineImage && paraIdx == 0) {
          ops.append("ET\n")
          // raw data with a non-delimited "EI" trap (EIx / yEI) inside
          ops.append("BI /W 4 /H 4 /CS /G /BPC 8 ID ")
          ops.append("EIxyEIzq9w7k4p2m")
          ops.append(" EI\nBT\n/F1 12 Tf\n")
          needAbsolute = true
        }
      }
    }
    ops.append("ET\n")
    if (spec.markedContent) ops.append("EMC\n")
    (ops.toString, exp.toString, forms.result(), hidRange)
  }

  /** Emit the show op for one line: Tj or TJ-with-kerning. */
  private def emitShow(ops: StringBuilder, spec: Spec, lineText: String,
                       enc: FontEnc, rng: Random): Unit = {
    if (spec.showKind == 1) {
      // TJ: word gaps as numbers above the space threshold; occasional
      // intra-word kerning split below it.
      val words = lineText.split(' ')
      val parts = ArrayBuffer.empty[String]
      words.zipWithIndex.foreach { case (w, i) =>
        if (i > 0) parts += WordGapTJ.toString
        if (w.length >= 4 && rng.nextInt(4) == 0) {
          val cut = 1 + rng.nextInt(w.length - 2)
          parts += enc.showString(w.substring(0, cut), rng)
          parts += KernGapTJ.toString
          parts += enc.showString(w.substring(cut), rng)
        } else parts += enc.showString(w, rng)
      }
      ops.append(parts.mkString("[", " ", "]")).append(" TJ\n")
    } else {
      ops.append(enc.showString(lineText, rng)).append(" Tj\n")
    }
  }
}
