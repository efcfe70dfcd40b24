package graft.pdf

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer
import PdfObj._

/** PDF stream filters (SURVEY.md §2.2 F1*–F6*; ISO 32000-1 §7.4).
  *
  * Image-only codecs (DCT/JPX/CCITT/JBIG2) are detected and reported as
  * undecodable — callers skip those streams for text extraction.
  */
object Filters {

  final class FilterException(msg: String) extends RuntimeException(msg)

  /** Decode a stream's raw bytes through its /Filter chain.
    * `resolve` maps indirect refs in /DecodeParms to direct objects.
    * `inflater` is reused across calls (per-partition arena, SURVEY §4.3);
    * when the caller passes none, the locally-owned Inflater is end()ed
    * so its native zlib handle is reclaimed immediately, not at GC time.
    */
  def decode(dict: PDict, raw: Array[Byte], resolve: PdfObj => PdfObj,
             inflater: Inflater = null): Array[Byte] = {
    if (inflater == null) {
      val own = new Inflater()
      try decodeWith(dict, raw, resolve, own) finally own.end()
    } else decodeWith(dict, raw, resolve, inflater)
  }

  private def decodeWith(dict: PDict, raw: Array[Byte], resolve: PdfObj => PdfObj,
                         inflater: Inflater): Array[Byte] = {
    val filters: Vector[String] = resolve(dict.get("Filter").getOrElse(PNull)) match {
      case PName(n) => Vector(n)
      case PArray(items) => items.map(resolve).collect { case PName(n) => n }
      case _ => Vector.empty
    }
    val parms: Vector[PDict] = resolve(dict.get("DecodeParms").orElse(dict.get("DP")).getOrElse(PNull)) match {
      case d: PDict => Vector(d)
      case PArray(items) => items.map(resolve).map {
        case d: PDict => d
        case _ => Empty
      }
      case _ => Vector.empty
    }
    var data = raw
    var i = 0
    while (i < filters.length) {
      val p = if (i < parms.length) parms(i) else Empty
      data = applyOne(filters(i), p, data, resolve, inflater)
      i += 1
    }
    data
  }

  private def applyOne(name: String, parms: PDict, data: Array[Byte],
                       resolve: PdfObj => PdfObj, inf: Inflater): Array[Byte] =
    name match {
      case "FlateDecode" | "Fl" => predictor(parms, resolve, inflate(data, inf))
      case "ASCIIHexDecode" | "AHx" => asciiHex(data)
      case "ASCII85Decode" | "A85" => ascii85(data)
      case "RunLengthDecode" | "RL" => runLength(data)
      case "LZWDecode" | "LZW" => predictor(parms, resolve, lzw(data, earlyChange(parms, resolve)))
      case "Crypt" => data // /Identity only (encryption handled upstream)
      case "DCTDecode" | "JPXDecode" | "CCITTFaxDecode" | "JBIG2Decode" =>
        throw new FilterException(s"image-only filter $name")
      case other => throw new FilterException(s"unknown filter $other")
    }

  // --- FlateDecode (§7.4.4) -------------------------------------------

  def inflate(data: Array[Byte], inf: Inflater): Array[Byte] = {
    inf.reset()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput()) {
          // truncated stream: return what we have (tolerant, §7.2 hazard)
          return out.toByteArray
        }
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        if (out.size() == 0) throw new FilterException(s"flate: ${e.getMessage}")
      // else: partial data recovered
    }
    out.toByteArray
  }

  // --- Predictors (§7.4.4.4): 1 none, 2 TIFF, 10–15 PNG ----------------

  private def earlyChange(parms: PDict, resolve: PdfObj => PdfObj): Int =
    parms.get("EarlyChange").map(resolve).flatMap(int).map(_.toInt).getOrElse(1)

  def predictor(parms: PDict, resolve: PdfObj => PdfObj, data: Array[Byte]): Array[Byte] = {
    val pred = parms.get("Predictor").map(resolve).flatMap(int).map(_.toInt).getOrElse(1)
    if (pred <= 1) return data
    val colors = parms.get("Colors").map(resolve).flatMap(int).map(_.toInt).getOrElse(1)
    val bpc = parms.get("BitsPerComponent").map(resolve).flatMap(int).map(_.toInt).getOrElse(8)
    val columns = parms.get("Columns").map(resolve).flatMap(int).map(_.toInt).getOrElse(1)
    val bpp = math.max(1, colors * bpc / 8) // bytes per pixel
    val rowLen = (columns * colors * bpc + 7) / 8
    if (pred == 2) tiffPredictor(data, bpp, rowLen)
    else pngPredictor(data, bpp, rowLen)
  }

  private def tiffPredictor(data: Array[Byte], bpp: Int, rowLen: Int): Array[Byte] = {
    // 8-bit components only (the common case); per-row left-delta undo
    val out = data.clone()
    var r = 0
    while (r + rowLen <= out.length) {
      var i = r + bpp
      while (i < r + rowLen) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
      r += rowLen
    }
    out
  }

  private def pngPredictor(data: Array[Byte], bpp: Int, rowLen: Int): Array[Byte] = {
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = prev(i) & 0xff
        val upLeft = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 => raw + paeth(left, up, upLeft)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      System.arraycopy(out, dst, prev, 0, rowLen)
      r += 1
    }
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // --- ASCIIHexDecode (§7.4.2) -----------------------------------------

  def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else {
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) {
          if (hi < 0) hi = v else { out += ((hi << 4) | v).toByte; hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out += (hi << 4).toByte // odd digit => trailing 0
    out.toArray
  }

  // --- ASCII85Decode (§7.4.3) ------------------------------------------

  def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](data.length * 4 / 5)
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    // skip optional <~ leader
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true // ~> EOD
      else if (c == 'z' && n == 0) { out += 0; out += 0; out += 0; out += 0 }
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) {
          var v = 0L
          var k = 0
          while (k < 5) { v = v * 85 + grp(k); k += 1 }
          out += ((v >> 24) & 0xff).toByte
          out += ((v >> 16) & 0xff).toByte
          out += ((v >> 8) & 0xff).toByte
          out += (v & 0xff).toByte
          n = 0
        }
      } // whitespace / junk ignored
      i += 1
    }
    if (n > 1) { // partial final group: pad with 'u' (84), emit n-1 bytes
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) grp(k) else 84); k += 1 }
      val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out ++= bytes.take(n - 1)
    }
    out.toArray
  }

  // --- RunLengthDecode (§7.4.5) ----------------------------------------

  def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true
      else if (l < 128) { // copy l+1 literal bytes
        val n = math.min(l + 1, data.length - i - 1)
        var k = 0
        while (k < n) { out += data(i + 1 + k); k += 1 }
        i += 1 + n
        i -= 1 // compensate tail increment
      } else { // repeat next byte 257-l times
        if (i + 1 < data.length) {
          val b = data(i + 1)
          var k = 0
          while (k < 257 - l) { out += b; k += 1 }
        }
        i += 1
      }
      i += 1
    }
    out.toArray
  }

  // --- LZWDecode (§7.4.4.2): 9→12-bit codes, clear=256, EOD=257 --------
  // Prefix-chain dictionary (no per-entry byte arrays): each code is
  // (prefixCode, suffixByte, length); entries materialize by walking the
  // chain backwards into a scratch buffer. Allocation-free steady state.

  def lzw(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val entryLen = new Array[Int](4096)
    var scratch = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      prefix(i) = -1; suffix(i) = i.toByte; entryLen(i) = 1; i += 1
    }
    var nextCode = 258
    var codeLen = 9
    var prevCode = -1

    /** Materialize `code` into scratch (right-aligned walk); returns len. */
    def emit(code: Int): Int = {
      val n = entryLen(code)
      if (scratch.length < n) scratch = new Array[Byte](math.max(n, scratch.length * 2))
      var c = code
      var p = n - 1
      while (p >= 0) { scratch(p) = suffix(c); c = prefix(c); p -= 1 }
      out.write(scratch, 0, n)
      n
    }

    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done && (pos < data.length || bitCnt >= codeLen)) {
      while (bitCnt < codeLen && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < codeLen) done = true
      else {
        val code = ((bitBuf >> (bitCnt - codeLen)) & ((1 << codeLen) - 1)).toInt
        bitCnt -= codeLen
        if (code == 256) { nextCode = 258; codeLen = 9; prevCode = -1 }
        else if (code == 257) done = true
        else {
          if (prevCode < 0) {
            if (code < 256) emit(code)
            prevCode = code
          } else {
            val known = code < nextCode && (code < 256 || code >= 258)
            // register the new entry BEFORE emitting (KwKwK case needs it)
            if (nextCode < 4096) {
              val firstByte: Byte =
                if (known) firstOf(code, prefix, suffix)
                else firstOf(prevCode, prefix, suffix)
              prefix(nextCode) = prevCode
              suffix(nextCode) = firstByte
              entryLen(nextCode) = entryLen(prevCode) + 1
              nextCode += 1
            }
            emit(if (known) code else nextCode - 1)
            prevCode = code
            if (nextCode >= (1 << codeLen) - earlyChange && codeLen < 12) codeLen += 1
          }
        }
      }
    }
    out.toByteArray
  }

  @inline private def firstOf(code: Int, prefix: Array[Int], suffix: Array[Byte]): Byte = {
    var c = code
    while (prefix(c) >= 0) c = prefix(c)
    suffix(c)
  }
}
