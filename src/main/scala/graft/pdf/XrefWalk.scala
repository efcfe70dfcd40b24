package graft.pdf

import PdfObj._
import scala.collection.mutable

/** Cross-reference machinery (SURVEY.md §2.2 X2–X5; ISO 32000-1 §7.5).
  *
  * Walks classic xref tables, xref streams (/Type/XRef with /W + /Index +
  * predictor-coded data), /Prev incremental-update chains, hybrid
  * /XRefStm, and object streams (/Type/ObjStm). First-seen-wins merge
  * order (newest section first) implements incremental updates.
  */
object XrefWalk {

  sealed trait Entry
  /** Object lives at a byte offset in the file. */
  final case class InFile(offset: Long) extends Entry
  /** Object is packed inside object stream `stmNum` at index `idx`. */
  final case class InObjStm(stmNum: Int, idx: Int) extends Entry
  /** Object deleted (type 'f' / type 0). Recorded — not skipped — so a
    * newer free entry shadows an older in-use one during the
    * first-seen-wins merge (§7.5.4: incremental deletes must win).
    */
  case object Free extends Entry

  final case class XrefResult(entries: Map[Int, Entry], trailer: PDict)

  final class PdfStructureException(msg: String) extends RuntimeException(msg)

  /** Locate the `startxref` offset by scanning the last 1 KiB (§7.5.5);
    * tolerates trailing junk after %%EOF.
    */
  def findStartXref(buf: Array[Byte]): Option[Long] = {
    val tail = math.max(0, buf.length - 1024)
    val s = new String(buf, tail, buf.length - tail, "ISO-8859-1")
    val i = s.lastIndexOf("startxref")
    if (i < 0) None
    else {
      val rest = s.substring(i + "startxref".length)
      val numStr = rest.trim.takeWhile(_.isDigit)
      if (numStr.isEmpty) None else Some(numStr.toLong)
    }
  }

  /** Walk the full xref chain from `start`. Returns merged entries +
    * merged trailer (first-seen keys win — the newest update's values).
    */
  def walk(buf: Array[Byte], start: Long,
           inflater: java.util.zip.Inflater = null): XrefResult = {
    val entries = mutable.Map.empty[Int, Entry]
    var trailerAcc = Map.empty[String, PdfObj]
    val seen = mutable.Set.empty[Long]
    var queue = List(start)
    while (queue.nonEmpty) {
      val off = queue.head
      queue = queue.tail
      if (!seen.contains(off) && off >= 0 && off < buf.length) {
        seen += off
        val (section, trailer) = parseSection(buf, off.toInt, inflater)
        section.foreach { case (num, e) =>
          if (!entries.contains(num)) entries(num) = e
        }
        trailer.m.foreach { case (k, v) =>
          if (!trailerAcc.contains(k)) trailerAcc += k -> v
        }
        // hybrid: /XRefStm points at an xref stream shadowing this table
        trailer.get("XRefStm").flatMap(int).foreach(o => queue = o :: queue)
        trailer.get("Prev").flatMap(int).foreach(o => queue = queue :+ o)
      }
    }
    XrefResult(entries.toMap, PDict(trailerAcc))
  }

  /** Parse one xref section (classic table or xref stream) at `off`. */
  private def parseSection(buf: Array[Byte], off: Int,
                           inflater: java.util.zip.Inflater): (Seq[(Int, Entry)], PDict) = {
    val lx = new Lexer(buf, off, buf.length)
    lx.skipWs()
    val save = lx.pos
    lx.next() match {
      case Tok.TKw("xref") => parseClassic(lx)
      case Tok.TInt(_) =>
        // `n g obj` header of an xref stream
        lx.pos = save
        parseXrefStream(buf, off, inflater)
      case other =>
        throw new PdfStructureException(s"no xref at offset $off (got $other)")
    }
  }

  /** Classic table: `start count` headers + 20-byte entries (§7.5.4). */
  private def parseClassic(lx: Lexer): (Seq[(Int, Entry)], PDict) = {
    val out = Vector.newBuilder[(Int, Entry)]
    var go = true
    while (go) {
      val save = lx.pos
      lx.next() match {
        case Tok.TInt(startNum) =>
          lx.next() match {
            case Tok.TInt(count) =>
              lx.skipWs()
              var i = 0L
              while (i < count) {
                // 20-byte entries `nnnnnnnnnn ggggg n|f` — lex tolerantly
                val offTok = lx.next()
                val genTok = lx.next()
                val kindTok = lx.next()
                (offTok, genTok, kindTok) match {
                  case (Tok.TInt(o), Tok.TInt(_), Tok.TKw(k)) =>
                    if (k == "n") out += ((startNum + i).toInt -> InFile(o))
                    else if (k == "f") out += ((startNum + i).toInt -> Free)
                  case _ => // malformed entry: skip
                }
                i += 1
              }
            case _ => lx.pos = save; go = false
          }
        case Tok.TKw("trailer") =>
          val p = new ObjParser(lx, null)
          val t = p.parseObj() match {
            case d: PDict => d
            case _ => Empty
          }
          return (out.result(), t)
        case _ => lx.pos = save; go = false
      }
    }
    (out.result(), Empty)
  }

  /** Xref stream (§7.5.8): /W field widths, /Index subsections, entry
    * types 0=free, 1=InFile(offset), 2=InObjStm(stm, idx).
    */
  private def parseXrefStream(buf: Array[Byte], off: Int,
                              inflater: java.util.zip.Inflater): (Seq[(Int, Entry)], PDict) = {
    val lx = new Lexer(buf, off, buf.length)
    // header `n g obj`
    (lx.next(), lx.next(), lx.next()) match {
      case (Tok.TInt(_), Tok.TInt(_), Tok.TKw("obj")) => ()
      case _ => throw new PdfStructureException(s"bad xref-stream header at $off")
    }
    val p = new ObjParser(lx, null) // /Length of xref streams must be direct
    p.parseObj() match {
      case PStream(dict, raw) =>
        val data = Filters.decode(dict, raw, identity, inflater)
        val w: Array[Int] = dict.get("W") match {
          case Some(PArray(items)) => items.flatMap(int).map(_.toInt).toArray
          case _ => throw new PdfStructureException("xref stream missing /W")
        }
        val size = dict.get("Size").flatMap(int).getOrElse(0L)
        val index: Vector[Long] = dict.get("Index") match {
          case Some(PArray(items)) => items.flatMap(int)
          case _ => Vector(0L, size)
        }
        val rowLen = w.sum
        val out = Vector.newBuilder[(Int, Entry)]
        var pos = 0
        var s = 0
        while (s + 1 < index.length) {
          val first = index(s).toInt
          val count = index(s + 1).toInt
          var i = 0
          while (i < count && pos + rowLen <= data.length) {
            var f = 0
            val fields = new Array[Long](w.length)
            while (f < w.length) {
              var v = 0L
              var b = 0
              while (b < w(f)) { v = (v << 8) | (data(pos) & 0xff); pos += 1; b += 1 }
              // width 0 => field absent; default type (field 0) is 1
              fields(f) = if (w(f) == 0 && f == 0) 1L else v
              f += 1
            }
            val tpe = if (w.length > 0) fields(0) else 1L
            tpe match {
              case 1 => out += ((first + i) -> InFile(fields(1)))
              case 2 => out += ((first + i) -> InObjStm(fields(1).toInt, fields(2).toInt))
              case _ => out += ((first + i) -> Free) // 0 = deleted; must shadow older in-use
            }
            i += 1
          }
          s += 2
        }
        (out.result(), dict)
      case _ => throw new PdfStructureException(s"object at $off is not an xref stream")
    }
  }

  /** Last-resort recovery: scan the whole file for `n g obj` headers and
    * rebuild the xref (wrong-offset tolerance, SURVEY.md §7 hazard 6).
    * Later definitions win (incremental updates append).
    */
  def reconstruct(buf: Array[Byte]): Map[Int, Entry] = {
    val entries = mutable.Map.empty[Int, Entry]
    var i = 0
    val n = buf.length
    while (i + 3 < n) {
      if (buf(i) == 'o' && buf(i + 1) == 'b' && buf(i + 2) == 'j' &&
        (i + 3 >= n || !isRegular(buf(i + 3)))) {
        // backtrack over ws, gen digits, ws, obj-num digits
        var j = i - 1
        while (j >= 0 && isWsB(buf(j))) j -= 1
        val genEnd = j
        while (j >= 0 && isDigit(buf(j))) j -= 1
        val genStart = j + 1
        if (genEnd >= genStart) {
          var k = j
          while (k >= 0 && isWsB(buf(k))) k -= 1
          val numEnd = k
          while (k >= 0 && isDigit(buf(k))) k -= 1
          val numStart = k + 1
          if (numEnd >= numStart && (k < 0 || !isRegular(buf(k)))) {
            val num = new String(buf, numStart, numEnd - numStart + 1, "ISO-8859-1").toInt
            entries(num) = InFile(numStart.toLong)
          }
        }
      }
      i += 1
    }
    entries.toMap
  }

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWsB(b: Byte): Boolean =
    b == 0x20 || b == 0x0a || b == 0x0d || b == 0x09 || b == 0x0c || b == 0x00
  @inline private def isRegular(b: Byte): Boolean = {
    val c = b & 0xff
    !(isWsB(b) || c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%')
  }
}
