package graft.pdf

import PdfObj._

/** Object-stream (/Type/ObjStm) loader (SURVEY.md §2.2 X5; ISO 32000-1
  * §7.5.7). Header: /N pairs of `objnum offset`, objects packed after
  * /First. Decoded streams are cached per-document by the caller.
  */
object ObjStm {

  final case class Loaded(objNums: Array[Int], offsets: Array[Int], data: Array[Byte], first: Int) {
    def objAt(idx: Int): PdfObj = {
      if (idx < 0 || idx >= objNums.length) return PNull
      ObjParser.parseAt(data, first + offsets(idx))
    }
    def objByNum(num: Int): PdfObj = {
      var i = 0
      while (i < objNums.length) {
        if (objNums(i) == num) return objAt(i)
        i += 1
      }
      PNull
    }
  }

  def load(stream: PStream, resolve: PdfObj => PdfObj,
           inflater: java.util.zip.Inflater): Loaded = {
    val dict = stream.dict
    val n = dict.get("N").map(resolve).flatMap(int).getOrElse(0L).toInt
    val first = dict.get("First").map(resolve).flatMap(int).getOrElse(0L).toInt
    val data = Filters.decode(dict, stream.raw, resolve, inflater)
    val nums = new Array[Int](n)
    val offs = new Array[Int](n)
    val lx = new Lexer(data, 0, math.min(first, data.length))
    var i = 0
    var ok = true
    while (i < n && ok) {
      (lx.next(), lx.next()) match {
        case (Tok.TInt(num), Tok.TInt(off)) =>
          nums(i) = num.toInt; offs(i) = off.toInt
        case _ => ok = false
      }
      i += 1
    }
    Loaded(nums, offs, data, first)
  }
}
