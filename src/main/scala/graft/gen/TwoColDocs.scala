package graft.gen

import scala.util.Random

/** Deterministic two-column test documents for the opt-in
  * column-aware reading order (pdf/Columns.scala, r5). Emission order
  * is the real-world pathological one — row-interleaved (L1 R1 L2 R2
  * …) — so DEFAULT (Appendix A show-order) assembly reads the rows
  * across both columns, while the column-aware mode must recover
  * left-column-then-right. Both expectations are built in lockstep.
  */
object TwoColDocs {

  final case class TwoCol(bytes: Array[Byte], showOrderText: String,
                          columnText: String)

  private val LineDy = 14.4
  private val ParaDy = 28.8
  private val LeftX = 72.0
  private val RightX = 340.0

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Build one two-column page with `rows` rows (>= 4) and a paragraph
    * gap after row `rows/2`. Words are drawn deterministically.
    */
  def doc(seed: Long, rows: Int = 6): TwoCol = {
    val rng = new Random(seed)
    val pool = TextGen.baseWords
    def line(): String = (0 until 3).map(_ => pool(rng.nextInt(pool.size))).mkString(" ")
    val left = Vector.fill(rows)(line())
    val right = Vector.fill(rows)(line())
    val gapAfter = rows / 2 - 1 // paragraph gap between this row and the next

    val ops = new StringBuilder("BT\n/F1 12 Tf\n")
    val show = new java.lang.StringBuilder // lockstep: default expectation
    var y = 720.0
    (0 until rows).foreach { r =>
      if (r > 0) {
        y -= (if (r == gapAfter + 1) ParaDy else LineDy)
        show.append(if (r == gapAfter + 1) "\n\n" else "\n")
      }
      ops.append(f"1 0 0 1 $LeftX%.1f $y%.1f Tm\n(${left(r)}) Tj\n")
      ops.append(f"1 0 0 1 $RightX%.1f $y%.1f Tm\n(${right(r)}) Tj\n")
      show.append(left(r)).append(' ').append(right(r))
    }
    ops.append("ET\n")

    def column(ls: Vector[String]): String = {
      val sb = new java.lang.StringBuilder
      (0 until rows).foreach { r =>
        if (r > 0) sb.append(if (r == gapAfter + 1) "\n\n" else "\n")
        sb.append(ls(r))
      }
      sb.toString
    }
    val colText = column(left) + "\n\n" + column(right)

    val content = ops.toString
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val sb = new StringBuilder("%PDF-1.7\n")
    val off = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (n, b) => off(n) = sb.length; sb.append(s"$n 0 obj\n$b\nendobj\n") }
    val x = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(n => sb.append(f"${off(n)}%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
    TwoCol(latin1(sb.toString), show.toString, colText)
  }
}
