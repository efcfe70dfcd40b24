package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style intra-document repetition signals as ONE single-pass
  * codegen'd expression (r6; Rae et al. 2021 "Scaling Language Models",
  * table A1 repetition filters — the standard crawl-quality signals a
  * training-data pipeline gates on between extraction and dedup).
  *
  * Emits `array<double>` of three fractions in [0,1]:
  *
  *   [0] dup_line_frac       — lines whose text occurs more than once,
  *                             as a fraction of all non-empty lines;
  *   [1] dup_line_char_frac  — characters inside those duplicated
  *                             lines, as a fraction of all non-empty
  *                             line characters;
  *   [2] top_bigram_char_frac — characters covered by the most
  *                             covering word 2-gram (occurrences ×
  *                             gram length, max over grams), as a
  *                             fraction of all word characters. The
  *                             max is over the COVERAGE product, not
  *                             the bare count, so the result is
  *                             deterministic without a tie-break rule
  *                             on equally-frequent grams.
  *
  * Definitions pinned for the independent q21 DuckDB oracle (which
  * recomputes them by SQL aggregation over unnested lines/grams — a
  * different algorithm, not a formula mirror): lines split on '\n'
  * and drop empties; words are the non-empty Java-`\s+` tokens (same
  * class as `ShingleImpl.wordGrams`; RE2's `\s` differs only on
  * `\x0B`, absent from crawl text); all lengths count CODEPOINTS;
  * zero denominators yield 0.0.
  *
  * Why an expression and not composed HOFs/aggregations: the HOF
  * formulation re-evaluates the split per element (the r6 quadratic
  * trap, ShingleExpressions.scala), and the explode+groupBy
  * formulation shuffles ~lines×docs rows for a per-document answer.
  * This is a per-row projection — no explode, no shuffle, O(doc)
  * time and O(distinct lines + distinct bigrams) transient space.
  */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = GraftFunctions.RepStatsName

  override protected def nullSafeEval(input: Any): Any =
    RepetitionImpl.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.RepetitionImpl.stats($x);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionImpl {

  /** Java regex `\s` class: [ \t\n\x0B\f\r]. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'

  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** The `RepetitionStats` body — static so generated code calls it
    * directly. One scan builds the line counts and the word sequence;
    * a second pass over the (shorter) word sequence counts bigrams.
    */
  def stats(u: UTF8String): ArrayData = {
    val s = u.toString
    val len = s.length

    val lineCounts = new java.util.HashMap[String, Int]()
    val words = new java.util.ArrayList[String]()
    var i = 0
    var lineStart = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == '\n') {
        if (i > lineStart) {
          val line = s.substring(lineStart, i)
          lineCounts.merge(line, 1, Integer.sum _)
        }
        lineStart = i + 1
      }
      i += 1
    }
    i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) words.add(s.substring(start, i))
    }

    var nLines = 0L
    var nDupLines = 0L
    var lineChars = 0L
    var dupLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val c = e.getValue.toLong
      val chars = c * cpLen(e.getKey)
      nLines += c
      lineChars += chars
      if (c > 1) { nDupLines += c; dupLineChars += chars }
    }

    val nWords = words.size
    var wordChars = 0L
    var w = 0
    while (w < nWords) { wordChars += cpLen(words.get(w)); w += 1 }
    // bigram coverage: count × (len(w1)+len(w2)), max over distinct grams
    val bigramCov = new java.util.HashMap[String, Long]()
    var topCov = 0L
    w = 0
    while (w < nWords - 1) {
      val gram = words.get(w) + " " + words.get(w + 1)
      val glen = cpLen(gram) - 1 // minus the joining space
      val cov = bigramCov.merge(gram, glen, java.lang.Long.sum _)
      if (cov > topCov) topCov = cov
      w += 1
    }

    val dupLineFrac = if (nLines == 0) 0.0 else nDupLines.toDouble / nLines
    val dupCharFrac = if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars
    val topBigramFrac = if (wordChars == 0) 0.0 else topCov.toDouble / wordChars
    new GenericArrayData(Array[Any](dupLineFrac, dupCharFrac, topBigramFrac))
  }
}
