package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass gram extraction as codegen'd expressions (r6).
  *
  * The composable formulations —
  * `array_distinct(transform(sequence(0, len-k), i -> substring(text, 1+i, k)))`
  * and the word-gram analogue with `slice(split(...))` — are
  * ACCIDENTALLY QUADRATIC per document: Catalyst higher-order functions
  * re-evaluate every non-lambda-bound subexpression per element, so
  * each shingle re-runs `substring` (an O(position) UTF-8 scan from the
  * string start) and each word gram re-runs the whole `split`+`filter`.
  * On fixture-sized documents this is invisible; on real extracted web
  * text (tens of KB) it made the x7 minhash stage ~25–45 s for 500
  * documents. These expressions do one linear pass and emit the
  * IDENTICAL distinct gram array (first-occurrence order, codepoint
  * counting) — equivalence with the formulas is asserted in DedupSpec,
  * and the d4/d6/d7/d9 DuckDB oracles gate the results end-to-end.
  */
case class CharShingles(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.charShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.ShingleImpl.charShingles($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

case class WordGrams(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.wordGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.ShingleImpl.wordGrams($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03) as one
  * single-pass expression (r6): distinct minima of xxhash64(word
  * n-gram) over sliding windows of `w` hashes. The composable
  * formulation `array_distinct(transform(sequence(0, size(hs)-w), i ->
  * array_min(slice(hs, i+1, w))))` re-evaluated `hs` — the WHOLE
  * gram+hash pipeline — per window index (the same HOF
  * re-evaluation trap as CharShingles/WordGrams), i.e. O(W²) per
  * document. Hashes are bit-identical to Spark's `xxhash64` (seed 42
  * over the gram's UTF-8 bytes), so the emitted fingerprints equal the
  * formula's exactly; equivalence asserted in DedupSpec.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.winnow(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.ShingleImpl.winnow($x, $n, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Whole MinHash signature as ONE per-row expression (r6).
  *
  * The agg formulation (explode grams → groupBy(doc_id).agg(32 ×
  * min(xxhash64(gram, seed)))) is semantically fine and its partial
  * aggregation keeps the shuffle small — but it pays the explode
  * (~grams rows/doc materialized) plus a 32-column hash-map aggregate,
  * and it hashes every gram's BYTES once per seed. This expression
  * computes the identical signature in a single pass with no explode,
  * no aggregate, and no shuffle: per gram one string hash, then per
  * seed a cheap int-hash finalizer — bit-identical to Spark's
  * `xxhash64(gram, lit(seed))`, which hashes the gram (seed 42) and
  * then folds the literal int into the running hash. Equivalence with
  * the agg formulation is asserted in DedupSpec; measured ~4× on the
  * pipeline's signature stage at 231k docs. At 100 TB this makes
  * signature computation a pure projection — the only shuffle left in
  * LSH dedup is the inherent band-bucket join.
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int, wordGrams: Boolean)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.minhashSig(input.asInstanceOf[UTF8String], k, numHashes, wordGrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.ShingleImpl.minhashSig($x, $k, $numHashes, $wordGrams);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object ShingleImpl {

  /** The `MinHashSig` body: for every distinct gram, one string hash
    * (seed 42) then per-seed `XXH64.hashInt(seed, base)` — exactly
    * Spark's `XxHash64(Seq(gram, Literal(seed)))` child fold.
    */
  def minhashSig(u: UTF8String, k: Int, numHashes: Int, wordGrams0: Boolean): ArrayData = {
    val grams = if (wordGrams0) wordGrams(u, k) else charShingles(u, k)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val base = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        grams.getUTF8String(i), StringType, 42L)
      var h = 0
      while (h < numHashes) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(h, base)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct window-min fingerprints over xxhash64'd word n-grams —
    * the `WinnowFingerprints` body. Window i covers hashes
    * [i, min(i+w, count)), mirroring `array_min(slice(hs, i+1, w))`.
    */
  def winnow(u: UTF8String, n: Int, w: Int): ArrayData = {
    val grams = wordGrams(u, n)
    val count = grams.numElements()
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        grams.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val nWin = math.max(count - w, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nWin * 2)
    i = 0
    while (i < nWin) {
      val end = math.min(i + w, count)
      var m = hs(i)
      var j = i + 1
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Distinct character k-shingles, first-occurrence order, counted in
    * CODEPOINTS (Spark `substring` semantics). Matches
    * `array_distinct(transform(sequence(0, greatest(cpLen-k, 0)), i ->
    * substring(text, 1+i, k)))` exactly, including the degenerate
    * short-string case (one shingle = the whole string).
    */
  def charShingles(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    // codepoint-start offsets (UTF-16 indices); BMP-only text is 1:1
    val cpLen = s.codePointCount(0, s.length)
    val offs = new Array[Int](cpLen + 1)
    var o = 0
    var i = 0
    while (i < cpLen) { offs(i) = o; o += Character.charCount(s.codePointAt(o)); i += 1 }
    offs(cpLen) = s.length
    val count = math.max(cpLen - k, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    i = 0
    while (i < count) {
      val end = math.min(i + k, cpLen)
      seen.add(UTF8String.fromString(s.substring(offs(i), offs(end))))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Distinct word n-grams, first-occurrence order. Words are the
    * non-empty `\s+`-separated tokens (Java regex `\s`, matching
    * Spark's `split`); a document with fewer than n words yields its
    * single shorter gram, exactly like `concat_ws(" ", slice(words,
    * i+1, n))` over `sequence(0, greatest(size-n, 0))`.
    */
  def wordGrams(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    // hand-rolled \s+ split (ASCII whitespace class of Java regex \s):
    // one pass, no regex machinery per row
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) words.add(s.substring(start, i))
    }
    val w = words.size
    val count = math.max(w - n, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    i = 0
    while (i < count) {
      val end = math.min(i + n, w)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words.get(j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Java regex `\s` class: [ \t\n\x0B\f\r]. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'
}
