package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass dedup kernels as codegen'd expressions (r7 — the
  * optimization round's §4 "expressions and codegen" sweep).
  *
  * Each replaces a composed formulation that was correct but paid a
  * structural tax on the bench's hottest paths:
  *
  *  - `Md5MinHashSig` folds the portable (md5-derived) minhash pipeline
  *    — explode(shingles) → groupBy(doc_id).agg(16 ×
  *    min(conv(substr(md5(concat(sh, ":h")), 1, 15), 16, 10)))) — into
  *    ONE per-row projection: no explode (~300 rows/doc at sf0.1), no
  *    16-column hash aggregate, no shuffle, and no per-gram hex-string
  *    materialization + base-16 reparse. Values are BIT-IDENTICAL: the
  *    first 15 hex chars of md5 are the digest's first 60 bits, i.e.
  *    (first 8 bytes big-endian) >>> 4 — asserted against the agg
  *    formulation in DedupSpec. The DuckDB d6/d7/d9 oracles are
  *    unchanged and keep gating the results end-to-end.
  *
  *  - `SimHashTokens` folds the simhash pipeline — explode(split) →
  *    filter → xxhash64 → groupBy(doc_id).agg(64 bit-sums) — into one
  *    per-row pass. Token hashes are Spark's `xxhash64(tok)` (seed 42)
  *    exactly; a document with no tokens yields an EMPTY array so the
  *    caller's explode drops it, matching the aggregation's "no rows in
  *    → no group out". Equivalence asserted in DedupSpec.
  *
  *  - `LongVecEqCount` replaces the interpreted
  *    `aggregate(zip_with(a, b, (x,y) => if(x==y) 1 else 0), 0, +)`
  *    signature-agreement count of the LSH pair scorers. Higher-order
  *    functions are CodegenFallback: their presence dropped the whole
  *    post-join projection out of WholeStageCodegen, so every candidate
  *    pair paid interpreted lambda dispatch plus an intermediate array.
  *
  *  - `DoubleVecDot` is `FloatVecDot`'s array<double> twin, for the
  *    portable semantic path whose oracle computes in double. Same
  *    accumulation order as `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  *    (strict left-to-right), hence bit-identical on equal-length,
  *    non-null arrays — asserted in SimilaritySpec. Divergences match
  *    FloatVecDot by design: length mismatch → partial dot over the
  *    shorter side; null elements treated as 0 (the HOF goes NULL).
  */
case class Md5MinHashSig(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    DedupExprImpl.md5MinhashSig(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.DedupExprImpl.md5MinhashSig($x, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

/** Whole 64-bit simhash as a 0/1-element array (empty = no tokens, so
  * `explode` reproduces the aggregation's absent-group semantics).
  */
case class SimHashTokens(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    DedupExprImpl.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      x => s"${ev.value} = graft.functions.DedupExprImpl.simhash($x);")

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens =
    copy(child = newChild)
}

/** Count of positions where two long arrays hold equal values (over the
  * shorter length; null elements never match — callers pass non-null
  * fixed-width signature arrays where neither case arises).
  */
case class LongVecEqCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lveq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i) && $x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecEqCount =
    copy(left = newLeft, right = newRight)
}

/** array<double> dot product — FloatVecDot's double twin (see the
  * file-header contract; bit-identical to the sequential HOF fold).
  */
case class DoubleVecDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dvdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

object DedupExprImpl {

  /** One MessageDigest per thread: getInstance per gram would dominate
    * the kernel (provider lookup + allocation).
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** ":h" suffix bytes, precomputed for the seed range in use. */
  private val suffix: Array[Array[Byte]] =
    Array.tabulate(64)(h => s":$h".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The `Md5MinHashSig` body: per distinct char k-shingle, per seed h,
    * v = first-60-bits(md5(shingle ++ ":h")) — exactly
    * `conv(substr(md5(concat(sh, ':h')), 1, 15), 16, 10)` (15 hex chars
    * = the digest's first 8 bytes big-endian, unsigned-shifted by 4) —
    * and the signature is the per-seed minimum.
    */
  def md5MinhashSig(u: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val grams = ShingleImpl.charShingles(u, k)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = md5Local.get()
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val gb = grams.getUTF8String(i).getBytes
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(gb)
        md.update(if (h < suffix.length) suffix(h)
                  else s":$h".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val d = md.digest()
        val v = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
                 ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
                 ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
                 ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** The `SimHashTokens` body: tokens are the non-empty `\s+` splits
    * (ASCII whitespace bytes never occur inside UTF-8 multibyte
    * sequences, so the byte-level scan equals the char-level split);
    * per token one `xxhash64(tok)` (seed 42, Spark's own kernel), then
    * the 64-bit weighted majority. No tokens → empty array.
    */
  def simhash(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    val cnt = new Array[Int](64)
    var any = false
    var i = 0
    while (i < len) {
      while (i < len && isWsByte(bytes(i))) i += 1
      val start = i
      while (i < len && !isWsByte(bytes(i))) i += 1
      if (i > start) {
        any = true
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          tok, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
    }
    if (!any) new GenericArrayData(Array.empty[Long])
    else {
      var sim = 0L
      var b = 0
      while (b < 64) { if (cnt(b) > 0) sim |= (1L << b); b += 1 }
      new GenericArrayData(Array(sim))
    }
  }

  /** Java regex `\s` class: [ \t\n\x0B\f\r] — all ASCII. */
  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
}
