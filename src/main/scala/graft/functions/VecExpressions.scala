package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native float-vector dot product with whole-stage codegen.
  *
  * The only custom Catalyst `Expression` in this library, and the one
  * place the SURVEY §4.4 escape hatch is justified: the composable
  * formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is built from
  * higher-order functions, which are `CodegenFallback` in Spark —
  * every row pays interpreted lambda dispatch plus an intermediate
  * products array. This expression generates a tight primitive loop
  * (no allocation, stays inside WholeStageCodegen), which is the ANN
  * hot path's cost at corpus scale: `tables × planes` hyperplane dots
  * per corpus row.
  *
  * Semantics match the HOF formulation bit-for-bit on EQUAL-LENGTH
  * arrays of non-null elements (every caller: embeddings and plane
  * literals share the dimension): products in FLOAT (as `zip_with`'s
  * float lambda), accumulated in DOUBLE. Divergences, by design:
  * length mismatch → partial dot over the shorter length (zip_with
  * pads the SHORTER array with nulls, so the HOF sum goes NULL), and
  * null ELEMENTS are treated as 0 (HOF: NULL sum).
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] conforms
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.DotName

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += (x.getFloat(i) * y.getFloat(i)).toDouble
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
         |    $s += (double)($x.getFloat($i) * $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** All sign-bit LSH bucket keys of an embedding in one compiled pass:
  * returns array<int> of length `tables`, where bit p of entry t is
  * sign(dot(emb, hyperplane(t·planes+p))).
  *
  * Why a second custom expression (SURVEY §4.4): the composed per-plane
  * formulation (`when(fvdot(emb, array(lit…)) > 0, 1<<p)…` summed)
  * inlines tables × planes × dim float literals into the generated
  * Java — at 4 tables × 16 planes × 64 dims Janino blows the 64 KB
  * method limit (`Code grows beyond 64 KB`, observed r3) and Spark
  * silently drops the WHOLE corpus-scan stage to interpreted
  * execution. Here the plane matrix rides along as ONE referenced
  * float[] object and the generated code is three small loops —
  * codegen-friendly at any (tables, planes, dim).
  *
  * The plane matrix reproduces Similarity.hyperplane exactly
  * (Random(9000+seed).nextGaussian, cast to float), and the arithmetic
  * (float product, double accumulate, > 0 test) is bit-identical to
  * the composed form — asserted in SimilaritySpec.
  */
case class FloatVecLshKeys(child: Expression, dim: Int, planes: Int, tables: Int,
                           probes: Int = 0)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = GraftFunctions.LshName

  /** Multi-probe masks (Hamming ≤ probes, ascending; [0] when probes=0).
    * Output entry t·|masks|+i is baseKey(t) XOR masks(i), so callers
    * recover the table id as pos / |masks|. Query-side multi-probe rode
    * 176 separate element_at(fvlsh…) struct fields before — Janino's
    * 64 KB limit again, on the query stage (observed r3).
    */
  @transient lazy val masks: Array[Int] =
    (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= math.max(probes, 0)).toArray

  /** Flattened [table×plane][dim] hyperplane matrix (deterministic). */
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](tables * planes * dim)
    var s = 0
    while (s < tables * planes) {
      val rng = new scala.util.Random(9000L + s)
      var d = 0
      while (d < dim) { a(s * dim + d) = rng.nextGaussian().toFloat; d += 1 }
      s += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val nm = masks.length
    val keys = new Array[Int](tables * nm)
    var t = 0
    while (t < tables) {
      var key = 0
      var p = 0
      while (p < planes) {
        val off = (t * planes + p) * dim
        var s = 0.0
        var d = 0
        while (d < n) {
          if (!x.isNullAt(d)) s += (x.getFloat(d) * flat(off + d)).toDouble
          d += 1
        }
        if (s > 0) key |= (1 << p)
        p += 1
      }
      var mi = 0
      while (mi < nm) { keys(t * nm + mi) = key ^ masks(mi); mi += 1 }
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "float[]")
    val masksRef = ctx.addReferenceObj("lshMasks", masks, "int[]")
    nullSafeCodeGen(ctx, ev, x => {
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val key = ctx.freshName("key")
      val mi = ctx.freshName("mi")
      val nm = ctx.freshName("nm")
      s"""
         |int $nm = $masksRef.length;
         |int[] $keys = new int[$tables * $nm];
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $key = 0;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $off = ($t * $planes + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$x.isNullAt($d)) {
         |        $s += (double)($x.getFloat($d) * $planesRef[$off + $d]);
         |      }
         |    }
         |    if ($s > 0) $key |= (1 << $p);
         |  }
         |  for (int $mi = 0; $mi < $nm; $mi++) {
         |    $keys[$t * $nm + $mi] = $key ^ $masksRef[$mi];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVecLshKeys =
    copy(child = newChild)
}

/** Nearest-centroid (coarse-quantizer cell) assignment in one compiled
  * pass: returns the index of the centroid minimizing squared L2,
  * computed as |x|² − 2⟨x,c⟩ + |c|² in double — the same formula as
  * the composed `cellDist`/`array_min`/`array_position` form, with
  * first-minimum tie-breaking matching `array_position`'s
  * first-occurrence rule (equivalence asserted in SimilaritySpec).
  *
  * Why a custom expression (SURVEY §4.4, the FloatVecLshKeys lesson
  * again): the composed form inlines nCells × dim float literals —
  * fine at IVF's 16 cells, but SemDeDup at bench/corpus scale needs
  * cells sized to ~hundreds of members (nCells ≈ corpus/250), and
  * hundreds of 32-float literal arrays blow Janino's 64 KB method
  * limit, silently dropping the whole assignment stage to interpreted
  * execution. Here the flattened centroid matrix rides as ONE
  * referenced float[] and the generated code is two small loops.
  */
case class FloatVecNearestCell(child: Expression, flat: Array[Float], dim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0 && flat.length % dim == 0 && flat.length > 0,
    "centroid matrix must be a non-empty multiple of dim")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.CellName

  private def nCells: Int = flat.length / dim

  /** Precomputed |c|² per centroid (double, matching the composed form). */
  @transient private lazy val c2: Array[Double] = {
    val a = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var d = 0
      while (d < dim) { val v = flat(c * dim + d).toDouble; s += v * v; d += 1 }
      a(c) = s
      c += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    FloatVecNearestCellImpl.nearest(x, flat, c2, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellCentroids", flat, "float[]")
    val c2Ref = ctx.addReferenceObj("cellC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.FloatVecNearestCellImpl.nearest($x, $flatRef, $c2Ref, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVecNearestCell =
    copy(child = newChild)
}

object FloatVecNearestCellImpl {
  /** argmin over centroids of |x|² − 2⟨x,c⟩ + |c|²; strict `<` keeps
    * the FIRST minimum (array_position semantics). Null elements are
    * treated as 0, like FloatVecDot.
    */
  def nearest(x: ArrayData, flat: Array[Float], c2: Array[Double], dim: Int): Int = {
    val n = math.min(x.numElements(), dim)
    var self = 0.0
    var d = 0
    while (d < n) {
      // float product then widen — bit-identical to FloatVecDot(x, x)
      if (!x.isNullAt(d)) { val v = x.getFloat(d); self += (v * v).toDouble }
      d += 1
    }
    val cells = flat.length / dim
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < cells) {
      var dot = 0.0
      d = 0
      val off = c * dim
      while (d < n) {
        if (!x.isNullAt(d)) dot += (x.getFloat(d) * flat(off + d)).toDouble
        d += 1
      }
      val dist = self - 2.0 * dot + c2(c)
      if (dist < bd) { bd = dist; best = c }
      c += 1
    }
    best
  }
}

/** Column builders for the custom expressions. Construction goes
  * straight through the Column↔Expression bridge — no session, no
  * registry write per call. `register` additionally exposes the
  * function to SQL text on an EXPLICIT session (at deploy scale the
  * same builder lives in a `SparkSessionExtensions` injected via
  * `spark.sql.extensions`).
  */
object GraftFunctions {
  val DotName = "graft_fvdot"
  val LshName = "graft_fvlsh"
  val NfcName = "graft_nfc"
  val LangIdName = "graft_langid"
  val PctNormName = "graft_pctnorm"
  val IdnName = "graft_idn"
  val RepStatsName = "graft_repstats"
  val MojibakeName = "graft_fix_mojibake"
  val CellName = "graft_fvcell"
  import org.apache.spark.sql.graft.ColumnBridge

  /** Codegen'd Unicode NFC normalization as a Column. */
  def nfc(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))

  /** Codegen'd single-pass language-ID scorer as a Column. */
  def langid(s: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(s)))

  /** Codegen'd URL percent-encoding normalization as a Column. */
  def pctNorm(s: Column): Column =
    ColumnBridge.column(PercentNormalize(ColumnBridge.expression(s)))

  /** Codegen'd IDN→punycode host normalization as a Column. */
  def idnAscii(s: Column): Column =
    ColumnBridge.column(IdnAscii(ColumnBridge.expression(s)))

  /** Codegen'd single-pass repetition signals as a Column
    * (array<double>: [dup_line_frac, dup_line_char_frac,
    * top_bigram_char_frac]).
    */
  def repStats(s: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(s)))

  /** Codegen'd mojibake (double-encoded UTF-8) repair as a Column. */
  def fixMojibake(s: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(s)))

  /** Codegen'd single-pass distinct character k-shingles as a Column. */
  def charShingles(s: Column, k: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(s), k))

  /** Codegen'd single-pass distinct word n-grams as a Column. */
  def wordGrams(s: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(s), n))

  /** Codegen'd single-pass winnowing fingerprints as a Column. */
  def winnow(s: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(s), n, w))

  /** Codegen'd whole-signature MinHash as a Column (array<long>). */
  def minhashSig(s: Column, k: Int, numHashes: Int, wordGrams: Boolean): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(s), k, numHashes, wordGrams))

  /** Codegen'd whole-signature md5-derived (portable) MinHash as a
    * Column (array<long>) — bit-identical to the conv/substr/md5 agg
    * formulation the DuckDB oracles mirror (r7).
    */
  def md5MinhashSig(s: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(Md5MinHashSig(ColumnBridge.expression(s), k, numHashes))

  /** Codegen'd single-pass 64-bit simhash as a 0/1-element array
    * Column (empty = tokenless document; r7).
    */
  def simhashTokens(s: Column): Column =
    ColumnBridge.column(SimHashTokens(ColumnBridge.expression(s)))

  /** Codegen'd equal-position count of two long-array Columns (r7). */
  def longVecEqCount(a: Column, b: Column): Column =
    ColumnBridge.column(LongVecEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd double-vector dot product as a Column (r7). */
  def dvdot(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd float-vector dot product as a Column. */
  def fvdot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd all-tables LSH bucket keys as a Column (array<int>);
    * `probes > 0` appends the multi-probe XOR neighborhood per table
    * (entry t·|masks|+i, table id = pos / |masks|).
    */
  def fvlsh(emb: Column, dim: Int, planes: Int, tables: Int, probes: Int = 0): Column =
    ColumnBridge.column(FloatVecLshKeys(ColumnBridge.expression(emb), dim, planes, tables, probes))

  /** Codegen'd nearest-centroid cell assignment as a Column; the
    * centroid matrix rides as one referenced object (codegen-safe at
    * any nCells × dim).
    */
  def fvcell(emb: Column, centroids: Array[Array[Float]]): Column = {
    require(centroids.nonEmpty, "empty centroid set")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "ragged centroid matrix")
    ColumnBridge.column(FloatVecNearestCell(
      ColumnBridge.expression(emb), centroids.flatten, dim))
  }

  /** Optional: expose the custom expressions to SQL text on `spark`'s
    * registry (r6: all of them — at deploy scale the same builders
    * live in a `SparkSessionExtensions`). Gram arities take a literal
    * int size, like the built-in `substring` lengths.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, mk: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { exprs =>
        require(exprs.length == 1, s"$name expects 1 argument, got ${exprs.length}")
        mk(exprs.head)
      }, "built-in")
    def withLitInt(name: String, mk: (Expression, Int) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { exprs =>
        require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
            mk(exprs.head, v)
          case other => throw new IllegalArgumentException(
            s"$name size must be an integer literal, got $other")
        }
      }, "built-in")
    reg.createOrReplaceTempFunction(DotName, { exprs =>
      require(exprs.length == 2, s"$DotName expects 2 arguments, got ${exprs.length}")
      FloatVecDot(exprs.head, exprs(1))
    }, "built-in")
    one(NfcName, NfcNormalize)
    one(LangIdName, LangId)
    one(PctNormName, PercentNormalize)
    one(IdnName, IdnAscii)
    one(RepStatsName, RepetitionStats)
    one(MojibakeName, FixMojibake)
    withLitInt("graft_char_shingles", CharShingles)
    withLitInt("graft_word_grams", WordGrams)
    reg.createOrReplaceTempFunction("graft_winnow", { exprs =>
      require(exprs.length == 3, s"graft_winnow expects 3 arguments, got ${exprs.length}")
      (exprs(1), exprs(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _),
              org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
          WinnowFingerprints(exprs.head, n, w)
        case _ => throw new IllegalArgumentException(
          "graft_winnow sizes must be integer literals")
      }
    }, "built-in")
  }
}
