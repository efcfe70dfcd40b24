package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

/** Column builders for the custom expressions. Construction goes
  * straight through the Column↔Expression bridge — no session, no
  * registry write per call. `register` additionally exposes the
  * function to SQL text on an EXPLICIT session (at deploy scale the
  * same builder lives in a `SparkSessionExtensions` injected via
  * `spark.sql.extensions`).
  */
object GraftFunctions {
  val DotName = "graft_fvdot"
  import org.apache.spark.sql.graft.ColumnBridge

  /** Codegen'd float-vector dot product as a Column. */
  def fvdot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Optional: expose graft_fvdot to SQL text on `spark`'s registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, { exprs =>
        require(exprs.length == 2,
          s"$DotName expects 2 arguments, got ${exprs.length}")
        FloatVecDot(exprs.head, exprs(1))
      }, "built-in")
}
