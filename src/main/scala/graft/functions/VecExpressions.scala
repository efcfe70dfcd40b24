package graft.functions

import org.apache.spark.sql.SparkSession
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
  * Semantics match the HOF formulation on non-null elements: products
  * in FLOAT (as `zip_with`'s float lambda), accumulated in DOUBLE, over
  * the shorter of the two lengths. Embedding arrays are non-null by
  * construction; null ELEMENTS are treated as 0 (the HOF version would
  * null the whole sum — no caller feeds null elements).
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

/** Session registration for the custom expressions (temp functions,
  * resolved by `functions.call_function`). Idempotent; called lazily
  * from the Column builders so every surface (Verify/Bench/tests/
  * spark-submit) gets it without extra wiring. At deploy scale the
  * same builder would live in a `SparkSessionExtensions` injected via
  * `spark.sql.extensions`.
  */
object GraftFunctions {
  val DotName = "graft_fvdot"

  def ensureRegistered(): Unit = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
  }
}
