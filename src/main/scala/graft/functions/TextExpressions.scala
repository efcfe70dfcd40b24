package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression
  * (SURVEY.md §2.7 training-data surface; VERDICT r3 "next" #7).
  *
  * Spark ships no normalization function, and a Scala UDF would force
  * the whole stage out of codegen plus pay SerDe per row. This stays a
  * tight UnaryExpression: an `isNormalized` fast path (UAX #15 quick
  * check — virtually all crawl text is already NFC, making the common
  * case an O(n) scan with no allocation) and `Normalizer.normalize`
  * (ICU-equivalent JDK implementation) on the slow path. Both calls are
  * plain JDK statics, so the generated code inlines into
  * WholeStageCodegen without reference objects.
  *
  * Extraction output is deliberately NOT normalized by default — the
  * golden byte-identity invariant (BASELINE.json north_rule) pins the
  * extractor's bytes; NFC is an opt-in transform for tokenizer-bound
  * pipelines (q16).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = GraftFunctions.NfcName

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $x.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $x;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
