package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NfcNormalize: JDK-Normalizer semantics through both execution paths
  * (interpreted eval and whole-stage codegen), plus the already-NFC
  * fast path returning the input unchanged.
  */
class TextExpressionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val cases = Seq(
    "plain ascii",
    "", // empty
    "caf\u00e9", // already NFC
    "cafe\u0301", // NFD -> must recombine to caf\u00e9
    "u\u0308ber o\u0308 A\u030a", // \u00fc \u00f6 \u00c5 from combining marks
    "\u1e69", // s with dot below and dot above (single NFC char)
    "s\u0323\u0307", // its NFD form (base + two marks)
    "\uac00", // Hangul syllable GA (NFC)
    "\u1100\u1161", // its Jamo decomposition
    "\u6f22\u5b57 mixed with ascii \u03ba\u03b1\u03af")

  test("nfc() matches java.text.Normalizer through codegen") {
    val df = spark.createDataFrame(cases.zipWithIndex.map(_.swap)).toDF("id", "s")
    val got = df.select(col("id"), GraftFunctions.nfc(col("s")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(i) == want, s"case $i")
    }
  }

  test("nfc() interpreted eval (no-codegen path) agrees") {
    cases.foreach { s =>
      val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      val out = e.eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      assert(out == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  test("nfc() null propagates") {
    val df = spark.sql("SELECT CAST(NULL AS STRING) AS s")
    assert(df.select(GraftFunctions.nfc(col("s"))).collect().head.isNullAt(0))
  }
}
