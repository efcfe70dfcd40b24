package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.charset.{Charset, StandardCharsets}

/** FixMojibake: inverts exactly the UTF-8-bytes-decoded-as-windows-1252
  * corruption (round-trip property over multilingual text, single and
  * double application), is a fixed point on clean text (ASCII, genuine
  * Latin-1 prose, non-Latin scripts, surrogate pairs), and agrees
  * between interpreted eval and codegen.
  */
class MojibakeSpec extends AnyFunSuite {

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

  private val cp1252 = Charset.forName("windows-1252")
  /** The upstream corruption this op exists to invert — the cp1252
    * flavor. Strict: the five undefined bytes (81 8D 8F 90 9D, hit by
    * e.g. Cyrillic UTF-8 continuations and U+201D/U+2014) become
    * U+FFFD, destroying information.
    */
  private def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), cp1252)
  /** The latin-1 flavor: lossless for every byte (0x80–0x9F arrive as
    * C1 controls) — the common real-pipeline mis-decode for non-Latin
    * scripts.
    */
  private def corruptL1(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  private val multilingual = Seq(
    "café déjà vu — naïve résumé",
    "straße über öl",                   // de umlauts + eszett
    "¿qué pasa? mañana",                // es
    "русский текст", // ru
    "日本語のテキスト", // ja
    "中文文本测试",            // zh
    "한국어 문서",                 // ko
    "عربي",                        // ar
    "mixed ascii with one é only",
    "curly “quotes” and … ellipsis €") // cp1252 specials

  test("fixStr inverts latin-1 corruption, single and double, all scripts") {
    // latin-1 mis-decode is byte-lossless, so EVERY case fully recovers
    for (s <- multilingual) {
      assert(MojibakeImpl.fixStr(corruptL1(s)) === s, s"single: $s")
      assert(MojibakeImpl.fixStr(corruptL1(corruptL1(s))) === s, s"double: $s")
    }
  }

  test("fixStr inverts cp1252 corruption when lossless, declines when FFFD destroyed it") {
    for (s <- multilingual) {
      val once = corrupt(s)
      if (!once.contains('\uFFFD'))
        assert(MojibakeImpl.fixStr(once) === s, s"single: $s")
      else
        // the strict decoder collapsed an undefined byte (81 8D 8F 90
        // 9D — e.g. Cyrillic continuations) to U+FFFD at CORRUPTION
        // time; the byte is gone, repair must keep the evidence rather
        // than guess
        assert(MojibakeImpl.fixStr(once).contains('\uFFFD'), s"lossy single: $s")
      // double corruption: repair recovers back to the LAST state
      // before information was destroyed \u2014 all the way to s when no
      // level hit an undefined byte; to `once` when the FIRST level
      // did (its U+FFFD re-encoded losslessly, so one layer peels);
      // not at all when the SECOND level destroyed bytes of `once`
      val twice = corrupt(once)
      val expected =
        if (twice.contains('\uFFFD')) twice
        else if (once.contains('\uFFFD')) once
        else s
      assert(MojibakeImpl.fixStr(twice) === expected, s"double: $s")
    }
    // a chain with no 81/8D/8F/90/9D bytes anywhere recovers fully
    val s2 = "café déjà año straße"
    assert(MojibakeImpl.fixStr(corrupt(corrupt(s2))) === s2)
  }

  test("clean text is a fixed point (never corrupted by the repair)") {
    val clean = multilingual ++ Seq(
      "", "pure ascii text", "tabs\tand\nnewlines",
      // genuine Latin-1 prose: 0xE9 followed by a non-continuation
      // byte is invalid UTF-8, so repair must decline
      "déjà vu all over again",
      "emoji 😀 outside the BMP",           // surrogates: no inverse
      "decoder damage � already here",      // U+FFFD: never "repaired"
      "Â alone",                                 // lead byte, then space: invalid
      "AÃ")                                      // lead byte at end: truncated
    for (s <- clean)
      assert(MojibakeImpl.fixStr(s) === s, s"must be fixed point: $s")
  }

  test("expression agrees across codegen and interpreted eval, null-safe") {
    import scala.jdk.CollectionConverters._
    val rows = (multilingual.map(corrupt) ++ multilingual ++ Seq(null)).map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = df.select(col("s"), GraftFunctions.fixMojibake(col("s")).as("f"))
      .collect()
    for (r <- got) {
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getString(1) === MojibakeImpl.fixStr(r.getString(0)))
    }
    // interpreted path
    val expr = FixMojibake(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(corrupt(multilingual.head))))
    assert(expr.eval(null).toString === multilingual.head)
  }

  test("SQL registration: graft_fix_mojibake callable from SQL text") {
    GraftFunctions.register(spark)
    val bad = corrupt("naïve")
    val out = spark.sql(s"SELECT graft_fix_mojibake('$bad') AS f")
      .collect()(0).getString(0)
    assert(out === "naïve")
  }
}
