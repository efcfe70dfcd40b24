package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.functions.PercentNormalizeImpl
import org.apache.spark.unsafe.types.UTF8String

/** Value tests for URL canonicalization (q18) and the codegen'd
  * percent-normalization expression it uses (RFC 3986 §2.3/§6.2.2).
  */
class UrlsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def pn(s: String): String =
    PercentNormalizeImpl.normalize(UTF8String.fromString(s)).toString

  test("PercentNormalizeImpl: unreserved decodes, reserved case-folds, junk passes") {
    assert(pn("abc") == "abc")                    // no escapes: identity
    assert(pn("%7e") == "~")                      // unreserved decodes
    assert(pn("%7E") == "~")
    assert(pn("%41%62%39%2d%2e%5f") == "Ab9-._")  // ALPHA/DIGIT/-._
    assert(pn("%2f") == "%2F")                    // reserved: uppercase only
    assert(pn("%3d%26%3f") == "%3D%26%3F")        // = & ? stay encoded
    assert(pn("a%2") == "a%2")                    // truncated escape verbatim
    assert(pn("a%zz") == "a%zz")                  // non-hex verbatim
    assert(pn("%%41") == "%A")                    // literal % then escape
    assert(pn("100% sure") == "100% sure")        // bare % in text
  }

  test("canonicalize: full rule set on planted URLs") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val cases = Seq(
      // case / default port / tracking / sort / fragment (r5 rules)
      ("HTTPS://Example.COM:443/Path/item?b=2&utm_source=x&a=1#f",
        "https://example.com/Path/item?a=1&b=2"),
      ("http://WWW.Test.ORG:80/x?z=9&fbclid=abc&", "http://www.test.org/x?z=9"),
      // non-default port survives
      ("https://h.io:8080/p", "https://h.io:8080/p"),
      // r6: percent normalization in path + query
      ("https://h.io/It%65m%2fx?p=%2f%7e&a=%41", "https://h.io/Item%2Fx?a=A&p=%2F~"),
      // r6: slash-run collapse + trailing-slash drop
      ("https://h.io//a///b/", "https://h.io/a/b"),
      // empty path -> "/", root slash is kept
      ("https://h.io?a=1", "https://h.io/?a=1"),
      ("https://h.io/", "https://h.io/"),
      // r6: scheme-less input passes through unchanged — distinct
      // malformed URLs must NOT collapse to one dedup key
      ("relative/path-7", "relative/path-7"),
      ("not a url at all", "not a url at all"),
      // r6: IDN hosts fold to punycode ACE (xn--bcher-kva is the RFC
      // 3492 spelling of bücher); ASCII hosts untouched
      ("https://bücher.example/a", "https://xn--bcher-kva.example/a"),
      ("https://BÜCHER.example:443/a", "https://xn--bcher-kva.example/a"),
      // non-default port survives label conversion (the :8080 rides in
      // the final ASCII label and IDN passes it through)
      ("http://日本語.jp:8080/x",
        "http://" + java.net.IDN.toASCII("日本語.jp").toLowerCase + ":8080/x"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      cases.map(c => org.apache.spark.sql.Row(c._1)).asJava, schema)
    val got = df.select(col("url"), Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"'$in': got '${got(in)}' want '$want'")
    }
    // distinct scheme-less inputs stay distinct (ADVICE r5 low)
    assert(got("relative/path-7") != got("not a url at all"))
  }

  test("capPerDomain: under-cap hosts untouched, over-cap down-sampled deterministically (q23)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // big: 400 docs, small: 10 docs
    val df = ((0 until 400).map(i => (i.toLong, s"https://big.example/p$i", s"t$i")) ++
      (0 until 10).map(i => (1000L + i, s"https://small.example/p$i", s"s$i")))
      .toDF("doc_id", "url", "text")
    val capped = Urls.capPerDomain(df, maxDocs = 50)
    val byHost = capped.groupBy(Urls.hostOf(col("url")).as("host")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHost("small.example") == 10)        // under cap: every doc kept
    val bigKept = byHost("big.example")
    // binomial around 50 (p = 50/400 per doc): far below 400, never 0
    assert(bigKept > 20 && bigKept < 100, s"big.example kept $bigKept of 400")
    // deterministic: the SAME documents survive on re-run
    val run1 = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val run2 = Urls.capPerDomain(df, maxDocs = 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(run1 == run2)
    // the keep rule is a pure per-row function of (url, host count)
    val rule = run1.toSet
    assert((1000L until 1010L).forall(rule.contains))
    // schema passthrough: input columns survive, helper columns dropped
    assert(capped.columns.toSeq == Seq("doc_id", "url", "text"))
    // domainStats agrees with raw counts
    val stats = Urls.domainStats(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("big.example" -> 400L, "small.example" -> 10L))
  }
}
