package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftFunctions, RepetitionImpl}

/** Value tests for the repetition signals (q21) and PII scrub (q22). */
class RepetitionPiiSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def rep(s: String): Seq[Double] =
    RepetitionImpl.stats(UTF8String.fromString(s)).toObjectArray(DoubleType)
      .map(_.asInstanceOf[Double]).toSeq

  test("RepetitionImpl: handcrafted fractions") {
    // lines: "a b"x2, "x"x2 -> all 4 duplicated; chars 3*2 + 1*2 = 8, all dup
    // words: a b x x a b; bigrams: "a b"x2 (cov 4), "b x", "x x", "x a" (cov 2 each)
    // word chars = 6 -> top = 4/6
    assert(rep("a b\nx\nx\na b") == Seq(1.0, 1.0, 4.0 / 6.0))
    // no duplicate lines, no repeated bigram: top = max single coverage
    // ("two three" covers 8 of 11 word chars)
    assert(rep("one two three") == Seq(0.0, 0.0, 8.0 / 11.0))
    // empty / whitespace-only: zero denominators -> 0.0 (word side)
    assert(rep("") == Seq(0.0, 0.0, 0.0))
    assert(rep("\n\n\n") == Seq(0.0, 0.0, 0.0))
    // blank-but-nonempty lines count as lines (they carry characters)
    assert(rep(" \n ") == Seq(1.0, 1.0, 0.0))
    // single word: no bigram -> 0.0 top fraction
    assert(rep("hello") == Seq(0.0, 0.0, 0.0))
    // the fully-boilerplate page: one line repeated -> everything 1.0
    val line = "click here to subscribe"
    val doc = Seq.fill(5)(line).mkString("\n")
    val r = rep(doc)
    assert(r(0) == 1.0 && r(1) == 1.0)
    // newlines are word separators too, so the wrap-around bigram
    // "subscribe click" (x4, 14 chars) out-covers "to subscribe" (x5,
    // 11 chars): 56 of the 100 word chars
    assert(r(2) == 56.0 / 100.0)
  }

  test("RepetitionImpl matches an independent reference implementation") {
    def ref(s: String): Seq[Double] = {
      def cp(x: String): Long = x.codePointCount(0, x.length).toLong
      val lines = s.split("\n", -1).filter(_.nonEmpty)
      val lg = lines.groupBy(identity).map { case (l, g) => (l, g.length.toLong) }
      val dupLines = lg.collect { case (_, c) if c > 1 => c }.sum
      val lineChars = lg.map { case (l, c) => c * cp(l) }.sum
      val dupChars = lg.collect { case (l, c) if c > 1 => c * cp(l) }.sum
      val words = s.split("\\s+").filter(_.nonEmpty).toSeq
      val wordChars = words.map(cp).sum
      val covs = words.sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq.groupBy(identity)
        .map { case ((a, b), g) => g.length.toLong * (cp(a) + cp(b)) }
      val top = if (covs.isEmpty) 0L else covs.max
      def frac(n: Long, d: Long) = if (d == 0) 0.0 else n.toDouble / d
      Seq(frac(dupLines, lines.length.toLong), frac(dupChars, lineChars),
        frac(top, wordChars))
    }
    // the handcrafted boilerplate case above, checked both ways
    val doc5 = Seq.fill(5)("click here to subscribe").mkString("\n")
    assert(rep(doc5) == ref(doc5))
    val rng = new scala.util.Random(20260817L)
    val vocab = Array("alpha", "beta", "gamma", "x", "longerword", "7", "§ümlaut")
    (0 until 300).foreach { i =>
      val sb = new StringBuilder
      (0 until rng.nextInt(60)).foreach { _ =>
        sb.append(vocab(rng.nextInt(vocab.length)))
        sb.append(rng.nextInt(5) match {
          case 0 => "\n"
          case 1 => "\t"
          case 2 => "  "
          case _ => " "
        })
      }
      val s = sb.toString
      assert(rep(s) == ref(s), s"mismatch on case $i: ${s.take(80)}")
    }
  }

  test("RepetitionStats through a DataFrame projection (codegen path)") {
    import spark.implicits._
    val df = Seq((1L, "a b\nx\nx\na b"), (2L, "one two three"), (3L, ""))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id", GraftFunctions.repStats($"text").as("r"))
      .select($"doc_id", $"r".getItem(0).as("dlf"), $"r".getItem(2).as("tbf"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 0.0, 0.0))
    assert(out.map(_.getDouble(2)).toSeq == Seq(4.0 / 6.0, 8.0 / 11.0, 0.0))
    // and from SQL text via the registered function
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("rep_docs")
    val sqlOut = spark.sql(
      "SELECT graft_repstats(text)[0] AS dlf FROM rep_docs WHERE doc_id = 1")
      .collect()
    assert(sqlOut.head.getDouble(0) == 1.0)
  }

  test("Pii: counts, scrub output, and ordering on planted classes") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to bob.smith+x@sub.example.org or call +15551234567 now"),
      (2L, "server at 10.20.30.40 and 192.168.0.1; version 1.2.3 is not an ip"),
      (3L, "email user@10.0.0.1.example.net keeps its host intact"),
      (4L, "clean text with no pii at all"),
      (5L, "+123456 is too short to be a phone; +1234567 is long enough"))
      .toDF("doc_id", "text")
    val out = Pii.stats(df).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // counts are independent raw-text detectors: doc 3's dotted quad
    // inside the mail host registers as BOTH an email and an IP — the
    // scrub (ordered) is what resolves the overlap
    assert(out == Seq((1L, 1L, 0L, 1L), (2L, 0L, 2L, 0L), (3L, 1L, 1L, 0L),
      (4L, 0L, 0L, 0L), (5L, 0L, 0L, 1L)))
    val scrubbed = df.select($"doc_id", Pii.scrub($"text").as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    assert(scrubbed(0) == "write to <EMAIL> or call <PHONE> now")
    assert(scrubbed(1) == "server at <IP> and <IP>; version 1.2.3 is not an ip")
    // email-before-IP order: the dotted quad inside the mail host is
    // scrubbed AS PART OF the email, never torn out separately
    assert(scrubbed(2) == "email <EMAIL> keeps its host intact")
    assert(scrubbed(3) == "clean text with no pii at all")
    assert(scrubbed(4) == "+123456 is too short to be a phone; <PHONE> is long enough")
  }

  test("Pii.scrub is idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "a@b.example 1.2.3.4 +9998887776 a@b.example"),
      (2L, "<EMAIL> already scrubbed <IP> <PHONE>"))
      .toDF("doc_id", "text")
    val once = df.select($"doc_id", Pii.scrub($"text").as("t"))
    val twice = once.select($"doc_id", Pii.scrub($"t").as("t"))
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
  }
}
