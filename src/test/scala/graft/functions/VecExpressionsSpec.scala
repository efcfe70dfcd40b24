package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** The custom codegen'd dot product must be value-identical to the
  * higher-order-function formulation (float products, double
  * accumulation) and must actually run inside WholeStageCodegen —
  * the whole point of the §4.4 exception.
  */
class VecExpressionsSpec extends AnyFunSuite {

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

  private def vecs(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat),
        Seq.fill(dim)(rng.nextGaussian().toFloat))
    }
    spark.createDataFrame(rows).toDF("id", "a", "b")
  }

  test("FloatVecDot equals the HOF formulation bit-for-bit") {
    val df = vecs(500, 64, 7L)
    val got = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getLong(0)}")
    }
  }

  test("length mismatch uses the shorter vector; empty arrays give 0") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f)),
      (2L, Seq.empty[Float], Seq(1.0f))
    )).toDF("id", "a", "b")
    val got = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == (1.0f * 4.0f + 2.0f * 5.0f).toDouble)
    assert(got(2L) == 0.0)
  }

  test("null array input yields null (BinaryExpression null semantics)") {
    val df = spark.createDataFrame(Seq(
      (1L, Some(Seq(1.0f)), Option.empty[Seq[Float]])
    )).toDF("id", "a", "b")
    val row = df.select(Similarity.dot(col("a"), col("b"))).collect().head
    assert(row.isNullAt(0))
  }

  /** Non-local input so ConvertToLocalRelation can't pre-evaluate the
    * projection — this is the df that actually runs generated code.
    */
  private def rangeVecs(n: Int, dim: Int) =
    spark.range(n).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => (i + col("id") % 7).cast("float")).as("a"),
      transform(sequence(lit(1), lit(dim)),
        i => (i * 2 - col("id") % 5).cast("float")).as("b"))

  test("dot projection stays inside WholeStageCodegen") {
    // parquet round-trip: a real scan, so neither ConvertToLocalRelation
    // nor the (CodegenFallback) transform() input builders mask the result
    val dirPath = java.nio.file.Files.createTempDirectory("fvdot")
    try {
      val dir = dirPath.toString
      rangeVecs(100, 8).write.mode("overwrite").parquet(dir)
      val plan = spark.read.parquet(dir)
        .select(Similarity.dot(col("a"), col("b")).as("d"))
        .queryExecution.executedPlan
      val wsc = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(wsc.exists(_.contains(GraftFunctions.DotName)),
        s"fvdot not inside a WholeStageCodegen span:\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("SQL registration: graft_fvdot callable from SQL text, arity-checked") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT graft_fvdot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()
    assert(rows.head.getDouble(0) == 11.0)
    val e = intercept[Exception] { spark.sql("SELECT graft_fvdot(array(CAST(1.0 AS FLOAT)))").collect() }
    assert(e.getMessage.contains("expects 2 arguments"))
  }

  test("SQL registration: all r6 expressions callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('ä') AS nfc, graft_langid('der und die das ist') AS lid, " +
        "graft_pctnorm('%2f%7e') AS pn, graft_idn('bücher.example') AS idn, " +
        "graft_char_shingles('abcd', 2) AS cs, graft_word_grams('a b c', 2) AS wg").collect().head
    assert(r.getString(0) == "ä")
    assert(r.getString(1) == "de")
    assert(r.getString(2) == "%2F~")
    assert(r.getString(3) == "xn--bcher-kva.example")
    assert(r.getSeq[String](4) == Seq("ab", "bc", "cd"))
    assert(r.getSeq[String](5) == Seq("a b", "b c"))
    val wn = spark.sql("SELECT graft_winnow('a b c d e f', 2, 3) AS f").collect().head
    assert(wn.getSeq[Long](0).nonEmpty)
    // gram size must be a literal, like substring lengths
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_char_shingles('abc', 1 + 1)").collect()
    }
    assert(e2.getMessage.contains("integer literal"))
  }

  test("codegen path agrees with the HOF formulation on a non-local plan") {
    val df = rangeVecs(200, 16)
    val bad = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bad == 0L)
  }
}
