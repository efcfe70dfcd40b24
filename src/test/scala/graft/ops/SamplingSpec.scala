package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stratified sampling (q24): exact determinism (same kept set across
  * runs AND across repartitionings — the property rand() sampling
  * lacks), boundary rates 0/1, stats consistency, and the xxRank
  * production twin's agreement on semantics.
  */
class SamplingSpec extends AnyFunSuite {

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

  import scala.jdk.CollectionConverters._
  private def corpus(n: Int) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    val langs = Array("en", "de", "zh")
    spark.createDataFrame(
      (0 until n).map(i =>
        org.apache.spark.sql.Row(i.toLong, langs(i % 3))).asJava, schema)
  }

  private val rates = Map("en" -> 0.25, "de" -> 0.0)

  test("kept set is deterministic and repartition-invariant") {
    val df = corpus(3000)
    val a = Sampling.stratifiedSample(df, rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(df.repartition(13), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = Sampling.stratifiedSample(df, rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a === c)
    assert(a.nonEmpty)
  }

  test("rate 0 drops the stratum, default 1.0 passes through, counts consistent") {
    val df = corpus(3000) // 1000 per lang
    val stats = Sampling.sampleStats(df, rates).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("de") === ((1000L, 0L)))          // rate 0.0
    assert(stats("zh") === ((1000L, 1000L)))       // default 1.0
    val (enDocs, enKept) = stats("en")
    assert(enDocs === 1000L)
    // binomial(1000, 0.25): ±5 sigma ≈ ±68
    assert(enKept > 180L && enKept < 320L, s"en kept $enKept")
    // stats agree with the actual sample
    val kept = Sampling.stratifiedSample(df, rates)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("en", 0L) === enKept)
    assert(!kept.contains("de"))
  }

  test("xxRank production twin: deterministic, same semantics, in [0,1)") {
    val df = corpus(3000)
    val a = Sampling.stratifiedSample(df, rates, rank = Urls.xxRank)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(df.repartition(7), rates, rank = Urls.xxRank)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    val enKept = a.count(_ % 3 == 0) // en stratum
    assert(enKept > 180 && enKept < 320, s"xxRank en kept $enKept")
    assert(a.forall(_ % 3 != 1)) // de dropped entirely
    // rank range sanity on the raw column
    val mm = df.select(min(Urls.xxRank(col("doc_id").cast("string"))),
      max(Urls.xxRank(col("doc_id").cast("string")))).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) < 1.0)
  }
}
