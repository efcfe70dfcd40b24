package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes the synthesized corpus + golden tables as parquet
  * (FIXTURES.md §1–2). Generation is distributed: each task generates
  * its own docId range (per-doc seeding makes this order-independent).
  */
object CorpusTables {

  /** Input-table row (BASELINE.json:15 shape). */
  final case class CorpusRow(url: String, warc_ts: java.sql.Timestamp,
                             html: Array[Byte], text: String, lang: String)

  final case class GoldenRow(url: String, kind: String, expected_text: String,
                             expected_spans: Seq[graft.job.Span])

  /** Corpus size tiers (FIXTURES.md §3). */
  val SfSmall = 500
  val SfMid = 5000
  /** Bench-tier size: big enough that the timed extraction runs ~2.5 s
    * at local[32] — at 50k (~1 s) the ±0.2 s host jitter plus the
    * ~0.4 s fixed job cost was ±20 % of the headline docs/sec
    * (observed 46.8k–58.1k across same-day runs).
    */
  val SfBench = 200000

  def corpusPath(dir: String, n: Int, paraScale: Int = 1): String =
    if (paraScale == 1) s"$dir/corpus_$n" else s"$dir/corpus_${n}_s$paraScale"
  def goldenPath(dir: String, n: Int, paraScale: Int = 1): String =
    if (paraScale == 1) s"$dir/golden_$n" else s"$dir/golden_${n}_s$paraScale"

  /** Generate + write corpus and golden tables if absent; returns paths. */
  def ensure(spark: SparkSession, dir: String, n: Int,
             paraScale: Int = 1): (String, String) = {
    val cp = corpusPath(dir, n, paraScale)
    val gp = goldenPath(dir, n, paraScale)
    if (!graft.io.Tables.exists(spark, cp) || !graft.io.Tables.exists(spark, gp)) {
      import spark.implicits._
      val parts = math.max(spark.sparkContext.defaultParallelism, 4)
      val docs = spark.range(0, n, 1, parts).mapPartitions { it =>
        it.map(id => CorpusGen.doc(id, paraScale))
      }
      // cache NOT used: generate twice (corpus + golden) — cheaper than
      // caching binary payloads at the bench tier, and fully deterministic
      val corpus = docs.map(g =>
        CorpusRow(g.url, new java.sql.Timestamp(g.warcTsMicros / 1000L), g.payload,
          g.wetText, g.lang))
      corpus.toDF().write.mode("overwrite").parquet(cp)
      val golden = spark.range(0, n, 1, parts).mapPartitions { it =>
        it.map { id =>
          val g = CorpusGen.doc(id, paraScale)
          GoldenRow(g.url, g.kind, g.expectedText, g.expectedSpans)
        }
      }
      golden.toDF().write.mode("overwrite").parquet(gp)
    }
    (cp, gp)
  }
}
