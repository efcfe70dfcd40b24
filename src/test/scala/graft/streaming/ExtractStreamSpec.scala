package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream // moved in Spark 4.x
import org.apache.spark.sql.functions._
import graft.gen.CorpusGen
import graft.job.Partitioning

/** Streaming extension e2e (SURVEY.md §7.5): same extraction semantics
  * microbatch-wise, keyed-state dedup across batches, file-sink run.
  */
class ExtractStreamSpec extends AnyFunSuite {

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

  private def row(id: Long) = {
    val g = CorpusGen.doc(id)
    (g.url, new java.sql.Timestamp(g.warcTsMicros / 1000L), g.payload, g.wetText, g.lang)
  }

  test("microbatch extraction matches golden; state dedup drops recrawls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Array[Byte], String, String)]
    val pages = mem.toDF().toDF("url", "warc_ts", "html", "text", "lang")
    val out = ExtractStream.dedupByUrl(
      ExtractStream.transform(spark, pages, Partitioning.defaultSpec(4)))
    val q = out.writeStream.format("memory").queryName("stream_out")
      .outputMode("append").start()
    try {
      mem.addData((0L until 6L).map(row): _*)
      q.processAllAvailable()
      mem.addData(Seq(6L, 7L).map(row) :+ row(0L): _*) // recrawl of url 0
      q.processAllAvailable()
      val got = spark.table("stream_out")
        .select("url", "text").as[(String, String)].collect().toMap
      assert(got.size == 8, s"dedup should keep 8 distinct urls, got ${got.size}")
      (0L until 8L).foreach { id =>
        val g = CorpusGen.doc(id)
        assert(got(g.url) == g.expectedText, s"stream text mismatch for ${g.url}")
      }
    } finally q.stop()
  }

  test("canonical-url dedup drops tracking-param recrawls across microbatches (r6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Array[Byte], String, String)]
    val pages = mem.toDF().toDF("url", "warc_ts", "html", "text", "lang")
    val out = ExtractStream.dedupByCanonicalUrl(
      ExtractStream.transform(spark, pages, Partitioning.defaultSpec(4)))
    val q = out.writeStream.format("memory").queryName("stream_canon")
      .outputMode("append").start()
    try {
      def trk(id: Long) = { // the same resource re-crawled with tracking params
        val (u, ts, html, t, l) = row(id)
        (u + "?utm_source=rss&fbclid=zz", ts, html, t, l)
      }
      mem.addData((0L until 5L).map(row): _*)
      q.processAllAvailable()
      mem.addData(Seq(trk(0L), trk(3L), row(5L)): _*) // 2 canon-dups + 1 new
      q.processAllAvailable()
      val urls = spark.table("stream_canon").select("url_canon")
        .as[String].collect()
      assert(urls.length == 6, s"expected 6 canonical urls, got ${urls.length}: ${urls.mkString(",")}")
      assert(urls.distinct.length == 6)
    } finally q.stop()
  }

  test("file-source -> partitioned sink run with checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // seed input directory with a corpus batch
    val rows = (0L until 30L).map(row)
    rows.toDF("url", "warc_ts", "html", "text", "lang")
      .write.parquet(in)
    val q = ExtractStream.run(spark, in, outDir, ckpt, Partitioning.defaultSpec(4))
    q.awaitTermination(120000)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 30)
    assert(out.filter(col("error").isNotNull).count() == 0)
    assert(out.columns.contains("bucket"))
    // observe(): per-batch operational metrics rode the query progress
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("extract_metrics")))
    assert(observed.nonEmpty, "no observed metrics in query progress")
    assert(observed.map(_.getLong(0)).sum == 30L) // nDocs
    assert(observed.map(_.getLong(1)).sum == 0L)  // nErr
  }
}
