package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.job.{ExtractJob, Partitioning}

/** Skew A/B evidence (SURVEY §7.2 #5; VERDICT r3 "next" #9): the same
  * extract-and-sink wave with (a) the production SALTED bucket spec
  * (big docs routed to their own bucket range) and (b) an UNSALTED
  * control (`bigBuckets = 0` — big docs land in mixed url-hash buckets),
  * (c) the unsalted control again with AQE enabled, measuring what
  * `spark.sql.adaptive` does and does not recover.
  *
  * Reported per config: wall seconds and the sink-stage task-duration
  * distribution (max / p50 / skew ratio) from a task-end listener —
  * the reducer tail is exactly what the salt defuses at 100 TB (a
  * straggling write task holds its whole executor wave).
  *
  * Usage: sbt -batch "runMain graft.SkewBench [docs] [paraScale]"
  */
object SkewBench {

  private final class TaskStats extends SparkListener {
    val durations = new scala.collection.mutable.ArrayBuffer[(Int, Long)] // (stageId, ms)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null && t.taskInfo.successful)
        durations += ((t.stageId, t.taskInfo.duration))
    }
    def reset(): Unit = synchronized(durations.clear())
    /** (max, p50, max/p50) of the two heaviest stages by total task
      * time: [0] = the extract/scan stage (map side — skew here is
      * INPUT-layout-bound, the salt cannot move compute that happens
      * before the shuffle), [1] = the sink write stage (reduce side —
      * the one the bucket salt defuses).
      */
    def top2: Seq[(Long, Long, Double)] = synchronized {
      durations.groupBy(_._1).toSeq
        .sortBy { case (_, ds) => -ds.map(_._2).sum }
        .take(2)
        .map { case (_, ds) =>
          val sorted = ds.map(_._2).sorted
          val max = sorted.last
          val p50 = sorted(sorted.size / 2)
          (max, p50, if (p50 > 0) max.toDouble / p50 else 0.0)
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(40000)
    val paraScale = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    val (cp, _) = gen.CorpusTables.ensure(spark, SparkEntry.DataDir, docs, paraScale)
    // DELIBERATE skew: the standard corpus caps documents at 1500
    // paragraphs (big-tail ≈ sub-MB), which a 32-bucket hash absorbs —
    // so union in 24 UNCAPPED ~8 MB documents, the "handful of 100 MB
    // documents" shape of BASELINE.json at this tier's scale. Unsalted,
    // url-hash drops several giants into the same mixed bucket
    // (birthday collisions over 32); salted, they spread over their own
    // dedicated range.
    val giants = (0 until 24).map { i =>
      val rng = new scala.util.Random(gen.CorpusGen.Seed + 10000000L + i)
      val pool = gen.TextGen.pool("en", -1)
      val paras = gen.TextGen.docParagraphs(rng, pool, big = true,
        paraScale = 2000, capParas = 120000)
      val built = gen.HtmlBuilder.build(gen.HtmlBuilder.specFor(10000000L + i, rng),
        paras.map(_.map(_.mkString(" "))), rng)
      (s"https://synth.test/giant/$i", built.bytes)
    }
    val input = spark.read.parquet(cp).select("url", "html")
      .union(spark.createDataFrame(giants).toDF("url", "html").repartition(8))

    val salted = Partitioning.defaultSpec(16)
    val unsalted = salted.copy(bigBuckets = 0)

    def wave(spec: Partitioning.BucketSpec, aqe: Boolean)
      : (Double, Seq[(Long, Long, Double)], (Double, Double, Double)) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // AQE only helps a plain repartition through rebalance-skew
      // optimization; leave defaults otherwise so the measurement shows
      // stock behavior
      val out = s"/tmp/graft_skew_${spec.bigBuckets}_$aqe"
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(out))
      stats.reset()
      val t0 = System.nanoTime()
      ExtractJob.plan(spark, input, null, spec).toDF()
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, stats.top2, bucketBytes(out))
    }

    /** (maxMB, p50MB, ratio) of output bytes per bucket directory —
      * the scale-independent reading: a bucket is the write/resume unit,
      * so its byte ceiling is what the salt bounds at 100 TB.
      */
    def bucketBytes(out: String): (Double, Double, Double) = {
      val dirs = new java.io.File(out).listFiles(
        (f: java.io.File) => f.isDirectory && f.getName.startsWith("bucket="))
      if (dirs == null || dirs.isEmpty) return (0, 0, 0)
      val sizes = dirs.map(_.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum / 1e6).sorted
      val mx = sizes.last
      val p50 = sizes(sizes.length / 2)
      (mx, p50, if (p50 > 0) mx / p50 else 0.0)
    }

    // warm-up (JIT + corpus cache) — discard
    wave(salted, aqe = false)

    val rows = Seq(
      ("salted", salted, false), ("unsalted", unsalted, false),
      ("unsalted_aqe", unsalted, true), ("salted_aqe", salted, true))
      .map { case (name, spec, aqe) =>
        val (sec, stages, (bMax, bP50, bRatio)) = wave(spec, aqe)
        val names = Seq("extract_stage", "sink_stage")
        val parts = stages.zip(names).map { case ((max, p50, ratio), sn) =>
          System.err.println(f"[skew] $name%-14s $sn%-13s taskMax=${max / 1000.0}%6.1fs p50=${p50 / 1000.0}%5.1fs skew=$ratio%5.2fx (wall=$sec%6.1fs)")
          f""""$sn":{"task_max_sec":${max / 1000.0}%.2f,"task_p50_sec":${p50 / 1000.0}%.2f,"skew_ratio":$ratio%.2f}"""
        }
        System.err.println(f"[skew] $name%-14s bucket_bytes  maxMB=$bMax%6.1f p50MB=$bP50%6.1f skew=$bRatio%5.2fx")
        f""""$name":{"wall_sec":$sec%.2f,${parts.mkString(",")},"bucket_max_mb":$bMax%.1f,"bucket_p50_mb":$bP50%.1f,"bucket_skew":$bRatio%.2f}"""
      }
    println(s"""{"metric":"skew_ab","docs":$docs,"para_scale":$paraScale,${rows.mkString(",")}}""")
    spark.stop()
  }
}
