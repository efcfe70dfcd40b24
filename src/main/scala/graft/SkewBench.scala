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
    val input = spark.read.parquet(cp).select("url", "html")

    val salted = Partitioning.defaultSpec(16)
    val unsalted = salted.copy(bigBuckets = 0)

    def wave(spec: Partitioning.BucketSpec, aqe: Boolean): (Double, Seq[(Long, Long, Double)]) = {
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
      (sec, stats.top2)
    }

    // warm-up (JIT + corpus cache) — discard
    wave(salted, aqe = false)

    val rows = Seq(
      ("salted", salted, false), ("unsalted", unsalted, false),
      ("unsalted_aqe", unsalted, true), ("salted_aqe", salted, true))
      .map { case (name, spec, aqe) =>
        val (sec, stages) = wave(spec, aqe)
        val names = Seq("extract_stage", "sink_stage")
        val parts = stages.zip(names).map { case ((max, p50, ratio), sn) =>
          System.err.println(f"[skew] $name%-14s $sn%-13s taskMax=${max / 1000.0}%6.1fs p50=${p50 / 1000.0}%5.1fs skew=$ratio%5.2fx (wall=$sec%6.1fs)")
          f""""$sn":{"task_max_sec":${max / 1000.0}%.2f,"task_p50_sec":${p50 / 1000.0}%.2f,"skew_ratio":$ratio%.2f}"""
        }
        f""""$name":{"wall_sec":$sec%.2f,${parts.mkString(",")}}"""
      }
    println(s"""{"metric":"skew_ab","docs":$docs,"para_scale":$paraScale,${rows.mkString(",")}}""")
    spark.stop()
  }
}
