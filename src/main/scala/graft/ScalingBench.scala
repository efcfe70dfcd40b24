package graft

import org.apache.spark.sql.SparkSession
import scala.sys.process._

/** Two-cluster-size scaling evidence (BASELINE.json:14): throughput at
  * N vs 4N EXECUTORS with efficiency = thru(4N) / (4 × thru(N)).
  *
  * No real cluster exists in this sandbox, so this orchestrator uses
  * Spark's `local-cluster[numExecutors, coresPerExec, memMB]` master —
  * REAL multi-process executors (separate JVM heaps, real shuffle
  * between processes) on one box — and spark-submits the same job
  * (graft.ScalingRun) at 1 and 4 executors with a fixed per-executor
  * shape, per the driver directive.
  *
  * Methodology notes (measured in this sandbox, see BENCH/BASELINE.md):
  * - each configuration runs in FRESH JVMs (driver + executors) with an
  *   in-session warm-up pass before the timed passes, so JIT warm-up is
  *   paid identically by both configurations;
  * - a raw-thread control (no Spark) showed this box scales pure
  *   extraction ~0.95 efficient from 4→16 threads but only ~0.75 from
  *   8→32 (memory bandwidth), so the default executor shape is 4 cores
  *   (1×4 vs 4×4 = 4 vs 16 cores) to measure the ENGINE, not the box.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "320000").toInt
    val paraScale = sys.env.getOrElse("SPARK_GRAFT_PARA_SCALE", "20").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val execSmall = sys.env.getOrElse("SPARK_GRAFT_N_EXECS", "1").toInt
    val execBig = sys.env.getOrElse("SPARK_GRAFT_4N_EXECS", "4").toInt
    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "4").toInt
    val execMemMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "10240").toInt
    val jar = sys.env.getOrElse("SPARK_GRAFT_JAR",
      "/root/repo/target/scala-2.13/pdfworkerspark_2.13-0.1.0.jar")

    // generate the corpus once with a plain local session
    val gen = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    gen.sparkContext.setLogLevel("WARN")
    val (cp, _) = graft.gen.CorpusTables.ensure(gen, SparkEntry.DataDir, benchN, paraScale)
    gen.stop()

    /** spark-submit one configuration; returns per-pass seconds. */
    def submit(nExec: Int): Seq[Double] = {
      val totalCores = nExec * coresPerExec
      val cmd = Seq("/opt/spark/bin/spark-submit",
        "--master", s"local-cluster[$nExec,$coresPerExec,$execMemMb]",
        "--conf", "spark.ui.enabled=false",
        "--conf", s"spark.sql.shuffle.partitions=$totalCores",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=4g",
        // local-cluster[n,c,mem] sets only the WORKER allowance; the
        // executor heap itself comes from spark.executor.memory
        // (default 1g -> OOM on big-doc buckets)
        "--conf", s"spark.executor.memory=${execMemMb - 1024}m",
        // binary payload columns: 4096-row vectorized batches reserve
        // rows x payload bytes contiguously (~60 MB+ with the big-doc
        // tail) and blow the executor heap — shrink the batch, keep the
        // vectorized reader (same setting a 100 TB deployment needs)
        "--conf", "spark.sql.parquet.columnarReaderBatchSize=128",
        "--class", "graft.ScalingRun", jar, cp, reps.toString)
      val outF = new java.io.File(s"/tmp/graft_scaling_${nExec}x$coresPerExec.out")
      val errF = new java.io.File(s"/tmp/graft_scaling_${nExec}x$coresPerExec.err")
      val pb = new java.lang.ProcessBuilder(cmd: _*)
      pb.redirectOutput(outF)
      pb.redirectError(errF)
      val code = pb.start().waitFor()
      val outLines = java.nio.file.Files.readAllLines(outF.toPath)
      val line = {
        val it = outLines.iterator()
        var found: String = null
        while (it.hasNext && found == null) {
          val l = it.next()
          if (l.startsWith("SCALING_RUN_JSON")) found = l
        }
        if (found == null)
          sys.error(s"spark-submit (exit $code) produced no result; see $errF")
        found
      }
      val runs = line.substring(line.indexOf("\"runs\":[") + 8)
        .takeWhile(_ != ']').split(',').map(_.toDouble).toSeq
      System.err.println(s"[scaling] $nExec execs x $coresPerExec cores: " +
        runs.map(t => f"$t%.2f").mkString(", "))
      runs
    }

    // INTERLEAVED A/B protocol (VERDICT r3 "next" #4): this box's noise
    // is bursty and one-sided, so sequential N-then-4N sampling lets a
    // burst hit one leg only and fabricate (or destroy) efficiency.
    // Alternating N/4N legs within ONE invocation puts adjacent legs
    // ~a minute apart; each round yields a PAIRED efficiency computed
    // from times measured under (nearly) the same host conditions.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "4").toInt
    val ratio = execBig.toDouble / execSmall
    val pairs = (1 to rounds).map { r =>
      System.err.println(s"[scaling] A/B round $r/$rounds")
      val tsSmall = submit(execSmall)
      val tsBig = submit(execBig)
      val tN = tsSmall.min
      val t4 = tsBig.min
      val eff = (benchN / t4) / (ratio * (benchN / tN))
      System.err.println(f"[scaling]   round $r: tN=$tN%.2f t4N=$t4%.2f eff=$eff%.3f")
      (tN, t4, eff, tsSmall, tsBig)
    }
    val effs = pairs.map(_._3)
    val effMed = median(effs)
    val effBest = effs.max
    // cross-round minima compound (the r3 headline number, kept for
    // comparability — noise-prone because minima may come from
    // different host windows)
    val tN = pairs.map(_._1).min
    val t4 = pairs.map(_._2).min
    val effMin = (benchN / t4) / (ratio * (benchN / tN))
    val pairsJson = pairs.map { case (a, b, e, _, _) =>
      f"""{"t_n_sec":$a%.2f,"t_4n_sec":$b%.2f,"eff":$e%.3f}"""
    }.mkString("[", ",", "]")
    val runsN = pairs.flatMap(_._4).map(t => f"$t%.2f").mkString("[", ",", "]")
    val runs4 = pairs.flatMap(_._5).map(t => f"$t%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"scaling_efficiency","value":$effMed%.3f,"unit":"ratio","protocol":"interleaved_ab","pairs":$pairsJson,"eff_median_pair":$effMed%.3f,"eff_best_pair":$effBest%.3f,"eff_cross_minima":$effMin%.3f,"docs":$benchN,"para_scale":$paraScale,"reps":$reps,"ab_rounds":$rounds,"mode":"local-cluster","cores_per_executor":$coresPerExec,"n_executors":$execSmall,"4n_executors":$execBig,"t_n_sec":$tN%.2f,"thru_n_docs_per_sec":${benchN / tN}%.1f,"t_4n_sec":$t4%.2f,"thru_4n_docs_per_sec":${benchN / t4}%.1f,"runs_n":$runsN,"runs_4n":$runs4}""")
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
}
