package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json:14).
  *
  * No real cluster exists in this sandbox, so the N vs 4N executor
  * criterion is evidenced by running the SAME extraction job at
  * local[8] and local[32] on the SAME input and reporting throughput
  * at both plus efficiency = thru(4N) / (4 × thru(N))
  * (SURVEY.md §6; driver directive). Median of `reps` timed runs each.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toInt
    // paraScale 20 grows docs toward CommonCrawl sizes so each timed run
    // reaches steady state (>=30 s at local[32]); at the 2-second scale
    // Spark's fixed per-job overhead dominates and the N-vs-4N ratio
    // measures the scheduler, not the engine (SURVEY.md §6)
    val paraScale = sys.env.getOrElse("SPARK_GRAFT_PARA_SCALE", "20").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val small = sys.env.getOrElse("SPARK_GRAFT_N_CORES", "8").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_4N_CORES", "32").toInt

    // generate the corpus once (with the bigger session)
    var spark = session(big)
    val (cp, _) = graft.gen.CorpusTables.ensure(spark, SparkEntry.DataDir, benchN, paraScale)

    def runOnce(s: SparkSession, cores: Int): Double = {
      val corpus = graft.io.Tables.read(s, cp)
      val spec = graft.job.Partitioning.defaultSpec(cores)
      val t0 = System.nanoTime()
      graft.job.ExtractJob.plan(s, corpus, null, spec).filter(_.error.isEmpty).count()
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // warm + measure at 4N (session already up)
    runOnce(spark, big)
    val tBig = median((1 to reps).map(_ => runOnce(spark, big)))
    spark.stop()

    spark = session(small)
    runOnce(spark, small)
    val tSmall = median((1 to reps).map(_ => runOnce(spark, small)))
    spark.stop()

    val thruSmall = benchN / tSmall
    val thruBig = benchN / tBig
    val eff = thruBig / ((big.toDouble / small) * thruSmall)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","docs":$benchN,"para_scale":$paraScale,"reps":$reps,"n_cores":$small,"t_n_sec":$tSmall%.2f,"thru_n_docs_per_sec":$thruSmall%.1f,"4n_cores":$big,"t_4n_sec":$tBig%.2f,"thru_4n_docs_per_sec":$thruBig%.1f}""")
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
