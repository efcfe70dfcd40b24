package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Composed-pipeline benchmark at the BENCH corpus scale (r6): the
  * full extract → quality gate → canonical-URL dedup → exact dedup →
  * near-dup cluster chain over the 200k-doc generator corpus with
  * planted republications — the x7 driver query's shape at 400× its
  * row count. Prints ONE JSON line: per-stage counts, wall seconds,
  * end-to-end docs/sec.
  *
  * This is the scale gate the small-SF CORRECTNESS run cannot give:
  * the minhash explode, band-bucket caps, and label-propagation rounds
  * all run over real extraction output volume (the stage whose O(len²)
  * gram trap r6 caught fired exactly here first).
  */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS",
      graft.gen.CorpusTables.SfBench.toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (cp, _) = graft.gen.CorpusTables.ensure(spark, SparkEntry.DataDir, benchN)
    val corpus = graft.io.Tables.read(spark, cp)
    val spec = graft.job.Partitioning.defaultSpec(cpus.toInt)

    def extractOnce() = graft.job.ExtractJob.plan(spark, corpus, null, spec).toDF()
      .filter(col("error").isNull).select(col("url"), col("text"))
      .localCheckpoint()

    // untimed warm-up extraction (JIT + page cache), then the timed run
    extractOnce().count()

    val t0 = System.nanoTime()
    val ext = extractOnce()
    val tExtract = (System.nanoTime() - t0) / 1e9
    // opt-in r6 stages, so the same main also measures the full
    // curation chain: SPARK_GRAFT_PIPE_FULL=1 turns on boilerplate
    // line removal (d10) and the per-host cap (q23)
    val full = sys.env.get("SPARK_GRAFT_PIPE_FULL").contains("1")
    val t1 = System.nanoTime()
    val res = graft.job.CorpusPipeline.run(
      graft.job.CorpusPipeline.plantRepublications(ext),
      boilerplateLineMinDocs = if (full) Some(100) else None,
      maxDocsPerHost = if (full) Some(1000) else None)
    val stages = res.stages.collect().map(r => r.getString(0) -> r.getLong(1))
    val tPipeline = (System.nanoTime() - t1) / 1e9
    val total = tExtract + tPipeline
    val nIn = stages.head._2
    val stagesJson = stages.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(f"""{"metric":"pipeline_e2e","value":$total%.3f,"unit":"sec","extract_sec":$tExtract%.3f,"dedup_sec":$tPipeline%.3f,"stages":$stagesJson,"docs_in":$nIn,"docs_per_sec":${nIn / total}%.1f,"cpus":$cpus,"bench_docs":$benchN}""")
    spark.stop()
  }
}
