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
    // line removal (d10) and the per-host cap (q23);
    // SPARK_GRAFT_PIPE_SEM=1 additionally runs the s7 semantic-dedup
    // stage over a synthetic clustered embedding table (r6c)
    val full = sys.env.get("SPARK_GRAFT_PIPE_FULL").contains("1")
    val sem = sys.env.get("SPARK_GRAFT_PIPE_SEM").contains("1")
    // Deterministic clustered embeddings over the extracted urls —
    // the regime SemDeDup targets: ~centers of ≈100 same-direction
    // members (hash-jittered, cos ≈ 1 within a center, ≈ random
    // across centers), so the semantic stage collapses each center
    // to its min-url member. Components are xxhash64-derived (no
    // wall-clock, no RNG state), so re-runs see the SAME table.
    val semDim = 32
    val nCenters = math.max(benchN / 100, 16)
    def semEmb(df: org.apache.spark.sql.DataFrame) = {
      val center = pmod(xxhash64(col("url")), lit(nCenters.toLong))
      df.select(col("url"), array((0 until semDim).map { j =>
        (pmod(xxhash64(center, lit(j)), lit(2001L)) - lit(1000L)).cast("float") / lit(1000.0f) +
          (pmod(xxhash64(col("url"), lit(j + semDim)), lit(2001L)) - lit(1000L)).cast("float") / lit(50000.0f)
      }: _*).cast("array<float>").as("embedding")) // Divide promotes to double
    }
    val t1 = System.nanoTime()
    val res = graft.job.CorpusPipeline.run(
      graft.job.CorpusPipeline.plantRepublications(ext),
      boilerplateLineMinDocs = if (full) Some(100) else None,
      maxDocsPerHost = if (full) Some(1000) else None,
      // MATERIALIZED (localCheckpoint), not fed as a lazy projection:
      // the 64-hash synthesis expression would otherwise be inlined
      // into every one of the ~200 centroid-distance expressions by
      // projection collapse — a plan so large per-task codegen OOMs.
      // Real deployments hit the same rule: embeddings arrive as a
      // TABLE from the embedding model, never as an inline formula.
      semDedupEmbeddings = if (sem) Some(semEmb(ext).localCheckpoint()) else None,
      // cell population ≈ corpus/nCells must stay under the cap for
      // the stage to do work, and pair cost is O(cell²) — size cells
      // to ~250 expected members (the 100 TB sizing rule, exercised
      // here; k-means skew on top is bounded by semDedupMaxCell)
      semDedupCells = math.max(benchN / 250, 16))
    val stages = res.stages.collect().map(r => r.getString(0) -> r.getLong(1))
    val tPipeline = (System.nanoTime() - t1) / 1e9
    val total = tExtract + tPipeline
    val nIn = stages.head._2
    val stagesJson = stages.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(f"""{"metric":"pipeline_e2e","value":$total%.3f,"unit":"sec","extract_sec":$tExtract%.3f,"dedup_sec":$tPipeline%.3f,"stages":$stagesJson,"docs_in":$nIn,"docs_per_sec":${nIn / total}%.1f,"cpus":$cpus,"bench_docs":$benchN}""")
    spark.stop()
  }
}
