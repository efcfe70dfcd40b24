package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified corpus sampling (q24) — the mixing step a
  * training-data pipeline runs last: given per-stratum keep rates
  * (per language, source, or quality bucket), keep each document with
  * probability rate(stratum), decided by a deterministic hash rank of
  * the document key. The Pile/ROOTS-style corpus weighting reduces to
  * exactly this once weights are normalized to per-stratum rates.
  *
  * SCALE SHAPE: a pure per-row FILTER — no shuffle, no sort, no window,
  * no per-stratum grouping. The stratum→rate lookup folds into one CASE
  * expression (strata counts are human-sized: languages, sources), and
  * the rank is a pure function of the key, so re-runs, resumes and
  * two different cluster sizes keep the SAME documents (the property
  * `rand()` sampling destroys: its seed is per-partition-index, so any
  * repartition reshuffles the sample).
  */
object Sampling {

  /** Keep rows where rank(key) < rate(stratum). Strata absent from
    * `rates` keep `defaultRate` (1.0 = pass through). `rank` defaults
    * to the ANSI-expressible `Urls.md5Rank` (the DuckDB-oracled rule);
    * cluster callers pass `Urls.xxRank` (codegen'd xxhash64, ~10×
    * cheaper, same semantics) — the q24 production twin.
    */
  def stratifiedSample(df: DataFrame, rates: Map[String, Double],
                       defaultRate: Double = 1.0,
                       strataCol: String = "lang",
                       keyCol: String = "doc_id",
                       rank: Column => Column = Urls.md5Rank): DataFrame = {
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // rate 0 short-circuits: md5Rank is in [0,1) so `< 0` is never true,
    // but keeping the comparison explicit documents the drop-all case.
    // NULL keys are DROPPED BY THE RULE (r7, ADVICE — documented, not
    // silent): rank(NULL) is NULL, so the predicate is never true —
    // and the DuckDB q24 oracle's md5(NULL) rule behaves identically,
    // so the two engines agree. A sentinel coalesce was considered and
    // rejected: all null-key rows would share ONE rank and be kept or
    // dropped as a block (nothing like the stratum rate) while
    // silently diverging from the portable rule. Callers that want
    // null-key rows sampled must assign them a real key upstream;
    // `sampleStats` surfaces the drop as a realized-rate mismatch.
    df.filter(rank(col(keyCol).cast("string")) < rateExpr)
  }

  /** Per-stratum accounting of a sampling pass: docs in, docs kept,
    * and the realized rate — the no-silent-drop observability row
    * (binomial, so realized ≈ requested with ±1/sqrt(n) noise; a
    * mismatch beyond that means a skewed or colliding key).
    */
  def sampleStats(df: DataFrame, rates: Map[String, Double],
                  defaultRate: Double = 1.0,
                  strataCol: String = "lang",
                  keyCol: String = "doc_id",
                  rank: Column => Column = Urls.md5Rank): DataFrame = {
    val kept = stratifiedSample(df, rates, defaultRate, strataCol, keyCol, rank)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_kept"))
    df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq(strataCol), "left")
      .select(col(strataCol), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .withColumn("realized_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 6))
      .orderBy(strataCol)
  }
}
