package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}

/** Table IO with the format isolated in one place (SURVEY.md §1.4):
  * Iceberg at deploy scale (catalog identifiers), Parquet locally
  * (directory-per-table). Swapping is this object + the runtime jar.
  */
object Tables {

  /** "parquet" locally; "iceberg" on a cluster with the runtime jar. */
  var format: String = "parquet"

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)

  /** Read the extraction OUTPUT table with the current explicit schema.
    *
    * Schema-evolution seam (ADVICE r3 #2): r3 added the nullable `warn`
    * column to ExtractedRow, so an output table resumed across versions
    * mixes pre-warn and post-warn parquet files. Passing the explicit
    * schema makes the parquet reader fill the missing column with null
    * in old files instead of failing or silently dropping it — cheaper
    * than `mergeSchema=true` (no footer merge over every file at 100 TB)
    * and correct for any future nullable-column addition too. The
    * `bucket` partition column resolves from directory values as usual.
    */
  def readExtracted(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.Encoders.product[graft.job.ExtractedRow].schema
    spark.read.format(format).schema(schema).load(path)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    format match {
      case "parquet" =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).nonEmpty
      case _ =>
        try { spark.read.format(format).load(path).schema; true }
        catch { case _: Exception => false }
    }

  /** Dynamic-partition-overwrite write, partitioned by `bucket` —
    * the idempotent-resume sink (SURVEY.md §2.1 S1).
    */
  def writeBucketed(df: DataFrame, path: String): Unit =
    df.write.format(format)
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .save(path)

  /** Append-only sink (lineage, S2). */
  def append(df: DataFrame, path: String): Unit =
    df.write.format(format).mode(SaveMode.Append).save(path)
}
