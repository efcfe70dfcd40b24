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
