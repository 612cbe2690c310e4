package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3/S4/S6 — the partitioned columnar landing sink.
  *
  * Replaces the reference's hand-rolled writer fleet — per-key ORC writers
  * behind an LRU (`/root/reference/.../HiveBatchedSink.scala:98-113`),
  * idle-scan + async close threads (`:115-175`), and an add-partition
  * callback (`callback/AddPartitionCallback.scala:24-35`) — with Spark's
  * `FileFormatWriter`: `partitionBy` sorts rows by partition expression per
  * task so each task streams one file at a time, the commit protocol makes
  * output atomic+idempotent, and partition discovery/registration is either
  * implicit (`spark.read` path discovery) or one `MSCK`/`ADD PARTITION`
  * statement against a metastore-backed table.
  */
object Landing {

  /** Write `df` as a Hive-layout partitioned table. `format` ∈ orc|parquet. */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            format: String = "orc"): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)

  /** Read a landed table back (partition columns recovered from the path —
    * the engine-side analogue of metastore partition listing,
    * `util/HiveUtils.scala:42-69`). */
  def read(spark: SparkSession, path: String, format: String = "orc"): DataFrame =
    spark.read.format(format).load(path)

  /** Register landed partitions on a catalog table — the S6 add-partition
    * DDL (`ALTER TABLE … ADD IF NOT EXISTS PARTITION`), idempotent like the
    * reference's existence probe (`util/HiveUtils.scala:58-66`). */
  def registerPartition(spark: SparkSession, table: String,
                        spec: Map[String, String], location: String): Unit = {
    val specSql = spec.map { case (k, v) => s"$k='${v.replace("'", "''")}'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($specSql) LOCATION '$location'")
  }
}
