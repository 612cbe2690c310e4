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

  /** Validate + backtick-quote a catalog identifier (`table` or
    * `db.table`). Values in partition specs are quote-escaped below, but
    * identifiers cannot be value-quoted — they must be structurally
    * constrained instead, or a crafted table/column name walks straight
    * into the DDL string. */
  private[graft] def quoteIdent(name: String): String = {
    val parts = name.split("\\.", -1)
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"malformed catalog identifier: '$name' " +
        "(expected [A-Za-z_][A-Za-z0-9_]* parts joined by '.')")
    parts.map(p => s"`$p`").mkString(".")
  }

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
    val specSql = spec.map { case (k, v) =>
      s"${quoteIdent(k)}='${v.replace("'", "''")}'" }.mkString(", ")
    spark.sql(s"ALTER TABLE ${quoteIdent(table)} ADD IF NOT EXISTS " +
      s"PARTITION ($specSql) LOCATION '${location.replace("'", "''")}'")
  }

  /** Batched form: one `ALTER TABLE … ADD IF NOT EXISTS PARTITION p1 … pN`
    * statement — one catalog round trip per micro-batch instead of one per
    * partition (the reference pays a metastore thrift call per file close,
    * `callback/AddPartitionCallback.scala:24-35`). */
  def registerPartitions(spark: SparkSession, table: String,
                         parts: Seq[(Map[String, String], String)]): Unit =
    if (parts.nonEmpty) {
      val specsSql = parts.map { case (spec, location) =>
        val specSql = spec.map { case (k, v) =>
          s"${quoteIdent(k)}='${v.replace("'", "''")}'" }.mkString(", ")
        s"PARTITION ($specSql) LOCATION '${location.replace("'", "''")}'"
      }.mkString(" ")
      spark.sql(s"ALTER TABLE ${quoteIdent(table)} ADD IF NOT EXISTS $specsSql")
    }

  /** S5 — create the external partitioned catalog table over a landing
    * path (the metastore table the reference resolves its schema from,
    * `util/HiveUtils.scala:79-88`; here the engine owns the DDL). Data
    * columns keep their DataFrame order; partition columns go last, as the
    * file layout demands. */
  def createPartitionedTable(spark: SparkSession, table: String,
                             schema: org.apache.spark.sql.types.StructType,
                             partitionCols: Seq[String], location: String,
                             format: String = "orc"): Unit = {
    val dataCols = schema.fields.filterNot(f => partitionCols.contains(f.name))
    val ddl = (dataCols.map(f => s"${quoteIdent(f.name)} ${f.dataType.sql}") ++
      partitionCols.map(c => s"${quoteIdent(c)} ${schema(c).dataType.sql}")).mkString(", ")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS ${quoteIdent(table)} ($ddl) USING $format
                  PARTITIONED BY (${partitionCols.map(quoteIdent).mkString(", ")})
                  LOCATION '${location.replace("'", "''")}'""")
  }
}
