package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Data-quality profiling — the schema-level audit a pipeline runs
  * before admitting a new drop of data (the Deequ/"expectations" pattern):
  * per column, how many rows, how many non-null, how many distinct, and the
  * value range. The reference's only data-quality surface is the
  * completeness HAVING probe (`dao/HiveSinkDetailDao.scala:42-61` — row
  * counts per logdate); this generalizes it to every column of a table.
  *
  * Scale design: ONE aggregation pass over the table produces every metric.
  * The multiple exact `count(distinct)`s compile to Catalyst's Expand —
  * k distinct-aggregates replicate each input row k times before the
  * partial aggregate, a deliberate trade: one scan of a 100 TB table with
  * 5× in-flight expansion (then immediate partial-agg collapse) beats five
  * scans. Where a profile can tolerate ±1% cardinality,
  * swap `countDistinct` for `approx_count_distinct` (a7b's sketch) and the
  * Expand disappears entirely.
  */
object Profile {

  /** X32 — one-pass column profile of `documents`. Output one row per
    * column: `(col_name, n_rows, n_nonnull, n_distinct, min_str, max_str)`
    * with min/max computed in the column's own type, then rendered as
    * strings so heterogeneous columns share one schema. */
  def columnProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nn").as("n_nonnull"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_str"),
        col(s"${c}__mx").as("max_str"))
    }: _*)
    one.select(col("n_rows"), explode(entries).as("m"))
      .select(col("m.col_name"), col("n_rows"), col("m.n_nonnull"),
        col("m.n_distinct"), col("m.min_str"), col("m.max_str"))
      .orderBy(col("col_name"))
  }

  /** The matching DuckDB oracle: one UNION ALL branch per column (the
    * naive k-scan form — fine for an oracle, not for 100 TB). */
  def columnProfileOracleSql: String = {
    val branches = Seq("doc_id", "lang", "n_chars", "source", "text").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
          count(DISTINCT $c) AS n_distinct,
          CAST(min($c) AS VARCHAR) AS min_str,
          CAST(max($c) AS VARCHAR) AS max_str FROM documents"""
    }
    branches.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
  }
}
