package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Storage-layout optimization: Z-order (Morton) clustering, the
  * multi-dimensional generalization of the reference's single-key partition
  * routing (`HiveBatchedSink.scala` routes rows to one `logdate` partition;
  * a 100 TB lakehouse also needs *within*-partition clustering so scans
  * filtered on EITHER of two dimensions skip most files).
  *
  * The mechanism: bucket each dimension to 8 bits against its min/max,
  * interleave the bits into a 16-bit Morton code, then range-partition and
  * sort by that code on write. Consecutive z-values confine BOTH
  * dimensions to narrow ranges, so every file's parquet min/max footer
  * stats become selective for predicates on either column — the
  * data-skipping property Delta/Iceberg `OPTIMIZE ZORDER BY` buys, built
  * here from plain Spark primitives (`repartitionByRange` + sort).
  *
  * Everything is 64-bit integer arithmetic (bucket = floor-scaled offset,
  * code = shifted bit sum), so the layout — and the oracle — is exact and
  * engine-independent; the min/max scan that seeds the bucketing is one
  * 1-row aggregate (bounded metadata, the x6/x20 pattern).
  */
object Layout {

  /** Interleave the low `bits` of `bx` (odd positions) and `by` (even
    * positions) into a Morton code. Pure shift/mask column arithmetic —
    * whole-stage-codegen'd, no UDF. */
  private[graft] def morton(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .plus(shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** 8-bit bucket of `c` within [lo, hi]: `((c - lo) * 256) div (hi - lo + 1)`
    * — 0..255, exact integer floor division. */
  private def bucket(name: String, lo: Long, hi: Long): Column =
    expr(s"(($name - ${lo}L) * 256L) div ${hi - lo + 1}L")

  private[graft] def withZ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    // dimension ranges: 1-row aggregate → driver literals (bounded metadata)
    val s = li.agg(min(col("pk")), max(col("pk")), min(col("sk")), max(col("sk"))).head()
    // empty input: mins/maxes are null — emit the empty layout, not an NPE
    if (s.isNullAt(0)) {
      return li.select(col("pk"), col("sk"), lit(0L).as("bx"),
        lit(0L).as("by"), lit(0L).as("z"))
    }
    val (pmin, pmax, smin, smax) = (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
    li.withColumn("bx", bucket("pk", pmin, pmax))
      .withColumn("by", bucket("sk", smin, smax))
      .withColumn("z", morton(col("bx"), col("by"), 8))
  }

  /** X33 — Z-order layout audit: group rows by target file (`z div 256` —
    * 256 files of contiguous Morton ranges) and report each file's row
    * count and per-dimension bounds. The bounds SHOW the skipping
    * guarantee: fixing the top 8 Morton bits confines each dimension's
    * bucket to a 16-wide range, i.e. every file covers ≤ 1/16 of either
    * dimension — a scan filtered on one dimension value touches ≤ 1/16 of
    * the files (vs all of them under insertion order). A spec performs the
    * physical form (`repartitionByRange(z)` + sort + write) and asserts
    * the per-file spans. */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame =
    withZ(spark, sfDir)
      .withColumn("zfile", expr("z div 256"))
      .groupBy(col("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("bx")).as("bx_min"), max(col("bx")).as("bx_max"),
        min(col("by")).as("by_min"), max(col("by")).as("by_max"))
      .orderBy(col("zfile"))

  /** The matching DuckDB oracle — same bucket/interleave arithmetic with
    * the stats inlined as a CTE instead of driver literals. */
  def zorderOracleSql: String = {
    val z = (0 until 8).map { i =>
      s"(((bx >> $i) & 1) * ${1L << (2 * i + 1)} + ((by >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")
    s"""WITH s AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
              min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
        b AS (SELECT ((l_partkey - pmin) * 256) // (pmax - pmin + 1) AS bx,
              ((l_suppkey - smin) * 256) // (smax - smin + 1) AS by
              FROM lineitem, s),
        zt AS (SELECT bx, by, $z AS z FROM b)
        SELECT z // 256 AS zfile, count(*) AS n_rows,
          min(bx) AS bx_min, max(bx) AS bx_max,
          min(by) AS by_min, max(by) AS by_max
        FROM zt GROUP BY 1 ORDER BY 1"""
  }
}
