package graft.operators

import graft.Tables
import graft.functions.{Headers, JsonSerde, Times}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M1 — the reference's entire hot path (`process()`,
  * `/root/reference/.../HiveBatchedSink.scala:297-358`) as one declarative
  * Spark pipeline:
  *
  *   channel.take batch        → parquet scan of `events`
  *   serde deserialize (P1)    → `from_json(props)` struct
  *   header defaulting (P7)    → `coalesce(event_type, 'no_category')`
  *   path/partition render(P2) → `logdate` column (5-min floor, P3/P4)
  *   per-partition ORC router  → `write.partitionBy("logdate").orc(...)`
  *   (S3/S4)                     — Spark's FileFormatWriter does the
  *                                 open/route/close the reference hand-rolls
  *                                 with an LRU + idle-scan threads (T3/T4)
  *
  * Scale notes: the enrichment is a pure map stage fused with the scan
  * (no shuffle); `partitionBy` plans a local sort by partition value per
  * task, so each task holds O(1) open writers — the 100 TB-safe version of
  * the reference's `maxOpenFiles=5000` LRU. Exactly-once comes from the
  * file-commit protocol, fixing the reference's ack-before-flush data-loss
  * window (`HiveBatchedSink.scala:335` FIXME).
  */
object Ingest {

  /** `events.props` is JSON like {"k": 87} (FIXTURES.md). */
  val propsSerde: JsonSerde = JsonSerde(StructType(Seq(StructField("k", LongType))))

  /** The enrichment stage: the typed, partition-ready event stream. */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("category", Headers.categoryOrDefault(col("event_type")))
      .withColumn("logdate", Times.logdate(col("ts")))
      .withColumn("body", propsSerde.parse(col("props")))
      .select(col("event_id"), col("ts"), col("user_id"), col("category"),
        col("logdate"), col("value"), col("body.k").as("k"))

  /** Land the enriched stream as a Hive-layout partitioned table
    * (`logdate=yyyyMMddHHmm/` dirs, ORC) — S3/S4/S6 in one write.
    * Idempotent: dynamic partition overwrite, so re-running a batch
    * replaces exactly the partitions it owns. */
  def land(spark: SparkSession, sfDir: String, outPath: String): Unit =
    enriched(spark, sfDir)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("logdate")
      .orc(outPath)

  /** Flagship: ingest → land → read back → per-partition counts.
    * Proves partition pruning-ready layout and that landed rows equal
    * source rows (the invariant the reference's bookkeeping table tracks). */
  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    // Unique per-invocation dir: a fixed path + dynamic-overwrite would let
    // stale partitions from a previous run (different data) pollute the
    // read-back accounting.
    val out = graft.Tables.scratchDir("graft_landing_").toString
    land(spark, sfDir, out)
    spark.read.orc(out)
      .groupBy(col("logdate"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("category")).as("n_categories"),
        max(Times.epochSeconds(col("ts"))).as("max_epoch"))
      .orderBy(col("logdate"))
  }

  /** Q — land fragmented (8 files per partition, the many-small-files
    * state a micro-batch sink accumulates), compact with
    * [[graft.sources.Landing.compactPartitions]], then re-read and produce
    * per-partition accounting. Partitioned by DAY (`logday`), not the
    * 5-minute logdate: file maintenance is a partition-count game — at
    * sf0.1 the 5-min key already means ~60k partitions whose per-partition
    * swap renames alone take minutes, exactly the over-partitioning a
    * real deployment's compaction policy exists to avoid (days ~O(100s)
    * of partitions; the 5-min template stays a column, pruned fine). The
    * oracle checks the data survived the rewrite; IngestSpec separately
    * asserts the file counts collapsed and the staging/trash dirs are
    * gone. */
  def compactRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = graft.Tables.scratchDir("graft_compact_").toString
    enriched(spark, sfDir)
      .withColumn("logday", substring(col("logdate"), 1, 8))
      .repartition(8)
      .write.mode("overwrite").partitionBy("logday").orc(out)
    graft.sources.Landing.compactPartitions(spark, out, "logday")
    spark.read.orc(out)
      // partition-type inference reads the logday path value as a long;
      // the accounting (and its oracle) treat it as the string key
      .withColumn("logday", col("logday").cast("string"))
      .groupBy(col("logday"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("category")).as("n_categories"),
        max(Times.epochSeconds(col("ts"))).as("max_epoch"))
      .orderBy(col("logday"))
  }

  /** The same per-partition accounting computed directly on the source —
    * what the DuckDB oracle can express (no file side effects). */
  def partitionCounts(spark: SparkSession, sfDir: String): DataFrame =
    enriched(spark, sfDir)
      .groupBy(col("logdate"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("category")).as("n_categories"),
        max(Times.epochSeconds(col("ts"))).as("max_epoch"))
      .orderBy(col("logdate"))
}
