package graft.operators

import graft.Tables
import graft.functions.{Headers, Times}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M2 — the counter / bookkeeping analytics family.
  *
  * The reference maintains these imperatively: per-batch local HashMaps
  * merged into global LRU-bounded maps under a lock
  * (`/root/reference/.../util/TimedUtils.scala:55-133`,
  * `counter/TimedSinkCounter.scala:33-55`) plus a JDBC bookkeeping table
  * with a GROUP BY/HAVING completeness probe
  * (`dao/HiveSinkDetailDao.scala:42-98`). Each becomes one declarative
  * aggregation; Spark inserts the partial→final split (the reference's
  * two-phase merge) automatically, and watermark state eviction replaces
  * the 500-bucket LRU (`TimedUtils.scala:114-124`).
  */
object Counters {

  /** A2 — global 5-min tumbling-window count (+ last update ts, A6 shape).
    * TimedUtils.scala:55-68,126-133. */
  def windowCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"))
      .agg(count(lit(1)).as("cnt"),
           max(Times.epochSeconds(col("ts"))).as("last_update_epoch"))
      .orderBy(col("bucket_epoch"))

  /** A2b — the dense 5-min timeline: [[windowCounts]] emits only buckets
    * that have events, but a monitor reading the counters needs the empty
    * buckets too (a silent-source gap IS the signal — the reference's
    * completeness probe exists for exactly that blind spot). The grid is
    * `sequence(min, max, 300)` exploded from the ONE-row bucket-range
    * aggregate — O(time-range) rows regardless of data volume — then a
    * left join marks the holes. `filled` flags synthesized zeros so
    * downstream alerting can distinguish "no events" from "bucket seen". */
  def denseTimeline(spark: SparkSession, sfDir: String): DataFrame = {
    // snapshot: the stats head() below and the final join both consume the
    // aggregation — lineage truncation computes the scan+shuffle ONCE
    // instead of twice (at the design scale the second full pass would be
    // the dominant cost of the query)
    val counts = Dedup.snapshot(spark, Tables.events(spark, sfDir)
      .groupBy(Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"))
      .agg(count(lit(1)).as("n")))
    // bucket range as ONE collected stats row (the x6/x20 inline-the-stats
    // idiom) — keeping the global min/max inside the query plan would put
    // a single-partition exchange in the declared plan, which the
    // guardrails rightly reject; spark.range generates the grid with no
    // exchange at all
    val stats = counts.agg(min(col("bucket_epoch")), max(col("bucket_epoch"))).head()
    if (stats.isNullAt(0))
      return counts.select(col("bucket_epoch"), col("n").as("cnt"),
        lit(false).as("filled")).limit(0)
    val (lo, hi) = (stats.getLong(0), stats.getLong(1))
    val grid = spark.range(lo, hi + 1L, 300L)
      .select(col("id").as("bucket_epoch"))
    grid.join(counts, Seq("bucket_epoch"), "left")
      .select(col("bucket_epoch"),
        coalesce(col("n"), lit(0L)).as("cnt"),
        col("n").isNull.as("filled"))
      .orderBy(col("bucket_epoch"))
  }

  /** A3 — per-category × 5-min count from the *event-time* header
    * (TimedUtils.scala:74-112; category defaulting P7 folded in). */
  def categoryWindowCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"),
        Headers.categoryOrDefault(col("event_type")).as("category"))
      .agg(count(lit(1)).as("cnt"),
           max(Times.epochSeconds(col("ts"))).as("last_update_epoch"))
      .orderBy(col("bucket_epoch"), col("category"))

  /** A6 — max update timestamp per category (the `TimestampCount.timestamp`
    * overwrite, TimedUtils.scala:126-133). */
  def maxTsPerCategory(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"))
      .agg(max(Times.epochSeconds(col("ts"))).as("last_epoch"),
           count(lit(1)).as("cnt"))
      .orderBy(col("category"))

  /** The `hive_sink_detail` bookkeeping table synthesized from events —
    * one row per (logdate, hostname), as each sink host writes on close
    * (`callback/UpdateSinkDetailCallback.scala:29-58`). Hostname is derived
    * deterministically from `user_id` to model a 5-host fleet. */
  def sinkDetail(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        Times.logdate(col("ts")).as("logdate"),
        concat(lit("host"), (col("user_id") % 5).cast("string")).as("hostname"))
      .agg(count(lit(1)).as("receivecount"),
           count(lit(1)).as("sinkcount"),
           max(Times.epochSeconds(col("ts"))).as("updatetime"))
      .withColumn("name", lit("sink"))
      .withColumn("state", lit("NEW"))

  /** A5 — the completeness check: logdates reported by ≥ `n` hosts
    * (GROUP BY + HAVING, `dao/HiveSinkDetailDao.scala:42-61`; threshold =
    * online-server count from ZK, `HiveBatchedSink.scala:187`). Works over
    * any detail source — the synthesized table here, or a JDBC read
    * (sources/Bookkeeping) like the reference's real deployment. */
  def completenessOf(detail: DataFrame, n: Int): DataFrame =
    detail
      .where(col("state") === "NEW" && col("name") === "sink")
      .groupBy(col("logdate"))
      .agg(countDistinct(col("hostname")).as("n_hosts"),
           sum(col("sinkcount")).as("total_sunk"))
      .where(col("n_hosts") >= n)
      .orderBy(col("logdate"))

  def completeness(spark: SparkSession, sfDir: String, n: Int = 5): DataFrame =
    completenessOf(sinkDetail(spark, sfDir), n)

  /** T7 — upsert semantics (exists ? UPDATE : INSERT,
    * `dao/HiveSinkDetailDao.scala:73-98`): latest row per key wins.
    * Keys = (user_id, event_type); latest by (ts, event_id). At scale this
    * is one shuffle on the key — the MERGE pattern for a snapshot table. */
  def upsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        Times.epochSeconds(col("ts")).as("last_epoch"),
        col("value").as("last_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** A7 — distinct counting: exact per category. */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           countDistinct(col("event_id")).as("n_events"))
      .orderBy(col("category"))

  /** A7 — approximate distinct (HLL++). Engine-value differs from any
    * oracle by construction → rows-only check. At 100 TB this is the only
    * sane distinct-user count: fixed-size sketch, no shuffle of raw ids. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("category"))

  /** A12 — mergeable distinct-count sketches (Apache DataSketches HLL via
    * Spark's native `hll_sketch_agg`/`hll_union_agg`): per-category user
    * sketches plus an ALL row built by UNIONING the category sketches —
    * never re-scanning the input. This is the incremental/cross-run form
    * a7b's one-shot `approx_count_distinct` cannot give: at 100 TB a
    * pipeline persists the per-partition/per-run sketch *binaries* (a few
    * KB each) and answers corpus-wide cardinality by sketch union alone —
    * the same only-new-work pattern as x16's fingerprint index. A spec
    * pins union-associativity (unioned ALL == direct whole-table sketch)
    * and the estimate's error envelope; no DuckDB oracle by design (the
    * estimator is library-specific). */
  def hllSketchUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val perCat = Tables.events(spark, sfDir)
      .groupBy(Headers.categoryOrDefault(col("event_type")).as("category"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val per = perCat.select(col("category"),
      hll_sketch_estimate(col("sk")).as("est_users"))
    val all = perCat
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
      .select(lit("ALL").as("category"),
        hll_sketch_estimate(col("sk")).as("est_users"))
    per.unionByName(all).orderBy(col("category"))
  }

  /** A11 — the reference's `TimestampCount` accumulator (count + latest
    * event ts per category, `util/TimedUtils.scala:40-56`) as ONE native
    * Catalyst aggregate ([[graft.expressions.CountMax]]): the fused-buffer
    * UDAF shape, codegen'd, with map-side partial merge standing in for the
    * reference's lock-guarded pairwise map merging. Also SQL-registered as
    * `graft_count_max` via [[graft.GraftExtensions]]. */
  def countMaxPerCategory(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val cm = bridge.column(
      graft.expressions.CountMax(bridge.expression(col("ts")))
        .toAggregateExpression()).as("cm")
    Tables.events(spark, sfDir)
      .groupBy(Headers.categoryOrDefault(col("event_type")).as("category"))
      .agg(cm)
      .select(col("category"), col("cm.cnt").as("n_events"),
        Times.epochSeconds(col("cm.max_ts")).as("max_epoch"))
      .orderBy(col("category"))
  }
}
