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

  /** The (trail, minN, k) triple of the a2e/t16 anomaly monitor — the ONE
    * source of truth shared by [[anomalyFlags]]' defaults,
    * [[graft.streaming.StreamingIngest.streamAnomalyFlags]], and the
    * DuckDB oracle `a2eOracleSql` interpolates (`ROWS BETWEEN trail
    * PRECEDING`, `tn >= minN`, `k² *`): drifting any one of the three
    * copies used to silently break the stream==batch differential or the
    * hash oracle, so now there are no copies. */
  val AnomalyTrail: Int = 4
  val AnomalyMinN: Long = 3L
  val AnomalyK: Long = 3L

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

  /** A2c — HOPPING (sliding) window counts: 10-minute windows sliding
    * every 5 minutes via the native `window(ts, size, slide)` operator —
    * the overlapping-window generalization of A2's tumbling buckets (the
    * reference's counters are tumbling-only, `util/TimedUtils.scala:45`;
    * a monitoring read of the same state wants the smoothed hop view).
    * Each event lands in exactly size/slide = 2 windows; Spark expands
    * them *before* the aggregate, so the plan is explode → one hash
    * aggregation on the window struct — partial-aggregable, state bounded
    * by the time range, no extra shuffle vs the tumbling form. Output
    * keys are the window's epoch bounds so the oracle can restate the
    * expansion with pure integer floor arithmetic. */
  def hoppingCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"),
           countDistinct(col("user_id")).as("n_users"))
      .select(
        Times.epochSeconds(col("w.start")).as("win_start"),
        Times.epochSeconds(col("w.end")).as("win_end"),
        col("cnt"), col("n_users"))
      .orderBy(col("win_start"))

  /** A2d — per-category interpolated dense timeline: the time-series
    * resample pass. [[denseTimeline]] zero-fills the global grid; a
    * monitor reading *per-category* rates wants holes bridged between the
    * neighboring observations instead (a silent 5-min bucket between two
    * busy ones is far more likely missing data than a true zero — the
    * completeness blind spot the reference's probe exists for). Each
    * category's grid spans its own [min, max] bucket (`sequence` exploded
    * from the per-category range aggregate — O(time-range) rows per
    * category, never event-count); holes take the linear interpolation
    * between the nearest observed neighbors (integer `div`, matching
    * DuckDB `//` — both truncate toward zero), ends clamp to the nearest
    * observation. Both neighbor lookups are GROWING last-ignoreNulls
    * frames (the w8 discipline) — the next-neighbor one over a
    * descending sort, because a genuine `[1 FOLLOWING, UNBOUNDED
    * FOLLOWING)` frame is a shrinking frame that WindowExec recomputes
    * from scratch per row: O(rows²) per category, measured 21 s at sf0.1
    * vs ~2 s for the two-sort linear form. */
  def interpTimeline(spark: SparkSession, sfDir: String): DataFrame =
    interpTimelineOf(Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"),
        Times.bucketEpoch(col("ts"), 300L).as("b"))
      .agg(count(lit(1)).as("cnt")))

  /** [[interpTimeline]] over any `(category, b: bucket-epoch, cnt)`
    * observation relation — the spec entry point for hand-built series. */
  private[graft] def interpTimelineOf(counts: DataFrame): DataFrame = {
    val grid = counts.groupBy(col("category"))
      .agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
      .select(col("category"),
        explode(sequence(col("mn"), col("mx"), lit(300L))).as("b"))
    val prevW = Window.partitionBy(col("category")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // "first observation after" == "last observation before" under the
    // reversed sort — a growing frame both ways, never a shrinking one
    val nextW = Window.partitionBy(col("category")).orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    grid.join(counts, Seq("category", "b"), "left")
      .select(col("category"), col("b"), col("cnt"),
        last(col("cnt"), ignoreNulls = true).over(prevW).as("pv"),
        last(when(col("cnt").isNotNull, col("b")), ignoreNulls = true)
          .over(prevW).as("pb"),
        last(col("cnt"), ignoreNulls = true).over(nextW).as("nv"),
        last(when(col("cnt").isNotNull, col("b")), ignoreNulls = true)
          .over(nextW).as("nb"))
      .select(col("category"), col("b").as("bucket_epoch"),
        col("cnt").isNotNull.as("observed"),
        when(col("cnt").isNotNull, col("cnt"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") +
            expr("(nv - pv) * (b - pb) div (nb - pb)")).as("cnt_filled"))
      .orderBy(col("category"), col("bucket_epoch"))
  }

  /** A2e — trailing-window anomaly flags over the per-category 5-min
    * throughput timeline: the data-quality monitor the reference's
    * counter family feeds (`counter/TimedSinkCounter.scala:33-55`
    * publishes these rates to JMX precisely so an operator can spot a
    * category whose ingest rate jumps). A bucket is flagged when its
    * count deviates from the trailing `trail`-bucket mean by more than
    * `k` standard deviations, with the z-test stated in CROSS-MULTIPLIED
    * integer form — `(n·x − s)² > k²·(n·ss − s²)` over the window's
    * count/sum/sum-of-squares — so no sqrt or division ever runs and the
    * flag is bit-exact on both engines (the x31 fixed-point discipline
    * applied to variance). Warm-up buckets (fewer than `minN` trailing
    * observations) never flag. One sort per category serves all three
    * trailing aggregates (w3's frame discipline); the timeline is
    * per-category-bucket counts — O(categories × time range), partial-
    * aggregable map-side, never event-count rows through the window. */
  def anomalyFlags(spark: SparkSession, sfDir: String,
                   trail: Int = AnomalyTrail, minN: Long = AnomalyMinN,
                   k: Long = AnomalyK): DataFrame =
    anomalyFlagsOf(Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"),
        Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"))
      .agg(count(lit(1)).as("cnt")), trail, minN, k)

  /** [[anomalyFlags]] over any `(category, bucket_epoch, cnt)` timeline —
    * the spec entry point for hand-built series.
    *
    * Every product AND the windowed sum-of-squares run in
    * `decimal(38,0)` — DuckDB promotes the same terms to HUGEINT, and a
    * Long intermediate silently wraps (first at `cnt ≈ 7.6·10⁸` in the
    * cross-products, then at `cnt ≈ 1.5·10⁹` inside `Σcnt²` itself),
    * flipping flags on the engine side only. With 38 digits both sides
    * are exact while `cnt < ~10¹⁷` (the dominant term `trail²·cnt²`
    * needs 2·digits(cnt)+3 ≤ 38) — beyond any physical per-bucket event
    * count, so engine and oracle agree at every reachable scale; a spec
    * pins the engine against a BigInt reference at 10¹⁰-scale counts. */
  private[graft] def anomalyFlagsOf(counts: DataFrame, trail: Int,
                                    minN: Long, k: Long): DataFrame = {
    val tw = Window.partitionBy(col("category")).orderBy(col("bucket_epoch"))
      .rowsBetween(-trail, -1)
    // cast ONE operand of every product so the multiply itself runs in
    // decimal — casting the finished Long product would wrap first
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cntD = col("cnt").cast("decimal(20,0)")
    val dev = dec(col("trail_n")) * col("cnt") - col("trail_s")
    val varN = dec(col("trail_n")) * col("trail_ss") -
      dec(col("trail_s")) * col("trail_s")
    counts
      .withColumn("trail_n", count(col("cnt")).over(tw))
      .withColumn("trail_s", coalesce(sum(col("cnt")).over(tw), lit(0L)))
      .withColumn("trail_ss",
        coalesce(sum(cntD * cntD).over(tw), lit(0L).cast("decimal(38,0)")))
      .select(col("category"), col("bucket_epoch"), col("cnt"), col("trail_n"),
        when(col("trail_n") >= minN && dev * dev > lit(k * k) * varN, 1L)
          .otherwise(0L).as("is_anomaly"))
      .orderBy(col("category"), col("bucket_epoch"))
  }

  /** X64 — ordered funnel conversion over the event stream: view → click
    * → purchase, each step strictly after the previous and within a
    * 72-hour conversion window of it. "First qualifying event after the
    * user's first prior-step event" semantics — the sequential condition
    * a single GROUP BY cannot express, built as three per-user MIN
    * aggregates chained by equi joins on `user_id` (one shuffle key
    * reused end-to-end; each stage is partial-aggregable and the
    * per-step tables only shrink, so the 100 TB plan is three pushed-down
    * scans of one event partition + co-partitioned hash joins on the user
    * dimension). Output: one row per funnel step with the surviving user
    * count and the total step-transition lag in seconds (integer — the
    * conversion-latency numerator a dashboard divides by `users`). */
  def funnelSteps(spark: SparkSession, sfDir: String): DataFrame =
    funnelStepsOf(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        Times.epochSeconds(col("ts")).as("t")))

  /** [[funnelSteps]] over any `(user_id, event_type, t: epoch-seconds)`
    * relation — the spec entry point for hand-built conversion fixtures. */
  private[graft] def funnelStepsOf(ev: DataFrame): DataFrame = {
    val winS = 259200L // 72 h conversion window per step
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t")).as("v_t"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("t") > col("v_t") && col("t") <= col("v_t") + winS)
      .groupBy(col("user_id")).agg(min(col("t")).as("c_t"), min(col("v_t")).as("v_t"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("c_t")), "user_id")
      .where(col("t") > col("c_t") && col("t") <= col("c_t") + winS)
      .groupBy(col("user_id")).agg(min(col("t")).as("p_t"), min(col("c_t")).as("c_t"))
    val s1 = v.agg(count(lit(1)).as("users")).select(
      lit(1L).as("step_no"), lit("view").as("step"), col("users"),
      lit(0L).as("sum_lag_s"))
    val s2 = c.agg(count(lit(1)).as("users"),
      coalesce(sum(col("c_t") - col("v_t")), lit(0L)).as("sum_lag_s"))
      .select(lit(2L).as("step_no"), lit("click").as("step"),
        col("users"), col("sum_lag_s"))
    val s3 = p.agg(count(lit(1)).as("users"),
      coalesce(sum(col("p_t") - col("c_t")), lit(0L)).as("sum_lag_s"))
      .select(lit(3L).as("step_no"), lit("purchase").as("step"),
        col("users"), col("sum_lag_s"))
    s1.unionByName(s2).unionByName(s3).orderBy(col("step_no"))
  }

  /** X65 — cohort retention matrix: users grouped by their first-activity
    * day (the cohort), then for each (cohort, day-offset) cell the
    * distinct users active that day — the classic product-analytics
    * retention triangle, absent from the reference (its completeness
    * probe tracks *partitions*, not user lifecycles). Day numbers are
    * integer epoch-days (`epoch DIV 86400` — positive range, so floor ==
    * truncate and the engine/oracle dialects agree exactly; no calendar
    * functions on either side). Plan: one per-user MIN aggregate, a
    * co-partitioned join back on `user_id`, then the cell aggregate —
    * the cell key space is bounded by (days × days)/2, never the event
    * count, so the second shuffle is O(calendar²) at any volume. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOf(Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(Times.epochSeconds(col("ts")) / 86400L).cast("long").as("d")))

  /** [[cohortRetention]] over any `(user_id, d: epoch-day)` relation. */
  private[graft] def cohortRetentionOf(ev: DataFrame): DataFrame = {
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("cohort_day"), col("day_offset"))
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

  /** X76 — incremental aggregate maintenance (materialized-view delta
    * merge): a per-(category, 5-min-bucket) aggregate is maintained as a
    * stored artifact covering history up to a cut, and an arriving delta
    * is folded in WITHOUT rescanning history — the only way a running
    * aggregate over a 100 TB event log stays affordable (merge cost is
    * O(delta + touched groups), never O(history)). The aggregate state is
    * chosen mergeable: `count` and `max` fold by sum/max of partials, and
    * the value sum is micro-scaled to integers per ROW before any
    * addition (`floor(v·1e6 + 0.5)`), so partial sums are exact longs and
    * the merge is bit-deterministic in any partial order — the same
    * discipline that lets the a2e family carry hash oracles. The oracle
    * is the FULL recompute over base ∪ delta: merged ≡ recomputed is the
    * correctness statement of incremental view maintenance itself.
    * Scale posture: the base artifact is read back from storage (never
    * recomputed — here a per-invocation scratch dir, deployment-mapped to
    * the view's table); the source is the DAY-PARTITIONED landing
    * ([[Maintenance.landedEvents]] — in deployment, the table the
    * ingest path already maintains), so the delta cut reaches the scan as
    * PARTITION pruning (`PartitionFilters` on `logday`, PlanSpec-pinned)
    * plus an exact `es` refinement — robust to the fixture's nanos-as-long
    * `ts`, whose derived timestamp no engine can push (the round-12 form's
    * conceded fallback). The merge groupBy shuffles only the two partial
    * relations, whose size is O(groups), not O(events). The cut is one
    * bounded 1-row stats fetch (the x20 literal-reentry idiom). */
  def aggDeltaMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Maintenance.landedEvents(spark, sfDir)
    val bounds = src.agg(min(col("es")), max(col("es"))).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val cut = mn + 2 * ((mx - mn) / 3) // integer arithmetic — both dialects agree
    // day-granular partition cut + exact es refinement: `es >= cut` implies
    // `logday >= day(cut)` (and dually for the base side), so the redundant
    // logday conjunct changes no row, only prunes partitions
    val cutDay = Maintenance.dayLitOfEpoch(cut)
    // the maintained artifact: the pre-cut aggregate lives in storage and
    // is READ, not recomputed — the whole point of the operator
    val store = graft.Tables.scratchDir("graft_aggview_").toString
    Maintenance.partial(src.where(col("logday") <= cutDay && col("es") < cut))
      .write.mode("overwrite").parquet(store)
    val base = spark.read.parquet(store)
    val delta = Maintenance.partial(
      src.where(col("logday") >= cutDay && col("es") >= cut))
    base.unionByName(delta)
      .groupBy(col("category"), col("bucket"))
      .agg(sum(col("n_events")).as("n_events"), max(col("max_es")).as("max_es"),
        sum(col("sum_value_micro")).as("sum_value_micro"))
      .orderBy(col("category"), col("bucket"))
  }
}
