package graft.operators

import graft.Tables
import graft.functions.{Num, Times}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M3 — the relational operator surface (SURVEY.md §2.4-2.7).
  *
  * Absent in the reference (its only relational artifact is the bookkeeping
  * GROUP BY/HAVING, `/root/reference/.../dao/HiveSinkDetailDao.scala:42-61`);
  * the engine exposes Spark's full join/window/sort/set surface and
  * demonstrates each over the fixture star schema, with the physical
  * strategy chosen deliberately:
  *   - fact⋈fact → shuffle (sort-merge/shuffled-hash, Catalyst+AQE pick)
  *   - fact⋈dim  → `broadcast(dim)` so the 100 TB side never shuffles
  *   - non-equi  → broadcast nested-loop with the small side broadcast
  *   - top-k     → `TakeOrderedAndProject` (no global sort materialized)
  */
object Relational {

  /** Exact decimal revenue term (order-independent; see Num). */
  private def revenue: Column = Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  // ---- Joins -------------------------------------------------------------

  /** J1 — fact⋈fact equi inner join + aggregation (shuffle join: both sides
    * large at scale, AQE may convert to broadcast at small SF). */
  def innerJoinAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), revenue.as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** J2 — explicit broadcast join against a dim (no shuffle of lineitem). */
  def broadcastJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))

  /** J3 — left outer join preserving customers with no orders. */
  def leftJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** J4 — left semi (EXISTS): customers that placed a high-value order. */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, sfDir).where(col("o_totalprice") > 100000.0)
    Tables.customer(spark, sfDir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** J5 — left anti (NOT EXISTS): customers with no high-value order. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, sfDir).where(col("o_totalprice") > 100000.0)
    Tables.customer(spark, sfDir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** J6 — multiway star join (TPC-H Q5 shape): one shuffle join between the
    * facts, every dim broadcast; revenue per region/nation. */
  def starJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** J7 — theta/range join, quantized into an equi-join with aggregation
    * pushed below it. The naive plan (`l_quantity BETWEEN p_size-1 AND
    * p_size+1`, no equi key) is a BroadcastNestedLoopJoin —
    * O(|lineitem|·|part|), 174 s at sf0.1 and quadratic in sf. Two
    * rewrites compose here:
    *  1. *Quantize*: the range has bounded integer width, so each part row
    *     explodes into its 3 covering integer keys and the join becomes an
    *     equi-join on `floor(l_quantity) = qkey` (floor is single-valued —
    *     no pair double-counted) with the range predicate as residual.
    *  2. *Pre-aggregate*: the query only needs per-brand match *counts*,
    *     and l_quantity has bounded distinct values (integral 1..50), so
    *     lineitem first collapses to (quantity → count) — a map-side-
    *     combined aggregate that turns 600 k probe rows into ≤ 50 — and
    *     the join multiplies counts instead of enumerating the ~7×10⁸
    *     matching pairs (which made even a hash join take 110 s).
    * Result: one scan of each table, a broadcast hash join over tiny
    * inputs, linear at any scale. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val qtyCounts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_quantity")).agg(count(lit(1)).as("qty_cnt"))
    val partKeys = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_size"),
        explode(array(col("p_size") - 1, col("p_size"), col("p_size") + 1)).as("qkey"))
    partKeys
      .join(broadcast(qtyCounts),
        floor(col("l_quantity")).cast("int") === col("qkey") &&
          col("l_quantity") >= col("p_size") - 1 && col("l_quantity") <= col("p_size") + 1)
      .groupBy(col("p_brand"))
      .agg(sum(col("qty_cnt")).as("n_matches"))
      .orderBy(col("p_brand"))
  }

  /** J9 — right outer join: every supplier retained even with no qualifying
    * lineitems (nulls aggregate to 0 / null). Lineitem is filtered so some
    * suppliers genuinely have no match — exercising the preserved side. */
  def rightJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).where(col("l_quantity") > 30.0)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"), "right")
      .groupBy(col("s_suppkey"))
      .agg(count(col("l_orderkey")).as("n_items"),
           max(Times.epochSeconds(col("l_shipdate"))).as("last_ship_epoch"))
      .orderBy(col("s_suppkey"))

  /** J10 — full outer join between two date-keyed aggregates: order days
    * and ship days only partially overlap, so both null sides appear. A
    * shuffle hash/sort-merge join on the date key — no BNL. */
  def fullJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("d")).agg(count(lit(1)).as("n_orders"))
    val b = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").as("d2")).agg(Num.dsum(col("l_quantity")).as("day_qty"))
    a.join(b, col("d") === col("d2"), "full")
      .select(Times.epochSeconds(coalesce(col("d"), col("d2"))).as("day_epoch"),
        col("n_orders"), col("day_qty"))
      .orderBy(col("day_epoch"))
  }

  /** J11 — skew-salted equi-join, two-phase hot/cold form: the manual
    * remedy when a few join keys are hot enough that single reducers own
    * the shuffle (AQE's skew-join split is the first lever; salting is the
    * explicit form that also works for aggregations and older runtimes).
    *
    * Phase 1 finds candidate hot keys from a *sampled* probe-side key
    * histogram — the top `maxHot` keys by sampled frequency. That set is
    * bounded metadata (≤ 64 longs), so it is fetched to the driver once and
    * inlined as an `isin` literal — the alternative (joining the hot-key DF
    * against both sides) re-evaluated the sample subtree once per tag site.
    * Phase 2 splits both sides on hot-key membership: hot probe rows
    * scatter across `salts` sub-keys and only the hot build rows replicate
    * `salts`× (not the whole fact table — the round-2 design flaw); cold
    * rows take the plain equi-join. Every probe row still meets every
    * matching build row exactly once, for *any* hot-key set, so the result
    * ≡ the plain join — which is what the oracle checks — while the
    * replication cost is `salts · |hot keys|` rows. */
  def saltedSkewJoin(spark: SparkSession, sfDir: String, salts: Int = 8,
                     maxHot: Int = 64): DataFrame = {
    // bounded driver fetch: ≤ maxHot keys from a 5% sample, metadata-sized
    val hot = Tables.lineitem(spark, sfDir)
      .sample(withReplacement = false, 0.05, seed = 42L)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l_orderkey"))
      .limit(maxHot)
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSeq
    val probe = Tables.lineitem(spark, sfDir)
    val build = Tables.orders(spark, sfDir)
    val term = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val plainCold = probe.where(!col("l_orderkey").isin(hot: _*))
      .join(build.where(!col("o_orderkey").isin(hot: _*)),
        col("l_orderkey") === col("o_orderkey"))
    val joined =
      if (hot.isEmpty) plainCold.select(col("o_orderpriority"), term.as("rev_term"))
      else {
        val hotJoined = probe.where(col("l_orderkey").isin(hot: _*))
          .withColumn("psalt", pmod(xxhash64(col("l_linenumber")), lit(salts)))
          .join(build.where(col("o_orderkey").isin(hot: _*))
              .withColumn("bsalt", explode(array((0 until salts).map(i => lit(i.toLong)): _*))),
            col("l_orderkey") === col("o_orderkey") && col("psalt") === col("bsalt"))
        hotJoined.select(col("o_orderpriority"), term.as("rev_term"))
          .union(plainCold.select(col("o_orderpriority"), term.as("rev_term")))
      }
    joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), Num.dsum(col("rev_term")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** J8 — as-of join: for each purchase event, the most recent error event
    * by the same user at-or-before it. Implemented the scalable way — a
    * single sort within user partitions + `last(_, ignoreNulls)` carry-
    * forward — not a per-row range probe (which would be O(n·m) at 100 TB).
    * Errors sort before purchases at equal ts so "≤" semantics hold. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "error", Times.epochSeconds(col("ts"))).as("err_epoch"),
        when(col("event_type") === "error", lit(0)).otherwise(lit(1)).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_error_epoch", last(col("err_epoch"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_error_epoch"))
      .orderBy(col("event_id"))
  }

  /** J8b — the same as-of semantics as [[asofJoin]], planned through the
    * engine's NATIVE operator (`plans.AsOfJoinPlan` → `AsOfJoinExec`): one
    * co-partitioning exchange per side, then a per-partition streaming
    * merge with O(1) carried state — no union, no window machinery. The
    * declared form applies the purchase filter ABOVE the join on purpose:
    * the injected `PushFilterThroughAsOf` rule is what moves it below
    * (custom operators are opaque to the builtin pushdown), and PlanSpec
    * asserts it arrived. Shares j8's oracle — same rows, two plans. */
  def asofJoinNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // fresh aliases on both sides: the two subtrees come from one scan, and
    // distinct exprIds keep the custom binary node's sides unambiguous
    val lefts = ev.select(col("event_id").as("event_id"),
      col("user_id").as("user_id"), col("ts").as("l_ts"),
      col("event_type").as("l_type"))
    val rights = ev.where(col("event_type") === "error")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        Times.epochSeconds(col("ts")).as("err_epoch"))
    graft.plans.AsOfJoin(lefts, rights,
        lefts("user_id"), rights("r_user"), lefts("l_ts"), rights("r_ts"),
        rights("err_epoch"), as = "last_error_epoch")
      .where(col("l_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_error_epoch"))
      .orderBy(col("event_id"))
  }

  /** J12 — bucket-co-located join: both fact tables are WRITTEN bucketed on
    * the join key (8 buckets, one file per bucket, sorted within), so the
    * join consumes bucket-aligned scans directly — ZERO Exchange on either
    * side, the pre-shuffle trade a warehouse makes for its hottest join key
    * at 100 TB: pay the partitioning once at ingest, never again for any
    * join/agg on that key. The bucketed write runs once per (session,
    * sfDir) — the amortized ingest step, kept inside the query so the
    * declared entry is self-contained. `repartition(n, key)` before
    * `bucketBy(n, key)` uses the same murmur3 `HashPartitioning`, so each
    * task holds exactly one bucket → one file per bucket, which is what
    * lets the scan's per-bucket sort order feed the merge join without a
    * Sort either. MERGE hint pins sort-merge (at fixture scale Catalyst
    * would otherwise broadcast and the co-location would demo nothing);
    * PlanSpec asserts the join subtree is Exchange-free. */
  /** The one-time bucketed-table ingest behind j12, callable from Bench's
    * index prebuild: at 100 TB the bucketed copy IS the maintained layout
    * (pay the shuffle once at ingest; every subsequent join is
    * exchange-free), so its cost belongs on the index_build line, not
    * inside the join measurement. Idempotent per session via the catalog
    * check. */
  def ensureBucketTables(spark: SparkSession, sfDir: String,
                         buckets: Int = 8): (String, String) = {
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    def ensureBucketed(name: String, df: DataFrame, key: String): String = {
      val table = s"graft_b${buckets}_${name}_$tag"
      if (!spark.catalog.tableExists(table)) {
        // the catalog is per-session but the warehouse directory is not: a
        // prior session's managed-table dir is debris that fails CTAS with
        // LOCATION_ALREADY_EXISTS — remove it (content is derivable from
        // the immutable source parquet, so this loses nothing)
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table)
        val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
        df.repartition(buckets, col(key))
          .write.bucketBy(buckets, key).sortBy(key)
          .format("parquet").mode("overwrite").saveAsTable(table)
      }
      table
    }
    (ensureBucketed("lineitem", Tables.lineitem(spark, sfDir), "l_orderkey"),
      ensureBucketed("orders", Tables.orders(spark, sfDir), "o_orderkey"))
  }

  def bucketJoin(spark: SparkSession, sfDir: String, buckets: Int = 8): DataFrame = {
    val (lt, ot) = ensureBucketTables(spark, sfDir, buckets)
    spark.table(lt).hint("merge")
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  // ---- Window functions ----------------------------------------------------

  /** W1 — ranking: top-3 customers by revenue within each market segment.
    * Revenue is decimal-exact so ranks are deterministic; remaining ties
    * broken by custkey. */
  def rankPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val custRev = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(Num.dsum(col("o_totalprice")).as("cust_rev"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cust_rev").desc, col("c_custkey"))
    custRev.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("cust_rev"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  /** W2 — lag/lead: seconds since previous / until next event per user. */
  def lagLead(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        Times.epochSeconds(col("ts")).as("epoch"))
      .withColumn("gap_prev", col("epoch") - lag(col("epoch"), 1).over(w))
      .withColumn("gap_next", lead(col("epoch"), 1).over(w) - col("epoch"))
      .drop("ts")
      .orderBy(col("event_id"))
  }

  /** W3 — running (cumulative) sum per supplier over ship order. Summed in
    * decimal so the running values are exact at any partitioning. */
  def runningSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .withColumn("running_qty", sum(Num.dsumCast(col("l_quantity"))).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        Times.epochSeconds(col("l_shipdate")).as("ship_epoch"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("ship_epoch"), col("l_orderkey"), col("l_linenumber"))
  }

  /** W5 — the distribution analytics: percent_rank + cume_dist of each
    * order's price within its priority class. Partitioned window (one
    * shuffle on the partition key, no global stage); ties broken by
    * o_orderkey so both engines rank identically; rounded so the float
    * division is hash-comparable cross-engine. */
  def percentRankDist(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("o_orderkey"))
  }

  /** W7 — full-frame positional analytics: every order annotated with its
    * priority group's best and second-best price (`first_value` /
    * `nth_value(·, 2)` over an explicit UNBOUNDED..UNBOUNDED ROWS frame)
    * and its gap to the best — the leaderboard-context projection
    * (how far is this row from its group's top) that rank() alone cannot
    * give. Selected values, not aggregates: exact doubles on both
    * engines, ties broken by o_orderkey. */
  def nthValueFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("best_price", first_value(col("o_totalprice")).over(w))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
      .withColumn("gap_to_best", round(col("best_price") - col("o_totalprice"), 2))
      .orderBy(col("o_orderkey"))
  }

  /** W6 — time-RANGE frame analytics: per user, events and value-sum in
    * the trailing 10 minutes *of event time* (RANGE BETWEEN 600 PRECEDING
    * AND CURRENT ROW over the epoch-second order key), the sliding-window
    * form a rate limiter or anomaly scorer runs. Unlike the ROWS frame
    * (w3), the RANGE frame is value-based: ties share a frame and sparse
    * regions shrink it. Partitioned by user — one hash shuffle, no global
    * stage; per-partition frames evaluate in one sorted pass. */
  def rangeWindowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch"))
      .rangeBetween(-600L, 0L)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        Times.epochSeconds(col("ts")).as("epoch"), col("value"))
      .withColumn("n_10min", count(lit(1)).over(w))
      .withColumn("sum_10min", round(sum(col("value")).over(w), 6))
      .orderBy(col("event_id"))
  }

  /** W4 — ntile + dense_rank over customer balances, in the scalable
    * two-phase form ([[globalRowNumbers]], shared with [[ntileScalable]]):
    * no single-partition Window anywhere in the declared plan. The
    * `drnk` column is the global row number, which IS the dense rank
    * here by the window's own sort spec: the key ends in the unique
    * `c_custkey` tiebreak, so consecutive rows never compare equal and
    * `dense_rank ≡ row_number` — a structural property of the query
    * (any ORDER BY terminating in a key column has it), not a data
    * assumption, and the DuckDB oracle's true `dense_rank()` re-checks
    * the equivalence by hash every round. The original global-window
    * form lives on as [[ntileRankGlobalWindow]], a spec-only exhibit. */
  def ntileRank(spark: SparkSession, sfDir: String): DataFrame = {
    val (ranked, total) = globalRowNumbers(spark, sfDir)
    ranked.select(col("c_custkey"), col("c_acctbal"),
        ntileExpr(col("rn"), total, 4).as("quartile"), col("rn").as("drnk"))
      .orderBy(col("c_custkey"))
  }

  /** The retired exact-oracle form of [[ntileRank]]: `Window.orderBy`
    * with no partition, which moves the whole table through ONE task —
    * correct, and the shape the scalable form is differentially pinned
    * against in the spec, but never part of the declared surface (it
    * was the plan-guardrail allowlist's last data-sized entry). */
  private[graft] def ntileRankGlobalWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .orderBy(col("c_custkey"))
  }

  /** SQL NTILE(k) of a global row number `rn` ∈ [1..total]: the first
    * `total mod k` tiles hold ⌈total/k⌉ rows, the rest ⌊total/k⌋.
    * (NOT the equal-width `floor((rn-1)k/total)+1` — that only coincides
    * when k divides total; a property test caught the difference.) Double
    * division + floor is exact here: numerators are exact integers and a
    * true non-integer quotient sits ≥ 1/total from the nearest integer,
    * far beyond one ulp. */
  private[graft] def ntileExpr(rn: Column, total: Long, k: Int): Column = {
    val q = total / k
    val r = total % k
    if (q == 0) rn.cast("long") // k ≥ total: one row per tile
    else {
      val big = (q + 1) * r // rows covered by the oversized tiles
      when(rn <= big, floor((rn - 1) / lit((q + 1).toDouble)) + 1)
        .otherwise(floor((rn - big - 1) / lit(q.toDouble)) + r + 1)
        .cast("long")
    }
  }

  /** W4b — the 100 TB path for global ntile. `Window.orderBy` with no
    * partition (W4) moves the whole table to one task; here the exact same
    * quartile assignment is computed in two distributed phases:
    * range-partition on the sort key, local row_number per partition, then
    * global row number = local + cumulative partition counts (a
    * metadata-sized driver array, not data), and tile = [[ntileExpr]] of
    * that row number. No single-partition stage anywhere, so it survives
    * any scale-up. */
  def ntileScalable(spark: SparkSession, sfDir: String, k: Int = 4, parts: Int = 32): DataFrame = {
    val (ranked, total) = globalRowNumbers(spark, sfDir, parts)
    ranked.select(col("c_custkey"), col("c_acctbal"),
        ntileExpr(col("rn"), total, k).as("quartile"))
      .orderBy(col("c_custkey"))
  }

  /** Customers with their GLOBAL row number `rn` under
    * `ORDER BY c_acctbal DESC, c_custkey` — the shared two-phase engine
    * of [[ntileRank]] and [[ntileScalable]]: range-partition on the sort
    * key, local row_number per partition, then global row number = local
    * + cumulative partition counts (a metadata-sized driver array, not
    * data). No single-partition stage anywhere, so it survives any
    * scale-up. Returns the ranked frame and the total row count. */
  private def globalRowNumbers(spark: SparkSession, sfDir: String,
                               parts: Int = 32): (DataFrame, Long) = {
    val sortKeys = Seq(col("c_acctbal").desc, col("c_custkey").asc)
    // Memoized persist before anything reads `local` twice: range-partition
    // boundaries come from seeded reservoir sampling keyed to the RDD id,
    // so two *separate executions* of this plan may assign rows to
    // different partitions — offsets computed by the first run would then
    // mislabel rows in the second. Materializing once pins a single
    // partitioning for both the counts job and the returned projection;
    // the session-scoped registry (vs a bare persist) means repeated calls
    // reuse one cached copy instead of leaking one per invocation.
    val local = DfCache.memoize(spark, s"ntile:$sfDir:$parts") {
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_acctbal"))
        .repartitionByRange(parts, sortKeys: _*)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn",
          row_number().over(Window.partitionBy(col("pid")).orderBy(sortKeys: _*)))
    }
    // partition counts: bounded by `parts`, i.e. metadata, not data
    val counts = local.groupBy(col("pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = { var acc = 0L; counts.map { case (pid, c) => val o = (pid, acc); acc += c; o } }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    (local.join(broadcast(offDf), "pid")
      .withColumn("rn", col("off") + col("lrn")), total)
  }

  // ---- Sorts / limits / top-k / set ops -----------------------------------

  /** S1 — top-k: plans TakeOrderedAndProject (per-partition heap + driver
    * merge — no global sort even at 100 TB). */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  /** S2 — union (distinct, via the set-op contract): customers in the top
    * revenue set ∪ customers with urgent orders. */
  def unionSets(spark: SparkSession, sfDir: String): DataFrame = {
    val a = highValueCust(spark, sfDir)
    val b = urgentCust(spark, sfDir)
    a.union(b).distinct().orderBy(col("custkey"))
  }

  /** S3 — intersect (ANSI INTERSECT semantics = distinct). */
  def intersectSets(spark: SparkSession, sfDir: String): DataFrame =
    highValueCust(spark, sfDir).intersect(urgentCust(spark, sfDir)).orderBy(col("custkey"))

  /** S4 — except (ANSI EXCEPT semantics = distinct). */
  def exceptSets(spark: SparkSession, sfDir: String): DataFrame =
    highValueCust(spark, sfDir).except(urgentCust(spark, sfDir)).orderBy(col("custkey"))

  /** J14 — temporal dimension lookup: join facts to the [[scd2Priority]]
    * SCD-2 dimension AT EVENT TIME — each lineitem resolves the priority
    * its customer had when the item SHIPPED (which may differ from the
    * order-time priority if it changed in between). The standard
    * "dimension as of the fact's timestamp" pattern every warehouse runs
    * against SCD-2 tables, composed entirely from the engine's own
    * operators (j13 builds the dim, this resolves against it).
    *
    * Shape: equi hash join on `custkey` (never a range/theta join — the
    * interval predicate is a post-join filter), then one windowed
    * keep-latest per fact. Fan-out is bounded by the customer's version
    * count (its change history), so the join stays O(facts · versions/key)
    * with no skew cliff; ties from zero-length same-day versions are
    * broken by the version number (latest change wins). */
  def temporalDimJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2Priority(spark, sfDir)
      .select(col("o_custkey").as("d_custkey"), col("version"),
        col("priority"), col("valid_from"))
    // the synthetic lineitem repeats (orderkey, linenumber) with different
    // shipdates, so the fact identity is the full (okey, line, ship) triple
    // — distinct'd, or the keep-latest window would mix different facts
    val facts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Times.epochSeconds(col("l_shipdate")).as("ship_epoch"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey").as("custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .drop("o_orderkey")
      .distinct()
    val byFact = Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"), col("ship_epoch"))
      .orderBy(col("valid_from").desc, col("version").desc)
    facts.join(dim,
        col("custkey") === col("d_custkey") && col("valid_from") <= col("ship_epoch"))
      .withColumn("rk", row_number().over(byFact))
      .where(col("rk") === 1)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
        col("custkey"), col("ship_epoch"),
        col("priority").as("priority_at_ship"), col("version"))
      .orderBy(col("l_orderkey"), col("linenumber"))
  }

  /** S7 — multiset (bag) algebra: `INTERSECT ALL` / `EXCEPT ALL` over the
    * NON-distinct custkey multisets (multiplicity = qualifying orders per
    * customer), tagged and unioned into one result. ANSI ALL semantics:
    * intersect keeps min(m_a, m_b) copies, except keeps max(m_a − m_b, 0) —
    * the multiplicity-aware forms s3/s4's set versions collapse. Spark
    * plans both as a single aggregate-join (count per key on each side,
    * then replicate) — no row-by-row matching, scale-safe. */
  def multisetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.orders(spark, sfDir).where(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("custkey"))
    val b = Tables.orders(spark, sfDir).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
      .orderBy(col("op"), col("custkey"))
  }

  /** S5 — pivot: long→wide reshaping with an explicit value list (order
    * status per priority). The explicit list matters at scale: without it
    * Spark runs a distinct-values job first AND the output schema becomes
    * data-dependent — both wrong for a production pipeline. One hash
    * aggregate; absent combinations surface as 0, not null, so the wide
    * table is directly consumable. */
  def pivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val statuses = Seq("F", "O", "P")
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
      .select(col("o_orderpriority") +: statuses.map(s =>
        coalesce(col(s), lit(0L)).as(s"n_$s")): _*)
      .orderBy(col("o_orderpriority"))
  }

  /** S6 — unpivot (melt): wide→long, the inverse of [[pivotCounts]] —
    * composing the two round-trips the reshaping. Pure per-row expansion
    * (a generator, no shuffle beyond the source aggregate). */
  def unpivotCounts(spark: SparkSession, sfDir: String): DataFrame =
    pivotCounts(spark, sfDir)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("n_F"), col("n_O"), col("n_P")), "status", "n")
      .orderBy(col("o_orderpriority"), col("status"))

  private def highValueCust(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).where(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("custkey")).distinct()

  private def urgentCust(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey")).distinct()

  // ---- Grouping sets -------------------------------------------------------

  /** A8 — rollup over (returnflag, linestatus); subtotal rows surfaced with
    * an explicit ALL sentinel so the output is engine-portable. */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** A9 — cube over (orderstatus, orderpriority). */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  /** A10 — explicit GROUPING SETS {(returnflag), (linestatus), ()}: the
    * third grouping-set form SURVEY §2.3/A7 names beside rollup/cube —
    * per-flag and per-status marginals plus the grand total in one pass
    * (one expand + one hash aggregate, same scale shape as rollup). */
  def groupingSetsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  // ---- Scalar function surface (§2.7) --------------------------------------

  /** F1 — string functions over part names. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        lower(col("p_name")).as("lname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "^([A-Za-z]+)", 1).as("first_word"))
      .orderBy(col("p_partkey"))

  /** F2 — date/time functions over orders. */
  def datetimeFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        Times.epochSeconds(col("o_orderdate")).as("order_epoch"))
      .orderBy(col("o_orderkey"))

  /** F3 — math functions (IEEE-deterministic subset). */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        (col("l_orderkey") % 7).cast("long").as("key_mod"),
        round(col("l_extendedprice") * col("l_quantity"), 2).as("gross"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F4 — array higher-order functions over embeddings (see also
    * Similarity for the full dot-product path). */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(v, 1), 6).as("first_val"),
        round(aggregate(v, lit(0.0), (acc, x) => acc + x * x), 6).as("sq_norm"),
        round(aggregate(v, lit(0.0), (acc, x) => acc + x) / size(col("embedding")), 6).as("mean_val"),
        size(filter(v, x => x > 0.0)).cast("long").as("n_positive"))
      .orderBy(col("vec_id"))
  }

  /** F5 — JSON function surface over the events `props` column (P6's
    * inverse direction — the reference only ENCODES JSON,
    * `util/TimedUtils.scala:51-53`; a query engine must also parse it).
    * The 100 TB shape: **parse `props` ONCE** (`from_json` to a string map)
    * and derive every per-key column from the parsed value — `k_num` by
    * cast, `n_keys` from `map_keys`, the `json_tuple`-equivalent `jt_k` by
    * lookup. The one remaining `get_json_object` is the path-API demo on
    * the `to_json(struct(...))` → extract round trip, which proves
    * encode/decode agree — it parses the tiny *constructed* JSON, never
    * `props`. Round 5 parsed `props` five times — one per API — and
    * round 6 still paid a second full `props` parse for the standalone
    * path extraction (profiled at half the query: 3.3 s → 1.65 s at
    * sf0.1 when `k_str` reads the shared map instead — identical values:
    * JSON scalars arrive in string form either way). */
  def jsonFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val m = from_json(col("props"), "map<string,string>",
      Map.empty[String, String])
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        element_at(m, "k").as("k_str"),
        element_at(m, "k").try_cast("long").as("k_num"),
        size(map_keys(m)).cast("long").as("n_keys"),
        get_json_object(
          to_json(struct(col("event_id").as("id"),
            coalesce(col("event_type"), lit("no_category")).as("cat"))),
          "$.cat").as("rt_cat"),
        element_at(m, "k").as("jt_k"))
      .orderBy(col("event_id"))
  }

  /** F6 — map function surface (the engine side of §2.7's "array/map
    * functions absent in reference"): `from_json` to a map (the
    * schema-free sibling of f5's struct projection — right when keys are
    * dynamic), `map_from_arrays` construction, `map_concat` merge, key
    * lookup via `element_at`, `map_contains_key`, `map_keys`/`map_values`,
    * and a `transform_values` higher-order rewrite. All fused with the
    * scan (pure column expressions); outputs are plain values so the
    * oracle states results, not map layout.
    *
    * Parse semantics are pinned per-KEY, not per-row: the map parses to
    * STRING values and `k` is try_cast afterwards (nulls the one bad
    * value, mirrored by the oracle's TRY_CAST), where a
    * direct `map<string,bigint>` parse would null the ENTIRE map on any
    * uncoercible value (PERMISSIVE mode) with no DuckDB equivalent; and
    * `has_k` means key-exists (true for a JSON null value), matching
    * `list_contains(json_keys(...))` on the oracle side — both previously
    * held only because the fixture never exercised them. */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val propsMap = from_json(col("props"), "map<string,string>",
      Map.empty[String, String])
    val builtMap = map_concat(
      map_from_arrays(array(lit("id")), array(col("event_id"))),
      map_from_arrays(array(lit("uid")), array(col("user_id"))))
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        element_at(propsMap, "k").try_cast("long").as("k_val"),
        map_contains_key(propsMap, "k").as("has_k"),
        size(map_keys(propsMap)).cast("long").as("n_keys"),
        element_at(builtMap, "uid").as("uid_val"),
        aggregate(map_values(transform_values(builtMap, (_, v) => v * 2L)),
          lit(0L), (acc, x) => acc + x).as("doubled_sum"))
      .orderBy(col("event_id"))
  }

  /** J13 — SCD-2 dimension build (slowly-changing dimension, type 2): turn
    * a change *log* (orders, ordered per customer by date) into validity
    * *intervals* — one row per consecutive run of the tracked attribute
    * (`o_orderpriority`), with `[valid_from, valid_to)` bounds and a
    * current-row flag. The warehouse-standard gaps-and-islands build every
    * dimension pipeline runs; the reference's bookkeeping table keeps only
    * the latest state per key (`dao/HiveSinkDetailDao.scala:73-98` upsert)
    * — this is its full-history generalization.
    *
    * Shape: two window passes over one `(custkey, date, key)` sort — a lag
    * to mark change points, a running sum to number islands — then one
    * groupBy and a final lead to close each interval with its successor's
    * start. All shuffles hash on `o_custkey`, so the sort is per-customer
    * (never global) and the plan reuses one partitioning end-to-end; at
    * 100 TB this is a single-key-shuffle pipeline with no skew hazard
    * beyond the key's own fan-in. Island numbering is deterministic: the
    * sort is tiebroken by the unique `o_orderkey`. Two attribute changes on
    * one date produce a zero-length version (`valid_from == valid_to`) —
    * the standard SCD2 artifact at day-grain change logs, kept rather than
    * merged so the version count equals the change count. */
  def scd2Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val runSum = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(byCust).isNull ||
          lag(col("o_orderpriority"), 1).over(byCust) =!= col("o_orderpriority"),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("version", sum(col("chg")).over(runSum))
      .groupBy(col("o_custkey"), col("version"))
      .agg(min(col("o_orderpriority")).as("priority"), // constant within island
        Times.epochSeconds(min(col("o_orderdate"))).as("valid_from"))
    val byVersion = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("o_custkey"), col("version"), col("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** W8 — IGNORE NULLS analytics: previous-good (`lag ... IGNORE NULLS`)
    * and forward-fill (`last ... IGNORE NULLS` over a running frame) per
    * user — the gap-fill idiom for sensor/metric streams where some event
    * kinds carry no reading. Same single-key shuffle shape as w2/w3: both
    * windows hash on `user_id` and share one per-user sort, so the plan
    * carries one Exchange + one Sort regardless of corpus size. */
  def ignoreNullsFill(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", lit(null))
          .otherwise(round(col("value"), 6)).as("v"))
      .select(col("event_id"), col("user_id"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_good"),
        last(col("v"), ignoreNulls = true).over(fill).as("fill_fwd"))
      .orderBy(col("event_id"))
  }

  // ---- Subquery surface ---------------------------------------------------

  /** S9 — LATERAL correlated top-k: for every nation, its two
    * highest-value orders, written as the SQL-standard
    * `, LATERAL (SELECT ... WHERE correlated ORDER BY ... LIMIT 2)` form.
    * Catalyst decorrelates the limit subquery into `WindowGroupLimit`
    * (partial map-side + final per-group top-k pruning — rows beyond rank
    * 2 never cross the shuffle) feeding a `row_number` window and one
    * hash join — the per-key re-execution the lateral syntax *describes*
    * never happens, and the plan is the same shape the hand-built w1/w4b
    * ranking queries use. PlanSpec pins the `WindowGroupLimit` rewrite.
    * Fully deterministic: ties broken by `o_orderkey` inside the lateral
    * ORDER BY and in the outer sort. */
  def lateralTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val tag  = java.util.UUID.randomUUID().toString.replace("-", "")
    val cust = s"cust_$tag"; val ords = s"ords_$tag"
    Tables.customer(spark, sfDir).createOrReplaceTempView(cust)
    Tables.orders(spark, sfDir).createOrReplaceTempView(ords)
    try {
      spark.sql(
        s"""SELECT n.c_nationkey, t.o_orderkey, t.o_totalprice
            FROM (SELECT DISTINCT c_nationkey FROM $cust) n,
            LATERAL (SELECT o.o_orderkey, o.o_totalprice
                     FROM $ords o JOIN $cust c2 ON o.o_custkey = c2.c_custkey
                     WHERE c2.c_nationkey = n.c_nationkey
                     ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
            ORDER BY n.c_nationkey, t.o_totalprice DESC, t.o_orderkey""")
    } finally {
      spark.catalog.dropTempView(cust); spark.catalog.dropTempView(ords)
    }
  }

  /** S8 — correlated subqueries, written as SQL text so Catalyst's
    * decorrelation does the work: a correlated scalar pair (per-nation
    * balance mean via integer cents cross-multiply — `cents * n > sum` —
    * so no float division exists anywhere and any ANSI engine agrees
    * bit-exactly), an EXISTS, and a single-column NOT IN. The optimizer
    * rewrites all three into joins (`RewriteCorrelatedScalarSubquery`,
    * `RewritePredicateSubquery`): the scalar aggregates become one
    * per-nation aggregate equi-joined on `c_nationkey`, EXISTS a left-semi
    * join on `c_custkey`, NOT IN a null-aware anti join — never a per-row
    * re-execution. The reference has no subquery surface; its nearest
    * analog is the HAVING completeness probe
    * (`/root/reference/src/main/scala/.../sql/HiveSinkSql.scala`), covered
    * by a5.
    *
    * Scale shape: three hash joins keyed on real columns; the aggregate
    * side collapses to |nations| rows before joining, and the NOT IN list
    * is a filtered key set (broadcast-sized after aggregation). Temp views
    * are tagged per-invocation and dropped eagerly — `spark.sql` analyzes
    * eagerly, so the returned plan survives the drop. */
  def subqueryFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val tag  = java.util.UUID.randomUUID().toString.replace("-", "")
    val cust = s"cust_$tag"; val ords = s"ords_$tag"
    Tables.customer(spark, sfDir).createOrReplaceTempView(cust)
    Tables.orders(spark, sfDir).createOrReplaceTempView(ords)
    try {
      spark.sql(
        s"""SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
            FROM $cust c
            WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                    * (SELECT count(*) FROM $cust c2
                       WHERE c2.c_nationkey = c.c_nationkey)
                  > (SELECT CAST(sum(CAST(round(c3.c_acctbal * 100) AS BIGINT)) AS BIGINT)
                     FROM $cust c3 WHERE c3.c_nationkey = c.c_nationkey)
              AND EXISTS (SELECT 1 FROM $ords o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
              AND c.c_custkey NOT IN (SELECT o_custkey FROM $ords
                                      WHERE o_totalprice > 350000.0)
            ORDER BY c.c_custkey""")
    } finally {
      spark.catalog.dropTempView(cust); spark.catalog.dropTempView(ords)
    }
  }
}
