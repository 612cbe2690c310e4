package graft.oracles

/** DuckDB oracle SQL — ingestion, aggregation, join, window, set-op, subquery and scalar-function families (q/a/p/j/w/s/f).
  * Split from `SparkEntry` (round 11 housekeeping): the declaration table
  * there stays reviewable; each family object carries only its SQL. All
  * shared snippet builders live in [[OracleDefs]].
  */
object RelationalOracles {
  import OracleDefs._

  /** Monolithic recompute-after-deletes over the maintained aggregate's
    * inputs, parameterized by the tombstone predicate (rendered over
    * columns `es`, `event_id` and scalars `mn`, `mx`). */
  private def aggRetractSqlWith(tombSql: String): String =
    s"""WITH e AS (SELECT coalesce(event_type, 'no_category') AS category,
          ${epochS("ts")} AS es,
          CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro,
          event_id
        FROM events),
        b AS (SELECT min(es) AS mn, max(es) AS mx FROM e),
        keep AS (SELECT e.* FROM e, b
          WHERE NOT ($tombSql))
        SELECT category, es - (es % 300) AS bucket,
          count(*) AS n_events, max(es) AS max_es,
          CAST(sum(v_micro) AS BIGINT) AS sum_value_micro
        FROM keep GROUP BY 1, 2 ORDER BY 1, 2"""

  /** x77's tombstones: retention cut + scatter over ALL of history. */
  private val aggRetractSql: String = aggRetractSqlWith(
    s"""es < mn + (mx - mn) // 10
        OR ${polyHashSql("CAST(event_id AS VARCHAR)")} % 23 = 0""")

  /** t19's tombstones: the same cut, scatter confined to the [4/10, 6/10)
    * day band (`Maintenance.t19Tombstones` — same integer arithmetic). */
  private val t19RetractSql: String = aggRetractSqlWith(
    s"""es < mn + (mx - mn) // 10
        OR (${polyHashSql("CAST(event_id AS VARCHAR)")} % 23 = 0
            AND es >= mn + 4 * ((mx - mn) // 10)
            AND es < mn + 6 * ((mx - mn) // 10))""")

  private[graft] def sql: Map[String, String] = Map(
    "q_ingest_partition_counts" ->
      s"""SELECT ${logdateS("ts")} AS logdate, count(*) AS n_events,
          count(DISTINCT coalesce(event_type, 'no_category')) AS n_categories,
          CAST(floor(max(epoch(ts))) AS BIGINT) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    // identical accounting at day grain: compaction preserves the data
    "q_compact_partition_counts" ->
      s"""SELECT substring(${logdateS("ts")}, 1, 8) AS logday,
          count(*) AS n_events,
          count(DISTINCT coalesce(event_type, 'no_category')) AS n_categories,
          CAST(floor(max(epoch(ts))) AS BIGINT) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    // x76: incremental view maintenance — the oracle IS the full
    // recompute, so hash equality states merged(base, delta) ≡
    // recomputed(all) exactly. All-integer state: counts, max-epoch,
    // per-row micro-scaled value sums (floor(v·1e6 + 0.5), the x6c
    // discipline) so partial-aggregate merging is order-free on both
    // engines; SUM promoted back to BIGINT from DuckDB's HUGEINT.
    "x76_agg_delta_merge" ->
      s"""WITH e AS (SELECT coalesce(event_type, 'no_category') AS category,
            ${epochS("ts")} AS es,
            CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
          FROM events)
          SELECT category, es - (es % 300) AS bucket,
            count(*) AS n_events, max(es) AS max_es,
            CAST(sum(v_micro) AS BIGINT) AS sum_value_micro
          FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
    // x77: IVM under retraction — the oracle is the monolithic recompute
    // AFTER deletes (retention cut on the oldest tenth + scattered ~4%
    // hash tombstones), so hash equality states merged(stored, −delta) ≡
    // recomputed(survivors) exactly; same all-integer state as x76.
    "x77_agg_retract_merge" -> aggRetractSql,
    // x79: the full upsert fold — one batch carries both inserts (the
    // recent third of history, x76's delta) and deletes (x77's tombstones
    // inside stored history); the oracle is the monolithic recompute over
    // (corpus survivors ∪ inserts), so hash equality states
    // fold(S, +Δi, −Δd) ≡ recompute((C \ D) ∪ I).
    "x79_agg_upsert_merge" -> aggRetractSqlWith(
      s"""es < mn + 2 * ((mx - mn) // 3)
          AND (es < mn + (mx - mn) // 10
            OR ${polyHashSql("CAST(event_id AS VARCHAR)")} % 23 = 0)"""),
    // t19: a DAY-BANDED tombstone set applied as a two-micro-batch STREAM
    // that maintains corpus and stored view together — the oracle is the
    // monolithic recompute after those deletes, so the green hash states
    // the incremental loop converges to the one-shot retraction.
    "t19_stream_retract_view" -> t19RetractSql,
    "p1_serde_parse" ->
      """SELECT event_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "p1b_delimited_parse" ->
      """WITH b AS (SELECT event_id,
           event_type || '|' || CAST(value AS VARCHAR) AS body FROM events)
         SELECT event_id, string_split(body, '|')[1] AS category,
                CAST(string_split(body, '|')[2] AS DOUBLE) AS val
         FROM b ORDER BY event_id""",
    "p1c_malformed_classify" ->
      """WITH r AS (SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN 'x' || props ELSE props END AS raw
           FROM events)
         SELECT event_id, json_valid(raw) AS is_valid,
           CASE WHEN json_valid(raw)
                THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k_num
         FROM r ORDER BY event_id""",
    "p2_path_render" ->
      s"""SELECT event_id,
          'logs/logdate=' || ${logdateS("ts")} || '/category=' || coalesce(event_type, 'no_category') AS path
          FROM events ORDER BY event_id""",
    "p34_time_convert" ->
      s"""SELECT event_id, ${epochS("ts")} AS epoch, ${bucketE("ts")} AS bucket_epoch,
          ${logdateS("ts")} AS five_min_str,
          strftime(make_timestamp(${epochS("ts")} * 1000000), '%Y-%m-%d %H:%M:%S') AS ts_str
          FROM events ORDER BY event_id""",
    "p5_partition_extract" ->
      s"""WITH s AS (SELECT event_id,
            'logdate=' || ${logdateS("ts")} || '/category=' || coalesce(event_type, 'no_category') AS spec
          FROM events)
          SELECT event_id, spec,
            regexp_extract(spec, '\\Qlogdate\\E=([^/]*)', 1) AS logdate_v,
            regexp_extract(spec, '\\Qcategory\\E=([^/]*)', 1) AS category_v
          FROM s ORDER BY event_id""",
    "p6_json_encode" ->
      s"""SELECT event_type AS category, ${bucketE("ts")} AS bucket_epoch,
          '{"count":' || CAST(count(*) AS VARCHAR) || ',"timestamp":' || CAST(max(${epochS("ts")}) AS VARCHAR) || '}' AS counter_json
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "p7_category_default" ->
      """SELECT coalesce(nullif(event_type, 'error'), 'no_category') AS category, count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY 1""",
    "p7b_timestamp_class" ->
      """WITH r AS (SELECT event_id,
           CASE WHEN event_type = 'error' THEN NULL
                WHEN event_type = 'click' THEN 'oops'
                ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS tsraw
         FROM events)
         SELECT event_id, tsraw,
           CASE WHEN tsraw IS NULL THEN 'no_timestamp'
                WHEN TRY_CAST(tsraw AS TIMESTAMP) IS NULL THEN 'invalid_timestamp'
                ELSE strftime(make_timestamp(CAST(floor(epoch(TRY_CAST(tsraw AS TIMESTAMP))/300)*300 AS BIGINT)*1000000), '%Y%m%d%H%M') END AS ts_class
         FROM r ORDER BY event_id""",
    "p8_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount >= 0.02 AND l_discount <= 0.08
         ORDER BY l_orderkey, l_linenumber""",
    "a2_window_counts" ->
      s"""SELECT ${bucketE("ts")} AS bucket_epoch, count(*) AS cnt,
          max(${epochS("ts")}) AS last_update_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    "a2b_dense_timeline" ->
      s"""WITH c AS (SELECT ${bucketE("ts")} AS b, count(*) AS n
            FROM events GROUP BY 1),
          r AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
          g AS (SELECT unnest(generate_series(lo, hi, 300)) AS bucket_epoch
                FROM r)
          SELECT g.bucket_epoch, CAST(coalesce(c.n, 0) AS BIGINT) AS cnt,
            c.n IS NULL AS filled
          FROM g LEFT JOIN c ON g.bucket_epoch = c.b ORDER BY 1""",
    // a2c: Spark's window(ts, 10 min, 5 min) assigns each event to the two
    // slide-aligned windows containing it — restated as pure integer floor
    // arithmetic (starts = 5-min floor and that minus 300)
    "a2c_hopping_counts" ->
      s"""WITH h AS (SELECT user_id,
              unnest([${bucketE("ts")}, ${bucketE("ts")} - 300]) AS win_start
            FROM events)
          SELECT win_start, win_start + 600 AS win_end, count(*) AS cnt,
            count(DISTINCT user_id) AS n_users
          FROM h GROUP BY 1 ORDER BY 1""",
    // a2d: per-category grid + linear interpolation between the nearest
    // observed neighbors; integer // matches Spark div (both truncate)
    "a2d_interp_timeline" ->
      s"""WITH c AS (SELECT event_type AS category, ${bucketE("ts")} AS b,
              count(*) AS cnt
            FROM events GROUP BY 1, 2),
          r AS (SELECT category, min(b) AS mn, max(b) AS mx FROM c GROUP BY 1),
          g AS (SELECT category, unnest(generate_series(mn, mx, 300)) AS b FROM r),
          j AS (SELECT g.category, g.b, c.cnt
                FROM g LEFT JOIN c ON g.category = c.category AND g.b = c.b),
          w AS (SELECT category, b, cnt,
              last_value(cnt IGNORE NULLS) OVER pw AS pv,
              last_value(CASE WHEN cnt IS NOT NULL THEN b END IGNORE NULLS)
                OVER pw AS pb,
              first_value(cnt IGNORE NULLS) OVER nw AS nv,
              first_value(CASE WHEN cnt IS NOT NULL THEN b END IGNORE NULLS)
                OVER nw AS nb
            FROM j
            WINDOW pw AS (PARTITION BY category ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              nw AS (PARTITION BY category ORDER BY b
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
          SELECT category, b AS bucket_epoch, cnt IS NOT NULL AS observed,
            CASE WHEN cnt IS NOT NULL THEN cnt
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE pv + (nv - pv) * (b - pb) // (nb - pb) END AS cnt_filled
          FROM w ORDER BY 1, 2""",
    // a2e: the z-test is stated cross-multiplied in integers on both
    // engines — no sqrt/division, so the flag hash-matches exactly
    "a2e_anomaly_flags" -> a2eOracleSql(),
    "a3_category_window_counts" ->
      s"""SELECT ${bucketE("ts")} AS bucket_epoch,
          coalesce(event_type, 'no_category') AS category,
          count(*) AS cnt, max(${epochS("ts")}) AS last_update_epoch
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "a5_completeness" ->
      s"""WITH detail AS (
            SELECT ${logdateS("ts")} AS logdate,
                   'host' || CAST(user_id % 5 AS VARCHAR) AS hostname,
                   count(*) AS sinkcount
            FROM events GROUP BY 1, 2)
          SELECT logdate, count(DISTINCT hostname) AS n_hosts,
                 CAST(SUM(sinkcount) AS BIGINT) AS total_sunk
          FROM detail GROUP BY logdate
          HAVING count(DISTINCT hostname) >= 5 ORDER BY logdate""",
    "a6_max_ts_per_category" ->
      s"""SELECT event_type AS category, max(${epochS("ts")}) AS last_epoch, count(*) AS cnt
          FROM events GROUP BY 1 ORDER BY 1""",
    "a7_distinct_counts" ->
      """SELECT event_type AS category, count(DISTINCT user_id) AS n_users,
         count(DISTINCT event_id) AS n_events
         FROM events GROUP BY 1 ORDER BY 1""",
    "j1_inner_join_agg" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
          ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1 ORDER BY 1""",
    "j2_broadcast_join" ->
      s"""SELECT p_brand, count(*) AS n_items, ${dsum("l_quantity")} AS sum_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1 ORDER BY 1""",
    // bucketing changes the physical plan, never the result: same join, by SQL
    "j12_bucket_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
          ${dsum("l_quantity")} AS sum_qty
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1 ORDER BY 1""",
    "j3_left_join" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders,
         count(DISTINCT c_custkey) AS n_customers
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "j4_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "j5_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "j6_star_join" ->
      s"""SELECT r_name, n_name, ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
          count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "j7_range_join" ->
      """SELECT p_brand, count(*) AS n_matches
         FROM lineitem JOIN part ON l_quantity >= p_size - 1 AND l_quantity <= p_size + 1
         GROUP BY 1 ORDER BY 1""",
    "j11_salted_skew_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
          ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1 ORDER BY 1""",
    "j9_right_join" ->
      s"""SELECT s_suppkey, count(l_orderkey) AS n_items,
          max(${epochS("l_shipdate")}) AS last_ship_epoch
          FROM (SELECT * FROM lineitem WHERE l_quantity > 30)
          RIGHT JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1 ORDER BY 1""",
    "j10_full_join" ->
      s"""WITH a AS (SELECT o_orderdate AS d, count(*) AS n_orders FROM orders GROUP BY 1),
          b AS (SELECT l_shipdate AS d2, ${dsum("l_quantity")} AS day_qty FROM lineitem GROUP BY 1)
          SELECT ${epochS("coalesce(d, d2)")} AS day_epoch, n_orders, day_qty
          FROM a FULL JOIN b ON d = d2 ORDER BY day_epoch""",
    "j8_asof_join" ->
      s"""SELECT p.event_id, p.user_id,
          (SELECT CAST(floor(epoch(max(e.ts))) AS BIGINT) FROM events e
           WHERE e.user_id = p.user_id AND e.event_type = 'error' AND e.ts <= p.ts) AS last_error_epoch
          FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""",
    // the native operator computes the same relation as j8 — one oracle, two plans
    "j8b_asof_native" ->
      s"""SELECT p.event_id, p.user_id,
          (SELECT CAST(floor(epoch(max(e.ts))) AS BIGINT) FROM events e
           WHERE e.user_id = p.user_id AND e.event_type = 'error' AND e.ts <= p.ts) AS last_error_epoch
          FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""",
    "w1_rank_per_group" ->
      s"""WITH custrev AS (
            SELECT c_mktsegment, c_custkey, ${dsum("o_totalprice")} AS cust_rev
            FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
          ranked AS (
            SELECT c_mktsegment, c_custkey, cust_rev,
                   row_number() OVER (PARTITION BY c_mktsegment ORDER BY cust_rev DESC, c_custkey) AS rnk
            FROM custrev)
          SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, c_custkey, cust_rev
          FROM ranked WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
    "w2_lag_lead" ->
      s"""SELECT event_id, user_id, ${epochS("ts")} AS epoch,
          ${epochS("ts")} - lag(${epochS("ts")}, 1) OVER w AS gap_prev,
          lead(${epochS("ts")}, 1) OVER w - ${epochS("ts")} AS gap_next
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ORDER BY event_id""",
    "w3_running_sum" ->
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, ${epochS("l_shipdate")} AS ship_epoch,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (
            PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
          FROM lineitem
          ORDER BY l_suppkey, ship_epoch, l_orderkey, l_linenumber""",
    "w4_ntile_rank" ->
      """SELECT c_custkey, c_acctbal,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk
         FROM customer WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_custkey""",
    "w4b_ntile_scalable" ->
      """SELECT c_custkey, c_acctbal,
         CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
         FROM customer ORDER BY c_custkey""",
    "s1_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "s2_union" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
         UNION
         SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY custkey""",
    "s3_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
         INTERSECT
         SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY custkey""",
    "s4_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
         EXCEPT
         SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY custkey""",
    "s5_pivot" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
         FROM orders GROUP BY 1 ORDER BY 1""",
    "s6_unpivot" ->
      """WITH p AS (SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
           FROM orders GROUP BY 1)
         SELECT o_orderpriority, s.status,
           CASE s.status WHEN 'n_F' THEN n_F WHEN 'n_O' THEN n_O ELSE n_P END AS n
         FROM p, (VALUES ('n_F'), ('n_O'), ('n_P')) s(status)
         ORDER BY 1, 2""",
    "a8_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          coalesce(l_linestatus, 'ALL') AS linestatus,
          count(*) AS n, ${dsum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          ORDER BY returnflag, linestatus""",
    "a9_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
          coalesce(o_orderpriority, 'ALL') AS orderpriority,
          count(*) AS n, ${dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
          ORDER BY orderstatus, orderpriority""",
    "a10_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          coalesce(l_linestatus, 'ALL') AS linestatus,
          count(*) AS n, ${dsum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY returnflag, linestatus""",
    "f1_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lname, substring(p_name, 1, 5) AS prefix,
         CAST(length(p_name) AS BIGINT) AS name_len,
         CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
         p_brand || '|' || p_type AS brand_type,
         regexp_extract(p_type, '^([A-Za-z]+)', 1) AS first_word
         FROM part ORDER BY p_partkey""",
    "f2_datetime_funcs" ->
      s"""SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(month(o_orderdate) AS BIGINT) AS mo,
          CAST(day(o_orderdate) AS BIGINT) AS dom,
          strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
          ${epochS("o_orderdate")} AS order_epoch
          FROM orders ORDER BY o_orderkey""",
    "f3_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
         CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
         abs(l_discount - 0.05) AS disc_dev,
         round(sqrt(l_extendedprice), 6) AS price_sqrt,
         l_orderkey % 7 AS key_mod,
         round(l_extendedprice * l_quantity, 2) AS gross
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "f4_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
         round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b), 6) AS sq_norm,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b) / len(embedding), 6) AS mean_val,
         CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
         FROM embeddings ORDER BY vec_id""",
    "f5_json_funcs" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS k_str,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
         CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
         coalesce(event_type, 'no_category') AS rt_cat,
         json_extract_string(props, '$.k') AS jt_k
         FROM events ORDER BY event_id""",
    "w5_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderkey""",
    // RANGE frame over the integer epoch-second order key: value-based
    // frame, peers (tied seconds) share it on both engines
    "w6_range_window" ->
      s"""WITH e AS (SELECT event_id, user_id, ${epochS("ts")} AS epoch, value
            FROM events)
          SELECT event_id, user_id, epoch, value,
            count(*) OVER w AS n_10min,
            round(SUM(value) OVER w, 6) AS sum_10min
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch
                       RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
          ORDER BY event_id""",
    "w7_nth_value" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
         first_value(o_totalprice) OVER w AS best_price,
         nth_value(o_totalprice, 2) OVER w AS second_price,
         round(first_value(o_totalprice) OVER w - o_totalprice, 2) AS gap_to_best
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",
    "w8_ignore_nulls_fill" ->
      """SELECT event_id, user_id,
         lag(v IGNORE NULLS) OVER w AS prev_good,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_fwd
         FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'click' THEN NULL
                      ELSE round(value, 6) END AS v FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    // max(epoch(ts)) = epoch(max(ts)): monotone transform, matches the
    // engine's epochSeconds(cm.max_ts) projection of the fused aggregate
    "a11_count_max" ->
      s"""SELECT coalesce(event_type, 'no_category') AS category,
          count(ts) AS n_events, max(${epochS("ts")}) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    "j13_scd2" ->
      s"""WITH $scd2Cte
          SELECT o_custkey, version, priority, valid_from, valid_to, is_current
          FROM dim ORDER BY o_custkey, version""",
    // shares the j13 dim CTE: the engine-side composition (scd2Priority →
    // temporalDimJoin) mirrored in the oracle
    "j14_temporal_dim_join" ->
      s"""WITH $scd2Cte,
          f AS (SELECT DISTINCT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
                  o_custkey AS custkey, ${epochS("l_shipdate")} AS ship_epoch
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          j AS (SELECT f.*, d.priority, d.version,
                  row_number() OVER (PARTITION BY f.l_orderkey, f.linenumber, f.ship_epoch
                    ORDER BY d.valid_from DESC, d.version DESC) AS rk
                FROM f JOIN dim d ON f.custkey = d.o_custkey
                  AND d.valid_from <= f.ship_epoch)
          SELECT l_orderkey, linenumber, custkey, ship_epoch,
            priority AS priority_at_ship, version
          FROM j WHERE rk = 1 ORDER BY l_orderkey, linenumber""",
    // outputs restated value-wise: k lookup = json path, built-map values
    // = the source columns, doubled_sum = 2·(id + uid)
    "f6_map_funcs" ->
      """SELECT event_id,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         list_contains(json_keys(props), 'k') AS has_k,
         CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
         user_id AS uid_val,
         2 * event_id + 2 * user_id AS doubled_sum
         FROM events ORDER BY event_id""",
    "s7_multiset_ops" ->
      """SELECT 'intersect_all' AS op, custkey FROM (
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
           INTERSECT ALL
           SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         UNION ALL
         SELECT 'except_all' AS op, custkey FROM (
           SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
           EXCEPT ALL
           SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         ORDER BY op, custkey""",
    "s8_subquery_filter" ->
      """SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
         FROM customer c
         WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                 * (SELECT count(*) FROM customer c2
                    WHERE c2.c_nationkey = c.c_nationkey)
               > (SELECT CAST(sum(CAST(round(c3.c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
           AND EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_totalprice > 350000.0)
         ORDER BY c.c_custkey""",
    "s9_lateral_topk" ->
      """SELECT n.c_nationkey, t.o_orderkey, t.o_totalprice
         FROM (SELECT DISTINCT c_nationkey FROM customer) n,
         LATERAL (SELECT o.o_orderkey, o.o_totalprice
                  FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
                  WHERE c2.c_nationkey = n.c_nationkey
                  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
         ORDER BY n.c_nationkey, t.o_totalprice DESC, t.o_orderkey""",
  )
}
