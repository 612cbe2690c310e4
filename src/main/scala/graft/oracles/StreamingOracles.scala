package graft.oracles

/** DuckDB oracle SQL — the streaming family (t*): micro-batch loops, watermarked counts, sessionization, stream joins, stateful processors.
  * Split from `SparkEntry` (round 11 housekeeping): the declaration table
  * there stays reviewable; each family object carries only its SQL. All
  * shared snippet builders live in [[OracleDefs]].
  */
object StreamingOracles {
  import OracleDefs._

  private[graft] def sql: Map[String, String] = Map(
    // t16: the same monitor on the watermarked stream — the timeline is
    // the t1b-flushed one (windows the final watermark passed), so the
    // oracle adds exactly t1b's HAVING rule to the shared chain
    "t16_stream_anomaly_flags" -> a2eOracleSql(
      s"""
          HAVING ${bucketE("ts")} + 300 <=
            (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) - 600 FROM events)"""),
    // t17: gaps-and-islands sessionization (30-min gap over floored
    // epoch seconds, sessions confined to 1-h round windows — the
    // reference's partition router, so brk fires on gap OR window
    // change); the stream closes sessions ONLY by timer, so ONE uniform
    // rule selects the emitted set: a session emits iff its close
    // deadline — idle AND round window elapsed,
    // max((end//3600+1)*3600, end+1800) — strictly precedes the final
    // watermark. The timer fire rule (TimerStateImpl expires
    // ts <= watermark, the armed timer carries deadline·1000 + 1) in
    // exact integer milliseconds: both engines floor micros→ms, the
    // watermark is max_event_ms − 600000.
    "t17_stream_idle_close" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
              coalesce(event_type, 'no_category') AS cat FROM events),
          m AS (SELECT user_id, es, cat,
              CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
                OR es // 3600 <> lag(es) OVER (PARTITION BY user_id ORDER BY es) // 3600
                THEN 1 ELSE 0 END AS brk FROM e),
          s AS (SELECT user_id, es, cat,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY es
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM m),
          g AS (SELECT user_id, sid,
              min(es) AS session_start, max(es) AS session_end,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT cat) AS BIGINT) AS n_types
            FROM s GROUP BY 1, 2),
          wm AS (SELECT epoch_ms(max(ts)) - 600000 AS w FROM events)
          SELECT user_id, session_start, session_end, n_events, n_types
          FROM g
          WHERE GREATEST((session_end // 3600 + 1) * 3600,
                         session_end + 1800) * 1000 < (SELECT w FROM wm)
          ORDER BY user_id, session_start""",
    "t7_upsert_latest" ->
      s"""WITH ranked AS (
            SELECT user_id, event_type, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
          SELECT user_id, event_type, event_id AS last_event_id,
                 ${epochS("ts")} AS last_epoch, value AS last_value
          FROM ranked WHERE rn = 1 ORDER BY user_id, event_type""",
    "t1_stream_counts" ->
      s"""SELECT ${bucketE("ts")} AS bucket_epoch,
          coalesce(event_type, 'no_category') AS category, count(*) AS cnt
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "t1b_stream_counts_append" ->
      s"""SELECT ${bucketE("ts")} AS bucket_epoch,
          coalesce(event_type, 'no_category') AS category, count(*) AS cnt
          FROM events GROUP BY 1, 2
          HAVING ${bucketE("ts")} + 300 <=
            (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) - 600 FROM events)
          ORDER BY 1, 2""",
    "t3_stream_dedup" ->
      """SELECT DISTINCT user_id, coalesce(event_type, 'no_category') AS category
         FROM events ORDER BY user_id, category""",
    // native dropDuplicatesWithinWatermark over a finite input = DISTINCT
    // (every duplicate falls inside the watermark horizon here)
    "t5_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, coalesce(event_type, 'no_category') AS category
         FROM events ORDER BY user_id, category""",
    // running per-key state rolled up to totals = the batch GROUP BY
    "t10_transform_with_state" ->
      s"""SELECT user_id, count(*) AS n_events, max(${epochS("ts")}) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    "t2_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, ${epochS("ts")} AS epoch, ts FROM events),
          m AS (SELECT user_id, epoch,
                  CASE WHEN lag(epoch) OVER w IS NULL OR epoch - lag(epoch) OVER w > 1800
                       THEN 1 ELSE 0 END AS new_session
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
          FROM m GROUP BY 1 ORDER BY 1""",
    // session_window merges windows that OVERLAP: event at prev_ts + gap
    // exactly starts a NEW session (strict-overlap), so the gaps-and-islands
    // form uses >= gap — unlike t2's batch rule (> gap). Comparison is in
    // exact integer microseconds (epoch_us), matching Spark's native
    // timestamp arithmetic; floored epoch seconds would misclassify gaps
    // whose sub-second parts straddle the boundary.
    "t2b_session_window_stream" ->
      """WITH m AS (SELECT user_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                      THEN 1 ELSE 0 END AS new_session
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM m GROUP BY 1 ORDER BY 1""",
    // inner stream-stream join over a finite input = the batch interval
    // join; boundary comparisons are exact microsecond timestamps on both
    // engines, lag_sec is floor-epoch subtraction (Spark unix_timestamp)
    "t4_stream_stream_join" ->
      s"""SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
            ${epochS("e.ts")} - ${epochS("c.ts")} AS lag_sec
          FROM events c JOIN events e ON c.user_id = e.user_id
          WHERE c.event_type = 'click' AND e.event_type = 'error'
            AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1800 SECOND
          ORDER BY 1, 2, 3""",
    // t15: streaming SemDeDup — the quantizer retrains via the x6b chain,
    // the arrival split restates t14's polyhash buckets, and both dedup
    // rules (within-batch greedy, fresh-vs-prior-keeper) are NOT EXISTS
    // predicates over the same 6-dp rounded cosine
    "t15_stream_semantic_dedup" ->
      s"""WITH $ivfChainSql,
          av AS MATERIALIZED (
            SELECT a.cell, a.vec_id, e.embedding,
              ${polyHashSql("CAST(e.vec_id AS VARCHAR)")} % 10 AS bkt
            FROM asg a JOIN embeddings e USING (vec_id)),
          pr AS (SELECT * FROM av WHERE bkt <= 7),
          fr AS (SELECT * FROM av WHERE bkt >= 8),
          pk AS MATERIALIZED (
            SELECT p.cell, p.vec_id, p.embedding FROM pr p
            WHERE NOT EXISTS (
              SELECT 1 FROM pr q WHERE q.cell = p.cell AND q.vec_id < p.vec_id
                AND round(${cosineD("q.embedding", "p.embedding")}, 6) >= 0.4)),
          fk AS (
            SELECT f.cell, f.vec_id FROM fr f
            WHERE NOT EXISTS (
              SELECT 1 FROM fr g WHERE g.cell = f.cell AND g.vec_id < f.vec_id
                AND round(${cosineD("g.embedding", "f.embedding")}, 6) >= 0.4)
            AND NOT EXISTS (
              SELECT 1 FROM pk WHERE pk.cell = f.cell
                AND round(${cosineD("pk.embedding", "f.embedding")}, 6) >= 0.4))
          SELECT vec_id, CAST(cell AS BIGINT) AS cell
          FROM (SELECT vec_id, cell FROM pk
                UNION ALL SELECT vec_id, cell FROM fk)
          ORDER BY vec_id""",
    "t12_stream_media_decode" ->
      """WITH d AS (SELECT doc_id, lang,
                           (doc_id % 56 + 8) * (doc_id % 40 + 8) AS np FROM documents),
         px AS (SELECT d.doc_id, d.lang, d.np, t.i,
                       (7 * d.doc_id + 3 * t.i) % 256 AS r
                FROM d, unnest(generate_series(0, d.np - 1)) AS t(i)),
         per AS (SELECT doc_id, lang, np, SUM(r) AS sr FROM px GROUP BY 1, 2, 3)
         SELECT lang, count(*) AS n_imgs,
           CAST(SUM(np) AS BIGINT) AS total_pixels,
           CAST(SUM(sr) AS BIGINT) AS total_sum_r
         FROM per GROUP BY 1 ORDER BY 1""",
    // t13: the same probe as a streaming execution (per-row winnowing,
    // stream-static join, complete-mode agg) — batch-equivalent by
    // construction, so it carries x58's oracle verbatim
    "t13_stream_contamination" -> contaminationOracleSql,
    // t14: the streaming near-dup index — batch 0 (buckets 0-7)
    // exact-dedups within itself; batch 1 (8-9) additionally drops exact
    // dups of ANY prior hash and n-gram near-dups (Jaccard >= 0.8) of
    // prior KEPT docs; same-batch near-dup pairs both survive by design
    "t14_stream_dedup_index" ->
      s"""WITH b AS (SELECT doc_id, ${polyHashSql("text")} AS fp,
            ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS bk FROM documents),
          pk AS (SELECT fp, min(doc_id) AS doc_id FROM b WHERE bk <= 7 GROUP BY fp),
          $jaccardPairsCte,
          nf AS (SELECT DISTINCT x.doc_id
                 FROM b x JOIN pairs p
                   ON (p.id1 = x.doc_id OR p.id2 = x.doc_id)
                 JOIN pk ON (CASE WHEN p.id1 = x.doc_id THEN p.id2
                                  ELSE p.id1 END) = pk.doc_id
                 WHERE x.bk >= 8),
          fk AS (SELECT fp, min(doc_id) AS doc_id FROM b
                 WHERE bk >= 8 AND fp NOT IN (SELECT fp FROM pk)
                 GROUP BY fp),
          keep AS (SELECT doc_id FROM pk
                   UNION ALL
                   SELECT doc_id FROM fk
                   WHERE doc_id NOT IN (SELECT doc_id FROM nf))
          SELECT k.doc_id, CAST(length(d.text) AS BIGINT) AS text_len
          FROM keep k JOIN documents d ON d.doc_id = k.doc_id
          ORDER BY k.doc_id""",
    // t11 = a11 executed as a complete-mode streaming aggregation: same
    // oracle (finite source => batch-equivalent)
    "t11_stream_count_max" ->
      s"""SELECT coalesce(event_type, 'no_category') AS category,
          count(ts) AS n_events, max(${epochS("ts")}) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
  )
}
