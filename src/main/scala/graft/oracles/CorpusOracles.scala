package graft.oracles

/** DuckDB oracle SQL — the corpus-curation family: mixtures, splits, audits, graph/profile/layout, sampling.
  * Split from `SparkEntry` (round 11 housekeeping): the declaration table
  * there stays reviewable; each family object carries only its SQL. All
  * shared snippet builders live in [[OracleDefs]].
  */
object CorpusOracles {
  import OracleDefs._
  import graft.operators.{Graphs, Layout, Profile}

  /** x75's delete-propagation audit, shared verbatim by t18 (whose Spark
    * side applies the SAME tombstone set as a two-micro-batch stream —
    * the common oracle is the streaming-converges-to-one-shot theorem). */
  private val deletePropagationSql: String =
    s"""WITH d AS (SELECT source,
          CASE WHEN ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 40 = 0
               THEN 1 ELSE 0 END AS tomb
        FROM documents)
        SELECT source, count(*) AS rows_before,
          CAST(sum(tomb) AS BIGINT) AS rows_deleted,
          CAST(count(*) - sum(tomb) AS BIGINT) AS rows_after,
          CAST(CASE WHEN sum(tomb) > 0 THEN 1 ELSE 0 END AS BIGINT) AS rewritten
        FROM d GROUP BY source ORDER BY source"""

  private[graft] def sql: Map[String, String] = Map(
    // x74: the union-sum identity over one inner join; every term exact
    // integer ppm (c*1e6 // t, floors on positive operands). The pair
    // matrix is ALL unordered source pairs (mass × mass) so a pair with
    // fully disjoint vocabularies — the maximum-divergence case — still
    // appears, its shared-term sums coalesced to 0.
    // x75: the delete-propagation audit, restated data-only — per
    // partition key: row counts before/after the tombstone pass, the
    // deleted count, and whether the partition needed a rewrite. The
    // file-level invariants (clean partitions keep their exact files,
    // fully-emptied partitions are dropped) are spec-pinned in
    // IngestSpec; the oracle pins the accounting.
    "x75_delete_propagation" -> deletePropagationSql,
    // t18: x75's accounting restated over the corpus AFTER the streaming
    // tombstone loop — crash-restore and replay invariants are spec-pinned
    // in StreamingSpec; the oracle pins final-state convergence.
    "t18_stream_delete_propagation" -> deletePropagationSql,
    "x74_source_divergence" ->
      s"""WITH t0 AS (SELECT source, unnest($toks) AS w FROM documents),
          occ AS (SELECT source, ${polyHashSql("w")} AS h FROM t0),
          tot AS (SELECT source, count(*) AS t FROM occ GROUP BY 1),
          ppm AS (SELECT o.source, o.h,
              CAST(count(*) * 1000000 // tot.t AS BIGINT) AS p
            FROM occ o JOIN tot USING (source) GROUP BY o.source, o.h, tot.t),
          mass AS (SELECT source, CAST(sum(p) AS BIGINT) AS s FROM ppm GROUP BY 1),
          allp AS (SELECT ma.source AS source_a, mb.source AS source_b,
              ma.s AS sa, mb.s AS sb
            FROM mass ma JOIN mass mb ON ma.source < mb.source),
          common AS (SELECT a.source AS source_a, b.source AS source_b,
              CAST(sum(abs(a.p - b.p)) AS BIGINT) AS d_common,
              CAST(sum(a.p) AS BIGINT) AS pa_common,
              CAST(sum(b.p) AS BIGINT) AS pb_common
            FROM ppm a JOIN ppm b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2)
          SELECT source_a, source_b,
            CAST((coalesce(d_common, 0) + (sa - coalesce(pa_common, 0))
              + (sb - coalesce(pb_common, 0))) // 2 AS BIGINT) AS tv_ppm
          FROM allp LEFT JOIN common USING (source_a, source_b)
          ORDER BY source_a, source_b""",
    // x73: the composed per-doc verdict — x1's keeper window, x44's
    // recursive components + keep-longest (built on the shared jaccard
    // CTE), x8's exact quality text; precedence as nested CASE
    "x73_curation_manifest" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
          edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                    UNION ALL SELECT id2, id1 FROM pairs),
          reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
          labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
          canon AS (SELECT m.doc_id,
              (row_number() OVER (PARTITION BY cluster_id
                 ORDER BY n_chars DESC, m.doc_id) = 1) AS keep
            FROM (SELECT l.doc_id, l.cluster_id, d.n_chars
                  FROM labels l JOIN documents d USING (doc_id)) m),
          keepers AS (SELECT doc_id,
              (doc_id = min(doc_id) OVER (PARTITION BY text)) AS is_text_keeper
            FROM documents),
          qs AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(len(toks) AS DOUBLE) AS n_tok,
              CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
              CAST(len(list_filter(toks, w -> w IN ('the','a','of','and','to','el','la','de','y','que','der','die','das','und','ist','le','et','les','des'))) AS DOUBLE) AS n_stop
            FROM docs),
          qual AS (SELECT doc_id, n_tokens,
              round((CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0 WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
                    + (n_uniq / n_tok) * 0.4 + (n_stop / n_tok) * 0.2, 6) AS quality
            FROM qs)
          SELECT k.doc_id, q.n_tokens,
            CASE WHEN NOT k.is_text_keeper THEN 'exact_dup'
                 WHEN NOT c.keep THEN 'near_dup'
                 WHEN q.quality < 0.5 THEN 'low_quality'
                 ELSE 'keep' END AS verdict
          FROM keepers k JOIN canon c USING (doc_id) JOIN qual q USING (doc_id)
          ORDER BY doc_id""",
    // x49: integer fixed-point priority (u·10⁶ div w, both positive →
    // truncation = floor in any dialect); sequential Poisson sampling
    "x49_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
                 ${polyHashSql("CAST(doc_id AS VARCHAR)")} AS u
               FROM documents)
          SELECT doc_id, n_tokens,
                 CAST((u * 1000000) // n_tokens AS BIGINT) AS priority
          FROM d WHERE n_tokens > 0
          ORDER BY priority, doc_id LIMIT 100""",
    // x50: the declared columns are the exact top-k counts plus the two
    // PROVABLE sketch invariants (no undercount; overcount ≤ ε·N at the
    // chosen width) — the oracle states them as true, so a hash check
    // covers a genuinely approximate structure
    "x50_heavy_hitters" ->
      s"""WITH p AS (SELECT unnest($toks) AS token FROM documents),
          e AS (SELECT token, count(*) AS n_exact FROM p GROUP BY 1)
          SELECT token, CAST(n_exact AS BIGINT) AS n_exact,
                 TRUE AS ok_lower, TRUE AS ok_upper
          FROM e ORDER BY n_exact DESC, token LIMIT 20""",
    // x51: x44's recursive-CTE cluster labels + keep rule, rolled up to
    // per-language token accounting; all-integer, ppm via positive //
    "x51_effective_tokens" ->
      s"""WITH RECURSIVE
          docs AS (SELECT doc_id, $toks AS tk FROM documents),
          sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
                 FROM docs, unnest(generate_series(1, len(tk) - 2)) AS t(i)
                 WHERE len(tk) >= 3),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
                    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pairs AS (SELECT id1, id2
                    FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
                    WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.8),
          edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                    UNION ALL SELECT id2, id1 FROM pairs),
          reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
          labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
          keepers AS (SELECT l.doc_id, l.cluster_id,
                 (row_number() OVER (PARTITION BY l.cluster_id
                                     ORDER BY d.n_chars DESC, l.doc_id) = 1) AS keep
               FROM labels l JOIN documents d USING (doc_id)),
          tok AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tok FROM documents)
          SELECT t.lang, count(*) AS n_docs,
                 CAST(SUM(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
                 CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
                 CAST(SUM(CASE WHEN k.keep THEN t.n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
                 CAST(((SUM(t.n_tok) - SUM(CASE WHEN k.keep THEN t.n_tok ELSE 0 END))
                   * 1000000) // SUM(t.n_tok) AS BIGINT) AS dup_token_ppm
          FROM tok t JOIN keepers k USING (doc_id)
          GROUP BY t.lang ORDER BY t.lang""",
    // x53: content-stable hash rank within each source, capped
    "x53_domain_cap" ->
      s"""SELECT doc_id, source, rnk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                     ORDER BY ${polyHashSql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
            FROM documents)
          WHERE rnk <= 10 ORDER BY source, rnk""",
    "x14_split_stats" ->
      s"""WITH s AS (SELECT
            CASE WHEN h <= 7 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split,
            tk, n_chars
          FROM (SELECT ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS h,
                       len($toks) AS tk, n_chars FROM documents))
          SELECT split, count(*) AS n_docs, CAST(SUM(tk) AS BIGINT) AS total_tokens,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM s GROUP BY 1 ORDER BY 1""",
    // x64: the sequential funnel condition (first qualifying event after
    // the user's first prior-step event, within 72 h) as chained per-user
    // MIN aggregates — identical CTE chain on both engines, all-integer
    "x64_funnel_steps" ->
      s"""WITH e AS (SELECT user_id, event_type, ${epochS("ts")} AS t FROM events),
          v AS (SELECT user_id, min(t) AS v_t FROM e
                WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.t) AS c_t, min(v.v_t) AS v_t
                FROM e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click'
                  AND e.t > v.v_t AND e.t <= v.v_t + 259200 GROUP BY 1),
          p AS (SELECT e.user_id, min(e.t) AS p_t, min(c.c_t) AS c_t
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase'
                  AND e.t > c.c_t AND e.t <= c.c_t + 259200 GROUP BY 1)
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step,
              count(*) AS users, CAST(0 AS BIGINT) AS sum_lag_s FROM v
            UNION ALL
            SELECT 2, 'click', count(*),
              CAST(COALESCE(sum(c_t - v_t), 0) AS BIGINT) FROM c
            UNION ALL
            SELECT 3, 'purchase', count(*),
              CAST(COALESCE(sum(p_t - c_t), 0) AS BIGINT) FROM p)
          ORDER BY step_no""",
    // x65: day numbers are integer epoch-days (positive range ⇒ floor ==
    // truncate, so DuckDB // and Spark div agree exactly)
    "x65_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, ${epochS("ts")} // 86400 AS d FROM events),
          f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1)
          SELECT f.cohort_day, e.d - f.cohort_day AS day_offset,
            count(DISTINCT e.user_id) AS active_users, count(*) AS n_events
          FROM e JOIN f ON e.user_id = f.user_id
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // x66: the x6c fixed-point discipline — micro-scaled integer elements,
    // centroid = explicit IEEE half-up over the exact integer sum, squared
    // distance all-integer, so the hash oracle covers the full pipeline
    "x66_embedding_outliers" ->
      """WITH u AS (SELECT vec_id, label, g.i AS i,
              CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
            FROM embeddings, range(1, 65) g(i)),
          s AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv, count(*) AS n
                FROM u GROUP BY 1, 2),
          c AS (SELECT label, i,
                  CAST(floor(CAST(sv AS DOUBLE) / n + 0.5) AS BIGINT) AS cv
                FROM s),
          d AS (SELECT u.vec_id, u.label,
                  CAST(sum((u.v - c.cv) * (u.v - c.cv)) AS BIGINT) AS dist
                FROM u JOIN c ON u.label = c.label AND u.i = c.i GROUP BY 1, 2),
          r AS (SELECT label, vec_id, dist,
                  row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rnk
                FROM d)
          SELECT CAST(label AS BIGINT) AS label, vec_id, dist,
            CAST(rnk AS BIGINT) AS rnk
          FROM r WHERE rnk <= 5 ORDER BY label, rnk""",
    // x68: both snapshots synthesized by the x16 bucket rule, diffed on
    // portable fingerprints — the full-outer manifest join restated
    "x68_snapshot_diff" ->
      s"""WITH d AS (SELECT doc_id, source, text,
              ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS bk FROM documents),
          a AS (SELECT doc_id, source, ${polyHashSql("text")} AS fp,
                  CAST(length(text) AS BIGINT) AS len
                FROM d WHERE bk <= 8),
          bs AS (SELECT doc_id, source,
                   CASE WHEN bk <= 1 THEN text || ' rev2' ELSE text END AS text
                 FROM d WHERE bk <= 7 OR bk = 9),
          b AS (SELECT doc_id, source, ${polyHashSql("text")} AS fp,
                  CAST(length(text) AS BIGINT) AS len FROM bs),
          j AS (SELECT COALESCE(a.source, b.source) AS source,
                  CASE WHEN a.doc_id IS NULL THEN 'added'
                       WHEN b.doc_id IS NULL THEN 'removed'
                       WHEN a.fp = b.fp THEN 'same'
                       ELSE 'changed' END AS status,
                  COALESCE(b.len, 0) - COALESCE(a.len, 0) AS delta
                FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
          SELECT source, status, count(*) AS n_docs,
            CAST(sum(delta) AS BIGINT) AS delta_chars
          FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    "x18_mixture_sample" ->
      s"""SELECT source,
          COALESCE(30 + (TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4) * 20, 100) AS target_pct,
          count(*) AS n_docs,
          CAST(SUM(CASE WHEN ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 100 <
            COALESCE(30 + (TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4) * 20, 100)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          FROM documents GROUP BY 1, 2 ORDER BY 1""",
    "x19_curated_stats" ->
      s"""WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
          t AS (SELECT doc_id, text, $toks AS tk FROM documents),
          q AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                  round((CASE WHEN CAST(len(tk) AS DOUBLE) >= 20 AND CAST(len(tk) AS DOUBLE) <= 1000 THEN 1.0
                              WHEN CAST(len(tk) AS DOUBLE) >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
                        + (CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)) * 0.4
                        + (CAST(len(list_filter(tk, w -> w IN ('the','a','of','and','to','el','la','de','y','que','der','die','das','und','ist','le','et','les','des'))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)) * 0.2, 6) AS quality
                FROM t),
          s AS (SELECT doc_id,
                  CAST(len(list_filter(tk, w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
                  CAST(len(list_filter(tk, w -> w IN ('el','la','de','y','que'))) AS BIGINT) AS s_es,
                  CAST(len(list_filter(tk, w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
                  CAST(len(list_filter(tk, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS s_fr
                FROM t),
          l AS (SELECT doc_id,
                  CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'unknown'
                       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                       WHEN s_de >= s_fr THEN 'de'
                       ELSE 'fr' END AS predicted_lang
                FROM s)
          SELECT predicted_lang, count(*) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
          FROM keepers JOIN q USING (doc_id) JOIN l USING (doc_id)
          WHERE quality >= 0.5
          GROUP BY 1 ORDER BY 1""",
    "x25_stratified_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
            ${polyHashSql("CAST(doc_id AS VARCHAR)")} AS rk FROM documents),
          w AS (SELECT lang, doc_id, CAST(row_number() OVER
                  (PARTITION BY lang ORDER BY rk, doc_id) AS BIGINT) AS pick
                FROM r)
          SELECT lang, pick, doc_id FROM w WHERE pick <= 30
          ORDER BY lang, pick""",
    // sqrt-temperature: IEEE sqrt is correctly rounded so both engines
    // derive identical ppm thresholds; output is all-integer
    "x28_temperature_mixture" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
          s AS (SELECT SUM(sqrt(CAST(n AS DOUBLE))) AS sp,
                       SUM(n) AS tot FROM c),
          r AS (SELECT source, n, CAST(round(least(1.0,
                  (0.5 * tot) * sqrt(CAST(n AS DOUBLE)) / sp / n)
                  * 1000000, 0) AS BIGINT) AS sample_ppm FROM c, s)
          SELECT r.source, CAST(r.n AS BIGINT) AS n_docs, r.sample_ppm,
            CAST(SUM(CASE WHEN ${polyHashSql("CAST(d.doc_id AS VARCHAR)")}
              % 1000000 < r.sample_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          GROUP BY 1, 2, 3 ORDER BY 1""",
    "x31_pagerank" -> Graphs.pagerankOracleSql(),
    "x32_column_profile" -> Profile.columnProfileOracleSql,
    "x33_zorder_layout" -> Layout.zorderOracleSql,
    // same explicit floor(t*255 + 0.5) half-up code as the engine — round()
    // tie-breaking is dialect-specific, floor in double arithmetic is not
    "x35_embed_quantize" ->
      """WITH p AS (SELECT vec_id, embedding,
            CAST(list_min(embedding) AS DOUBLE) AS mn,
            CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings),
          s AS (SELECT vec_id, embedding, mn, mx,
            CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END AS sc FROM p)
          SELECT vec_id, round(mn, 6) AS qmin, round(mx, 6) AS qmax,
            CAST(list_sum(list_transform(embedding, x ->
              CAST(floor((CAST(x AS DOUBLE) - mn) / sc * 255 + 0.5) AS BIGINT)))
              AS BIGINT) AS code_sum,
            round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(embedding, x ->
                abs(CAST(x AS DOUBLE) - (mn +
                  floor((CAST(x AS DOUBLE) - mn) / sc * 255 + 0.5) / 255.0 * sc)))),
              (a, b) -> a + b) / len(embedding), 6) AS mean_abs_err
          FROM s ORDER BY vec_id""",
  )
}
