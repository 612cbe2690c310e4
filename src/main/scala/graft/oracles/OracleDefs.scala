package graft.oracles

/** Shared DuckDB SQL snippet builders, kept byte-equivalent to the Spark
  * expressions they oracle (see each family object). Moved verbatim from
  * `SparkEntry` in the round-11 split. */
object OracleDefs {
  // ---- DuckDB oracle SQL ----------------------------------------------------
  // Shared snippets, kept byte-equivalent to the Spark expressions:
  private[graft] def epochS(c: String) = s"CAST(floor(epoch($c)) AS BIGINT)"
  private[graft] def bucketE(c: String) = s"CAST(floor(epoch($c)/300)*300 AS BIGINT)"
  private[graft] def logdateS(c: String) =
    s"strftime(make_timestamp(CAST(floor(epoch($c)/300)*300 AS BIGINT)*1000000), '%Y%m%d%H%M')"
  private[graft] def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(28,4))) AS DOUBLE)"
  private[graft] val toks = """string_split_regex(trim(lower(text)), '\s+')"""
  private[graft] def polyHashSql(e: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length($e)), i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))), (acc, x) -> (acc * 31 + x) % 1000000007)"
  private[graft] def dotD(a: String, b: String) =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
  // One Lloyd round of the x6f PQ training (assign = argmin integer
  // squared-L2 with ties to the lowest cid; update = integer-floor mean;
  // empty codewords keep their previous value). MATERIALIZED per round —
  // X63: BPE vocabulary retraining, the pqRoundSql discipline for strings —
  // v0 = the top-4096 (freq desc, word asc) corpus words as space-joined
  // char symbols (1-space pad, 2-space joins: every symbol is flanked by
  // spaces, so a literal replace can never match inside a multi-char
  // symbol); each round picks the (count desc, a, b) argmax adjacent pair
  // over the CURRENT symbol sequences and rewrites it everywhere
  // left-to-right (replace() scans left-to-right non-overlapping — the
  // classic BPE application order).
  private[graft] val BpeRounds = 12
  private[graft] def bpeCharsSql(wordExpr: String) =
    s"""' ' || list_reduce(list_transform(
          generate_series(1, length($wordExpr)), i -> substring($wordExpr, i, 1)),
          (a, b) -> a || '  ' || b) || ' '"""
  private[graft] def bpeApplySql(r: Int, col: String) =
    s"""replace($col,
          ' ' || (SELECT a FROM p$r) || '  ' || (SELECT b FROM p$r) || ' ',
          ' ' || (SELECT a FROM p$r) || (SELECT b FROM p$r) || ' ')"""
  private[graft] lazy val bpeTrainCtes: String = {
    val v0 =
      s"""bw AS MATERIALIZED (
            SELECT word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest($toks) AS word FROM documents)
            GROUP BY word ORDER BY freq DESC, word LIMIT 4096),
          v0 AS MATERIALIZED (
            SELECT word, freq, ${bpeCharsSql("word")} AS s FROM bw)"""
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS MATERIALIZED (
            SELECT a, b FROM (
              SELECT sym[i] AS a, sym[i + 1] AS b, SUM(freq) AS c
              FROM (SELECT freq, string_split(trim(s), '  ') AS sym FROM v${r - 1}) t,
                   unnest(generate_series(1, len(sym) - 1)) AS g(i)
              GROUP BY 1, 2)
            ORDER BY c DESC, a, b LIMIT 1),
          v$r AS MATERIALIZED (
            SELECT word, freq, ${bpeApplySql(r, "s")} AS s FROM v${r - 1})"""
    }
    (v0 +: rounds).mkString(",\n          ")
  }

  // DuckDB inlines plain CTEs and an unrolled iteration would explode.
  private[graft] def pqRoundSql(r: Int): String = {
    val prev = s"pqc${r - 1}"
    s"""pqd$r AS MATERIALIZED (
            SELECT u.vec_id, u.s, c.cid, SUM((u.v - c.cv) * (u.v - c.cv)) AS dist
            FROM pqt u JOIN $prev c ON c.s = u.s AND c.j = u.j
            GROUP BY 1, 2, 3),
          pqa$r AS MATERIALIZED (
            SELECT vec_id, s, cid FROM (
              SELECT vec_id, s, cid,
                     row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
              FROM pqd$r) WHERE rn = 1),
          pqc$r AS MATERIALIZED (
            SELECT p.s, p.cid, p.j, COALESCE(n.cv, p.cv) AS cv
            FROM $prev p LEFT JOIN (
              SELECT a.s, a.cid, u.j, CAST(SUM(u.v) // COUNT(*) AS BIGINT) AS cv
              FROM pqa$r a JOIN pqt u ON u.vec_id = a.vec_id AND u.s = a.s
              GROUP BY 1, 2, 3) n ON n.s = p.s AND n.cid = p.cid AND n.j = p.j)"""
  }
  // The x6f PQ training + encode chain (pqu fixed-point view, bounded
  // training sample, 3 unrolled Lloyd rounds, corpus codes, probe-vs-
  // codeword ADC table) — shared by x6f, and by x6g/x6h where the same
  // codes are read cell-pruned.
  private[graft] lazy val pqChainSql: String =
    s"""pqu AS MATERIALIZED (
            SELECT vec_id, CAST((g.i - 1) // 2 AS BIGINT) AS s,
                   CAST((g.i - 1) % 2 AS BIGINT) AS j,
                   CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                     + 2000000 AS v
            FROM embeddings, range(1, 65) g(i)),
          pqt AS MATERIALIZED (
            -- training sample: the engine's SQL-expressible vec_id bound
            -- (Similarity.PqTrainN = 65536); a no-op at fixture scale but
            -- keeps oracle and engine defined-identical at every SF
            SELECT * FROM pqu WHERE vec_id < 65536),
          pqc0 AS MATERIALIZED (
            SELECT s, vec_id AS cid, j, v AS cv FROM pqt WHERE vec_id < 16),
          ${pqRoundSql(1)},
          ${pqRoundSql(2)},
          ${pqRoundSql(3)},
          pqd4 AS MATERIALIZED (
            SELECT u.vec_id, u.s, c.cid, SUM((u.v - c.cv) * (u.v - c.cv)) AS dist
            FROM pqu u JOIN pqc3 c ON c.s = u.s AND c.j = u.j
            GROUP BY 1, 2, 3),
          codes AS MATERIALIZED (
            SELECT vec_id, s, cid FROM (
              SELECT vec_id, s, cid,
                     row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
              FROM pqd4) WHERE rn = 1),
          cdq AS MATERIALIZED (
            SELECT c.s, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS d
            FROM pqc3 c JOIN pqu q ON q.vec_id = 0 AND q.s = c.s AND q.j = c.j
            GROUP BY 1, 2)"""

  // One Lloyd round of the x6b/x6g IVF coarse-quantizer training,
  // replicating Similarity.ivfCentroids operation-for-operation: assign =
  // first-max cosine argmax (list_dot_product is a sequential left-to-
  // right double fold — verified — matching DotProduct's codegen order;
  // ties to the lowest cell), update = micro-scaled exact integer sums
  // with true floor division (DuckDB `//` truncates, so floorDiv is
  // emulated for negative sums), empty cells keep their previous
  // centroid.
  private[graft] def ivfRoundSql(r: Int): String = {
    val prev = s"ic${r - 1}"
    s"""ia$r AS MATERIALIZED (
            SELECT vec_id, cell FROM (
              SELECT t.vec_id, c.cell,
                     row_number() OVER (PARTITION BY t.vec_id
                       ORDER BY list_dot_product(t.e, c.c)
                         / GREATEST(sqrt(list_dot_product(c.c, c.c)), 1e-12)
                         DESC, c.cell) AS rn
              FROM tr t CROSS JOIN $prev c) WHERE rn = 1),
          is$r AS MATERIALIZED (
            SELECT cell, list(CAST(fd AS DOUBLE) / 1000000 ORDER BY d) AS c
            FROM (SELECT a.cell AS cell, m.d AS d,
                    CASE WHEN SUM(m.m) % COUNT(*) <> 0 AND SUM(m.m) < 0
                         THEN SUM(m.m) // COUNT(*) - 1
                         ELSE SUM(m.m) // COUNT(*) END AS fd
                  FROM ia$r a JOIN trm m ON m.vec_id = a.vec_id
                  GROUP BY 1, 2) sums
            GROUP BY cell),
          ic$r AS MATERIALIZED (
            SELECT p.cell, COALESCE(n.c, p.c) AS c
            FROM $prev p LEFT JOIN is$r n ON n.cell = p.cell)"""
  }

  // The full IVF chain shared by x6b/x6g/x6h: retrain the 16-cell coarse
  // quantizer (4 Lloyd rounds over the vec_id < 65536 sample, seeds = the
  // 16 lowest vec_ids), pick the probe's nprobe=4 cells by centroid
  // cosine, and assign every corpus vector to its trained cell
  // (Similarity.assignCell: dot/||c|| argmax, row norm cancels).
  private[graft] lazy val ivfChainSql: String =
    s"""tr AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id < 65536),
          trm AS MATERIALIZED (
            SELECT vec_id, g.i AS d,
                   CAST(round(e[g.i] * 1000000) AS BIGINT) AS m
            FROM tr, range(1, 65) g(i)),
          ic0 AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
                   e AS c
            FROM (SELECT vec_id, e FROM tr ORDER BY vec_id LIMIT 16) seeds),
          ${ivfRoundSql(1)},
          ${ivfRoundSql(2)},
          ${ivfRoundSql(3)},
          ${ivfRoundSql(4)},
          qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id = 0),
          probed AS MATERIALIZED (
            SELECT cell FROM ic4, qv
            ORDER BY list_dot_product(c, qe)
              / (sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(qe, qe)))
              DESC, cell LIMIT 4),
          asg AS MATERIALIZED (
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, c.cell,
                     row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY list_dot_product(CAST(v.embedding AS DOUBLE[]), c.c)
                         / GREATEST(sqrt(list_dot_product(c.c, c.c)), 1e-12)
                         DESC, c.cell) AS rn
              FROM embeddings v CROSS JOIN ic4 c) WHERE rn = 1)"""

  // The composed x6g/x6h replay over both retrained quantizers:
  // cell-pruned candidates, ADC shortlist-50, exact integer-L2 rerank.
  // `candExtra` injects an additional candidate-set predicate — x83/x84
  // exclude tombstoned vectors HERE (not at the final rank: dropping
  // index rows changes which 50 survivors reach the shortlist).
  // The shortlist + rerank CTEs alone (no WITH, no final SELECT) — shared
  // by the standalone x6g/x83 oracles and the multi-artifact conjunction
  // oracle's `ann` leg, which splices them into its own WITH list.
  private[graft] def ivfPqCandExactCtes(candExtra: String): String =
    s"""cand AS MATERIALIZED (
            SELECT c.vec_id FROM codes c
            JOIN asg a ON a.vec_id = c.vec_id
            JOIN probed p ON p.cell = a.cell
            JOIN cdq ON cdq.s = c.s AND cdq.cid = c.cid
            WHERE c.vec_id <> 0$candExtra
            GROUP BY 1 ORDER BY SUM(cdq.d), c.vec_id LIMIT 50),
          exact AS (
            SELECT u.vec_id, CAST(SUM((u.v - q.v) * (u.v - q.v)) AS BIGINT) AS l2_dist
            FROM pqu u JOIN pqu q ON q.vec_id = 0 AND q.s = u.s AND q.j = u.j
            JOIN cand ON cand.vec_id = u.vec_id
            GROUP BY 1)"""

  private[graft] def ivfPqOracleSqlWhere(candExtra: String): String =
    s"""WITH $pqChainSql,
          $ivfChainSql,
          ${ivfPqCandExactCtes(candExtra)}
          SELECT vec_id, l2_dist FROM exact
          ORDER BY l2_dist, vec_id LIMIT 10"""

  private[graft] lazy val ivfPqOracleSql: String = ivfPqOracleSqlWhere("")

  // Shared by a2e (batch, no filter) and t16 (stream — the timeline CTE
  // additionally carries t1b's watermark flush rule; sound to push inside
  // because trailing windows look strictly BACKWARD and the unflushed
  // buckets are a per-category suffix, so flags∘filter = filter∘flags):
  // trailing-window z-flags, the test cross-multiplied into pure integers.
  private[graft] def a2eOracleSql(having: String = ""): String = {
    // the (trail, minN, k²) literals come from the ONE shared constant
    // triple (Counters.Anomaly*) — the engine, the stream, and this
    // oracle can no longer drift apart
    val (trail, minN, k2) = (graft.operators.Counters.AnomalyTrail,
      graft.operators.Counters.AnomalyMinN,
      graft.operators.Counters.AnomalyK * graft.operators.Counters.AnomalyK)
    s"""WITH c AS (SELECT event_type AS category, ${bucketE("ts")} AS bucket_epoch,
            count(*) AS cnt
          FROM events GROUP BY 1, 2$having),
        w AS (SELECT category, bucket_epoch, cnt,
            count(cnt) OVER tw AS tn,
            coalesce(sum(cnt) OVER tw, 0) AS ts_,
            coalesce(sum(CAST(cnt AS HUGEINT) * cnt) OVER tw, 0) AS tss
          FROM c
          WINDOW tw AS (PARTITION BY category ORDER BY bucket_epoch
              ROWS BETWEEN $trail PRECEDING AND 1 PRECEDING))
        SELECT category, bucket_epoch, cnt, CAST(tn AS BIGINT) AS trail_n,
          CAST(CASE WHEN tn >= $minN
              AND CAST(tn * cnt - ts_ AS HUGEINT) * (tn * cnt - ts_)
                > $k2 * (tn * tss - CAST(ts_ AS HUGEINT) * ts_)
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM w ORDER BY category, bucket_epoch"""
  }

  // Shared by j13 and j14: the SCD-2 dimension build (gaps-and-islands →
  // validity intervals) as a reusable CTE chain ending in `dim`.
  private[graft] lazy val scd2Cte =
    s"""m AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
            CASE WHEN lag(o_orderpriority) OVER w IS NULL
                   OR lag(o_orderpriority) OVER w <> o_orderpriority
                 THEN 1 ELSE 0 END AS chg
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
          i AS (SELECT o_custkey, o_orderpriority,
                  CAST(SUM(chg) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS version,
                  o_orderdate
                FROM m),
          g AS (SELECT o_custkey, version, min(o_orderpriority) AS priority,
                  min(${epochS("o_orderdate")}) AS valid_from
                FROM i GROUP BY 1, 2),
          dim AS (SELECT o_custkey, version, priority, valid_from,
                  lead(valid_from) OVER w2 AS valid_to,
                  (lead(valid_from) OVER w2 IS NULL) AS is_current
                  FROM g WINDOW w2 AS (PARTITION BY o_custkey ORDER BY version))"""

  // Shared by x4 and x36: the exact n-gram Jaccard pair set (J >= 0.8) as
  // a CTE chain ending in `pairs(id1, id2, jaccard)` — the oracle states
  // the brute-force form; the engine's ppjoin prefix filter must be
  // lossless against it.
  private[graft] lazy val jaccardPairsCte =
    s"""docs AS (SELECT doc_id, $toks AS toks FROM documents),
          sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
                 FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
                 WHERE len(toks) >= 3),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
                    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
          pairs AS (
            SELECT id1, id2, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
            WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.8)"""

  // Shared by x17 and x17b: the Bloom pre-filter variant must reproduce
  // the exact rows (no false negatives), so both check against one SQL.
  private[graft] lazy val x17Oracle =
    s"""WITH b AS (SELECT doc_id,
          ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS h FROM documents),
        docs AS (SELECT doc_id, $toks AS tk FROM documents),
        sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
               FROM docs, unnest(generate_series(1, len(tk) - 2)) AS t(i)
               WHERE len(tk) >= 3),
        rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM sh GROUP BY 1)
                 WHERE df <= 50),
        f AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
        bench AS (SELECT doc_id FROM b WHERE h = 9),
        train AS (SELECT doc_id FROM b WHERE h <= 7),
        shared AS (
          SELECT fb.doc_id AS bench_id, ft.doc_id AS train_id, count(*) AS n_shared
          FROM f fb JOIN bench bn ON fb.doc_id = bn.doc_id
          JOIN f ft ON fb.s = ft.s
          JOIN train tr ON ft.doc_id = tr.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 5),
        per AS (SELECT bench_id, count(*) AS n_hits, max(n_shared) AS max_shared
                FROM shared GROUP BY 1)
        SELECT bench.doc_id, coalesce(n_hits, 0) AS n_contaminating,
               coalesce(max_shared, 0) AS max_shared
        FROM bench LEFT JOIN per ON bench.doc_id = per.bench_id
        ORDER BY doc_id"""
  private[graft] def cosineD(a: String, b: String) =
    s"${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)}))"

  /** x20's BM25 top-k over an optionally-restricted corpus: shared
    * verbatim by x78 (append-FOLDED stats), with the tombstone survivors
    * as the corpus by x81 (retraction-folded stats), with the upsert set
    * by x82/t21, and with the doomed-residue survivors as the bm25 leg of
    * the x94/t26 orchestrator — the monolithic recompute IS the
    * fold-correctness statement in every direction. Restricting the `d`
    * CTE restricts stats AND scoring. */
  private[graft] def bm25TopKSqlOver(where: String): String =
    s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl,
          CAST(len(list_filter($toks, w -> w = 'spark')) AS DOUBLE) AS tf0,
          CAST(len(list_filter($toks, w -> w = 'join')) AS DOUBLE) AS tf1,
          CAST(len(list_filter($toks, w -> w = 'window')) AS DOUBLE) AS tf2
          FROM documents$where),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
          SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
          SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
          SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
          FROM d),
        scored AS (SELECT doc_id,
          CAST(tf0 AS BIGINT) AS tf_spark, CAST(tf1 AS BIGINT) AS tf_join,
          CAST(tf2 AS BIGINT) AS tf_window,
          round(ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)
                  / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
              + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)
                  / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
              + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)
                  / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
          FROM d, s)
        SELECT * FROM scored WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id LIMIT 10"""

  // The winnowing span-fingerprint chain shared by x54/x56/x57
  // (TextAnalysis.spanIndex): per-position 8-gram hashes, each 16-window
  // selects its (hash, pos)-minimum anchor, anchors fingerprint their
  // 64-char span with the portable rolling hash.
  private[graft] lazy val winnowSpansSql =
    s"""pos AS MATERIALIZED (
            SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS p
            FROM documents WHERE length(text) >= 64),
          kg AS MATERIALIZED (
            SELECT doc_id, text, p, ${polyHashSql("substring(text, p, 8)")} AS kh
            FROM pos),
          win AS (
            SELECT doc_id, text, p,
              min(struct_pack(h := kh, p := p)) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS m
            FROM kg),
          anch AS (
            SELECT DISTINCT doc_id, text, m.p AS p FROM win
            WHERE p <= length(text) - 22 AND m.p <= length(text) - 63),
          sp AS MATERIALIZED (
            SELECT doc_id, p, ${polyHashSql("substring(text, p, 64)")} AS h
            FROM anch)"""

  // The substring-contamination probe shared VERBATIM by x58 (batch),
  // t13 (the same probe as a streaming execution) and x60 (the same
  // probe over an incrementally appended span index) — all three are
  // row-identical by construction, so one oracle serves them.
  private[graft] lazy val contaminationOracleSql =
    s"""WITH $winnowSpansSql,
          b AS (SELECT doc_id,
                  ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS bk
                FROM documents),
          priorh AS (SELECT DISTINCT sp.h FROM sp
                     JOIN b ON b.doc_id = sp.doc_id AND b.bk <= 7),
          newsp AS (SELECT sp.doc_id, sp.h FROM sp
                    JOIN b ON b.doc_id = sp.doc_id AND b.bk >= 8)
          SELECT n.doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_spans,
            CAST(SUM(CASE WHEN p.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hit_spans,
            CAST(SUM(CASE WHEN p.h IS NOT NULL THEN 1 ELSE 0 END) * 1000000
              // COUNT(*) AS BIGINT) AS hit_ppm
          FROM newsp n LEFT JOIN priorh p ON p.h = n.h
          GROUP BY n.doc_id ORDER BY n.doc_id"""

  // x54's per-doc coverage table over the winnowing spans (also the
  // x57 rollup input): shared spans, gaps-and-islands interval union,
  // per-doc counts.
  private[graft] lazy val subdupPerDocSql =
    s"""$winnowSpansSql,
          multi AS (SELECT h FROM sp GROUP BY h
                    HAVING MIN(doc_id) <> MAX(doc_id)),
          sh AS (SELECT doc_id, p FROM sp WHERE h IN (SELECT h FROM multi)),
          isl AS (SELECT doc_id, p,
              CASE WHEN p > coalesce(MAX(p + 63) OVER (PARTITION BY doc_id
                ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1) THEN 1 ELSE 0 END AS ni
            FROM sh),
          grp AS (SELECT doc_id, p,
              SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM isl),
          cov AS (SELECT doc_id, SUM(mx - mn + 64) AS covered FROM
              (SELECT doc_id, g, MIN(p) AS mn, MAX(p) AS mx FROM grp
               GROUP BY 1, 2) GROUP BY 1),
          agg AS (SELECT sp.doc_id, COUNT(*) AS n_spans,
              SUM(CASE WHEN sh.p IS NOT NULL THEN 1 ELSE 0 END) AS n_shared,
              MIN(sh.p) AS first_shared
            FROM sp LEFT JOIN sh ON sp.doc_id = sh.doc_id AND sp.p = sh.p
            GROUP BY 1),
          perdoc AS (SELECT d.doc_id,
            CAST(coalesce(agg.n_spans, 0) AS BIGINT) AS n_spans,
            CAST(coalesce(agg.n_shared, 0) AS BIGINT) AS n_shared_spans,
            CAST(coalesce(agg.first_shared, 0) AS BIGINT) AS first_shared_pos,
            CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_chars,
            CAST(CASE WHEN coalesce(cov.covered, 0) = 0 THEN 0
                 ELSE cov.covered * 1000000 // length(d.text) END AS BIGINT)
              AS covered_ppm
          FROM documents d
          LEFT JOIN agg ON agg.doc_id = d.doc_id
          LEFT JOIN cov ON cov.doc_id = d.doc_id)"""

}
