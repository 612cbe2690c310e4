package graft.oracles

/** DuckDB oracle SQL — the text-analysis family: language id, quality, tokenization/BPE, retrieval, entropy/surprisal, packing.
  * Split from `SparkEntry` (round 11 housekeeping): the declaration table
  * there stays reviewable; each family object carries only its SQL. All
  * shared snippet builders live in [[OracleDefs]].
  */
object TextOracles {
  import OracleDefs._

  private val bm25TopKSql: String = bm25TopKSqlOver("")

  /** x81: the same query over the tombstone SURVIVORS — the oracle IS the
    * monolithic recompute after deletes, so the green hash states
    * retract(stats(C), stats(D)) ≡ stats(C \ D) through the scoring. */
  private val bm25DeleteSql: String = bm25TopKSqlOver(
    s" WHERE NOT (${polyHashSql("CAST(doc_id AS VARCHAR)")} % 11 = 0)")

  /** x82: the same query over (stored survivors ∪ inserts) — a doc
    * survives if it is an insert (hash%3 = 2, exempt from tombstones) or
    * a stored doc missing the x81 tombstone; the monolithic recompute
    * over that set is the upsert-fold correctness statement. */
  private val bm25UpsertSql: String = bm25TopKSqlOver(
    s""" WHERE ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 3 = 2
            OR NOT (${polyHashSql("CAST(doc_id AS VARCHAR)")} % 11 = 0)""")

  private[graft] def sql: Map[String, String] = Map(
    "x7_lang_id" ->
      s"""WITH scored AS (SELECT doc_id, lang AS labeled_lang,
            CAST(len(list_filter($toks, w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
            CAST(len(list_filter($toks, w -> w IN ('el','la','de','y','que'))) AS BIGINT) AS s_es,
            CAST(len(list_filter($toks, w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
            CAST(len(list_filter($toks, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS s_fr
          FROM documents)
          SELECT doc_id, labeled_lang, s_en, s_es, s_de, s_fr,
            CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'unknown'
                 WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                 WHEN s_de >= s_fr THEN 'de'
                 ELSE 'fr' END AS predicted_lang
          FROM scored ORDER BY doc_id""",
    // x59: x7's prediction cross-tabulated against the label
    "x59_lang_confusion" ->
      s"""WITH scored AS (SELECT doc_id, lang AS labeled_lang,
            CAST(len(list_filter($toks, w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
            CAST(len(list_filter($toks, w -> w IN ('el','la','de','y','que'))) AS BIGINT) AS s_es,
            CAST(len(list_filter($toks, w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
            CAST(len(list_filter($toks, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS s_fr
          FROM documents),
          pred AS (SELECT labeled_lang,
            CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'unknown'
                 WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                 WHEN s_de >= s_fr THEN 'de'
                 ELSE 'fr' END AS predicted_lang
          FROM scored)
          SELECT labeled_lang, predicted_lang, count(*) AS n_docs
          FROM pred GROUP BY 1, 2 ORDER BY 1, 2""",
    "x8_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS tk FROM documents),
          s AS (SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CAST(len(tk) AS DOUBLE) AS n_tok,
            CAST(len(list_distinct(tk)) AS DOUBLE) AS n_uniq,
            CAST(len(list_filter(tk, w -> w IN ('the','a','of','and','to','el','la','de','y','que','der','die','das','und','ist','le','et','les','des'))) AS DOUBLE) AS n_stop,
            CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) AS n_punct,
            CAST(length(text) AS DOUBLE) AS n_chars_d
          FROM t)
          SELECT doc_id, n_tokens,
            round(n_uniq / n_tok, 6) AS uniq_ratio,
            round(n_stop / n_tok, 6) AS stop_ratio,
            round(n_punct / n_chars_d, 6) AS punct_ratio,
            round((CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0 WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
                  + (n_uniq / n_tok) * 0.4 + (n_stop / n_tok) * 0.2, 6) AS quality
          FROM s ORDER BY doc_id""",
    "x9_token_counts" ->
      s"""SELECT lang, count(*) AS n_docs,
          CAST(SUM(len($toks)) AS BIGINT) AS total_ws_tokens,
          CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS total_bpeish_tokens,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY 1 ORDER BY 1""",
    "x42_token_histogram" ->
      s"""WITH d AS (SELECT lang, CAST(len($toks) AS BIGINT) AS n_tok FROM documents)
          SELECT lang, n_tok // 64 AS bucket, count(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
          MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens
          FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    "x45_quality_dup_calibration" ->
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
          csize AS (SELECT cluster_id, count(*) AS n_members FROM labels GROUP BY 1),
          dup AS (SELECT l.doc_id, CAST(c.n_members > 1 AS BIGINT) AS is_dup
                  FROM labels l JOIN csize c USING (cluster_id)),
          q AS (SELECT doc_id,
                  round((CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0
                              WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
                        + (n_uniq / n_tok) * 0.4 + (n_stop / n_tok) * 0.2, 6) AS quality
                FROM (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS n_tok,
                        CAST(len(list_distinct(tk)) AS DOUBLE) AS n_uniq,
                        CAST(len(list_filter(tk, w -> w IN ('the','a','of','and','to','el','la','de','y','que','der','die','das','und','ist','le','et','les','des'))) AS DOUBLE) AS n_stop
                      FROM docs))
          SELECT CAST(least(floor(quality * 10), 9) AS BIGINT) AS q_bucket,
                 count(*) AS n_docs, CAST(sum(is_dup) AS BIGINT) AS n_dup,
                 CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
          FROM q JOIN dup USING (doc_id)
          GROUP BY 1 ORDER BY 1""",
    "x47_bpe_pair_counts" ->
      s"""WITH w AS (SELECT t AS w, count(*) AS freq
                     FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
          p AS (SELECT substr(w.w, t.j, 2) AS pair, w.freq
                FROM w, unnest(generate_series(1, length(w.w) - 1)) AS t(j)
                WHERE length(w.w) >= 2)
          SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 50""",
    "x48_triangle_counts" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, t
                      FROM (SELECT doc_id, unnest($toks) AS t FROM documents)),
          dfreq AS (SELECT t, count(*) AS df FROM dt GROUP BY 1),
          vocab AS (SELECT t, df FROM dfreq ORDER BY df DESC, t LIMIT 200),
          dv AS (SELECT dt.doc_id, dt.t FROM dt JOIN vocab USING (t)),
          e AS (SELECT a.t AS t1, b.t AS t2
                FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.t < b.t
                GROUP BY 1, 2 HAVING count(*) >= 5),
          tri AS (SELECT e1.t1 AS x, e1.t2 AS y, e2.t2 AS z
                  FROM e e1 JOIN e e2 ON e2.t1 = e1.t2
                            JOIN e e3 ON e3.t1 = e1.t1 AND e3.t2 = e2.t2),
          corners AS (SELECT x AS t FROM tri UNION ALL SELECT y FROM tri
                      UNION ALL SELECT z FROM tri)
          SELECT t, count(*) AS n_triangles FROM corners GROUP BY 1 ORDER BY 1""",
    "x43_cooccur_lift" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, t
                      FROM (SELECT doc_id, unnest($toks) AS t FROM documents)),
          dfreq AS (SELECT t, count(*) AS df FROM dt GROUP BY 1),
          vocab AS (SELECT t, df FROM dfreq ORDER BY df DESC, t LIMIT 200),
          dv AS (SELECT dt.doc_id, dt.t FROM dt JOIN vocab USING (t)),
          pairs AS (SELECT a.t AS t1, b.t AS t2, count(*) AS n_ab
                    FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.t < b.t
                    GROUP BY 1, 2),
          n AS (SELECT count(*) AS nd FROM documents)
          SELECT t1, t2, n_ab, va.df AS n_a, vb.df AS n_b,
                 CAST(n_ab * nd * 1000000 // (va.df * vb.df) AS BIGINT) AS lift_ppm
          FROM pairs JOIN vocab va ON va.t = t1 JOIN vocab vb ON vb.t = t2, n
          WHERE n_ab >= 5
          ORDER BY lift_ppm DESC, t1, t2 LIMIT 50""",
    "x30_chunk_windows" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents),
          s AS (SELECT doc_id, tk,
                  unnest(generate_series(1, greatest(len(tk), 1), 32)) AS start
                FROM d)
          SELECT doc_id,
            CAST((start - 1) // 32 AS BIGINT) AS chunk_idx,
            CAST(start AS BIGINT) AS start_tok,
            CAST(len(list_slice(tk, start, start + 63)) AS BIGINT) AS n_tok,
            md5(array_to_string(list_slice(tk, start, start + 63), ' ')) AS chunk_md5
          FROM s ORDER BY doc_id, chunk_idx""",
    "x37_ngram_novelty" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
          sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
                 FROM docs, unnest(generate_series(1, len(tk) - 2)) AS t(i)
                 WHERE len(tk) >= 3),
          fst AS (SELECT s, min(doc_id) AS m FROM sh GROUP BY 1),
          per AS (SELECT doc_id, count(*) AS n_shingles,
                         count(CASE WHEN m = doc_id THEN 1 END) AS n_novel
                  FROM sh JOIN fst USING (s) GROUP BY 1)
          SELECT d.doc_id,
            CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
            CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
            CAST(CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0
                 ELSE coalesce(n_novel, 0) * 1000000 // n_shingles END AS BIGINT)
              AS novelty_ppm
          FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    "x38_source_vocab_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, t
                      FROM documents, unnest($toks) AS u(t)),
          spread AS (SELECT t, count(*) AS n_sources FROM st GROUP BY 1),
          agg AS (SELECT source, count(*) AS vocab,
                         count(CASE WHEN n_sources >= 2 THEN 1 END) AS shared_vocab
                  FROM st JOIN spread USING (t) GROUP BY 1)
          SELECT source, CAST(vocab AS BIGINT) AS vocab,
            CAST(shared_vocab AS BIGINT) AS shared_vocab,
            CAST(vocab - shared_vocab AS BIGINT) AS exclusive_vocab,
            CAST(shared_vocab * 1000000 // vocab AS BIGINT) AS shared_ppm
          FROM agg ORDER BY source""",
    "x10_fingerprint" ->
      s"""SELECT doc_id,
          ${polyHashSql("text")} AS fp,
          ${polyHashSql("substring(text, 1, 32)")} AS fp_prefix
          FROM documents ORDER BY doc_id""",
    // x63: DuckDB retrains the same 12 BPE merges (bounded top-4096 word
    // sample, integer counts, total-order ties) and restates the merge table
    "x63_bpe_merges" ->
      s"""WITH $bpeTrainCtes
          SELECT * FROM (
            ${(1 to BpeRounds).map(r =>
              s"SELECT CAST($r AS BIGINT) AS rank, a AS lhs, b AS rhs, a || b AS merged FROM p$r")
              .mkString("\n            UNION ALL ")}
          ) ORDER BY rank""",
    // x63b: the retrained merges applied to EVERY distinct corpus word
    // (merges come from the bounded train sample; application is
    // corpus-wide), joined back through each doc's words per source
    "x63b_bpe_encode_stats" ->
      s"""WITH $bpeTrainCtes,
          aw0 AS MATERIALIZED (
            SELECT word, ${bpeCharsSql("word")} AS s
            FROM (SELECT DISTINCT unnest($toks) AS word FROM documents)),
          ${(1 to BpeRounds).map(r =>
            s"""aw$r AS MATERIALIZED (
            SELECT word, ${bpeApplySql(r, "s")} AS s FROM aw${r - 1})""")
            .mkString(",\n          ")},
          wn AS (SELECT word,
                   CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n
                 FROM aw$BpeRounds),
          dw AS (SELECT doc_id, unnest($toks) AS word FROM documents)
          SELECT d.source, CAST(count(*) AS BIGINT) AS n_tokens_ws,
            CAST(SUM(wn.n) AS BIGINT) AS n_tokens_bpe,
            CAST(SUM(wn.n) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS bpe_ppm
          FROM dw JOIN wn USING (word) JOIN documents d ON d.doc_id = dw.doc_id
          GROUP BY d.source ORDER BY d.source""",
    // x67: occurrences keyed by the portable polyhash on BOTH engines (a
    // collision merges the same counts on each side), rates integer ppm
    "x67_token_rarity" ->
      s"""WITH t0 AS (SELECT doc_id, unnest($toks) AS w FROM documents),
          t AS (SELECT doc_id, ${polyHashSql("w")} AS h FROM t0),
          cf AS (SELECT h, count(*) AS c FROM t GROUP BY 1),
          tot AS (SELECT count(*) AS n FROM t),
          pd AS (SELECT t.doc_id, count(*) AS n_tok,
                   CAST(sum(cf.c) AS BIGINT) AS sum_cf,
                   CAST(count(CASE WHEN cf.c <= 2 THEN 1 END) AS BIGINT) AS rare_cnt
                 FROM t JOIN cf USING (h) GROUP BY 1)
          SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
            sum_cf * 1000000 // (tot.n * n_tok) AS mean_cf_ppm,
            rare_cnt * 1000000 // n_tok AS rare_ppm
          FROM pd, tot ORDER BY doc_id""",
    // x71: integer surprisal — bit length of T//c, no floating log; both
    // engines' bin() render minimal binary strings
    "x71_unigram_surprisal" ->
      s"""WITH t0 AS (SELECT doc_id, unnest($toks) AS w FROM documents),
          t AS (SELECT doc_id, ${polyHashSql("w")} AS h FROM t0),
          cf AS (SELECT h, count(*) AS c FROM t GROUP BY 1),
          tot AS (SELECT count(*) AS n FROM t),
          sc AS (SELECT t.doc_id,
                   CAST(length(bin(tot.n // cf.c)) AS BIGINT) AS s
                 FROM t JOIN cf USING (h), tot),
          agg AS (SELECT doc_id, count(*) AS n_tokens,
                    CAST(sum(s) AS BIGINT) AS sum_bits
                  FROM sc GROUP BY 1)
          SELECT doc_id, n_tokens, sum_bits,
            sum_bits * 1000 // n_tokens AS mean_millibits
          FROM agg ORDER BY doc_id""",
    // x71b: conditional surprisal — head count over bigram count, same
    // integer bit-length form; pair hashed w1||' '||w2 (x4 convention)
    "x71b_bigram_surprisal" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
          b0 AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
                 FROM docs, unnest(generate_series(1, len(tk) - 1)) AS t(i)
                 WHERE len(tk) >= 2),
          b AS (SELECT doc_id, ${polyHashSql("w1")} AS h1,
                  ${polyHashSql("w1 || ' ' || w2")} AS h12
                FROM b0),
          c1 AS (SELECT h1, count(*) AS c1 FROM b GROUP BY 1),
          c12 AS (SELECT h12, count(*) AS c12 FROM b GROUP BY 1),
          sc AS (SELECT b.doc_id,
                   CAST(length(bin(c1.c1 // c12.c12)) AS BIGINT) AS s
                 FROM b JOIN c1 USING (h1) JOIN c12 USING (h12)),
          agg AS (SELECT doc_id, count(*) AS n_bigrams,
                    CAST(sum(s) AS BIGINT) AS sum_bits
                  FROM sc GROUP BY 1)
          SELECT doc_id, n_bigrams, sum_bits,
            sum_bits * 1000 // n_bigrams AS mean_millibits
          FROM agg ORDER BY doc_id""",
    "x15_tfidf_top_terms" ->
      s"""WITH terms AS (SELECT doc_id, lang, unnest($toks) AS term FROM documents),
          tf AS (SELECT lang, term, count(*) AS tf FROM terms GROUP BY 1, 2),
          df AS (SELECT term, count(*) AS df
                 FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
          n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
          scored AS (SELECT lang, term, round(tf * ln(nd / df), 6) AS tfidf
                     FROM tf JOIN df USING (term), n),
          ranked AS (SELECT lang, term, tfidf,
                       row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rnk
                     FROM scored)
          SELECT lang, CAST(rnk AS BIGINT) AS rnk, term, tfidf
          FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk""",
    "x20_bm25_topk" -> bm25TopKSql,
    // x78: BM25 over append-folded stats — same monolithic oracle as x20:
    // hash equality states fold(stats(A), stats(B)) ≡ stats(A ∪ B) through
    // the full scoring arithmetic
    "x78_bm25_append" -> bm25TopKSql,
    "x81_bm25_delete" -> bm25DeleteSql,
    "x82_bm25_upsert" -> bm25UpsertSql,
    // t21: x82's upsert fold as a micro-batch STREAM over the stored
    // stats artifacts — the oracle is x82's verbatim, so the green hash
    // states the streamed folds converge to the one-shot upsert fold
    "t21_stream_bm25_stats" -> bm25UpsertSql,
    // both legs rank by ROUNDED score with id tie-break, so candidate
    // cutoffs and ranks agree cross-engine; RRF = sum of 1/(60+rank)
    "x29_hybrid_rrf" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl,
            CAST(len(list_filter($toks, w -> w = 'spark')) AS DOUBLE) AS tf0,
            CAST(len(list_filter($toks, w -> w = 'join')) AS DOUBLE) AS tf1,
            CAST(len(list_filter($toks, w -> w = 'window')) AS DOUBLE) AS tf2
            FROM documents),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
            SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
            SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
            SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
            FROM d),
          scored AS (SELECT doc_id,
            round(ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)
                    / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)
                    / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)
                    / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
            FROM d, s),
          kwc AS (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
                  ORDER BY bm25 DESC, doc_id LIMIT 50),
          kw AS (SELECT doc_id, CAST(row_number() OVER
                   (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r1 FROM kwc),
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          vc AS (SELECT vec_id AS doc_id,
                   round(${cosineD("embedding", "qe")}, 6) AS cos
                 FROM embeddings, q WHERE vec_id <> 0
                 ORDER BY cos DESC, doc_id LIMIT 50),
          v AS (SELECT doc_id, CAST(row_number() OVER
                  (ORDER BY cos DESC, doc_id) AS BIGINT) AS r2 FROM vc),
          f AS (SELECT coalesce(kw.doc_id, v.doc_id) AS doc_id,
                  kw.r1 AS kw_rank, v.r2 AS vec_rank,
                  round(coalesce(1.0 / (60 + kw.r1), 0)
                      + coalesce(1.0 / (60 + v.r2), 0), 6) AS rrf
                FROM kw FULL JOIN v ON kw.doc_id = v.doc_id)
          SELECT doc_id, kw_rank, vec_rank, rrf FROM f
          ORDER BY rrf DESC, doc_id LIMIT 10""",
    "x21_sequence_pack" ->
      s"""WITH d AS (SELECT source, doc_id, CAST(len($toks) AS BIGINT) AS n_tok
            FROM documents),
          c AS (SELECT source, n_tok,
            SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
          SELECT source, CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS chunk_id,
            count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "x21b_global_pack" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok
            FROM documents),
          c AS (SELECT n_tok,
            SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
          SELECT CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS chunk_id,
            count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
          FROM c GROUP BY 1 ORDER BY 1""",
    // regex patterns stay in the Java∩RE2 common dialect; DuckDB's
    // regexp_replace needs the explicit 'g' flag Spark applies by default
    "x23_pii_redact" ->
      """WITH s AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
             '.7 ref ' || CAST(100000000 + doc_id AS VARCHAR) AS synth
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(synth, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(synth, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(synth, '\b\d{9,}\b')) AS BIGINT) AS n_ids,
           regexp_replace(regexp_replace(regexp_replace(synth,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{9,}\b', '<ID>', 'g') AS redacted_text
         FROM s ORDER BY doc_id""",
    "x24_repetition" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS toks FROM documents),
          sh AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
                 FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
                 WHERE len(toks) >= 3),
          agg AS (SELECT doc_id, count(*) AS total, count(DISTINCT s) AS dis
                  FROM sh GROUP BY 1)
          SELECT d.doc_id,
            CAST(coalesce(a.total, 0) AS BIGINT) AS n_3grams,
            CAST(coalesce(a.dis, 0) AS BIGINT) AS n_distinct,
            round(CASE WHEN a.total IS NULL THEN 0.0
              ELSE CAST(a.total - a.dis AS DOUBLE) / a.total END, 6) AS dup_frac,
            (CASE WHEN a.total IS NULL THEN 0.0
              ELSE CAST(a.total - a.dis AS DOUBLE) / a.total END) <= 0.2 AS keep
          FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
          ORDER BY doc_id""",
    "x26_quality_filter" ->
      s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
          m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0 THEN
              CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                / len(toks) ELSE 0.0 END AS mean_len,
            coalesce(list_max(list_transform(toks,
              t -> CAST(length(t) AS BIGINT))), 0) AS max_len,
            list_has_any(toks, ['the','a','of','and','to','in']) AS has_stop
          FROM d)
          SELECT doc_id, n_tokens, round(mean_len, 6) AS mean_tok_len,
            n_tokens >= 20 AS ok_min_tokens,
            (mean_len >= 2.5 AND mean_len <= 10.0) AS ok_mean_len,
            max_len <= 20 AS ok_max_len,
            has_stop AS ok_stopword,
            (n_tokens >= 20 AND mean_len >= 2.5 AND mean_len <= 10.0
             AND max_len <= 20 AND has_stop) AS keep,
            CASE WHEN NOT (n_tokens >= 20) THEN 'min_tokens'
                 WHEN NOT (mean_len >= 2.5 AND mean_len <= 10.0) THEN 'mean_len'
                 WHEN NOT (max_len <= 20) THEN 'max_len'
                 WHEN NOT has_stop THEN 'stopword'
                 ELSE 'ok' END AS reason
          FROM m ORDER BY doc_id""",
    "x27_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS term FROM documents),
          c AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
          a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                  count(*) AS n_types,
                  SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clog
                FROM c GROUP BY 1)
          SELECT doc_id, n AS n_tokens, n_types,
            round(log2(CAST(n AS DOUBLE)) - clog / n, 6) AS entropy_bits,
            round(CAST(n_types AS DOUBLE) / n, 6) AS ttr
          FROM a ORDER BY doc_id""",
    "x22_length_quantiles" ->
      s"""SELECT lang, count(*) AS n_docs,
            round(quantile_cont(n_tok, 0.25), 6) AS p25,
            round(quantile_cont(n_tok, 0.5), 6) AS p50,
            round(quantile_cont(n_tok, 0.9), 6) AS p90,
            round(quantile_cont(n_tok, 0.99), 6) AS p99
          FROM (SELECT lang, CAST(len($toks) AS BIGINT) AS n_tok FROM documents)
          GROUP BY 1 ORDER BY 1""",
    "x34_shingle_explode" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents)
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
            tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
          FROM d, unnest(generate_series(1, len(tk) - 2)) AS t(i)
          WHERE len(tk) >= 3
          ORDER BY doc_id, pos""",
    "x40_repetition_trim" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents),
          p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
                FROM d, unnest(generate_series(1, len(tk) - 2)) AS t(i)
                WHERE len(tk) >= 3),
          firsts AS (SELECT doc_id, shingle, min(pos) AS fp, count(*) AS mult
                     FROM p GROUP BY 1, 2),
          per AS (SELECT doc_id, CAST(sum(mult) AS BIGINT) AS n_3grams,
                         CAST(max(mult) AS BIGINT) AS max_mult
                  FROM firsts GROUP BY 1),
          rep AS (SELECT p.doc_id, min(p.pos) AS frp
                  FROM p JOIN firsts USING (doc_id, shingle)
                  WHERE p.pos > firsts.fp GROUP BY 1)
          SELECT d.doc_id,
            CAST(coalesce(n_3grams, 0) AS BIGINT) AS n_3grams,
            CAST(coalesce(max_mult, 0) AS BIGINT) AS max_mult,
            CAST(coalesce(frp, coalesce(n_3grams, 0)) AS BIGINT) AS first_repeat_pos,
            CAST(CASE WHEN frp IS NOT NULL THEN frp + 2 ELSE len(tk) END AS BIGINT)
              AS keep_tokens
          FROM d LEFT JOIN per USING (doc_id) LEFT JOIN rep USING (doc_id)
          ORDER BY d.doc_id""",
  )
}
