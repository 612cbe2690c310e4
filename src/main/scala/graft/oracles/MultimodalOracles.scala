package graft.oracles

/** DuckDB oracle SQL — the multimodal family: image/audio/video decode, resize/frame plans, multimodal curation.
  * Split from `SparkEntry` (round 11 housekeeping): the declaration table
  * there stays reviewable; each family object carries only its SQL. All
  * shared snippet builders live in [[OracleDefs]].
  */
object MultimodalOracles {
  import OracleDefs._

  private[graft] def sql: Map[String, String] = Map(
    "x11_multimodal_features" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
         CAST(doc_id % 640 + 32 AS BIGINT) AS width,
         CAST(doc_id % 480 + 24 AS BIGINT) AS height,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS b0,
         CAST(ascii(substring(text, 5, 1)) AS BIGINT) AS b4
         FROM documents ORDER BY media_id""",
    "x11b_resize_plan" ->
      """WITH m AS (SELECT doc_id, doc_id % 640 + 32 AS w, doc_id % 480 + 24 AS h FROM documents)
         SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(greatest(floor(w * least(224.0 / w, 224.0 / h)), 1) AS BIGINT) AS out_w,
           CAST(greatest(floor(h * least(224.0 / w, 224.0 / h)), 1) AS BIGINT) AS out_h
         FROM m ORDER BY media_id""",
    // x11c: the decoder's output restated from the closed-form pixel
    // function (BmpSynth) — a lateral range(w*h) join over the top-down
    // row-major index i; wsum_r/first_r are position-sensitive, so a
    // missed bottom-up flip or stride error in the engine's BMP parse
    // cannot hash-match. CASTs: DuckDB SUM returns HUGEINT.
    "x11c_image_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 64 + 8 AS w, doc_id % 48 + 8 AS h
                    FROM documents),
         px AS (SELECT d.doc_id, d.w, d.h, t.i
                FROM d, unnest(generate_series(0, d.w * d.h - 1)) AS t(i))
         SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(SUM((7 * doc_id + 3 * i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((11 * doc_id + 5 * i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((13 * doc_id + 7 * i) % 256) AS BIGINT) AS sum_b,
           CAST(SUM(i * ((7 * doc_id + 3 * i) % 256)) AS BIGINT) AS wsum_r,
           CAST((7 * doc_id) % 256 AS BIGINT) AS first_r
         FROM px GROUP BY doc_id, w, h ORDER BY media_id""",
    "x11d_png_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
                    FROM documents),
         px AS (SELECT d.doc_id, d.w, d.h, t.i
                FROM d, unnest(generate_series(0, d.w * d.h - 1)) AS t(i))
         SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(SUM((7 * doc_id + 3 * i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((11 * doc_id + 5 * i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((13 * doc_id + 7 * i) % 256) AS BIGINT) AS sum_b,
           CAST(SUM(i * ((7 * doc_id + 3 * i) % 256)) AS BIGINT) AS wsum_r,
           CAST((7 * doc_id) % 256 AS BIGINT) AS first_r
         FROM px GROUP BY doc_id, w, h ORDER BY media_id""",
    "x11e_wav_decode" ->
      """WITH d AS (SELECT doc_id, doc_id % 2000 + 500 AS n,
                           8000 + (doc_id % 8) * 1000 AS rate FROM documents),
         smp AS (SELECT d.doc_id, d.n, d.rate, t.t,
                        (31 * d.doc_id + 17 * t.t) % 65536 - 32768 AS s
                 FROM d, unnest(generate_series(0, d.n - 1)) AS t(t))
         SELECT doc_id AS media_id,
           CAST(n AS BIGINT) AS n_samples, CAST(rate AS BIGINT) AS sample_rate,
           CAST(SUM(s) AS BIGINT) AS sum_s,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(t * s) AS BIGINT) AS wsum_s,
           CAST((31 * doc_id) % 65536 - 32768 AS BIGINT) AS first_s
         FROM smp GROUP BY doc_id, n, rate ORDER BY media_id""",
    "x12b_avi_frame_sample" ->
      """WITH d AS (SELECT doc_id, doc_id % 12 + 4 AS nf, doc_id % 24 + 8 AS w,
                           doc_id % 16 + 8 AS h FROM documents),
         fr AS (SELECT d.doc_id, d.nf, d.w, d.h, t.f
                FROM d, unnest(generate_series(0, d.nf - 1)) AS t(f)
                WHERE t.f % 2 = 0),
         px AS (SELECT fr.doc_id, fr.nf, fr.w, fr.h, fr.f, t.i,
                       (7 * fr.doc_id + 3 * t.i + 19 * fr.f) % 256 AS r
                FROM fr, unnest(generate_series(0, fr.w * fr.h - 1)) AS t(i))
         SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(SUM(r) AS BIGINT) AS sum_r_sampled,
           CAST(SUM(f * r) AS BIGINT) AS wsum_r_sampled,
           CAST((7 * doc_id) % 256 AS BIGINT) AS first_r
         FROM px GROUP BY doc_id, nf, w, h ORDER BY media_id""",
    // x11f: the per-block-constant synthesis makes the LOSSY JPEG round
    // trip closed-form — a constant block quantizes to a lone DC
    // coefficient and the Annex-K DC quantizer (16) divides the DC scale
    // (8), so decoded = clamp(2*floor((p-128)/2 + 0.5) + 128, 0, 255)
    // exactly (JpegSynth.decodedValue pins the same formula in-suite).
    // Per-block Σi over top-down row-major i collapses to
    // 8w(64·by+28) + 8(64·bx+28).
    "x11f_jpeg_decode" ->
      """WITH d AS (SELECT doc_id, 8 * (doc_id % 6 + 2) AS w,
                           8 * (doc_id % 4 + 2) AS h FROM documents),
         b AS (SELECT d.doc_id, d.w, d.h, t.b,
                 t.b % (d.w // 8) AS bx, t.b // (d.w // 8) AS by,
                 (37 * d.doc_id + 11 * t.b) % 256 AS p
               FROM d, unnest(generate_series(0, (d.w // 8) * (d.h // 8) - 1)) AS t(b)),
         v AS (SELECT doc_id, w, h, b, bx, by,
                 least(greatest(2 * CAST(floor((CAST(p AS DOUBLE) - 128) / 2 + 0.5) AS BIGINT)
                   + 128, 0), 255) AS pd
               FROM b)
         SELECT doc_id AS media_id,
           CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_pixels,
           CAST(SUM(64 * pd) AS BIGINT) AS sum_g,
           CAST(SUM((8 * w * (64 * by + 28) + 8 * (64 * bx + 28)) * pd) AS BIGINT) AS wsum_g,
           CAST(MAX(CASE WHEN b = 0 THEN pd END) AS BIGINT) AS first_g
         FROM v GROUP BY doc_id ORDER BY media_id""",
    "x46_multimodal_curation" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
          s AS (SELECT doc_id,
            CAST(len(tk) AS DOUBLE) AS n_tok,
            CAST(len(list_distinct(tk)) AS DOUBLE) AS n_uniq,
            CAST(len(list_filter(tk, w -> w IN ('the','a','of','and','to','el','la','de','y','que','der','die','das','und','ist','le','et','les','des'))) AS DOUBLE) AS n_stop
          FROM t),
          q AS (SELECT doc_id,
            round((CASE WHEN n_tok >= 20 AND n_tok <= 1000 THEN 1.0
                        WHEN n_tok >= 5 THEN 0.5 ELSE 0.0 END) * 0.4
                  + (n_uniq / n_tok) * 0.4 + (n_stop / n_tok) * 0.2, 6) AS quality
          FROM s),
          img AS (SELECT doc_id,
            CAST((doc_id % 56 + 8) * (doc_id % 40 + 8) AS BIGINT) AS n_pixels
          FROM documents),
          aud AS (SELECT doc_id, CAST(SUM(smp * smp) // n AS BIGINT) AS energy_per_sample
                  FROM (SELECT d.doc_id, d.n, (31 * d.doc_id + 17 * t.t) % 65536 - 32768 AS smp
                        FROM (SELECT doc_id, doc_id % 2000 + 500 AS n FROM documents) d,
                             unnest(generate_series(0, d.n - 1)) AS t(t))
                  GROUP BY doc_id, n)
          SELECT q.doc_id, q.quality, img.n_pixels, aud.energy_per_sample,
            (q.quality >= 0.5 AND img.n_pixels >= 400
             AND aud.energy_per_sample >= 358000000) AS keep
          FROM q JOIN img USING (doc_id) JOIN aud USING (doc_id)
          ORDER BY doc_id""",
    "x12_frame_sample" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) // 32 + 1 AS BIGINT) AS n_frames
         FROM documents ORDER BY media_id""",
  )
}
