package graft

import graft.operators._
import graft.streaming.StreamingIngest
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is exposed as a named query; where the
  * semantics are SQL-expressible the matching DuckDB oracle is declared in
  * [[oracleSql]] with identical column names, types (BIGINT/DOUBLE/STRING)
  * and ordering. Approximate / LSH / streaming-internal operators are
  * declared without an oracle (rows-only check) by design.
  */
object SparkEntry {

  /** Flagship on sf0.001: the full reference hot path — enrich → partitioned
    * ORC landing → read back → per-partition accounting. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.ensureParquetConf(spark) // driver may pass a fresh session
    Ingest.flagship(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — ingestion pipeline (reference hot path)
    "q_ingest_partition_counts" -> (Ingest.partitionCounts _),
    "q_compact_partition_counts" -> (Ingest.compactRoundtrip _),
    "p1_serde_parse" -> (RowTransforms.serdeParse _),
    "p1b_delimited_parse" -> (RowTransforms.delimitedParse _),
    "p2_path_render" -> (RowTransforms.pathRender _),
    "p34_time_convert" -> (RowTransforms.timeConvert _),
    "p5_partition_extract" -> (RowTransforms.partitionExtract _),
    "p6_json_encode" -> (RowTransforms.jsonEncode _),
    "p7_category_default" -> (RowTransforms.categoryDefault _),
    "p7b_timestamp_class" -> (RowTransforms.timestampClassify _),
    "p8_filter_project" -> (RowTransforms.filterProject _),
    // M2 — counter / bookkeeping analytics
    "a2_window_counts" -> (Counters.windowCounts _),
    "a2b_dense_timeline" -> (Counters.denseTimeline _),
    "a2c_hopping_counts" -> (Counters.hoppingCounts _),
    "a2d_interp_timeline" -> (Counters.interpTimeline _),
    "a2e_anomaly_flags" -> ((s, d) => Counters.anomalyFlags(s, d)),
    "a3_category_window_counts" -> (Counters.categoryWindowCounts _),
    "a5_completeness" -> ((s, d) => Counters.completeness(s, d)),
    "a6_max_ts_per_category" -> (Counters.maxTsPerCategory _),
    "a7_distinct_counts" -> (Counters.distinctCounts _),
    "a7b_approx_distinct" -> (Counters.approxDistinct _),
    "t7_upsert_latest" -> (Counters.upsertLatest _),
    // M3 — relational surface
    "j1_inner_join_agg" -> (Relational.innerJoinAgg _),
    "j2_broadcast_join" -> (Relational.broadcastJoin _),
    "j3_left_join" -> (Relational.leftJoin _),
    "j4_semi_join" -> (Relational.semiJoin _),
    "j5_anti_join" -> (Relational.antiJoin _),
    "j6_star_join" -> (Relational.starJoin _),
    "j7_range_join" -> (Relational.rangeJoin _),
    "j8_asof_join" -> (Relational.asofJoin _),
    "j8b_asof_native" -> (Relational.asofJoinNative _),
    "j9_right_join" -> (Relational.rightJoin _),
    "j10_full_join" -> (Relational.fullJoin _),
    "j11_salted_skew_join" -> ((s, d) => Relational.saltedSkewJoin(s, d)),
    "j12_bucket_join" -> ((s, d) => Relational.bucketJoin(s, d)),
    "w1_rank_per_group" -> (Relational.rankPerGroup _),
    "w2_lag_lead" -> (Relational.lagLead _),
    "w3_running_sum" -> (Relational.runningSum _),
    "w4_ntile_rank" -> (Relational.ntileRank _),
    "w4b_ntile_scalable" -> ((s, d) => Relational.ntileScalable(s, d)),
    "w5_percent_rank" -> (Relational.percentRankDist _),
    "w6_range_window" -> (Relational.rangeWindowAgg _),
    "w7_nth_value" -> (Relational.nthValueFrame _),
    "w8_ignore_nulls_fill" -> (Relational.ignoreNullsFill _),
    "s1_topk" -> (Relational.topK _),
    "s2_union" -> (Relational.unionSets _),
    "s3_intersect" -> (Relational.intersectSets _),
    "s4_except" -> (Relational.exceptSets _),
    "s5_pivot" -> (Relational.pivotCounts _),
    "s6_unpivot" -> (Relational.unpivotCounts _),
    "s7_multiset_ops" -> (Relational.multisetOps _),
    "s8_subquery_filter" -> (Relational.subqueryFilter _),
    "s9_lateral_topk" -> (Relational.lateralTopK _),
    "a8_rollup" -> (Relational.rollupAgg _),
    "a9_cube" -> (Relational.cubeAgg _),
    "a10_grouping_sets" -> (Relational.groupingSetsAgg _),
    "f1_string_funcs" -> (Relational.stringFuncs _),
    "f2_datetime_funcs" -> (Relational.datetimeFuncs _),
    "f3_math_funcs" -> (Relational.mathFuncs _),
    "f4_array_funcs" -> (Relational.arrayFuncs _),
    "f5_json_funcs" -> (Relational.jsonFuncs _),
    "f6_map_funcs" -> (Relational.mapFuncs _),
    "p1c_malformed_classify" -> (RowTransforms.malformedClassify _),
    // M4 — streaming / stateful
    "t1_stream_counts" -> (StreamingIngest.streamCounts _),
    "t1b_stream_counts_append" -> (StreamingIngest.streamCountsAppend _),
    "t2_sessionize" -> ((s, d) => StreamingIngest.sessionize(s, d)),
    "t2b_session_window_stream" -> ((s, d) => StreamingIngest.sessionWindowStream(s, d)),
    "t3_stream_dedup" -> (StreamingIngest.streamDedupFirstSeen _),
    "t4_stream_stream_join" -> ((s, d) => StreamingIngest.streamStreamJoin(s, d)),
    "t5_stream_dedup_watermark" -> (StreamingIngest.streamDedupWithinWatermark _),
    "t10_transform_with_state" -> (StreamingIngest.transformWithStateCounts _),
    "t11_stream_count_max" -> (StreamingIngest.streamCountMax _),
    "t12_stream_media_decode" -> (StreamingIngest.streamMediaDecode _),
    "t13_stream_contamination" -> (StreamingIngest.streamSubstringContamination _),
    "t14_stream_dedup_index" -> ((s, d) => StreamingIngest.streamDedupIndex(s, d)),
    "t15_stream_semantic_dedup" -> ((s, d) => StreamingIngest.streamSemanticDedup(s, d)),
    "t16_stream_anomaly_flags" -> (StreamingIngest.streamAnomalyFlags _),
    "t17_stream_idle_close" -> ((s, d) => StreamingIngest.idleCloseSessions(s, d)),
    // M5 — [EXT] LLM-pipeline operators
    "x1_dedup_exact" -> (Dedup.exactDedup _),
    "x2_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "x3_dedup_simhash" -> (Dedup.simhashDedup _),
    "x4_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "x70_source_dup_matrix" -> ((s, d) => Dedup.sourceDupMatrix(s, d)),
    "x73_curation_manifest" -> ((s, d) => TextAnalysis.curationManifest(s, d)),
    "x74_source_divergence" -> (TextAnalysis.sourceDivergence _),
    "x5_embed_neardup" -> ((s, d) => Dedup.embedCosine(s, d)),
    "x55_threshold_curve" -> ((s, d) => Dedup.cosineThresholdCurve(s, d)),
    "x5b_embed_neardup_lsh" -> ((s, d) => Dedup.embedCosineLsh(s, d)),
    "x6_ann_cosine_topk" -> ((s, d) => Similarity.bruteTopK(s, d)),
    "x6b_ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "x6c_centroid_matrix" -> (Similarity.centroidMatrix _),
    "x6d_batch_topk" -> ((s, d) => Similarity.batchTopK(s, d)),
    "x6e_sq8_topk" -> ((s, d) => Similarity.sq8TopK(s, d)),
    "x6f_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d)),
    "x6g_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "x6h_ivfpq_append_topk" -> ((s, d) => Similarity.ivfPqAppendTopK(s, d)),
    "x69_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "x69b_semantic_blocking_recall" -> ((s, d) => Similarity.semanticBlockingRecall(s, d)),
    "x72_cell_drift" -> (Similarity.cellDrift _),
    "x7_lang_id" -> (TextAnalysis.langId _),
    "x59_lang_confusion" -> (TextAnalysis.langConfusion _),
    "x8_quality_score" -> (TextAnalysis.qualityScore _),
    "x9_token_counts" -> (TextAnalysis.tokenCounts _),
    "x10_fingerprint" -> (TextAnalysis.fingerprint _),
    "x11_multimodal_features" -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "x11b_resize_plan" -> ((s, d) => Multimodal.resizePlan(s, d)),
    "x11c_image_decode" -> (Multimodal.imageDecode _),
    "x11d_png_decode" -> (Multimodal.imageDecodePng _),
    "x11e_wav_decode" -> (Multimodal.audioDecode _),
    "x11f_jpeg_decode" -> (Multimodal.imageDecodeJpeg _),
    "x12b_avi_frame_sample" -> (Multimodal.videoFrameSample _),
    "x46_multimodal_curation" -> (Multimodal.multimodalCuration _),
    "x12_frame_sample" -> (Multimodal.frameSample _),
    "x13_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "x44_cluster_canonical" -> (Dedup.clusterCanonical _),
    "x14_split_stats" -> (TextAnalysis.splitStats _),
    "x16_incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "x17_contamination" -> ((s, d) => Dedup.contamination(s, d)),
    "x17b_contamination_bloom" -> ((s, d) => Dedup.contaminationBloom(s, d)),
    "x18_mixture_sample" -> (TextAnalysis.mixtureSample _),
    "x19_curated_stats" -> ((s, d) => TextAnalysis.curatedCorpusStats(s, d)),
    "x15_tfidf_top_terms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "x20_bm25_topk" -> ((s, d) => Search.bm25TopK(s, d)),
    "x29_hybrid_rrf" -> ((s, d) => Search.hybridTopK(s, d)),
    "x21_sequence_pack" -> ((s, d) => TextAnalysis.sequencePack(s, d)),
    "x21b_global_pack" -> ((s, d) => TextAnalysis.globalSequencePack(s, d)),
    "x23_pii_redact" -> (TextAnalysis.piiRedact _),
    "x24_repetition" -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    "x25_stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "x49_weighted_sample" -> ((s, d) => TextAnalysis.weightedSample(s, d)),
    "x50_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "x51_effective_tokens" -> (Dedup.effectiveTokens _),
    "x52_leakfree_split" -> (Dedup.leakFreeSplit _),
    "x53_domain_cap" -> ((s, d) => TextAnalysis.domainCap(s, d)),
    "x54_substring_dup" -> ((s, d) => TextAnalysis.substringDup(s, d)),
    "x56_substring_clean" -> ((s, d) => TextAnalysis.substringClean(s, d)),
    "x57_boilerplate_by_source" -> ((s, d) => TextAnalysis.boilerplateBySource(s, d)),
    "x58_substring_contamination" -> ((s, d) => TextAnalysis.substringContamination(s, d)),
    "x60_span_append_probe" -> ((s, d) => TextAnalysis.spanAppendProbe(s, d)),
    "x61_dedup_index_probe" -> ((s, d) => Dedup.dedupIndexProbe(s, d)),
    "x62_cdc_chunk_stats" -> ((s, d) => TextAnalysis.cdcChunkStats(s, d)),
    "x63_bpe_merges" -> (TextAnalysis.bpeMerges _),
    "x63b_bpe_encode_stats" -> (TextAnalysis.bpeEncodeStats _),
    "x64_funnel_steps" -> (Counters.funnelSteps _),
    "x65_cohort_retention" -> (Counters.cohortRetention _),
    "x66_embedding_outliers" -> ((s, d) => Similarity.embeddingOutliers(s, d)),
    "x67_token_rarity" -> (TextAnalysis.tokenRarity _),
    "x71_unigram_surprisal" -> (TextAnalysis.unigramSurprisal _),
    "x71b_bigram_surprisal" -> (TextAnalysis.bigramSurprisal _),
    "x68_snapshot_diff" -> (Dedup.snapshotDiff _),
    "x28_temperature_mixture" -> ((s, d) => TextAnalysis.temperatureMixture(s, d)),
    "x26_quality_filter" -> (TextAnalysis.qualityFilter _),
    "x27_token_entropy" -> (TextAnalysis.tokenEntropy _),
    "x22_length_quantiles" -> (TextAnalysis.lengthQuantiles _),
    "x22b_length_quantiles_approx" -> ((s, d) => TextAnalysis.lengthQuantilesApprox(s, d)),
    "x30_chunk_windows" -> ((s, d) => TextAnalysis.chunkWindows(s, d)),
    "x37_ngram_novelty" -> (TextAnalysis.ngramNovelty _),
    "x38_source_vocab_overlap" -> (TextAnalysis.sourceVocabOverlap _),
    // round 5: native UDAF, SCD2, iterative graph, profiling, layout
    "a11_count_max" -> (Counters.countMaxPerCategory _),
    "j13_scd2" -> (Relational.scd2Priority _),
    "j14_temporal_dim_join" -> (Relational.temporalDimJoin _),
    "x31_pagerank" -> ((s, d) => Graphs.pagerank(s, d)),
    "x32_column_profile" -> (Profile.columnProfile _),
    "x33_zorder_layout" -> (Layout.zorderLayout _),
    "x34_shingle_explode" -> (TextAnalysis.shingleExplode _),
    "x40_repetition_trim" -> (TextAnalysis.repetitionTrim _),
    "x42_token_histogram" -> (TextAnalysis.tokenHistogram _),
    "x43_cooccur_lift" -> ((s, d) => TextAnalysis.cooccurrenceLift(s, d)),
    "x45_quality_dup_calibration" -> (TextAnalysis.qualityDupCalibration _),
    "x47_bpe_pair_counts" -> ((s, d) => TextAnalysis.bpePairCounts(s, d)),
    "x48_triangle_counts" -> ((s, d) => TextAnalysis.triangleCounts(s, d)),
    // no-oracle by design (no SQL deflate); determinism + separation
    // invariants are spec-pinned in DedupSimilaritySpec
    "x41_compression_ratio" -> ((s, d) => TextAnalysis.compressionRatio(s, d)),
    // no-oracle by design (library-specific estimator); union-associativity
    // and error envelope are spec-pinned in GraphLayoutSpec
    "a12_hll_sketch_union" -> (Counters.hllSketchUsers _),
    "x35_embed_quantize" -> (Similarity.embedQuantize _),
    "x36_split_leakage" -> ((s, d) => Dedup.splitLeakage(s, d)),
  )

  /** [[queries]] restricted by `SPARK_GRAFT_ONLY=name,name` — the ONE
    * definition of the subset semantics, shared by Bench and Verify so the
    * two entry points can never drift. Unset or empty → everything. */
  def selectedQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    queries.filter { case (name, _) => only.forall(_.contains(name)) }
  }

  // ---- DuckDB oracle SQL ----------------------------------------------------
  // Shared snippets, kept byte-equivalent to the Spark expressions:
  private def epochS(c: String) = s"CAST(floor(epoch($c)) AS BIGINT)"
  private def bucketE(c: String) = s"CAST(floor(epoch($c)/300)*300 AS BIGINT)"
  private def logdateS(c: String) =
    s"strftime(make_timestamp(CAST(floor(epoch($c)/300)*300 AS BIGINT)*1000000), '%Y%m%d%H%M')"
  private def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(28,4))) AS DOUBLE)"
  private val toks = """string_split_regex(trim(lower(text)), '\s+')"""
  private def polyHashSql(e: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length($e)), i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))), (acc, x) -> (acc * 31 + x) % 1000000007)"
  private def dotD(a: String, b: String) =
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
  private val BpeRounds = 12
  private def bpeCharsSql(wordExpr: String) =
    s"""' ' || list_reduce(list_transform(
          generate_series(1, length($wordExpr)), i -> substring($wordExpr, i, 1)),
          (a, b) -> a || '  ' || b) || ' '"""
  private def bpeApplySql(r: Int, col: String) =
    s"""replace($col,
          ' ' || (SELECT a FROM p$r) || '  ' || (SELECT b FROM p$r) || ' ',
          ' ' || (SELECT a FROM p$r) || (SELECT b FROM p$r) || ' ')"""
  private lazy val bpeTrainCtes: String = {
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
  private def pqRoundSql(r: Int): String = {
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
  private lazy val pqChainSql: String =
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
  private def ivfRoundSql(r: Int): String = {
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
  private lazy val ivfChainSql: String =
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
  private lazy val ivfPqOracleSql: String =
    s"""WITH $pqChainSql,
          $ivfChainSql,
          cand AS MATERIALIZED (
            SELECT c.vec_id FROM codes c
            JOIN asg a ON a.vec_id = c.vec_id
            JOIN probed p ON p.cell = a.cell
            JOIN cdq ON cdq.s = c.s AND cdq.cid = c.cid
            WHERE c.vec_id <> 0
            GROUP BY 1 ORDER BY SUM(cdq.d), c.vec_id LIMIT 50),
          exact AS (
            SELECT u.vec_id, CAST(SUM((u.v - q.v) * (u.v - q.v)) AS BIGINT) AS l2_dist
            FROM pqu u JOIN pqu q ON q.vec_id = 0 AND q.s = u.s AND q.j = u.j
            JOIN cand ON cand.vec_id = u.vec_id
            GROUP BY 1)
          SELECT vec_id, l2_dist FROM exact
          ORDER BY l2_dist, vec_id LIMIT 10"""

  // Shared by a2e (batch, no filter) and t16 (stream — the timeline CTE
  // additionally carries t1b's watermark flush rule; sound to push inside
  // because trailing windows look strictly BACKWARD and the unflushed
  // buckets are a per-category suffix, so flags∘filter = filter∘flags):
  // trailing-window z-flags, the test cross-multiplied into pure integers.
  private def a2eOracleSql(having: String = ""): String = {
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
  private lazy val scd2Cte =
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
  private lazy val jaccardPairsCte =
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
  private lazy val x17Oracle =
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
  private def cosineD(a: String, b: String) =
    s"${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)}))"

  // The winnowing span-fingerprint chain shared by x54/x56/x57
  // (TextAnalysis.spanIndex): per-position 8-gram hashes, each 16-window
  // selects its (hash, pos)-minimum anchor, anchors fingerprint their
  // 64-char span with the portable rolling hash.
  private lazy val winnowSpansSql =
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
  private lazy val contaminationOracleSql =
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
  private lazy val subdupPerDocSql =
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

  def oracleSql: Map[String, String] = Map(
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
    // change); the stream emits every session except each user's LAST
    // (any later arrival closes its predecessor), and the last iff its
    // close deadline — idle AND round window elapsed,
    // max((end//3600+1)*3600, end+1800) — precedes the final watermark:
    // the timer fire rule (TimerStateImpl expires ts <= watermark)
    // stated in exact integer milliseconds: both engines floor
    // micros→ms, the watermark is max_event_ms − 600000.
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
          WHERE sid < (SELECT max(sid) FROM g g2 WHERE g2.user_id = g.user_id)
             OR GREATEST((session_end // 3600 + 1) * 3600,
                         session_end + 1800) * 1000 <= (SELECT w FROM wm)
          ORDER BY user_id, session_start""",
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
    "t7_upsert_latest" ->
      s"""WITH ranked AS (
            SELECT user_id, event_type, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
          SELECT user_id, event_type, event_id AS last_event_id,
                 ${epochS("ts")} AS last_epoch, value AS last_value
          FROM ranked WHERE rn = 1 ORDER BY user_id, event_type""",
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
    "x1_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
         CAST(length(text) AS BIGINT) AS text_len
         FROM documents GROUP BY text ORDER BY keeper_id""",
    "x4_ngram_jaccard" ->
      s"""WITH $jaccardPairsCte
          SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""",
    // x74: the union-sum identity over one inner join; every term exact
    // integer ppm (c*1e6 // t, floors on positive operands). The pair
    // matrix is ALL unordered source pairs (mass × mass) so a pair with
    // fully disjoint vocabularies — the maximum-divergence case — still
    // appears, its shared-term sums coalesced to 0.
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
    // x70: x4's pair set rolled up by canonicalized source pair
    "x70_source_dup_matrix" ->
      s"""WITH $jaccardPairsCte
          SELECT least(d1.source, d2.source) AS source_a,
            greatest(d1.source, d2.source) AS source_b,
            count(*) AS n_pairs
          FROM pairs p JOIN documents d1 ON p.id1 = d1.doc_id
          JOIN documents d2 ON p.id2 = d2.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // shares x4's pair CTE: leakage = the near-dup pairs whose docs landed
    // in different x14 splits
    "x36_split_leakage" ->
      s"""WITH $jaccardPairsCte,
          spl AS (SELECT doc_id,
            CASE WHEN ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 <= 7 THEN 'train'
                 WHEN ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
                 ELSE 'test' END AS split FROM documents)
          SELECT p.id1, p.id2, s1.split AS split1, s2.split AS split2, p.jaccard
          FROM pairs p JOIN spl s1 ON p.id1 = s1.doc_id
          JOIN spl s2 ON p.id2 = s2.doc_id
          WHERE s1.split <> s2.split
          ORDER BY p.id1, p.id2""",
    "x5_embed_neardup" ->
      s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
          round(${cosineD("a.embedding", "b.embedding")}, 6) AS cosine
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(${cosineD("a.embedding", "b.embedding")}, 6) >= 0.4
          ORDER BY id1, id2""",
    // x55: integer micro-cosine vs each candidate threshold; distinct
    // docs via endpoint union
    "x55_threshold_curve" ->
      s"""WITH p AS MATERIALIZED (
            SELECT a.vec_id AS id1, b.vec_id AS id2,
              CAST(floor(round(${cosineD("a.embedding", "b.embedding")}, 6)
                * 1000000 + 0.5) AS BIGINT) AS cppm
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id),
          t AS (SELECT unnest([300000, 400000, 500000, 600000, 700000,
                              800000, 900000]) AS threshold_ppm),
          m AS (SELECT threshold_ppm, id1, id2 FROM p, t
                WHERE cppm >= threshold_ppm),
          c AS (SELECT threshold_ppm, COUNT(*) AS n_pairs FROM m GROUP BY 1),
          d AS (SELECT threshold_ppm, COUNT(DISTINCT id) AS n_docs FROM
              (SELECT threshold_ppm, id1 AS id FROM m
               UNION ALL SELECT threshold_ppm, id2 FROM m) GROUP BY 1)
          SELECT CAST(t.threshold_ppm AS BIGINT) AS threshold_ppm,
            CAST(coalesce(c.n_pairs, 0) AS BIGINT) AS n_pairs,
            CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs_affected
          FROM t LEFT JOIN c USING (threshold_ppm)
          LEFT JOIN d USING (threshold_ppm)
          ORDER BY threshold_ppm""",
    "x6_ann_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
          SELECT vec_id, CAST(label AS BIGINT) AS label,
          round(${cosineD("embedding", "qe")}, 6) AS cosine
          FROM embeddings, q WHERE vec_id <> 0
          ORDER BY cosine DESC, vec_id LIMIT 10""",
    // x6c: the engine computes micro-scaled integer SUM vectors per label
    // (the count divisor cancels in cosine), so every value up to the
    // final IEEE double ops is exact integer math DuckDB reproduces
    // bit-for-bit; the half-up rounding is the explicit floor form on
    // both sides.
    "x6c_centroid_matrix" ->
      """WITH u AS (SELECT label, g.i AS i,
              CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
            FROM embeddings, range(1, 65) g(i)),
          s AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv
                FROM u GROUP BY label, i),
          nrm AS (SELECT label, CAST(sum(sv * sv) AS BIGINT) AS sq
                  FROM s GROUP BY label),
          p AS (SELECT a.label AS l1, b.label AS l2,
                  CAST(sum(a.sv * b.sv) AS BIGINT) AS dot
                FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
                GROUP BY 1, 2)
          SELECT CAST(p.l1 AS BIGINT) AS l1, CAST(p.l2 AS BIGINT) AS l2,
            floor(CAST(p.dot AS DOUBLE)
              / (sqrt(CAST(n1.sq AS DOUBLE)) * sqrt(CAST(n2.sq AS DOUBLE)))
              * 1000000 + 0.5) / 1000000 AS cosine
          FROM p JOIN nrm n1 ON p.l1 = n1.label JOIN nrm n2 ON p.l2 = n2.label
          ORDER BY l1, l2""",
    // x6e: per-dimension min/max are order-independent aggregates and the
    // affine map is written with identical association on both engines,
    // so the quantized codes — and the integer L1 ranking — hash-match
    "x6e_sq8_topk" ->
      """WITH s AS (SELECT g.i AS d,
              min(CAST(embedding[g.i] AS DOUBLE)) AS mn,
              max(CAST(embedding[g.i] AS DOUBLE)) AS mx
            FROM embeddings, range(1, 65) g(i) GROUP BY 1),
          c AS (SELECT e.vec_id, g.i AS d,
              CAST(floor((CAST(e.embedding[g.i] AS DOUBLE) - s.mn)
                / (CASE WHEN s.mx = s.mn THEN 1 ELSE s.mx - s.mn END)
                * 255 + 0.5) AS BIGINT) AS code
            FROM embeddings e, range(1, 65) g(i) JOIN s ON s.d = g.i),
          q AS (SELECT d, code AS qc FROM c WHERE vec_id = 0),
          dist AS (SELECT c.vec_id, SUM(ABS(c.code - q.qc)) AS l1
                   FROM c JOIN q USING (d) WHERE c.vec_id <> 0 GROUP BY 1)
          SELECT vec_id, CAST(l1 AS BIGINT) AS l1_dist
          FROM dist ORDER BY l1, vec_id LIMIT 10""",
    // x6f: the PQ training is ALL integer (fixed-point + nonnegative
    // shift, floor division, ties to the lowest cid), so the oracle
    // RETRAINS the same codebooks from the same seeds — three unrolled
    // Lloyd rounds — then replays both query stages: ADC shortlist-50
    // (probe raw vs codeword table), exact integer-L2 rerank to top-10.
    // The encode step (codes) runs against the post-round-3 codebooks,
    // exactly like the engine's.
    "x6f_pq_topk" ->
      s"""WITH $pqChainSql,
          short AS MATERIALIZED (
            SELECT c.vec_id FROM codes c
            JOIN cdq ON cdq.s = c.s AND cdq.cid = c.cid
            WHERE c.vec_id <> 0
            GROUP BY 1 ORDER BY SUM(cdq.d), c.vec_id LIMIT 50),
          exact AS (
            SELECT u.vec_id, CAST(SUM((u.v - q.v) * (u.v - q.v)) AS BIGINT) AS l2_dist
            FROM pqu u JOIN pqu q ON q.vec_id = 0 AND q.s = u.s AND q.j = u.j
            JOIN short ON short.vec_id = u.vec_id
            GROUP BY 1)
          SELECT vec_id, l2_dist FROM exact
          ORDER BY l2_dist, vec_id LIMIT 10""",
    // x6b: full retraining oracle — the IVF coarse quantizer is k-means
    // with IEEE-pinned assignment (sequential double dot) and exact
    // integer centroid updates, so DuckDB retrains it bit-for-bit (the
    // x6f discipline applied to the coarse level), then replays the
    // probe: nprobe=4 cells by centroid cosine, exact cosine rank over
    // the vectors assigned to those cells.
    "x6b_ann_ivf" ->
      s"""WITH $ivfChainSql
          SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
            round(${cosineD("e.embedding", "qe")}, 6) AS cosine
          FROM embeddings e
          JOIN asg ON asg.vec_id = e.vec_id
          JOIN probed p ON p.cell = asg.cell, qv
          WHERE e.vec_id <> 0
          ORDER BY cosine DESC, e.vec_id LIMIT 10""",
    // x69: SemDeDup — the coarse quantizer retrains via the x6b chain
    // (bit-identical cells), then the within-cell pair test restates x5's
    // 6-dp rounded cosine; every output column is an integer count
    "x69_semantic_dedup" ->
      s"""WITH $ivfChainSql,
          av AS MATERIALIZED (
            SELECT a.cell, a.vec_id, e.embedding
            FROM asg a JOIN embeddings e USING (vec_id)),
          prs AS MATERIALIZED (
            SELECT a.cell, a.vec_id AS id1, b.vec_id AS id2
            FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round(${cosineD("a.embedding", "b.embedding")}, 6) >= 0.4),
          dp AS (SELECT cell, count(*) AS dup_pairs FROM prs GROUP BY 1),
          dr AS (SELECT cell, count(DISTINCT id2) AS n_dropped FROM prs GROUP BY 1),
          st AS (SELECT cell, count(*) AS n_vecs FROM asg GROUP BY 1)
          SELECT CAST(st.cell AS BIGINT) AS cell,
            CAST(st.n_vecs AS BIGINT) AS n_vecs,
            CAST(coalesce(dp.dup_pairs, 0) AS BIGINT) AS dup_pairs,
            CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
            CAST(st.n_vecs - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept
          FROM st LEFT JOIN dp ON dp.cell = st.cell
          LEFT JOIN dr ON dr.cell = st.cell
          ORDER BY cell""",
    // x69b: exact all-pairs baseline (x5's verified form) joined to the
    // retrained cell assignment; recall as exact integer ppm
    "x69b_semantic_blocking_recall" ->
      s"""WITH $ivfChainSql,
          np AS MATERIALIZED (
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 65536 AND b.vec_id < 65536
              AND round(${cosineD("a.embedding", "b.embedding")}, 6) >= 0.4),
          j AS (SELECT n1.cell AS c1, n2.cell AS c2
                FROM np JOIN asg n1 ON n1.vec_id = np.id1
                JOIN asg n2 ON n2.vec_id = np.id2)
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_same_cell,
            CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS recall_ppm
          FROM j""",
    // x72: retrained assignment + t14's bucket split; shares and drift in
    // exact ppm against each half's own total
    "x72_cell_drift" ->
      s"""WITH $ivfChainSql,
          av AS (SELECT a.cell, a.vec_id,
              ${polyHashSql("CAST(a.vec_id AS VARCHAR)")} % 10 AS bkt
            FROM asg a),
          agg AS (SELECT cell,
              CAST(count(CASE WHEN bkt <= 7 THEN 1 END) AS BIGINT) AS n_prior,
              CAST(count(CASE WHEN bkt >= 8 THEN 1 END) AS BIGINT) AS n_fresh
            FROM av GROUP BY 1),
          tot AS (SELECT sum(n_prior) AS tp, sum(n_fresh) AS tf FROM agg)
          SELECT CAST(cell AS BIGINT) AS cell, n_prior, n_fresh,
            CAST(n_prior * 1000000 // tot.tp AS BIGINT) AS prior_ppm,
            CAST(n_fresh * 1000000 // tot.tf AS BIGINT) AS fresh_ppm,
            CAST(abs(n_prior * 1000000 // tot.tp - n_fresh * 1000000 // tot.tf) AS BIGINT) AS drift_ppm
          FROM agg, tot ORDER BY cell""",
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
    // x6g: both trained quantizers retrained in-oracle (coarse cells via
    // the IVF chain, PQ codebooks via the x6f chain), then the composed
    // replay: cell-pruned candidates, ADC shortlist-50 against the
    // stored codes, exact integer-L2 rerank to top-10.
    "x6g_ivfpq_topk" -> ivfPqOracleSql,
    // x6h: the same probe over an ivfPqAppend-grown index — the frozen
    // quantizers make the grown index bit-identical to the rebuild
    // (spec-pinned), so x6g's oracle carries over verbatim
    "x6h_ivfpq_append_topk" -> ivfPqOracleSql,
    "x6d_batch_topk" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
            FROM embeddings WHERE vec_id < 10),
          s AS (SELECT p.probe_id, c.vec_id,
                  round(${cosineD("c.embedding", "p.pe")}, 6) AS cosine
                FROM embeddings c, p WHERE c.vec_id >= 10),
          r AS (SELECT probe_id, vec_id, cosine,
                  CAST(row_number() OVER (PARTITION BY probe_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
                FROM s)
          SELECT probe_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
          ORDER BY probe_id, rnk""",
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
    "x13_dup_clusters" ->
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
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
          SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id""",
    "x44_cluster_canonical" ->
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
          m AS (SELECT l.doc_id, l.cluster_id, d.n_chars
                FROM labels l JOIN documents d USING (doc_id))
          SELECT doc_id, cluster_id,
                 count(*) OVER (PARTITION BY cluster_id) AS n_members,
                 (row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n_chars DESC, doc_id) = 1) AS keep
          FROM m ORDER BY doc_id""",
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
    // x52: x13's recursive-CTE labels, split assigned by hashing the
    // CLUSTER id — near-dup pairs cannot straddle splits by construction
    "x52_leakfree_split" ->
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
          labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
          SELECT doc_id, cluster_id,
                 CASE WHEN ${polyHashSql("CAST(cluster_id AS VARCHAR)")} % 10 <= 7 THEN 'train'
                      WHEN ${polyHashSql("CAST(cluster_id AS VARCHAR)")} % 10 = 8 THEN 'val'
                      ELSE 'test' END AS split
          FROM labels ORDER BY doc_id""",
    // x53: content-stable hash rank within each source, capped
    "x53_domain_cap" ->
      s"""SELECT doc_id, source, rnk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                     ORDER BY ${polyHashSql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
            FROM documents)
          WHERE rnk <= 10 ORDER BY source, rnk""",
    // x54: winnowing anchors (min (kh,p) per 16-window of 8-gram
    // hashes — content-defined, alignment-invariant), 64-char span
    // hashes via the x10 portable rolling hash; "repeated across docs"
    // = min(doc)≠max(doc) per hash; per-doc shared-interval union via
    // gaps-and-islands ([[subdupPerDocSql]], shared with x57)
    "x54_substring_dup" ->
      s"""WITH $subdupPerDocSql
          SELECT doc_id, n_spans, n_shared_spans, first_shared_pos,
                 covered_chars, covered_ppm
          FROM perdoc ORDER BY doc_id""",
    // x57: the same per-doc coverage rolled up by source — the
    // which-feed-ships-boilerplate report
    "x57_boilerplate_by_source" ->
      s"""WITH $subdupPerDocSql
          SELECT d.source,
            COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN perdoc.n_shared_spans > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_docs_affected,
            CAST(SUM(length(d.text)) AS BIGINT) AS total_chars,
            CAST(SUM(perdoc.covered_chars) AS BIGINT) AS covered_chars,
            CAST(SUM(perdoc.covered_chars) * 1000000
              // SUM(length(d.text)) AS BIGINT) AS boilerplate_ppm
          FROM perdoc JOIN documents d ON d.doc_id = perdoc.doc_id
          GROUP BY d.source ORDER BY d.source""",
    // x58: new-batch docs (x16's bucket rule) probed span-by-span
    // against the prior corpus's distinct span-hash set
    "x58_substring_contamination" -> contaminationOracleSql,
    // t13: the same probe as a streaming execution (per-row winnowing,
    // stream-static join, complete-mode agg) — batch-equivalent by
    // construction, so it carries x58's oracle verbatim
    "t13_stream_contamination" -> contaminationOracleSql,
    // x60: the same probe over an incrementally APPENDED span index —
    // per-doc winnowing is a pure function of the text, so the grown
    // index is row-identical to the rebuild (spec-pinned) and x58's
    // oracle carries over verbatim
    "x60_span_append_probe" -> contaminationOracleSql,
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
    // x56: x54's spans with keep-one-canonical semantics (the
    // (doc_id,p)-min per repeated span hash survives; every other
    // occurrence is cut), islands merged, the doc spliced back together
    // from the gap segments, and the CLEANED text fingerprinted with
    // the portable rolling hash — full string-surgery hash check
    "x56_substring_clean" ->
      s"""WITH $winnowSpansSql,
          keep AS (SELECT h, MIN(struct_pack(d := doc_id, p := p)) AS k
                   FROM sp GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
          sh AS (SELECT s.doc_id, s.p FROM sp s JOIN keep ON keep.h = s.h
                 WHERE NOT (s.doc_id = keep.k.d AND s.p = keep.k.p)),
          isl0 AS (SELECT doc_id, p,
              CASE WHEN p > coalesce(MAX(p + 63) OVER (PARTITION BY doc_id
                ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1) THEN 1 ELSE 0 END AS ni
            FROM sh),
          grp AS (SELECT doc_id, p,
              SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM isl0),
          isl AS (SELECT doc_id, MIN(p) AS mn, MAX(p) + 63 AS mx FROM grp
                  GROUP BY doc_id, g),
          seg AS (
            SELECT i.doc_id,
              coalesce(LAG(i.mx + 1) OVER (PARTITION BY i.doc_id ORDER BY i.mn), 1) AS s,
              i.mn - coalesce(LAG(i.mx + 1) OVER (PARTITION BY i.doc_id
                ORDER BY i.mn), 1) AS len
            FROM isl i),
          tails AS (SELECT doc_id, MAX(mx) + 1 AS s, 100000000 AS len
                    FROM isl GROUP BY 1),
          parts AS (SELECT doc_id, s, len FROM seg WHERE len > 0
                    UNION ALL SELECT doc_id, s, len FROM tails),
          clean AS (
            SELECT p.doc_id,
              string_agg(substring(d.text, CAST(p.s AS INT), CAST(p.len AS INT)),
                '' ORDER BY p.s) AS cleaned
            FROM parts p JOIN documents d ON d.doc_id = p.doc_id GROUP BY 1)
          SELECT d.doc_id,
            CAST(length(d.text) AS BIGINT) AS n_chars,
            CAST(length(coalesce(c.cleaned, d.text)) AS BIGINT) AS n_chars_clean,
            ${polyHashSql("coalesce(c.cleaned, d.text)")} AS clean_fp
          FROM documents d
          LEFT JOIN clean c ON c.doc_id = d.doc_id
          ORDER BY d.doc_id""",
    "x14_split_stats" ->
      s"""WITH s AS (SELECT
            CASE WHEN h <= 7 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split,
            tk, n_chars
          FROM (SELECT ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS h,
                       len($toks) AS tk, n_chars FROM documents))
          SELECT split, count(*) AS n_docs, CAST(SUM(tk) AS BIGINT) AS total_tokens,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM s GROUP BY 1 ORDER BY 1""",
    "x16_incremental_dedup" ->
      s"""WITH b AS (SELECT doc_id, text,
            ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS h FROM documents),
          newb AS (SELECT doc_id, text FROM b WHERE h >= 8),
          prior AS (SELECT doc_id, text FROM b WHERE h <= 7),
          docs AS (SELECT doc_id, $toks AS tk FROM documents),
          sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
                 FROM docs, unnest(generate_series(1, len(tk) - 2)) AS t(i)
                 WHERE len(tk) >= 3),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (SELECT a.doc_id AS idn, p.doc_id AS idp, count(*) AS i
                    FROM sh a JOIN newb nb ON a.doc_id = nb.doc_id
                    JOIN sh p ON a.s = p.s
                    JOIN prior pr ON p.doc_id = pr.doc_id
                    GROUP BY 1, 2),
          neardup AS (SELECT DISTINCT idn FROM inter
                      JOIN sizes sa ON sa.doc_id = idn JOIN sizes sb ON sb.doc_id = idp
                      WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.8)
          SELECT doc_id, ${polyHashSql("text")} AS fp FROM newb
          WHERE ${polyHashSql("text")} NOT IN (SELECT ${polyHashSql("text")} FROM prior)
            AND doc_id NOT IN (SELECT idn FROM neardup)
          ORDER BY doc_id""",
    // x61: the tag-scoped batch-index dedup — prior batch keeps one doc
    // per text hash; the fresh batch's survivors are min-doc_id keepers of
    // hashes never seen in the prior split (the index stores survivor
    // fingerprints, but survivors cover every distinct prior hash, so the
    // probe set IS the prior split's distinct hashes)
    "x61_dedup_index_probe" ->
      s"""WITH b AS (SELECT doc_id, ${polyHashSql("text")} AS fp,
            ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 10 AS bk FROM documents)
          SELECT min(doc_id) AS doc_id, fp
          FROM b WHERE bk >= 8
            AND fp NOT IN (SELECT fp FROM b WHERE bk <= 7)
          GROUP BY fp ORDER BY doc_id""",
    // x62: content-defined chunking — a boundary falls BEFORE every
    // position (p >= 2) whose 8-gram rolling hash is divisible by 64;
    // chunks are the segments between successive boundaries (whole doc if
    // none), hashed with the same portable polyhash, rolled up per source
    "x62_cdc_chunk_stats" ->
      s"""WITH pos AS MATERIALIZED (
            SELECT doc_id, text,
              unnest(generate_series(2, length(text) - 7)) AS p
            FROM documents WHERE length(text) >= 9),
          bnd AS (SELECT doc_id, p FROM pos
                  WHERE ${polyHashSql("substring(text, p, 8)")} % 64 = 0),
          alb AS (SELECT doc_id, 1 AS p FROM documents WHERE length(text) > 0
                  UNION ALL SELECT doc_id, p FROM bnd
                  UNION ALL SELECT doc_id, length(text) + 1 FROM documents
                  WHERE length(text) > 0),
          ch AS (SELECT doc_id, p AS a,
                   lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS b
                 FROM alb),
          chunks AS MATERIALIZED (
            SELECT c.doc_id, b - a AS len,
              ${polyHashSql("substring(d.text, a, b - a)")} AS h
            FROM ch c JOIN documents d ON d.doc_id = c.doc_id
            WHERE b IS NOT NULL)
          SELECT d.source, count(*) AS n_chunks,
            count(DISTINCT h) AS n_unique_chunks,
            CAST(sum(len) AS BIGINT) AS total_chars,
            (count(*) - count(DISTINCT h)) * 1000000 // count(*) AS dup_ppm
          FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
          GROUP BY d.source ORDER BY d.source""",
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
    "x17_contamination" -> x17Oracle,
    // identical by construction: the Bloom pre-filter has no false
    // negatives, so x17b must reproduce x17's rows exactly
    "x17b_contamination_bloom" -> x17Oracle,
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
    "x20_bm25_topk" ->
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
          ORDER BY bm25 DESC, doc_id LIMIT 10""",
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
    "x25_stratified_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
            ${polyHashSql("CAST(doc_id AS VARCHAR)")} AS rk FROM documents),
          w AS (SELECT lang, doc_id, CAST(row_number() OVER
                  (PARTITION BY lang ORDER BY rk, doc_id) AS BIGINT) AS pick
                FROM r)
          SELECT lang, pick, doc_id FROM w WHERE pick <= 30
          ORDER BY lang, pick""",
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
    // max(epoch(ts)) = epoch(max(ts)): monotone transform, matches the
    // engine's epochSeconds(cm.max_ts) projection of the fused aggregate
    "a11_count_max" ->
      s"""SELECT coalesce(event_type, 'no_category') AS category,
          count(ts) AS n_events, max(${epochS("ts")}) AS max_epoch
          FROM events GROUP BY 1 ORDER BY 1""",
    // t11 = a11 executed as a complete-mode streaming aggregation: same
    // oracle (finite source => batch-equivalent)
    "t11_stream_count_max" ->
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
    "x31_pagerank" -> Graphs.pagerankOracleSql(),
    "x32_column_profile" -> Profile.columnProfileOracleSql,
    "x33_zorder_layout" -> Layout.zorderOracleSql,
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
