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
    "t18_stream_delete_propagation" -> (StreamingIngest.streamDeletePropagation _),
    "t19_stream_retract_view" -> (StreamingIngest.streamRetractView _),
    "t20_stream_index_delete" -> (StreamingIngest.streamIndexDelete _),
    "t21_stream_bm25_stats" -> ((s, d) => StreamingIngest.streamBm25Stats(s, d)),
    "t22_stream_index_upsert" -> (StreamingIngest.streamIndexUpsert _),
    "t23_stream_dedup_index_upsert" -> (StreamingIngest.streamDedupIndexUpsert _),
    "t24_stream_neardup_index_upsert" -> (StreamingIngest.streamNearDedupIndexUpsert _),
    "t25_stream_span_index_upsert" -> (StreamingIngest.streamSpanIndexUpsert _),
    "t26_stream_multi_artifact_upsert" -> (StreamingIngest.streamMultiArtifactUpsert _),
    "t27_stream_semantic_index_upsert" -> ((s, d) => StreamingIngest.streamSemanticIndexUpsert(s, d)),
    "t28_stream_bloom_decontam" -> ((s, d) => StreamingIngest.streamBloomDecontam(s, d)),
    "t29_stream_maintain_compact" -> (StreamingIngest.streamMultiArtifactMaintain _),
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
    "x80_ann_delete_topk" -> ((s, d) => Similarity.ivfDeleteTopK(s, d)),
    "x83_ivfpq_layer_delete" -> ((s, d) => Similarity.ivfPqDeleteTopK(s, d)),
    "x84_ivfpq_upsert" -> ((s, d) => Similarity.ivfPqUpsertTopK(s, d)),
    "x85_ivfpq_compact" -> ((s, d) => Similarity.ivfPqCompactTopK(s, d)),
    "x86_dedup_index_delete" -> (Dedup.dedupIndexDelete _),
    "x87_dedup_index_upsert" -> (Dedup.dedupIndexUpsert _),
    "x88_dedup_index_compact" -> (Dedup.dedupIndexCompact _),
    "x95_compact_policy" -> (Dedup.dedupIndexCompactPolicy _),
    "x94_multi_artifact_upsert" -> (Maintenance.multiArtifactUpsertQuery _),
    "x96_multi_artifact_compact" -> (Maintenance.multiArtifactCompactQuery _),
    "x89_neardup_index_upsert" -> (Dedup.nearDedupIndexUpsert _),
    "x90_neardup_index_compact" -> (Dedup.nearDedupIndexCompact _),
    "x91_span_index_upsert" -> (TextAnalysis.spanIndexUpsertProbe _),
    "x97_span_epoch_compact" -> (TextAnalysis.spanEpochProbe _),
    "x92_semantic_index_upsert" -> ((s, d) => Similarity.semanticIndexUpsert(s, d)),
    "x93_bloom_index_decontam" -> ((s, d) => Dedup.bloomIndexDecontam(s, d)),
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
    "x98_cluster_index_upsert" -> ((s, d) => Dedup.clusterIndexUpsertQuery(s, d)),
    "t30_stream_cluster_index_upsert" -> (StreamingIngest.streamClusterIndexUpsert _),
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
    // round 12: corpus maintenance — delete propagation + incremental
    // aggregate (materialized-view) maintenance
    "x75_delete_propagation" -> ((s, d) => Ingest.deletePropagation(s, d)),
    "x76_agg_delta_merge" -> ((s, d) => Counters.aggDeltaMerge(s, d)),
    // round 13: the maintenance story completed — retraction folding,
    // streaming delete propagation, maintained retrieval stats
    "x77_agg_retract_merge" -> ((s, d) => Maintenance.aggRetractMerge(s, d)),
    "x78_bm25_append" -> ((s, d) => Search.bm25AppendTopK(s, d)),
    "x81_bm25_delete" -> ((s, d) => Search.bm25DeleteTopK(s, d)),
    "x82_bm25_upsert" -> ((s, d) => Search.bm25UpsertTopK(s, d)),
    "x79_agg_upsert_merge" -> ((s, d) => Maintenance.aggUpsertMerge(s, d)),
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
    // a typo'd name must be LOUD: a silent empty selection benches nothing
    // and reports a passing 0.0 s total
    only.foreach(names => names.diff(queries.keySet) match {
      case miss if miss.nonEmpty => System.err.println(
        s"[graft] SPARK_GRAFT_ONLY names no declared query: ${miss.toSeq.sorted.mkString(", ")}")
      case _ =>
    })
    queries.filter { case (name, _) => only.forall(_.contains(name)) }
  }

  /** DuckDB oracles, one per SQL-expressible query — declared in the
    * per-family objects under `graft.oracles` (round-11 split; the shared
    * snippet builders live in `graft.oracles.OracleDefs`). Keys must stay
    * disjoint across families — asserted here so a copy-paste duplicate
    * cannot silently shadow an oracle. */
  def oracleSql: Map[String, String] = {
    val fams: Seq[(String, Map[String, String])] = Seq(
      "relational" -> graft.oracles.RelationalOracles.sql,
      "streaming" -> graft.oracles.StreamingOracles.sql,
      "dedup" -> graft.oracles.DedupOracles.sql,
      "text" -> graft.oracles.TextOracles.sql,
      "corpus" -> graft.oracles.CorpusOracles.sql,
      "multimodal" -> graft.oracles.MultimodalOracles.sql)
    val dups = fams.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, fs) => s"$k (${fs.map(_._2).mkString(", ")})" }
    require(dups.isEmpty,
      s"duplicate oracle key across family objects: ${dups.mkString("; ")}")
    fams.map(_._2).reduce(_ ++ _)
  }
}
