package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.WhitespaceCsv
import graft.pipeline.{CorpusOps, Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.retail.RetailQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (from [[Oracles]]) unless the operator is not SQL-expressible in DuckDB
  * (then the driver records a weaker rows-only check). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RetailQueries.q5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter_cat"          -> (RetailQueries.q1 _),
    "q2_count_distinct_mag"  -> (RetailQueries.q2 _),
    "q3_count_distinct_fab"  -> (RetailQueries.q3 _),
    "q4_avg_prod_per_fab"    -> (RetailQueries.q4 _),
    "q5_top_magasins"        -> (RetailQueries.q5 _),
    "q6_top_magasins_cat"    -> (RetailQueries.q6 _),
    "q7_mag_per_month"       -> (RetailQueries.q7 _),
    "q8_score_evolution"     -> (RetailQueries.q8 _),
    "q9_top1"                -> (RetailQueries.q9 _),
    "q10_avg_fab_top10"      -> (RetailQueries.q10 _),
    "q11_score_sante_months" -> (RetailQueries.q11 _),
    "q12_ingest"             -> (WhitespaceCsv.q12 _),
    // LLM-data-pipeline extension surface (SURVEY.md §2.8)
    "eq1_exact_dup_count"    -> (Dedup.exactDupCount _),
    "eq2_text_stats"         -> (TextAnalysis.textStats _),
    "eq3_hourly_windows"     -> (EventOps.hourly _),
    "eq4_cosine_topk"        -> ((s, d) => Similarity.cosineTopK(s, d)),
    "eq5_sessionize"         -> (EventOps.sessionize _),
    "eq6_sliding_windows"    -> (EventOps.sliding _),
    "eq7_token_stats"        -> (TextAnalysis.tokenStats _),
    "eq8_quality_score"      -> (TextAnalysis.qualityScore _),
    "eq9_lang_id"            -> (TextAnalysis.langId _),
    "eq10_fingerprint"       -> (TextAnalysis.fingerprint _),
    "eq11_dedup_keep_first"  -> (Dedup.dedupKeepFirst _),
    "eq12_jaccard_pairs"     -> (Dedup.jaccardPairs _),
    "eq13_embedding_neardups" -> (Dedup.embeddingNearDups _),
    "eq14_media_meta"        -> (Multimodal.mediaMeta _),
    "eq15_json_props"        -> (graft.star.StarQueries.jsonProps _),
    "eq16_revenue_by_nation" -> (graft.star.StarQueries.revenueByNation _),
    "eq17_top_suppliers"     -> (graft.star.StarQueries.topSuppliersPerNation _),
    "eq18_asof_attribution"  -> (graft.operators.TemporalJoins.asOfAttribution _),
    "eq19_range_pairs"       -> (graft.operators.TemporalJoins.rangePairsPerUser _),
    "eq20_rollup_revenue"    -> (graft.star.AggSurface.rollupRevenue _),
    "eq21_daily_pivot"       -> (graft.star.AggSurface.dailyEventPivot _),
    "eq22_value_percentiles" -> (graft.star.AggSurface.valuePercentiles _),
    "eq23_audience_set_ops"  -> (graft.star.AggSurface.audienceSetOps _),
    "eq24_daily_moving_avg"  -> (graft.star.AggSurface.dailyMovingAverage _),
    "eq25_above_avg_suppliers" -> (graft.star.AggSurface.aboveAvgSuppliers _),
    "eq26_neardup_clusters"  -> (Dedup.neardupClusters _),
    "eq27_hash_split"        -> (TextAnalysis.hashSplit _),
    "eq28_tfidf_top_terms"   -> (TextAnalysis.tfidfTopTerms _),
    "eq29_contamination"     -> (TextAnalysis.contamination _),
    "eq30_repetition_stats"  -> (TextAnalysis.repetitionStats _),
    "eq31_stratified_sample" -> (CorpusOps.stratifiedSample _),
    "eq32_doc_chunks"        -> (CorpusOps.docChunks _),
    "eq33_trigram_topk"      -> (CorpusOps.trigramTopK _),
    "eq34_pack_shards"       -> (CorpusOps.packShards _),
    "eq35_length_trim"       -> (CorpusOps.lengthTrim _),
    "eq36_label_centroids"   -> (Similarity.labelCentroids _),
    "eq37_winnow_fingerprints" -> (TextAnalysis.winnowFingerprints _),
    "eq38_quality_filter"    -> (TextAnalysis.qualityFilter _),
    "eq39_chunk_dedup"       -> (CorpusOps.chunkDedup _),
    "eq40_vocab_coverage"    -> (CorpusOps.vocabCoverage _),
    "eq41_semantic_dedup"    -> (Similarity.semanticDedup _),
    "eq42_novelty_rate"      -> (CorpusOps.noveltyRate _),
    "eq43_containment_pairs" -> (Dedup.containmentPairs _),
    "eq44_weighted_sample"   -> (CorpusOps.weightedSample _),
    "eq45_jsonl_ingest"      -> (graft.ingest.JsonlIngest.eq45 _),
    "eq46_quality_centroids" -> (Similarity.qualityCentroids _),
    "eq47_unigram_logprob"   -> (TextAnalysis.unigramLogprob _),
    "eq48_k_anonymity"       -> (CorpusOps.kAnonymity _),
    "eq49_source_overlap"    -> (Dedup.sourceOverlap _),
    "eq50_payload_chunks"    -> (Multimodal.payloadChunks _),
    "eq51_quality_topk"      -> (TextAnalysis.qualityTopK _),
    "eq52_centroid_affinity" -> (Similarity.centroidAffinity _),
    "eq53_interevent_gaps"   -> (EventOps.interEventGaps _),
    "eq54_curation_funnel"   -> (CorpusOps.curationFunnel _),
    "eq55_orc_roundtrip"     -> (graft.ingest.OrcRoundtrip.eq55 _),
    "eq56_pmi_bigrams"       -> (CorpusOps.pmiBigrams _),
    "eq57_label_variance"    -> (Similarity.labelVariance _),
    "eq58_retention_cohorts" -> (EventOps.retentionCohorts _),
    "eq59_event_funnel"      -> (EventOps.eventFunnel _),
    "eq60_rolling_actives"   -> (EventOps.rollingActives _),
    "eq61_pair_pagerank"     -> (Dedup.pairGraphPagerank _),
    "eq62_zipf_slope"        -> (CorpusOps.zipfSlope _),
    "eq63_normalized_dups"   -> (Dedup.normalizedDups _),
    "eq64_scd2_intervals"    -> (EventOps.scd2Tiers _),
    "eq65_corpus_mix"        -> (CorpusOps.corpusMix _),
    "eq66_sorted_neighborhood" -> (Dedup.sortedNeighborhood _),
    "eq68_equidepth_bins"    -> (graft.star.AggSurface.equidepthBins _),
    "eq67_cdc_compact"       -> (EventOps.cdcCompact _),
    "eq69_key_skew"          -> (EventOps.keySkewStats _),
    "eq70_decay_scores"      -> (EventOps.decayScores _),
    "eq71_gram_matrix"       -> (Similarity.gramTopPairs _),
    "eq72_pca_power"         -> (Similarity.pcaPowerIteration _),
    "eq73_session_paths"     -> (EventOps.sessionPaths _),
    "eq74_profile_columns"   -> (EventOps.profileColumns _),
    "eq75_edit_linkage"      -> (Dedup.editLinkage _),
    "eq76_grouping_sets"     -> (graft.star.AggSurface.groupingSetsRevenue _),
    "eq77_supplier_rank_dist" -> (graft.star.AggSurface.supplierRankDist _),
    "eq78_schema_drift"      -> (graft.ingest.SchemaDrift.eq78 _),
    "eq79_snapshot_diff"     -> (Dedup.snapshotDiff _),
    "eq80_transition_matrix" -> (EventOps.transitionMatrix _),
    "eq81_gap_anomalies"     -> (EventOps.gapAnomalies _),
    "eq82_co_purchases"      -> (EventOps.coPurchases _),
    "eq83_frame_samples"     -> (Multimodal.frameSamples _),
    "eq84_cluster_reps"      -> (Dedup.clusterReps _),
    "eq85_activity_profile"  -> (EventOps.activityProfile _),
    "eq86_media_resize"      -> (Multimodal.resizeMedia _),
    "eq87_psi_drift"         -> (graft.star.AggSurface.psiDrift _),
    "eq88_bm25_topk"         -> (TextAnalysis.bm25TopK _),
    "eq89_kmeans"            -> (graft.pipeline.Clustering.kmeans _),
    "eq90_bigram_surprise"   -> (TextAnalysis.bigramSurprise _),
    "eq91_trend_slopes"      -> (graft.star.StarQueries.trendSlopes _),
    "eq92_dup_spans"         -> (TextAnalysis.dupSpans _),
    "eq93_quality_quantile_norm" -> (TextAnalysis.qualityQuantileNorm _),
    "eq94_bootstrap_ci"      -> (EventOps.bootstrapCi _),
    "eq95_density_cores"     -> (Dedup.densityCores _),
    "eq96_asof_state_audit"  -> (EventOps.asofStateAudit _),
    "eq97_graph_clustering"  -> (Dedup.graphClustering _),
    "eq98_winsorized_means"  -> (graft.star.AggSurface.winsorizedMeans _),
    "eq99_modality_agreement" -> (Dedup.modalityAgreement _),
    "eq100_ewma_daily"       -> (EventOps.ewmaDaily _),
    "eq101_token_budget"     -> (CorpusOps.tokenBudget _),
    "eq102_pair_lift"        -> (EventOps.pairLift _),
    "eq103_quality_gates"    -> (EventOps.qualityGates _),
    "eq104_incremental_dedup" -> (Dedup.incrementalDedup _),
    "eq105_centroid_confusion" -> (Similarity.centroidConfusion _),
    "eq106_temperature_mix"  -> (CorpusOps.temperatureMix _),
    "eq107_bitext_mining"    -> (Similarity.bitextMine _),
    // approximate ops — oracle-checked like everything else: deterministic
    // pipelines (x1–x5, x7) are reconstructed verbatim in DuckDB (seeded
    // constants spliced as SQL literals, md5 as the shared hash);
    // implementation-defined sketches (x6, x8) emit oracle-checked exact
    // values plus error-bound flags the oracle pins TRUE
    "x1_minhash_lsh_pairs"   -> (Dedup.minhashLshPairs _),
    "x2_simhash_pairs"       -> (Dedup.simhashPairs _),
    "x3_ivf_topk"            -> ((s, d) => Similarity.ivfTopK(s, d)),
    "x4_media_features"      -> (Multimodal.featuresSummary _),
    "x5_lsh_topk"            -> ((s, d) => Similarity.lshTopK(s, d)),
    "x6_approx_distinct"     -> (Dedup.approxDistinct _),
    "x7_salted_agg"          -> (EventOps.saltedEventTotals _),
    "x8_approx_percentiles"  -> (graft.star.AggSurface.approxPercentiles _),
    "x9_bloom_contamination" -> (TextAnalysis.bloomContamination _),
    "x10_cms_topk"           -> (CorpusOps.cmsTopK _),
    "x11_quantize_embeddings" -> (Similarity.quantizeEmbeddings _),
    "x12_ann_recall"         -> (Similarity.annRecall _),
    "x13_approx_group_users" -> (EventOps.approxUsersPerType _),
    "x14_join_size_estimate" -> (EventOps.joinSizeEstimate _),
    "x15_matryoshka_recall"  -> (Similarity.matryoshkaRecall _),
    "x16_profile_columns_approx" -> (EventOps.profileColumnsApprox _),
    // streaming-surface parity frames: x17/x18 run the Structured
    // Streaming operators' code in batch mode, putting the streaming
    // surface under the driver's DuckDB oracle (VERDICT r6 ask)
    "x17_cdc_state_batch"    -> (graft.streaming.StreamingOps.cdcStateBatch _),
    "x18_enrich_history_batch" -> (graft.streaming.StreamingOps.enrichBatch _),
    "x19_attribution_batch"  -> (graft.streaming.StreamingOps.attributionBatch _),
    "x20_hll_merge_users"    -> (EventOps.hllMergeUsers _),
    "x21_pq_recall"          -> (graft.pipeline.Clustering.pqRecall _),
    "x22_session_window_batch" -> (graft.streaming.StreamingOps.sessionWindowBatch _),
    "x23_minhash_est_error"  -> (Dedup.minhashEstError _),
    "x24_lsh_probe_sweep"    -> ((s, d) => Similarity.lshProbeSweep(s, d)),
    "x25_salted_join"        -> (EventOps.saltedJoinTotals _),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. */
  def oracleSql: Map[String, String] = Oracles.retail ++ Oracles.pipeline
}
