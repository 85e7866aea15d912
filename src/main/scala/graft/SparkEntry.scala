package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Behavior, CoreQueries, Dashboard, FnSizing, JoinQueries, Roi, StorageTiers, Summaries, Trends}
import graft.cdc.Cdc
import graft.flight.Flight
import graft.geo.Geo
import graft.multimodal.Multimodal
import graft.prep.DataPrep
import graft.quality.{BatchChecks, Metrics, Quality, Quarantine}
import graft.sim.Similarity
import graft.text.TextOps
import graft.ts.TimeSeries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator from SURVEY.md §2;
  * entries with an exact ANSI-SQL equivalent also appear in [[oracleSql]]
  * (DuckDB-checked by the driver at sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02BandDistribution(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_overview"          -> (CoreQueries.q01Overview(_, _)),
    "q02_band_distribution" -> (CoreQueries.q02BandDistribution(_, _)),
    "q03_hourly_trend"      -> (CoreQueries.q03HourlyTrend(_, _)),
    "q04_peak_traffic"      -> (CoreQueries.q04PeakTraffic(_, _)),
    "q05_corridors"         -> (CoreQueries.q05Corridors(_, _)),
    "q06_anomaly_zscore"    -> (CoreQueries.q06AnomalyZscore(_, _)),
    "q07_segment_performance" -> (JoinQueries.q07SegmentPerformance(_, _)),
    "q08_nearest_match"     -> (JoinQueries.q08NearestMatch(_, _)),
    "q09_temporal_patterns" -> (JoinQueries.q09TemporalPatterns(_, _)),
    "q10_quality_trend"     -> (JoinQueries.q10QualityTrend(_, _)),
    "q11_top_per_segment"   -> (JoinQueries.q11TopPerSegment(_, _)),
    "q12_rollup_orders"     -> (JoinQueries.q12RollupOrders(_, _)),
    "q13_price_histogram"   -> (JoinQueries.q13PriceHistogram(_, _)),
    "q14_props_json"        -> (JoinQueries.q14PropsJson(_, _)),
    "q15_approx_distinct"   -> (JoinQueries.q15ApproxDistinct(_, _)),
    "q16_dedup_best"        -> (TimeSeries.q16DedupBest(_, _)),
    "q17_forward_fill"      -> (TimeSeries.q17ForwardFill(_, _)),
    "q18_interpolate"       -> (TimeSeries.q18Interpolate(_, _)),
    "q19_rates"             -> (TimeSeries.q19Rates(_, _)),
    "q20_cum_distance"      -> (TimeSeries.q20CumDistance(_, _)),
    "q21_text_stats"        -> (TextOps.q21TextStats(_, _)),
    "q22_lang_id"           -> (TextOps.q22LangId(_, _)),
    "q23_normalized_dedup"  -> (TextOps.q23NormalizedDedup(_, _)),
    "q24_ngram_jaccard"     -> (TextOps.q24NgramJaccard(_, _)),
    "q25_minhash_lsh"       -> (TextOps.q25MinhashLsh(_, _)),
    "q26_cosine_topk"       -> (Similarity.q26CosineTopK(_, _)),
    "q27_ann_lsh"           -> (Similarity.q27AnnLsh(_, _)),
    "q28_quality_score"     -> (Quality.q28QualityScore(_, _)),
    "q29_quarantine_split"  -> (Quality.q29QuarantineSplit(_, _)),
    "q30_stuck_detection"   -> (Quality.q30StuckDetection(_, _)),
    "q31_geofence"          -> (Quality.q31Geofence(_, _)),
    "q32_teleport"          -> (Quality.q32Teleport(_, _)),
    "q33_flight_enrich"     -> (Flight.q33FlightEnrich(_, _)),
    "q34_multimodal_stats"  -> (Multimodal.q34MultimodalStats(_, _)),
    "q35_dashboard_stats"   -> (Dashboard.q35DashboardStats(_, _)),
    "q36_imputation_values" -> (Dashboard.q36ImputationValues(_, _)),
    "q37_fingerprints"      -> (TextOps.q37Fingerprints(_, _)),
    // q38 is the EXACT-θ dedup (deliberately Θ(N²) compares, evenly
    // distributed via Similarity.exactPairsBlocked — the only sound plan
    // when θ sits inside the random-similarity tail; see its scaladoc).
    // The PRODUCTION default for real near-dup corpora (tight sims ≳ 0.9)
    // is the linear-in-N LSH path: q100_lsh_dedup /
    // Similarity.approxEmbeddingDedup. Reach for q38's shape only when
    // exact threshold semantics are the requirement and the corpus is
    // small enough to pay quadratic compares.
    "q38_embedding_dedup"   -> (Similarity.q38EmbeddingDedup(_, _)),
    "q39_peak_hours"        -> (BatchChecks.q39PeakHours(_, _)),
    "q40_iqr_outliers"      -> (BatchChecks.q40IqrOutliers(_, _)),
    "q41_batch_check_suite" -> (BatchChecks.q41BatchCheckSuite(_, _)),
    "q42_sessionize"        -> (TimeSeries.q42Sessionize(_, _)),
    "q43_ann_ivf"           -> (Similarity.q43AnnIvf(_, _)),
    "q44_token_counts"      -> (TextOps.q44TokenCounts(_, _)),
    "q45_daily_via_hourly"  -> (Summaries.q45DailyViaHourly(_, _)),
    "q46_approx_percentiles" -> (Dashboard.q46ApproxPercentiles(_, _)),
    "q47_cube_activity"     -> (JoinQueries.q47CubeActivity(_, _)),
    "q48_quality_filter"    -> (TextOps.q48QualityFilter(_, _)),
    "q49_decontaminate"     -> (TextOps.q49Decontaminate(_, _)),
    "q50_arg_extrema"       -> (JoinQueries.q50ArgExtrema(_, _)),
    "q51_semi_anti"         -> (JoinQueries.q51SemiAnti(_, _)),
    "q52_airport_proximity" -> (Geo.q52AirportProximity(_, _)),
    "q53_realtime_metrics"  -> (Dashboard.q53RealtimeMetrics(_, _)),
    "q54_quality_dashboard" -> (Dashboard.q54QualityDashboard(_, _)),
    "q55_corridor_classify" -> (Geo.q55CorridorClassify(_, _)),
    "q56_sampling_estimate" -> (Dashboard.q56SamplingEstimate(_, _)),
    "q57_repetition_filter" -> (TextOps.q57RepetitionFilter(_, _)),
    "q58_asof_join"         -> (TimeSeries.q58AsofJoin(_, _)),
    "q59_dup_clusters"      -> (TextOps.q59DupClusters(_, _)),
    "q60_stratified_sample" -> (DataPrep.q60StratifiedSampleScaled(_, _)),
    "q61_dataset_split"     -> (DataPrep.q61DatasetSplit(_, _)),
    "q62_token_packing"     -> (DataPrep.q62TokenPacking(_, _)),
    "q63_range_join"        -> (TimeSeries.q63RangeJoin(_, _)),
    "q64_distribution_ranks" -> (JoinQueries.q64DistributionRanks(_, _)),
    "q65_set_ops"           -> (JoinQueries.q65SetOps(_, _)),
    "q66_pivot"             -> (JoinQueries.q66Pivot(_, _)),
    "q67_unpivot"           -> (JoinQueries.q67Unpivot(_, _)),
    "q68_grouping_sets"     -> (JoinQueries.q68GroupingSets(_, _)),
    "q69_edit_distance"     -> (JoinQueries.q69EditDistance(_, _)),
    "q70_range_frame"       -> (TimeSeries.q70RangeFrame(_, _)),
    "q71_mad_outliers"      -> (BatchChecks.q71MadOutliers(_, _)),
    "q72_vocab_stats"       -> (TextOps.q72VocabStats(_, _)),
    "q73_pii_scrub"         -> (DataPrep.q73PiiScrub(_, _)),
    "q74_boilerplate_passages" -> (TextOps.q74BoilerplatePassages(_, _)),
    "q75_sketch_reagg"      -> (Summaries.q75SketchReagg(_, _)),
    "q76_corpus_funnel"     -> (TextOps.q76CorpusFunnel(_, _)),
    "q77_unigram_logprob"   -> (TextOps.q77UnigramLogprob(_, _)),
    "q78_bm25_rank"         -> (TextOps.q78Bm25Rank(_, _)),
    "q79_frame_sample"      -> (Multimodal.q79FrameSample(_, _)),
    "q80_cdc_upsert"        -> (Cdc.q80CdcUpsert(_, _)),
    "q81_scd2_history"      -> (Cdc.q81Scd2History(_, _)),
    "q82_chunk_overlap"     -> (DataPrep.q82ChunkOverlap(_, _)),
    "q83_source_quota"      -> (DataPrep.q83SourceQuota(_, _)),
    "q84_bigram_pmi"        -> (TextOps.q84BigramPmi(_, _)),
    "q85_tfidf_top"         -> (TextOps.q85TfidfTop(_, _)),
    "q86_funnel"            -> (Behavior.q86Funnel(_, _)),
    "q87_retention"         -> (Behavior.q87Retention(_, _)),
    "q88_transitions"       -> (Behavior.q88Transitions(_, _)),
    "q89_zorder_layout"     -> (Geo.q89ZorderLayout(_, _)),
    "q90_mixture_weights"   -> (DataPrep.q90MixtureWeights(_, _)),
    "q91_token_kl"          -> (TextOps.q91TokenKl(_, _)),
    "q92_drift_monitor"     -> (Trends.q92DriftMonitor(_, _)),
    "q93_trend_slope"       -> (Trends.q93TrendSlope(_, _)),
    "q94_centroid_cosine"   -> (Similarity.q94CentroidCosine(_, _)),
    "q95_decile_calibration" -> (DataPrep.q95DecileCalibration(_, _)),
    "q96_incremental_dedup" -> (TextOps.q96IncrementalDedup(_, _)),
    "q97_schema_profile"    -> (BatchChecks.q97SchemaProfile(_, _)),
    "q98_key_skew"          -> (Trends.q98KeySkew(_, _)),
    "q99_cooccurrence_lift" -> (Behavior.q99CooccurrenceLift(_, _)),
    "q100_lsh_dedup"        -> (Similarity.q100LshDedup(_, _)),
    "q101_salted_agg"       -> (Trends.q101SaltedAgg(_, _)),
    "q102_image_decode"     -> (Multimodal.q102ImageDecode(_, _)),
    "q103_query_cost_audit" -> (Dashboard.q103QueryCostAudit(_, _)),
    "q104_dup_clusters_star" -> (TextOps.q104DupClustersStar(_, _)),
    "q105_minhash_band_dedup" -> (TextOps.q105MinhashBandDedup(_, _)),
    "q106_repeated_spans"   -> (TextOps.q106RepeatedSpans(_, _)),
    "q107_heavy_hitters"    -> (Summaries.q107HeavyHitters(_, _)),
    "q108_quantization_audit" -> (Similarity.q108QuantizationAudit(_, _)),
    "q109_source_overlap"   -> (TextOps.q109SourceOverlap(_, _)),
    "q110_snapshot_diff"    -> (Cdc.q110SnapshotDiff(_, _)),
    "q111_semantic_dedup"   -> (Similarity.q111SemanticDedup(_, _)),
    "q112_shingle_novelty"  -> (TextOps.q112ShingleNovelty(_, _)),
    "q113_dedup_roi"        -> (TextOps.q113DedupRoi(_, _)),
    "q114_dedup_survivorship" -> (TextOps.q114DedupSurvivorship(_, _)),
    "q115_cluster_safe_split" -> (TextOps.q115ClusterSafeSplit(_, _)),
    "q116_embedding_decontam" -> (Similarity.q116EmbeddingDecontam(_, _)),
    "q117_curation_export"  -> (TextOps.q117CurationExport(_, _)),
    "q118_incremental_clusters" -> (TextOps.q118IncrementalClusters(_, _)),
    "q119_image_neardup"    -> (Multimodal.q119ImageNearDup(_, _)),
    "q120_audio_decode"     -> (Multimodal.q120AudioDecode(_, _)),
    "q121_video_decode"     -> (Multimodal.q121VideoDecode(_, _)),
    "q122_post_dedup_mixture" -> (TextOps.q122PostDedupMixture(_, _)),
    "q123_quarantine_ledger" -> (Quarantine.q123QuarantineLedger(_, _)),
    "q124_image_resize"     -> (Multimodal.q124ImageResize(_, _)),
    "q125_alert_suppression" -> (Metrics.q125AlertSuppression(_, _)),
    "q126_analyzer_summary" -> (Summaries.q126AnalyzerSummary(_, _)),
    "q127_bucketed_join"    -> (JoinQueries.q127BucketedJoin(_, _)),
    "q128_audio_frame_features" -> (Multimodal.q128AudioFrameFeatures(_, _)),
    "q129_partition_audit"  -> (Dashboard.q129PartitionAudit(_, _)),
    "q130_latency_profile"  -> (Dashboard.q130LatencyProfile(_, _)),
    // rows-only: writer-benchmark timings are machine facts (EtlBenchSpec
    // pins the config-independent invariants)
    "q131_etl_benchmark"    -> (graft.ops.EtlBench.q131EtlBenchmark(_, _)),
    // rows-only: warm/cold wall times are machine facts (WarmColdSpec)
    "q132_warm_cold_profile" -> (graft.ops.WarmCold.q132WarmColdProfile(_, _)),
    "q133_cache_recommendations" -> (Dashboard.q133CacheRecommendations(_, _)),
    "q134_storage_tier_recommendations" ->
      (StorageTiers.q134StorageTierRecommendations(_, _)),
    "q135_roi_portfolio"    -> (Roi.q135RoiPortfolio(_, _)),
    "q136_function_rightsizing" -> (FnSizing.q136FunctionRightsizing(_, _)),
    "q137_cost_dashboard"   -> (Dashboard.q137CostDashboard(_, _)),
    // LSH/IVF retrieval with planted probes: recall provably 1.0, oracle exact
    "q138_ann_planted"      -> (Similarity.q138AnnPlanted(_, _)),
    "q139_ivf_planted"      -> (Similarity.q139IvfPlanted(_, _)),
    "q140_simhash_planted"  -> (TextOps.q140SimhashPlanted(_, _)),
    // the local dashboard's summary endpoint, sampled-stats quirks and all
    "q141_flight_summary"   -> (Flight.q141FlightSummary(_, _)),
    // r13: persisted-index probe paths — pay the index at ingest, prune at
    // query time (bucket pruning / partition pruning), exact planted oracles
    "q142_lsh_index_probe"  -> (Similarity.q142LshIndexProbe(_, _)),
    "q143_ivf_partitioned_probe" -> (Similarity.q143IvfPartitionedProbe(_, _)),
    // r13: exact-integer Efraimidis–Spirakis weighted sampling over the
    // bounded two-phase top-K sampler
    "q144_weighted_sample"  -> (DataPrep.q144WeightedSample(_, _)),
    // r13: incremental index maintenance — delta batch appended into the
    // bucketed layout, probes served from base ∪ delta without a rebuild
    "q145_index_append_probe" -> (Similarity.q145IndexAppendProbe(_, _)),
    // r13: the IVF-side append — frozen persisted centroids, crash-atomic
    // temp-dir build, partition-pruned serving over base ∪ delta
    "q146_ivf_append_probe" -> (Similarity.q146IvfAppendProbe(_, _)),
    // r13: index health audit (rows-only: signatures engine-seeded,
    // centroids accumulation-noisy; IndexStatsSpec pins conservation)
    "q147_index_stats" -> (Similarity.q147IndexStats(_, _)),
    // r13: bucket-layout-preserving index compaction — build, append
    // twice, compact to one file per bucket, probe through the compacted
    // layout (same exact planted oracle; physical claims pinned in spec)
    "q148_index_compact_probe" -> (Similarity.q148IndexCompactProbe(_, _)),
    // r13: SQ8-quantized index (tinyint codes, 4x less index I/O) with
    // exact full-precision rescore of the pruned candidate set
    "q149_sq_index_probe" -> (Similarity.q149SqIndexProbe(_, _)),
    // r13: online near-dup admission gate against the persisted index
    // (distributed sig join — the ingest-batch form; streaming wrapper
    // in Streaming.dedupGateStream)
    "q150_dedup_gate" -> (Similarity.q150DedupGate(_, _)),
    // r13: text-side exact-content admission gate over the persisted
    // MinHash band index (q150's text twin; near-dup stays with q96)
    "q151_text_gate_index" -> (TextOps.q151TextGateIndex(_, _)),
    // r13: deterministic mixture rebalance — integer keep-rates + the
    // q144 hash-uniform draw make the downsample bit-reproducible
    "q152_mixture_rebalance" -> (DataPrep.q152MixtureRebalance(_, _)),
    // r13: per-source ingest admission funnel — gate tiers + C4 quality
    // rules composed with reason precedence
    "q153_ingest_funnel" -> (TextOps.q153IngestFunnel(_, _)),
    // r15: SQ8-quantized IVF layout (tinyint codes in cid partitions,
    // frozen centroids + codebook) with exact full-precision rescore —
    // q149's storage tier for the other index family
    "q154_sq_ivf_probe" -> (Similarity.q154SqIvfProbe(_, _)),
    // r15: append into the quantized IVF layout — frozen centroids route,
    // frozen codebook codes (saturating), crash-atomic build+append;
    // completes the append story for all four index flavors
    "q156_sq_ivf_append_probe" -> (Similarity.q156SqIvfAppendProbe(_, _)),
    // r15: tombstone deletion from the persisted index (merge-on-read
    // marks, bucket-aligned serving anti-join, physical purge at fold) —
    // probes of deleted content provably flip to their surviving copies
    "q157_index_delete_probe" -> (Similarity.q157IndexDeleteProbe(_, _)),
    // r15: deletion for the directory IVF layout — sidecar marks routed
    // by the frozen centroids, partition-scoped purge
    "q159_ivf_delete_probe" -> (Similarity.q159IvfDeleteProbe(_, _)),
    // r15: deletion for the quantized IVF layout — candidate-stage
    // anti-join closes the last serving path without a takedown story
    "q160_sq_ivf_delete_probe" -> (Similarity.q160SqIvfDeleteProbe(_, _)),
    // r15: deletion's text twin — after tombstoning docs out of the band
    // index, re-ingested copies gate as unique again (re-admission)
    "q158_text_delete_gate" -> (TextOps.q158TextDeleteGate(_, _)),
    // r16: maintenance REBUILD of a directory IVF layout with outstanding
    // deletion debt — sidecar marks honored by exclusion (the rebuild IS
    // the purge), probed through the plain path with no live view
    "q161_ivf_rebuild_probe" -> (Similarity.q161IvfRebuildProbe(_, _)),
    // r16: the appendable-table rebuild under a re-derived bucket count —
    // marks honored by exclusion, re-bucketed base, plain-path probe
    "q162_index_rebuild_probe" -> (Similarity.q162IndexRebuildProbe(_, _)),
    // r16: the quantized-flavor rebuild — fresh-frozen centroids,
    // codebook and codes over the survivors, plain two-stage probe
    "q163_sq_ivf_rebuild_probe" -> (Similarity.q163SqIvfRebuildProbe(_, _)),
    // r17: serving across the LEVELED fold's generation partitions with
    // standing marks — the amortized consolidation path, live-view probe
    "q164_leveled_fold_probe" -> (Similarity.q164LeveledFoldProbe(_, _)),
    "q165_scoped_purge_probe" -> (Similarity.q165ScopedPurgeProbe(_, _)),
    // r19: the converging purge — fold-committed-head + re-purge when
    // victims are live-batch-resident (the purge_age SLA's erasure tool)
    "q166_converging_purge_probe" ->
      (Similarity.q166ConvergingPurgeProbe(_, _)),
    // r15: maintenance scheduler — integer when-to-act decisions (compact
    // / fold / rebalance / re-derive params) over the lifecycle's own
    // facts, one row per (layout, check); rows-only (filesystem/catalog
    // facts), triggers planted in MaintenanceSpec
    "q155_maintenance_schedule" -> ((s, d) =>
      graft.ops.Maintenance.q155MaintenanceSchedule(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops
    * (q15_approx_distinct: HLL sketch values differ engine-to-engine;
    * its spec asserts ≤5% relative error instead). */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ JoinQueries.oracle ++ TimeSeries.oracle ++
      TextOps.oracle ++ Similarity.oracle ++ Quality.oracle ++ Flight.oracle ++
      Multimodal.oracle ++ Dashboard.oracle ++ BatchChecks.oracle ++
      Summaries.oracle ++ Geo.oracle ++ DataPrep.oracle ++ Cdc.oracle ++
      Behavior.oracle ++ Trends.oracle ++ Quarantine.oracle ++ Metrics.oracle ++
      StorageTiers.oracle ++ Roi.oracle ++ FnSizing.oracle
}
