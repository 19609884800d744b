package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Relational, Windows}
import graft.operators.{AsOfJoin, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.udx.Udx

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.3 has a `queries` entry;
  * all SQL-expressible ones also carry a DuckDB oracle in `oracleSql`
  * (identical column names + ORDER BY, exact decimal aggregation — see
  * Relational's determinism notes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q10Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan" -> Relational.q01Scan _,
    "q02_filter_project" -> Relational.q02FilterProject _,
    "q03_conditional" -> Relational.q03Conditional _,
    "q04_join_inner" -> Relational.q04JoinInner _,
    "q05_join_broadcast" -> Relational.q05JoinBroadcast _,
    "q06_join_left" -> Relational.q06JoinLeft _,
    "q07_join_semi" -> Relational.q07JoinSemi _,
    "q08_join_anti" -> Relational.q08JoinAnti _,
    "q09_join_theta" -> Relational.q09JoinTheta _,
    "q10_agg" -> Relational.q10Agg _,
    "q10b_percentile" -> Relational.q10bPercentile _,
    "q10c_stats" -> Relational.q10cStats _,
    "q11_count_distinct" -> Relational.q11CountDistinct _,
    "q13b_grouping_sets" -> Relational.q13bGroupingSets _,
    "q13c_pivot" -> Relational.q13cPivot _,
    "q12_approx_distinct" -> Relational.q12ApproxDistinctChecked _,
    "q13_rollup" -> Relational.q13Rollup _,
    "q14_window_rank" -> Relational.q14WindowRank _,
    "q14b_window_dist" -> Relational.q14bWindowDist _,
    "q15_window_frame" -> Relational.q15WindowFrame _,
    "q15b_window_nav" -> Relational.q15bWindowNav _,
    "q10d_argmax" -> Relational.q10dArgmax _,
    "q09b_range_join" -> graft.operators.RangeJoin.q09bRangeJoin _,
    "q06c_full_outer" -> Relational.q06cFullOuter _,
    "q13d_unpivot" -> Relational.q13dUnpivot _,
    "q11b_multi_distinct" -> Relational.q11bMultiDistinct _,
    "q17b_setops_all" -> Relational.q17bSetOpsAll _,
    "ts_gapfill" -> ((s: SparkSession, d: String) => graft.operators.TimeSeries.gapFillHourly(s, d)),
    // linear interpolation twin of the LOCF gapfill: both direction
    // passes share one (user, hour) exchange + sort
    "ts_interpolate" ->
      ((s: SparkSession, d: String) => graft.operators.TimeSeries.interpolateHourly(s, d)),
    "q26b_topk_multi" -> ((s: SparkSession, d: String) => Similarity.q26bTopKMulti(s, d)),
    "emb_label_centroids" -> Similarity.labelCentroids _,
    "emb_hard_negatives" ->
      ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    "q16_topk" -> Relational.q16TopK _,
    "q17_setops" -> Relational.q17SetOps _,
    "q18_strings" -> Relational.q18Strings _,
    "q18b_strings" -> Relational.q18bStrings _,
    "q19_dates" -> Relational.q19Dates _,
    "q19b_dates" -> Relational.q19bDates _,
    "q20_math" -> Relational.q20Math _,
    "q21_arrays" -> Relational.q21Arrays _,
    "q21_explode" -> Relational.q21Explode _,
    "q21c_higher_order" -> Relational.q21cHigherOrder _,
    "q21e_array_fns" -> Relational.q21eArrayFns _,
    "q21f_outer_explode" -> Relational.q21fOuterExplode _,
    "q21g_array_set_ops" -> Relational.q21gArraySetOps _,
    "q21d_struct" -> Relational.q21dStruct _,
    "q19c_parse" -> Relational.q19cParse _,
    "q22_maps" -> Relational.q22Maps _,
    "q22b_map_hof" -> Relational.q22bMapHof _,
    "q23_json" -> Relational.q23Json _,
    "q23b_json_quarantine" -> Relational.q23bJsonQuarantine _,
    "q06d_nullsafe_join" -> Relational.q06dNullSafeJoin _,
    "q16b_offset" -> Relational.q16bOffset _,
    "q24_subquery" -> Relational.q24Subquery _,
    "q24b_in_subquery" -> Relational.q24bInSubquery _,
    "q24d_anti_argmax" -> Relational.q24dAntiArgmax _,
    "q24c_lateral" -> Relational.q24cLateral _,
    "q12b_approx_percentile" -> Relational.q12bApproxPercentileChecked _,
    "q06b_nulls" -> Relational.q06bNulls _,
    "q25_dedup_exact" -> Relational.q25DedupExact _,
    "q25b_asof_join" -> AsOfJoin.clickToSignup _,
    "q25d_asof_native" -> AsOfJoin.clickToSignupNative _,
    "q25c_funnel" -> Relational.q25cFunnel _,
    "q25e_funnel_windowed" -> Relational.q25eFunnelWindowed _,
    "q26_cosine_topk" -> Similarity.q26CosineTopK _,
    "q26c_filtered_topk" -> ((s: SparkSession, d: String) => Similarity.q26cFilteredTopK(s, d)),
    "q26_ann_lsh" -> Similarity.annLshChecked _,
    "q26_ann_ivf" -> Similarity.annIvfChecked _,
    "q26_ann_pq" -> Similarity.annPqChecked _,
    // IVFADC: coarse cells + product-quantized residuals, ADC scan
    "q26_ann_ivfpq" -> Similarity.annIvfPqChecked _,
    "q27_top_tokens" -> TextAnalysis.q27TopTokens _,
    "q30_tumble" -> Windows.q30Tumble _,
    // Flink Window Deduplication TVF parity: first row per key per
    // window via one min-of-struct aggregate
    "q30e_window_dedup" -> Windows.q30eWindowDedup _,
    "q31_slide" -> Windows.q31Slide _,
    "q31_session" -> Windows.q31Session _,
    "q31c_dynamic_session" -> Windows.q31cDynamicSession _,
    "dedup_exact_text" -> Dedup.exactText _,
    // incremental ingest: batch-vs-snapshot novelty filter, bloom
    // prefilter + digest-keyed exact confirm (row-identical to the
    // anti-join the oracle runs)
    "dedup_bloom_snapshot" -> Dedup.bloomSnapshotDedup _,
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    // bucket-occupancy cap contract: loose cap ≡ unbounded, tight cap
    // subset-only (the LSH megabucket guardrail)
    "dedup_minhash_bounded" ->
      ((s: SparkSession, d: String) => Dedup.minhashBoundedChecked(s, d)),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhash(s, d)),
    "dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.nearDupClusters(s, d)),
    "dedup_canonical" -> ((s: SparkSession, d: String) => Dedup.nearDupCanonical(s, d)),
    "dedup_embedding" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDup(s, d)),
    // the scale path for the same semantics: banded-LSH candidate
    // pruning + exact re-rank, gated on its subset/recall contract
    "dedup_embedding_lsh" ->
      ((s: SparkSession, d: String) => Similarity.embeddingNearDupLshChecked(s, d)),
    "text_token_stats" -> TextAnalysis.tokenStats _,
    "text_langid" -> TextAnalysis.langId _,
    // reliability diagram for the langid confidence: decile bins,
    // per-bin mean confidence vs empirical accuracy, ECE terms
    "dq_calibration" -> TextAnalysis.calibrationReport _,
    // vocabulary coverage curve: count-histogram + sharded prefix sums,
    // boundary classes closed in exact integer arithmetic
    "text_vocab_coverage" -> TextAnalysis.vocabCoverage _,
    // tokenizer fertility per language: integer sums, ratio at the end
    "text_fertility" -> TextAnalysis.textFertility _,
    // audio silence-strip: real WAV decode, one PCM scan for the
    // threshold span; oracle certifies from the closed generation form
    "mm_audio_trim" ->
      ((s: SparkSession, d: String) => Multimodal.audioTrim(s, d)),
    // per-group exact heavy hitters: one Misra-Gries sketch per group,
    // broadcast recount of the bounded candidate set
    "freq_heavy_hitters_grouped" ->
      ((s: SparkSession, d: String) =>
        operators.HeavyHitters.freqHeavyHittersGrouped(s, d)),
    // join-key skew diagnostic: count-histogram collapse + sharded
    // prefix sum; percentiles integer cross-multiplied
    "dq_skew_report" -> operators.Quality.dqSkewReport _,
    // exact pre-join cardinality from the two per-key count tables
    "dq_join_cardinality" -> operators.Quality.dqJoinCardinality _,
    "text_quality" -> TextAnalysis.qualityScore _,
    "text_fingerprint" -> TextAnalysis.fingerprint _,
    "text_rolling_fp" -> TextAnalysis.rollingFingerprint _,
    // content-defined chunk dedup: shift-resistant boundaries from the
    // trailing-window rolling hash; digest-keyed shuffles
    "text_cdc_chunks" -> TextAnalysis.cdcChunkDedup _,
    // KMV bottom-k distinct sketch: bounded-heap mergeable estimator
    // that doubles as a uniform distinct-sample; self-checking verdicts
    "sketch_kmv_distinct" ->
      ((s: SparkSession, d: String) => operators.SketchRollup.kmvDistinct(s, d)),
    // entity resolution: banded blocking -> in-block levenshtein ->
    // transitive clusters -> survivorship (lowest-id original wins)
    "er_pairs" ->
      ((s: SparkSession, d: String) => operators.EntityResolution.erPairs(s, d)),
    "er_entities" ->
      ((s: SparkSession, d: String) => operators.EntityResolution.erEntities(s, d)),
    // incremental linkage: delta joins lowest matched base entity or
    // forms new clusters among unmatched deltas — base never re-pairs
    "er_incremental" ->
      ((s: SparkSession, d: String) => operators.EntityResolution.erIncremental(s, d)),
    "text_redact" -> TextAnalysis.redactPii _,
    "text_train_split" -> TextAnalysis.trainValSplit _,
    // leakage-safe split: near-dup clusters never straddle train/val
    "text_leakage_split" ->
      ((s: SparkSession, d: String) => TextAnalysis.leakageSafeSplit(s, d)),
    // capstone composition: canonical dedup ∩ train split → token-budget
    // shards via the distributed prefix sum
    "pipe_train_shards" ->
      ((s: SparkSession, d: String) => TextAnalysis.trainShards(s, d)),
    // within-document tile dedup (C4-family repetition removal)
    "text_intra_dedup" ->
      ((s: SparkSession, d: String) => TextAnalysis.intraDocDedup(s, d)),
    "text_tfidf" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTopTerms(s, d)),
    "text_sim_pairs" ->
      ((s: SparkSession, d: String) => TextAnalysis.tfidfSimilarPairs(s, d)),
    "text_stratified_sample" -> TextAnalysis.stratifiedSample _,
    "text_repetition" -> TextAnalysis.repetitionScore _,
    "text_unigram_logprob" -> TextAnalysis.unigramLogprob _,
    "text_pack" -> ((s: SparkSession, d: String) => TextAnalysis.packSequences(s, d)),
    "mm_media_meta" -> Multimodal.mediaMeta _,
    "mm_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    "mm_corpus_stats" -> Multimodal.corpusStats _,
    "mm_dim_join" -> Multimodal.dimJoin _,
    "mm_char_histogram" -> ((s: SparkSession, d: String) => Multimodal.charHistogram(s, d)),
    "mm_resize" -> ((s: SparkSession, d: String) => Multimodal.resizeMeta(s, d)),
    "udx_scalar" -> Udx.udxScalar _,
    "udx_udaf" -> Udx.udxUdaf _,
    "udx_udtf" -> Udx.udxUdtf _,
    "q10e_corr" -> Relational.q10eCorr _,
    "q10f_histogram" -> Relational.q10fHistogram _,
    "q10g_listagg" -> Relational.q10gListagg _,
    "q10h_outliers" -> Relational.q10hOutliers _,
    "q15c_range_frame" -> Relational.q15cRangeFrame _,
    "q20b_bitagg" -> Relational.q20bBitAgg _,
    "q28b_cohort" -> Analytics.q28bCohort _,
    "sql_tpch_q3" -> Analytics.sqlTpchQ3 _,
    "sql_tpch_q5" -> Analytics.sqlTpchQ5 _,
    "sql_tpch_q1" -> Analytics.sqlTpchQ1 _,
    "sql_tpch_q6" -> Analytics.sqlTpchQ6 _,
    "sql_tpch_q10" -> Analytics.sqlTpchQ10 _,
    "sql_tpch_q18" -> Analytics.sqlTpchQ18 _,
    "sql_tpch_q14" -> Analytics.sqlTpchQ14 _,
    "sql_tpch_q15" -> Analytics.sqlTpchQ15 _,
    "sql_tpch_q17" -> Analytics.sqlTpchQ17 _,
    "graph_pagerank" -> graft.operators.Graph.copurchasePageRank _,
    // hash-ring negative sampling: deterministic link-prediction
    // negatives, shard-banded successor lookup + anti-join rejection
    "graph_negative_sample" -> graft.operators.Graph.negativeSample _,
    "ts_ohlc" -> graft.operators.TimeSeries.tsOhlc _,
    "ts_ewma" -> graft.operators.TimeSeries.tsEwma _,
    "ts_ewma_anomaly" -> graft.operators.TimeSeries.tsEwmaAnomaly _,
    "ts_cusum" -> graft.operators.TimeSeries.tsCusum _,
    // watermark-design report: sharded prefix-max over arrival order,
    // lateness percentiles off a domain-bounded seconds histogram
    "ts_watermark_report" -> graft.operators.TimeSeries.tsWatermarkReport _,
    // purged temporal split: exact p80 boundary via the q10p machinery,
    // 1-day embargo applied in the same plan
    "ts_embargo_split" -> graft.operators.TimeSeries.tsEmbargoSplit _,
    // first/last-touch conversion attribution: one key exchange, two
    // ignore-nulls frames over the same sorted layout
    "feat_attribution" -> Analytics.touchAttribution _,
    // behavioral path mining: top 3-step type sequences, gap-bounded
    // transitions, one key exchange + leads
    "path_trigrams" -> Analytics.pathTrigrams _,
    // quantile/rank feature transform table: per-group ECDF positions
    // via the histogram + sharded prefix sum
    "feat_quantile_transform" ->
      ((s: SparkSession, d: String) => Analytics.featQuantileTransform(s, d)),
    "recon_fingerprint" -> graft.operators.Reconcile.ordersFingerprint _,
    "agg_incremental_rollup" -> graft.operators.RollupMerge.monthlyFromDaily _,
    "recon_merge" -> graft.operators.Reconcile.ordersMerge _,
    "mm_binary_dedup" -> Multimodal.binaryDedup _,
    "pipe_media_curation" ->
      ((s: SparkSession, d: String) => Multimodal.mediaCuration(s, d)),
    "dedup_containment" ->
      ((s, dir) => graft.operators.Dedup.containmentPairs(s, dir)),
    "q10n_winsorize" -> Relational.q10nWinsorize _,
    "emb_label_balance" -> Similarity.labelBalance _,
    "emb_kmeans" ->
      ((s, dir) => graft.operators.KMeans.kmeansClusters(s, dir)),
    // SemDeDup: cluster-partitioned semantic near-dup pruning — pairwise
    // kernel confined within k-means cells, lowest id per group survives
    "emb_semdedup" -> ((s, dir) => Similarity.semDedup(s, dir)),
    "emb_semdedup_bounded" ->
      ((s, dir) => Similarity.semDedupBoundedChecked(s, dir)),
    "emb_semdedup_hier" ->
      ((s, dir) => Similarity.semDedupHierChecked(s, dir)),
    // recursive (bounded-fanout) refinement — the 100 TB production
    // path, gated on flat facts + live subset/partition verdicts
    "emb_semdedup_rec" ->
      ((s, dir) => Similarity.semDedupRecChecked(s, dir)),
    // changelog-source aggregation: I/U/D replay through
    // transformWithState, latest snapshot per group vs the net state
    "stream_changelog_agg" ->
      ((s, dir) => graft.streaming.StreamingOps.changelogAggGate(s, dir)),
    // retractable Top-N over the same changelog: a delete of a podium
    // id must promote the best id outside it (full-state rank)
    "stream_changelog_topn" ->
      ((s, dir) => graft.streaming.StreamingOps.retractTopNGate(s, dir)),
    // changelog equi-join: two I/U/D inputs -> joined-row changelog;
    // the signed-count fold of the emitted deltas must equal the
    // definitional net-state join
    "stream_changelog_join" ->
      ((s, dir) => graft.streaming.StreamingOps.changelogJoinGate(s, dir)),
    // left-outer variant: null-padded rows for unmatched left ids are
    // themselves retractable state (padding swaps on the right side's
    // empty<->non-empty transitions)
    "stream_changelog_join_left" ->
      ((s, dir) => graft.streaming.StreamingOps.changelogLeftJoinGate(s, dir)),
    // full-outer closure: padding in BOTH directions, two association
    // counters
    "stream_changelog_join_full" ->
      ((s, dir) => graft.streaming.StreamingOps.changelogFullJoinGate(s, dir)),
    // event-time temporal join (FOR SYSTEM_TIME AS OF rowtime): each
    // fact joins the dimension VERSION valid at its event time; facts
    // buffer against the watermark, D ops close the key
    "stream_temporal_join" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.temporalJoinGate(s, dir, false)),
    // left-outer form: facts with no valid version (none yet, or
    // D-closed) survive null-padded
    "stream_temporal_join_left" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.temporalJoinGate(s, dir, true)),
    // row-time ROWS-frame OVER aggregation: last-3-preceding trailing
    // sums per event, (ts, id)-pinned total order, O(n) deque state
    "stream_over_rows" ->
      ((s, dir) => graft.streaming.StreamingOps.rowsOverGate(s, dir)),
    // the r10 RANGE-frame OVER stream, upgraded from spec tier to a
    // driver gate through the same replay harness
    "stream_over_range" ->
      ((s, dir) => graft.streaming.StreamingOps.rangeOverGate(s, dir)),
    // streaming replay gates for the Q30/Q31 window family — each
    // operator's append-mode output over a 2-batch day-folded replay
    // must equal the definitional batch computation
    "stream_tumble" ->
      ((s, dir) => graft.streaming.StreamingOps.streamTumbleGate(s, dir)),
    "stream_slide" ->
      ((s, dir) => graft.streaming.StreamingOps.streamSlideGate(s, dir)),
    "stream_cumulate" ->
      ((s, dir) => graft.streaming.StreamingOps.streamCumulateGate(s, dir)),
    "stream_session" ->
      ((s, dir) => graft.streaming.StreamingOps.streamSessionGate(s, dir)),
    "stream_dynamic_session" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamDynamicSessionGate(s, dir)),
    // streaming drift monitor: per-window value-histogram PSI against
    // a reference histogram, one stateful op (pivoted bucket counts)
    "stream_drift_psi" ->
      ((s, dir) => graft.streaming.StreamingOps.streamDriftPsiGate(s, dir)),
    // Window Top-N (transformWithState) over the same replay
    "stream_window_topn" ->
      ((s, dir) => graft.streaming.StreamingOps.streamWindowTopNGate(s, dir)),
    // stream-stream joins: interval (per-event ±delta band) and window
    // (same-tumble-bucket) forms, both emitting pairs exactly once
    "stream_interval_join" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamIntervalJoinGate(s, dir)),
    "stream_window_join" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamWindowJoinGate(s, dir)),
    // left-outer interval join: the null-padded row a never-matched
    // click emits at watermark expiry — the outer path dominates
    "stream_interval_join_left" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamIntervalJoinLeftGate(s, dir)),
    // full-outer interval join: both padding directions at watermark
    // expiry — the symmetric closure of the stream-stream join family
    "stream_interval_join_full" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamIntervalJoinFullGate(s, dir)),
    // Q32 dedup: cross-batch exactly-once per (user, type) key over a
    // horizon longer than the fixture (TTL eviction is spec-tier)
    "stream_dedup" ->
      ((s, dir) => graft.streaming.StreamingOps.streamDedupGate(s, dir)),
    // upsert sink: CDC replay through the write-then-swap materialized
    // view; live view = latest per key, tombstoned keys absent
    "stream_upsert_view" ->
      ((s, dir) => graft.streaming.StreamingOps.upsertSinkGate(s, dir)),
    // streaming CEP: the cepStream transformWithState automaton over
    // the day-folded replay with a 10-minute window that BINDS (the
    // shared-buffer fallback runs against the oracle, not just specs)
    "stream_cep" ->
      ((s, dir) => graft.streaming.StreamingOps.streamCepGate(s, dir)),
    // unbounded append-stream Top-N: latest versioned snapshot per
    // group == the definitional ROW_NUMBER cut (monotone threshold)
    "stream_topn" ->
      ((s, dir) => graft.streaming.StreamingOps.streamTopNGate(s, dir)),
    // live EWMA / CUSUM scans: per-user summaries of the emitted
    // per-row flags vs the batch folds (shared step functions)
    "stream_ewma" ->
      ((s, dir) => graft.streaming.StreamingOps.streamEwmaGate(s, dir)),
    "stream_cusum" ->
      ((s, dir) => graft.streaming.StreamingOps.streamCusumGate(s, dir)),
    // live last-touch attribution: one credit per preceded purchase
    "stream_attribution" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamAttributionGate(s, dir)),
    // windowed dedup: exactly one row per (10-min window, user) across
    // the batch seam; surviving-row identity is spec-tier (intra-batch
    // shuffle order is not deterministic)
    "stream_window_dedup" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamWindowDedupGate(s, dir)),
    // streaming SKIP TO NEXT ROW: the revisit pattern's overlapping
    // matches across the micro-batch seam (day-folded replay)
    "stream_cep_skip" ->
      ((s, dir) => graft.streaming.StreamingOps.streamCepSkipGate(s, dir)),
    // MATCH_RECOGNIZE-class contiguous pattern matching: click → view+
    // → purchase per user within 7d, SKIP PAST LAST ROW
    "cep_funnel" ->
      ((s, dir) => graft.operators.Cep.cepFunnel(s, dir)),
    // the widened CEP class: non-adjacent repeat (view click view),
    // 24h window binding — the shared-buffer fallback path in the gate
    "cep_revisit" ->
      ((s, dir) => graft.operators.Cep.cepRevisit(s, dir)),
    // OPTIONAL-step CEP class: click -> error? -> purchase, 12h window
    // binding both shapes (direct pairs + error-mediated triples)
    "cep_optional" ->
      ((s, dir) => graft.operators.Cep.cepOptional(s, dir)),
    // ALTERNATION CEP class: click -> (view|error)+ -> purchase, 24h
    // window binding (133/264 funnels survive)
    "cep_alternation" ->
      ((s, dir) => graft.operators.Cep.cepAlternation(s, dir)),
    // BOUNDED-REPEAT CEP class: click -> view{2,3} -> purchase; both
    // bounds bind (72 funnels below lo, 3 above hi; 15 match)
    "cep_bounded" ->
      ((s, dir) => graft.operators.Cep.cepBounded(s, dir)),
    // MEASURES clause: per-match per-step COUNT/SUM/FIRST/LAST over
    // the funnel's pattern variables (3 rows per match)
    "cep_measures" ->
      ((s, dir) => graft.operators.Cep.cepMeasures(s, dir)),
    // AFTER MATCH SKIP TO NEXT ROW: overlapping revisit triples all
    // emit — provably differs from cep_revisit's SKIP PAST LAST ROW
    "cep_skip_next" ->
      ((s, dir) => graft.operators.Cep.cepSkipNext(s, dir)),
    // AFTER MATCH SKIP TO FIRST click: the selective strategy between
    // PAST LAST ROW and TO NEXT ROW (window-kill fallback binds)
    "cep_skip_first" ->
      ((s, dir) => graft.operators.Cep.cepSkipFirst(s, dir)),
    // relaxed contiguity (Flink CEP followedBy): subsequence funnel,
    // rows between steps skipped; window + non-overlap cuts both bind
    "cep_followed_by" ->
      ((s, dir) => graft.operators.Cep.cepFollowedBy(s, dir)),
    // LAZY quantifiers (+?): view+? view resolves islands into
    // consecutive disjoint pairs, eager completion, window frame-shift
    "cep_reluctant" ->
      ((s, dir) => graft.operators.Cep.cepReluctant(s, dir)),
    // the streaming twin over the day-folded replay (5-min window)
    "stream_cep_reluctant" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepReluctantGate(s, dir)),
    // DEFINE predicates + wildcard + trailing quantifier: the SQL-
    // standard V-pattern (STRT any, DOWN+ value<PREV, UP+ value>PREV)
    "cep_vshape" ->
      ((s, dir) => graft.operators.Cep.cepVshape(s, dir)),
    // the streaming twin over the day-folded replay (1 h window),
    // values riding the buffer state through cepStreamValued
    "stream_cep_vshape" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepVshapeGate(s, dir)),
    // BACKTRACKING walk: view+ view (outside the collapse-closure
    // class) — greedy back-off, window chunking, pending-tail rules
    "cep_backtrack" ->
      ((s, dir) => graft.operators.Cep.cepBacktrack(s, dir)),
    // the streaming twin over the day-folded replay (3-min window)
    "stream_cep_backtrack" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepBacktrackGate(s, dir)),
    // the streaming twin over the day-folded replay (5-min window)
    "stream_cep_followed" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepFollowedGate(s, dir)),
    // NEGATIVE patterns (Flink notFollowedBy/notNext): the abandoned-
    // cart trailing absence — click with no purchase within 12h
    "cep_not_followed" ->
      ((s, dir) => graft.operators.Cep.cepNotFollowed(s, dir)),
    // middle-position absence: click -> (no error) -> purchase
    "cep_not_between" ->
      ((s, dir) => graft.operators.Cep.cepNotBetween(s, dir)),
    // strict notNext: click purchase pairs whose next row is not an
    // error (window-scoped; end-of-data + horizon passes bind)
    "cep_not_next" ->
      ((s, dir) => graft.operators.Cep.cepNotNext(s, dir)),
    // the streaming abandoned cart: absence emits on horizon timers
    "stream_cep_not_followed" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepNotFollowedGate(s, dir)),
    // LOOPING RELAXED STATES: followedBy + greedy oneOrMore (take
    // commits when the window closes over the start)
    "cep_followed_plus" ->
      ((s, dir) => graft.operators.Cep.cepFollowedPlus(s, dir)),
    "stream_cep_followed_plus" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepFollowedPlusGate(s, dir)),
    // cross-variable DEFINE under RELAXED contiguity (r16): the relaxed
    // funnel where the purchase must beat FIRST(V.value) — a failed
    // predicate is SKIPPED (not a kill), interacting with greedy takes
    "cep_cross_followed" ->
      ((s, dir) => graft.operators.Cep.cepCrossFollowed(s, dir)),
    // running-aggregate DEFINE: bounded-spend click -> purchase+ with
    // SUM(value) <= 150.00 (cap, window, and multi-row cuts all bind)
    "cep_define_agg" ->
      ((s, dir) => graft.operators.Cep.cepDefineAgg(s, dir)),
    // PREV(value, 2) offset DEFINE over a trailing quantified run
    "cep_prev2" ->
      ((s, dir) => graft.operators.Cep.cepPrev2(s, dir)),
    // GROUP QUANTIFIERS: PATTERN ((A B)+ C) — repetition of a
    // SEQUENCE via the compiled split-program machine
    "cep_group" ->
      ((s, dir) => graft.operators.Cep.cepGroup(s, dir)),
    // the streaming twin over the day-folded replay (10-min window)
    "stream_cep_group" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepGroupGate(s, dir)),
    // SEQUENCE ALTERNATION under repetition: ((c v | v c))+ purchase
    "cep_alt_group" ->
      ((s, dir) => graft.operators.Cep.cepAltGroup(s, dir)),
    // MEASURES over a GROUP QUANTIFIER: per-leaf aggregates
    // accumulated across iterations of ((click|view)(signup|error))+
    "cep_group_measures" ->
      ((s, dir) => graft.operators.Cep.cepGroupMeasures(s, dir)),
    // the SQL-string surface: the standard's V-pattern MATCH_RECOGNIZE
    // clause parsed to the programmatic form (oracle = cep_vshape's)
    "sql_match_recognize" ->
      ((s, dir) =>
        graft.operators.MatchRecognize.sqlMatchRecognize(s, dir)),
    // the MEASURES side of the SQL surface: per-variable aggregates
    // pivoted to one named column per measure, one row per match
    "sql_mr_measures" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrMeasures(s, dir)),
    // ALL ROWS PER MATCH: every consumed row emitted under its
    // CLASSIFIER (the standard's other output mode)
    "sql_mr_all_rows" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrAllRows(s, dir)),
    // the STREAMING SQL surface: the V clause parsed and asserted
    // structurally == the programmatic machine, sharing the vshape
    // replay (one store lifecycle for the two keys)
    "stream_sql_mr" ->
      ((s, dir) => graft.streaming.StreamingOps.streamSqlMrGate(s, dir)),
    // PERMUTE(A, B, C): all-orderings pattern, parsed to the 6-arm
    // sequence alternation (Calcite's expansion) on the split-program
    "cep_permute" ->
      ((s, dir) => graft.operators.MatchRecognize.cepPermute(s, dir)),
    // SUBSET union variables + MATCH_NUMBER() on the ONE-ROW pivot:
    // U = (V, P) pools members' steps; FINAL marker accepted-ignored
    "sql_mr_subset" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrSubset(s, dir)),
    // RUNNING/FINAL per-row MEASURES + CLASSIFIER() over ALL ROWS PER
    // MATCH — prefix-frame vs whole-match window functions per row
    "sql_mr_running" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrRunning(s, dir)),
    // WITH UNMATCHED ROWS: the full input rides along — non-consumed
    // rows with null match identity/classifier/measures (one anti-join)
    "sql_mr_unmatched" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrUnmatched(s, dir)),
    // Flink CEP timed-out partial matches (within + timeout handler):
    // matches AND window-expired partials in one pass, kills silent
    "cep_timeout" ->
      ((s, dir) => graft.operators.Cep.cepTimeout(s, dir)),
    // the STREAMING timeout side output: row-driven + timer-driven
    // expirations off the shared multi-pattern replay (tag 1000 rides
    // the same store lifecycle as stream_cep's tag 0)
    "stream_cep_timeout" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepTimeoutGate(s, dir)),
    // STREAMING MEASURES: per-(match, step) aggregates emitted live as
    // matches complete, pivoted by the batch runner's own pivot
    "stream_sql_mr_measures" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamSqlMrMeasuresGate(s, dir)),
    // the open-ended quantifier {m,} (Flink timesOrMore): the funnel
    // needing AT LEAST two views — the bound kills single-view runs
    "cep_rep_open" ->
      ((s, dir) => graft.operators.MatchRecognize.cepRepOpen(s, dir)),
    // CROSS-VARIABLE DEFINE navigation (r15): the purchase compared
    // against FIRST(V.value) and the bare C.value — the Flink-canonical
    // DEFINE class the parser previously rejected
    "cep_cross_define" ->
      ((s, dir) => graft.operators.MatchRecognize.cepCrossDefine(s, dir)),
    // MEASURES expression breadth (r15): AVG(V.value) first-class and
    // +/− arithmetic over aggregates inside the one-row pivot
    "sql_mr_measures_ext" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrMeasuresExt(s, dir)),
    // late-data observability: the per-operator dropped-late counter,
    // oracled against the definitional watermark formula on a
    // deliberately disordered two-batch replay
    "stream_late_obs" ->
      ((s, dir) => graft.streaming.StreamingOps.streamLateObsGate(s, dir)),
    // bounded-depth multi-source BFS over the sparse co-purchase graph
    // vs DuckDB WITH RECURSIVE — the iterative-fixpoint capability row
    "graph_bfs" ->
      ((s, dir) => graft.operators.Graph.copurchaseBfs(s, dir)),
    // BM25 ranked retrieval for a fixed query vs the definitional
    // replay (6dp-quantized contributions, decimal sum)
    "text_bm25" ->
      ((s, dir) => TextAnalysis.bm25TopDocs(s, dir)),
    "q13e_cube" -> Relational.q13eCube _,
    "q15d_ignore_nulls" -> Relational.q15dIgnoreNulls _,
    "q10p_percentile_disc" ->
      ((s: SparkSession, d: String) => Relational.q10pPercentileDisc(s, d)),
    "q23c_variant" -> Relational.q23cVariant _,
    "q14c_ratio_to_report" -> Relational.q14cRatioToReport _,
    "mix_group_sample" ->
      ((s, dir) => graft.operators.Mixing.groupSample(s, dir)),
    "sql_tpch_q4" -> Analytics.sqlTpchQ4 _,
    "sql_tpch_q7" -> Analytics.sqlTpchQ7 _,
    "sql_tpch_q8" -> Analytics.sqlTpchQ8 _,
    "sql_tpch_q12" -> Analytics.sqlTpchQ12 _,
    "sql_tpch_q13" -> Analytics.sqlTpchQ13 _,
    "sql_tpch_q19" -> Analytics.sqlTpchQ19 _,
    "sql_tpch_q21" -> Analytics.sqlTpchQ21 _,
    "sql_tpch_q22" -> Analytics.sqlTpchQ22 _,
    "sql_tpch_q2" -> Analytics.sqlTpchQ2 _,
    "sql_tpch_q9" -> Analytics.sqlTpchQ9 _,
    "sql_tpch_q11" -> Analytics.sqlTpchQ11 _,
    "sql_tpch_q16" -> Analytics.sqlTpchQ16 _,
    "sql_tpch_q20" -> Analytics.sqlTpchQ20 _,
    "sql_null_semantics" -> Analytics.sqlNullSemantics _,
    "text_decontam" -> TextAnalysis.decontamNgram _,
    // bloom-prefiltered twin: identical output (no false negatives +
    // exact confirm), fixed-size broadcast sketch instead of a broadcast
    // gram table -- the non-broadcastable-eval-side scale path
    "text_decontam_bloom" -> TextAnalysis.decontamBloom _,
    "text_span_dedup" -> TextAnalysis.spanDedup _,
    // exact substring dedup (suffix family, Lee et al. 2021): maximal
    // cross-doc token runs >= 15 via shingle-diagonal islands —
    // arbitrary alignment, the class span tiling misses
    "text_substring_dedup" -> TextAnalysis.substringDedup _,
    // the APPLY side: lower-doc-id keeps; per doc the UNION of removed
    // token ranges across partners (no double-count on overlaps)
    "text_substring_dedup_apply" -> TextAnalysis.substringDedupApply _,
    // the REWRITE side: the re-materialized corpus with removed token
    // ranges cut (Lee et al.'s actual output; hashed on clean_text)
    "text_substring_dedup_rewrite" ->
      TextAnalysis.substringDedupRewrite _,
    // the INCREMENTAL side: incoming docs vs the standing corpus only
    // (ingestion-time contamination accounting, bloom-snapshot shape)
    "text_substring_novelty" -> TextAnalysis.substringNovelty _,
    // streaming cross-variable DEFINE: the cep_cross_define funnel live
    // off the shared multi-pattern replay (spec 9, appended)
    "stream_cep_cross" ->
      ((s, dir) => graft.streaming.StreamingOps.streamCepCrossGate(s, dir)),
    // streaming RELAXED cross-variable DEFINE (r16): the
    // cep_cross_followed funnel live off the shared replay (spec 10,
    // appended) — path-tracked FIRST(V) navigation on the state path
    "stream_cep_cross_followed" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepCrossFollowedGate(s, dir)),
    // CROSS-VARIABLE DEFINE on a GROUPED pattern (r17, the last CEP
    // rejection class): the group chain where the purchase must beat
    // FIRST(A.value) — the repeated leaf's pool accumulates across
    // iterations, predicate failure falls back along the chain
    "cep_cross_group" ->
      ((s, dir) => graft.operators.Cep.cepCrossGroup(s, dir)),
    // the streaming twin off the shared replay (spec 11, appended):
    // eagerly-recorded leaf pools on the streaming state path
    "stream_cep_cross_group" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamCepCrossGroupGate(s, dir)),
    // DEFINE/MEASURES FIELD BREADTH (r17): arbitrary numeric input
    // columns in both clauses — field-vs-literal and field-vs-field
    // row predicates via the product-alphabet projection; MEASURES
    // over a second column through the ALL-ROWS + field-join pivot
    "sql_mr_fields" ->
      ((s, dir) => graft.operators.MatchRecognize.sqlMrFields(s, dir)),
    // the STREAMING twin (r17, past the brief): the product-alphabet
    // projection mangles the replay's event types map-side and the
    // UNTOUCHED streaming processor evaluates the field predicates as
    // symbol membership; MEASURES enrich the drained spans with one
    // batch join (contiguity makes the span the exact consumed set)
    "stream_sql_mr_fields" ->
      ((s, dir) =>
        graft.streaming.StreamingOps.streamSqlMrFieldsGate(s, dir)),
    // the 8-byte-key production plan, gated on ≡ the string-keyed form
    "text_span_dedup_hashed" -> TextAnalysis.spanDedupHashedChecked _,
    // the substring family's 8-byte-key production twin: candidate join
    // on xxhash64 only, hash_eq pins set-equality with the string form
    "text_substring_dedup_hashed" -> TextAnalysis.substringDedupHashed _,
    // r17: hashedKeys threaded through the REST of the family — the
    // apply accounting, the re-materialized rewrite (clean_text
    // byte-compared), and novelty's two-index join (the widest string
    // exchange in the family), each hash_eq-pinned ≡ its string form
    "text_substring_apply_hashed" ->
      TextAnalysis.substringDedupApplyHashed _,
    "text_substring_rewrite_hashed" ->
      TextAnalysis.substringDedupRewriteHashed _,
    "text_substring_novelty_hashed" ->
      TextAnalysis.substringNoveltyHashed _,
    "layout_zorder" -> graft.operators.Layout.zorderKey _,
    // equi-depth range partitioner: definitional-percentile boundaries
    // via sharded prefix sum; per-shard count+range proves the layout
    "layout_range_partition" ->
      ((s: SparkSession, d: String) =>
        graft.operators.Layout.rangePartitionOrders(s, d)),
    "pipe_clean_corpus" -> TextAnalysis.cleanCorpus _,
    "q04b_bucketed_join" ->
      ((s, dir) => graft.operators.Bucketing.q04bBucketedJoin(s, dir)),
    "mix_source_cap" ->
      ((s, dir) => graft.operators.Mixing.mixSourceCap(s, dir)),
    "mix_temperature" ->
      ((s, dir) => graft.operators.Mixing.temperatureMix(s, dir)),
    "q10i_equidepth" -> Relational.q10iEquidepth _,
    "sketch_rollup" ->
      ((s, dir) => graft.operators.SketchRollup.sketchRollupChecked(s, dir)),
    "emb_quantize_topk" ->
      ((s, dir) => graft.operators.Quantization.embQuantizedTopK(s, dir)),
    // JL random projection 64→16 dims: fixed md5-parity sign matrix,
    // one fused map-side loop, zero shuffles
    "emb_random_projection" ->
      ((s, dir) => graft.operators.Quantization.randomProjection(s, dir)),
    "ts_scd2" ->
      ((s, dir) => graft.operators.TimeSeries.scd2Intervals(s, dir)),
    "q04c_salted_join" ->
      ((s, dir) => graft.operators.SkewJoin.q04cSaltedJoin(s, dir)),
    "q16c_topk_per_group" -> Relational.q16cTopKPerGroup _,
    "text_chunk" -> ((s, dir) => TextAnalysis.chunkDocs(s, dir)),
    "skyline_parts" ->
      ((s, dir) => graft.operators.Skyline.skylineParts(s, dir)),
    "ts_similarity" ->
      ((s, dir) => graft.operators.TimeSeries.tsSimilarity(s, dir)),
    "freq_heavy_hitters" ->
      ((s, dir) => graft.operators.HeavyHitters.freqHeavyHitters(s, dir)),
    "ts_time_weighted" ->
      ((s, dir) => graft.operators.TimeSeries.timeWeightedAvg(s, dir)),
    "mix_importance" ->
      ((s, dir) => graft.operators.Mixing.importanceSample(s, dir)),
    "drift_psi" ->
      ((s, dir) => graft.operators.Drift.psiByType(s, dir)),
    "profile_columns" ->
      ((s, dir) => graft.operators.Profile.profileLineitem(s, dir)),
    // the 100 TB profiling path (HLL distincts), gated on its envelope
    "profile_columns_approx" ->
      ((s, dir) => graft.operators.Profile.profileApproxLineitem(s, dir)),
    "ts_concurrency" ->
      ((s, dir) => graft.operators.TimeSeries.concurrency(s, dir)),
    "text_bigram_merges" ->
      ((s, dir) => TextAnalysis.bigramMerges(s, dir)),
    // BPE tokenizer training: first 6 learned merges over the corpus in
    // the word-frequency formulation (iterations are vocab-sized)
    "text_bpe_merges" ->
      ((s, dir) => TextAnalysis.bpeMerges(s, dir)),
    // BPE encode: apply the learned merges (rank-order chained
    // replaces, map-side) and report per-doc tokenization stats
    "text_bpe_encode" ->
      ((s, dir) => TextAnalysis.bpeEncode(s, dir)),
    "q30b_cumulate" -> Windows.q30bCumulate _,
    "ts_overlap" ->
      ((s, dir) => graft.operators.RangeJoin.tsOverlap(s, dir)),
    "dq_checks" ->
      ((s, dir) => graft.operators.Quality.dqOrders(s, dir)),
    "dedup_levenshtein" ->
      ((s, dir) => Dedup.levenshteinPairs(s, dir)),
    "q10j_spearman" -> ((s: SparkSession, d: String) => Relational.q10jSpearman(s, d)),
    "q09c_cross" -> Relational.q09cCross _,
    "q11c_bitmap_distinct" -> Relational.q11cBitmapDistinct _,
    "q10k_mad" -> Relational.q10kMad _,
    "recon_diff" ->
      ((s, dir) => graft.operators.Reconcile.reconOrders(s, dir)),
    "copurchase_pairs" -> Analytics.copurchasePairs _,
    "feat_user_rfm" -> Analytics.userRfmFeatures _,
    "graph_triangles" ->
      ((s, dir) => graft.operators.Graph.copurchaseTriangles(s, dir)),
    "text_feature_hash" ->
      ((s, dir) => TextAnalysis.featureHash(s, dir)),
    "text_bigram_logprob" -> TextAnalysis.bigramLogprob _,
    // model-based quality filter: linear classifier over hashed token
    // features (broadcast weight table; gate uses the md5 stand-in)
    "text_quality_classifier" ->
      ((s, dir) => TextAnalysis.qualityClassifier(s, dir)),
    // DSIR importance resampling: hashed-bigram log-ratio scoring +
    // deterministic Gumbel top-k toward the English target slice
    "text_dsir_select" ->
      ((s, dir) => TextAnalysis.dsirSelect(s, dir)),
    "q17c_union_by_name" -> Relational.q17cUnionByName _,
    "q30c_sliding_distinct" -> Windows.q30cSlidingDistinct _,
    "q30d_trending" -> Windows.q30dTrending _,
    "q10l_corr_matrix" -> Relational.q10lCorrMatrix _,
    "q10m_weighted_median" ->
      ((s: SparkSession, d: String) => Relational.q10mWeightedMedian(s, d)),
    "q04d_join_hints" -> Relational.q04dJoinHints _,
    "mix_pps_sample" ->
      ((s, dir) => graft.operators.Mixing.ppsSample(s, dir)),
    // approximate (HLL) — gated via the self-checking form: exact twin
    // + within_2pct contract verdict, hash-checked by the oracle
    "sketch_sliding_users" ->
      ((s, dir) => graft.operators.SketchRollup.slidingUserSketchesChecked(s, dir)),
    // approximate (KLL) — gated via the rank-audited self-checking form
    "sketch_quantile_rollup" ->
      ((s, dir) => graft.operators.SketchRollup.quantileRollupChecked(s, dir)),
    // theta IS duckdb-gated: exact mode below the 2^12 nominal capacity
    "sketch_theta_audience" ->
      ((s, dir) => graft.operators.SketchRollup.thetaAudience(s, dir)),
    "sketch_overlap_matrix" ->
      ((s, dir) => graft.operators.SketchRollup.overlapMatrix(s, dir)),
    "sketch_rank_sla" ->
      ((s, dir) => graft.operators.SketchRollup.slaAttainment(s, dir)),
    // Q29 — the reference replay through a REAL streaming write path
    // (MemoryStream → transform → foreachBatch parquet), gated against
    // the literal 4-row contract
    "q29_replay" ->
      ((s, dir) => graft.pipeline.TransactionPipeline.replayGate(s, dir)),
    // Avro ingest-edge quarantine: 5 good + 3 poison frames, gated on
    // per-disposition counts + decoded amount mass
    "pipe_avro_quarantine" ->
      ((s, dir) => graft.pipeline.TransactionPipeline.avroQuarantineGate(s, dir)),
    // real pixel resize: decode → NN resample to 4×4 → re-encode →
    // re-decode; stats read from the second decode
    "mm_resize_px" ->
      ((s: SparkSession, d: String) => Multimodal.resizeDecoded(s, d)),
    // per-frame decoded pixel sums (video featurizer shape)
    "mm_frame_stats" -> Multimodal.frameStats _,
    // audio modality: JDK WAV codec round-trip, decoded header + sums
    "mm_audio_meta" -> Multimodal.audioMeta _,
    // fps-style temporal sampling, pixel half: decode only every 2nd
    // frame, skip the rest at the container layer
    "mm_frame_sample_px" ->
      ((s: SparkSession, d: String) => Multimodal.frameSampleDecoded(s, d)),
    // fixed 16-sample analysis windows over decoded PCM (spectrogram
    // front-end shape): per-window counts, amplitude mass, energy
    "mm_audio_windows" ->
      ((s: SparkSession, d: String) => Multimodal.audioWindows(s, d)),
    // perceptual-hash (aHash) image dedup over genuinely decoded pixels
    "mm_ahash_dedup" -> Multimodal.ahashDedup _,
    // contrastive pair builder: decoded-aHash anchors + hash-ring
    // negatives with the perceptual true-negative guard
    "mm_pair_builder" ->
      ((s: SparkSession, d: String) => Multimodal.pairBuilder(s, d)),
    // hamming-banded perceptual NEAR-dup pairing (byte-band candidates,
    // exact popcount verify)
    "mm_ahash_near_dup" ->
      ((s: SparkSession, d: String) => Multimodal.ahashNearDup(s, d)),
    // media-as-files ingest through the binaryFile source + glob filter
    "mm_binary_files" -> Multimodal.binaryFileIngest _,
    // audio near-dup on decoded envelope signatures (bucket-blocked,
    // exact max-|Δ| verify) — the audio member of the near-dup family
    "mm_audio_near_dup" ->
      ((s: SparkSession, d: String) => Multimodal.audioNearDup(s, d)),
    // media dead-letter edge: poisoned payloads quarantine by error
    // class, survivors decode untouched
    "mm_media_quarantine" -> Multimodal.mediaQuarantine _,
  )

  /** DuckDB SQL fragments shared by several oracles. */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** Unrolled k-stage BPE training replay (the oracle for
    * `text_bpe_merges`): stage i counts adjacent symbol pairs over the
    * chr(31)-spelled vocab weighted by word count, picks the argmax by
    * (count DESC, left, right), and applies it with left-to-right
    * non-overlapping `replace` — exactly the trainer's loop.
    */
  private def bpeOracleSql(k: Int): String = {
    val stages = (1 to k).map { i =>
      s"p$i AS (SELECT ts[g.i] AS l, ts[g.i+1] AS r, SUM(cnt) AS c " +
        "FROM (SELECT cnt, list_filter(string_split(sp, chr(31)), " +
        s"x -> x <> '') AS ts FROM s${i - 1}) x, " +
        "LATERAL unnest(generate_series(1, len(x.ts)-1)) AS g(i) " +
        "GROUP BY 1, 2), " +
        s"t$i AS (SELECT CAST($i AS BIGINT) AS rank, l, r, c FROM p$i " +
        "ORDER BY c DESC, l, r LIMIT 1), " +
        s"s$i AS (SELECT cnt, replace(sp, " +
        s"(SELECT chr(31) || l || chr(31) || chr(31) || r || chr(31) FROM t$i), " +
        s"(SELECT chr(31) || l || r || chr(31) FROM t$i)) AS sp FROM s${i - 1})"
    }.mkString(", ")
    "WITH w AS (SELECT t AS word, COUNT(*) AS cnt FROM " +
      s"(SELECT unnest($toksSql) AS t FROM documents) GROUP BY 1), " +
      "s0 AS (SELECT cnt, regexp_replace(word, '(.)', " +
      "chr(31) || '\\1' || chr(31), 'g') AS sp FROM w), " + stages +
      " SELECT rank, l AS lft, r AS rgt, l || r AS merged, " +
      "CAST(c AS BIGINT) AS pair_cnt FROM (" +
      (1 to k).map(i => s"SELECT * FROM t$i").mkString(" UNION ALL ") +
      ") ORDER BY rank"
  }

  /** Oracle for `text_bpe_encode`: the [[bpeOracleSql]] training stages
    * verbatim, then the k learned merges applied per (doc, word) in
    * rank order via the same scalar-subquery replaces; token counting
    * is the separator-count arithmetic the Spark side uses.
    */
  private def bpeEncodeOracleSql(k: Int): String = {
    val trainStages = (1 to k).map { i =>
      s"p$i AS (SELECT ts[g.i] AS l, ts[g.i+1] AS r, SUM(cnt) AS c " +
        "FROM (SELECT cnt, list_filter(string_split(sp, chr(31)), " +
        s"x -> x <> '') AS ts FROM s${i - 1}) x, " +
        "LATERAL unnest(generate_series(1, len(x.ts)-1)) AS g(i) " +
        "GROUP BY 1, 2), " +
        s"t$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1), " +
        s"s$i AS (SELECT cnt, replace(sp, " +
        s"(SELECT chr(31) || l || chr(31) || chr(31) || r || chr(31) FROM t$i), " +
        s"(SELECT chr(31) || l || r || chr(31) FROM t$i)) AS sp FROM s${i - 1})"
    }.mkString(", ")
    val encodeStages = (1 to k).map { i =>
      s"q$i AS (SELECT doc_id, word, replace(sp, " +
        s"(SELECT chr(31) || l || chr(31) || chr(31) || r || chr(31) FROM t$i), " +
        s"(SELECT chr(31) || l || r || chr(31) FROM t$i)) AS sp FROM q${i - 1})"
    }.mkString(", ")
    "WITH w AS (SELECT t AS word, COUNT(*) AS cnt FROM " +
      s"(SELECT unnest($toksSql) AS t FROM documents) GROUP BY 1), " +
      "s0 AS (SELECT cnt, regexp_replace(word, '(.)', " +
      "chr(31) || '\\1' || chr(31), 'g') AS sp FROM w), " + trainStages + ", " +
      "q0 AS (SELECT doc_id, t AS word, regexp_replace(t, '(.)', " +
      "chr(31) || '\\1' || chr(31), 'g') AS sp FROM " +
      s"(SELECT doc_id, unnest($toksSql) AS t FROM documents)), " +
      encodeStages +
      s" SELECT doc_id, COUNT(*) AS n_words, " +
      "CAST(SUM(len(word)) AS BIGINT) AS n_chars, " +
      "CAST(SUM((len(sp) - len(replace(sp, chr(31), ''))) // 2) AS BIGINT) " +
      "AS n_bpe_tokens, " +
      "round(CAST(SUM(len(word)) AS DOUBLE) / " +
      "SUM((len(sp) - len(replace(sp, chr(31), ''))) // 2), 6) AS compression " +
      s"FROM q$k GROUP BY doc_id ORDER BY doc_id"
  }
  /** The entity-resolution dirty registry, rebuilt bit-for-bit from
    * `customer` (mirrors EntityResolution.dirtyRegistry: originals +
    * deletion-typo variant for custkey ≡ 0 mod 5 + substitution-typo
    * variant mod 10; all balance drift int-mod → double).
    */
  private val erRegistrySql =
    s"""r AS (
       |  SELECT c_custkey*10 AS rec_id, c_name AS name,
       |         c_nationkey AS nat, c_mktsegment AS seg, c_acctbal AS bal
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey*10 + 1,
       |         concat(substr(c_name, 1, 10 + c_custkey%8 - 1),
       |                substr(c_name, 10 + c_custkey%8 + 1, 32)),
       |         c_nationkey, c_mktsegment,
       |         c_acctbal + (c_custkey%9 - 4) * CAST(0.01 AS DOUBLE)
       |  FROM customer WHERE c_custkey%5 = 0
       |  UNION ALL
       |  SELECT c_custkey*10 + 2,
       |         concat(substr(c_name, 1, 10 + c_custkey%7 - 1), 'x',
       |                substr(c_name, 10 + c_custkey%7 + 1, 32)),
       |         c_nationkey, c_mktsegment,
       |         c_acctbal + (c_custkey%7 - 3) * CAST(0.01 AS DOUBLE)
       |  FROM customer WHERE c_custkey%10 = 0)""".stripMargin
  private val shinglesSql =
    s"""list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       | for i in range(1, len(toks)-1)])""".stripMargin.replace("\n", " ")
  /** Brute-force all-pairs shingle-Jaccard (the oracle for both the
    * MinHash-LSH and inverted-index implementations — approx-with-verify
    * equals exact on this corpus).
    */
  private val jaccardOracle =
    s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
       |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
       |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
       |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT i, j, round(CAST(inter AS DOUBLE)/(sa+sb-inter), 6) AS jac
       |FROM p WHERE (sa+sb-inter) > 0 AND CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.7
       |ORDER BY i, j""".stripMargin
  /** Definitional oracle for the self-checking ANN gate rows: exact
    * top-1 (id + score) from the raw vectors, plus the contract
    * verdicts pinned to their required values (`extra` appends the
    * per-family recall addenda).
    */
  private def annCheckedOracle(extra: String): String =
    """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
      |idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
      |s AS (SELECT b.vec_id,
      |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS dot,
      |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(b.embedding[idx.x] AS DOUBLE)) AS nb,
      |        SUM(CAST(q.e[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS nq
      |      FROM embeddings b, q, idx WHERE b.vec_id <> 0 GROUP BY b.vec_id),
      |top1 AS (SELECT vec_id, round(dot/(sqrt(nb)*sqrt(nq)), 6) AS score
      |         FROM s ORDER BY score DESC, vec_id ASC LIMIT 1)
      |SELECT CAST(vec_id AS BIGINT) AS exact_top1_id,
      |  score AS exact_top1_score, CAST(5 AS BIGINT) AS ann_k,
      |  CAST(5 AS BIGINT) AS scores_exact, CAST(5 AS BIGINT) AS bounded"""
      .stripMargin.replace("\n", " ") + extra + " FROM top1"

  /** Double-precision cosine top-5 for probe vec_id=0. */
  private val cosineTopkOracle =
    """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
      |idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
      |s AS (SELECT b.vec_id,
      |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS dot,
      |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(b.embedding[idx.x] AS DOUBLE)) AS nb,
      |        SUM(CAST(q.e[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS nq
      |      FROM embeddings b, q, idx WHERE b.vec_id <> 0 GROUP BY b.vec_id)
      |SELECT vec_id, round(dot/(sqrt(nb)*sqrt(nq)), 6) AS score
      |FROM s ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin

  /** DuckDB ASOF join — shared by the compositional (q25b) and native
    * physical-operator (q25d) implementations.
    */
  private val asofOracle =
    "SELECT c.event_id, c.user_id, epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us, " +
      "s.event_id AS signup_event_id, epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_ts_us " +
      "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
      "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s " +
      "ON c.user_id = s.user_id AND c.ts >= s.ts " +
      "ORDER BY c.event_id"

  /** Shared DuckDB Lloyd's replay (the emb_kmeans kernel): seeded from
    * the 4 lowest vec_ids, 2 quantized iterations, chained CTEs through
    * the final assignment table `a3`; trailing ", " included so callers
    * can append further CTEs (strip it to SELECT directly). ONE source
    * of truth — a quantization fix here reaches every consumer gate.
    */
  private def lloydsCtes: String = {
    def d(i: Int, cPrev: String) =
      s"d$i AS (SELECT v.vec_id, c.cid, " +
        "SUM(CAST(round((v.x - c.c) * (v.x - c.c), 9) AS DECIMAL(22,12))) AS d2 " +
        s"FROM v JOIN $cPrev c ON v.dim = c.dim GROUP BY v.vec_id, c.cid), "
    def a(i: Int) =
      s"a$i AS (SELECT vec_id, cid, d2 FROM d$i " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1), "
    def c(i: Int) =
      s"c$i AS (SELECT a.cid, v.dim, " +
        "round(CAST(SUM(CAST(v.x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c " +
        s"FROM v JOIN a$i a ON v.vec_id = a.vec_id GROUP BY a.cid, v.dim), "
    "WITH idx AS (SELECT CAST(range + 1 AS INT) AS i FROM range(64)), " +
      "v AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x " +
      "FROM embeddings, idx), " +
      "c0 AS (SELECT vec_id AS cid, dim, x AS c FROM v WHERE vec_id < 4), " +
      d(1, "c0") + a(1) + c(1) + d(2, "c1") + a(2) + c(2) + d(3, "c2") + a(3)
  }

  /** [[lloydsCtes]] + the SemDeDup rule (within-cluster pairs, cosine
    * ≥ 0.4 drops the higher id) through the `dups` CTE — the kernel the
    * three emb_semdedup* oracles share; cosine arithmetic mirrors the
    * dedup_embedding oracle exactly (double products, dim-ordered sums).
    */
  /** Day-folded events fixture the streaming replay gates share with
    * StreamingOps.gateEventsDayFolded: micros-of-day + 2024-01-01T00:00Z,
    * users folded to 16 slots.
    */
  private def streamFoldedCte: String =
    "WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
      "CAST(user_id % 16 AS BIGINT) AS user_id, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 + 1704067200000000 " +
      "AS tu, event_type, value FROM events) "

  /** Definitional two-sided CUSUM fold (mu 50, kappa 10, h 200) to the
    * per-user (n_alarms, max_sp, max_sn, n_points) summary — shared by
    * the batch `ts_cusum` gate and its streaming twin `stream_cusum`
    * (the operators share the literal `cusumStep`, so one oracle IS
    * the contract for both).
    */
  private def cusumFoldSql: String =
    "WITH f AS (SELECT user_id, list_reduce(" +
      "list_transform(list(value ORDER BY ts, event_id), " +
      "x -> [x, " +
      "CASE WHEN greatest(CAST(0 AS DOUBLE), x - 50 - 10) > 200 THEN 0 " +
      "ELSE greatest(CAST(0 AS DOUBLE), x - 50 - 10) END, " +
      "CASE WHEN greatest(CAST(0 AS DOUBLE), -(x - 50) - 10) > 200 THEN 0 " +
      "ELSE greatest(CAST(0 AS DOUBLE), -(x - 50) - 10) END, " +
      "CASE WHEN greatest(CAST(0 AS DOUBLE), x - 50 - 10) > 200 " +
      "OR greatest(CAST(0 AS DOUBLE), -(x - 50) - 10) > 200 " +
      "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END, " +
      "greatest(CAST(0 AS DOUBLE), x - 50 - 10), " +
      "greatest(CAST(0 AS DOUBLE), -(x - 50) - 10)]), " +
      "(acc, e) -> [e[1], " +
      "CASE WHEN greatest(CAST(0 AS DOUBLE), acc[2] + (e[1] - 50 - 10)) > 200 " +
      "THEN 0 ELSE greatest(CAST(0 AS DOUBLE), acc[2] + (e[1] - 50 - 10)) END, " +
      "CASE WHEN greatest(CAST(0 AS DOUBLE), acc[3] - (e[1] - 50) - 10) > 200 " +
      "THEN 0 ELSE greatest(CAST(0 AS DOUBLE), acc[3] - (e[1] - 50) - 10) END, " +
      "acc[4] + CASE WHEN " +
      "greatest(CAST(0 AS DOUBLE), acc[2] + (e[1] - 50 - 10)) > 200 " +
      "OR greatest(CAST(0 AS DOUBLE), acc[3] - (e[1] - 50) - 10) > 200 " +
      "THEN 1 ELSE 0 END, " +
      "greatest(acc[5], greatest(CAST(0 AS DOUBLE), acc[2] + (e[1] - 50 - 10))), " +
      "greatest(acc[6], greatest(CAST(0 AS DOUBLE), acc[3] - (e[1] - 50) - 10))]) " +
      "AS st, COUNT(*) AS n_points FROM events GROUP BY user_id) " +
      "SELECT user_id, CAST(st[4] AS BIGINT) AS n_alarms, " +
      "round(st[5], 6) AS max_sp, round(st[6], 6) AS max_sn, n_points " +
      "FROM f ORDER BY user_id"

  private def semDedupCtes: String =
    lloydsCtes +
      "pp AS (SELECT x.vec_id AS i, y.vec_id AS j FROM a3 x " +
      "JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id), " +
      "s AS (SELECT pp.i, pp.j, SUM(va.x * vb.x) AS dot, " +
      "SUM(va.x * va.x) AS na, SUM(vb.x * vb.x) AS nb " +
      "FROM pp JOIN v va ON va.vec_id = pp.i " +
      "JOIN v vb ON vb.vec_id = pp.j AND vb.dim = va.dim GROUP BY pp.i, pp.j), " +
      "dups AS (SELECT DISTINCT j AS vec_id FROM s " +
      "WHERE dot/(sqrt(na)*sqrt(nb)) >= 0.4) "

  /** The cep_vshape definitional oracle (direction islands +
    * consumed-peak floor recursion) — shared verbatim by the
    * sql_match_recognize gate, whose parsed pattern IS the V.
    */
  private val vshapeOracleSql: String =
      (        "WITH RECURSIVE r AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, CAST(round(value * 100) AS BIGINT) AS vc, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn FROM events), " +
        "d AS (SELECT *, CASE WHEN vc < lag(vc) OVER w THEN 'd' " +
        "WHEN vc > lag(vc) OVER w THEN 'u' " +
        "WHEN lag(vc) OVER w IS NULL THEN '0' ELSE 'f' END AS dir " +
        "FROM r WINDOW w AS (PARTITION BY user_id ORDER BY rn)), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, dir ORDER BY rn) AS isl FROM d), " +
        "g AS (SELECT user_id, dir, isl, MIN(rn) AS srn, MAX(rn) AS ern " +
        "FROM i GROUP BY 1, 2, 3), " +
        "pairs AS (SELECT dn.user_id, row_number() OVER " +
        "(PARTITION BY dn.user_id ORDER BY dn.srn) AS k, " +
        "dn.srn AS ds, dn.ern AS de, up.ern AS ue " +
        "FROM g dn JOIN g up ON up.user_id = dn.user_id AND up.dir = 'u' " +
        "AND up.srn = dn.ern + 1 WHERE dn.dir = 'd'), " +
        "sel AS (SELECT user_id, k, ds, de, ue, ds - 1 AS s, " +
        "CASE WHEN ds - 1 <= de - 1 THEN ue + 1 ELSE 1 END AS nf " +
        "FROM pairs WHERE k = 1 " +
        "UNION ALL SELECT p.user_id, p.k, p.ds, p.de, p.ue, " +
        "GREATEST(p.ds - 1, s.nf) AS s, " +
        "CASE WHEN GREATEST(p.ds - 1, s.nf) <= p.de - 1 THEN p.ue + 1 " +
        "ELSE s.nf END AS nf FROM sel s " +
        "JOIN pairs p ON p.user_id = s.user_id AND p.k = s.k + 1) " +
        "SELECT sel.user_id, rs.event_id AS start_event_id, " +
        "rs.ts_us AS start_ts_us, re.event_id AS end_event_id, " +
        "re.ts_us AS end_ts_us, CAST(sel.ue - sel.s + 1 AS BIGINT) AS n_rows " +
        "FROM sel " +
        "JOIN r rs ON rs.user_id = sel.user_id AND rs.rn = sel.s " +
        "JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.ue " +
        "WHERE sel.s <= sel.de - 1 " +
        "AND re.ts_us - rs.ts_us <= 604800000000 " +
        "ORDER BY sel.user_id, start_ts_us, start_event_id")

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // a hashed production twin's oracle IS its string-keyed gate's
    // oracle plus the pinned verdict column: the string form is
    // definitional and the gate's hash_eq asserts the 8-byte-key
    // kernel reproduced it exactly (r17, completing the family)
    def hashEq(k: String): String =
      "SELECT q.*, CAST(1 AS BIGINT) AS hash_eq FROM (" + base(k) +
        ") q ORDER BY q.doc_id"
    // keys that REUSE another key's SQL verbatim (same machine by
    // construction — asserted in the gate): the streaming
    // MATCH_RECOGNIZE SQL surface answers against the programmatic
    // stream twin's oracle, exactly as sql_match_recognize shares
    // cep_vshape's
    base + ("stream_sql_mr" -> base("stream_cep_vshape")) +
      ("text_substring_apply_hashed" ->
        hashEq("text_substring_dedup_apply")) +
      ("text_substring_rewrite_hashed" ->
        hashEq("text_substring_dedup_rewrite")) +
      ("text_substring_novelty_hashed" ->
        hashEq("text_substring_novelty"))
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_scan" ->
      ("SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey, " +
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, " +
        "l_returnflag, l_linestatus, l_shipdate"),
    "q02_filter_project" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderstatus <> 'F' AND o_totalprice > 1000 ORDER BY o_orderkey"),
    "q03_conditional" ->
      ("SELECT event_id, CASE WHEN event_type='purchase' THEN value*1.1 " +
        "WHEN event_type='click' THEN value*1.3 ELSE value END AS v_usd " +
        "FROM events ORDER BY event_id"),
    "q04_join_inner" ->
      ("SELECT o_orderkey, o_custkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q05_join_broadcast" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
    "q06_join_left" ->
      ("SELECT c_custkey, o_orderkey, o_totalprice FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey " +
        "ORDER BY c_custkey, o_orderkey NULLS LAST"),
    "q07_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    "q08_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey"),
    "q09_join_theta" ->
      ("SELECT l_orderkey, l_linenumber, p_partkey, l_quantity, p_size " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity < p_size " +
        "ORDER BY l_orderkey, l_linenumber, p_partkey, l_quantity, p_size"),
    "q10_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q11_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_custkeys FROM orders",
    "q10b_percentile" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q13b_grouping_sets" -> Relational.q13bSql,
    "q10c_stats" ->
      ("SELECT o_orderstatus, min(o_totalprice) AS mn, max(o_totalprice) AS mx, " +
        "COUNT(*) AS cnt, " +
        "round((CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) " +
        " - CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice)) " +
        " / (COUNT(o_totalprice) - 1), 4) AS var_, " +
        "round(sqrt((CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) " +
        " - CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice)) " +
        " / (COUNT(o_totalprice) - 1)), 4) AS sd " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q13c_pivot" ->
      ("SELECT l_returnflag, " +
        "COUNT(*) FILTER (WHERE l_linestatus = 'F') AS cnt_f, " +
        "COUNT(*) FILTER (WHERE l_linestatus = 'O') AS cnt_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // boundary rule replicated positionally: window fold over bs[p-7:p],
    // cut where hash % 64 == 0, final chunk to end; counts compare, the
    // Spark side shuffles digests not strings
    // exact distinct definitionally; the sample-completeness and
    // 3-sigma estimate-envelope verdicts are pinned to 1
    "sketch_kmv_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, " +
        "CAST(1 AS BIGINT) AS sample_ok, CAST(1 AS BIGINT) AS est_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // the dirty registry rebuilt verbatim; the match replayed
    // DEFINITIONALLY (full in-block join, no banding) — a candidate the
    // Spark-side bands missed would surface as a missing row here
    "er_pairs" ->
      (s"""WITH $erRegistrySql,
         |p AS (SELECT a.rec_id AS i, b.rec_id AS j,
         |        levenshtein(a.name, b.name) AS lev, abs(a.bal - b.bal) AS gap
         |      FROM r a JOIN r b ON a.rec_id < b.rec_id
         |        AND a.nat = b.nat AND a.seg = b.seg
         |      WHERE abs(a.bal - b.bal) <= CAST(0.10 AS DOUBLE)
         |        AND levenshtein(a.name, b.name) <= 2)
         |SELECT i, j, CAST(lev AS BIGINT) AS lev, round(gap, 6) AS bal_diff
         |FROM p ORDER BY i, j""".stripMargin),
    // incremental rules replayed definitionally: direct delta-base
    // matches take MIN base rep; both-unmatched delta pairs close
    // recursively; everything else is a new singleton
    "er_incremental" ->
      (s"""WITH RECURSIVE $erRegistrySql,
         |base AS (SELECT * FROM r WHERE rec_id % 10 = 0 AND rec_id % 40 <> 0),
         |delta AS (SELECT * FROM r WHERE rec_id % 10 <> 0),
         |u AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
         |p AS (SELECT a.rec_id AS i, b.rec_id AS j
         |      FROM u a JOIN u b ON a.rec_id < b.rec_id
         |        AND a.nat = b.nat AND a.seg = b.seg
         |      WHERE abs(a.bal - b.bal) <= CAST(0.10 AS DOUBLE)
         |        AND levenshtein(a.name, b.name) <= 2),
         |db AS (SELECT p.j AS rec_id, p.i AS rep FROM p JOIN base ON p.i = base.rec_id
         |       UNION ALL
         |       SELECT p.i, p.j FROM p JOIN base ON p.j = base.rec_id),
         |asg AS (SELECT rec_id, MIN(rep) AS rep FROM db GROUP BY rec_id),
         |um AS (SELECT d.rec_id FROM delta d LEFT JOIN asg ON d.rec_id = asg.rec_id
         |       WHERE asg.rec_id IS NULL),
         |uu AS (SELECT i, j FROM p WHERE i IN (SELECT rec_id FROM um)
         |         AND j IN (SELECT rec_id FROM um)),
         |e AS (SELECT i AS a, j AS b FROM uu UNION SELECT j, i FROM uu
         |      UNION SELECT i, i FROM uu UNION SELECT j, j FROM uu),
         |reach(node, rl) AS (SELECT a, b FROM e
         |  UNION SELECT re.node, e2.b FROM reach re JOIN e e2 ON re.rl = e2.a),
         |lab AS (SELECT node, MIN(rl) AS rep FROM reach GROUP BY node)
         |SELECT d.rec_id, COALESCE(asg.rep, lab.rep, d.rec_id) AS assigned_rep,
         |  CAST(CASE WHEN asg.rec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
         |FROM delta d LEFT JOIN asg ON d.rec_id = asg.rec_id
         |  LEFT JOIN lab ON d.rec_id = lab.node
         |ORDER BY d.rec_id""".stripMargin),
    "er_entities" ->
      (s"""WITH RECURSIVE $erRegistrySql,
         |p AS (SELECT a.rec_id AS i, b.rec_id AS j
         |      FROM r a JOIN r b ON a.rec_id < b.rec_id
         |        AND a.nat = b.nat AND a.seg = b.seg
         |      WHERE abs(a.bal - b.bal) <= CAST(0.10 AS DOUBLE)
         |        AND levenshtein(a.name, b.name) <= 2),
         |e AS (SELECT i AS a, j AS b FROM p UNION SELECT j, i FROM p
         |      UNION SELECT i, i FROM p UNION SELECT j, j FROM p),
         |reach(node, rl) AS (SELECT a, b FROM e
         |  UNION SELECT re.node, e2.b FROM reach re JOIN e e2 ON re.rl = e2.a),
         |lab AS (SELECT node, MIN(rl) AS rep FROM reach GROUP BY node),
         |m AS (SELECT r.rec_id, COALESCE(l.rep, r.rec_id) AS rep, r.name, r.bal
         |      FROM r LEFT JOIN lab l ON r.rec_id = l.node)
         |SELECT rep AS cluster_rep, min_by(name, rec_id) AS canonical_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_recs,
         |  round(MIN(bal), 6) AS bal_min, round(MAX(bal), 6) AS bal_max
         |FROM m GROUP BY rep ORDER BY cluster_rep""".stripMargin),
    "text_cdc_chunks" ->
      ("WITH d AS (SELECT doc_id, regexp_replace(trim(lower(text)), '[^a-z0-9]+', ' ', 'g') AS norm FROM documents), " +
        "b AS (SELECT doc_id, norm, [CAST(ord(substr(norm, i, 1)) AS BIGINT) for i in range(1, length(norm)+1)] AS bs FROM d), " +
        "c AS (SELECT doc_id, norm, len(bs) AS n, " +
        "[p for p in range(8, len(bs)+1) " +
        "if list_reduce([CAST(0 AS BIGINT)] || bs[p-7:p], (a, x) -> (a * 257 + x) % 1000000000000037) % 64 = 0] AS cuts FROM b), " +
        "e AS (SELECT doc_id, norm, list_sort(list_distinct([0] || cuts || [n])) AS edges FROM c), " +
        "ch AS (SELECT doc_id, unnest([substr(norm, edges[i] + 1, edges[i+1] - edges[i]) for i in range(1, len(edges))]) AS chunk FROM e), " +
        "g AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk) " +
        "SELECT ch.doc_id, COUNT(*) AS n_chunks, " +
        "CAST(SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared " +
        "FROM ch JOIN g USING (chunk) GROUP BY ch.doc_id ORDER BY ch.doc_id"),
    "text_rolling_fp" ->
      ("SELECT doc_id, list_reduce([CAST(0 AS BIGINT)] || " +
        "[CAST(ord(substr(norm, i, 1)) AS BIGINT) for i in range(1, length(norm)+1)], " +
        "(a, b) -> (a * 257 + b) % 1000000000000037) AS fp " +
        "FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '[^a-z0-9]+', ' ', 'g') AS norm FROM documents) " +
        "ORDER BY doc_id"),
    "q13_rollup" ->
      ("SELECT COALESCE(l_returnflag, 'ALL') AS rflag, " +
        "COALESCE(l_linestatus, 'ALL') AS lstatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "COUNT(*) AS cnt FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rflag, lstatus"),
    "q14_window_rank" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q15_window_frame" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, " +
        "LAG(o_totalprice, 1) OVER w AS prev_price, " +
        "LEAD(o_totalprice, 1) OVER w AS next_price, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum_3 " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q14b_window_dist" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "round(PERCENT_RANK() OVER w, 6) AS pr, " +
        "round(CUME_DIST() OVER w, 6) AS cd " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q15b_window_nav" ->
      ("SELECT o_custkey, o_orderkey, " +
        "FIRST_VALUE(o_totalprice) OVER w AS first_price, " +
        "LAST_VALUE(o_totalprice) OVER w AS last_price, " +
        "NTH_VALUE(o_totalprice, 2) OVER w AS second_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q10d_argmax" ->
      ("SELECT user_id, arg_max(event_type, event_id) AS last_type, " +
        "arg_min(event_type, event_id) AS first_type, " +
        "max(event_id) AS last_event_id, COUNT(*) AS n_events " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "q09b_range_join" ->
      ("SELECT p_partkey, COUNT(*) AS n_li FROM part p JOIN lineitem l " +
        "ON l.l_quantity >= p.p_size - 2 AND l.l_quantity <= p.p_size + 2 " +
        "WHERE p.p_size <= 10 GROUP BY p_partkey ORDER BY p_partkey"),
    "q11b_multi_distinct" ->
      ("SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, " +
        "COUNT(DISTINCT o_orderpriority) AS n_prio, COUNT(*) AS n_rows " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q17b_setops_all" ->
      ("SELECT op, k, n FROM (" +
        "SELECT 'except_all' AS op, k, COUNT(*) AS n FROM " +
        "(SELECT o_custkey AS k FROM orders EXCEPT ALL " +
        " SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0) GROUP BY k " +
        "UNION ALL " +
        "SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM " +
        "(SELECT o_custkey AS k FROM orders INTERSECT ALL " +
        " SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0) GROUP BY k) " +
        "ORDER BY op, k"),
    "ts_gapfill" ->
      ("WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value " +
        "  FROM events WHERE user_id < 20), " +
        "hv AS (SELECT user_id, h, value FROM " +
        "  (SELECT user_id, h, value, row_number() OVER " +
        "    (PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn FROM e) " +
        "  WHERE rn = 1), " +
        "span AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM e GROUP BY user_id), " +
        "spine AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM span), " +
        "j AS (SELECT s.user_id, s.h, hv.value, hv.value IS NULL AS is_gap " +
        "  FROM spine s LEFT JOIN hv ON s.user_id = hv.user_id AND s.h = hv.h) " +
        "SELECT user_id, epoch_us(h) AS hour_us, " +
        "  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h " +
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled, is_gap " +
        "FROM j ORDER BY user_id, hour_us"),
    // identical arithmetic shape to the Spark side: pv + (nv-pv) * (Δt/ΔT)
    // on exact integer microseconds — IEEE-identical per cell
    "ts_interpolate" ->
      ("WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value " +
        "  FROM events WHERE user_id < 20), " +
        "hv AS (SELECT user_id, h, value FROM " +
        "  (SELECT user_id, h, value, row_number() OVER " +
        "    (PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn FROM e) " +
        "  WHERE rn = 1), " +
        "span AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM e GROUP BY user_id), " +
        "spine AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM span), " +
        "j AS (SELECT s.user_id, epoch_us(s.h) AS hu, hv.value, hv.value IS NULL AS is_gap " +
        "  FROM spine s LEFT JOIN hv ON s.user_id = hv.user_id AND s.h = hv.h), " +
        "w AS (SELECT user_id, hu, value, is_gap, " +
        "  last_value(value IGNORE NULLS) OVER wb AS pv, " +
        "  last_value(CASE WHEN value IS NOT NULL THEN hu END IGNORE NULLS) OVER wb AS ph, " +
        "  first_value(value IGNORE NULLS) OVER wf AS nv, " +
        "  first_value(CASE WHEN value IS NOT NULL THEN hu END IGNORE NULLS) OVER wf AS nh " +
        "  FROM j WINDOW " +
        "  wb AS (PARTITION BY user_id ORDER BY hu ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "  wf AS (PARTITION BY user_id ORDER BY hu ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, hu AS hour_us, " +
        "  CASE WHEN NOT is_gap THEN value ELSE pv + (nv - pv) * " +
        "    (CAST(hu - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE)) END AS interp, is_gap " +
        "FROM w ORDER BY user_id, hour_us"),
    "q06c_full_outer" ->
      ("SELECT c_custkey, o_orderkey, o_custkey " +
        "FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 500) c " +
        "FULL JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey >= 400) o " +
        "ON c_custkey = o_custkey " +
        "ORDER BY c_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST"),
    "q13d_unpivot" ->
      ("SELECT l_returnflag, substr(linestatus, 5, 1) AS linestatus, qty " +
        "FROM (UNPIVOT (SELECT l_returnflag, " +
        "  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O, " +
        "  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F " +
        "  FROM lineitem GROUP BY l_returnflag) " +
        "ON qty_O, qty_F INTO NAME linestatus VALUE qty) " +
        "ORDER BY l_returnflag, linestatus"),
    "q26b_topk_multi" ->
      ("""WITH idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
        |p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, b.vec_id,
        |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(p.pe[idx.x] AS DOUBLE)) AS dot,
        |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(b.embedding[idx.x] AS DOUBLE)) AS nb,
        |        SUM(CAST(p.pe[idx.x] AS DOUBLE) * CAST(p.pe[idx.x] AS DOUBLE)) AS np
        |      FROM embeddings b, p, idx WHERE b.vec_id <> p.probe_id
        |      GROUP BY p.probe_id, b.vec_id),
        |r AS (SELECT probe_id, vec_id, round(dot/(sqrt(nb)*sqrt(np)), 6) AS score,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot/(sqrt(nb)*sqrt(np)), 6) DESC, vec_id ASC) AS rk
        |      FROM s)
        |SELECT probe_id, CAST(rk AS BIGINT) AS rk, vec_id, score
        |FROM r WHERE rk <= 3 ORDER BY probe_id, rk""".stripMargin.replace("\n", " ")),
    "emb_hard_negatives" ->
      ("""WITH idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
        |a AS (SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS ae
        |      FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT a.anchor_id, b.vec_id, b.label,
        |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(a.ae[idx.x] AS DOUBLE)) AS dot,
        |        SUM(CAST(b.embedding[idx.x] AS DOUBLE) * CAST(b.embedding[idx.x] AS DOUBLE)) AS nb,
        |        SUM(CAST(a.ae[idx.x] AS DOUBLE) * CAST(a.ae[idx.x] AS DOUBLE)) AS na
        |      FROM embeddings b, a, idx WHERE b.label <> a.anchor_label
        |      GROUP BY a.anchor_id, b.vec_id, b.label),
        |r AS (SELECT anchor_id, vec_id, label, round(dot/(sqrt(nb)*sqrt(na)), 6) AS score,
        |        row_number() OVER (PARTITION BY anchor_id
        |          ORDER BY round(dot/(sqrt(nb)*sqrt(na)), 6) DESC, vec_id ASC) AS rk
        |      FROM s)
        |SELECT anchor_id, CAST(rk AS BIGINT) AS rk, vec_id, label, score
        |FROM r WHERE rk <= 3 ORDER BY anchor_id, rk""".stripMargin.replace("\n", " ")),
    "emb_label_centroids" ->
      ("WITH idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)) " +
        "SELECT label, CAST(idx.x AS BIGINT) AS idx, " +
        "round(CAST(SUM(CAST(round(CAST(embedding[idx.x] AS DOUBLE), 6) AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c " +
        "FROM embeddings, idx GROUP BY label, idx.x ORDER BY label, idx"),
    "q16_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
    "q17_setops" ->
      ("SELECT 'both' AS tag, k FROM " +
        "(SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey AS k FROM customer) " +
        "UNION ALL SELECT 'no_orders' AS tag, k FROM " +
        "(SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders) " +
        "ORDER BY tag, k"),
    "q18_strings" ->
      ("SELECT c_custkey, upper(c_name) AS un, substring(c_name, 1, 8) AS sb, " +
        "concat(c_name, '#', c_mktsegment) AS cc, trim(c_name) AS tr, " +
        "CAST(length(c_name) AS BIGINT) AS len, " +
        "(c_name LIKE '%1%') AS lk, " +
        "regexp_extract(c_name, '([0-9]+)', 1) AS re, " +
        "array_to_string(string_split(c_name, '#'), '|') AS sp " +
        "FROM customer ORDER BY c_custkey"),
    "q18b_strings" ->
      ("SELECT c_custkey, lpad(c_name, 24, '*') AS lp, " +
        "rpad(c_mktsegment, 12, '.') AS rp, " +
        "regexp_replace(c_name, '[0-9]', '#', 'g') AS masked, " +
        "translate(c_mktsegment, 'AEIOU', 'aeiou') AS tl, " +
        "CAST(instr(c_name, '1') AS BIGINT) AS pos1, " +
        "upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS ic, " +
        "reverse(c_name) AS rev, repeat('ab', 3) AS rep " +
        "FROM customer ORDER BY c_custkey"),
    "q19b_dates" ->
      ("SELECT o_orderkey, " +
        "strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m, " +
        "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom, " +
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS qtr, " +
        "epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS epoch_us " +
        "FROM orders ORDER BY o_orderkey"),
    "q19_dates" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(day(o_orderdate) AS BIGINT) AS d, " +
        "date_trunc('month', o_orderdate) AS mon, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since " +
        "FROM orders ORDER BY o_orderkey"),
    "q20_math" ->
      ("SELECT o_orderkey, abs(o_totalprice - 1000) AS ab, " +
        "CAST(floor(o_totalprice) AS BIGINT) AS fl, " +
        "CAST(ceil(o_totalprice) AS BIGINT) AS ce, " +
        "round(sqrt(o_totalprice), 6) AS sq, " +
        "round(ln(o_totalprice), 6) AS ln_ " +
        "FROM orders ORDER BY o_orderkey"),
    "q21_arrays" ->
      ("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
        "embedding[1] AS v0, " +
        "list_aggregate(embedding, 'min') AS vmin, " +
        "list_aggregate(embedding, 'max') AS vmax, " +
        "len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big " +
        "FROM embeddings ORDER BY vec_id"),
    "q21_explode" ->
      ("SELECT vec_id, CAST(r.range + 1 AS BIGINT) AS pos, embedding[CAST(r.range AS INT) + 1] AS val " +
        "FROM embeddings, range(64) r WHERE vec_id < 3 ORDER BY vec_id, pos"),
    "q21c_higher_order" ->
      ("SELECT vec_id, CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos, " +
        "round(list_reduce([CAST(0 AS DOUBLE)] || list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), (a, b) -> a + b), 4) AS l1, " +
        "round(list_reduce([CAST(0 AS DOUBLE)] || list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 4) AS head8_sum " +
        "FROM embeddings ORDER BY vec_id"),
    "q21g_array_set_ops" ->
      ("WITH d AS (SELECT vec_id, " +
        "[CAST(floor(CAST(embedding[i] AS DOUBLE) * 10) AS BIGINT) for i in range(1, 7)] AS a " +
        "FROM embeddings), r AS (SELECT [0, 1, 2, 3] AS ref) " +
        "SELECT vec_id, " +
        "COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, ref))), ','), '') AS u, " +
        "COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> list_contains(ref, x))), ','), '') AS i, " +
        "COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(ref, x))), ','), '') AS x " +
        "FROM d, r ORDER BY vec_id"),
    "q21f_outer_explode" ->
      ("WITH d AS (SELECT doc_id, " +
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), " +
        "t -> t <> '' AND t LIKE 'z%') AS zt FROM documents) " +
        "SELECT doc_id, unnest(CASE WHEN len(zt) = 0 THEN [NULL] ELSE zt END) AS ztoken " +
        "FROM d ORDER BY doc_id, ztoken"),
    "q21e_array_fns" ->
      ("WITH d AS (SELECT vec_id, " +
        "[CAST(floor(CAST(embedding[i] AS DOUBLE) * 10) AS BIGINT) for i in range(1, 7)] AS a " +
        "FROM embeddings) " +
        "SELECT vec_id, " +
        "array_to_string(list_sort(a), ',') AS sorted_a, " +
        "array_to_string(list_reverse_sort(a), ',') AS sorted_desc, " +
        "list_contains(a, 1) AS has_one, " +
        "CAST(COALESCE(list_position(a, 1), 0) AS BIGINT) AS pos_one, " +
        "len(list_intersect(a, [0, 1])) > 0 AS ovl_01, " +
        "array_to_string(list_sort(list_distinct(a)), ',') AS dedup_a, " +
        "array_to_string(a[2:4], ',') AS mid3 " +
        "FROM d ORDER BY vec_id"),
    "q19c_parse" ->
      ("SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS rendered, " +
        "epoch_us(strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS reparsed_us " +
        "FROM events ORDER BY event_id"),
    "q22_maps" ->
      ("SELECT event_id, event_type AS mt, CAST(2 AS BIGINT) AS msz, " +
        "'type,uid' AS mkeys FROM events ORDER BY event_id"),
    "q22b_map_hof" ->
      ("SELECT event_id, upper(event_type) AS mval, 'uid' AS kept, " +
        "CAST(3 AS BIGINT) AS merged_n, " +
        "'type=' || event_type || ',uid=' || CAST(user_id AS VARCHAR) AS entries " +
        "FROM events ORDER BY event_id"),
    "q23_json" ->
      ("SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct " +
        "FROM events ORDER BY event_id"),
    "q06d_nullsafe_join" ->
      ("WITH n AS (SELECT n_nationkey, n_name, " +
        "CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_regionkey END AS k FROM nation), " +
        "r AS (SELECT r_name, CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END AS rk FROM region) " +
        "SELECT n_nationkey, n_name, r_name, k IS NULL AS matched_on_null " +
        "FROM n JOIN r ON k IS NOT DISTINCT FROM rk " +
        "ORDER BY n_nationkey, r_name"),
    "q23b_json_quarantine" ->
      ("WITH synth AS (SELECT event_id, CASE " +
        "WHEN event_id % 7 = 0 THEN substr(props, 1, length(props) - 2) " +
        "WHEN event_id % 11 = 0 THEN 'not json' ELSE props END AS raw FROM events), " +
        "p AS (SELECT event_id, CASE WHEN json_valid(raw) " +
        "THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k FROM synth) " +
        "SELECT CASE WHEN k IS NOT NULL THEN 'good' ELSE 'quarantined' END AS status, " +
        "COUNT(*) AS cnt, MIN(event_id) AS min_id, MAX(event_id) AS max_id " +
        "FROM p GROUP BY 1 ORDER BY 1"),
    "q24_subquery" -> Relational.q24Sql,
    "q24b_in_subquery" -> Relational.q24bSql,
    "q24d_anti_argmax" -> Relational.q24dSql,
    "q21d_struct" ->
      ("SELECT o_orderkey, s.k AS cust, s.p AS price, " +
        "s = struct_pack(k := s.k, p := s.p) AS self_eq " +
        "FROM (SELECT o_orderkey, struct_pack(k := o_custkey, p := o_totalprice) AS s FROM orders) " +
        "WHERE s.p > 50000.0 ORDER BY o_orderkey"),
    "q24c_lateral" ->
      ("SELECT c.c_custkey, o.o_orderkey, o.o_totalprice FROM customer c, " +
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
        "ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"),
    "q16b_offset" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 10"),
    "q25_dedup_exact" ->
      ("SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY user_id, event_type"),
    "q06b_nulls" ->
      ("SELECT c_custkey, COUNT(o_orderkey) AS n_orders, " +
        "CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)))) AS DOUBLE) AS total_spend, " +
        "MAX(o_orderkey IS NULL) AS any_null, " +
        "COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_null " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey"),
    "q25c_funnel" ->
      ("WITH ev AS (SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events) " +
        "SELECT user_id, " +
        "(MIN(CASE WHEN event_type='signup' THEN ts END) < MIN(CASE WHEN event_type='click' THEN ts END) " +
        " AND MIN(CASE WHEN event_type='click' THEN ts END) < MIN(CASE WHEN event_type='purchase' THEN ts END)) AS funnel_complete, " +
        "COUNT(CASE WHEN prev_type='click' AND event_type='purchase' THEN 1 END) AS click_then_purchase " +
        "FROM ev GROUP BY user_id ORDER BY user_id"),
    "q25b_asof_join" -> asofOracle,
    "q25e_funnel_windowed" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, " +
        "LAG(event_type) OVER w AS prev_type, " +
        "LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_tu " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT user_id, COUNT(*) AS n_fast_conversions, " +
        "MIN(tu - prev_tu) AS min_latency_us " +
        "FROM ev WHERE prev_type = 'click' AND event_type = 'purchase' " +
        "AND tu - prev_tu <= 120000000 " +
        "GROUP BY user_id ORDER BY user_id"),
    // the native physical operator answers the same question as the
    // compositional form — one oracle text, two implementations
    "q25d_asof_native" -> asofOracle,
    "q26_cosine_topk" -> cosineTopkOracle,
    "q26c_filtered_topk" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        |idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
        |f AS (SELECT b.vec_id, d.lang, b.label, b.embedding FROM embeddings b
        |      JOIN documents d ON b.vec_id = d.doc_id
        |      WHERE b.vec_id <> 0 AND d.lang = 'en' AND b.label % 2 = 0),
        |s AS (SELECT f.vec_id, f.lang, f.label,
        |        SUM(CAST(f.embedding[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS dot,
        |        SUM(CAST(f.embedding[idx.x] AS DOUBLE) * CAST(f.embedding[idx.x] AS DOUBLE)) AS nb,
        |        SUM(CAST(q.e[idx.x] AS DOUBLE) * CAST(q.e[idx.x] AS DOUBLE)) AS nq
        |      FROM f, q, idx GROUP BY f.vec_id, f.lang, f.label)
        |SELECT vec_id, lang, label, round(dot/(sqrt(nb)*sqrt(nq)), 6) AS score
        |FROM s ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin.replace("\n", " "),
    // ANN families are approximate by contract (this corpus is
    // near-orthogonal, max pairwise cosine 0.37, so any sublinear method
    // trades recall) — the gate queries therefore emit the CONTRACT as
    // data: the definitional exact top-1 plus verdict counters the oracle
    // pins (k results, true-cosine scores, bounded by the global best;
    // IVF/PQ additionally find the true top-1, PQ recalls ≥3 of top-5).
    // OperatorsSpec asserts the same subset/score contract on the raw
    // top-k forms.
    "q26_ann_lsh" -> annCheckedOracle(""),
    "q26_ann_ivf" -> annCheckedOracle(
      ", CAST(1 AS BIGINT) AS top1_found"),
    "q26_ann_pq" -> annCheckedOracle(
      ", CAST(1 AS BIGINT) AS top1_found, CAST(1 AS BIGINT) AS recall_ge_3"),
    "q26_ann_ivfpq" -> annCheckedOracle(
      ", CAST(1 AS BIGINT) AS top1_found, CAST(1 AS BIGINT) AS recall_ge_3"),
    // approximate-by-contract rows made hash-checkable the same way:
    // definitional exact values + contract verdicts pinned to 1
    "q12_approx_distinct" ->
      ("SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts, " +
        "CAST(1 AS BIGINT) AS within_5pct FROM lineitem"),
    "q12b_approx_percentile" ->
      ("WITH h AS (SELECT l_returnflag, l_extendedprice, COUNT(*) AS w " +
        "FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, l_extendedprice, " +
        "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cum, " +
        "SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM h) " +
        "SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS n_rows, " +
        "MIN(CASE WHEN cum * 2 >= tot THEN l_extendedprice END) AS exact_p50, " +
        "MIN(CASE WHEN cum * 10 >= 9 * tot THEN l_extendedprice END) AS exact_p90, " +
        "CAST(1 AS BIGINT) AS p50_rank_ok, CAST(1 AS BIGINT) AS p90_rank_ok " +
        "FROM c GROUP BY l_returnflag ORDER BY l_returnflag"),
    "sketch_rollup" ->
      ("SELECT epoch_us(date_trunc('week', CAST(ts AS TIMESTAMP))) AS week_us, " +
        "event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, " +
        "COUNT(*) AS n_events, CAST(1 AS BIGINT) AS within_2pct " +
        "FROM events GROUP BY 1, 2 ORDER BY week_us, event_type"),
    "sketch_sliding_users" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
        "CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) AS BIGINT) AS day " +
        "FROM events WHERE user_id IS NOT NULL), " +
        "days AS (SELECT DISTINCT day FROM ud), " +
        "x AS (SELECT DISTINCT ud.user_id, d.day AS wday FROM ud JOIN days d " +
        "ON d.day BETWEEN ud.day AND ud.day + 6) " +
        "SELECT wday AS day, COUNT(*) AS exact_users, " +
        "CAST(1 AS BIGINT) AS within_2pct FROM x GROUP BY wday ORDER BY day"),
    "sketch_quantile_rollup" ->
      ("WITH h AS (SELECT epoch_us(date_trunc('week', CAST(ts AS TIMESTAMP))) AS week_us, " +
        "event_type, value, COUNT(*) AS w FROM events GROUP BY 1, 2, 3), " +
        "c AS (SELECT week_us, event_type, value, " +
        "SUM(w) OVER (PARTITION BY week_us, event_type ORDER BY value) AS cum, " +
        "SUM(w) OVER (PARTITION BY week_us, event_type) AS tot FROM h) " +
        "SELECT week_us, event_type, CAST(MAX(tot) AS BIGINT) AS n_events, " +
        "MIN(CASE WHEN cum * 2 >= tot THEN value END) AS exact_p50, " +
        "MIN(CASE WHEN cum * 100 >= 95 * tot THEN value END) AS exact_p95, " +
        "CAST(1 AS BIGINT) AS p50_rank_ok, CAST(1 AS BIGINT) AS p95_rank_ok " +
        "FROM c GROUP BY 1, 2 ORDER BY week_us, event_type"),
    "q27_top_tokens" ->
      (s"SELECT token, COUNT(*) AS cnt FROM " +
        s"(SELECT unnest($toksSql) AS token FROM documents) " +
        "GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 10"),
    "q30_tumble" ->
      ("SELECT epoch_us(time_bucket(INTERVAL 1 minute, CAST(ts AS TIMESTAMP))) AS w_start, " +
        "event_type, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY w_start, event_type ORDER BY w_start, event_type"),
    "q30e_window_dedup" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events), " +
        "g AS (SELECT (ts_us // 600000000) * 600000000 AS w_start, user_id, " +
        "min(struct_pack(ts_us := ts_us, event_id := event_id, " +
        "event_type := event_type)) AS f, COUNT(*) AS n_in_window " +
        "FROM e GROUP BY 1, 2) " +
        "SELECT w_start, user_id, f.event_id AS first_event_id, " +
        "f.event_type AS first_event_type, f.ts_us AS first_ts_us, " +
        "n_in_window FROM g ORDER BY w_start, user_id"),
    "q31_slide" ->
      ("SELECT w_start, COUNT(*) AS cnt FROM " +
        "(SELECT epoch_us(time_bucket(INTERVAL 30 seconds, CAST(ts AS TIMESTAMP))) - u.o AS w_start " +
        " FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(30000000 AS BIGINT))) u(o)) " +
        "GROUP BY w_start ORDER BY w_start"),
    "q31_session" ->
      ("WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events), " +
        "m AS (SELECT user_id, tu, CASE WHEN LAG(tu) OVER (PARTITION BY user_id ORDER BY tu) IS NULL " +
        "OR tu - LAG(tu) OVER (PARTITION BY user_id ORDER BY tu) >= 30000000 THEN 1 ELSE 0 END AS brk FROM e), " +
        "g AS (SELECT user_id, tu, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS grp FROM m) " +
        "SELECT user_id, MIN(tu) AS w_start, MAX(tu) + 30000000 AS w_end, COUNT(*) AS cnt " +
        "FROM g GROUP BY user_id, grp ORDER BY user_id, w_start"),
    "q31c_dynamic_session" ->
      ("WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, " +
        "CASE WHEN event_type = 'purchase' THEN 60000000 ELSE 30000000 END AS gap FROM events), " +
        "m AS (SELECT user_id, tu, gap, MAX(tu + gap) OVER (PARTITION BY user_id ORDER BY tu " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend FROM e), " +
        "g AS (SELECT user_id, tu, gap, CASE WHEN pend IS NULL OR tu >= pend THEN 1 ELSE 0 END AS brk FROM m), " +
        "s AS (SELECT user_id, tu, gap, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS grp FROM g) " +
        "SELECT user_id, MIN(tu) AS w_start, MAX(tu + gap) AS w_end, COUNT(*) AS cnt " +
        "FROM s GROUP BY user_id, grp ORDER BY user_id, w_start"),
    "dedup_exact_text" ->
      ("SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents " +
        "GROUP BY text ORDER BY keep_id"),
    // bloom path must reproduce the exact anti-join answer: no false
    // negatives + exact confirm of sketch hits
    "dedup_bloom_snapshot" ->
      ("SELECT doc_id FROM documents b WHERE doc_id % 3 = 0 " +
        "AND NOT EXISTS (SELECT 1 FROM documents s " +
        "WHERE s.doc_id % 3 <> 0 AND s.text = b.text) ORDER BY doc_id"),
    "dedup_minhash_lsh" -> jaccardOracle,
    "dedup_minhash_bounded" ->
      (s"SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "CAST(1 AS BIGINT) AS loose_cap_eq, " +
        s"CAST(1 AS BIGINT) AS tight_cap_subset FROM ($jaccardOracle) t"),
    "dedup_ngram_jaccard" -> jaccardOracle,
    "dedup_clusters" ->
      (s"""WITH RECURSIVE d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
         |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
         |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |pairs AS (SELECT i, j FROM p
         |          WHERE (sa+sb-inter) > 0 AND CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.7),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
         |          UNION SELECT i, i FROM pairs UNION SELECT j, j FROM pairs),
         |reach(node, r) AS (SELECT a, b FROM edges
         |  UNION SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a)
         |SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin),
    // same recursive cluster CTE + the keep policy as a window argmax
    "dedup_canonical" ->
      (s"""WITH RECURSIVE d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
         |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
         |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |pairs AS (SELECT i, j FROM p
         |          WHERE (sa+sb-inter) > 0 AND CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.7),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
         |          UNION SELECT i, i FROM pairs UNION SELECT j, j FROM pairs),
         |reach(node, r) AS (SELECT a, b FROM edges
         |  UNION SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a),
         |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY node),
         |g AS (SELECT dd.doc_id, COALESCE(cl.cluster_rep, dd.doc_id) AS grp, dd.n_chars
         |      FROM documents dd LEFT JOIN cl ON cl.doc_id = dd.doc_id)
         |SELECT grp AS cluster_rep, doc_id AS kept_doc_id,
         |  n_chars AS kept_n_chars, n_docs
         |FROM (SELECT g.*, COUNT(*) OVER (PARTITION BY grp) AS n_docs,
         |        row_number() OVER (PARTITION BY grp
         |          ORDER BY n_chars DESC, doc_id) AS rn FROM g)
         |WHERE rn = 1 ORDER BY cluster_rep""".stripMargin),
    "text_redact" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(synth, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(synth, '555-[0-9]+')) AS BIGINT) AS n_phones, " +
        "md5(regexp_replace(regexp_replace(synth, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]', 'g'), '555-[0-9]+', '[PHONE]', 'g')) AS redacted_md5 " +
        "FROM (SELECT doc_id, text || ' contact user' || doc_id || '@example.com or 555-' || doc_id AS synth FROM documents) " +
        "ORDER BY doc_id"),
    "text_train_split" ->
      ("SELECT doc_id, bucket, CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split " +
        "FROM (SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket FROM documents) " +
        "ORDER BY doc_id"),
    // tiles of 3 tokens, first occurrence kept per doc, survivors
    // rejoin in order; string_agg skips the NULL dropped tiles
    "text_intra_dedup" ->
      (s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |nz AS (SELECT doc_id, toks FROM d WHERE len(toks) > 0),
         |t AS (SELECT doc_id, g.x AS pos,
         |        array_to_string(list_slice(toks, g.x*3 + 1, g.x*3 + 3), ' ') AS tile_str
         |      FROM nz, unnest(range((len(toks) + 2) // 3)) AS g(x)),
         |f AS (SELECT doc_id, pos, tile_str,
         |        MIN(pos) OVER (PARTITION BY doc_id, tile_str) AS first_pos FROM t)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tiles,
         |  CAST(SUM(CASE WHEN pos = first_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(COUNT(*) - SUM(CASE WHEN pos = first_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  md5(string_agg(CASE WHEN pos = first_pos THEN tile_str END, ' ' ORDER BY pos)) AS cleaned_md5
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // canonical keeper + rep-bucket train filter + global window cumsum
    // (the oracle may use the single window the Spark plan must avoid)
    "pipe_train_shards" ->
      (s"""WITH RECURSIVE d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
         |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
         |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |pairs AS (SELECT i, j FROM p
         |          WHERE (sa+sb-inter) > 0 AND CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.7),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
         |          UNION SELECT i, i FROM pairs UNION SELECT j, j FROM pairs),
         |reach(node, r) AS (SELECT a, b FROM edges
         |  UNION SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a),
         |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY node),
         |g AS (SELECT dd.doc_id, COALESCE(cl.cluster_rep, dd.doc_id) AS grp, dd.n_chars
         |      FROM documents dd LEFT JOIN cl ON cl.doc_id = dd.doc_id),
         |keep AS (SELECT doc_id, grp FROM (SELECT g.*, row_number() OVER
         |  (PARTITION BY grp ORDER BY n_chars DESC, doc_id) AS rn FROM g) WHERE rn = 1),
         |kt AS (SELECT keep.doc_id, len(d.toks) AS n_toks FROM keep
         |       JOIN d ON d.doc_id = keep.doc_id
         |       WHERE ('0x' || substr(md5(CAST(keep.grp AS VARCHAR)), 1, 15))::BIGINT % 100 < 90),
         |c AS (SELECT doc_id, n_toks, SUM(n_toks) OVER (ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM kt)
         |SELECT CAST((cum - n_toks) // 2048 AS BIGINT) AS shard_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS tok_sum,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin),
    // the cluster CTE of dedup_clusters + the md5 bucket of
    // text_train_split, computed on the cluster rep
    "text_leakage_split" ->
      (s"""WITH RECURSIVE d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
         |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
         |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |pairs AS (SELECT i, j FROM p
         |          WHERE (sa+sb-inter) > 0 AND CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.7),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs
         |          UNION SELECT i, i FROM pairs UNION SELECT j, j FROM pairs),
         |reach(node, r) AS (SELECT a, b FROM edges
         |  UNION SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a),
         |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY node),
         |j AS (SELECT d0.doc_id, COALESCE(cl.cluster_rep, d0.doc_id) AS cluster_rep
         |      FROM documents d0 LEFT JOIN cl USING(doc_id)),
         |b AS (SELECT doc_id, cluster_rep,
         |        ('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
         |      FROM j)
         |SELECT doc_id, cluster_rep, bucket,
         |  CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
         |FROM b ORDER BY doc_id""".stripMargin),
    "text_tfidf" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM d), " +
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token), " +
        "dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token), " +
        "n AS (SELECT COUNT(*) AS n_docs FROM documents), " +
        "sc AS (SELECT doc_id, token, round(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE)/df), 6) AS tfidf " +
        "  FROM tf JOIN dfx USING(token), n), " +
        "rk AS (SELECT doc_id, token, tfidf, row_number() OVER " +
        "  (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk FROM sc) " +
        "SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, tfidf FROM rk WHERE rk <= 3 " +
        "ORDER BY doc_id, rk"),
    // sparse TF-IDF cosine pairs: identical weight/norm/quantization
    // chain replayed — 6dp weights, 8dp-then-DECIMAL norm squares, 12dp
    // DECIMAL(28,14) products; df ≤ 100 vocabulary on both engines
    "text_sim_pairs" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM d), " +
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token), " +
        "dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token " +
        "  HAVING COUNT(*) <= 100), " +
        "n AS (SELECT COUNT(*) AS n_docs FROM documents), " +
        "w AS (SELECT doc_id, token, round(CAST(tf AS DOUBLE) * " +
        "  ln(CAST(n_docs AS DOUBLE)/df), 6) AS w FROM tf JOIN dfx USING(token), n), " +
        "nrm AS (SELECT doc_id, sqrt(CAST(sum(CAST(round(w*w, 8) AS DECIMAL(30,10))) " +
        "  AS DOUBLE)) AS norm FROM w GROUP BY doc_id), " +
        "nw AS (SELECT doc_id, token, w / norm AS nw FROM w JOIN nrm USING(doc_id)), " +
        "p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, " +
        "  CAST(round(a.nw * b.nw, 12) AS DECIMAL(28,14)) AS p " +
        "  FROM nw a JOIN nw b ON a.token = b.token AND a.doc_id < b.doc_id) " +
        "SELECT doc_i, doc_j, round(CAST(sum(p) AS DOUBLE), 6) AS cos " +
        "FROM p GROUP BY doc_i, doc_j " +
        "HAVING round(CAST(sum(p) AS DOUBLE), 6) >= 0.3 " +
        "ORDER BY doc_i, doc_j"),
    "text_stratified_sample" ->
      ("SELECT doc_id, lang, bucket FROM (SELECT doc_id, lang, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket FROM documents) " +
        "WHERE bucket < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 25 ELSE 10 END " +
        "ORDER BY doc_id"),
    "text_repetition" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        s"g AS (SELECT doc_id, greatest(len(toks) - 2, 0) AS n_grams, " +
        s"  len($shinglesSql) AS n_distinct FROM d) " +
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, " +
        "CAST(n_distinct AS BIGINT) AS n_distinct, " +
        "CASE WHEN n_grams > 0 THEN round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) " +
        "ELSE 0.0 END AS rep_ratio FROM g ORDER BY doc_id"),
    "text_unigram_logprob" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM d), " +
        "freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token), " +
        "tot AS (SELECT COUNT(*) AS total FROM tok), " +
        "x AS (SELECT doc_id, CAST(round(-ln(CAST(cnt AS DOUBLE)/total), 6) AS DECIMAL(20,10)) AS nll " +
        "  FROM tok JOIN freq USING(token), tot) " +
        "SELECT doc_id, round(CAST(SUM(nll) AS DOUBLE)/COUNT(*), 6) AS avg_nll, " +
        "COUNT(*) AS n_tokens FROM x GROUP BY doc_id ORDER BY doc_id"),
    "text_pack" ->
      (s"WITH d AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_toks FROM documents), " +
        "c AS (SELECT doc_id, lang, n_toks, SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id " +
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl FROM d) " +
        "SELECT doc_id, lang, n_toks, CAST(floor((cum_incl - n_toks) / 512.0) AS BIGINT) AS seq_id " +
        "FROM c ORDER BY doc_id"),
    "dedup_simhash" ->
      (s"WITH d AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents), " +
        "h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th FROM d), " +
        "v AS (SELECT doc_id, b.x AS bit, SUM(CASE WHEN (th >> CAST(b.x AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote " +
        " FROM h, (SELECT CAST(range AS BIGINT) x FROM range(60)) b GROUP BY doc_id, b.x), " +
        "sig AS (SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS simhash " +
        " FROM v GROUP BY doc_id) " +
        "SELECT a.doc_id AS i, b.doc_id AS j, CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming " +
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 8 ORDER BY i, j"),
    "dedup_embedding" ->
      """WITH idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
        |p AS (SELECT a.vec_id AS i, b.vec_id AS j, a.embedding AS ea, b.embedding AS eb
        |      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |s AS (SELECT i, j,
        |        SUM(CAST(ea[idx.x] AS DOUBLE) * CAST(eb[idx.x] AS DOUBLE)) AS dot,
        |        SUM(CAST(ea[idx.x] AS DOUBLE) * CAST(ea[idx.x] AS DOUBLE)) AS na,
        |        SUM(CAST(eb[idx.x] AS DOUBLE) * CAST(eb[idx.x] AS DOUBLE)) AS nb
        |      FROM p, idx GROUP BY i, j)
        |SELECT i, j, round(dot/(sqrt(na)*sqrt(nb)), 6) AS score
        |FROM s WHERE dot/(sqrt(na)*sqrt(nb)) >= 0.4 ORDER BY i, j""".stripMargin,
    // n_exact is definitional (same pair computation as dedup_embedding);
    // subset_ok / recall_ge_80 are the LSH contract verdicts pinned to 1
    "dedup_embedding_lsh" ->
      """WITH idx AS (SELECT CAST(range + 1 AS INT) AS x FROM range(64)),
        |p AS (SELECT a.vec_id AS i, b.vec_id AS j, a.embedding AS ea, b.embedding AS eb
        |      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |s AS (SELECT i, j,
        |        SUM(CAST(ea[idx.x] AS DOUBLE) * CAST(eb[idx.x] AS DOUBLE)) AS dot,
        |        SUM(CAST(ea[idx.x] AS DOUBLE) * CAST(ea[idx.x] AS DOUBLE)) AS na,
        |        SUM(CAST(eb[idx.x] AS DOUBLE) * CAST(eb[idx.x] AS DOUBLE)) AS nb
        |      FROM p, idx GROUP BY i, j)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS subset_ok, CAST(1 AS BIGINT) AS recall_ge_80
        |FROM s WHERE dot/(sqrt(na)*sqrt(nb)) >= 0.4""".stripMargin,
    "text_token_stats" ->
      (s"SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpeish " +
        s"FROM (SELECT doc_id, text, $toksSql AS toks FROM documents) ORDER BY doc_id"),
    "text_langid" ->
      (s"WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents), " +
        "h AS (SELECT doc_id, lang, " +
        "len(list_filter(toks, t -> t IN ('der','die','das','und','nicht'))) AS h_de, " +
        "len(list_filter(toks, t -> t IN ('el','los','una','por','con'))) AS h_es, " +
        "len(list_filter(toks, t -> t IN ('le','les','des','est','dans'))) AS h_fr, " +
        "len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS h_en FROM d) " +
        "SELECT doc_id, CASE " +
        "WHEN h_de > 0 AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_en THEN 'de' " +
        "WHEN h_es > 0 AND h_es >= h_fr AND h_es >= h_en THEN 'es' " +
        "WHEN h_fr > 0 AND h_fr >= h_en THEN 'fr' " +
        "WHEN h_en > 0 THEN 'en' ELSE 'und' END AS pred_lang, lang " +
        "FROM h ORDER BY doc_id"),
    // calibration: integer-exact decile binning ((h+1)*10 // denom),
    // round-then-DECIMAL mean confidence, gap off the rounded means
    "dq_calibration" ->
      (s"WITH d AS (SELECT lang, $toksSql AS toks FROM documents), " +
        "h AS (SELECT lang, " +
        "len(list_filter(toks, t -> t IN ('der','die','das','und','nicht'))) AS h_de, " +
        "len(list_filter(toks, t -> t IN ('el','los','una','por','con'))) AS h_es, " +
        "len(list_filter(toks, t -> t IN ('le','les','des','est','dans'))) AS h_fr, " +
        "len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS h_en FROM d), " +
        "b AS (SELECT least((h_en + 1) * 10 // (h_de + h_es + h_fr + h_en + 4), 9) AS bin, " +
        "CAST(h_en + 1 AS DOUBLE) / (h_de + h_es + h_fr + h_en + 4) AS conf, " +
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en FROM h), " +
        "a AS (SELECT bin, COUNT(*) AS n_docs, " +
        "round(CAST(sum(CAST(round(conf, 9) AS DECIMAL(20,12))) AS DOUBLE) / COUNT(*), 6) AS avg_conf, " +
        "round(CAST(sum(is_en) AS DOUBLE) / COUNT(*), 6) AS frac_true " +
        "FROM b GROUP BY bin) " +
        "SELECT CAST(bin AS BIGINT) AS bin, n_docs, avg_conf, frac_true, " +
        "round(abs(frac_true - avg_conf), 6) AS abs_gap FROM a ORDER BY bin"),
    // join cardinality: the definition replayed over count tables; the
    // oracle's full rank over p is the key-universe sort the Spark
    // bounded-heap plan replaces
    "dq_join_cardinality" ->
      ("WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1), " +
        "cb AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1), " +
        "p AS (SELECT ca.k, ca * cb AS rows_out FROM ca JOIN cb USING (k)), " +
        "tot AS (SELECT CAST(sum(rows_out) AS BIGINT) AS join_rows, " +
        "COUNT(*) AS matched_keys FROM p), " +
        "top AS (SELECT CAST(row_number() OVER (ORDER BY rows_out DESC, k) AS BIGINT) " +
        "AS rank, k AS top_key, rows_out AS top_rows FROM p " +
        "ORDER BY rows_out DESC, k LIMIT 3) " +
        "SELECT rank, top_key, top_rows, join_rows, matched_keys " +
        "FROM top, tot ORDER BY rank"),
    // skew report: definitional count-distribution stats; the oracle's
    // global window is the thing the Spark plan replaces
    "dq_skew_report" ->
      ("WITH f AS (SELECT CASE WHEN l_partkey % 10 < 3 THEN l_partkey % 10 " +
        "ELSE l_partkey END AS k FROM lineitem), " +
        "counts AS (SELECT k, COUNT(*) AS c FROM f GROUP BY k), " +
        "hist AS (SELECT c, COUNT(*) AS n_keys FROM counts GROUP BY c), " +
        "cum AS (SELECT c, n_keys, sum(n_keys) OVER (ORDER BY c) AS cum FROM hist), " +
        "tot AS (SELECT CAST(sum(c * n_keys) AS BIGINT) AS n_rows, " +
        "CAST(sum(n_keys) AS BIGINT) AS n_keys, max(c) AS max_cnt FROM hist), " +
        "p AS (SELECT min(CASE WHEN cum * 2 >= t.n_keys THEN c END) AS p50_cnt, " +
        "min(CASE WHEN cum * 100 >= t.n_keys * 99 THEN c END) AS p99_cnt " +
        "FROM cum, tot t), " +
        "top AS (SELECT k AS top_key, c AS top_cnt FROM counts " +
        "ORDER BY c DESC, k LIMIT 1) " +
        "SELECT n_rows, n_keys, max_cnt, p50_cnt, p99_cnt, top_key, top_cnt, " +
        "round(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_ratio " +
        "FROM tot, p, top"),
    // per-group heavy hitters: definitional grouped GROUP BY/HAVING —
    // the sketch+recount must equal the plain answer exactly
    "freq_heavy_hitters_grouped" ->
      ("WITH f AS (SELECT event_type AS grp, " +
        "CASE WHEN user_id % 10 < 3 THEN user_id % 10 ELSE user_id END AS item " +
        "FROM events), " +
        "n AS (SELECT grp, COUNT(*) AS n FROM f GROUP BY grp) " +
        "SELECT f.grp, f.item, COUNT(*) AS cnt FROM f JOIN n USING (grp) " +
        "GROUP BY f.grp, f.item, n.n HAVING COUNT(*) >= ceil(n.n * 0.05) " +
        "ORDER BY grp, cnt DESC, item"),
    "text_fertility" ->
      (s"WITH d AS (SELECT lang, len($toksSql) AS n_toks, " +
        "length(text) AS n_chars FROM documents) " +
        "SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(sum(n_toks) AS BIGINT) AS total_tokens, " +
        "round(CAST(sum(n_toks) AS DOUBLE) / COUNT(*), 6) AS tokens_per_doc, " +
        "round(CAST(sum(n_chars) AS DOUBLE) / sum(n_toks), 6) AS chars_per_token " +
        "FROM d GROUP BY lang ORDER BY lang"),
    // audio trim closed form: amplitude = base + i (monotone), so
    // first-kept = max(0, 32 − base) and the kept sum is an arithmetic
    // series — every column certifies the decoded scan
    "mm_audio_trim" ->
      ("WITH p AS (SELECT doc_id, doc_id % 64 AS base, " +
        "64 + doc_id % 64 AS n FROM documents), " +
        "f AS (SELECT doc_id, n, greatest(0, 32 - base) AS first, base FROM p) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS n_samples, " +
        "CAST(first AS BIGINT) AS trim_start, " +
        "CAST(n - first AS BIGINT) AS n_kept, " +
        "CAST((n - first) * base + (first + n - 1) * (n - first) // 2 AS BIGINT) " +
        "AS kept_amp_sum " +
        "FROM f ORDER BY doc_id"),
    // vocab coverage: the oracle MAY use the global ordered window the
    // Spark plan must avoid; boundary classes close in integer math
    "text_vocab_coverage" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "tok AS (SELECT unnest(toks) AS token FROM d), " +
        "freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token), " +
        "hist AS (SELECT c, COUNT(*) AS n_types, c * COUNT(*) AS occ " +
        "FROM freq GROUP BY c), " +
        "cum AS (SELECT c, n_types, " +
        "sum(n_types) OVER (ORDER BY c DESC) AS cum_types, " +
        "sum(occ) OVER (ORDER BY c DESC) AS cum_occ FROM hist), " +
        "tot AS (SELECT sum(n_types) AS vocab, sum(occ) AS total_occ FROM hist), " +
        "k AS (SELECT unnest([5, 15, 30]) AS cutoff), " +
        "b AS (SELECT cutoff, least(cutoff, vocab) AS k_eff, total_occ " +
        "FROM k, tot) " +
        "SELECT CAST(cutoff AS BIGINT) AS cutoff, " +
        "CAST(k_eff AS BIGINT) AS vocab_used, " +
        "CAST(cum_occ - (cum_types - k_eff) * c AS BIGINT) AS covered_occ, " +
        "CAST(total_occ AS BIGINT) AS total_occ, " +
        "round(CAST(cum_occ - (cum_types - k_eff) * c AS DOUBLE) / total_occ, 6) AS coverage " +
        "FROM b JOIN cum ON cum_types >= k_eff AND cum_types - n_types < k_eff " +
        "ORDER BY cutoff"),
    "text_quality" ->
      (s"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS DOUBLE) / len(toks) AS avg_tok_span, " +
        "CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, " +
        "CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS DOUBLE) / len(toks) AS stopword_ratio " +
        s"FROM (SELECT doc_id, text, $toksSql AS toks FROM documents) ORDER BY doc_id"),
    "text_fingerprint" ->
      ("SELECT doc_id, md5(regexp_replace(trim(lower(text)), '[^a-z0-9]+', ' ', 'g')) AS fp " +
        "FROM documents ORDER BY doc_id"),
    // decoded-PNG closed forms: w=8+d%9, h=8+d%7, base=d%64, frames f
    // (1 image / 1+d%4 video), pixel(x,y,k)=base+x+y+k on 3 channels —
    // wrap-free, so px_sum = 3(wh(fb+f(f-1)/2)+f(h·w(w-1)/2+w·h(h-1)/2))
    "mm_media_meta" ->
      ("WITH p AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind, " +
        "8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f " +
        "FROM documents) " +
        "SELECT doc_id, kind, CAST(w AS BIGINT) AS width, " +
        "CAST(h AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels, " +
        "CAST(f AS BIGINT) AS n_frames, " +
        "CAST(3 * (w*h*(f*b + f*(f-1)//2) + f*(h*(w*(w-1)//2) + w*(h*(h-1)//2))) AS BIGINT) AS px_sum " +
        "FROM p ORDER BY doc_id"),
    "mm_frame_sample" ->
      ("SELECT doc_id, CAST(f.x AS BIGINT) AS frame_idx, " +
        "CAST(8 + doc_id % 9 AS BIGINT) AS width, " +
        "CAST(8 + doc_id % 7 AS BIGINT) AS height " +
        "FROM documents, unnest(range(0, 1 + doc_id % 4, 2)) AS f(x) " +
        "WHERE doc_id % 2 = 1 ORDER BY doc_id, frame_idx"),
    "mm_char_histogram" ->
      ("WITH e AS (SELECT doc_id, length(text) AS n, " +
        "  unnest(range(1, length(text) + 1)) AS i, text FROM documents), " +
        "b AS (SELECT doc_id, n, ascii(substring(text, CAST(i AS INT), 1)) % 16 AS bin FROM e) " +
        "SELECT doc_id, CAST(bin AS BIGINT) AS bin, " +
        "round(CAST(COUNT(*) AS DOUBLE) / n, 6) AS frac " +
        "FROM b GROUP BY doc_id, n, bin ORDER BY doc_id, bin"),
    "mm_resize" ->
      ("SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind, " +
        "CAST(8 + doc_id % 9 AS BIGINT) AS width, " +
        "CAST(8 + doc_id % 7 AS BIGINT) AS height, " +
        "CAST(least(8 + doc_id % 9, 12) AS BIGINT) AS new_w, " +
        "CAST(least(8 + doc_id % 7, 12) AS BIGINT) AS new_h " +
        "FROM documents ORDER BY doc_id"),
    "mm_corpus_stats" ->
      ("SELECT lang, source, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),
    "mm_dim_join" ->
      ("SELECT doc_id, lang, CAST(len(embedding) AS BIGINT) AS dim, label " +
        "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"),
    "udx_scalar" ->
      ("SELECT event_id, CASE WHEN event_type='purchase' THEN value*1.1 " +
        "WHEN event_type='click' THEN value*1.3 ELSE value END AS v_usd " +
        "FROM events ORDER BY event_id"),
    "udx_udaf" ->
      ("SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "udx_udtf" ->
      (s"SELECT doc_id, CAST(r.range AS BIGINT) AS idx, toks[CAST(r.range AS INT)] AS token " +
        s"FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id < 5), range(1, 10000) r " +
        "WHERE r.range <= len(toks) ORDER BY doc_id, idx"),
    "q10e_corr" ->
      ("WITH a AS (SELECT l_returnflag, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, cnt, " +
        "round((cnt*sxy - sx*sy)/sqrt((cnt*sxx - sx*sx)*(cnt*syy - sy*sy)), 6) AS corr_qp, " +
        "round((sxy - sx*sy/cnt)/(cnt-1), 4) AS covar_s, " +
        "round((cnt*sxy - sx*sy)/(cnt*sxx - sx*sx), 6) AS slope " +
        "FROM a ORDER BY l_returnflag"),
    "q10f_histogram" ->
      ("SELECT event_type, CAST(least(floor(value/25.0), 19) AS BIGINT) AS bucket, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS mass " +
        "FROM events GROUP BY event_type, bucket ORDER BY event_type, bucket"),
    "q10h_outliers" ->
      ("WITH q AS (SELECT o_orderstatus, " +
        "quantile_cont(o_totalprice, 0.25) AS p25, " +
        "quantile_cont(o_totalprice, 0.75) AS p75 " +
        "FROM orders GROUP BY o_orderstatus), " +
        "b AS (SELECT o_orderstatus, " +
        "round(p25 - (p75 - p25) * 1.5, 4) AS lo, " +
        "round(p75 + (p75 - p25) * 1.5, 4) AS hi FROM q) " +
        "SELECT o_orderkey, o.o_orderstatus, o_totalprice, lo, hi " +
        "FROM orders o JOIN b USING (o_orderstatus) " +
        "WHERE o_totalprice < lo OR o_totalprice > hi ORDER BY o_orderkey"),
    "q10g_listagg" ->
      ("SELECT c_mktsegment, " +
        "string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), ',' ORDER BY c_nationkey) AS nations, " +
        "COUNT(DISTINCT c_nationkey) AS n_nations " +
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q15c_range_frame" ->
      ("SELECT o_custkey, o_orderkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts_us, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER " +
        "(PARTITION BY o_custkey ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP)) " +
        "RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),
    "q20b_bitagg" ->
      ("SELECT event_type, bit_and(event_id) AS band, bit_or(event_id) AS bor, " +
        "bit_xor(event_id) AS bxor, bool_and(value > 1.0) AS all_gt1, " +
        "bool_or(value > 400.0) AS any_gt400, COUNT(*) AS cnt " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q28b_cohort" ->
      ("WITH weekly AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week, " +
        "COUNT(*) AS n_events FROM events GROUP BY user_id, week), " +
        "cohort AS (SELECT user_id, MIN(week) AS cohort FROM weekly GROUP BY user_id) " +
        "SELECT epoch_us(cohort) AS cohort_us, " +
        "(epoch_us(week) - epoch_us(cohort)) // 604800000000 AS week_no, " +
        "COUNT(DISTINCT w.user_id) AS n_users, CAST(SUM(n_events) AS BIGINT) AS n_events " +
        "FROM weekly w JOIN cohort c USING (user_id) " +
        "GROUP BY cohort_us, week_no ORDER BY cohort_us, week_no"),
    "ts_similarity" ->
      ("WITH hourly AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS v " +
        "FROM events GROUP BY user_id, h), " +
        "p AS (SELECT h, v AS pv FROM hourly WHERE user_id = 1), " +
        "j AS (SELECT user_id, v, pv FROM hourly JOIN p USING (h) WHERE user_id <> 1), " +
        "a AS (SELECT user_id, COUNT(*) AS cnt, " +
        "CAST(SUM(v) AS DOUBLE) AS sx, CAST(SUM(pv) AS DOUBLE) AS sy, " +
        "CAST(SUM(v*pv) AS DOUBLE) AS sxy, CAST(SUM(v*v) AS DOUBLE) AS sxx, " +
        "CAST(SUM(pv*pv) AS DOUBLE) AS syy FROM j GROUP BY user_id) " +
        "SELECT user_id, cnt, " +
        "round((cnt*sxy - sx*sy)/sqrt((cnt*sxx - sx*sx)*(cnt*syy - sy*sy)), 6) AS corr_v " +
        "FROM a WHERE cnt >= 4 AND (cnt*sxx - sx*sx) > 0 AND (cnt*syy - sy*sy) > 0 " +
        "ORDER BY corr_v DESC, user_id LIMIT 10"),
    // the quadratic NOT-EXISTS spelling IS the skyline definition — fine
    // as an oracle at test SF, impossible at 100 TB (hence the two-phase
    // operator)
    "skyline_parts" ->
      ("SELECT p_partkey, p_size, p_retailprice FROM part p1 " +
        "WHERE NOT EXISTS (SELECT 1 FROM part p2 " +
        "WHERE p2.p_size <= p1.p_size AND p2.p_retailprice <= p1.p_retailprice " +
        "AND (p2.p_size < p1.p_size OR p2.p_retailprice < p1.p_retailprice)) " +
        "ORDER BY p_size, p_retailprice, p_partkey"),
    "text_chunk" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "d2 AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, toks, n, u.s AS start FROM d2, unnest(range(0, n, 48)) AS u(s)) " +
        "SELECT doc_id, start // 48 AS chunk_no, " +
        "array_to_string(toks[start+1 : start+64], ' ') AS chunk, " +
        "least(64, n - start) AS n_tokens " +
        "FROM s ORDER BY doc_id, chunk_no"),
    "q16c_topk_per_group" ->
      ("SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders " +
        "QUALIFY row_number() OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey) <= 3 " +
        "ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"),
    // the salted join's contract IS identity with the plain join — same
    // oracle text as q04b on purpose
    "q04c_salted_join" ->
      ("SELECT o_orderpriority, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q04b_bucketed_join" ->
      ("SELECT o_orderpriority, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "mix_source_cap" ->
      ("SELECT source, doc_id, n_chars FROM documents " +
        "QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 40 " +
        "ORDER BY source, doc_id"),
    "mix_temperature" ->
      ("WITH tgt AS (SELECT source, COUNT(*) AS n_docs, " +
        "CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w FROM documents GROUP BY source), " +
        "t2 AS (SELECT source, n_docs, " +
        "CAST((200 * w) // (SUM(w) OVER ()) AS BIGINT) AS target FROM tgt), " +
        "r AS (SELECT source, doc_id, " +
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM documents) " +
        "SELECT r.source, r.doc_id, t2.n_docs, t2.target " +
        "FROM r JOIN t2 USING (source) WHERE rn <= target " +
        "ORDER BY source, doc_id"),
    "q10i_equidepth" ->
      ("WITH q AS (SELECT event_type, " +
        "round(quantile_cont(value, 0.25), 4) AS b1, " +
        "round(quantile_cont(value, 0.5), 4) AS b2, " +
        "round(quantile_cont(value, 0.75), 4) AS b3 " +
        "FROM events GROUP BY event_type) " +
        "SELECT e.event_type, " +
        "CAST(CASE WHEN value <= b1 THEN 0 WHEN value <= b2 THEN 1 " +
        "WHEN value <= b3 THEN 2 ELSE 3 END AS BIGINT) AS bucket, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS mass " +
        "FROM events e JOIN q USING (event_type) " +
        "GROUP BY e.event_type, bucket ORDER BY event_type, bucket"),
    // the ±0.25 sign matrix rebuilt from md5 parity; projections summed
    // per (vec, out-dim); 6dp rounding absorbs sum-order float slop
    "emb_random_projection" ->
      ("""WITH m AS (SELECT j, i,
        |  CASE WHEN CAST('0x' || substr(md5('rp_' || CAST(j AS VARCHAR) || '_' ||
        |    CAST(i AS VARCHAR)), 1, 1) AS INT) % 2 = 0
        |    THEN CAST(0.25 AS DOUBLE) ELSE CAST(-0.25 AS DOUBLE) END AS w
        |  FROM (SELECT unnest(range(0, 16)) AS j), (SELECT unnest(range(0, 64)) AS i)),
        |y AS (SELECT e.vec_id, m.j,
        |        SUM(CAST(e.embedding[m.i + 1] AS DOUBLE) * m.w) AS yj
        |      FROM embeddings e, m GROUP BY e.vec_id, m.j),
        |n AS (SELECT vec_id, SUM(yj * yj) AS ny FROM y GROUP BY vec_id),
        |x AS (SELECT e.vec_id,
        |        SUM(CAST(e.embedding[ix.x] AS DOUBLE) * CAST(e.embedding[ix.x] AS DOUBLE)) AS nx
        |      FROM embeddings e, (SELECT CAST(range + 1 AS INT) AS x FROM range(64)) ix
        |      GROUP BY e.vec_id)
        |SELECT y.vec_id,
        |  round(MAX(CASE WHEN j = 0 THEN yj END), 6) AS y1,
        |  round(MAX(CASE WHEN j = 1 THEN yj END), 6) AS y2,
        |  round(MAX(CASE WHEN j = 2 THEN yj END), 6) AS y3,
        |  round(MAX(CASE WHEN j = 3 THEN yj END), 6) AS y4,
        |  round(MAX(n.ny) / MAX(x.nx), 6) AS norm_ratio
        |FROM y JOIN n USING (vec_id) JOIN x USING (vec_id)
        |GROUP BY y.vec_id ORDER BY y.vec_id""".stripMargin),
    "emb_quantize_topk" ->
      ("WITH prm AS (SELECT greatest(abs(CAST(MIN(u) AS DOUBLE)), " +
        "abs(CAST(MAX(u) AS DOUBLE))) / 127.0 AS step " +
        "FROM embeddings, unnest(embedding) AS t(u)), " +
        "coded AS (SELECT vec_id, " +
        "list_transform(embedding, v -> CAST(least(greatest(" +
        "floor(CAST(v AS DOUBLE) / step), -128.0), 127.0) AS BIGINT)) AS q " +
        "FROM embeddings, prm), " +
        "probe AS (SELECT q AS pq FROM coded WHERE vec_id = 0) " +
        "SELECT vec_id, CAST(list_dot_product(" +
        "list_transform(q, x -> CAST(x AS DOUBLE)), " +
        "list_transform(pq, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score " +
        "FROM coded, probe WHERE vec_id <> 0 " +
        "ORDER BY score DESC, vec_id LIMIT 5"),
    "ts_scd2" ->
      ("WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
        "FROM events), " +
        "ch AS (SELECT user_id, ts, event_id, event_type FROM o " +
        "WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, event_id, event_type, epoch_us(ts) AS valid_from_us, " +
        "epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us " +
        "FROM ch ORDER BY user_id, valid_from_us, event_id"),
    // exact two-phase heavy hitters: the oracle is the plain one-pass
    // GROUP BY ... HAVING definition the sketch+recount must equal
    "freq_heavy_hitters" ->
      ("WITH f AS (SELECT CASE WHEN l_partkey % 10 < 3 THEN l_partkey % 10 " +
        "ELSE l_partkey END AS item FROM lineitem), " +
        "tot AS (SELECT count(*) AS n FROM f) " +
        "SELECT item, count(*) AS cnt FROM f GROUP BY item " +
        "HAVING count(*) >= (SELECT CAST(ceil(n * 0.01) AS BIGINT) FROM tot) " +
        "ORDER BY cnt DESC, item"),
    "ts_time_weighted" ->
      ("WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, " +
        "CAST(value AS DECIMAL(12,2)) AS v FROM events), " +
        "i AS (SELECT user_id, v, " +
        "epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "- epoch_us(ts) AS dur_us FROM o) " +
        "SELECT user_id, count(*) AS n_intervals, " +
        "CAST(sum(dur_us) AS BIGINT) AS total_us, " +
        "round(CAST(sum(v * dur_us) AS DOUBLE) / " +
        "CAST(sum(dur_us) AS DOUBLE), 6) AS twa_value " +
        "FROM i WHERE dur_us IS NOT NULL " +
        "GROUP BY user_id ORDER BY user_id"),
    // sweep-line concurrency: the oracle is the naive global ordered
    // window the sharded prefix-sum must equal
    "ts_concurrency" ->
      ("WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
        "iv AS (SELECT epoch_us(ts) AS f, " +
        "epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS g FROM o), " +
        "d AS (SELECT f AS t, 1 AS d FROM iv WHERE g IS NOT NULL " +
        "UNION ALL SELECT g, -1 FROM iv WHERE g IS NOT NULL), " +
        "n AS (SELECT t, sum(d) AS nd FROM d GROUP BY t) " +
        "SELECT t AS t_us, CAST(sum(nd) OVER (ORDER BY t) AS BIGINT) AS concurrency " +
        "FROM n ORDER BY t_us"),
    // BPE training replay: per stage, adjacent-pair counts over the
    // chr(31)-spelled vocab, argmax by (count DESC, l, r), then
    // left-to-right replace — the trainer's exact loop, unrolled
    "text_bpe_merges" -> bpeOracleSql(6),
    "text_bpe_encode" -> bpeEncodeOracleSql(6),
    "text_bigram_merges" ->
      ("WITH d AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]') AS tk " +
        "FROM documents), " +
        "p AS (SELECT tk[CAST(r.i AS INT)] || ' ' || tk[CAST(r.i AS INT) + 1] AS pair " +
        "FROM d, unnest(range(1, len(tk))) AS r(i)) " +
        "SELECT pair, count(*) AS cnt FROM p GROUP BY pair " +
        "ORDER BY cnt DESC, pair LIMIT 20"),
    // deterministic-coin importance sampling: md5-uniform < quality weight
    "mix_importance" ->
      ("SELECT doc_id, n_chars, source, " +
        "round(least(CAST(1 AS DOUBLE), CAST(n_chars AS DOUBLE) / 400), 6) AS keep_w " +
        "FROM documents " +
        "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) " +
        "/ 1152921504606846976.0 < least(CAST(1 AS DOUBLE), CAST(n_chars AS DOUBLE) / 400) " +
        "ORDER BY doc_id"),
    // PSI between even/odd epoch-days, width-50 buckets, +1 smoothing
    // over the full 10-bucket spine; per-bucket terms quantized to
    // DECIMAL(20,12) so the sum is order-independent in both engines
    "drift_psi" ->
      ("WITH e AS (SELECT event_type, " +
        "CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) AS BIGINT) % 2 AS p, " +
        "CAST(floor(value / 50) AS INT) AS b FROM events), " +
        "c AS (SELECT event_type, p, b, count(*) AS c FROM e GROUP BY 1, 2, 3), " +
        "sp AS (SELECT DISTINCT event_type, pp.p, bb.b FROM e, " +
        "(SELECT unnest(range(0, 2)) AS p) pp, " +
        "(SELECT unnest(range(0, 10)) AS b) bb), " +
        "f AS (SELECT sp.event_type, sp.p, sp.b, COALESCE(c.c, 0) + 1 AS c1 " +
        "FROM sp LEFT JOIN c USING (event_type, p, b)), " +
        "tot AS (SELECT event_type, sum(CASE WHEN p = 0 THEN c1 END) AS na, " +
        "sum(CASE WHEN p = 1 THEN c1 END) AS nb FROM f GROUP BY 1), " +
        "bk AS (SELECT event_type, b, sum(CASE WHEN p = 0 THEN c1 END) AS ca, " +
        "sum(CASE WHEN p = 1 THEN c1 END) AS cb FROM f GROUP BY 1, 2), " +
        "tm AS (SELECT bk.event_type, na, nb, " +
        "CAST((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) " +
        "* ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) / (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) " +
        "AS DECIMAL(20,12)) AS term FROM bk JOIN tot USING (event_type)) " +
        "SELECT event_type, CAST(na - 10 AS BIGINT) AS n_a, " +
        "CAST(nb - 10 AS BIGINT) AS n_b, " +
        "round(CAST(sum(term) AS DOUBLE), 6) AS psi " +
        "FROM tm GROUP BY event_type, na, nb ORDER BY event_type"),
    // one UNION arm per lineitem column; strings carry NULL ranges,
    // the timestamp exports as epoch micros
    "profile_columns" -> {
      def num(c: String) =
        s"SELECT '$c' AS col_name, count($c) AS n_nonnull, " +
          s"count(DISTINCT $c) AS n_distinct, CAST(min($c) AS DOUBLE) AS min_d, " +
          s"CAST(max($c) AS DOUBLE) AS max_d FROM lineitem"
      def str(c: String) =
        s"SELECT '$c', count($c), count(DISTINCT $c), " +
          s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem"
      def tsc(c: String) =
        s"SELECT '$c', count($c), count(DISTINCT $c), " +
          s"CAST(min(epoch_us($c)) AS DOUBLE), CAST(max(epoch_us($c)) AS DOUBLE) FROM lineitem"
      Seq(num("l_orderkey"), num("l_partkey"), num("l_suppkey"),
        num("l_linenumber"), num("l_quantity"), num("l_extendedprice"),
        num("l_discount"), num("l_tax"), str("l_returnflag"),
        str("l_linestatus"), tsc("l_shipdate"))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    // same definitional profile + the HLL envelope verdict pinned to 1
    "profile_columns_approx" -> {
      def num(c: String) =
        s"SELECT '$c' AS col_name, count($c) AS n_nonnull, " +
          s"count(DISTINCT $c) AS n_distinct, CAST(min($c) AS DOUBLE) AS min_d, " +
          s"CAST(max($c) AS DOUBLE) AS max_d, CAST(1 AS BIGINT) AS within_10pct " +
          "FROM lineitem"
      def str(c: String) =
        s"SELECT '$c', count($c), count(DISTINCT $c), " +
          s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(1 AS BIGINT) FROM lineitem"
      def tsc(c: String) =
        s"SELECT '$c', count($c), count(DISTINCT $c), " +
          s"CAST(min(epoch_us($c)) AS DOUBLE), CAST(max(epoch_us($c)) AS DOUBLE), " +
          "CAST(1 AS BIGINT) FROM lineitem"
      Seq(num("l_orderkey"), num("l_partkey"), num("l_suppkey"),
        num("l_linenumber"), num("l_quantity"), num("l_extendedprice"),
        num("l_discount"), num("l_tax"), str("l_returnflag"),
        str("l_linestatus"), tsc("l_shipdate"))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    // ANSI-shared statements: the Spark query IS this string (parser
    // fidelity is part of the check)
    "sql_tpch_q3" -> Analytics.tpchQ3Sql,
    "sql_tpch_q5" -> Analytics.tpchQ5Sql,
    "sql_tpch_q1" -> Analytics.tpchQ1Sql,
    "sql_tpch_q6" -> Analytics.tpchQ6Sql,
    "sql_tpch_q10" -> Analytics.tpchQ10Sql,
    "sql_tpch_q18" -> Analytics.tpchQ18Sql,
    "sql_tpch_q14" -> Analytics.tpchQ14Sql,
    "sql_tpch_q15" -> Analytics.tpchQ15Sql,
    "sql_tpch_q17" -> Analytics.tpchQ17Sql,
    // 3-iteration quantized power iteration, replayed verbatim as CTEs:
    // same 9dp contribution rounding, same DECIMAL(20,10) sums, same
    // 6dp-then-order final cut — bit-parity by construction
    // negative sampling: definitional ring replay — same md5 positions,
    // same shard division, min-of-struct successor, NOT EXISTS rejection
    "graph_negative_sample" ->
      ("WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
        "WHERE l_partkey % 4 = 0), " +
        "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey " +
        "WHERE a.l_partkey < b.l_partkey), " +
        "nodes AS (SELECT u AS nd FROM e0 UNION SELECT v FROM e0), " +
        "hn AS (SELECT nd, ('0x' || substr(md5(CAST(nd AS VARCHAR)), 1, 15))::BIGINT AS hv " +
        "FROM nodes), " +
        "hs AS (SELECT nd, hv, hv // 72057594037927936 AS shard FROM hn), " +
        "ps AS (SELECT nd AS u, i, " +
        "('0x' || substr(md5(CAST(nd AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT AS pos " +
        "FROM nodes, (SELECT unnest([0, 1, 2]) AS i) t), " +
        "psh AS (SELECT u, i, pos, pos // 72057594037927936 AS shard FROM ps), " +
        "j AS (SELECT p.u, p.i, " +
        "min(CASE WHEN n.hv >= p.pos THEN struct_pack(hv := n.hv, nd := n.nd) END) AS succ, " +
        "min(struct_pack(hv := n.hv, nd := n.nd)) AS frst " +
        "FROM psh p JOIN hs n USING (shard) GROUP BY p.u, p.i), " +
        "c AS (SELECT u, CAST(i AS BIGINT) AS i, coalesce(succ, frst).nd AS v FROM j) " +
        "SELECT u, i, v AS neg_v FROM c " +
        "WHERE v <> u AND NOT EXISTS (SELECT 1 FROM e0 e " +
        "WHERE (e.u = c.u AND e.v = c.v) OR (e.u = c.v AND e.v = c.u)) " +
        "ORDER BY u, i"),
    "graph_pagerank" -> {
      val items = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
        "WHERE l_partkey % 4 = 0"
      def step(i: Int) =
        s"s$i AS (SELECT e.v AS n, SUM(CAST(ROUND(r.r / r.d, 9) AS DECIMAL(20,10))) AS s " +
          s"FROM edges e JOIN r${i - 1} r ON e.u = r.n GROUP BY e.v), " +
          s"r$i AS (SELECT deg.n, deg.d, ROUND(0.15 + 0.85 * CAST(COALESCE(s$i.s, 0) AS DOUBLE), 9) AS r " +
          s"FROM deg LEFT JOIN s$i ON deg.n = s$i.n), "
      s"WITH items AS ($items), " +
        "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey " +
        "WHERE a.l_partkey < b.l_partkey), " +
        "edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), " +
        "deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u), " +
        "r0 AS (SELECT n, d, CAST(1.0 AS DOUBLE) AS r FROM deg), " +
        step(1) + step(2) + step(3).stripSuffix(", ") +
        " SELECT n AS part_id, ROUND(r, 6) AS pagerank FROM r3 " +
        "ORDER BY pagerank DESC, part_id LIMIT 20"
    },
    // the full curation chain restated over the stub decode arithmetic:
    // gate -> digest-dedup keeper -> embedding join -> label report
    // gate on DECODED width/pixel-mass; md5-payload equality ≡ equality
    // of the generation parameters ≡ doc_id mod lcm(64,9,7,4) = 4032
    "pipe_media_curation" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f " +
        "FROM documents), " +
        "m AS (SELECT doc_id, w, " +
        "3 * (w*h*(f*b + f*(f-1)//2) + f*(h*(w*(w-1)//2) + w*(h*(h-1)//2))) AS px " +
        "FROM p), " +
        "gated AS (SELECT * FROM m WHERE w >= 12 AND px >= 20000), " +
        "keepers AS (SELECT MIN(doc_id) AS doc_id FROM gated " +
        "GROUP BY doc_id % 4032) " +
        "SELECT e.label, COUNT(*) AS n_assets, " +
        "CAST(SUM(g.px) AS BIGINT) AS total_px " +
        "FROM gated g JOIN keepers k ON g.doc_id = k.doc_id " +
        "JOIN embeddings e ON g.doc_id = e.vec_id " +
        "GROUP BY e.label ORDER BY e.label"),
    // md5-payload equality ≡ generation-parameter equality (see above)
    "mm_binary_dedup" ->
      ("SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies FROM documents " +
        "GROUP BY doc_id % 4032 HAVING COUNT(*) > 1 ORDER BY keeper"),
    // MERGE semantics in plain SQL: deletes filtered, I/U rows take the
    // changeset values, untouched keys keep the base row
    "recon_merge" ->
      ("WITH ch AS (" +
        "SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, " +
        "o_orderstatus, o_totalprice + 5 AS o_totalprice, 'I' AS op " +
        "FROM orders WHERE o_orderkey % 101 = 0 " +
        "UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "o_totalprice + 10, 'U' FROM orders " +
        "WHERE o_orderkey % 13 = 0 AND o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey, NULL, NULL, NULL, 'D' FROM orders " +
        "WHERE o_orderkey % 97 = 0), " +
        "b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders) " +
        "SELECT COALESCE(b.o_orderkey, ch.o_orderkey) AS o_orderkey, " +
        "CASE WHEN ch.op IN ('I','U') THEN ch.o_custkey ELSE b.o_custkey END AS o_custkey, " +
        "CASE WHEN ch.op IN ('I','U') THEN ch.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus, " +
        "CASE WHEN ch.op IN ('I','U') THEN ch.o_totalprice ELSE b.o_totalprice END AS o_totalprice " +
        "FROM b FULL OUTER JOIN ch ON b.o_orderkey = ch.o_orderkey " +
        "WHERE ch.op IS NULL OR ch.op <> 'D' " +
        "ORDER BY o_orderkey"),
    // XOR-fold fingerprints are order-independent by algebra; the md5
    // rendering must match Spark's concat_ws('|') byte-for-byte
    // merge ≡ direct is the contract: the oracle aggregates facts at
    // month grain directly; the query only ever merges daily partials
    "agg_incremental_rollup" ->
      ("SELECT date_trunc('month', ts) AS month, event_type, " +
        "COUNT(*) AS n_events, " +
        "round(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value, " +
        "min(value) AS min_value, max(value) AS max_value, " +
        "round(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value " +
        "FROM events GROUP BY month, event_type ORDER BY month, event_type"),
    "dedup_containment" ->
      (s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, $shinglesSql AS s FROM d),
         |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
         |        len(list_intersect(a.s, b.s)) AS common, len(a.s) AS sa
         |      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
         |SELECT i, j, round(CAST(common AS DOUBLE) / sa, 6) AS containment
         |FROM p WHERE sa > 0 AND common * 10 >= 9 * sa
         |ORDER BY i, j""".stripMargin.replace("\n", " ")),
    "recon_fingerprint" ->
      ("WITH h AS (SELECT " +
        "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket, " +
        "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' || " +
        "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus), 1, 15))::BIGINT AS rh " +
        "FROM orders) " +
        "SELECT bucket, COUNT(*) AS n_rows, bit_xor(rh) AS xor_fp " +
        "FROM h GROUP BY bucket ORDER BY bucket"),
    // the sequential EWMA recurrence reproduced as an ordered left fold:
    // same literals, same order → bit-identical doubles on both engines
    "ts_ewma" ->
      ("SELECT user_id, " +
        "round(list_reduce(list(value ORDER BY ts, event_id), " +
        "(acc, x) -> CAST(0.2 AS DOUBLE)*x + CAST(0.8 AS DOUBLE)*acc), 6) " +
        "AS ewma_final, COUNT(*) AS n_points " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    // two-variable (mean, variance) recurrence folded via a LIST-typed
    // accumulator: [ewma, evar, n_anomalies, max_abs_dev]; the anomaly
    // test reads the PRIOR state exactly like the scan does
    "ts_ewma_anomaly" ->
      ("WITH f AS (SELECT user_id, list_reduce(" +
        "list_transform(list(value ORDER BY ts, event_id), " +
        "x -> [x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]), " +
        "(acc, e) -> [" +
        "CAST(0.2 AS DOUBLE)*e[1] + CAST(0.8 AS DOUBLE)*acc[1], " +
        "CAST(0.8 AS DOUBLE)*(acc[2] + CAST(0.2 AS DOUBLE)*(e[1]-acc[1])*(e[1]-acc[1])), " +
        "acc[3] + CASE WHEN acc[2] > 0 AND abs(e[1]-acc[1]) > 3.0*sqrt(acc[2]) " +
        "THEN 1 ELSE 0 END, " +
        "greatest(acc[4], abs(e[1]-acc[1]))]) AS st, " +
        "COUNT(*) AS n_points FROM events GROUP BY user_id) " +
        "SELECT user_id, CAST(st[3] AS BIGINT) AS n_anomalies, " +
        "round(st[4], 6) AS max_abs_dev, n_points FROM f ORDER BY user_id"),
    // quantile transform: default RANGE window includes value peers =
    // the count-≤-value convention the sharded cumsum implements
    "feat_quantile_transform" ->
      ("WITH h AS (SELECT l_returnflag, l_extendedprice, COUNT(*) AS w " +
        "FROM lineitem GROUP BY l_returnflag, l_extendedprice), " +
        "t AS (SELECT l_returnflag, COUNT(*) AS tot FROM lineitem " +
        "GROUP BY l_returnflag) " +
        "SELECT h.l_returnflag, l_extendedprice, w, " +
        "CAST(sum(w) OVER (PARTITION BY h.l_returnflag " +
        "ORDER BY l_extendedprice) AS BIGINT) AS cum, " +
        "round(CAST(sum(w) OVER (PARTITION BY h.l_returnflag " +
        "ORDER BY l_extendedprice) AS DOUBLE) / tot, 6) AS ecdf " +
        "FROM h JOIN t ON h.l_returnflag = t.l_returnflag " +
        "ORDER BY h.l_returnflag, l_extendedprice"),
    // path mining: same leads/gap filter; ties at the top-k cut break
    // on (n desc, path)
    "path_trigrams" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us " +
        "FROM events), " +
        "s AS (SELECT event_type, " +
        "lead(event_type, 1) OVER w AS t2, lead(ts_us, 1) OVER w AS ts2, " +
        "lead(event_type, 2) OVER w AS t3, lead(ts_us, 2) OVER w AS ts3, ts_us " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)) " +
        "SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n " +
        "FROM s WHERE t3 IS NOT NULL AND ts2 - ts_us <= 86400000000 " +
        "AND ts3 - ts2 <= 86400000000 " +
        "GROUP BY 1 ORDER BY n DESC, path LIMIT 10"),
    // embargo split: running-count boundary (RANGE-frame peers match
    // the histogram cum), integer cross-multiplied threshold
    "ts_embargo_split" ->
      ("WITH e AS (SELECT epoch_us(ts) AS ts_us FROM events), " +
        "c AS (SELECT ts_us, sum(1) OVER (ORDER BY ts_us) AS cum, " +
        "count(*) OVER () AS tot FROM e), " +
        "b AS (SELECT min(ts_us) AS b FROM c WHERE cum * 5 >= tot * 4), " +
        "s AS (SELECT ts_us, CASE WHEN ts_us < b THEN 'train' " +
        "WHEN ts_us < b + 86400000000 THEN 'embargo' ELSE 'test' END AS split " +
        "FROM e, b) " +
        "SELECT split, COUNT(*) AS n_events, min(ts_us) AS min_ts_us, " +
        "max(ts_us) AS max_ts_us FROM s GROUP BY split ORDER BY split"),
    // watermark report: global-window prefix max is the oracle's
    // privilege; lateness quantized to seconds, integer percentiles
    "ts_watermark_report" ->
      ("WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, " +
        "epoch_us(ts) + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 120000000) AS arrival_us " +
        "FROM events), " +
        "w AS (SELECT ts_us, max(ts_us) OVER (ORDER BY arrival_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max FROM e), " +
        "l AS (SELECT CASE WHEN prior_max IS NULL THEN 0 " +
        "ELSE greatest(0, prior_max - ts_us) // 1000000 END AS late_s FROM w), " +
        "hist AS (SELECT late_s, COUNT(*) AS n FROM l GROUP BY late_s), " +
        "cum AS (SELECT late_s, n, sum(n) OVER (ORDER BY late_s) AS cum FROM hist), " +
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_events, " +
        "CAST(sum(CASE WHEN late_s > 0 THEN n ELSE 0 END) AS BIGINT) AS n_late, " +
        "max(late_s) AS max_late_s FROM hist), " +
        "p AS (SELECT min(CASE WHEN cum * 2 >= t.n_events THEN late_s END) AS p50_late_s, " +
        "min(CASE WHEN cum * 100 >= t.n_events * 95 THEN late_s END) AS p95_late_s, " +
        "min(CASE WHEN cum * 100 >= t.n_events * 99 THEN late_s END) AS p99_late_s " +
        "FROM cum, tot t) " +
        "SELECT n_events, n_late, " +
        "round(CAST(n_late AS DOUBLE) / n_events, 6) AS share_late, " +
        "p50_late_s, p95_late_s, p99_late_s, max_late_s FROM tot, p"),
    // attribution: the rows frame reads ignore-nulls conditional fields
    // (deterministic — its ORDER BY carries the event_id tie-break); the
    // RANGE frame orders on ts_us alone, so the first touch is a
    // MIN-OF-STRUCT (lexicographic: ts, then id) — deterministic under
    // shared timestamps in both engines, matching the Spark plan
    "feat_attribution" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us " +
        "FROM events), " +
        "t AS (SELECT *, " +
        "CASE WHEN event_type IN ('click','view') THEN ts_us END AS t_ts, " +
        "CASE WHEN event_type IN ('click','view') THEN event_id END AS t_id, " +
        "CASE WHEN event_type IN ('click','view') THEN event_type END AS t_type, " +
        "CASE WHEN event_type IN ('click','view') THEN " +
        "struct_pack(ts_us := ts_us, event_id := event_id, event_type := event_type) " +
        "END AS t_struct FROM e), " +
        "w AS (SELECT user_id, event_id, event_type, ts_us, " +
        "last_value(t_ts IGNORE NULLS) OVER lw AS lt_ts, " +
        "last_value(t_id IGNORE NULLS) OVER lw AS lt_id, " +
        "last_value(t_type IGNORE NULLS) OVER lw AS lt_type, " +
        "min(t_struct) OVER fw AS ft " +
        "FROM t WINDOW " +
        "lw AS (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
        "fw AS (PARTITION BY user_id ORDER BY ts_us " +
        "RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, event_id AS purchase_id, ts_us AS purchase_ts_us, " +
        "ft.event_id AS first_touch_id, ft.event_type AS first_touch_type, " +
        "lt_id AS last_touch_id, lt_type AS last_touch_type, " +
        "ts_us - lt_ts AS last_touch_latency_us " +
        "FROM w WHERE event_type = 'purchase' ORDER BY user_id, purchase_id"),
    // two-sided CUSUM (Page's test) folded with a LIST accumulator
    // [x, sp, sn, n_alarms, max_sp, max_sn]; the transform seeds the
    // post-first-point state (list_reduce uses element 1 as the initial
    // accumulator), pre-reset maxima tracked before the alarm reset;
    // literals and parenthesization match TimeSeries.cusumStep exactly
    "ts_cusum" -> cusumFoldSql,
    "ts_ohlc" ->
      ("WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, ts, " +
        "event_id, value FROM events), " +
        "o AS (SELECT event_type, day, value AS open FROM e " +
        "QUALIFY row_number() OVER (PARTITION BY event_type, day " +
        "ORDER BY ts, event_id) = 1), " +
        "c AS (SELECT event_type, day, value AS close FROM e " +
        "QUALIFY row_number() OVER (PARTITION BY event_type, day " +
        "ORDER BY ts DESC, event_id DESC) = 1), " +
        "a AS (SELECT event_type, day, max(value) AS high, min(value) AS low, " +
        "COUNT(*) AS volume FROM e GROUP BY event_type, day) " +
        "SELECT a.event_type, a.day, o.open, a.high, a.low, c.close, a.volume " +
        "FROM a JOIN o USING (event_type, day) JOIN c USING (event_type, day) " +
        "ORDER BY a.event_type, a.day"),
    "q10n_winsorize" ->
      ("WITH q AS (SELECT l_returnflag, " +
        "round(quantile_cont(l_extendedprice, 0.05), 4) AS lo, " +
        "round(quantile_cont(l_extendedprice, 0.95), 4) AS hi " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo, " +
        "CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi, " +
        "round(CAST(SUM(CAST(CASE WHEN l_extendedprice < lo THEN lo " +
        "WHEN l_extendedprice > hi THEN hi ELSE l_extendedprice END " +
        "AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS wins_mean " +
        "FROM lineitem JOIN q USING (l_returnflag) " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "emb_label_balance" ->
      ("WITH c AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label), " +
        "t AS (SELECT SUM(n_vecs) AS tot FROM c), " +
        "w AS (SELECT label, n_vecs, CAST(n_vecs AS DOUBLE) / tot AS share FROM c, t), " +
        "s AS (SELECT round(CAST(SUM(CAST(round(-ln(share) * share, 8) " +
        "AS DECIMAL(20,10))) AS DOUBLE), 6) AS entropy_nats, " +
        "round(CAST(MAX(n_vecs) AS DOUBLE) / MIN(n_vecs), 6) AS imbalance FROM w) " +
        "SELECT label, n_vecs, round(share, 6) AS share, entropy_nats, imbalance " +
        "FROM w, s ORDER BY label"),
    // Lloyd's iterations replayed as chained CTEs with the same quantized
    // arithmetic (9dp-rounded squared diffs into DECIMAL(22,12), 6dp
    // decimal-mean centroids) — assignments and inertia match bit-exactly
    "emb_kmeans" ->
      (lloydsCtes.stripSuffix(", ") +
        " SELECT cid AS cluster, COUNT(*) AS n_members, " +
        "round(CAST(SUM(d2) AS DOUBLE), 4) AS inertia " +
        "FROM a3 GROUP BY cid ORDER BY cluster"),
    // same Lloyd's replay to the final assignment table a3, then the
    // SemDeDup rule: within-cluster pairs, cosine >= 0.4 drops the
    // higher id; kept = never dropped. Cosine arithmetic mirrors the
    // dedup_embedding oracle exactly (double products, dim-ordered sums)
    "emb_semdedup" ->
      (semDedupCtes +
        "SELECT a3.vec_id, CAST(a3.cid AS BIGINT) AS cluster, " +
        "(du.vec_id IS NULL) AS kept " +
        "FROM a3 LEFT JOIN dups du ON du.vec_id = a3.vec_id ORDER BY a3.vec_id"),
    // same Lloyd's + within-cluster pair replay, collapsed to the
    // definitional drop count; the cap verdicts are Spark-side
    // set-algebra contracts (loose cap admits everything / tight cap
    // only removes drops) the hash gate forces to hold
    "emb_semdedup_bounded" ->
      (semDedupCtes +
        "SELECT (SELECT COUNT(*) FROM a3) AS n_vecs, " +
        "(SELECT COUNT(*) FROM dups) AS n_dropped, " +
        "CAST(1 AS BIGINT) AS loose_cap_eq, " +
        "CAST(1 AS BIGINT) AS tight_cap_subset"),
    // hierarchical form: same definitional flat-drop replay; the
    // refinement verdicts (subset / no-growth) are Spark-side
    // set-algebra contracts the hash gate forces to hold
    "emb_semdedup_hier" ->
      (semDedupCtes +
        "SELECT (SELECT COUNT(*) FROM a3) AS n_vecs, " +
        "(SELECT COUNT(*) FROM dups) AS n_dropped, " +
        "CAST(1 AS BIGINT) AS hier_subset, " +
        "CAST(1 AS BIGINT) AS refine_no_growth"),
    // recursive form: same definitional flat-drop replay; the live
    // refinement's subset + partition verdicts are Spark-side
    // set-algebra contracts the hash gate forces to hold
    "emb_semdedup_rec" ->
      (semDedupCtes +
        "SELECT (SELECT COUNT(*) FROM a3) AS n_vecs, " +
        "(SELECT COUNT(*) FROM dups) AS n_dropped, " +
        "CAST(1 AS BIGINT) AS rec_subset, " +
        "CAST(1 AS BIGINT) AS rec_partition"),
    // changelog net state, definitionally: last op per (group, id) by
    // seq wins, deletes remove the id, SUM/COUNT per group over what
    // survives; groups whose ids were ALL deleted still emitted a
    // snapshot, hence the DISTINCT-group left join
    "stream_changelog_agg" ->
      ("WITH ops AS (SELECT CASE WHEN event_type='purchase' THEN 'D' " +
        "WHEN event_type='click' THEN 'U' ELSE 'I' END AS op, " +
        "event_id AS seq, user_id % 8 AS grp, event_id % 97 AS id, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events), " +
        "last AS (SELECT * FROM ops QUALIFY " +
        "row_number() OVER (PARTITION BY grp, id ORDER BY seq DESC) = 1), " +
        "net AS (SELECT grp, SUM(value_c) AS sum_c, COUNT(*) AS cnt " +
        "FROM last WHERE op <> 'D' GROUP BY grp) " +
        "SELECT g.grp, CAST(COALESCE(net.sum_c, 0) AS BIGINT) AS sum_c, " +
        "CAST(COALESCE(net.cnt, 0) AS BIGINT) AS cnt " +
        "FROM (SELECT DISTINCT grp FROM ops) g " +
        "LEFT JOIN net ON net.grp = g.grp ORDER BY g.grp"),
    // retractable Top-N: rank the definitional net state directly
    // (value DESC, id ASC, top 3 per group); fully-deleted groups rank
    // nothing — the gate drops the operator's rk=0 sentinel the same way
    "stream_changelog_topn" ->
      ("WITH ops AS (SELECT CASE WHEN event_type='purchase' THEN 'D' " +
        "WHEN event_type='click' THEN 'U' ELSE 'I' END AS op, " +
        "event_id AS seq, user_id % 8 AS grp, event_id % 97 AS id, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events), " +
        "last AS (SELECT * FROM ops QUALIFY " +
        "row_number() OVER (PARTITION BY grp, id ORDER BY seq DESC) = 1), " +
        "net AS (SELECT grp, id, value_c FROM last WHERE op <> 'D') " +
        "SELECT grp, CAST(row_number() OVER (PARTITION BY grp " +
        "ORDER BY value_c DESC, id) AS BIGINT) AS rk, id, value_c " +
        "FROM net QUALIFY rk <= 3 ORDER BY grp, rk"),
    // changelog equi-join: the signed-count fold of the operator's
    // emitted deltas must equal the join of the two sides' net states
    // (last op per (side, grp, id) by seq, deletes removed)
    "stream_changelog_join" ->
      ("WITH ops AS (SELECT CASE WHEN event_type='purchase' THEN 'D' " +
        "WHEN event_type='click' THEN 'U' ELSE 'I' END AS op, " +
        "event_id AS seq, user_id % 4 AS grp, event_id AS eid, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events), " +
        "sided AS (SELECT CASE WHEN eid % 2 = 0 THEN 'L' ELSE 'R' END " +
        "AS side, op, seq, grp, " +
        "CASE WHEN eid % 2 = 0 THEN eid % 13 ELSE eid % 11 END AS id, " +
        "value_c FROM ops), " +
        "last AS (SELECT * FROM sided QUALIFY row_number() OVER " +
        "(PARTITION BY side, grp, id ORDER BY seq DESC) = 1), " +
        "netl AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'L' AND op <> 'D'), " +
        "netr AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'R' AND op <> 'D') " +
        "SELECT l.grp, CAST(l.id AS BIGINT) AS l_id, " +
        "CAST(r.id AS BIGINT) AS r_id, l.value_c AS l_val, " +
        "r.value_c AS r_val FROM netl l JOIN netr r ON l.grp = r.grp " +
        "ORDER BY l.grp, l_id, r_id"),
    // left-outer twin on the thinned fixture: net-state LEFT JOIN,
    // null padding included; NULLS LAST pins the cross-engine order
    "stream_changelog_join_left" ->
      ("WITH ops AS (SELECT CASE WHEN event_type='purchase' THEN 'D' " +
        "WHEN event_type='click' THEN 'U' ELSE 'I' END AS op, " +
        "event_id AS seq, user_id % 4 AS grp, event_id AS eid, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events " +
        "WHERE event_id % 3 = 0), " +
        "sided AS (SELECT CASE WHEN eid % 2 = 0 THEN 'L' ELSE 'R' END " +
        "AS side, op, seq, grp, " +
        "CASE WHEN eid % 2 = 0 THEN eid % 13 ELSE eid % 11 END AS id, " +
        "value_c FROM ops WHERE NOT (eid % 2 = 1 AND grp = 3)), " +
        "last AS (SELECT * FROM sided QUALIFY row_number() OVER " +
        "(PARTITION BY side, grp, id ORDER BY seq DESC) = 1), " +
        "netl AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'L' AND op <> 'D'), " +
        "netr AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'R' AND op <> 'D') " +
        "SELECT l.grp, CAST(l.id AS BIGINT) AS l_id, " +
        "CAST(r.id AS BIGINT) AS r_id, l.value_c AS l_val, " +
        "r.value_c AS r_val FROM netl l LEFT JOIN netr r ON l.grp = r.grp " +
        "ORDER BY l.grp, l_id, r_id NULLS LAST"),
    // full-outer twin: both directions of padding survive to the final
    // answer (group 3 right-free, group 2 left-free); COALESCE key for
    // the null-safe ORDER BY grp
    "stream_changelog_join_full" ->
      ("WITH ops AS (SELECT CASE WHEN event_type='purchase' THEN 'D' " +
        "WHEN event_type='click' THEN 'U' ELSE 'I' END AS op, " +
        "event_id AS seq, user_id % 4 AS grp, event_id AS eid, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events " +
        "WHERE event_id % 3 = 0), " +
        "sided AS (SELECT CASE WHEN eid % 2 = 0 THEN 'L' ELSE 'R' END " +
        "AS side, op, seq, grp, " +
        "CASE WHEN eid % 2 = 0 THEN eid % 13 ELSE eid % 11 END AS id, " +
        "value_c FROM ops WHERE NOT (eid % 2 = 1 AND grp = 3) " +
        "AND NOT (eid % 2 = 0 AND grp = 2)), " +
        "last AS (SELECT * FROM sided QUALIFY row_number() OVER " +
        "(PARTITION BY side, grp, id ORDER BY seq DESC) = 1), " +
        "netl AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'L' AND op <> 'D'), " +
        "netr AS (SELECT grp, id, value_c FROM last " +
        "WHERE side = 'R' AND op <> 'D') " +
        "SELECT COALESCE(l.grp, r.grp) AS grp, " +
        "CAST(l.id AS BIGINT) AS l_id, CAST(r.id AS BIGINT) AS r_id, " +
        "l.value_c AS l_val, r.value_c AS r_val " +
        "FROM netl l FULL JOIN netr r ON l.grp = r.grp " +
        "ORDER BY grp, l_id NULLS LAST, r_id NULLS LAST"),
    // event-time temporal join, definitionally: per fact, the
    // max-validity version at or before its timestamp (seq breaks
    // same-instant version ties), D -> no value; inner drops the
    // unmatched fact
    "stream_temporal_join" ->
      ("WITH ev AS (SELECT event_id AS eid, user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events), " +
        "facts AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "CAST(eid AS BIGINT) AS id, ts_us, value_c FROM ev " +
        "WHERE eid % 2 = 0), " +
        "vers AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "ts_us AS vts, eid AS vseq, " +
        "CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'I' END AS op, " +
        "value_c AS vval FROM ev WHERE eid % 2 = 1), " +
        "pick AS (SELECT f.k, f.id, f.ts_us, f.value_c, v.op, v.vval, " +
        "row_number() OVER (PARTITION BY f.k, f.id " +
        "ORDER BY v.vts DESC, v.vseq DESC) AS rn " +
        "FROM facts f LEFT JOIN vers v ON v.k = f.k " +
        "AND v.vts <= f.ts_us) " +
        "SELECT k, id, ts_us, value_c AS l_val, vval AS r_val " +
        "FROM pick WHERE rn = 1 AND op = 'I' ORDER BY k, id"),
    // left-outer twin: unmatched facts (no version yet, or D-closed)
    // survive with a NULL r_val
    "stream_temporal_join_left" ->
      ("WITH ev AS (SELECT event_id AS eid, user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events), " +
        "facts AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "CAST(eid AS BIGINT) AS id, ts_us, value_c FROM ev " +
        "WHERE eid % 2 = 0), " +
        "vers AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "ts_us AS vts, eid AS vseq, " +
        "CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'I' END AS op, " +
        "value_c AS vval FROM ev WHERE eid % 2 = 1), " +
        "pick AS (SELECT f.k, f.id, f.ts_us, f.value_c, v.op, v.vval, " +
        "row_number() OVER (PARTITION BY f.k, f.id " +
        "ORDER BY v.vts DESC, v.vseq DESC) AS rn " +
        "FROM facts f LEFT JOIN vers v ON v.k = f.k " +
        "AND v.vts <= f.ts_us) " +
        "SELECT k, id, ts_us, value_c AS l_val, " +
        "CASE WHEN op = 'I' THEN vval ELSE NULL END AS r_val " +
        "FROM pick WHERE rn = 1 ORDER BY k, id"),
    // ROWS-frame OVER stream: the batch frame IS the oracle — the
    // operator pins the same (ts, id) total order
    "stream_over_rows" ->
      ("WITH base AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(event_id AS BIGINT) AS id, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events) " +
        "SELECT k, ts_us, id, value_c, " +
        "CAST(SUM(value_c) OVER (PARTITION BY k ORDER BY ts_us, id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_w, " +
        "COUNT(*) OVER (PARTITION BY k ORDER BY ts_us, id " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS cnt_w " +
        "FROM base ORDER BY k, ts_us, id"),
    // RANGE-frame OVER stream vs the definitional batch RANGE frame
    // (10-minute trailing window, cents exact in doubles)
    "stream_over_range" ->
      ("WITH base AS (SELECT CAST(user_id % 16 AS BIGINT) AS k, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(event_id AS BIGINT) AS id, " +
        "CAST(round(value * 100) AS DOUBLE) AS value_c FROM events) " +
        "SELECT k, ts_us, id, value_c, " +
        "SUM(value_c) OVER (PARTITION BY k ORDER BY ts_us " +
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS sum_w, " +
        "COUNT(*) OVER (PARTITION BY k ORDER BY ts_us " +
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS cnt_w " +
        "FROM base ORDER BY k, ts_us, id"),
    // streaming window-family replay gates: the day-folded fixture
    // (micros-of-day + 2024-01-01T00:00Z, users % 16) shared with the
    // Spark side; each oracle is the definitional batch computation
    "stream_tumble" ->
      (streamFoldedCte +
        "SELECT (tu // 60000000) * 60000000 AS w_start, event_type, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM f GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_slide" ->
      (streamFoldedCte +
        "SELECT w_start, COUNT(*) AS cnt FROM " +
        "(SELECT (tu // 30000000) * 30000000 - u.o AS w_start FROM f, " +
        "(VALUES (CAST(0 AS BIGINT)), (CAST(30000000 AS BIGINT))) u(o)) " +
        "GROUP BY w_start ORDER BY w_start"),
    "stream_cumulate" ->
      (streamFoldedCte +
        ", w AS (SELECT tu - tu % 240000000 AS w_start, tu, value FROM f), " +
        "x AS (SELECT w_start, w_start + k.k * 60000000 AS w_end, value " +
        "FROM w, (SELECT CAST(range + 1 AS BIGINT) AS k FROM range(4)) k " +
        "WHERE tu < w_start + k.k * 60000000) " +
        "SELECT w_start, w_end, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM x GROUP BY w_start, w_end ORDER BY w_start, w_end"),
    "stream_session" ->
      (streamFoldedCte +
        ", m AS (SELECT user_id, tu, CASE WHEN LAG(tu) OVER " +
        "(PARTITION BY user_id ORDER BY tu) IS NULL OR tu - LAG(tu) OVER " +
        "(PARTITION BY user_id ORDER BY tu) >= 30000000 THEN 1 ELSE 0 END " +
        "AS brk FROM f), " +
        "g AS (SELECT user_id, tu, SUM(brk) OVER (PARTITION BY user_id " +
        "ORDER BY tu ROWS UNBOUNDED PRECEDING) AS grp FROM m) " +
        "SELECT user_id, MIN(tu) AS w_start, MAX(tu) + 30000000 AS w_end, " +
        "COUNT(*) AS cnt FROM g GROUP BY user_id, grp " +
        "ORDER BY user_id, w_start"),
    "stream_dynamic_session" ->
      (streamFoldedCte +
        ", m AS (SELECT user_id, tu, CASE WHEN event_type = 'purchase' " +
        "THEN 60000000 ELSE 30000000 END AS gap FROM f), " +
        "p AS (SELECT user_id, tu, gap, MAX(tu + gap) OVER " +
        "(PARTITION BY user_id ORDER BY tu " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend FROM m), " +
        "g AS (SELECT user_id, tu, gap, CASE WHEN pend IS NULL " +
        "OR tu >= pend THEN 1 ELSE 0 END AS brk FROM p), " +
        "s AS (SELECT user_id, tu, gap, SUM(brk) OVER " +
        "(PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) " +
        "AS grp FROM g) " +
        "SELECT user_id, MIN(tu) AS w_start, MAX(tu + gap) AS w_end, " +
        "COUNT(*) AS cnt FROM s GROUP BY user_id, grp " +
        "ORDER BY user_id, w_start"),
    "stream_interval_join_left" ->
      (streamFoldedCte +
        "SELECT c.event_id AS click_id, p.event_id AS purchase_id, " +
        "c.user_id, c.tu AS click_ts, p.tu AS purchase_ts " +
        "FROM (SELECT * FROM f WHERE event_type = 'click') c " +
        "LEFT JOIN (SELECT * FROM f WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id AND p.tu >= c.tu " +
        "AND p.tu <= c.tu + 30000000 " +
        "ORDER BY click_id, purchase_id NULLS LAST"),
    "stream_interval_join_full" ->
      (streamFoldedCte +
        "SELECT c.event_id AS click_id, p.event_id AS purchase_id, " +
        "COALESCE(c.user_id, p.user_id) AS user_id, " +
        "c.tu AS click_ts, p.tu AS purchase_ts " +
        "FROM (SELECT * FROM f WHERE event_type = 'click') c " +
        "FULL JOIN (SELECT * FROM f WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id AND p.tu >= c.tu " +
        "AND p.tu <= c.tu + 30000000 " +
        "ORDER BY click_id NULLS LAST, purchase_id NULLS LAST"),
    "stream_dedup" ->
      (streamFoldedCte +
        "SELECT DISTINCT user_id, event_type FROM f " +
        "ORDER BY user_id, event_type"),
    // latest row per key by unique seq, tombstoned winners dropped from
    // the live view (their markers stay in state — sink-side contract)
    "stream_upsert_view" ->
      ("WITH u AS (SELECT CAST(user_id % 64 AS BIGINT) AS key, " +
        "CAST(event_id AS BIGINT) AS seq, " +
        "CAST(round(value * 100) AS BIGINT) AS value_c, " +
        "event_type = 'purchase' AS del FROM events), " +
        "w AS (SELECT *, row_number() OVER (PARTITION BY key " +
        "ORDER BY seq DESC) AS rn FROM u) " +
        "SELECT key, seq, value_c FROM w WHERE rn = 1 AND NOT del " +
        "ORDER BY key"),
    // streaming CEP over the folded fixture: the batch cep_funnel
    // islands CTE with the 10-minute window predicate (the machine's
    // window is start→completion span, inclusive; binds: 87/99)
    "stream_cep" ->
      (streamFoldedCte +
        ", r AS (SELECT user_id, event_id, event_type, tu AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 600000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // streaming timeout side output: the cep_timeout per-click
    // classification on the FOLDED corpus at the stream gate's
    // 10-minute window — matches + timed-out partials, kills silent
    "stream_cep_timeout" ->
      (streamFoldedCte +
        ", r AS (SELECT user_id, event_id, event_type, tu AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "c AS (SELECT user_id, event_id AS cid, ts_us AS cts, rn AS crn " +
        "FROM r WHERE event_type = 'click'), " +
        "nx AS (SELECT c.*, (SELECT MIN(x.rn) FROM r x " +
        "WHERE x.user_id = c.user_id AND x.rn > c.crn " +
        "AND x.event_type <> 'view') AS nrn FROM c), " +
        "b AS (SELECT nx.*, (SELECT MIN(v.rn) FROM r v " +
        "WHERE v.user_id = nx.user_id AND v.rn > nx.crn " +
        "AND (nx.nrn IS NULL OR v.rn < nx.nrn) " +
        "AND v.ts_us > nx.cts + 600000000) AS brn FROM nx), " +
        "cls AS (SELECT b.user_id, b.cid, b.cts, b.crn, b.nrn, b.brn, " +
        "n.event_type AS ntype, n.ts_us AS nts, n.event_id AS nid " +
        "FROM b LEFT JOIN r n ON n.user_id = b.user_id AND n.rn = b.nrn), " +
        "tmo AS (SELECT user_id, cid, cts, crn, " +
        "CASE WHEN brn IS NOT NULL THEN brn - 1 " +
        "WHEN nrn IS NULL THEN (SELECT MAX(m.rn) FROM r m " +
        "WHERE m.user_id = cls.user_id) " +
        "ELSE nrn - 1 END AS ern FROM cls " +
        "WHERE brn IS NOT NULL OR nrn IS NULL " +
        "OR nts > cts + 600000000), " +
        "mt AS (SELECT user_id, cid AS start_event_id, " +
        "cts AS start_ts_us, nid AS end_event_id, nts AS end_ts_us, " +
        "CAST(nrn - crn + 1 AS BIGINT) AS n_rows, FALSE AS timed_out " +
        "FROM cls WHERE brn IS NULL AND nrn IS NOT NULL " +
        "AND nts <= cts + 600000000 AND ntype = 'purchase' " +
        "AND nrn > crn + 1) " +
        "SELECT * FROM mt UNION ALL " +
        "SELECT t.user_id, t.cid, t.cts, e.event_id, e.ts_us, " +
        "CAST(t.ern - t.crn + 1 AS BIGINT), TRUE " +
        "FROM tmo t JOIN r e ON e.user_id = t.user_id AND e.rn = t.ern " +
        "ORDER BY user_id, start_ts_us, start_event_id"),
    // streaming MEASURES: the sql_mr_measures islands oracle on the
    // FOLDED corpus at the stream tier's 10-minute window
    "stream_sql_mr_measures" ->
      (streamFoldedCte +
        ", r AS (SELECT user_id, event_id, event_type, tu AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS sv, " +
        "CAST(MAX(vc) AS BIGINT) AS mxv FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "g.sv, g.mxv, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.last_id AS click_id, CAST(v.n AS BIGINT) AS views_cnt, " +
        "v.sv AS views_sum_c, v.mxv AS views_max_c, " +
        "p.first_id AS purchase_id " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 600000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // streaming SKIP TO NEXT ROW on the folded corpus: ALL 10-minute-
    // valid contiguous (view, click, view) triples — the overlapping
    // selection the strategy definitionally yields
    "stream_cep_skip" ->
      (streamFoldedCte +
        ", r AS (SELECT user_id, event_id, event_type, tu AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f) " +
        "SELECT a.user_id, a.event_id AS start_event_id, " +
        "a.ts_us AS start_ts_us, w.event_id AS end_event_id, " +
        "w.ts_us AS end_ts_us, CAST(3 AS BIGINT) AS n_rows " +
        "FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + 1 " +
        "AND b.event_type = 'click' " +
        "JOIN r w ON w.user_id = a.user_id AND w.rn = a.rn + 2 " +
        "AND w.event_type = 'view' " +
        "WHERE a.event_type = 'view' AND w.ts_us - a.ts_us <= 600000000 " +
        "ORDER BY a.user_id, start_ts_us, start_event_id"),
    // unbounded append Top-N: the final leaderboard is the
    // definitional ROW_NUMBER cut (value DESC, id ASC)
    "stream_topn" ->
      ("WITH e AS (SELECT CAST(user_id % 8 AS BIGINT) AS grp, " +
        "CAST(event_id AS BIGINT) AS id, CAST(value AS DOUBLE) AS value " +
        "FROM events), " +
        "r AS (SELECT grp, id, value, row_number() OVER " +
        "(PARTITION BY grp ORDER BY value DESC, id) AS rk FROM e) " +
        "SELECT grp, CAST(rk AS BIGINT) AS rk, id, value FROM r " +
        "WHERE rk <= 3 ORDER BY grp, rk"),
    // live EWMA summary: the ts_ewma_anomaly fold's (ewma, evar,
    // anomaly-count) triple — st[1] is the final post-fold EWMA
    "stream_ewma" ->
      ("WITH f AS (SELECT user_id, list_reduce(" +
        "list_transform(list(value ORDER BY ts, event_id), " +
        "x -> [x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]), " +
        "(acc, e) -> [" +
        "CAST(0.2 AS DOUBLE)*e[1] + CAST(0.8 AS DOUBLE)*acc[1], " +
        "CAST(0.8 AS DOUBLE)*(acc[2] + CAST(0.2 AS DOUBLE)*(e[1]-acc[1])*(e[1]-acc[1])), " +
        "acc[3] + CASE WHEN acc[2] > 0 AND abs(e[1]-acc[1]) > 3.0*sqrt(acc[2]) " +
        "THEN 1 ELSE 0 END]) AS st, " +
        "COUNT(*) AS n_points FROM events GROUP BY user_id) " +
        "SELECT user_id, round(st[1], 6) AS ewma_final, " +
        "CAST(st[3] AS BIGINT) AS n_anomalies, n_points " +
        "FROM f ORDER BY user_id"),
    // live CUSUM summary: literally the batch ts_cusum oracle — the
    // operators share cusumStep, so one fold is the contract for both
    "stream_cusum" -> cusumFoldSql,
    // last-touch attribution: latest click/view strictly before each
    // purchase in (ts, id) row order
    "stream_attribution" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn FROM events), " +
        "t AS (SELECT r.*, max(CASE WHEN event_type IN ('click','view') " +
        "THEN rn END) OVER (PARTITION BY user_id ORDER BY rn " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_rn " +
        "FROM r) " +
        "SELECT p.user_id, p.event_id AS purchase_id, " +
        "p.ts_us AS purchase_ts_us, x.event_id AS last_touch_id, " +
        "x.event_type AS last_touch_type, " +
        "p.ts_us - x.ts_us AS last_touch_latency_us " +
        "FROM t p JOIN r x ON x.user_id = p.user_id AND x.rn = p.touch_rn " +
        "WHERE p.event_type = 'purchase' " +
        "ORDER BY p.user_id, purchase_id"),
    // windowed dedup key contract: the distinct (window, user) set
    "stream_window_dedup" ->
      (streamFoldedCte +
        "SELECT DISTINCT tu - tu % 600000000 AS w_start, user_id FROM f " +
        "ORDER BY w_start, user_id"),
    // per-window PSI vs the corpus histogram, definitionally: +1
    // smoothed proportions over the 10-bucket spine, DECIMAL(20,12)
    // quantized terms (the batch drift_psi recipe), windows from ALL
    // events (out-of-domain rows open the window but join no bucket)
    "stream_drift_psi" ->
      (streamFoldedCte +
        ", sp AS (SELECT CAST(range AS INT) AS b FROM range(10)), " +
        "base AS (SELECT CAST(FLOOR(value / 50) AS INT) AS b, " +
        "COUNT(*) AS c FROM f WHERE FLOOR(value / 50) >= 0 " +
        "AND FLOOR(value / 50) < 10 GROUP BY 1), " +
        "bs AS (SELECT sp.b, COALESCE(base.c, 0) + 1 AS cb " +
        "FROM sp LEFT JOIN base USING (b)), " +
        "btot AS (SELECT CAST(SUM(cb) AS DOUBLE) AS tb FROM bs), " +
        "ws AS (SELECT DISTINCT (tu // 3600000000) * 3600000000 " +
        "AS w_start FROM f), " +
        "wcnt AS (SELECT (tu // 3600000000) * 3600000000 AS w_start, " +
        "CAST(FLOOR(value / 50) AS INT) AS b, COUNT(*) AS c FROM f " +
        "WHERE FLOOR(value / 50) >= 0 AND FLOOR(value / 50) < 10 " +
        "GROUP BY 1, 2), " +
        "grid AS (SELECT ws.w_start, sp.b FROM ws, sp), " +
        "wc AS (SELECT grid.w_start, grid.b, COALESCE(wcnt.c, 0) + 1 " +
        "AS cw FROM grid LEFT JOIN wcnt USING (w_start, b)), " +
        "wtot AS (SELECT w_start, CAST(SUM(cw) AS DOUBLE) AS tw " +
        "FROM wc GROUP BY 1) " +
        "SELECT wc.w_start, CAST(SUM(cw - 1) AS BIGINT) AS n_in_domain, " +
        "ROUND(CAST(SUM(CAST((cw / tw - cb / tb) * " +
        "LN((cw / tw) / (cb / tb)) AS DECIMAL(20,12))) AS DOUBLE), 6) " +
        "AS psi FROM wc JOIN wtot USING (w_start) JOIN bs USING (b) " +
        "CROSS JOIN btot GROUP BY wc.w_start ORDER BY wc.w_start"),
    "stream_window_topn" ->
      (streamFoldedCte +
        ", g AS (SELECT (tu // 600000000) * 600000000 AS w_start_us, " +
        "event_type, COUNT(*) AS cnt FROM f GROUP BY 1, 2) " +
        "SELECT w_start_us, CAST(row_number() OVER (PARTITION BY " +
        "w_start_us ORDER BY cnt DESC, event_type) AS BIGINT) AS rk, " +
        "event_type, cnt FROM g QUALIFY rk <= 2 ORDER BY w_start_us, rk"),
    "stream_interval_join" ->
      (streamFoldedCte +
        "SELECT c.event_id AS click_id, p.event_id AS purchase_id, " +
        "c.user_id, c.tu AS click_ts, p.tu AS purchase_ts " +
        "FROM (SELECT * FROM f WHERE event_type = 'click') c " +
        "JOIN (SELECT * FROM f WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id AND p.tu >= c.tu " +
        "AND p.tu <= c.tu + 30000000 ORDER BY click_id, purchase_id"),
    "stream_window_join" ->
      (streamFoldedCte +
        "SELECT (c.tu // 60000000) * 60000000 AS w_start, c.user_id, " +
        "c.event_id AS click_id, p.event_id AS purchase_id " +
        "FROM (SELECT * FROM f WHERE event_type = 'click') c " +
        "JOIN (SELECT * FROM f WHERE event_type = 'purchase') p " +
        "ON c.user_id = p.user_id " +
        "AND c.tu // 60000000 = p.tu // 60000000 " +
        "ORDER BY click_id, purchase_id"),
    // contiguous CEP, definitionally as gaps-and-islands: a greedy
    // click→view+→purchase match is (LAST row of a click island, a
    // whole view island, FIRST row of the adjacent purchase island)
    // completing within the window — exactly the automaton's answer
    // for the distinct-symbol pattern class
    "cep_funnel" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "f.event_id AS first_id, f.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i f ON f.user_id = g.user_id AND f.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // One-only pattern with a NON-ADJACENT repeat: greedy leftmost +
    // SKIP PAST LAST ROW is definitionally "first window-valid
    // contiguous (view, click, view) triple, then the next with
    // start_rn > accepted_rn + 2" — replayed as a recursive CTE over
    // precomputed next-candidate pointers (next = MIN rn past the
    // accepted end; the chain from the first candidate IS the greedy
    // selection)
    "cep_revisit" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "c AS (SELECT a.user_id, a.rn, a.event_id AS sid, a.ts_us AS sts, " +
        "w.event_id AS eid, w.ts_us AS ets " +
        "FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + 1 " +
        "AND b.event_type = 'click' " +
        "JOIN r w ON w.user_id = a.user_id AND w.rn = a.rn + 2 " +
        "AND w.event_type = 'view' " +
        "WHERE a.event_type = 'view' AND w.ts_us - a.ts_us <= 86400000000), " +
        "nxt AS (SELECT c.*, (SELECT MIN(c2.rn) FROM c c2 " +
        "WHERE c2.user_id = c.user_id AND c2.rn > c.rn + 2) AS nrn FROM c), " +
        "f AS (SELECT user_id, MIN(rn) AS rn FROM c GROUP BY user_id), " +
        "sel AS (SELECT user_id, rn FROM f " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.rn = s.rn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, n.sts AS start_ts_us, " +
        "n.eid AS end_event_id, n.ets AS end_ts_us, " +
        "CAST(3 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id AND n.rn = s.rn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // optional-step CEP: candidates are direct click→purchase pairs OR
    // click→error→purchase triples (greedy consumes a present error;
    // the shapes are mutually exclusive per start row). Candidate
    // interiors are never clicks, so no candidate starts inside
    // another — SKIP PAST LAST ROW excludes nothing and the answer is
    // ALL window-valid candidates
    "cep_optional" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events) " +
        "SELECT a.user_id, a.event_id AS start_event_id, " +
        "a.ts_us AS start_ts_us, b.event_id AS end_event_id, " +
        "b.ts_us AS end_ts_us, CAST(2 AS BIGINT) AS n_rows " +
        "FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + 1 " +
        "AND b.event_type = 'purchase' " +
        "WHERE a.event_type = 'click' " +
        "AND b.ts_us - a.ts_us <= 43200000000 " +
        "UNION ALL " +
        "SELECT a.user_id, a.event_id, a.ts_us, w.event_id, w.ts_us, " +
        "CAST(3 AS BIGINT) " +
        "FROM r a JOIN r e ON e.user_id = a.user_id AND e.rn = a.rn + 1 " +
        "AND e.event_type = 'error' " +
        "JOIN r w ON w.user_id = a.user_id AND w.rn = a.rn + 2 " +
        "AND w.event_type = 'purchase' " +
        "WHERE a.event_type = 'click' " +
        "AND w.ts_us - a.ts_us <= 43200000000 " +
        "ORDER BY user_id, start_ts_us, start_event_id"),
    // alternation CEP: the funnel islands CTE over the CLASS column
    // (view/error collapse to one symbol class = the set step), 24h
    // window predicate; killed candidates don't interact (funnel
    // islands are disjoint)
    "cep_alternation" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "CASE WHEN event_type IN ('view','error') THEN '_ve' " +
        "ELSE event_type END AS cls, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, cls ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, cls, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.cls, g.srn, g.ern, g.n, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.cls = '_ve' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.cls = 'purchase' " +
        "WHERE c.cls = 'click' " +
        "AND p.first_ts - c.last_ts <= 86400000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // bounded-repeat CEP: the funnel islands CTE with the view-island
    // length BETWEEN the rep bounds (a longer run leaves a view the
    // purchase step can't match — no parse from that start at all)
    "cep_bounded" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' AND v.n BETWEEN 2 AND 3 " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // MEASURES over the funnel: the islands CTE carries each island's
    // value_c sum and boundary rows; a match expands to 3 step rows —
    // click = its island's LAST row, view = the whole island,
    // purchase = its island's FIRST row (definitionally the step
    // spans the greedy automaton assigns for this pattern)
    "cep_measures" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS sv, " +
        "CAST(MIN(vc) AS BIGINT) AS mnv, " +
        "CAST(MAX(vc) AS BIGINT) AS mxv FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, g.sv, " +
        "g.mnv, g.mxv, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, fi.vc AS first_vc, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.vc AS last_vc FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern), " +
        "m AS (SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.last_id AS c_id, c.last_vc AS c_vc, " +
        "CAST(v.n AS BIGINT) AS v_n, v.sv AS v_sv, " +
        "v.mnv AS v_mn, v.mxv AS v_mx, " +
        "v.first_id AS v_first, v.last_id AS v_last, " +
        "p.first_id AS p_id, p.first_vc AS p_vc " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000) " +
        "SELECT user_id, start_event_id, start_ts_us, end_event_id, " +
        "end_ts_us, n_rows, CAST(0 AS INTEGER) AS step, " +
        "'click' AS symbol, CAST(1 AS BIGINT) AS cnt, c_vc AS sum_value_c, " +
        "c_vc AS min_value_c, c_vc AS max_value_c, " +
        "c_id AS first_event_id, c_id AS last_event_id FROM m " +
        "UNION ALL SELECT user_id, start_event_id, start_ts_us, " +
        "end_event_id, end_ts_us, n_rows, CAST(1 AS INTEGER) AS step, " +
        "'view' AS symbol, v_n AS cnt, v_sv AS sum_value_c, " +
        "v_mn AS min_value_c, v_mx AS max_value_c, " +
        "v_first AS first_event_id, v_last AS last_event_id FROM m " +
        "UNION ALL SELECT user_id, start_event_id, start_ts_us, " +
        "end_event_id, end_ts_us, n_rows, CAST(2 AS INTEGER) AS step, " +
        "'purchase' AS symbol, CAST(1 AS BIGINT) AS cnt, " +
        "p_vc AS sum_value_c, p_vc AS min_value_c, p_vc AS max_value_c, " +
        "p_id AS first_event_id, p_id AS last_event_id FROM m " +
        "ORDER BY user_id, start_ts_us, start_event_id, step"),
    // the MEASURES SQL surface: the same islands pivot (m CTE) shaped
    // one row per match with the clause's aliases as columns
    "sql_mr_measures" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS sv, " +
        "CAST(MAX(vc) AS BIGINT) AS mxv FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "g.sv, g.mxv, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.last_id AS click_id, CAST(v.n AS BIGINT) AS views_cnt, " +
        "v.sv AS views_sum_c, v.mxv AS views_max_c, " +
        "p.first_id AS purchase_id " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // cross-variable DEFINE: the funnel islands CTE with the purchase
    // row's value compared against the FIRST view's and the click's
    // (the matched C row = the click island's LAST row)
    "cep_cross_define" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "fi.vc AS first_vc, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.vc AS last_vc " +
        "FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "AND p.first_vc > v.first_vc AND p.first_vc >= c.last_vc " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // MEASURES expression breadth: the funnel islands CTE computing
    // AVG (double), a SUM difference, and a COUNT sum per match
    "sql_mr_measures_ext" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS sv, " +
        "CAST(MAX(vc) AS BIGINT) AS mxv FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "g.sv, g.mxv, fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.vc AS last_vc " +
        "FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "CAST(v.sv AS DOUBLE) / v.n AS v_avg_c, " +
        "CAST(v.sv - c.last_vc AS BIGINT) AS vc_diff_c, " +
        "CAST(v.n + 1 AS BIGINT) AS vc_cnt, " +
        "CAST(v.sv AS DOUBLE) / v.n AS v_ratio_c, " +
        "CAST(v.mxv * v.n AS BIGINT) AS v_scaled_c, " +
        "CAST(v.sv AS DOUBLE) / 100 AS v_dollars, " +
        "CAST(v.sv + c.last_vc AS DOUBLE) / (v.n + 1) AS vc_per_row, " +
        "CAST(v.n * 2 + 1 AS BIGINT) AS v_cnt2 " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // SKIP TO FIRST click on view+ click view: per (view-island,
    // single-click island, view-island) adjacency, ONE match starting
    // at the leftmost window-valid view of the run (the automaton's
    // window-kill fallback) and ending at the next island's first view
    "cep_skip_first" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "cand AS (SELECT v.user_id, v.srn AS vsrn, v.ern AS vern, " +
        "w.srn AS wsrn FROM g v " +
        "JOIN g c ON c.user_id = v.user_id AND c.event_type = 'click' " +
        "AND c.n = 1 AND c.srn = v.ern + 1 " +
        "JOIN g w ON w.user_id = v.user_id AND w.event_type = 'view' " +
        "AND w.srn = c.srn + 1 " +
        "WHERE v.event_type = 'view'), " +
        "wrow AS (SELECT cand.*, rw.event_id AS end_event_id, " +
        "rw.ts_us AS end_ts FROM cand JOIN r rw " +
        "ON rw.user_id = cand.user_id AND rw.rn = cand.wsrn), " +
        "pick AS (SELECT w.user_id, w.vern, w.end_event_id, w.end_ts, " +
        "MIN(rv.rn) AS srn FROM wrow w JOIN r rv " +
        "ON rv.user_id = w.user_id AND rv.rn BETWEEN w.vsrn AND w.vern " +
        "WHERE w.end_ts - rv.ts_us <= 86400000000 " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT p.user_id, rs.event_id AS start_event_id, " +
        "rs.ts_us AS start_ts_us, p.end_event_id, p.end_ts AS end_ts_us, " +
        "CAST(p.vern - p.srn + 3 AS BIGINT) AS n_rows " +
        "FROM pick p JOIN r rs " +
        "ON rs.user_id = p.user_id AND rs.rn = p.srn " +
        "ORDER BY p.user_id, start_ts_us, start_event_id"),
    // lazy pairing oracle: per view island, the frame recursion — a
    // window-valid adjacent pair emits and pairing advances two rows,
    // a killed pair advances one (the machine's drop-to-next-start);
    // no bounding-row condition (reluctant completion is eager)
    "cep_reluctant" ->
      (        "WITH RECURSIVE r AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "v AS (SELECT user_id, isl, rn, event_id, ts_us FROM i " +
        "WHERE event_type = 'view'), " +
        "g AS (SELECT user_id, isl, MIN(rn) AS srn, MAX(rn) AS ern FROM v " +
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2), " +
        "st AS (SELECT g.user_id, g.isl, g.srn AS s, g.ern FROM g " +
        "UNION ALL SELECT s.user_id, s.isl, " +
        "CASE WHEN (SELECT v2.ts_us FROM v v2 WHERE v2.user_id = s.user_id AND v2.isl = s.isl AND v2.rn = s.s + 1) - (SELECT v1.ts_us FROM v v1 WHERE v1.user_id = s.user_id AND v1.isl = s.isl AND v1.rn = s.s) <= 21600000000 " +
        "THEN s.s + 2 ELSE s.s + 1 END AS s, s.ern " +
        "FROM st s WHERE s.s + 1 <= s.ern) " +
        "SELECT st.user_id, v1.event_id AS start_event_id, " +
        "v1.ts_us AS start_ts_us, v2.event_id AS end_event_id, " +
        "v2.ts_us AS end_ts_us, CAST(2 AS BIGINT) AS n_rows " +
        "FROM st JOIN v v1 ON v1.user_id = st.user_id AND v1.isl = st.isl " +
        "AND v1.rn = st.s " +
        "JOIN v v2 ON v2.user_id = st.user_id AND v2.isl = st.isl " +
        "AND v2.rn = st.s + 1 " +
        "WHERE st.s + 1 <= st.ern AND v2.ts_us - v1.ts_us <= 21600000000 " +
        "ORDER BY st.user_id, start_ts_us, start_event_id"),
    // the folded streaming twin, 5-minute window
    "stream_cep_reluctant" ->
      (        "WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 + 1704067200000000 AS tu, event_type FROM events), r AS (SELECT user_id, event_id, tu AS ts_us, event_type, row_number() OVER (PARTITION BY user_id ORDER BY tu, event_id) AS rn FROM f), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "v AS (SELECT user_id, isl, rn, event_id, ts_us FROM i " +
        "WHERE event_type = 'view'), " +
        "g AS (SELECT user_id, isl, MIN(rn) AS srn, MAX(rn) AS ern FROM v " +
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2), " +
        "st AS (SELECT g.user_id, g.isl, g.srn AS s, g.ern FROM g " +
        "UNION ALL SELECT s.user_id, s.isl, " +
        "CASE WHEN (SELECT v2.ts_us FROM v v2 WHERE v2.user_id = s.user_id AND v2.isl = s.isl AND v2.rn = s.s + 1) - (SELECT v1.ts_us FROM v v1 WHERE v1.user_id = s.user_id AND v1.isl = s.isl AND v1.rn = s.s) <= 300000000 " +
        "THEN s.s + 2 ELSE s.s + 1 END AS s, s.ern " +
        "FROM st s WHERE s.s + 1 <= s.ern) " +
        "SELECT st.user_id, v1.event_id AS start_event_id, " +
        "v1.ts_us AS start_ts_us, v2.event_id AS end_event_id, " +
        "v2.ts_us AS end_ts_us, CAST(2 AS BIGINT) AS n_rows " +
        "FROM st JOIN v v1 ON v1.user_id = st.user_id AND v1.isl = st.isl " +
        "AND v1.rn = st.s " +
        "JOIN v v2 ON v2.user_id = st.user_id AND v2.isl = st.isl " +
        "AND v2.rn = st.s + 1 " +
        "WHERE st.s + 1 <= st.ern AND v2.ts_us - v1.ts_us <= 300000000 " +
        "ORDER BY st.user_id, start_ts_us, start_event_id"),
    // V-pattern DEFINE oracle: direction islands (vc vs physical prev,
    // strict), descent/ascent adjacency pairs, then the floor
    // recursion — a V's natural STRT (the previous peak) may be
    // consumed by the preceding accepted match, pushing the start one
    // row into the descent (or killing single-row descents); pending
    // ascents at end-of-data RESOLVE at the batch end-of-input flush
    // (r13 — SQL finite-input semantics; the stream twin keeps the
    // pending exclusion). Window predicate present but above every V
    // span at gate scale (cep_backtrack oracles windowed chunking)
    "cep_vshape" -> vshapeOracleSql,
    // the SQL-surface gate answers with exactly the V-pattern's rows —
    // parse(sql) ≡ the programmatic form is additionally pinned
    // structurally in Round13bSpec
    "sql_match_recognize" -> vshapeOracleSql,
    // late-drop counter, definitionally: held-back rows = every 7th
    // event_id plus the 3 globally-latest (ts, id) rows; after batch 1
    // the watermark is (max batch-1 event-ms − 5000), and a held-back
    // row at or below it drops — the counter must equal that count
    // exactly (the 3 latest rows land above it: the admit path)
    "stream_late_obs" ->
      ("WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu FROM events), " +
        "rk AS (SELECT *, row_number() OVER " +
        "(ORDER BY tu DESC, event_id DESC) AS r FROM f), " +
        "b1 AS (SELECT MAX(tu) AS m FROM rk " +
        "WHERE event_id % 7 <> 0 AND r > 3) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS late_dropped FROM rk, b1 " +
        "WHERE (event_id % 7 = 0 OR r <= 3) " +
        "AND tu <= (CAST(FLOOR(m / 1000) AS BIGINT) - 5000) * 1000"),
    // the folded streaming twin, 1-hour window
    "stream_cep_vshape" ->
      (        "WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 + 1704067200000000 AS tu, value FROM events), r AS (SELECT user_id, event_id, tu AS ts_us, CAST(round(value * 100) AS BIGINT) AS vc, row_number() OVER (PARTITION BY user_id ORDER BY tu, event_id) AS rn FROM f), " +
        "d AS (SELECT *, CASE WHEN vc < lag(vc) OVER w THEN 'd' " +
        "WHEN vc > lag(vc) OVER w THEN 'u' " +
        "WHEN lag(vc) OVER w IS NULL THEN '0' ELSE 'f' END AS dir " +
        "FROM r WINDOW w AS (PARTITION BY user_id ORDER BY rn)), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, dir ORDER BY rn) AS isl FROM d), " +
        "g AS (SELECT user_id, dir, isl, MIN(rn) AS srn, MAX(rn) AS ern " +
        "FROM i GROUP BY 1, 2, 3), " +
        "mx AS (SELECT user_id, MAX(rn) AS maxrn FROM r GROUP BY 1), " +
        "pairs AS (SELECT dn.user_id, row_number() OVER " +
        "(PARTITION BY dn.user_id ORDER BY dn.srn) AS k, " +
        "dn.srn AS ds, dn.ern AS de, up.ern AS ue " +
        "FROM g dn JOIN g up ON up.user_id = dn.user_id AND up.dir = 'u' " +
        "AND up.srn = dn.ern + 1 WHERE dn.dir = 'd'), " +
        "sel AS (SELECT user_id, k, ds, de, ue, ds - 1 AS s, " +
        "CASE WHEN ds - 1 <= de - 1 THEN ue + 1 ELSE 1 END AS nf " +
        "FROM pairs WHERE k = 1 " +
        "UNION ALL SELECT p.user_id, p.k, p.ds, p.de, p.ue, " +
        "GREATEST(p.ds - 1, s.nf) AS s, " +
        "CASE WHEN GREATEST(p.ds - 1, s.nf) <= p.de - 1 THEN p.ue + 1 " +
        "ELSE s.nf END AS nf FROM sel s " +
        "JOIN pairs p ON p.user_id = s.user_id AND p.k = s.k + 1) " +
        "SELECT sel.user_id, rs.event_id AS start_event_id, " +
        "rs.ts_us AS start_ts_us, re.event_id AS end_event_id, " +
        "re.ts_us AS end_ts_us, CAST(sel.ue - sel.s + 1 AS BIGINT) AS n_rows " +
        "FROM sel JOIN mx ON mx.user_id = sel.user_id " +
        "JOIN r rs ON rs.user_id = sel.user_id AND rs.rn = sel.s " +
        "JOIN r re ON re.user_id = sel.user_id AND re.rn = sel.ue " +
        "WHERE sel.s <= sel.de - 1 AND sel.ue < mx.maxrn " +
        "AND re.ts_us - rs.ts_us <= 3600000000 " +
        "ORDER BY sel.user_id, start_ts_us, start_event_id"),
    // backtracking walk: per view island the greedy window-chunking
    // recursion — e(start) = last view within the window; chunks
    // resolve by a bounding row, a same-user row past the window, or
    // (r13) the batch end-of-input flush — EVERY chunk with >= 2 rows
    // emits (only the stream twin withholds unbroken final chunks)
    "cep_backtrack" ->
      (        "WITH RECURSIVE r AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "v AS (SELECT user_id, isl, rn, event_id, ts_us FROM i " +
        "WHERE event_type = 'view'), " +
        "g AS (SELECT user_id, isl, MIN(rn) AS srn, MAX(rn) AS ern, " +
        "COUNT(*) AS n FROM v GROUP BY 1, 2 HAVING COUNT(*) >= 2), " +
        "ve AS (SELECT v.*, g.ern AS iern, " +
        "(SELECT MAX(v2.rn) FROM v v2 WHERE v2.user_id = v.user_id " +
        "AND v2.isl = v.isl AND v2.rn > v.rn " +
        "AND v2.ts_us <= v.ts_us + 86400000000) AS e " +
        "FROM v JOIN g ON g.user_id = v.user_id AND g.isl = v.isl), " +
        "sel AS (SELECT user_id, isl, srn AS strt, ern FROM g " +
        "UNION ALL SELECT s.user_id, s.isl, " +
        "(SELECT CASE WHEN ve.e IS NOT NULL THEN ve.e + 1 ELSE ve.rn + 1 END " +
        "FROM ve WHERE ve.user_id = s.user_id AND ve.isl = s.isl " +
        "AND ve.rn = s.strt) AS strt, s.ern FROM sel s " +
        "WHERE (SELECT CASE WHEN ve.e IS NOT NULL THEN ve.e + 1 " +
        "ELSE ve.rn + 1 END FROM ve WHERE ve.user_id = s.user_id " +
        "AND ve.isl = s.isl AND ve.rn = s.strt) < s.ern) " +
        "SELECT ve.user_id, ve.event_id AS start_event_id, " +
        "ve.ts_us AS start_ts_us, we.event_id AS end_event_id, " +
        "we.ts_us AS end_ts_us, CAST(ve.e - ve.rn + 1 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN ve ON ve.user_id = s.user_id AND ve.isl = s.isl " +
        "AND ve.rn = s.strt " +
        "JOIN v we ON we.user_id = s.user_id AND we.isl = s.isl " +
        "AND we.rn = ve.e " +
        "WHERE ve.e IS NOT NULL " +
        "ORDER BY ve.user_id, start_ts_us, start_event_id"),
    // the streaming twin on the folded corpus, 3-minute window
    "stream_cep_backtrack" ->
      (        "WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 + 1704067200000000 AS tu, event_type FROM events), r AS (SELECT user_id, event_id, tu AS ts_us, event_type, row_number() OVER (PARTITION BY user_id ORDER BY tu, event_id) AS rn FROM f), " +
        "mx AS (SELECT user_id, MAX(rn) AS maxrn FROM r GROUP BY 1), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "v AS (SELECT user_id, isl, rn, event_id, ts_us FROM i " +
        "WHERE event_type = 'view'), " +
        "g0 AS (SELECT user_id, isl, MIN(rn) AS srn, MAX(rn) AS ern, " +
        "COUNT(*) AS n FROM v GROUP BY 1, 2 HAVING COUNT(*) >= 2), " +
        "g AS (SELECT g0.*, CASE WHEN mx.maxrn > g0.ern THEN 1 ELSE 0 END " +
        "AS broken FROM g0 JOIN mx ON mx.user_id = g0.user_id), " +
        "ve AS (SELECT v.*, g.ern AS iern, g.broken, " +
        "(SELECT MAX(v2.rn) FROM v v2 WHERE v2.user_id = v.user_id " +
        "AND v2.isl = v.isl AND v2.rn > v.rn " +
        "AND v2.ts_us <= v.ts_us + 180000000) AS e " +
        "FROM v JOIN g ON g.user_id = v.user_id AND g.isl = v.isl), " +
        "sel AS (SELECT user_id, isl, srn AS strt, ern FROM g " +
        "UNION ALL SELECT s.user_id, s.isl, " +
        "(SELECT CASE WHEN ve.e IS NOT NULL THEN ve.e + 1 ELSE ve.rn + 1 END " +
        "FROM ve WHERE ve.user_id = s.user_id AND ve.isl = s.isl " +
        "AND ve.rn = s.strt) AS strt, s.ern FROM sel s " +
        "WHERE (SELECT CASE WHEN ve.e IS NOT NULL THEN ve.e + 1 " +
        "ELSE ve.rn + 1 END FROM ve WHERE ve.user_id = s.user_id " +
        "AND ve.isl = s.isl AND ve.rn = s.strt) < s.ern) " +
        "SELECT ve.user_id, ve.event_id AS start_event_id, " +
        "ve.ts_us AS start_ts_us, we.event_id AS end_event_id, " +
        "we.ts_us AS end_ts_us, CAST(ve.e - ve.rn + 1 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN ve ON ve.user_id = s.user_id AND ve.isl = s.isl " +
        "AND ve.rn = s.strt " +
        "JOIN v we ON we.user_id = s.user_id AND we.isl = s.isl " +
        "AND we.rn = ve.e " +
        "WHERE ve.e IS NOT NULL AND (ve.e < ve.iern OR ve.broken = 1) " +
        "ORDER BY ve.user_id, start_ts_us, start_event_id"),
    // relaxed contiguity: candidates = per click, the EARLIEST view
    // after it then the EARLIEST purchase after that (subsequence,
    // rows between steps skipped), window-valid; greedy SKIP PAST LAST
    // selection via the recursive next-candidate walk (crn > prev prn)
    "cep_followed_by" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "cand AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM r c " +
        "JOIN r v ON v.user_id = c.user_id AND v.event_type = 'view' " +
        "AND v.rn = (SELECT MIN(v2.rn) FROM r v2 " +
        "WHERE v2.user_id = c.user_id AND v2.event_type = 'view' " +
        "AND v2.rn > c.rn) " +
        "JOIN r p ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = c.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > v.rn) " +
        "WHERE c.event_type = 'click' " +
        "AND p.ts_us - c.ts_us <= 43200000000), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(3 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // the streaming twin: same definitional candidates + greedy
    // selection over the day-folded corpus, 5-minute window
    "stream_cep_followed" ->
      ("WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) " +
        "AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type, value FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "cand AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM r c " +
        "JOIN r v ON v.user_id = c.user_id AND v.event_type = 'view' " +
        "AND v.rn = (SELECT MIN(v2.rn) FROM r v2 " +
        "WHERE v2.user_id = c.user_id AND v2.event_type = 'view' " +
        "AND v2.rn > c.rn) " +
        "JOIN r p ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = c.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > v.rn) " +
        "WHERE c.event_type = 'click' " +
        "AND p.ts_us - c.ts_us <= 300000000), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(3 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // trailing absence (abandoned cart): every click with NO purchase
    // after it (row order) inside the 12h horizon — single-row matches
    // make SKIP PAST LAST evaluate each click independently, so the
    // oracle is a plain NOT EXISTS, no greedy recursion
    "cep_not_followed" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events) " +
        "SELECT c.user_id, c.event_id AS start_event_id, " +
        "c.ts_us AS start_ts_us, c.event_id AS end_event_id, " +
        "c.ts_us AS end_ts_us, CAST(1 AS BIGINT) AS n_rows " +
        "FROM r c WHERE c.event_type = 'click' AND NOT EXISTS (" +
        "SELECT 1 FROM r p WHERE p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND p.rn > c.rn " +
        "AND p.ts_us <= c.ts_us + 43200000000) " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // the streaming twin: same definitional absence on the day-folded
    // corpus, 10-minute horizon (emission rides event-time timers)
    "stream_cep_not_followed" ->
      ("WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
        "CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f) " +
        "SELECT c.user_id, c.event_id AS start_event_id, " +
        "c.ts_us AS start_ts_us, c.event_id AS end_event_id, " +
        "c.ts_us AS end_ts_us, CAST(1 AS BIGINT) AS n_rows " +
        "FROM r c WHERE c.event_type = 'click' AND NOT EXISTS (" +
        "SELECT 1 FROM r p WHERE p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND p.rn > c.rn " +
        "AND p.ts_us <= c.ts_us + 600000000) " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // middle absence: the cep_followed_by earliest-candidate CTE plus
    // a NOT EXISTS gap clause (an error between the click and its
    // earliest purchase kills the start), same recursive greedy
    // SKIP PAST LAST selection
    "cep_not_between" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "cand AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM r c JOIN r p ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = c.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > c.rn AND p2.ts_us <= c.ts_us + 43200000000) " +
        "WHERE c.event_type = 'click' " +
        "AND NOT EXISTS (SELECT 1 FROM r e WHERE e.user_id = c.user_id " +
        "AND e.event_type = 'error' AND e.rn > c.rn AND e.rn < p.rn " +
        "AND e.ts_us <= c.ts_us + 43200000000)), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // strict notNext: adjacent click-purchase pairs whose next row is
    // not an in-horizon error — pass when no next row exists (end-of-
    // data flush) or the next row lands past the 24h horizon
    "cep_not_next" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events) " +
        "SELECT c.user_id, c.event_id AS start_event_id, " +
        "c.ts_us AS start_ts_us, p.event_id AS end_event_id, " +
        "p.ts_us AS end_ts_us, CAST(2 AS BIGINT) AS n_rows " +
        "FROM r c JOIN r p ON p.user_id = c.user_id AND p.rn = c.rn + 1 " +
        "AND p.event_type = 'purchase' " +
        "LEFT JOIN r x ON x.user_id = c.user_id AND x.rn = c.rn + 2 " +
        "WHERE c.event_type = 'click' " +
        "AND p.ts_us - c.ts_us <= 86400000000 " +
        "AND (x.rn IS NULL OR x.ts_us > c.ts_us + 86400000000 " +
        "OR x.event_type <> 'error') " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // looping relaxed states: per candidate click the MAXIMAL view
    // prefix (subsequence, horizon-bounded) that still leaves a
    // completing purchase after it; end = earliest purchase after the
    // last consumed view; recursive greedy SKIP PAST LAST selection
    "cep_followed_plus" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "base AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, " +
        "(SELECT MAX(p.rn) FROM r p WHERE p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND p.ts_us <= c.ts_us + 172800000000 " +
        "AND p.rn > (SELECT MIN(v.rn) FROM r v " +
        "WHERE v.user_id = c.user_id AND v.event_type = 'view' " +
        "AND v.rn > c.rn AND v.ts_us <= c.ts_us + 172800000000)) " +
        "AS lastp FROM r c WHERE c.event_type = 'click'), " +
        "kv AS (SELECT b.*, " +
        "(SELECT MAX(v.rn) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 172800000000) AS lastv, " +
        "(SELECT COUNT(*) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 172800000000) AS k " +
        "FROM base b WHERE b.lastp IS NOT NULL), " +
        "cand AS (SELECT kv.user_id, kv.crn, kv.sid, kv.sts, kv.k, " +
        "p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM kv JOIN r p ON p.user_id = kv.user_id " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = kv.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > kv.lastv) WHERE kv.k >= 1), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(n.k + 2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // relaxed cross-variable DEFINE: the followed-plus recursive CTE
    // with the purchase universe restricted to QUALIFYING rows (vc >
    // the first in-horizon view's vc) — greedy take = all in-horizon
    // views before the LAST qualifying purchase, end = earliest
    // qualifying purchase after the take, recursive SKIP PAST LAST
    "cep_cross_followed" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "base AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, " +
        "(SELECT MIN(v.rn) FROM r v WHERE v.user_id = c.user_id " +
        "AND v.event_type = 'view' AND v.rn > c.rn " +
        "AND v.ts_us <= c.ts_us + 172800000000) AS fvrn " +
        "FROM r c WHERE c.event_type = 'click'), " +
        "fb AS (SELECT b.*, (SELECT fv.vc FROM r fv " +
        "WHERE fv.user_id = b.user_id AND fv.rn = b.fvrn) AS fvc " +
        "FROM base b WHERE b.fvrn IS NOT NULL), " +
        "lp AS (SELECT b.*, (SELECT MAX(p.rn) FROM r p " +
        "WHERE p.user_id = b.user_id AND p.event_type = 'purchase' " +
        "AND p.ts_us <= b.sts + 172800000000 AND p.rn > b.fvrn " +
        "AND p.vc > b.fvc) AS lastp FROM fb b), " +
        "kv AS (SELECT b.*, " +
        "(SELECT MAX(v.rn) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 172800000000) AS lastv, " +
        "(SELECT COUNT(*) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 172800000000) AS k " +
        "FROM lp b WHERE b.lastp IS NOT NULL), " +
        "cand AS (SELECT kv.user_id, kv.crn, kv.sid, kv.sts, kv.k, " +
        "p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM kv JOIN r p ON p.user_id = kv.user_id " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = kv.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > kv.lastv AND p2.vc > kv.fvc " +
        "AND p2.ts_us <= kv.sts + 172800000000) WHERE kv.k >= 1), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(n.k + 2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // the relaxed cross twin on the folded corpus, 10-minute horizon:
    // the cep_cross_followed qualifying-purchase recursive CTE
    "stream_cep_cross_followed" ->
      ("WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) " +
        "AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type, value FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "base AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, " +
        "(SELECT MIN(v.rn) FROM r v WHERE v.user_id = c.user_id " +
        "AND v.event_type = 'view' AND v.rn > c.rn " +
        "AND v.ts_us <= c.ts_us + 600000000) AS fvrn " +
        "FROM r c WHERE c.event_type = 'click'), " +
        "fb AS (SELECT b.*, (SELECT fv.vc FROM r fv " +
        "WHERE fv.user_id = b.user_id AND fv.rn = b.fvrn) AS fvc " +
        "FROM base b WHERE b.fvrn IS NOT NULL), " +
        "lp AS (SELECT b.*, (SELECT MAX(p.rn) FROM r p " +
        "WHERE p.user_id = b.user_id AND p.event_type = 'purchase' " +
        "AND p.ts_us <= b.sts + 600000000 AND p.rn > b.fvrn " +
        "AND p.vc > b.fvc) AS lastp FROM fb b), " +
        "kv AS (SELECT b.*, " +
        "(SELECT MAX(v.rn) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 600000000) AS lastv, " +
        "(SELECT COUNT(*) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 600000000) AS k " +
        "FROM lp b WHERE b.lastp IS NOT NULL), " +
        "cand AS (SELECT kv.user_id, kv.crn, kv.sid, kv.sts, kv.k, " +
        "p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM kv JOIN r p ON p.user_id = kv.user_id " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = kv.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > kv.lastv AND p2.vc > kv.fvc " +
        "AND p2.ts_us <= kv.sts + 600000000) WHERE kv.k >= 1), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(n.k + 2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // the streaming twin on the folded corpus, 10-minute horizon
    "stream_cep_followed_plus" ->
      ("WITH RECURSIVE f AS (SELECT CAST(event_id AS BIGINT) " +
        "AS event_id, CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "base AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, " +
        "(SELECT MAX(p.rn) FROM r p WHERE p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' " +
        "AND p.ts_us <= c.ts_us + 600000000 " +
        "AND p.rn > (SELECT MIN(v.rn) FROM r v " +
        "WHERE v.user_id = c.user_id AND v.event_type = 'view' " +
        "AND v.rn > c.rn AND v.ts_us <= c.ts_us + 600000000)) " +
        "AS lastp FROM r c WHERE c.event_type = 'click'), " +
        "kv AS (SELECT b.*, " +
        "(SELECT MAX(v.rn) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 600000000) AS lastv, " +
        "(SELECT COUNT(*) FROM r v WHERE v.user_id = b.user_id " +
        "AND v.event_type = 'view' AND v.rn > b.crn AND v.rn < b.lastp " +
        "AND v.ts_us <= b.sts + 600000000) AS k " +
        "FROM base b WHERE b.lastp IS NOT NULL), " +
        "cand AS (SELECT kv.user_id, kv.crn, kv.sid, kv.sts, kv.k, " +
        "p.rn AS prn, p.event_id AS eid, p.ts_us AS ets " +
        "FROM kv JOIN r p ON p.user_id = kv.user_id " +
        "AND p.rn = (SELECT MIN(p2.rn) FROM r p2 " +
        "WHERE p2.user_id = kv.user_id AND p2.event_type = 'purchase' " +
        "AND p2.rn > kv.lastv) WHERE kv.k >= 1), " +
        "nxt AS (SELECT cand.*, (SELECT MIN(c2.crn) FROM cand c2 " +
        "WHERE c2.user_id = cand.user_id AND c2.crn > cand.prn) AS nrn " +
        "FROM cand), " +
        "fs AS (SELECT user_id, MIN(crn) AS crn FROM cand " +
        "GROUP BY user_id), " +
        "sel AS (SELECT user_id, crn FROM fs " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.crn = s.crn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, " +
        "n.sts AS start_ts_us, n.eid AS end_event_id, " +
        "n.ets AS end_ts_us, CAST(n.k + 2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id " +
        "AND n.crn = s.crn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // running-aggregate DEFINE: contiguous purchase runs after each
    // click, take = the maximal prefix under BOTH the running-sum cap
    // (15000 cents, per-row evaluation) and the 12h window; candidates
    // are independent (interiors are purchases, starts are clicks)
    "cep_define_agg" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value*100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "runs AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, p.rn AS prn, " +
        "SUM(p.vc) OVER (PARTITION BY c.user_id, c.rn " +
        "ORDER BY p.rn) AS rsum, " +
        "row_number() OVER (PARTITION BY c.user_id, c.rn " +
        "ORDER BY p.rn) AS k, p.ts_us - c.ts_us AS span " +
        "FROM r c JOIN r p ON p.user_id = c.user_id AND p.rn > c.rn " +
        "AND p.event_type = 'purchase' " +
        "AND NOT EXISTS (SELECT 1 FROM r m WHERE m.user_id = c.user_id " +
        "AND m.rn > c.rn AND m.rn < p.rn " +
        "AND m.event_type <> 'purchase') " +
        "WHERE c.event_type = 'click'), " +
        "take AS (SELECT user_id, crn, sid, sts, MAX(k) AS tk " +
        "FROM runs WHERE rsum <= 15000 AND k = prn - crn " +
        "AND span <= 43200000000 GROUP BY 1, 2, 3, 4) " +
        "SELECT t.user_id, t.sid AS start_event_id, " +
        "t.sts AS start_ts_us, p.event_id AS end_event_id, " +
        "p.ts_us AS end_ts_us, CAST(t.tk + 1 AS BIGINT) AS n_rows " +
        "FROM take t JOIN r p ON p.user_id = t.user_id " +
        "AND p.rn = t.crn + t.tk " +
        "ORDER BY t.user_id, start_ts_us, start_event_id"),
    // PREV(value, 2) over a trailing quantified run: per click-view
    // anchor the maximal contiguous run of views whose value exceeds
    // lag(value, 2), trimmed to the longest window-valid prefix
    "cep_prev2" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value*100) AS BIGINT) AS vc, " +
        "lag(CAST(round(value*100) AS BIGINT), 2) OVER " +
        "(PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS vprev2, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "sat AS (SELECT c.user_id, c.rn AS crn, c.event_id AS sid, " +
        "c.ts_us AS sts, v.rn AS vrn, v.ts_us AS vts, " +
        "row_number() OVER (PARTITION BY c.user_id, c.rn " +
        "ORDER BY v.rn) AS t " +
        "FROM r c JOIN r v ON v.user_id = c.user_id AND v.rn > c.rn + 1 " +
        "AND v.event_type = 'view' AND v.vc > v.vprev2 " +
        "AND NOT EXISTS (SELECT 1 FROM r m WHERE m.user_id = c.user_id " +
        "AND m.rn > c.rn + 1 AND m.rn < v.rn " +
        "AND NOT (m.event_type = 'view' AND m.vc > m.vprev2)) " +
        "WHERE c.event_type = 'click' " +
        "AND EXISTS (SELECT 1 FROM r b WHERE b.user_id = c.user_id " +
        "AND b.rn = c.rn + 1 AND b.event_type = 'view')), " +
        "sel AS (SELECT user_id, crn, sid, sts, MAX(t) AS tk " +
        "FROM sat WHERE t = vrn - crn - 1 AND vts - sts <= 86400000000 " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT s.user_id, s.sid AS start_event_id, " +
        "s.sts AS start_ts_us, e.event_id AS end_event_id, " +
        "e.ts_us AS end_ts_us, CAST(s.tk + 2 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN r e ON e.user_id = s.user_id " +
        "AND e.rn = s.crn + 1 + s.tk " +
        "ORDER BY s.user_id, start_ts_us, start_event_id"),
    // group quantifiers: per purchase, the maximal alternating
    // A(click|view) B(signup|error) chain ending right before it —
    // leftmost A = (parity-partitioned running MAX of alternation
    // breaks) + 2; a window-killed leftmost start shifts at stride 2
    // to the longest window-valid suffix (MIN over same-parity chain
    // positions inside the horizon). Chains contain no purchases, so
    // matches never overlap and SKIP PAST LAST excludes nothing.
    "cep_group" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CASE WHEN event_type IN ('click','view') THEN 'A' " +
        "WHEN event_type IN ('signup','error') THEN 'B' " +
        "ELSE 'P' END AS cls, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "a AS (SELECT r.*, CASE WHEN cls = 'A' " +
        "AND lead(cls) OVER (PARTITION BY user_id ORDER BY rn) = 'B' " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.cls = 'P' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 86400000000) AS srn FROM m0) " +
        "SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS n_rows " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL " +
        "ORDER BY m.user_id, start_ts_us, start_event_id"),
    // the streaming twin on the folded corpus, 10-minute window
    "stream_cep_group" ->
      ("WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
        "CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, " +
        "CASE WHEN event_type IN ('click','view') THEN 'A' " +
        "WHEN event_type IN ('signup','error') THEN 'B' " +
        "ELSE 'P' END AS cls, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "a AS (SELECT r.*, CASE WHEN cls = 'A' " +
        "AND lead(cls) OVER (PARTITION BY user_id ORDER BY rn) = 'B' " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.cls = 'P' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 600000000) AS srn FROM m0) " +
        "SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS n_rows " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL " +
        "ORDER BY m.user_id, start_ts_us, start_event_id"),
    // sequence alternation: the cep_group parity-chain oracle with the
    // pair predicate widened to EITHER-ORDER adjacent click/view pairs
    // (a valid pair is any adjacent distinct pair over {click, view} —
    // whichever alternation arm matched it); 7d window above every
    // span at gate scale (cep_group oracles the window mechanics)
    "cep_alt_group" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "a AS (SELECT r.*, CASE WHEN event_type IN ('click','view') " +
        "AND lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) " +
        "IN ('click','view') " +
        "AND event_type <> lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY rn) " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.event_type = 'purchase' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 604800000000) AS srn FROM m0) " +
        "SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS n_rows " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL " +
        "ORDER BY m.user_id, start_ts_us, start_event_id"),
    // grouped cross-variable DEFINE: the cep_group parity-chain oracle
    // with the value conjunct added to the start-selection MIN — the
    // candidate start is both the window's and the predicate's subject
    // (FIRST(A) = the start row), so the closed form extends directly
    "cep_cross_group" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "CASE WHEN event_type IN ('click','view') THEN 'A' " +
        "WHEN event_type IN ('signup','error') THEN 'B' " +
        "ELSE 'P' END AS cls, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "a AS (SELECT r.*, CASE WHEN cls = 'A' " +
        "AND lead(cls) OVER (PARTITION BY user_id ORDER BY rn) = 'B' " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, p.vc AS pvc, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.cls = 'P' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 86400000000 " +
        "AND m0.pvc > j.vc) AS srn FROM m0) " +
        "SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS n_rows " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL " +
        "ORDER BY m.user_id, start_ts_us, start_event_id"),
    // the streaming twin on the folded corpus, 10-minute window
    "stream_cep_cross_group" ->
      ("WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
        "CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, event_type, vc, " +
        "CASE WHEN event_type IN ('click','view') THEN 'A' " +
        "WHEN event_type IN ('signup','error') THEN 'B' " +
        "ELSE 'P' END AS cls, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "a AS (SELECT r.*, CASE WHEN cls = 'A' " +
        "AND lead(cls) OVER (PARTITION BY user_id ORDER BY rn) = 'B' " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, p.vc AS pvc, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.cls = 'P' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 600000000 " +
        "AND m0.pvc > j.vc) AS srn FROM m0) " +
        "SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS n_rows " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL " +
        "ORDER BY m.user_id, start_ts_us, start_event_id"),
    // field breadth: the funnel islands CTE over RE-TYPED rows (a
    // view with k < 20 breaks contiguity) with per-island aggregates
    // of the second column and the purchase's field-vs-field conjunct
    "sql_mr_fields" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, value, " +
        "CAST(json_extract(props,'$.k') AS BIGINT) AS k, " +
        "CASE WHEN event_type = 'view' AND " +
        "CAST(json_extract(props,'$.k') AS BIGINT) < 20 THEN 'viewbad' " +
        "ELSE event_type END AS t2, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, t2 ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, t2, isl, MIN(rn) AS srn, MAX(rn) AS ern, " +
        "COUNT(*) AS n, SUM(k) AS sk, MAX(k) AS mk, " +
        "SUM(vc) AS svc FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.*, fi.event_id AS first_id, " +
        "fi.ts_us AS first_ts, fi.k AS first_k, " +
        "fi.value AS first_value, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.k AS last_k " +
        "FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.last_id AS click_id, CAST(v.n AS BIGINT) AS views_cnt, " +
        "CAST(v.sk AS BIGINT) AS views_k_sum, " +
        "CAST(v.mk AS BIGINT) AS views_k_max, " +
        "CAST(v.sk AS DOUBLE) / v.n AS views_k_avg, " +
        "CAST(v.last_k AS BIGINT) AS views_k_last, " +
        "CAST(v.svc AS BIGINT) AS views_sum_c " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.t2 = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.t2 = 'purchase' " +
        "WHERE c.t2 = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "AND p.first_k > p.first_value " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // the streaming twin: the same re-typed funnel islands on the
    // FOLDED corpus (user % 16, day-folded instants) with the stream
    // tier's 10-minute window
    "stream_sql_mr_fields" ->
      ("WITH f AS (SELECT CAST(event_id AS BIGINT) AS event_id, " +
        "CAST(user_id % 16 AS BIGINT) AS user_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 " +
        "+ 1704067200000000 AS tu, event_type, value, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "CAST(json_extract(props,'$.k') AS BIGINT) AS k FROM events), " +
        "r AS (SELECT user_id, event_id, tu AS ts_us, vc, value, k, " +
        "CASE WHEN event_type = 'view' AND k < 20 THEN 'viewbad' " +
        "ELSE event_type END AS t2, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, t2 ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, t2, isl, MIN(rn) AS srn, MAX(rn) AS ern, " +
        "COUNT(*) AS n, SUM(k) AS sk, MAX(k) AS mk, " +
        "SUM(vc) AS svc FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.*, fi.event_id AS first_id, " +
        "fi.ts_us AS first_ts, fi.k AS first_k, " +
        "fi.value AS first_value, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.k AS last_k " +
        "FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.last_id AS click_id, CAST(v.n AS BIGINT) AS views_cnt, " +
        "CAST(v.sk AS BIGINT) AS views_k_sum, " +
        "CAST(v.mk AS BIGINT) AS views_k_max, " +
        "CAST(v.sk AS DOUBLE) / v.n AS views_k_avg, " +
        "CAST(v.last_k AS BIGINT) AS views_k_last, " +
        "CAST(v.svc AS BIGINT) AS views_sum_c " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.t2 = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.t2 = 'purchase' " +
        "WHERE c.t2 = 'click' " +
        "AND p.first_ts - c.last_ts <= 600000000 " +
        "AND p.first_k > p.first_value " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // PERMUTE: window-valid contiguous distinct-type triples under
    // greedy leftmost non-overlap — the cep_revisit recursive
    // skip-selection with the type predicate widened to set-equality
    "cep_permute" ->
      ("WITH RECURSIVE r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "c AS (SELECT a.user_id, a.rn, a.event_id AS sid, " +
        "a.ts_us AS sts, w.event_id AS eid, w.ts_us AS ets " +
        "FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + 1 " +
        "JOIN r w ON w.user_id = a.user_id AND w.rn = a.rn + 2 " +
        "WHERE a.event_type IN ('click','view','signup') " +
        "AND b.event_type IN ('click','view','signup') " +
        "AND w.event_type IN ('click','view','signup') " +
        "AND a.event_type <> b.event_type " +
        "AND a.event_type <> w.event_type " +
        "AND b.event_type <> w.event_type " +
        "AND w.ts_us - a.ts_us <= 86400000000), " +
        "nxt AS (SELECT c.*, (SELECT MIN(c2.rn) FROM c c2 " +
        "WHERE c2.user_id = c.user_id AND c2.rn > c.rn + 2) AS nrn " +
        "FROM c), " +
        "f AS (SELECT user_id, MIN(rn) AS rn FROM c GROUP BY user_id), " +
        "sel AS (SELECT user_id, rn FROM f " +
        "UNION ALL SELECT n.user_id, n.nrn FROM sel s " +
        "JOIN nxt n ON n.user_id = s.user_id AND n.rn = s.rn " +
        "WHERE n.nrn IS NOT NULL) " +
        "SELECT n.user_id, n.sid AS start_event_id, n.sts AS " +
        "start_ts_us, n.eid AS end_event_id, n.ets AS end_ts_us, " +
        "CAST(3 AS BIGINT) AS n_rows " +
        "FROM sel s JOIN nxt n ON n.user_id = s.user_id AND n.rn = s.rn " +
        "ORDER BY n.user_id, start_ts_us, start_event_id"),
    // MEASURES over the group quantifier: the cep_group parity-chain
    // matches joined back to their dense rn spans — A rows are the
    // start-parity positions, B rows the off-parity ones, the purchase
    // the last — aggregated per class (arg_min/arg_max give FIRST/LAST)
    "cep_group_measures" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "CASE WHEN event_type IN ('click','view') THEN 'A' " +
        "WHEN event_type IN ('signup','error') THEN 'B' " +
        "ELSE 'P' END AS cls, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "a AS (SELECT r.*, CASE WHEN cls = 'A' " +
        "AND lead(cls) OVER (PARTITION BY user_id ORDER BY rn) = 'B' " +
        "THEN 1 ELSE 0 END AS alt FROM r), " +
        "lb AS (SELECT a.*, MAX(CASE WHEN alt = 0 THEN rn END) OVER " +
        "(PARTITION BY user_id, rn % 2 ORDER BY rn " +
        "ROWS UNBOUNDED PRECEDING) AS lastbad FROM a), " +
        "m0 AS (SELECT p.user_id, p.rn AS prn, p.event_id AS eid, " +
        "p.ts_us AS ets, COALESCE(lb2.lastbad + 2, " +
        "CASE WHEN p.rn % 2 = 0 THEN 2 ELSE 1 END) AS srn0 " +
        "FROM lb p JOIN lb lb2 ON lb2.user_id = p.user_id " +
        "AND lb2.rn = p.rn - 2 " +
        "WHERE p.cls = 'P' AND lb2.alt = 1), " +
        "m AS (SELECT m0.*, (SELECT MIN(j.rn) FROM r j " +
        "WHERE j.user_id = m0.user_id AND j.rn >= m0.srn0 " +
        "AND j.rn <= m0.prn - 2 AND (j.rn - m0.prn) % 2 = 0 " +
        "AND j.ts_us >= m0.ets - 86400000000) AS srn FROM m0), " +
        "mm AS (SELECT m.user_id, s.event_id AS start_event_id, " +
        "s.ts_us AS start_ts_us, m.eid AS end_event_id, " +
        "m.ets AS end_ts_us, CAST(m.prn - m.srn + 1 AS BIGINT) AS " +
        "n_rows, m.srn, m.prn " +
        "FROM m JOIN r s ON s.user_id = m.user_id AND s.rn = m.srn " +
        "WHERE m.srn IS NOT NULL), " +
        "x AS (SELECT mm.*, j.rn, j.event_id AS jid, j.vc, " +
        "CASE WHEN j.rn = mm.prn THEN 2 " +
        "WHEN (j.rn - mm.srn) % 2 = 0 THEN 0 ELSE 1 END AS stp " +
        "FROM mm JOIN r j ON j.user_id = mm.user_id " +
        "AND j.rn >= mm.srn AND j.rn <= mm.prn) " +
        "SELECT user_id, start_event_id, start_ts_us, end_event_id, " +
        "end_ts_us, n_rows, CAST(stp AS INTEGER) AS step, " +
        "CASE stp WHEN 0 THEN 'click' WHEN 1 THEN 'signup' " +
        "ELSE 'purchase' END AS symbol, " +
        "COUNT(*) AS cnt, CAST(SUM(vc) AS BIGINT) AS sum_value_c, " +
        "MIN(vc) AS min_value_c, MAX(vc) AS max_value_c, " +
        "arg_min(jid, rn) AS first_event_id, " +
        "arg_max(jid, rn) AS last_event_id " +
        "FROM x GROUP BY 1, 2, 3, 4, 5, 6, 7, 8 " +
        "ORDER BY user_id, start_ts_us, start_event_id, step"),
    // ALL ROWS PER MATCH: the funnel islands matches joined back to
    // the rows on their dense rn span (click = its island's last row,
    // views = the whole island, purchase = the next island's first)
    "sql_mr_all_rows" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "f.event_id AS first_id, f.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i f ON f.user_id = g.user_id AND f.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern), " +
        "m AS (SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.ern AS crn, p.srn AS prn " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000) " +
        "SELECT m.user_id, m.start_event_id, m.start_ts_us, " +
        "m.end_event_id, m.end_ts_us, m.n_rows, " +
        "x.event_id, x.ts_us, x.event_type, x.vc AS value_c, " +
        "CAST(CASE WHEN x.rn = m.crn THEN 0 WHEN x.rn = m.prn THEN 2 " +
        "ELSE 1 END AS INTEGER) AS step, " +
        "CASE WHEN x.rn = m.crn THEN 'C' WHEN x.rn = m.prn THEN 'P' " +
        "ELSE 'V' END AS classifier " +
        "FROM m JOIN i x ON x.user_id = m.user_id " +
        "AND x.rn >= m.crn AND x.rn <= m.prn " +
        "ORDER BY m.user_id, m.start_ts_us, m.start_event_id, " +
        "x.ts_us, x.event_id"),
    // SUBSET union measures: the sql_mr_measures islands CTE with the
    // purchase row's value joined in (U = (V, P) pools views+purchase)
    // and a per-key row_number for MATCH_NUMBER()
    "sql_mr_subset" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS sv, " +
        "CAST(MAX(vc) AS BIGINT) AS mxv FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "g.sv, g.mxv, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "fi.vc AS first_vc, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern), " +
        "m AS (SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "CAST(v.n + 1 AS BIGINT) AS u_cnt, " +
        "CAST(v.sv + p.first_vc AS BIGINT) AS u_sum_c, " +
        "v.first_id AS u_first_id, p.first_id AS u_last_id, " +
        "v.mxv AS views_max_c " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000) " +
        "SELECT user_id, start_event_id, start_ts_us, end_event_id, " +
        "end_ts_us, n_rows, " +
        "CAST(row_number() OVER (PARTITION BY user_id " +
        "ORDER BY start_ts_us, start_event_id) AS BIGINT) AS mn, " +
        "u_cnt, u_sum_c, u_first_id, u_last_id, views_max_c " +
        "FROM m ORDER BY user_id, start_ts_us, start_event_id"),
    // RUNNING/FINAL per-row measures: the sql_mr_all_rows CTE wrapped
    // with the equivalent window functions — prefix frame for RUNNING,
    // whole-match frame for FINAL, classifier-pooled SUBSET membership,
    // dense_rank over match starts for MATCH_NUMBER()
    "sql_mr_running" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "f.event_id AS first_id, f.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i f ON f.user_id = g.user_id AND f.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern), " +
        "m AS (SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.ern AS crn, p.srn AS prn " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000), " +
        "o AS (SELECT m.user_id, m.start_event_id, m.start_ts_us, " +
        "m.end_event_id, m.end_ts_us, m.n_rows, " +
        "x.event_id, x.ts_us, x.event_type, x.vc AS value_c, " +
        "CAST(CASE WHEN x.rn = m.crn THEN 0 WHEN x.rn = m.prn THEN 2 " +
        "ELSE 1 END AS INTEGER) AS step, " +
        "CASE WHEN x.rn = m.crn THEN 'C' WHEN x.rn = m.prn THEN 'P' " +
        "ELSE 'V' END AS classifier " +
        "FROM m JOIN i x ON x.user_id = m.user_id " +
        "AND x.rn >= m.crn AND x.rn <= m.prn) " +
        "SELECT user_id, start_event_id, start_ts_us, end_event_id, " +
        "end_ts_us, n_rows, event_id, ts_us, event_type, value_c, " +
        "step, classifier, " +
        "CAST(dense_rank() OVER (PARTITION BY user_id " +
        "ORDER BY start_ts_us, start_event_id) AS BIGINT) AS mn, " +
        "classifier AS cls, " +
        "count(CASE WHEN classifier = 'V' THEN 1 END) " +
        "OVER run AS v_run_cnt, " +
        "CAST(SUM(CASE WHEN classifier = 'V' THEN value_c END) " +
        "OVER run AS BIGINT) AS v_run_sum_c, " +
        "count(CASE WHEN classifier = 'V' THEN 1 END) " +
        "OVER whole AS v_fin_cnt, " +
        "last_value(CASE WHEN classifier = 'V' THEN event_id END " +
        "IGNORE NULLS) OVER whole AS v_fin_last, " +
        "last_value(CASE WHEN classifier IN ('C', 'P') THEN event_id " +
        "END IGNORE NULLS) OVER run AS u_run_last " +
        "FROM o " +
        "WINDOW run AS (PARTITION BY user_id, start_event_id " +
        "ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "whole AS (PARTITION BY user_id, start_event_id " +
        "ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY user_id, start_ts_us, start_event_id, ts_us, event_id"),
    // WITH UNMATCHED ROWS: the all-rows matched CTE union the NOT
    // EXISTS complement with null match columns and measures
    "sql_mr_unmatched" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "f.event_id AS first_id, f.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i f ON f.user_id = g.user_id AND f.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern), " +
        "m AS (SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows, " +
        "c.ern AS crn, p.srn AS prn " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000), " +
        "o AS (SELECT m.user_id, m.start_event_id, m.start_ts_us, " +
        "m.end_event_id, m.end_ts_us, m.n_rows, " +
        "x.event_id, x.ts_us, x.event_type, x.vc AS value_c, " +
        "CAST(CASE WHEN x.rn = m.crn THEN 0 WHEN x.rn = m.prn THEN 2 " +
        "ELSE 1 END AS INTEGER) AS step, " +
        "CASE WHEN x.rn = m.crn THEN 'C' WHEN x.rn = m.prn THEN 'P' " +
        "ELSE 'V' END AS classifier " +
        "FROM m JOIN i x ON x.user_id = m.user_id " +
        "AND x.rn >= m.crn AND x.rn <= m.prn), " +
        "mo AS (SELECT user_id, start_event_id, start_ts_us, " +
        "end_event_id, end_ts_us, n_rows, event_id, ts_us, event_type, " +
        "value_c, step, classifier, " +
        "CAST(dense_rank() OVER (PARTITION BY user_id " +
        "ORDER BY start_ts_us, start_event_id) AS BIGINT) AS mn, " +
        "classifier AS cls FROM o) " +
        "SELECT * FROM mo " +
        "UNION ALL " +
        "SELECT x.user_id, NULL, NULL, NULL, NULL, " +
        "CAST(NULL AS BIGINT) AS n_rows, x.event_id, x.ts_us, " +
        "x.event_type, x.vc, CAST(NULL AS INTEGER) AS step, NULL, " +
        "CAST(NULL AS BIGINT) AS mn, NULL " +
        "FROM i x WHERE NOT EXISTS (SELECT 1 FROM o " +
        "WHERE o.user_id = x.user_id AND o.event_id = x.event_id) " +
        "ORDER BY user_id, ts_us, event_id"),
    // open-ended {2,}: the funnel islands selection with the view run
    // required >= 2 (greedy {m,} == V+ except the lower-bound kill)
    "cep_rep_open" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "f.event_id AS first_id, f.ts_us AS first_ts, " +
        "l.event_id AS last_id, l.ts_us AS last_ts FROM g " +
        "JOIN i f ON f.user_id = g.user_id AND f.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' AND v.n >= 2 " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 604800000000 " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // timed-out partials: every click is independently a head (funnel
    // spans contain no clicks), so classify each click — a run view
    // past the horizon times out at that view (partial = rows before
    // it), a non-view terminator past the horizon times out the whole
    // run, end-of-data times out whatever survived, a purchase inside
    // the horizon after >= 1 view matches, anything else kills silent
    "cep_timeout" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events), " +
        "c AS (SELECT user_id, event_id AS cid, ts_us AS cts, rn AS crn " +
        "FROM r WHERE event_type = 'click'), " +
        "nx AS (SELECT c.*, (SELECT MIN(x.rn) FROM r x " +
        "WHERE x.user_id = c.user_id AND x.rn > c.crn " +
        "AND x.event_type <> 'view') AS nrn FROM c), " +
        "b AS (SELECT nx.*, (SELECT MIN(v.rn) FROM r v " +
        "WHERE v.user_id = nx.user_id AND v.rn > nx.crn " +
        "AND (nx.nrn IS NULL OR v.rn < nx.nrn) " +
        "AND v.ts_us > nx.cts + 86400000000) AS brn FROM nx), " +
        "cls AS (SELECT b.user_id, b.cid, b.cts, b.crn, b.nrn, b.brn, " +
        "n.event_type AS ntype, n.ts_us AS nts, n.event_id AS nid " +
        "FROM b LEFT JOIN r n ON n.user_id = b.user_id AND n.rn = b.nrn), " +
        "tmo AS (SELECT user_id, cid, cts, crn, " +
        "CASE WHEN brn IS NOT NULL THEN brn - 1 " +
        "WHEN nrn IS NULL THEN (SELECT MAX(m.rn) FROM r m " +
        "WHERE m.user_id = cls.user_id) " +
        "ELSE nrn - 1 END AS ern FROM cls " +
        "WHERE brn IS NOT NULL OR nrn IS NULL " +
        "OR nts > cts + 86400000000), " +
        "mt AS (SELECT user_id, cid AS start_event_id, " +
        "cts AS start_ts_us, nid AS end_event_id, nts AS end_ts_us, " +
        "CAST(nrn - crn + 1 AS BIGINT) AS n_rows, FALSE AS timed_out " +
        "FROM cls WHERE brn IS NULL AND nrn IS NOT NULL " +
        "AND nts <= cts + 86400000000 AND ntype = 'purchase' " +
        "AND nrn > crn + 1) " +
        "SELECT * FROM mt UNION ALL " +
        "SELECT t.user_id, t.cid, t.cts, e.event_id, e.ts_us, " +
        "CAST(t.ern - t.crn + 1 AS BIGINT), TRUE " +
        "FROM tmo t JOIN r e ON e.user_id = t.user_id AND e.rn = t.ern " +
        "ORDER BY user_id, start_ts_us, start_event_id"),
    // SKIP TO NEXT ROW on the revisit pattern: overlapping matches all
    // emit, so the answer is ALL window-valid contiguous triples — the
    // cep_revisit candidate CTE with its recursive skip-selection
    // removed (the two gates provably differ on this corpus)
    "cep_skip_next" ->
      ("WITH r AS (SELECT user_id, event_id, " +
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn " +
        "FROM events) " +
        "SELECT a.user_id, a.event_id AS start_event_id, " +
        "a.ts_us AS start_ts_us, w.event_id AS end_event_id, " +
        "w.ts_us AS end_ts_us, CAST(3 AS BIGINT) AS n_rows " +
        "FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + 1 " +
        "AND b.event_type = 'click' " +
        "JOIN r w ON w.user_id = a.user_id AND w.rn = a.rn + 2 " +
        "AND w.event_type = 'view' " +
        "WHERE a.event_type = 'view' AND w.ts_us - a.ts_us <= 86400000000 " +
        "ORDER BY a.user_id, start_ts_us, start_event_id"),
    // bounded-depth BFS: UNION-deduped recursive frontier, MIN(d) per
    // vertex — the path-explosion-paying twin of the Spark frontier
    // iteration (whose per-level distinct+anti-join collapse is the
    // point of the operator)
    "graph_bfs" ->
      ("WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey, l_partkey " +
        "FROM lineitem WHERE l_partkey % 4 = 0 AND l_linenumber <= 2), " +
        "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey " +
        "WHERE a.l_partkey < b.l_partkey), " +
        "edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "nodes AS (SELECT DISTINCT u AS n FROM edges), " +
        "reach AS (SELECT n, 0 AS d FROM nodes WHERE n % 400 = 0 " +
        "UNION SELECT e.v AS n, r.d + 1 AS d FROM reach r " +
        "JOIN edges e ON e.u = r.n WHERE r.d < 4) " +
        "SELECT n AS part_id, CAST(MIN(d) AS BIGINT) AS dist FROM reach " +
        "GROUP BY n ORDER BY dist, part_id"),
    // definitional BM25 (Lucene +1 idf), the same 6dp-contribution /
    // decimal-sum quantization as the Spark side
    "text_bm25" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM d), " +
        "lens AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id), " +
        "n AS (SELECT COUNT(*) AS n_docs FROM documents), " +
        // avgdl over ALL docs (a zero-token doc has no lens row but the
        // Spark side counts it in the denominator) — SUM(len) is total
        // tokens either way, so only the denominator needs the base table
        "st AS (SELECT round(CAST(SUM(len) AS DOUBLE) / " +
        "(SELECT COUNT(*) FROM documents), 6) AS avgdl FROM lens), " +
        "qtf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok " +
        "WHERE token IN ('join', 'stream', 'sort') " +
        "GROUP BY doc_id, token), " +
        "dfx AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY token), " +
        "sc AS (SELECT q.doc_id, CAST(round(" +
        "ln(1.0 + (n.n_docs - x.df + 0.5) / (x.df + 0.5)) * " +
        "q.tf * 2.2 / (q.tf + 1.2 * (0.25 + 0.75 * " +
        "CAST(l.len AS DOUBLE) / st.avgdl)), 6) AS DECIMAL(20,8)) AS c " +
        "FROM qtf q JOIN dfx x USING(token) JOIN lens l USING(doc_id), n, st) " +
        "SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score, " +
        "COUNT(*) AS n_terms FROM sc GROUP BY doc_id " +
        "ORDER BY score DESC, doc_id LIMIT 10"),
    "q13e_cube" ->
      ("SELECT COALESCE(l_returnflag, 'ALL') AS rflag, " +
        "COALESCE(l_linestatus, 'ALL') AS lstatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "COUNT(*) AS cnt FROM lineitem " +
        "GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rflag, lstatus"),
    "q23c_variant" ->
      ("SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k, " +
        "CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // definitional PERCENTILE_DISC (smallest value with cum >= p*n,
    // integer cross-multiplied) rather than quantile_disc, whose
    // index convention differs across engines
    "q10p_percentile_disc" ->
      ("WITH h AS (SELECT l_returnflag, l_extendedprice, COUNT(*) AS w " +
        "FROM lineitem GROUP BY l_returnflag, l_extendedprice), " +
        "c AS (SELECT l_returnflag, l_extendedprice, " +
        "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cum, " +
        "SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM h) " +
        "SELECT l_returnflag, " +
        "MIN(CASE WHEN cum * 10 >= 3 * tot THEN l_extendedprice END) AS p30_disc, " +
        "MIN(CASE WHEN cum * 10 >= 7 * tot THEN l_extendedprice END) AS p70_disc, " +
        "CAST(MAX(tot) AS BIGINT) AS n_rows " +
        "FROM c GROUP BY l_returnflag ORDER BY l_returnflag"),
    // user_id < 50 commutes with the per-user window — both engines may
    // filter before or after partitioning without changing LOCF values
    "q15d_ignore_nulls" ->
      ("SELECT user_id, event_id, round(last_value(pv IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS last_purchase_value " +
        "FROM (SELECT user_id, event_id, ts, " +
        "CASE WHEN event_type = 'purchase' THEN value END AS pv " +
        "FROM events WHERE user_id < 50) " +
        "ORDER BY user_id, event_id"),
    "q14c_ratio_to_report" ->
      ("WITH bn AS (SELECT n_name, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue " +
        "FROM customer, orders, nation " +
        "WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey " +
        "GROUP BY n_name) " +
        "SELECT n_name, ROUND(revenue, 2) AS revenue, " +
        "ROUND(revenue / SUM(revenue) OVER (), 6) AS rev_share " +
        "FROM bn ORDER BY n_name"),
    "mix_group_sample" ->
      ("WITH h AS (SELECT lang, doc_id, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h " +
        "FROM documents) " +
        "SELECT lang, doc_id, h FROM h " +
        "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h DESC, doc_id) <= 25 " +
        "ORDER BY lang, h DESC, doc_id"),
    "sql_tpch_q4" -> Analytics.tpchQ4Sql,
    "sql_tpch_q7" -> Analytics.tpchQ7Sql,
    "sql_tpch_q8" -> Analytics.tpchQ8Sql,
    "sql_tpch_q12" -> Analytics.tpchQ12Sql,
    "sql_tpch_q13" -> Analytics.tpchQ13Sql,
    "sql_tpch_q19" -> Analytics.tpchQ19Sql,
    "sql_tpch_q21" -> Analytics.tpchQ21Sql,
    "sql_tpch_q22" -> Analytics.tpchQ22Sql,
    "sql_tpch_q2" -> Analytics.tpchQ2Sql,
    "sql_tpch_q9" -> Analytics.tpchQ9Sql,
    "sql_tpch_q11" -> Analytics.tpchQ11Sql,
    "sql_tpch_q16" -> Analytics.tpchQ16Sql,
    "sql_tpch_q20" -> Analytics.tpchQ20Sql,
    // exact below the sketch's nominal capacity (the gate's scale);
    // the same plan is ~1.6%-error approximate beyond it by contract
    "sketch_theta_audience" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase' AND value > 200.0
        |             AND user_id IS NOT NULL),
        |     b AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'error' AND value > 200.0
        |             AND user_id IS NOT NULL)
        |SELECT (SELECT COUNT(*) FROM a) AS big_purchase_users,
        |       (SELECT COUNT(*) FROM b) AS big_error_users,
        |       (SELECT COUNT(*) FROM a
        |        WHERE user_id IN (SELECT user_id FROM b)) AS both_users,
        |       (SELECT COUNT(*) FROM a
        |        WHERE user_id NOT IN (SELECT user_id FROM b))
        |         AS only_purchase_users,
        |       (SELECT COUNT(*) FROM
        |         (SELECT user_id FROM a UNION SELECT user_id FROM b))
        |         AS either_users""".stripMargin,
    // exact-mode inclusive rank ≡ count(value ≤ x)/n per (week, type)
    "sketch_rank_sla" ->
      ("SELECT epoch_us(date_trunc('week', CAST(ts AS TIMESTAMP))) AS week_us, " +
        "event_type, " +
        "round(CAST(SUM(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*), 6) AS sla_share, COUNT(*) AS n_events " +
        "FROM events GROUP BY 1, 2 ORDER BY week_us, event_type"),
    // pairs generated from the segment table itself (not the overlap
    // join) so a zero-overlap pair still emits a row, like the sketches
    "sketch_overlap_matrix" ->
      ("""WITH u AS (SELECT DISTINCT event_type, user_id FROM events
        |            WHERE user_id IS NOT NULL),
        |     c AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
        |     o AS (SELECT x.event_type AS ta, y.event_type AS tb,
        |             COUNT(*) AS ov
        |           FROM u x JOIN u y ON x.user_id = y.user_id
        |             AND x.event_type < y.event_type
        |           GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.n AS users_a, cb.n AS users_b,
        |  COALESCE(o.ov, 0) AS overlap,
        |  ca.n + cb.n - COALESCE(o.ov, 0) AS either_users,
        |  round(CAST(COALESCE(o.ov, 0) AS DOUBLE) /
        |        CAST(ca.n + cb.n - COALESCE(o.ov, 0) AS DOUBLE), 6)
        |    AS jaccard
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN o ON o.ta = ca.event_type AND o.tb = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin),
    "sql_null_semantics" -> Analytics.nullSemanticsSql,
    "text_decontam" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        s"sh AS (SELECT doc_id, $shinglesSql AS s FROM d), " +
        "ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0), " +
        "tr AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0) " +
        "SELECT doc_id, COUNT(*) AS n_shared, CAST(n_grams AS BIGINT) AS n_grams, " +
        "round(COUNT(*) / CAST(n_grams AS DOUBLE), 6) AS frac " +
        "FROM tr JOIN ev USING (g) GROUP BY doc_id, n_grams ORDER BY doc_id"),
    // bloom twin gates against the SAME exact-decontam oracle: bloom has
    // no false negatives and the plan exact-confirms candidates, so the
    // sketch path must reproduce the exact answer row-for-row
    "text_decontam_bloom" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        s"sh AS (SELECT doc_id, $shinglesSql AS s FROM d), " +
        "ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0), " +
        "tr AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0) " +
        "SELECT doc_id, COUNT(*) AS n_shared, CAST(n_grams AS BIGINT) AS n_grams, " +
        "round(COUNT(*) / CAST(n_grams AS DOUBLE), 6) AS frac " +
        "FROM tr JOIN ev USING (g) GROUP BY doc_id, n_grams ORDER BY doc_id"),
    "text_span_dedup" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sp AS (SELECT doc_id, CAST(r.i AS BIGINT) AS chunk, " +
        "array_to_string(toks[(CAST(r.i AS INT)*10+1):(CAST(r.i AS INT)*10+10)], ' ') AS span " +
        "FROM d, unnest(range(0, len(toks)//10)) AS r(i)), " +
        "x AS (SELECT doc_id, chunk, span, " +
        "row_number() OVER (PARTITION BY span ORDER BY doc_id, chunk) AS rn FROM sp) " +
        "SELECT doc_id, COUNT(*) AS n_spans, COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_dup " +
        "FROM x GROUP BY doc_id ORDER BY doc_id"),
    // exact substring dedup: the same 5-token shingle index, cross-doc
    // same-shingle matches, and diagonal-islands maximal-run CTE the
    // operator runs (string-keyed — definitional, cap-free; the
    // operator's df cap provably does not bind at this scale)
    "text_substring_dedup" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "array_to_string(toks[(CAST(r.i AS INT)+1):(CAST(r.i AS INT)+5)], ' ') AS g " +
        "FROM d, unnest(range(0, greatest(len(toks)-4, 0))) AS r(i)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.pos AS pa, b.pos AS pb " +
        "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        "isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, " +
        "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb " +
        "ORDER BY pa) AS grp FROM m), " +
        "runs AS (SELECT doc_a, doc_b, diag, MIN(pa) AS a_start, " +
        "MAX(pa) AS a_end FROM isl GROUP BY doc_a, doc_b, diag, grp) " +
        "SELECT doc_a, doc_b, a_start, a_start - diag AS b_start, " +
        "CAST(a_end - a_start + 5 AS BIGINT) AS run_len " +
        "FROM runs WHERE a_end - a_start + 5 >= 15 " +
        "ORDER BY doc_a, doc_b, a_start, b_start"),
    // the hashed production twin: the string-keyed runs are the
    // definitional answer (same CTE), hash_eq pinned 1 — the Spark side
    // proves the 8-byte-key plan's run set equals the string-keyed one
    "text_substring_dedup_hashed" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "array_to_string(toks[(CAST(r.i AS INT)+1):(CAST(r.i AS INT)+5)], ' ') AS g " +
        "FROM d, unnest(range(0, greatest(len(toks)-4, 0))) AS r(i)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.pos AS pa, b.pos AS pb " +
        "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        "isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, " +
        "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb " +
        "ORDER BY pa) AS grp FROM m), " +
        "runs AS (SELECT doc_a, doc_b, diag, MIN(pa) AS a_start, " +
        "MAX(pa) AS a_end FROM isl GROUP BY doc_a, doc_b, diag, grp) " +
        "SELECT doc_a, doc_b, a_start, a_start - diag AS b_start, " +
        "CAST(a_end - a_start + 5 AS BIGINT) AS run_len, " +
        "CAST(1 AS BIGINT) AS hash_eq " +
        "FROM runs WHERE a_end - a_start + 5 >= 15 " +
        "ORDER BY doc_a, doc_b, a_start, b_start"),
    // the apply accounting: per doc_b the COUNT(DISTINCT pos) union of
    // removed ranges, left-joined onto every doc's token count
    "text_substring_dedup_apply" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "array_to_string(toks[(CAST(r.i AS INT)+1):(CAST(r.i AS INT)+5)], ' ') AS g " +
        "FROM d, unnest(range(0, greatest(len(toks)-4, 0))) AS r(i)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.pos AS pa, b.pos AS pb " +
        "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        "isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, " +
        "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb " +
        "ORDER BY pa) AS grp FROM m), " +
        "runs AS (SELECT doc_a, doc_b, diag, MIN(pa) AS a_start, " +
        "MAX(pa) AS a_end FROM isl GROUP BY doc_a, doc_b, diag, grp), " +
        "sel AS (SELECT doc_b, a_start - diag AS b_start, " +
        "a_end - a_start + 5 AS run_len FROM runs " +
        "WHERE a_end - a_start + 5 >= 15), " +
        "rm AS (SELECT doc_b AS doc_id, " +
        "COUNT(DISTINCT b_start + u.o) AS n_removed " +
        "FROM sel, unnest(range(0, run_len)) AS u(o) GROUP BY doc_b) " +
        "SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed " +
        "FROM d LEFT JOIN rm ON rm.doc_id = d.doc_id " +
        "ORDER BY d.doc_id"),
    // the rewrite: per doc the tokens whose position is NOT in the
    // union of removed ranges, re-joined in order — string-compared
    "text_substring_dedup_rewrite" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "array_to_string(toks[(CAST(r.i AS INT)+1):(CAST(r.i AS INT)+5)], ' ') AS g " +
        "FROM d, unnest(range(0, greatest(len(toks)-4, 0))) AS r(i)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.pos AS pa, b.pos AS pb " +
        "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id), " +
        "isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, " +
        "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb " +
        "ORDER BY pa) AS grp FROM m), " +
        "runs AS (SELECT doc_a, doc_b, diag, MIN(pa) AS a_start, " +
        "MAX(pa) AS a_end FROM isl GROUP BY doc_a, doc_b, diag, grp), " +
        "sel AS (SELECT doc_b, a_start - diag AS b_start, " +
        "a_end - a_start + 5 AS run_len FROM runs " +
        "WHERE a_end - a_start + 5 >= 15), " +
        "rm AS (SELECT DISTINCT doc_b AS doc_id, b_start + u.o AS pos " +
        "FROM sel, unnest(range(0, run_len)) AS u(o)), " +
        "tok AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "toks[CAST(r.i AS INT)+1] AS tk " +
        "FROM d, unnest(range(0, len(toks))) AS r(i)), " +
        "cl AS (SELECT t.doc_id, " +
        "string_agg(t.tk, ' ' ORDER BY t.pos) AS ct " +
        "FROM tok t LEFT JOIN rm ON rm.doc_id = t.doc_id " +
        "AND rm.pos = t.pos WHERE rm.pos IS NULL GROUP BY t.doc_id), " +
        "rmc AS (SELECT doc_id, COUNT(*) AS n_removed FROM rm " +
        "GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(rmc.n_removed, 0) AS BIGINT) AS n_removed, " +
        "COALESCE(cl.ct, '') AS clean_text " +
        "FROM d LEFT JOIN cl ON cl.doc_id = d.doc_id " +
        "LEFT JOIN rmc ON rmc.doc_id = d.doc_id " +
        "ORDER BY d.doc_id"),
    // incremental substring novelty: corpus-vs-incoming shingle match
    // runs >= 15, per incoming doc the distinct matched positions
    "text_substring_novelty" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sh AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos, " +
        "array_to_string(toks[(CAST(r.i AS INT)+1):(CAST(r.i AS INT)+5)], ' ') AS g " +
        "FROM d, unnest(range(0, greatest(len(toks)-4, 0))) AS r(i)), " +
        "m AS (SELECT c.doc_id AS doc_c, i.doc_id AS doc_i, " +
        "c.pos AS pc, i.pos AS pi " +
        "FROM sh c JOIN sh i ON c.g = i.g " +
        "WHERE c.doc_id % 50 <> 0 AND i.doc_id % 50 = 0), " +
        "isl AS (SELECT doc_c, doc_i, pi - pc AS diag, pi, " +
        "pi - row_number() OVER (PARTITION BY doc_c, doc_i, pi - pc " +
        "ORDER BY pi) AS grp FROM m), " +
        "runs AS (SELECT doc_c, doc_i, MIN(pi) AS i_start, " +
        "MAX(pi) AS i_end FROM isl GROUP BY doc_c, doc_i, diag, grp), " +
        "sel AS (SELECT doc_i, i_start, i_end FROM runs " +
        "WHERE i_end - i_start + 5 >= 15), " +
        "mt AS (SELECT doc_i AS doc_id, " +
        "COUNT(DISTINCT i_start + u.o) AS n_matched " +
        "FROM sel, unnest(range(0, i_end - i_start + 5)) AS u(o) " +
        "GROUP BY doc_i) " +
        "SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(mt.n_matched, 0) AS BIGINT) AS n_matched " +
        "FROM d LEFT JOIN mt ON mt.doc_id = d.doc_id " +
        "WHERE d.doc_id % 50 = 0 ORDER BY d.doc_id"),
    // streaming cross-variable DEFINE: the stream_cep islands CTE with
    // the first-view / last-click value conditions (folded corpus,
    // 10-minute window)
    "stream_cep_cross" ->
      (streamFoldedCte +
        ", r AS (SELECT user_id, event_id, event_type, tu AS ts_us, " +
        "CAST(round(value * 100) AS BIGINT) AS vc, " +
        "row_number() OVER (PARTITION BY user_id " +
        "ORDER BY tu, event_id) AS rn FROM f), " +
        "i AS (SELECT *, rn - row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY rn) AS isl FROM r), " +
        "g AS (SELECT user_id, event_type, isl, MIN(rn) AS srn, " +
        "MAX(rn) AS ern, COUNT(*) AS n FROM i GROUP BY 1, 2, 3), " +
        "gi AS (SELECT g.user_id, g.event_type, g.srn, g.ern, g.n, " +
        "fi.event_id AS first_id, fi.ts_us AS first_ts, " +
        "fi.vc AS first_vc, " +
        "l.event_id AS last_id, l.ts_us AS last_ts, l.vc AS last_vc " +
        "FROM g " +
        "JOIN i fi ON fi.user_id = g.user_id AND fi.rn = g.srn " +
        "JOIN i l ON l.user_id = g.user_id AND l.rn = g.ern) " +
        "SELECT c.user_id, c.last_id AS start_event_id, " +
        "c.last_ts AS start_ts_us, p.first_id AS end_event_id, " +
        "p.first_ts AS end_ts_us, CAST(2 + v.n AS BIGINT) AS n_rows " +
        "FROM gi c " +
        "JOIN gi v ON v.user_id = c.user_id AND v.srn = c.ern + 1 " +
        "AND v.event_type = 'view' " +
        "JOIN gi p ON p.user_id = c.user_id AND p.srn = v.ern + 1 " +
        "AND p.event_type = 'purchase' " +
        "WHERE c.event_type = 'click' " +
        "AND p.first_ts - c.last_ts <= 600000000 " +
        "AND p.first_vc > v.first_vc AND p.first_vc >= c.last_vc " +
        "ORDER BY c.user_id, start_ts_us, start_event_id"),
    // same definitional counts + the hashed-plan equivalence verdict
    "text_span_dedup_hashed" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "sp AS (SELECT doc_id, CAST(r.i AS BIGINT) AS chunk, " +
        "array_to_string(toks[(CAST(r.i AS INT)*10+1):(CAST(r.i AS INT)*10+10)], ' ') AS span " +
        "FROM d, unnest(range(0, len(toks)//10)) AS r(i)), " +
        "x AS (SELECT doc_id, chunk, span, " +
        "row_number() OVER (PARTITION BY span ORDER BY doc_id, chunk) AS rn FROM sp) " +
        "SELECT doc_id, COUNT(*) AS n_spans, COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_dup, " +
        "CAST(1 AS BIGINT) AS hash_eq " +
        "FROM x GROUP BY doc_id ORDER BY doc_id"),
    "pipe_clean_corpus" ->
      (s"WITH d AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents), " +
        "base AS (SELECT doc_id, lang, text, toks, len(toks) AS n_tokens FROM d), " +
        "train AS (SELECT * FROM base WHERE doc_id % 50 <> 0 AND n_tokens >= 30), " +
        "dd AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM train), " +
        "dedup AS (SELECT doc_id, lang, toks, n_tokens FROM dd WHERE rn = 1), " +
        s"ev AS (SELECT DISTINCT unnest(s) AS g FROM (SELECT $shinglesSql AS s FROM d WHERE doc_id % 50 = 0)), " +
        s"tr AS (SELECT doc_id, unnest(s) AS g FROM (SELECT doc_id, $shinglesSql AS s FROM dedup)), " +
        "contam AS (SELECT DISTINCT doc_id FROM tr JOIN ev USING (g)) " +
        "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket, " +
        "CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 " +
        "THEN 'train' ELSE 'val' END AS split " +
        "FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contam) ORDER BY doc_id"),
    // Flink-style CUMULATE windows: expanding 1-min slices of a 4-min max
    // window; each event joins every slice whose end exceeds its ts
    "q30b_cumulate" ->
      ("WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tu, value FROM events), " +
        "w AS (SELECT tu - tu % 240000000 AS w_start, tu, value FROM e), " +
        "x AS (SELECT w_start, w_start + k.k * 60000000 AS w_end, value FROM w, " +
        "(SELECT CAST(range + 1 AS BIGINT) AS k FROM range(4)) k " +
        "WHERE tu < w_start + k.k * 60000000) " +
        "SELECT w_start, w_end, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM x GROUP BY w_start, w_end ORDER BY w_start, w_end"),
    // session intervals (q31_session recipe) then the exact overlap
    // predicate — the naive theta form of operators.RangeJoin.tsOverlap
    "ts_overlap" ->
      ("WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events), " +
        "m AS (SELECT user_id, tu, CASE WHEN LAG(tu) OVER (PARTITION BY user_id ORDER BY tu) IS NULL " +
        "OR tu - LAG(tu) OVER (PARTITION BY user_id ORDER BY tu) >= 30000000 THEN 1 ELSE 0 END AS brk FROM e), " +
        "g AS (SELECT user_id, tu, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS grp FROM m), " +
        "sess AS (SELECT user_id, MIN(tu) AS ws, MAX(tu) + 30000000 AS we FROM g GROUP BY user_id, grp) " +
        "SELECT a.user_id AS user_a, b.user_id AS user_b, a.ws AS a_start, b.ws AS b_start, " +
        "least(a.we, b.we) - greatest(a.ws, b.ws) AS overlap_us " +
        "FROM sess a JOIN sess b ON a.user_id % 2 = 0 AND b.user_id % 2 = 1 " +
        "AND a.ws < b.we AND b.ws < a.we " +
        "ORDER BY user_a, a_start, user_b, b_start"),
    // violation = predicate not TRUE (nulls fail): each arm counts
    // COUNT(*) − passing rows, mirroring Quality.report exactly
    "dq_checks" ->
      ("WITH t AS (SELECT COUNT(*) AS total, " +
        "COUNT(*) - COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL) AS v_key_null, " +
        "COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_key_dup, " +
        "COUNT(*) - COUNT(*) FILTER (WHERE o_totalprice > 0) AS v_price_nonpos, " +
        "COUNT(*) - COUNT(*) FILTER (WHERE o_orderstatus IN ('O','F','P')) AS v_status_domain, " +
        "COUNT(*) - COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o_orderdate < TIMESTAMP '2001-01-01') AS v_date_range FROM orders), " +
        "fk AS (SELECT COUNT(*) AS v_fk FROM orders o WHERE NOT EXISTS " +
        "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) " +
        "SELECT check_name, violations, total, violations = 0 AS pass FROM (" +
        "SELECT 'date_in_range' AS check_name, v_date_range AS violations, total FROM t " +
        "UNION ALL SELECT 'fk_custkey_exists', v_fk, total FROM t, fk " +
        "UNION ALL SELECT 'key_not_null', v_key_null, total FROM t " +
        "UNION ALL SELECT 'key_unique', v_key_dup, total FROM t " +
        "UNION ALL SELECT 'price_positive', v_price_nonpos, total FROM t " +
        "UNION ALL SELECT 'status_in_domain', v_status_domain, total FROM t) " +
        "ORDER BY check_name"),
    // full pairwise within the ±4 length window (lev ≥ |Δlen| makes the
    // band filter lossless) — the quadratic form of editDistancePairs
    "dedup_levenshtein" ->
      ("WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents), " +
        "p AS (SELECT a.doc_id AS i, b.doc_id AS j, a.text AS ta, b.text AS tb " +
        "FROM d a JOIN d b ON a.doc_id < b.doc_id " +
        "AND b.len >= a.len - 4 AND b.len <= a.len + 4) " +
        "SELECT i, j, lev FROM " +
        "(SELECT i, j, CAST(levenshtein(ta, tb) AS BIGINT) AS lev FROM p) " +
        "WHERE lev <= 4 ORDER BY i, j"),
    // mid-ranks as exact DECIMAL(19,0) twice-ranks; q10e co-moment recipe
    "q10j_spearman" ->
      ("WITH b AS (SELECT l_returnflag AS f, l_quantity AS x, l_extendedprice AS y, " +
        "l_orderkey, l_linenumber FROM lineitem), " +
        "r1 AS (SELECT f, x, y, " +
        "row_number() OVER (PARTITION BY f ORDER BY x, l_orderkey, l_linenumber) AS rnx, " +
        "row_number() OVER (PARTITION BY f ORDER BY y, l_orderkey, l_linenumber) AS rny FROM b), " +
        "r2 AS (SELECT f, " +
        "CAST(2 * avg(rnx) OVER (PARTITION BY f, x) AS DECIMAL(19,0)) AS rx, " +
        "CAST(2 * avg(rny) OVER (PARTITION BY f, y) AS DECIMAL(19,0)) AS ry FROM r1), " +
        "s AS (SELECT f, COUNT(*) AS cnt, " +
        "CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy " +
        "FROM r2 GROUP BY f) " +
        "SELECT f AS l_returnflag, cnt, " +
        "round((cnt * sxy - sx * sy) / sqrt((cnt * sxx - sx * sx) * (cnt * syy - sy * sy)), 6) AS spearman " +
        "FROM s ORDER BY l_returnflag"),
    "q09c_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    // trailing 7-day distinct actives: range-join definitional form
    "q30c_sliding_distinct" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
        "CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) AS BIGINT) AS day FROM events), " +
        "days AS (SELECT DISTINCT day FROM ud), " +
        "x AS (SELECT DISTINCT ud.user_id, d.day AS wday FROM ud JOIN days d " +
        "ON d.day BETWEEN ud.day AND ud.day + 6) " +
        "SELECT wday AS day, COUNT(*) AS n_users FROM x GROUP BY wday ORDER BY day"),
    "q30d_trending" ->
      ("WITH c AS (SELECT epoch_us(time_bucket(INTERVAL 10 minutes, CAST(ts AS TIMESTAMP))) AS w_start, " +
        "event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY w_start ORDER BY cnt DESC, event_type) AS rk FROM c) " +
        "SELECT w_start, CAST(rk AS BIGINT) AS rk, event_type, cnt FROM r " +
        "WHERE rk <= 2 ORDER BY w_start, rk"),
    "q10m_weighted_median" ->
      ("WITH h AS (SELECT l_returnflag AS f, l_extendedprice AS v, " +
        "SUM(CAST(l_quantity AS BIGINT)) AS w FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT f, v, w, SUM(w) OVER (PARTITION BY f ORDER BY v " +
        "ROWS UNBOUNDED PRECEDING) AS cum FROM h), " +
        "t AS (SELECT f, SUM(w) AS tot FROM h GROUP BY f) " +
        "SELECT c.f AS l_returnflag, " +
        "MIN(CASE WHEN 2 * cum >= tot THEN v END) AS weighted_median, " +
        "CAST(MAX(tot) AS BIGINT) AS total_units " +
        "FROM c JOIN t ON c.f = t.f GROUP BY c.f ORDER BY l_returnflag"),
    "q10l_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def d(c: String) = s"CAST($c AS DECIMAL(12,2))"
      val prs = for { i <- cs.indices; j <- (i + 1) until cs.size }
        yield (cs(i), cs(j))
      val sums = cs.map(c => s"CAST(SUM(${d(c)}) AS DOUBLE) AS s_$c") ++
        cs.map(c => s"CAST(SUM(${d(c)} * ${d(c)}) AS DOUBLE) AS q_$c") ++
        prs.map { case (a, b) =>
          s"CAST(SUM(${d(a)} * ${d(b)}) AS DOUBLE) AS x_${a}_$b" } :+
        "CAST(COUNT(*) AS DOUBLE) AS n"
      val arms = prs.map { case (a, b) =>
        s"SELECT '$a' AS var_a, '$b' AS var_b, " +
          s"round((n * x_${a}_$b - s_$a * s_$b) / " +
          s"sqrt((n * q_$a - s_$a * s_$a) * (n * q_$b - s_$b * s_$b)), 6) AS corr FROM s" }
      s"WITH s AS (SELECT ${sums.mkString(", ")} FROM lineitem) " +
        arms.mkString(" UNION ALL ") + " ORDER BY var_a, var_b"
    },
    // systematic PPS sampling: integer-exact hits on the cumulative
    // weight axis (the oracle's global window is the naive form the
    // Spark side's distributed prefix-sum avoids)
    "mix_pps_sample" ->
      ("WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS w FROM documents), " +
        "c AS (SELECT doc_id, w, SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d), " +
        "t AS (SELECT SUM(w) AS tot FROM d) " +
        "SELECT doc_id, w, CAST(cum AS BIGINT) AS cum, " +
        "CAST(cum // (tot // 50) - (cum - w) // (tot // 50) AS BIGINT) AS hits " +
        "FROM c, t WHERE cum // (tot // 50) > (cum - w) // (tot // 50) " +
        "ORDER BY doc_id"),
    // the hint changes the physical strategy, never the rows
    "q04d_join_hints" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // the bitmap two-level pattern is Spark-side plumbing; the oracle is
    // the definitional COUNT(DISTINCT)
    "q11c_bitmap_distinct" ->
      ("SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // MAD fence with 4dp boundary rounding on both engines (q10b contract)
    "q10k_mad" ->
      ("WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med " +
        "FROM events GROUP BY 1), " +
        "d AS (SELECT e.event_type, m.med, round(abs(e.value - m.med), 4) AS adev " +
        "FROM events e JOIN med m USING (event_type)), " +
        "mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 4) AS mad " +
        "FROM d GROUP BY 1) " +
        "SELECT d.event_type, max(d.med) AS med, max(mad.mad) AS mad, " +
        "COUNT(CASE WHEN d.adev > 3 * mad.mad THEN 1 END) AS n_outliers, " +
        "COUNT(*) AS n_rows " +
        "FROM d JOIN mad USING (event_type) GROUP BY d.event_type ORDER BY d.event_type"),
    // synthetic next snapshot: %97 deleted, %13 price +10 (exact double),
    // %101 re-inserted shifted — full-outer diff tags all three kinds
    "recon_diff" ->
      ("WITH nxt AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey + 10000000, o_totalprice FROM orders WHERE o_orderkey % 101 = 0) " +
        "SELECT o_orderkey, change, price_a, price_b FROM (" +
        "SELECT COALESCE(c.o_orderkey, n.o_orderkey) AS o_orderkey, " +
        "CASE WHEN c.o_orderkey IS NULL THEN 'added' " +
        "WHEN n.o_orderkey IS NULL THEN 'removed' " +
        "WHEN c.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed' END AS change, " +
        "c.o_totalprice AS price_a, n.o_totalprice AS price_b " +
        "FROM orders c FULL JOIN nxt n ON c.o_orderkey = n.o_orderkey) " +
        "WHERE change IS NOT NULL ORDER BY o_orderkey, change"),
    "feat_user_rfm" ->
      ("SELECT user_id, epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS last_seen_us, " +
        "COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value, " +
        "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase, " +
        "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click, " +
        "COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup, " +
        "round(CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS purchase_rate " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    // triangle census: definitional 3-way self-join (the Spark side uses
    // the degree-ordered wedge-close algorithm; counts must agree)
    "graph_triangles" ->
      ("WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
        "WHERE l_partkey % 4 = 0), " +
        "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v FROM i a " +
        "JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), " +
        "n AS (SELECT COUNT(DISTINCT x) AS c FROM " +
        "(SELECT u AS x FROM e UNION ALL SELECT v FROM e)), " +
        "m AS (SELECT COUNT(*) AS c FROM e), " +
        "tr AS (SELECT COUNT(*) AS c FROM e e1 " +
        "JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) " +
        "SELECT n.c AS n_vertices, m.c AS n_edges, tr.c AS n_triangles FROM n, m, tr"),
    "text_feature_hash" ->
      (s"WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents) " +
        "SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 32 AS bucket, " +
        "COUNT(*) AS cnt FROM tok GROUP BY doc_id, bucket ORDER BY doc_id, bucket"),
    // linear classifier replayed definitionally: stand-in weights from
    // the md5 coin, ⟨tf, w⟩ as mean of per-token weights (exact decimal
    // sum), sigmoid(bias + mean) rounded 6dp
    "text_quality_classifier" ->
      (s"WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents), " +
        "wt AS (SELECT r AS bucket, CAST(round(" +
        "('0x' || substr(md5(CAST(r AS VARCHAR)), 1, 15))::BIGINT " +
        "/ POW(16.0, 15) * 2 - 1, 6) AS DECIMAL(20,12)) AS w " +
        "FROM range(64) t(r)), " +
        "b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 " +
        "AS bucket FROM tok), " +
        "p AS (SELECT doc_id, COUNT(*) AS n_tokens, " +
        "round(CAST(SUM(wt.w) AS DOUBLE) / COUNT(*), 9) AS mean_w " +
        "FROM b JOIN wt USING (bucket) GROUP BY doc_id) " +
        "SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens, " +
        "round(1 / (1 + exp(-(0.02 + COALESCE(p.mean_w, 0)))), 6) AS score, " +
        "round(1 / (1 + exp(-(0.02 + COALESCE(p.mean_w, 0)))), 6) >= 0.5 AS kept " +
        "FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id"),
    // DSIR replayed definitionally: same md5 bucket coin, one-ln
    // log-ratio with mirrored operand order, exact DECIMAL sums, the
    // same Gumbel coin — ORDER BY the exact decimal key then LIMIT k
    "text_dsir_select" ->
      (s"WITH d AS (SELECT doc_id, lang = 'en' AS tgt, $toksSql AS toks " +
        "FROM documents), " +
        "bi AS (SELECT doc_id, tgt, " +
        "('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15))::BIGINT " +
        "% 256 AS bucket FROM d, unnest(range(1, len(toks))) AS r(i)), " +
        "cnt AS (SELECT bucket, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS cp, " +
        "COUNT(*) AS cq FROM bi GROUP BY bucket), " +
        "tot AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq FROM cnt), " +
        "lr AS (SELECT bucket, CAST(round(ln(" +
        "(CAST(cp + 1 AS DOUBLE) * (tq + 256)) / " +
        "(CAST(tp + 256 AS DOUBLE) * (cq + 1))), 6) AS DECIMAL(20,10)) " +
        "AS lr FROM cnt, tot), " +
        "pd AS (SELECT doc_id, COUNT(*) AS n_feat, SUM(lr) AS slr " +
        "FROM bi JOIN lr USING (bucket) GROUP BY doc_id), " +
        "ky AS (SELECT d2.doc_id, COALESCE(pd.n_feat, 0) AS n_feat, " +
        "COALESCE(pd.slr, CAST(0 AS DECIMAL(20,10))) AS slr, " +
        "CAST(round(-ln(-ln(" +
        "(('0x' || substr(md5(CAST(d2.doc_id AS VARCHAR)), 1, 15))::BIGINT " +
        "+ 0.5) / POW(16.0, 15))), 6) AS DECIMAL(20,10)) AS g " +
        "FROM documents d2 LEFT JOIN pd USING (doc_id)) " +
        "SELECT doc_id, n_feat, round(CAST(slr AS DOUBLE), 6) AS logw, " +
        "round(CAST(slr + g AS DOUBLE), 6) AS gkey " +
        "FROM ky ORDER BY slr + g DESC, doc_id LIMIT 100"),
    "text_bigram_logprob" ->
      (s"WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents), " +
        "bi AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 " +
        "FROM d, unnest(range(1, len(toks))) AS r(i)), " +
        "bf AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2), " +
        "cf AS (SELECT w1, SUM(c2) AS c1 FROM bf GROUP BY w1), " +
        "x AS (SELECT doc_id, CAST(round(-ln(CAST(c2 AS DOUBLE) / c1), 6) AS DECIMAL(20,10)) AS nll " +
        "FROM bi JOIN bf USING (w1, w2) JOIN cf USING (w1)) " +
        "SELECT doc_id, round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll, " +
        "COUNT(*) AS n_bigrams FROM x GROUP BY doc_id ORDER BY doc_id"),
    "q17c_union_by_name" ->
      ("SELECT o_orderkey, o_totalprice, status FROM (" +
        "SELECT o_orderkey, o_totalprice, '<absent>' AS status FROM orders WHERE o_orderkey % 2 = 0 " +
        "UNION ALL BY NAME " +
        "SELECT o_orderkey, o_totalprice, COALESCE(o_orderstatus, '<absent>') AS status " +
        "FROM orders WHERE o_orderkey % 2 <> 0) ORDER BY o_orderkey"),
    "copurchase_pairs" ->
      ("WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 FROM i a JOIN i b " +
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) " +
        "SELECT p1, p2, COUNT(*) AS n_orders FROM p GROUP BY p1, p2 " +
        "ORDER BY n_orders DESC, p1, p2 LIMIT 20"),
    "layout_zorder" -> {
      // unrolled Morton interleave: bit i of x -> 2i, bit i of y -> 2i+1
      val terms = (0 until 16).flatMap(i =>
        Seq(s"(((x >> $i) & 1) << ${2 * i})", s"(((y >> $i) & 1) << ${2 * i + 1})"))
        .mkString(" + ")
      "SELECT event_id, " + terms + " AS z FROM " +
        "(SELECT event_id, user_id % 65536 AS x, " +
        "CAST(floor(value) AS BIGINT) % 65536 AS y FROM events) " +
        "ORDER BY event_id"
    },
    // definitional equi-depth boundaries (smallest v with cum*16 >= i*tot,
    // integer cross-multiplied — same convention as q10p_percentile_disc),
    // then every order assigned by boundary scan
    "layout_range_partition" ->
      ("""WITH h AS (SELECT o_totalprice AS v, COUNT(*) AS w FROM orders GROUP BY 1),
        |c AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cum, SUM(w) OVER () AS tot FROM h),
        |s AS (SELECT unnest(range(1, 16)) AS i),
        |b AS (SELECT i, MIN(v) AS bv FROM c, s WHERE cum * 16 >= i * tot GROUP BY i),
        |ba AS (SELECT list(bv ORDER BY i) AS barr FROM b),
        |a AS (SELECT o_totalprice AS v,
        |        len(list_filter(barr, x -> o_totalprice >= x)) AS shard
        |      FROM orders, ba)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  round(MIN(v), 6) AS lo, round(MAX(v), 6) AS hi
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin),
    // the reference's 4-row replay contract as literals (epoch-second
    // fixture timestamps; amount_usd values are the FX doubles rounded
    // by the gate's 6dp canonicalization; processed = the null-check
    // verdict on the wall-clock processingTimestamp)
    "q29_replay" ->
      ("SELECT * FROM (VALUES " +
        "('t1', CAST(100.0 AS DOUBLE), 'USD', TIMESTAMP '1970-01-01 00:00:01', 'Test Merchant', 'u1', CAST(100.0 AS DOUBLE), CAST(1 AS BIGINT)), " +
        "('t2', CAST(200.0 AS DOUBLE), 'EUR', TIMESTAMP '1970-01-01 00:00:02', 'Test Merchant', 'u2', CAST(220.0 AS DOUBLE), CAST(1 AS BIGINT)), " +
        "('t3', CAST(150.0 AS DOUBLE), 'GBP', TIMESTAMP '1970-01-01 00:00:03', 'Test Merchant', 'u3', CAST(195.0 AS DOUBLE), CAST(1 AS BIGINT)), " +
        "('t5', CAST(250.0 AS DOUBLE), 'EUR', TIMESTAMP '1970-01-01 00:00:05', 'Test Merchant', 'u5', CAST(275.0 AS DOUBLE), CAST(1 AS BIGINT))" +
        ") AS v(id, amount, currency, event_ts, merchant, user_id, amount_usd, processed) " +
        "ORDER BY id"),
    // 5 good frames decode (amount mass 1000.0); the unknown-id frame
    // and the 2 malformed frames (wrong magic, truncated body) quarantine
    "pipe_avro_quarantine" ->
      ("SELECT * FROM (VALUES " +
        "('malformed', CAST(2 AS BIGINT), CAST(0.0 AS DOUBLE)), " +
        "('ok', CAST(5 AS BIGINT), CAST(1000.0 AS DOUBLE)), " +
        "('unknown_id', CAST(1 AS BIGINT), CAST(0.0 AS DOUBLE))" +
        ") AS v(disposition, n, amount_sum) ORDER BY disposition"),
    // nearest-neighbor 4×4 resample restated as floor sampling: resized
    // pixel (x',y') of frame k = base + (x'·w)//4 + (y'·h)//4 + k
    "mm_resize_px" ->
      ("WITH p AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind, " +
        "8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f " +
        "FROM documents), " +
        "s AS (SELECT p.*, gx.x AS xp, gy.x AS yp, gk.x AS k FROM p, " +
        "unnest(range(4)) AS gx(x), unnest(range(4)) AS gy(x), " +
        "unnest(range(f)) AS gk(x)) " +
        "SELECT doc_id, kind, CAST(4 AS BIGINT) AS new_w, " +
        "CAST(4 AS BIGINT) AS new_h, CAST(3 AS BIGINT) AS channels, " +
        "CAST(f AS BIGINT) AS n_frames, " +
        "CAST(3 * SUM(b + (xp*w)//4 + (yp*h)//4 + k) AS BIGINT) AS px_sum " +
        "FROM s GROUP BY doc_id, kind, f ORDER BY doc_id"),
    "mm_frame_stats" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f " +
        "FROM documents) " +
        "SELECT doc_id, CAST(gk.x AS BIGINT) AS frame_idx, " +
        "CAST(3 * (w*h*(b + gk.x) + h*(w*(w-1)//2) + w*(h*(h-1)//2)) AS BIGINT) AS f_px_sum " +
        "FROM p, unnest(range(f)) AS gk(x) ORDER BY doc_id, frame_idx"),
    // WAV: n = 64 + d%64 samples of amplitude b+i (b = d%64) —
    // Σ = nb + n(n-1)/2, Σ² = nb² + bn(n-1) + (n-1)n(2n-1)/6
    "mm_audio_meta" ->
      ("SELECT doc_id, CAST(1 AS BIGINT) AS channels, " +
        "CAST(8000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples, " +
        "CAST(n*b + n*(n-1)//2 AS BIGINT) AS amp_sum, " +
        "CAST(n*b*b + b*n*(n-1) + (n-1)*n*(2*n-1)//6 AS BIGINT) AS amp_sq_sum " +
        "FROM (SELECT doc_id, 64 + doc_id % 64 AS n, doc_id % 64 AS b " +
        "FROM documents) ORDER BY doc_id"),
    // stride-2 sampling: frames k ≡ 0 (mod 2); per-frame pixel sum is the
    // mm_frame_stats closed form, summed over sampled k only
    "mm_frame_sample_px" ->
      ("WITH p AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind, " +
        "8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f " +
        "FROM documents), " +
        "s AS (SELECT p.*, gk.x AS k FROM p, unnest(range(f)) AS gk(x) " +
        "WHERE gk.x % 2 = 0) " +
        "SELECT doc_id, kind, CAST(f AS BIGINT) AS n_frames, " +
        "CAST(COUNT(*) AS BIGINT) AS n_sampled, " +
        "CAST(3 * SUM(w*h*(b + k) + h*(w*(w-1)//2) + w*(h*(h-1)//2)) AS BIGINT) " +
        "AS px_sum_sampled FROM s GROUP BY doc_id, kind, f ORDER BY doc_id"),
    // sample i of doc d has amplitude b+i; window = i//16, ragged tail kept
    "mm_audio_windows" ->
      ("WITH p AS (SELECT doc_id, 64 + doc_id % 64 AS n, doc_id % 64 AS b " +
        "FROM documents), " +
        "s AS (SELECT doc_id, b, g.x AS i, g.x // 16 AS wi " +
        "FROM p, unnest(range(n)) AS g(x)) " +
        "SELECT doc_id, CAST(wi AS BIGINT) AS window_idx, " +
        "CAST(COUNT(*) AS BIGINT) AS n_samples_w, " +
        "CAST(SUM(b + i) AS BIGINT) AS amp_sum, " +
        "CAST(SUM((b+i)*(b+i)) AS BIGINT) AS energy " +
        "FROM s GROUP BY doc_id, wi ORDER BY doc_id, window_idx"),
    // aHash restated: frame-0 NN-resampled brightness s = 3·(b+(x·w)//8+
    // (y·h)//8), bit(y·8+x) = 64·s > Σs; hex = two unsigned 32-bit halves
    "mm_ahash_dedup" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b FROM documents), " +
        "px AS (SELECT doc_id, gy.x*8 + gx.x AS idx, " +
        "3*(b + (gx.x*w)//8 + (gy.x*h)//8) AS s FROM p, " +
        "unnest(range(8)) AS gx(x), unnest(range(8)) AS gy(x)), " +
        "bits AS (SELECT doc_id, idx, CASE WHEN 64*s > " +
        "SUM(s) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS bit FROM px), " +
        "hh AS (SELECT doc_id, " +
        "CAST(SUM(CASE WHEN idx >= 32 THEN bit * (CAST(1 AS BIGINT) << (idx-32)) " +
        "ELSE 0 END) AS BIGINT) AS hi, " +
        "CAST(SUM(CASE WHEN idx < 32 THEN bit * (CAST(1 AS BIGINT) << idx) " +
        "ELSE 0 END) AS BIGINT) AS lo FROM bits GROUP BY doc_id) " +
        "SELECT printf('%08x%08x', hi, lo) AS ahash, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS keeper " +
        "FROM hh GROUP BY 1 ORDER BY ahash"),
    // pair builder: the aHash closed form + the ring replay + the
    // min-draw-valid selection, all from proven fragments
    "mm_pair_builder" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b FROM documents), " +
        "px AS (SELECT doc_id, gy.x*8 + gx.x AS idx, " +
        "3*(b + (gx.x*w)//8 + (gy.x*h)//8) AS s FROM p, " +
        "unnest(range(8)) AS gx(x), unnest(range(8)) AS gy(x)), " +
        "bits AS (SELECT doc_id, idx, CASE WHEN 64*s > " +
        "SUM(s) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS bit FROM px), " +
        "hh AS (SELECT doc_id, " +
        "CAST(SUM(CASE WHEN idx >= 32 THEN bit * (CAST(1 AS BIGINT) << (idx-32)) " +
        "ELSE 0 END) AS BIGINT) AS hi, " +
        "CAST(SUM(CASE WHEN idx < 32 THEN bit * (CAST(1 AS BIGINT) << idx) " +
        "ELSE 0 END) AS BIGINT) AS lo FROM bits GROUP BY doc_id), " +
        "ah AS (SELECT doc_id, printf('%08x%08x', hi, lo) AS ahash FROM hh), " +
        "hs AS (SELECT doc_id AS nd, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv " +
        "FROM documents), " +
        "hss AS (SELECT nd, hv, hv // 72057594037927936 AS shard FROM hs), " +
        "ps AS (SELECT nd AS u, i, " +
        "('0x' || substr(md5(CAST(nd AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT AS pos " +
        "FROM hs, (SELECT unnest([0, 1]) AS i) t), " +
        "psh AS (SELECT u, i, pos, pos // 72057594037927936 AS shard FROM ps), " +
        "j AS (SELECT p2.u, p2.i, " +
        "min(CASE WHEN n.hv >= p2.pos THEN struct_pack(hv := n.hv, nd := n.nd) END) AS succ, " +
        "min(struct_pack(hv := n.hv, nd := n.nd)) AS frst " +
        "FROM psh p2 JOIN hss n USING (shard) GROUP BY p2.u, p2.i), " +
        "c AS (SELECT u, i, coalesce(succ, frst).nd AS v FROM j), " +
        "valid AS (SELECT c.u, c.i, c.v, aa.ahash AS anchor_hash, " +
        "ab.ahash AS neg_hash FROM c " +
        "JOIN ah aa ON aa.doc_id = c.u JOIN ah ab ON ab.doc_id = c.v " +
        "WHERE c.v <> c.u AND ab.ahash <> aa.ahash) " +
        "SELECT u AS doc_id, anchor_hash, v AS neg_doc, neg_hash FROM valid " +
        "QUALIFY row_number() OVER (PARTITION BY u ORDER BY i) = 1 " +
        "ORDER BY doc_id"),
    // near-dup: the oracle brute-forces class pairs (banding is a
    // complete candidate generator for hamming ≤ 7, so results agree);
    // hamming via per-half popcounts — no signed 64-bit reassembly
    "mm_ahash_near_dup" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b FROM documents), " +
        "px AS (SELECT doc_id, gy.x*8 + gx.x AS idx, " +
        "3*(b + (gx.x*w)//8 + (gy.x*h)//8) AS s FROM p, " +
        "unnest(range(8)) AS gx(x), unnest(range(8)) AS gy(x)), " +
        "bits AS (SELECT doc_id, idx, CASE WHEN 64*s > " +
        "SUM(s) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS bit FROM px), " +
        "hh AS (SELECT doc_id, " +
        "CAST(SUM(CASE WHEN idx >= 32 THEN bit * (CAST(1 AS BIGINT) << (idx-32)) " +
        "ELSE 0 END) AS BIGINT) AS hi, " +
        "CAST(SUM(CASE WHEN idx < 32 THEN bit * (CAST(1 AS BIGINT) << idx) " +
        "ELSE 0 END) AS BIGINT) AS lo FROM bits GROUP BY doc_id), " +
        "cls AS (SELECT hi, lo, printf('%08x%08x', hi, lo) AS ahash, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM hh GROUP BY hi, lo) " +
        "SELECT a.ahash AS ahash_a, b.ahash AS ahash_b, " +
        "CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) " +
        "AS hamming, a.n_docs AS n_docs_a, b.n_docs AS n_docs_b " +
        "FROM cls a, cls b WHERE a.ahash < b.ahash " +
        "AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 2 " +
        "ORDER BY ahash_a, ahash_b"),
    // poison ⇔ doc_id % 25 == 0 (even → bad magic, odd → truncation);
    // survivor pixel mass is the mm_media_meta closed form
    "mm_media_quarantine" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b, " +
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + doc_id % 4 END AS f, " +
        "CASE WHEN doc_id % 25 <> 0 THEN 'ok' " +
        "WHEN doc_id % 2 = 0 THEN 'bad_magic' ELSE 'truncated' END AS disposition " +
        "FROM documents) " +
        "SELECT disposition, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN disposition = 'ok' THEN " +
        "3*(w*h*(f*b + f*(f-1)//2) + f*(h*(w*(w-1)//2) + w*(h*(h-1)//2))) " +
        "ELSE 0 END) AS BIGINT) AS px_sum " +
        "FROM p GROUP BY 1 ORDER BY disposition"),
    // envelope window w mean = (16b + Σ(16w..16w+15))//16 = b+16w+7;
    // class = b, pairwise max |Δ| = |Δb|, sig hex order = b order
    "mm_audio_near_dup" ->
      ("WITH p AS (SELECT doc_id, doc_id % 64 AS b FROM documents), " +
        "cls AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_docs FROM p GROUP BY b), " +
        "sig AS (SELECT b, printf('%02x%02x%02x%02x', b+7, b+23, b+39, b+55) AS sig, " +
        "n_docs FROM cls) " +
        "SELECT a.sig AS sig_a, c.sig AS sig_b, CAST(c.b - a.b AS BIGINT) AS max_delta, " +
        "a.n_docs AS n_docs_a, c.n_docs AS n_docs_b " +
        "FROM sig a, sig c WHERE a.b < c.b AND c.b - a.b <= 2 " +
        "ORDER BY sig_a, sig_b"),
    // only *.png files pass the glob → even doc_ids; single frame, so
    // px_sum is the f=1 closed form; len_ok pinned to 1
    "mm_binary_files" ->
      ("WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h, " +
        "doc_id % 64 AS b FROM documents WHERE doc_id % 2 = 0) " +
        "SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(3 AS BIGINT) AS channels, CAST(1 AS BIGINT) AS n_frames, " +
        "CAST(3*(w*h*b + h*(w*(w-1)//2) + w*(h*(h-1)//2)) AS BIGINT) AS px_sum, " +
        "CAST(1 AS BIGINT) AS len_ok FROM p ORDER BY doc_id"),
  )
}
