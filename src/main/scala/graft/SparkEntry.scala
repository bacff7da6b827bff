package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{TpchFinal, TpchLike, TpchMore, TpchRest}
import graft.operators.{ColumnNames, Compaction, Concurrent, DimDate, EmbedDocs, FeatureAssembly, FeatureEncoders, FeaturePipeline, Hierarchy, LagFeatures, Medallion, MergeUpsert, Ranks, Reshape, RollingFeatures, SaltedCumSum, Sampling, Scaling, Scd2, SchemaTools, SeqAugment, Serialize, Sessionize, SftPrep, Sketches, SnapshotDiff, StarSplit, TokenPack}
import graft.functions.TextFunctions
import graft.dedup.{Decontaminate, EmbeddingDedup, ExactDedup, MinHashLsh, NGramJaccard, SimHashDedup}
import graft.ann.{BruteForceKnn, IvfAnn, IvfPqAnn, LshAnn, PqAnn}
import graft.multimodal.{ArchiveIngest, BinaryMedia}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchLike.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> (TpchLike.q1PricingSummary(_, _)),
    "q3_shipping_priority"  -> (TpchLike.q3ShippingPriority(_, _)),
    "q5_local_supplier"     -> (TpchLike.q5LocalSupplier(_, _)),
    "q_top_customers_window" -> (TpchLike.topCustomersWindow(_, _)),
    "q_json_extract"        -> (TpchLike.jsonExtract(_, _)),
    "q_skew_topk"           -> ((s, d) => TpchLike.skewTopk(s, d)),
    "q4_order_priority"     -> (TpchMore.q4OrderPriority(_, _)),
    "q7_volume_shipping"    -> (TpchMore.q7VolumeShipping(_, _)),
    "q9_product_profit"     -> (TpchMore.q9ProductProfit(_, _)),
    "q14_promo_revenue"     -> (TpchMore.q14PromoRevenue(_, _)),
    "q17_small_qty_revenue" -> (TpchMore.q17SmallQtyRevenue(_, _)),
    "q18_large_orders"      -> ((s, d) => TpchMore.q18LargeOrders(s, d)),
    "q22_dormant_customers" -> (TpchMore.q22DormantCustomers(_, _)),
    "q13_order_distribution" -> (TpchMore.q13OrderDistribution(_, _)),
    "q21_waiting_supplier"  -> (TpchMore.q21WaitingSupplier(_, _)),
    "q2_min_bal_supplier"   -> (TpchFinal.q2MinBalSupplier(_, _)),
    "q11_important_parts"   -> (TpchFinal.q11ImportantParts(_, _)),
    "q15_top_supplier"      -> (TpchFinal.q15TopSupplier(_, _)),
    "q19_disjunctive_revenue" -> (TpchFinal.q19DisjunctiveRevenue(_, _)),
    "q6_forecast_revenue"   -> (TpchRest.q6ForecastRevenue(_, _)),
    "q8_market_share"       -> (TpchRest.q8MarketShare(_, _)),
    "q10_returned_customers" -> (TpchRest.q10ReturnedCustomers(_, _)),
    "q12_priority_counts"   -> (TpchRest.q12PriorityCounts(_, _)),
    "q16_supplier_counts"   -> (TpchRest.q16SupplierCounts(_, _)),
    "q20_dominant_suppliers" -> (TpchRest.q20DominantSuppliers(_, _)),
    "scd2_apply"            -> (Scd2.eventsScd2(_, _)),
    "scd2_asof_lookup"      -> (Scd2.eventsAsOfLookup(_, _)),
    "merge_upsert"          -> (MergeUpsert.mergeUpsertCustomer(_, _)),
    "medallion_bronze"      -> (Medallion.medallionBronzeOrders(_, _)),
    "medallion_silver"      -> (Medallion.medallionSilverOrders(_, _)),
    "medallion_gold"        -> (Medallion.medallionGoldOrders(_, _)),
    "feature_assembly"      -> (FeatureAssembly.featureAssemblyCustomer(_, _)),
    "star_split_dim"        -> (StarSplit.starSplitDim(_, _)),
    "star_split_fact"       -> (StarSplit.starSplitFact(_, _)),
    "star_multi_dim_profile" -> (StarSplit.starMultiDimProfile(_, _)),
    "star_multi_dim_month"  -> (StarSplit.starMultiDimMonth(_, _)),
    "star_multi_fact"       -> (StarSplit.starMultiFact(_, _)),
    "incremental_agg"       -> (graft.operators.IncrementalAgg.incrementalAggOrders(_, _)),
    "rollup_orders"         -> (graft.operators.GroupingSets.rollupOrders(_, _)),
    "cube_orders"           -> (graft.operators.GroupingSets.cubeOrders(_, _)),
    "snapshot_diff"         -> (SnapshotDiff.snapshotDiffOrders(_, _)),
    "unpivot_measures"      -> (Reshape.unpivotMeasures(_, _)),
    "pivot_measures"        -> (Reshape.pivotMeasures(_, _)),
    "rolling_user_features" -> (RollingFeatures.rollingUserFeatures(_, _)),
    "token_pack"            -> (TokenPack.tokenPackDocuments(_, _)),
    "quantile_bucketize"    -> (Ranks.quantileBucketizeOrders(_, _)),
    "sft_prepare"           -> (SftPrep.sftPrepare(_, _)),
    "sft_length_stats"      -> (SftPrep.sftLengthStats(_, _)),
    "lag_features"          -> (LagFeatures.lagFeaturesEvents(_, _)),
    // sequence-model augmentation family (repair-RL prep pipeline):
    // inverted copies, sliding slices (map-side explode), 24h-gap chains
    "seq_invert"            -> (SeqAugment.seqInvertEvents(_, _)),
    "seq_window_slices"     -> (SeqAugment.seqWindowSlicesEvents(_, _)),
    "chain_sessions"        -> (SeqAugment.chainSessionsEvents(_, _)),
    // train-fit / serve-transform feature pipeline (same anchor)
    "group_entropy"         -> (FeaturePipeline.groupEntropyEvents(_, _)),
    "actor_profile"         -> (FeaturePipeline.actorProfileEvents(_, _)),
    "expanding_loo_mean"    -> (FeaturePipeline.expandingLooMeanEvents(_, _)),
    "expanding_mode"        -> (FeaturePipeline.expandingModeEvents(_, _)),
    "ordinal_encode"        -> (FeaturePipeline.ordinalEncodeCustomer(_, _)),
    "impute_median"         -> (FeaturePipeline.imputeMedianEvents(_, _)),
    "group_split"           -> (FeaturePipeline.groupSplitEvents(_, _)),
    // interval join as day-bucketed equi-join (no nested-loop fallback)
    "range_join"            -> (graft.operators.RangeJoin.rangeJoinEvents(_, _)),
    // interval-OVERLAP join via calendar tiling + first-overlap-bucket
    // dedup: cross-product semantics at linear shuffle cost
    "interval_overlap_join" -> (graft.operators.IntervalJoin.maintenanceOverlap(_, _)),
    // ordered JSON combine per sequence + last-wins dict merge
    "json_merge_agg"        -> (graft.operators.JsonMerge.jsonMergeEvents(_, _)),
    // sentinel->NULL + per-feature attention masks + typed fill (the
    // masked-tabular-transformer prep), one map-side projection
    "feature_attnmask"      -> (graft.operators.AttnMask.attnMaskCustomer(_, _)),
    // t-closeness: ordinal EMD of each QI cell's sensitive distribution
    // vs global, exact integer micros (completes the k/l/Mondrian/DP set)
    "t_closeness"           -> (graft.operators.TCloseness.tClosenessCustomer(_, _)),
    // pair-terminal betweenness: exact BFS path counting, integer
    // stress + floored per-pair betweenness micros
    "path_betweenness"      -> (graft.operators.GraphMetrics.pathBetweennessCoSupply(_, _)),
    // ROUGE-1 clipped-unigram generation scoring, pooled per class
    "rouge1_eval"           -> (graft.operators.RougeEval.rouge1Docs(_, _)),
    // ROUGE-2: the same clipped counts over adjacent-token bigrams
    "rouge2_eval"           -> (graft.operators.RougeEval.rouge2Docs(_, _)),
    // LCS-based ROUGE-L over the same planted chain (codegen'd DP)
    "rougeL_eval"           -> (graft.operators.RougeEval.rougeLDocs(_, _)),
    // distinct-1 / distinct-2 generation diversity, exact permille
    "gen_diversity"         -> (graft.operators.RougeEval.genDiversityDocs(_, _)),
    // data-constrained repeated-epoch allocation (water-fill at cap 4)
    "epoch_plan"            -> (graft.operators.EpochPlan.epochPlanDocs(_, _)),
    // Carlini-style memorization audit: verbatim k-gram window rate of
    // generations against the training corpus
    "memorization_audit"    -> (graft.operators.MemorizationAudit.memorizationDocs(_, _)),
    // execute the epoch plan: whole-epoch repeats + deterministic
    // fractional-epoch admission per doc
    "epoch_materialize"     -> (graft.operators.EpochPlan.epochMaterializeDocs(_, _)),
    // bloom pre-filter + residual semi join == plain semi join (FN-free)
    "bloom_prune_join"      -> (graft.operators.BloomPrune.bloomPruneLineitem(_, _)),
    // split-conformal calibration: order-statistic threshold + coverage
    "conformal_calibrate"   -> (graft.operators.Conformal.conformalEvents(_, _)),
    // seasonal-naive backtest: date-arithmetic forecast join + exact MAE
    "forecast_backtest"     -> (graft.operators.Forecast.forecastBacktestEvents(_, _)),
    // additive Holt-Winters in integer fixed-point: the REAL model next
    // to seasonal-naive, recursion hash-gated via a recursive-CTE oracle
    "holt_winters_backtest" -> (graft.operators.HoltWinters.holtWintersEvents(_, _)),
    // Theta method (SES + half-OLS-drift) in integer fixed-point
    "theta_backtest"        -> (graft.operators.Theta.thetaEvents(_, _)),
    // AR(2) via closed-form Yule-Walker on the same series — the
    // autoregressive leg of the model zoo, exact integer micros
    "yule_walker_ar2"       -> (graft.operators.YuleWalker.yuleWalkerEvents(_, _)),
    // four-candidate selection: AR(2) joins SN/HW/Theta in the zoo
    "auto_forecast4"        -> (graft.operators.AutoForecast.autoForecast4Events(_, _)),
    // AutoETS-style per-series model selection over the three exact models
    "auto_forecast"         -> (graft.operators.AutoForecast.autoForecastEvents(_, _)),
    "forecast_cv_leaderboard" -> (graft.operators.ForecastCv.forecastCvEvents(_, _)),
    // supervised (input[L], horizon[h]) window frames + exact norm
    // constants over the dense spine (the neural-forecast data layer)
    "neural_window_frames"  -> (graft.operators.NeuralWindows.neuralWindowsEvents(_, _)),
    // split-conformal intervals around the HW forecast (two-window fit)
    "forecast_intervals"    -> (graft.operators.ForecastIntervals.forecastIntervalsEvents(_, _)),
    // inverse-calibration-SAE weighted blend of the three exact models,
    // integer micro-weights with largest-remainder normalization
    "ensemble_forecast"     -> (graft.operators.EnsembleForecast.ensembleForecastEvents(_, _)),
    // per-horizon τ-grid residual quantiles graded by exact pinball loss
    "forecast_quantiles"    -> (graft.operators.ForecastQuantiles.forecastQuantilesEvents(_, _)),
    // decoupled tune→predict: persisted winners, zero-refit forecasts
    "forecast_predict"      -> (graft.operators.ForecastPredict.forecastPredictEvents(_, _)),
    // Misra-Gries at capacity >= cardinality == plain GROUP BY COUNT
    "freq_topk_exact"       -> (graft.operators.FreqSketch.freqTopkExact(_, _)),
    // hot-key salted join == plain join (every pair meets exactly once)
    "skew_salted_join"      -> (graft.operators.SkewJoin.skewJoinLineitem(_, _)),
    // deterministic k-per-group reservoir
    "sample_k_per_group"    -> (Sampling.sampleKPerSource(_, _)),
    // deterministic LCG negative sampling for pointwise ranking data
    "negative_sample"       -> (graft.operators.NegativeSample.negativeSampleOrders(_, _)),
    "row_serialize"         -> (Serialize.rowSerializeOrders(_, _)),
    "decontaminate"         -> (Decontaminate.decontaminateDocuments(_, _)),
    "curation_pipeline"     -> (graft.operators.CurationPipeline.curationPipelineDocs(_, _)),
    "curation_trace"        -> (graft.operators.CurationPipeline.curationTraceDocs(_, _)),
    // streaming twin: a new batch curated against the standing
    // registry + fixed benchmark state (incremental == batch gate)
    "curation_incremental"  -> (graft.operators.CurationIncremental.curationIncrementalDocs(_, _)),
    "ctx_truncation"        -> (graft.functions.BpeEncode.ctxTruncationDocs(_, _)),
    "submix_temperature"    -> (Sampling.submixTemperatureDocuments(_, _)),
    "colnames_camel"        -> (ColumnNames.colnamesCamelOrders(_, _)),
    "submix_sample"         -> (Sampling.submixDocuments(_, _)),
    "hash_split"            -> (Sampling.hashSplitDocuments(_, _)),
    // deterministic global shuffle -> fixed-size dataloader shards
    // (two-phase rank: no corpus-wide single-partition window)
    "shard_assign"          -> (Sampling.shardAssignDocuments(_, _)),
    "compaction"            -> (Compaction.compactionOrders(_, _)),
    // Morton-curve multi-dim clustering; the curve value hash-gates,
    // the skipping win is measured in ZorderSpec
    "zorder_values"         -> (graft.operators.Zorder.zorderValues(_, _)),
    "zorder_zonemap"        -> (graft.operators.Zorder.zorderZonemap(_, _)),
    // pre-shuffled co-located join: bucketed write + catalog read +
    // no-Exchange SMJ inside the gate; oracle is the plain join
    "bucketed_join_agg"     -> (graft.operators.BucketedJoin.bucketedJoinAgg(_, _)),
    // strict-sequence funnel (view -> click -> purchase) per user
    "funnel_stages"         -> (graft.operators.Funnel.funnelEvents(_, _)),
    // one-pass expectations report + FK orphan checks
    "dq_report"             -> (graft.operators.DataQuality.dqReport(_, _)),
    // format roundtrips: writer + reader + type fidelity inside the gate
    "jsonl_roundtrip"       -> (graft.sources.Formats.jsonlRoundtrip(_, _)),
    "chat_template"         -> (graft.operators.ChatTemplate.chatTemplateDocs(_, _)),
    "json_field_eval"       -> (graft.operators.JsonFieldEval.jsonFieldEvalDocs(_, _)),
    "eval_experiment_delta" -> (graft.operators.JsonFieldEval.evalExperimentDeltaDocs(_, _)),
    "orc_roundtrip"         -> (graft.sources.Formats.orcRoundtrip(_, _)),
    "csv_roundtrip"         -> (graft.sources.Formats.csvRoundtrip(_, _)),
    "embed_docs"            -> (EmbedDocs.embedDocuments(_, _)),
    // rows-gated like embed_docs: same plumbing, real hashed-BoW encoder
    "embed_docs_bow"        -> (EmbedDocs.embedDocumentsBow(_, _)),
    // expression-level signed-BoW + exact sparse cosine: the embedding
    // pipeline slice that DOES hash-gate (integer vectors, exact dots)
    "embed_bow_expr"        -> (graft.functions.BowVectors.embedBowExpr(_, _)),
    // per-dimension embedding stats on the ANN family's quantization
    // (the FAISS-style normalization pre-pass)
    "embed_dim_stats"       -> (graft.operators.EmbedStats.embedDimStats(_, _)),
    // mean-centered quantized embeddings (the transform dimStats feeds)
    "embed_center"          -> (graft.operators.EmbedStats.embedCenter(_, _)),
    "ann_sparse_bow"        -> (graft.functions.BowVectors.annSparseBow(_, _)),
    "salted_cumsum"         -> (SaltedCumSum.eventsCumSum(_, _)),
    "sessionize"            -> (Sessionize.eventsSessions(_, _)),
    "evt_window_agg"        -> (Sessionize.hourlyAgg(_, _)),
    "count_encode"          -> (FeatureEncoders.countEncodeOrders(_, _)),
    "target_encode"         -> (FeatureEncoders.targetEncodeCustomer(_, _)),
    "onehot_encode"         -> (FeatureEncoders.oneHotCustomer(_, _)),
    "scale_standard"        -> (Scaling.standardCustomer(_, _)),
    "scale_minmax"          -> (Scaling.minMaxCustomer(_, _)),
    // outlier-robust fits from DISCRETE order statistics (scalable global
    // rank, never interpolated) — exact cross-engine, full hash gates
    "winsorize"             -> (Scaling.winsorizeCustomer(_, _)),
    "scale_robust"          -> (Scaling.robustScaleCustomer(_, _)),
    // MERGE with the full three-clause form incl. WHEN MATCHED DELETE
    "merge_upsert_delete"   -> (MergeUpsert.mergeDeleteCustomer(_, _)),
    "schema_shrink"         -> (SchemaTools.shrinkPlanLineitem(_, _)),
    "column_classify"       -> (SchemaTools.classifyOrders(_, _)),
    "numeric_profile"       -> (SchemaTools.numericProfileLineitem(_, _)),
    // exact pivot-centered skewness/kurtosis per group
    "skew_kurtosis"         -> (graft.operators.Moments.momentsLineitem(_, _)),
    // revenue-weighted median quantity per group, division-free walk
    "weighted_median"       -> (graft.operators.WeightedMedian.weightedMedianLineitem(_, _)),
    "class_weights"         -> (SchemaTools.classWeightsOrders(_, _)),
    "dim_date"              -> (DimDate.dimDate(_, _)),
    "hierarchy_flatten"     -> (Hierarchy.customerHierarchy(_, _)),
    "bom_explode"           -> (graft.operators.BomExplode.bomExplodeCustomers(_, _)),
    // pointer-jumping connected components, gated against a DuckDB
    // recursive-CTE transitive-closure oracle on the star lineage graph
    "graph_components"      -> (graft.operators.Graph.graphComponents(_, _)),
    "text_tokens"           -> (TextFunctions.textTokens(_, _)),
    "text_quality"          -> (TextFunctions.textQuality(_, _)),
    "text_langid"           -> (TextFunctions.textLangid(_, _)),
    // corpus cleaning: PII scrub, canonical form, C4-style rule filter —
    // all map-side regex/ratio pipelines, each a full hash gate
    "pii_redact"            -> (graft.functions.TextClean.piiRedact(_, _)),
    // long-format entity extraction (blocklist/link-graph feed): the
    // inverse consumer of the redact gate's shared patterns
    "extract_entities"      -> (graft.functions.TextClean.extractEntitiesDocs(_, _)),
    "text_normalize"        -> (graft.functions.TextClean.textNormalize(_, _)),
    "quality_filter"        -> (graft.functions.TextClean.qualityFilterDocs(_, _)),
    "doc_fingerprint"       -> (TextFunctions.docFingerprint(_, _)),
    // MOSS winnowing: rightmost-min k-gram fingerprints per window
    "winnow_fingerprints"   -> (TextFunctions.winnowFingerprints(_, _)),
    // incremental dedup vs a versioned fingerprint registry
    "dedup_incremental"     -> (graft.dedup.IncrementalDedup.incrementalDocs(_, _)),
    "corpus_stats"          -> (TextFunctions.corpusStats(_, _)),
    "topk_per_group"        -> (graft.functions.TopKAgg.topkPerGroup(_, _)),
    "dedup_exact"           -> (ExactDedup.dedupExact(_, _)),
    // duplication profile: cluster-size histogram + corpus shares
    "dedup_cluster_stats"   -> (ExactDedup.dedupClusterStats(_, _)),
    "dedup_ngram_jaccard"   -> (NGramJaccard.dedupNgramJaccard(_, _)),
    "dedup_minhash_lsh"     -> (MinHashLsh.dedupMinhashLsh(_, _)),
    "dedup_simhash"         -> (SimHashDedup.dedupSimhash(_, _)),
    "dedup_embedding"       -> (EmbeddingDedup.dedupEmbedding(_, _)),
    "dedup_embedding_approx" -> (EmbeddingDedup.dedupEmbeddingApprox(_, _)),
    // 1 table x 0 bits: LSH candidate machinery degenerates to all-pairs
    // exact — hash-gated against the dedup_embedding oracle
    "dedup_embedding_exhaustive" -> (EmbeddingDedup.dedupEmbeddingExhaustive(_, _)),
    // 1 band spanning the full signature: minhash plumbing reproduces
    // equal-shingle-set pairs exactly — SQL-expressible, hash-gated
    "dedup_minhash_exhaustive" -> (MinHashLsh.dedupMinhashExhaustive(_, _)),
    "ann_bruteforce"        -> (BruteForceKnn.annBruteforce(_, _)),
    "ann_lsh"               -> (LshAnn.annLsh(_, _)),
    "ann_ivf"               -> (IvfAnn.annIvf(_, _)),
    // one distributed Lloyd iteration in exact integer arithmetic —
    // the IVF codebook-training primitive, hash-gated
    "kmeans_step"           -> (graft.ann.KmeansStep.kmeansStepEmbeddings(_, _)),
    // two chained Lloyd rounds: the means->centroids feedback edge
    // itself sits inside the hash gate
    "kmeans_step2"          -> (graft.ann.KmeansStep.kmeansStep2Embeddings(_, _)),
    // CH index parts + simplified silhouette over the same clustering
    "cluster_validity"      -> (graft.ann.ClusterValidity.clusterValidityEmbeddings(_, _)),
    // Davies-Bouldin: scatter/separation ratios on the cluster table
    "davies_bouldin"        -> (graft.ann.ClusterValidity.daviesBouldinEmbeddings(_, _)),
    // full-probe IVF == exhaustive search: shares the bruteforce oracle,
    // hash-gating the whole IVF pipeline (train/assign/probe/score/rank)
    "ann_ivf_exhaustive"    -> (IvfAnn.annIvfExhaustive(_, _)),
    "ann_lsh_exhaustive"    -> (LshAnn.annLshExhaustive(_, _)),
    "ann_pq_exhaustive"     -> (PqAnn.annPqExhaustive(_, _)),
    "ann_pq"                -> (PqAnn.annPq(_, _)),
    "ann_ivfpq"             -> (IvfPqAnn.annIvfPq(_, _)),
    // FAIR-pool concurrent orchestration: four independent stats run on
    // parallel driver threads; deterministic values -> full hash gate
    "concurrent_table_stats" -> (Concurrent.concurrentTableStats(_, _)),
    // sketch_*: rows-gated (DuckDB's sketch internals differ, so no hash
    // oracle exists); tolerance vs exact answers asserted in SketchSpec
    // re-pointed (r17) at the PORTABLE grouped dense-HLL so the key
    // hash-gates; the Spark-native approx_count_distinct variant stays
    // spec-gated in SketchSpec (engine-specific registers, no oracle)
    "sketch_distinct_events"   -> (graft.functions.Hll.hllDistinctEventTypes(_, _)),
    // exact-under-cap mergeable distinct sketch; cap >= cardinality
    // degenerates to exact COUNT(DISTINCT) == the hash gate
    "sketch_distinct_exact"    -> (graft.functions.DistinctSketch.sketchDistinctExact(_, _)),
    // pairwise segment overlap via sketch SETS (theta-style set ops)
    "audience_overlap"         -> (graft.functions.DistinctSketch.audienceOverlapEvents(_, _)),
    "sketch_quantiles_lineitem" -> (Sketches.sketchQuantilesLineitem(_, _)),
    // exact-mode GK == discrete quantile: shares an exact DuckDB oracle
    "sketch_quantiles_exact" -> (Sketches.sketchQuantilesExact(_, _)),
    "mm_meta"               -> (BinaryMedia.mmMeta(_, _)),
    "mm_framesample"        -> (BinaryMedia.mmFramesample(_, _)),
    "mm_resize"             -> (BinaryMedia.mmResize(_, _)),
    // REAL pure-JVM BMP decode: encode docs as actual bitmaps, decode
    // the bytes back; oracle predicts from the generator's closed form
    "mm_decode_bmp"         -> (BinaryMedia.mmDecodeBmp(_, _)),
    // real audio decode: header-parsed PCM16 stats vs closed-form oracle
    "mm_decode_wav"         -> (BinaryMedia.mmDecodeWav(_, _)),
    // zip pack->expand roundtrip: member walk + CRC-verified read + UTF-8
    // decode all land inside the hash gate (oracle = documents itself)
    "mm_zip_expand"         -> (ArchiveIngest.mmZipExpand(_, _)),
    // as-of (temporal) join via tagged-union + carry-forward window;
    // oracle is DuckDB's native ASOF LEFT JOIN
    "asof_purchase_click"   -> (graft.operators.AsOfJoin.asofPurchaseClick(_, _)),
    // touch attribution: one carry-forward window pass, exact-cent sums
    "attribution_last_touch" -> (graft.operators.Attribution.attributionLastTouch(_, _)),
    "attribution_first_touch" -> (graft.operators.Attribution.attributionFirstTouch(_, _)),
    // market-basket pair support: map-side pair generation from sorted
    // per-transaction arrays (fact shuffled once, never self-joined)
    "basket_pairs_lineitem" -> (graft.operators.Basket.basketPairsLineitem(_, _)),
    // cohort retention matrix keyed once on the actor column
    "cohort_retention_orders" -> (graft.operators.Cohort.cohortRetentionOrders(_, _)),
    // equi-width histogram: one aggregate on the bin key, exact cents
    "hist_totalprice"       -> (graft.operators.Histogram.histTotalprice(_, _)),
    // edit-distance<=1 similarity join with FN-free pigeonhole blocking;
    // oracle is the all-pairs levenshtein ground truth
    "editdist_pairs"        -> (graft.dedup.EditDistance.editdistPairs(_, _)),
    // sparse/lexical retrieval scoring in integer micros (exact sums)
    "tfidf_terms"           -> (graft.functions.TextScoring.tfidfTerms(_, _)),
    "bm25_topk"             -> (graft.functions.TextScoring.bm25Topk(_, _)),
    // corpus n-gram statistics: map-side bigram generation, exact
    // integer counts, micros-rounded per-row logs
    "pmi_bigrams"           -> (graft.functions.NgramStats.pmiBigramsDocs(_, _)),
    "gopher_repetition"     -> (graft.functions.NgramStats.repetitionDocs(_, _)),
    "doc_surprisal"         -> (graft.functions.NgramStats.surprisalDocs(_, _)),
    "doc_bigram_surprisal"  -> (graft.functions.NgramStats.bigramSurprisalDocs(_, _)),
    // RAG chunking: pure map-side explode+substring, zero shuffles
    "doc_chunks"            -> (graft.operators.Chunker.chunkDocuments(_, _)),
    // fixed-iteration PageRank in exact integer micros (Pregel envelope)
    "pagerank_trade"        -> (graft.operators.PageRank.pagerankTrade(_, _)),
    // per-group Pearson/OLS from exact integer component sums
    "corr_lineitem"         -> (graft.operators.GroupStats.corrLineitem(_, _)),
    // hive-style partitionBy layout: write + directory-encoded column +
    // read inside the gate; pruning asserted in PartitionedLayoutSpec
    "partitioned_roundtrip" -> (graft.sources.PartitionedLayout.partitionedRoundtrip(_, _)),
    // dynamic partition overwrite (replaceWhere analogue): only batch
    // partitions rewritten, others physically untouched
    "partition_overwrite"   -> (graft.sources.PartitionedLayout.partitionOverwrite(_, _)),
    // versioned-table commit log: append/upsert/overwrite commits,
    // then time-travel reads of all four retained versions
    "table_time_travel"     -> (graft.sources.VersionedTable.tableTimeTravel(_, _)),
    // Delta-CDF-style change feed: file-group-granular diff per commit
    "table_change_feed"     -> (graft.sources.VersionedTable.tableChangeFeed(_, _)),
    // materialized view maintained from the CDF across all commit kinds
    "ivm_change_feed"       -> (graft.operators.ViewMaintain.ivmOrdersByYear(_, _)),
    // compaction commit: physical consolidation, logical no-op
    "table_compact"         -> (graft.sources.VersionedTable.tableCompact(_, _)),
    // schema evolution: additive column, old groups read NULL, no rewrite
    "table_schema_evolution" -> (graft.sources.VersionedTable.tableSchemaEvolution(_, _)),
    // log checkpoint: O(tail) snapshot resolution, reads bit-identical
    "table_checkpoint"      -> (graft.sources.VersionedTable.tableCheckpoint(_, _)),
    // zonemap-pruned MERGE: only key-overlapping groups rewritten
    "table_merge_pruned"    -> (graft.sources.VersionedTable.tableMergePruned(_, _)),
    // merge-on-read row deletes via deletion vectors, compaction materializes
    "table_dv_delete"       -> (graft.sources.VersionedTable.tableDvDelete(_, _)),
    // retention vacuum: fence + physical delete + surviving snapshots
    // re-read from disk, file accounting in the hashed output
    "table_vacuum"          -> (graft.sources.VersionedTable.tableVacuum(_, _)),
    // valid-time x transaction-time grid over a versioned SCD2 dim
    "bitemporal_lookup"     -> (graft.operators.Bitemporal.bitemporalOrders(_, _)),
    // event-sequence behavioral stats: lead-window transition pairs;
    // exact power-of-two recency decay (no libm in the gate)
    "markov_transitions"    -> (graft.operators.BehaviorStats.markovEvents(_, _)),
    "decay_user_value"      -> (graft.operators.BehaviorStats.decayedValueEvents(_, _)),
    // Benford leading-digit DQ screen; digit from exact-cents string
    "benford_totalprice"    -> (graft.operators.DigitProfile.benfordTotalprice(_, _)),
    // subtree rollup read off the flattened hierarchy's path column
    "hierarchy_rollup"      -> (Hierarchy.hierarchyRollup(_, _)),
    // sweep-line interval concurrency (one shuffle, no self-range-join)
    "peak_concurrency"      -> (graft.operators.Intervals.peakConcurrentEvents(_, _)),
    // time-bucketed keep-first rate limiting with suppressed-count carry
    "event_throttle"        -> (graft.operators.Throttle.eventThrottle(_, _)),
    // dense daily spine with zero-filled gaps (generated, not shuffled)
    "resample_daily"        -> (graft.operators.Resample.resampleDailyEvents(_, _)),
    // chi-square contingency cells in exact integer micros
    "chisq_contingency"     -> (graft.operators.Contingency.chisqPriorityStatus(_, _)),
    // record linkage: pigeonhole fuzzy match -> transitive closure
    "entity_components"     -> (graft.dedup.EntityResolution.entityComponents(_, _)),
    // class-weighted MLlib RandomForest fit + AUC/accuracy/importances;
    // rows-gated (tree internals have no SQL oracle) — floors and
    // determinism asserted in RandomForestSpec
    "rf_train_eval"         -> (graft.ml.RandomForestTrain.rfTrainEval(_, _)),
    // GBT through the same harness (rows-gated like rf_train_eval)
    "gbt_train_eval"        -> (graft.ml.GbtTrain.gbtTrainEval(_, _)),
    // depth-1 histogram-split fit in relational form: the one tree
    // iteration the ensembles run, integer-exact and hash-gated
    "gbt_stump"             -> (graft.ml.GbtStump.gbtStump(_, _)),
    // Saabas node-delta attribution on the one-node tree, where the
    // ensemble-attribution principle is SQL-expressible and hash-gates
    "stump_attribution"     -> (graft.ml.GbtStump.stumpAttribution(_, _)),
    // one full LEVEL of recursive tree growth: per-side histogram fit
    "gbt_stump2"            -> (graft.ml.GbtStump.gbtStump2(_, _)),
    // per-row Saabas path contributions off the fitted RF (rows-gated;
    // exact additivity + signal concentration in RfAttributionSpec)
    "rf_attribution"        -> (graft.ml.RfAttribution.rfAttribution(_, _)),
    // margin-space Saabas over the boosted model (the SHAP-demo shape)
    "gbt_attribution"       -> (graft.ml.RfAttribution.gbtAttribution(_, _)),
    // concurrent hyperparameter grid through the shared harness
    "rf_param_sweep"        -> (graft.ml.ParamSweep.rfParamSweep(_, _)),
    // ASHA successive halving over nested hash-fraction rungs
    "asha_sweep"            -> (graft.ml.AshaSweep.ashaOrders(_, _)),
    // TPE proposal over the completed ASHA trials: good/bad quantile
    // split -> triangular-kernel densities -> argmax l(x)/g(x)
    "tpe_sweep"             -> (graft.ml.TpeSweep.tpeOrders(_, _)),
    // suggest -> observe -> suggest: round 1's proposal evaluated on
    // the full pool, appended as config 16, re-proposed
    "tpe_round2"            -> (graft.ml.TpeSweep.tpeRound2Orders(_, _)),
    "tpe_forecast"          -> (graft.ml.TpeForecast.tpeForecastEvents(_, _)),
    "tpe_forecast_round2"   -> (graft.ml.TpeForecast.tpeForecastRound2(_, _)),
    "pointwise_fit"         -> (graft.ml.PointwiseRanker.pointwiseFit(_, _)),
    // tune×recsys: TPE over the pointwise ranker's ridge strength,
    // observed by the exact-mean nDCG scoreboard (ray_tune_pointwise)
    "asha_pointwise"        -> (graft.ml.AshaPointwise.ashaPointwiseOrders(_, _)),
    "tpe_pointwise"         -> (graft.ml.TpePointwise.tpePointwiseOrders(_, _)),
    "tpe_pointwise_round2"  -> (graft.ml.TpePointwise.tpePointwiseRound2(_, _)),
    "embed_docs_exhaustive" -> (graft.operators.EmbedDocs.embedDocumentsExhaustive(_, _)),
    "pointwise_eval"        -> (graft.ml.PointwiseRanker.pointwiseEval(_, _)),
    // PSI distribution drift: exact integer bins, smoothed shares,
    // micros log terms (fixed cardinality after one scan per side)
    "psi_value_drift"       -> (graft.operators.Drift.psiValueDrift(_, _)),
    // reciprocal rank fusion in pure integer arithmetic over two
    // scalable global ranks (hybrid-retrieval combiner)
    "rrf_fusion"            -> (graft.operators.RankFusion.rrfDocs(_, _)),
    // exact tie-correct Mann-Whitney AUC per group (doubled midranks
    // keep everything BIGINT until one ratio per group)
    "auc_by_group"          -> (graft.operators.ExactAuc.aucEvents(_, _)),
    // reliability-diagram bins: ntileExact deciles + exact per-bin sums
    "calibration_bins"      -> (graft.operators.Calibration.calibrationEvents(_, _)),
    // join-key skew profile: Gini + top-key shares from the count table
    "key_skew_profile"      -> (graft.operators.KeySkew.keySkewLineitem(_, _)),
    // median/MAD robust outlier screen: discrete indexed order stats by
    // histogram cumulation, raw rows touched once
    "mad_outliers"          -> (graft.operators.Robust.madOutliersEvents(_, _)),
    // per-cell mutual information over exact margins (feature selection)
    "mutual_info"           -> (graft.operators.MutualInfo.miCustomer(_, _)),
    // KS statistic: peak CDF separation, exact by cross-multiplication
    "ks_by_group"           -> (graft.operators.ExactAuc.ksEvents(_, _)),
    // BPE merge mining over the (word, freq) vocab; rows-gated (greedy
    // argmax recursion has no SQL oracle) — sequence asserted in spec
    "bpe_merges"            -> (graft.functions.BpeMerges.bpeMergesDocs(_, _)),
    // k=1 degeneracy: first merge == SQL argmax over weighted pair counts
    "bpe_first_merge"       -> (graft.functions.BpeMerges.bpeFirstMerge(_, _)),
    "bpe_encode"            -> (graft.functions.BpeEncode.bpeEncodeDocs(_, _)),
    // per-source tokenizer fertility (tokens/word) over the encode output
    "bpe_fertility"         -> (graft.functions.BpeEncode.bpeFertilityDocs(_, _)),
    "bpe_vocab"             -> (graft.functions.BpeEncode.bpeVocabDocs(_, _)),
    "token_pack_bpe"        -> (graft.functions.BpeEncode.tokenPackBpeDocs(_, _)),
    // T5 MLM span corruption over the encode output: hash-deterministic
    // noise spans -> sentinel input + span targets (the collator step)
    "span_corrupt"          -> (graft.operators.SpanCorrupt.spanCorruptDocs(_, _)),
    // p99.9 length -> max_length budget -> truncation-waste report
    "ctx_budget"            -> (graft.functions.BpeEncode.ctxBudgetDocs(_, _)),
    // packed-sequence boundary manifest (attention-mask sidecar)
    "pack_boundaries"       -> (graft.functions.BpeEncode.packBoundariesDocs(_, _)),
    // T5 group_texts: concatenate-and-chunk with remainder drop,
    // docs SPLIT across chunk boundaries (vs token_pack's doc packs)
    "group_texts_chunks"    -> (graft.functions.BpeEncode.groupTextsDocs(_, _)),
    // the full T5 composition: group_texts chunks through the collator
    "span_corrupt_chunks"   -> (graft.operators.SpanCorrupt.spanCorruptChunks(_, _)),
    // exact per-group discrete quantiles (indexed order statistics over
    // value cells — the GK sketch family's exact baseline, grouped)
    "group_quantiles"       -> (graft.operators.GroupQuantiles.quantilesLineitem(_, _)),
    // MERGE with additive schema evolution (new source column lands,
    // old rows null-backfilled, evolution joins the change compare)
    "merge_upsert_evolve"   -> (MergeUpsert.mergeEvolveCustomer(_, _)),
    // forward as-of: next right row at-or-after (label-at-horizon)
    "asof_next_click"       -> (graft.operators.AsOfJoin.asofNextClick(_, _)),
    // deterministic stratified k-fold balance sheet (portable hash fold)
    "kfold_balance"         -> (graft.operators.KFold.kfoldOrders(_, _)),
    // view->purchase conversion-lag histogram over the forward as-of
    "conversion_lag"        -> (graft.operators.ConversionLag.viewPurchaseLag(_, _)),
    // integer-exact CUSUM changepoint per event-type daily series
    // (n·prefix − k·total needs no mean and no division)
    "changepoint_cusum"     -> (graft.operators.Changepoint.changepointEvents(_, _)),
    // top-V corpus vocab + per-doc OOV per-mille (tokenizer coverage)
    "vocab_coverage"        -> (graft.functions.Vocab.vocabCoverageDocs(_, _)),
    // Heaps curve: cumulative vocab vs tokens via first-occurrence histogram
    "vocab_growth"          -> (graft.functions.VocabGrowth.vocabGrowthDocs(_, _)),
    // word2vec-style forward-window co-occurrence pair counts, map-side
    "skipgram_pairs"        -> (graft.functions.NgramStats.skipgramPairsDocs(_, _)),
    // global quantile-rank ppm transform via domain-bounded cell table
    "rank_transform"        -> (graft.operators.Ranks.rankTransformCustomer(_, _)),
    // first-3 event-type journey distribution per user
    "session_paths"         -> (graft.operators.SessionPaths.sessionPathsEvents(_, _)),
    // two-feature OLS via exact DECIMAL(38) normal equations + Cramer
    "linreg_normal_eq"      -> (graft.ml.LinReg.linregLineitem(_, _)),
    // ridge shrinkage path over the same Gram sums; c=0 row == OLS
    "ridge_normal_eq"       -> (graft.ml.Ridge.ridgeLineitem(_, _)),
    // closed-form linear SHAP: mean-|phi| feature ranking + probe-row
    // explanation, two corpus scans total (the SHAP-demo readout)
    "linear_shap"           -> (graft.ml.LinearShap.shapLineitem(_, _)),
    // pairwise Welch t² in staged exact-integer quantization
    "welch_t"               -> (graft.operators.WelchT.welchReturnflag(_, _)),
    // interval UNION per key: the other sweep next to peak_concurrency
    "interval_islands"      -> (graft.operators.Intervals.intervalIslandsEvents(_, _)),
    // GloVe X_ij: distance-weighted skip-gram counts in exact micros
    "glove_cooccur"         -> (graft.functions.NgramStats.gloveCooccurDocs(_, _)),
    // per-group distribution mapped onto the global quantile function
    "quantile_normalize"    -> (graft.operators.QuantileNormalize.quantileNormalizeCustomer(_, _)),
    // one integer power-iteration step toward the principal component
    "pca_power_step"        -> (graft.ann.PcaPowerStep.pcaPowerStepEmbeddings(_, _)),
    // two chained steps: the rescaled-iterate feedback edge in the gate
    "pca_power_step2"       -> (graft.ann.PcaPowerStep.pcaPowerStep2Embeddings(_, _)),
    // nDCG@10 / MRR / P@10 with a precomputed integer discount table
    "ndcg_eval"             -> (graft.operators.RankMetrics.ndcgEvents(_, _)),
    // top-M co-purchased parts per part (capped co-visitation matrix)
    "covisit_topk"          -> (graft.operators.Covisitation.covisitParts(_, _)),
    // co-visitation recommender recall/precision/MAP@k vs temporal holdout
    "recsys_eval"           -> (graft.operators.Covisitation.recsysEval(_, _)),
    // triangles + degree on the bounded top-K co-supply graph
    "triangle_count"        -> (graft.operators.GraphMetrics.triangleCoSupply(_, _)),
    // one synchronous majority label-propagation round, same graph
    "label_prop_step"       -> (graft.operators.GraphMetrics.labelPropCoSupply(_, _)),
    // Resource-Allocation link prediction: top missing co-supply links
    "link_predict"          -> (graft.operators.GraphMetrics.linkPredictCoSupply(_, _)),
    // local clustering coefficient permicro per node, same graph
    "clustering_coeff"      -> (graft.operators.GraphMetrics.clusteringCoeffCoSupply(_, _)),
    // degree assortativity: exact rational Pearson r (symmetric form)
    "assortativity"         -> (graft.operators.GraphMetrics.assortativityCoSupply(_, _)),
    // four synchronous 3-core peeling rounds, oracle-unrolled
    "kcore_peel"            -> (graft.operators.GraphMetrics.kcorePeelCoSupply(_, _)),
    // 1.5 HITS power iterations (integer hub/authority) on the trade graph
    "hits_scores"           -> (graft.operators.GraphMetrics.hitsTrade(_, _)),
    // exact n²-scaled ACF at lags 1..7 per event-type daily series
    "acf_lags"              -> (graft.operators.Autocorr.acfEvents(_, _)),
    // residual/randomness diagnostics over the same daily spine
    "durbin_watson"         -> (graft.operators.TsDiagnostics.durbinWatsonEvents(_, _)),
    "ljung_box"             -> (graft.operators.TsDiagnostics.ljungBoxEvents(_, _)),
    "runs_test"             -> (graft.operators.TsDiagnostics.runsTestEvents(_, _)),
    // robust rolling-median/MAD anomaly flags on the daily spine
    "hampel_outliers"       -> (graft.operators.Hampel.hampelEvents(_, _)),
    // calendar-lag cross-correlation between two event-type series
    "ccf_lags"              -> (graft.operators.CrossCorr.ccfEvents(_, _)),
    // schema-constraint discovery: FD and inclusion-dependency sweeps
    "fd_discover"           -> (graft.operators.Profiling.fdOrders(_, _)),
    "ind_discover"          -> (graft.operators.Profiling.indOrders(_, _)),
    // Chao1 richness + GT coverage of the token vocabulary
    "chao1_richness"        -> (graft.functions.GoodTuring.chao1Documents(_, _)),
    // two-margin survey raking of a sample to population margins
    "ipf_rake"              -> (graft.operators.IpfRake.rakeOrders(_, _)),
    // rank-based trend tests on the daily spine
    "mann_kendall"          -> (graft.operators.TrendTests.mannKendallEvents(_, _)),
    // Hirsch-Slack seasonal MK: within-weekday pairs, summed strata stats
    "seasonal_mk"           -> (graft.operators.TrendTests.seasonalMkEvents(_, _)),
    // Hirsch-Slack seasonal Sen slope: within-weekday pairs, pooled median
    "sen_slope_seasonal"    -> (graft.operators.TheilSen.senSlopeSeasonalEvents(_, _)),
    "friedman_test"         -> (graft.operators.TrendTests.friedmanEvents(_, _)),
    // Pareto frontier on (order count, revenue)
    "skyline_2d"            -> (graft.operators.Skyline.skylineCustomers(_, _)),
    // systematic PPS draw per market segment over the salted cumsum
    "pps_sample"            -> (graft.operators.PpsSample.ppsCustomers(_, _)),
    // directed association rules (confidence/lift permicro) over baskets
    "assoc_rules"           -> (graft.operators.Basket.assocRulesLineitem(_, _)),
    // cumulative gains/lift table over exact score deciles
    "lift_deciles"          -> (graft.operators.Calibration.liftEvents(_, _)),
    // k-NN majority-vote label transfer over the ANN neighbor lists
    "knn_classify"          -> (graft.ann.KnnClassify.knnClassifyEmbeddings(_, _)),
    // truncation-class near-dup: strict-prefix detection by sorted adjacency
    "dedup_prefix"          -> (graft.dedup.PrefixDedup.prefixDupDocs(_, _)),
    // Hamilton largest-remainder training-mix allocation (Σ = budget exact)
    "mixture_plan"          -> (graft.operators.MixturePlan.mixtureDocs(_, _)),
    // directional shingle-containment near-dup (df-capped candidates)
    "dedup_containment"     -> (graft.dedup.NGramJaccard.containmentDocs(_, _)),
    // one exact PAVA pooling pass over ranked score bins (isotonic fit)
    "isotonic_step"         -> (graft.ml.Isotonic.isotonicStepEvents(_, _)),
    // exact ROC/PR curve points by histogram cumulation over score cells
    "roc_points"            -> (graft.operators.RocCurve.rocEvents(_, _)),
    // integer-exact additive decomposition (trend/weekly season/residual)
    "seasonal_decompose"    -> (graft.operators.SeasonalDecompose.decomposeEvents(_, _)),
    // Gini coefficient + 20-cell Lorenz curve of customer revenue
    "gini_lorenz"           -> (graft.operators.Gini.giniCustomerRevenue(_, _)),
    // exact Kendall tau-a + tie decomposition over domain-bounded cells
    "kendall_tau"           -> (graft.operators.Kendall.kendallLineitem(_, _)),
    // reciprocal top-k pairs: the hub-resistant near-dup clustering edges
    "ann_mutual_knn"        -> (graft.ann.MutualKnn.mutualKnnEmbeddings(_, _)),
    // exact Mann-Whitney 2U + rank-biserial over bounded value cells
    "mann_whitney"          -> (graft.operators.MannWhitney.mannWhitneyLineitem(_, _)),
    // Spearman rho on centered doubled ranks, exact isqrt permicro
    "spearman_rho"          -> (graft.operators.Spearman.spearmanLineitem(_, _)),
    // Kruskal-Wallis H: k-sample rank ANOVA in staged exact division
    "kruskal_wallis"        -> (graft.operators.KruskalWallis.kruskalLineitem(_, _)),
    // Brown–Forsythe equal-variance test on the bounded cell histogram
    "levene_bf"             -> (graft.operators.LeveneTest.leveneLineitem(_, _)),
    // TextRank keywords: weighted integer PageRank on word co-occurrence
    "textrank_keywords"     -> (graft.functions.TextRank.textrankDocuments(_, _)),
    // cross-document duplicated-n-gram share (RefinedWeb-style audit)
    "crossdoc_ngram_share"  -> (graft.dedup.CrossDocNgrams.crossdocDocuments(_, _)),
    // KMV/Theta sketch set algebra: union AND intersection estimates
    "theta_sets"            -> (graft.functions.ThetaSketch.thetaCustomers(_, _)),
    // Count-Min sketch registers (both engines build identical cells)
    "cms_registers"         -> (graft.functions.CountMin.cmsLineitem(_, _)),
    // CMS point estimates (min over rows) for the exact top-5 keys
    "cms_topk"              -> (graft.functions.CountMin.cmsTopParts(_, _)),
    // paired before/after activity shift (continuity-corrected McNemar)
    "mcnemar"               -> (graft.operators.PairedTests.mcnemarCustomers(_, _)),
    // O'Brien-Fleming group-sequential monitor (exact rational boundaries)
    "group_sequential"      -> (graft.operators.SequentialTest.sequentialOrders(_, _)),
    // hierarchical forecast reconciliation (exact largest-remainder)
    "forecast_reconcile"    -> (graft.operators.ForecastReconcile.reconcileRevenue(_, _)),
    // two-sample log-rank test over the survival duration-cell walk
    "logrank_test"          -> (graft.operators.Survival.logrankEvents(_, _)),
    // inter-arrival Fano factor + burstiness per event type (exact isqrt)
    "burstiness"            -> (graft.operators.Burstiness.burstinessEvents(_, _)),
    // Qini/uplift deciles: hash-bit arms, cell-table deciles, exact counts
    "qini_uplift"           -> (graft.operators.Uplift.qiniOrders(_, _)),
    // return-rate trend across ordered priorities (Cochran–Armitage)
    "cochran_armitage"      -> (graft.operators.PairedTests.trendPriority(_, _)),
    // empirical-Bayes beta-binomial shrinkage of per-nation return rates
    "eb_shrinkage"          -> (graft.operators.EbShrinkage.ebNationReturns(_, _)),
    // multinomial NB language ID: train+score one plan, micro log-probs
    "nb_classify"           -> (graft.ml.NaiveBayes.nbLangDocuments(_, _)),
    // Good-Turing count-of-counts smoothing over corpus word frequencies
    "good_turing"           -> (graft.functions.GoodTuring.goodTuringDocuments(_, _)),
    // Cohen's kappa: langid heuristic vs gold labels, chance-corrected
    "cohens_kappa"          -> (graft.operators.Kappa.kappaLangid(_, _)),
    // two-sample Cramér–von Mises shape test on the Mann-Whitney pair
    "cramer_von_mises"      -> (graft.operators.CramerVonMises.cvmLineitem(_, _)),
    // Murphy decomposition of the Brier score over forecast-cent cells
    "brier_decomp"          -> (graft.operators.BrierDecomp.brierEvents(_, _)),
    // Jonckheere-Terpstra ordered trend across priority levels
    "jonckheere_trend"      -> (graft.operators.Jonckheere.jtPriorityQuantity(_, _)),
    // Zipf rank-frequency log-log OLS over the top-1000 terms
    "zipf_fit"              -> (graft.functions.ZipfFit.zipfDocuments(_, _)),
    // EWMA control chart with exact truncated-horizon geometric weights
    "ewma_chart"            -> (graft.operators.EwmaChart.ewmaEvents(_, _)),
    // depth-capped BFS hop layers over the bounded co-supply graph
    "bfs_layers"            -> (graft.operators.GraphMetrics.bfsCoSupply(_, _)),
    // weighted SSSP: 4 Bellman-Ford rounds over the co-supply graph
    "sssp_bounded"          -> (graft.operators.GraphMetrics.ssspCoSupply(_, _)),
    // Newman modularity of the nation partition over the co-supply graph
    "modularity"            -> (graft.operators.GraphMetrics.modularityCoSupply(_, _)),
    // CUPED variance reduction: integer theta fit + adjusted-metric SS
    "cuped_adjust"          -> (graft.operators.Cuped.cupedOrders(_, _)),
    // MDE sizing per arm: Z·isqrt(2·SS div n) div n, exact integers
    "power_mde"             -> (graft.operators.ExperimentDesign.powerMdeOrders(_, _)),
    // 2x2 difference-in-differences on exact truncated cell means
    "diff_in_diff"          -> (graft.operators.ExperimentDesign.didEvents(_, _)),
    // grid-bucketed exact DBSCAN core/border/noise on 2-D milli points
    "dbscan_classify"       -> (graft.operators.Dbscan.dbscanEmbeddings(_, _)),
    // dense-phase HLL: engine-identical registers + corrected estimate
    "hll_registers"         -> (graft.functions.Hll.hllOrders(_, _)),
    // Kaplan-Meier product-limit curve, integer permicro recursion
    "survival_km"           -> (graft.operators.Survival.survivalEvents(_, _)),
    // Nelson-Aalen cumulative hazard, window-sum risk-set walk
    "nelson_aalen"          -> (graft.operators.Survival.nelsonAalenEvents(_, _)),
    // Theil-Sen median-of-slopes robust trend per event series
    "theil_sen"             -> (graft.operators.TheilSen.theilSenEvents(_, _)),
    // RFM quintile segmentation over cell tables (no global ntile)
    "rfm_segment"           -> (graft.operators.RfmSegment.rfmOrders(_, _)),
    // Neyman-optimal stratified allocation w/ exact integer sqrt
    "neyman_alloc"          -> (graft.operators.Allocation.neymanOrders(_, _)),
    // hashing-trick signed feature vectors (no fit, no vocabulary)
    "feature_hash"          -> (graft.functions.FeatureHash.featureHashDocs(_, _)),
    // deterministic Poisson bootstrap CI (inverse-CDF by shared table)
    "bootstrap_ci"          -> (graft.operators.Bootstrap.bootstrapOrders(_, _)),
    // exact-rational permutation p: hash-relabeled mean difference
    "permutation_test"      -> (graft.operators.PermutationTest.permLineitem(_, _)),
    // BH step-up over per-group A/A permutation p-values, integer ppm
    "bh_fdr"                -> (graft.operators.PermutationTest.bhEvents(_, _)),
    // stratified ATE: exact per-stratum deltas + n_s-weighted pooling
    "strat_ate"             -> (graft.operators.StratifiedAte.stratifiedAteEvents(_, _)),
    // overlap-weighted ATO: e(1-e)-weighted strata, staged milli weights
    "overlap_ate"           -> (graft.operators.StratifiedAte.overlapAteEvents(_, _)),
    // one ALS half-step: per-user 2x2 ridge Cramer solve, all integer
    "als_step"              -> (graft.ml.AlsStep.alsStepOrders(_, _)),
    // first logistic Newton step from w=0: fully rational, one scan
    "logreg_newton_step"    -> (graft.ml.LogRegStep.logregLineitem(_, _)),
    // k-anonymity / l-diversity audit with global risk summary
    "k_anonymity"           -> (graft.operators.KAnonymity.kAnonymityCustomer(_, _)),
    // Mondrian median-cut repair: k-guarded cuts → range-generalized cells
    "k_anon_mondrian"       -> (graft.operators.MondrianAnon.mondrianCustomer(_, _)),
    // SemDeDup: cluster-then-prune embedding dedup (n²/k, never all-pairs)
    "semdedup"              -> (graft.dedup.SemDedup.semdedupEmbeddings(_, _)),
    // Lee et al. exact-substring signal: cross-doc repeated L-token windows
    "dedup_substring"       -> (graft.dedup.SubstringDedup.dedupSubstring(_, _)),
    // DSIR-style importance selection toward a target domain
    "importance_select"     -> (graft.operators.ImportanceSelect.importanceSelectDocs(_, _)),
    // binary-segmentation changepoint: max between-SSE cut via the CUSUM identity
    "binseg_changepoint"    -> (graft.operators.BinSeg.binsegEvents(_, _)),
    // Pettitt rank changepoint: prefix/suffix Mann-Whitney via value cells
    "pettitt_test"          -> (graft.operators.Changepoint.pettittEvents(_, _)),
    // Syntetos-Boylan ADI/CV2 quadrant: routes series to Croston vs ETS/Theta
    "demand_classify"       -> (graft.operators.DemandClassify.demandClassifyEvents(_, _)),
    // classification-routed dispatch: quadrant picks the family, leaderboard the member
    "route_forecast"        -> (graft.operators.RouteForecast.routeForecastEvents(_, _)),
    // one-pass pairwise Pearson matrix over the lineitem measures
    "corr_matrix"           -> (graft.operators.CorrMatrix.corrMatrixLineitem(_, _)),
    // GDPR delete sizing: FK-cascade counts + partition rewrite amp
    "rtbf_cascade"          -> (graft.operators.RtbfCascade.rtbfOrders(_, _)),
    // Catalyst column lineage: analyzed-plan walk, literal oracle
    "lineage_extract"       -> (graft.plans.ColumnLineage.lineageRevenueQuery(_, _)),
    // real zlib-PNG decode: chunk walk + inflate + all five un-filters
    "mm_decode_png"         -> (graft.multimodal.BinaryMedia.mmDecodePng(_, _)),
    // zone-map pruning audit: min/max skip decisions + zero-miss proof
    "zonemap_prune"         -> (graft.sources.ZoneMap.zonemapLineitem(_, _)),
    // Fellegi-Sunter linkage: precomputed log-odds over blocked pairs
    "fs_linkage"            -> (graft.dedup.FsLinkage.linkageDocs(_, _)),
    // seeded discrete-Laplace DP count release (memoized noise)
    "dp_counts"             -> (graft.operators.DpRelease.dpCustomerCounts(_, _)),
    // exact Shapley channel attribution in 1/24 units (no division)
    "shapley_attribution"   -> (graft.operators.Shapley.shapleyEvents(_, _)),
    // greedy MMR re-rank over a bounded candidate window, all integer
    "mmr_rerank"            -> (graft.ann.MmrRerank.mmrEmbeddings(_, _)),
    // conditional next-token table: the bigram LM as a relation
    "bigram_next"           -> (graft.functions.NgramStats.bigramNextDocs(_, _)),
    // interpolated Kneser-Ney bigram LM, d=3/4 exact rational permicro
    "kneser_ney_bigrams"    -> (graft.functions.NgramStats.kneserNeyDocs(_, _)),
    // exact trimmed mean via histogram cumulation, per group
    "trimmed_mean"          -> (graft.operators.Robust.trimmedMeanLineitem(_, _)),
    // one Huber IRLS step: OLS -> capped weights -> weighted refit
    "huber_irls_step"       -> (graft.ml.HuberStep.huberLineitem(_, _)),
    // Poisson-bootstrap CI for a difference of arm means (A/B)
    "bootstrap_ab"          -> (graft.operators.Bootstrap.bootstrapAbLineitem(_, _)),
    // exact equi-join size estimate from per-key count tables
    "join_size_estimate"    -> (graft.operators.JoinEstimate.joinSizeEventsOrders(_, _)),
    // sample-ratio-mismatch gate: exact chi-square vs the 3.84 literal
    "srm_check"             -> (graft.operators.SrmCheck.srmLineitem(_, _)),
    // real GIF-LZW decode: variable-width codes, dict growth, resets
    "mm_decode_gif"         -> (graft.multimodal.BinaryMedia.mmDecodeGif(_, _)),
    // mixed-script homoglyph spoof audit with planted positives
    "script_spoof_audit"    -> (graft.functions.ScriptAudit.scriptAuditDocs(_, _)),
    // real multi-frame video decode: animated GIF, per-frame stats
    "mm_video_frames"       -> (graft.multimodal.BinaryMedia.mmVideoFrames(_, _)),
    // expanding-window time-series CV schedule (no future leakage)
    "ts_cv_splits"          -> (graft.operators.TsCvSplits.tsCvEvents(_, _)),
    // Hyndman seasonal strength from the exact decomposition
    "seasonal_strength"     -> (graft.operators.SeasonalDecompose.seasonalStrength(_, _)),
    // perceptual image aHash clusters off real decoded BMP bytes
    "image_phash"           -> (graft.multimodal.Perceptual.imagePhashClusters(_, _)),
    // audio energy-delta fingerprints off real decoded WAV bytes
    "audio_fingerprint"     -> (graft.multimodal.Perceptual.audioFingerprint(_, _)),
    // token-multiset span F1 (the extractive-QA eval metric)
    "span_f1"               -> (graft.operators.EvalMetrics.spanF1Docs(_, _)),
    // exact pass@k via factorial-table binomial ratios
    "pass_at_k"             -> (graft.operators.EvalMetrics.passAtKEvents(_, _)),
    // weekly-cohort cumulative LTV curve (money over retention counts)
    "cohort_ltv"            -> (graft.operators.GrowthAnalytics.cohortLtv(_, _)),
    // Pareto/ABC classes via the salted two-phase global cumsum
    "abc_classification"    -> (graft.operators.GrowthAnalytics.abcParts(_, _)),
    // missing-partition backfill plan as coalesced gap ranges
    "backfill_plan"         -> (graft.operators.OpsAudit.backfillPlan(_, _)),
    // referential-integrity orphan audit per fact->dim relationship
    "fk_orphans"            -> (graft.operators.OpsAudit.fkOrphans(_, _)),
    // exact Wasserstein-1 drift via cross-scaled CDFs on bounded cells
    "wasserstein_drift"     -> (graft.operators.Drift.wassersteinLineitem(_, _)),
    // Cramer's V-squared effect size over the chi-square cells
    "cramers_v_sq"          -> (graft.operators.Contingency.cramersV2Orders(_, _)),
    // pinball (quantile) loss of the seasonal-naive forecast
    "pinball_loss"          -> (graft.operators.Forecast.pinballLoss(_, _)),
    // at-threshold confusion matrix + accuracy/precision/recall/F1/MCC
    "confusion_matrix"      -> (graft.operators.ConfusionStats.confusionEvents(_, _)),
    // Flesch / Flesch-Kincaid readability per document
    "doc_readability"       -> (graft.functions.Readability.readabilityDocs(_, _)),
    // Mood's median test: 2xk chi-square around the grand median
    "mood_median"           -> (graft.operators.MoodMedian.moodMedianEvents(_, _)),
    // cosine-normalized item-item similarity (item2item CF)
    "item_cosine"           -> (graft.operators.ItemSimilarity.itemCosineParts(_, _)),
    // bounded harmonic + closeness centrality, every node at once
    "closeness_centrality"  -> (graft.operators.GraphMetrics.centralityCoSupply(_, _)),
    // mean absolute SCALED error of the seasonal-naive model
    "mase_eval"             -> (graft.operators.Forecast.maseEvents(_, _)),
    // seasonal-residual median/MAD anomaly flags (S-ESD-style)
    "esd_anomalies"         -> (graft.operators.SeasonalDecompose.residualAnomalies(_, _)),
    // Ansari-Bradley rank test for scale differences (exact tie masses)
    "ansari_bradley"        -> (graft.operators.AnsariBradley.abLineitem(_, _)),
    // one lasso coordinate-descent sweep over a scale-free penalty path
    "lasso_cd_sweep"        -> (graft.ml.LassoStep.lassoLineitem(_, _)),
    // Cochran's Q: k binary treatments consistent across blocks?
    "cochran_q"             -> (graft.operators.Reliability.cochranQEvents(_, _)),
    // Cronbach's alpha reliability of the per-type daily revenue panel
    "cronbach_alpha"        -> (graft.operators.Reliability.cronbachEvents(_, _)),
    // Croston intermittent-demand forecast (exact dyadic SES, alpha=1/2)
    "croston_forecast"      -> (graft.operators.Croston.crostonEvents(_, _)),
    // partial correlation r_xy.z from one sufficient-statistics row
    "partial_corr"          -> (graft.operators.PartialCorr.partialLineitem(_, _)),
    // RANSAC consensus line fit over mixer-deterministic 2-point hypotheses
    "ransac_line"           -> (graft.ml.Ransac.ransacLineitem(_, _)),
    // XML write+read roundtrip (native Spark 4 XML source)
    "xml_roundtrip"         -> (graft.sources.Formats.xmlRoundtrip(_, _)),
    // isolation-stump multivariate anomaly scoring (no row-H explode)
    "iso_anomalies"         -> (graft.operators.IsolationStumps.isoLineitem(_, _)),
    // Page's L ordered-alternatives trend over Friedman ranks
    "page_trend"            -> (graft.operators.TrendTests.pageLEvents(_, _)),
    // Theil's U2 squared-error forecast ratio vs the naive walk
    "theil_u2"              -> (graft.operators.Forecast.theilU2Events(_, _)),
    // Benjamini-Yekutieli FDR under arbitrary dependence
    "by_fdr"                -> (graft.operators.PermutationTest.byEvents(_, _)),
    // HHI + effective-number concentration of supplier revenue per nation
    "hhi_concentration"     -> (graft.operators.Concentration.hhiSupplierNation(_, _)),
    // one Louvain modularity-gain move step from singleton communities
    "louvain_step"          -> (graft.operators.GraphMetrics.louvainCoSupply(_, _)),
    // tau-restricted mean survival time from the quantized KM curve
    "survival_rmst"         -> (graft.operators.Survival.rmstEvents(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"    -> TpchLike.q1OracleSql,
    "q3_shipping_priority"  -> TpchLike.q3OracleSql,
    "q5_local_supplier"     -> TpchLike.q5OracleSql,
    "q_top_customers_window" -> TpchLike.topCustomersOracleSql,
    "q_json_extract"        -> TpchLike.jsonExtractOracleSql,
    "q_skew_topk"           -> TpchLike.skewTopkOracleSql,
    "q4_order_priority"     -> TpchMore.q4OracleSql,
    "q7_volume_shipping"    -> TpchMore.q7OracleSql,
    "q9_product_profit"     -> TpchMore.q9OracleSql,
    "q14_promo_revenue"     -> TpchMore.q14OracleSql,
    "q17_small_qty_revenue" -> TpchMore.q17OracleSql,
    "q18_large_orders"      -> TpchMore.q18OracleSql,
    "q22_dormant_customers" -> TpchMore.q22OracleSql,
    "q13_order_distribution" -> TpchMore.q13OracleSql,
    "q21_waiting_supplier"  -> TpchMore.q21OracleSql,
    "q2_min_bal_supplier"   -> TpchFinal.q2OracleSql,
    "q11_important_parts"   -> TpchFinal.q11OracleSql,
    "q15_top_supplier"      -> TpchFinal.q15OracleSql,
    "q19_disjunctive_revenue" -> TpchFinal.q19OracleSql,
    "q6_forecast_revenue"   -> TpchRest.q6OracleSql,
    "q8_market_share"       -> TpchRest.q8OracleSql,
    "q10_returned_customers" -> TpchRest.q10OracleSql,
    "q12_priority_counts"   -> TpchRest.q12OracleSql,
    "q16_supplier_counts"   -> TpchRest.q16OracleSql,
    "q20_dominant_suppliers" -> TpchRest.q20OracleSql,
    "scd2_apply"            -> Scd2.oracleSql,
    "scd2_asof_lookup"      -> Scd2.asOfOracleSql,
    "merge_upsert"          -> MergeUpsert.oracleSql,
    "medallion_bronze"      -> Medallion.oracleSql,
    "medallion_silver"      -> Medallion.silverOracleSql,
    "medallion_gold"        -> Medallion.goldOracleSql,
    "feature_assembly"      -> FeatureAssembly.oracleSql,
    "star_split_dim"        -> StarSplit.dimOracleSql,
    "star_split_fact"       -> StarSplit.factOracleSql,
    "star_multi_dim_profile" -> StarSplit.multiDimProfileOracleSql,
    "star_multi_dim_month"  -> StarSplit.multiDimMonthOracleSql,
    "star_multi_fact"       -> StarSplit.multiFactOracleSql,
    "incremental_agg"       -> graft.operators.IncrementalAgg.oracleSql,
    "rollup_orders"         -> graft.operators.GroupingSets.rollupOracleSql,
    "cube_orders"           -> graft.operators.GroupingSets.cubeOracleSql,
    "snapshot_diff"         -> SnapshotDiff.oracleSql,
    "embed_bow_expr"        -> graft.functions.BowVectors.embedBowOracleSql,
    "embed_dim_stats"       -> graft.operators.EmbedStats.oracleSql,
    "embed_center"          -> graft.operators.EmbedStats.centerOracleSql,
    "ann_sparse_bow"        -> graft.functions.BowVectors.annSparseBowOracleSql,
    "unpivot_measures"      -> Reshape.unpivotOracleSql,
    "pivot_measures"        -> Reshape.pivotOracleSql,
    "rolling_user_features" -> RollingFeatures.oracleSql,
    "token_pack"            -> TokenPack.oracleSql,
    "quantile_bucketize"    -> Ranks.oracleSql,
    "sft_prepare"           -> SftPrep.prepareOracleSql,
    "sft_length_stats"      -> SftPrep.lengthStatsOracleSql,
    "lag_features"          -> LagFeatures.oracleSql,
    "seq_invert"            -> SeqAugment.seqInvertOracleSql,
    "seq_window_slices"     -> SeqAugment.seqWindowSlicesOracleSql,
    "chain_sessions"        -> SeqAugment.chainSessionsOracleSql,
    "group_entropy"         -> FeaturePipeline.groupEntropyOracleSql,
    "actor_profile"         -> FeaturePipeline.actorProfileOracleSql,
    "expanding_loo_mean"    -> FeaturePipeline.expandingLooMeanOracleSql,
    "expanding_mode"        -> FeaturePipeline.expandingModeOracleSql,
    "ordinal_encode"        -> FeaturePipeline.ordinalEncodeOracleSql,
    "impute_median"         -> FeaturePipeline.imputeMedianOracleSql,
    "group_split"           -> FeaturePipeline.groupSplitOracleSql,
    "range_join"            -> graft.operators.RangeJoin.oracleSql,
    "interval_overlap_join" -> graft.operators.IntervalJoin.oracleSql,
    "json_merge_agg"        -> graft.operators.JsonMerge.oracleSql,
    "feature_attnmask"      -> graft.operators.AttnMask.oracleSql,
    "t_closeness"           -> graft.operators.TCloseness.oracleSql,
    "path_betweenness"      -> graft.operators.GraphMetrics.pathBetweennessOracleSql,
    "rouge1_eval"           -> graft.operators.RougeEval.oracleSql,
    "rouge2_eval"           -> graft.operators.RougeEval.rouge2OracleSql,
    "rougeL_eval"           -> graft.operators.RougeEval.rougeLOracleSql,
    "gen_diversity"         -> graft.operators.RougeEval.genDiversityOracleSql,
    "epoch_plan"            -> graft.operators.EpochPlan.oracleSql,
    "memorization_audit"    -> graft.operators.MemorizationAudit.oracleSql,
    "epoch_materialize"     -> graft.operators.EpochPlan.materializeOracleSql,
    "bloom_prune_join"      -> graft.operators.BloomPrune.oracleSql,
    "conformal_calibrate"   -> graft.operators.Conformal.oracleSql,
    "forecast_backtest"     -> graft.operators.Forecast.oracleSql,
    "holt_winters_backtest" -> graft.operators.HoltWinters.oracleSql,
    "theta_backtest"        -> graft.operators.Theta.oracleSql,
    "yule_walker_ar2"       -> graft.operators.YuleWalker.oracleSql,
    "auto_forecast4"        -> graft.operators.AutoForecast.autoForecast4OracleSql,
    "auto_forecast"         -> graft.operators.AutoForecast.oracleSql,
    "forecast_cv_leaderboard" -> graft.operators.ForecastCv.oracleSql,
    "neural_window_frames"  -> graft.operators.NeuralWindows.oracleSql,
    "gbt_stump"             -> graft.ml.GbtStump.oracleSql,
    "asha_sweep"            -> graft.ml.AshaSweep.oracleSql,
    "tpe_sweep"             -> graft.ml.TpeSweep.oracleSql,
    "tpe_round2"            -> graft.ml.TpeSweep.round2OracleSql,
    "tpe_forecast"          -> graft.ml.TpeForecast.oracleSql,
    "tpe_forecast_round2"   -> graft.ml.TpeForecast.round2OracleSql,
    "pointwise_fit"         -> graft.ml.PointwiseRanker.fitOracleSql,
    "asha_pointwise"        -> graft.ml.AshaPointwise.oracleSql,
    "tpe_pointwise"         -> graft.ml.TpePointwise.oracleSql,
    "tpe_pointwise_round2"  -> graft.ml.TpePointwise.round2OracleSql,
    "embed_docs_exhaustive" -> graft.functions.BowVectors.embedBowOracleSql,
    "pointwise_eval"        -> graft.ml.PointwiseRanker.evalOracleSql,
    "stump_attribution"     -> graft.ml.GbtStump.attributionOracleSql,
    "gbt_stump2"            -> graft.ml.GbtStump.oracle2Sql,
    "kmeans_step"           -> graft.ann.KmeansStep.oracleSql,
    "kmeans_step2"          -> graft.ann.KmeansStep.oracle2Sql,
    "cluster_validity"      -> graft.ann.ClusterValidity.oracleSql,
    "davies_bouldin"        -> graft.ann.ClusterValidity.daviesBouldinOracleSql,
    "forecast_intervals"    -> graft.operators.ForecastIntervals.oracleSql,
    "ensemble_forecast"     -> graft.operators.EnsembleForecast.oracleSql,
    "forecast_quantiles"    -> graft.operators.ForecastQuantiles.oracleSql,
    "forecast_predict"      -> graft.operators.ForecastPredict.oracleSql,
    "bpe_first_merge"       -> graft.functions.BpeMerges.firstMergeOracleSql,
    "bpe_merges"            -> graft.functions.BpeMerges.mergesOracleSql,
    "bpe_encode"            -> graft.functions.BpeEncode.encodeOracleSql,
    "bpe_fertility"         -> graft.functions.BpeEncode.fertilityOracleSql,
    "bpe_vocab"             -> graft.functions.BpeEncode.vocabOracleSql,
    "token_pack_bpe"        -> graft.functions.BpeEncode.tokenPackOracleSql,
    "span_corrupt"          -> graft.operators.SpanCorrupt.oracleSql,
    "ctx_budget"            -> graft.functions.BpeEncode.ctxBudgetOracleSql,
    "pack_boundaries"       -> graft.functions.BpeEncode.packBoundariesOracleSql,
    "group_texts_chunks"    -> graft.functions.BpeEncode.groupTextsOracleSql,
    "span_corrupt_chunks"   -> graft.operators.SpanCorrupt.chunksOracleSql,
    "freq_topk_exact"       -> graft.operators.FreqSketch.oracleSql,
    "skew_salted_join"      -> graft.operators.SkewJoin.oracleSql,
    "sample_k_per_group"    -> Sampling.sampleKOracleSql,
    "row_serialize"         -> Serialize.oracleSql,
    "decontaminate"         -> Decontaminate.oracleSql,
    "curation_pipeline"     -> graft.operators.CurationPipeline.oracleSql,
    "curation_trace"        -> graft.operators.CurationPipeline.traceOracleSql,
    "curation_incremental"  -> graft.operators.CurationIncremental.oracleSql,
    "ctx_truncation"        -> graft.functions.BpeEncode.ctxTruncationOracleSql,
    "submix_temperature"    -> Sampling.submixTemperatureOracleSql,
    "colnames_camel"        -> ColumnNames.oracleSql,
    "submix_sample"         -> Sampling.oracleSql,
    "hash_split"            -> Sampling.hashSplitOracleSql,
    "shard_assign"          -> Sampling.shardAssignOracleSql,
    "negative_sample"       -> graft.operators.NegativeSample.oracleSql,
    "compaction"            -> Compaction.oracleSql,
    "zorder_values"         -> graft.operators.Zorder.oracleSql,
    "zorder_zonemap"        -> graft.operators.Zorder.zonemapOracleSql,
    "bucketed_join_agg"     -> graft.operators.BucketedJoin.oracleSql,
    "funnel_stages"         -> graft.operators.Funnel.oracleSql,
    "dq_report"             -> graft.operators.DataQuality.oracleSql,
    "jsonl_roundtrip"       -> graft.sources.Formats.oracleSql,
    "chat_template"         -> graft.operators.ChatTemplate.oracleSql,
    "json_field_eval"       -> graft.operators.JsonFieldEval.oracleSql,
    "eval_experiment_delta" -> graft.operators.JsonFieldEval.deltaOracleSql,
    "orc_roundtrip"         -> graft.sources.Formats.oracleSql,
    "csv_roundtrip"         -> graft.sources.Formats.oracleSql,
    // embed_docs: encoder vectors are engine-internal — rows-gated;
    // encoder semantics + batching asserted in PipelineOpsSpec
    "salted_cumsum"         -> SaltedCumSum.oracleSql,
    "sessionize"            -> Sessionize.sessionsOracleSql,
    "evt_window_agg"        -> Sessionize.hourlyAggOracleSql,
    "count_encode"          -> FeatureEncoders.countEncodeOracleSql,
    "target_encode"         -> FeatureEncoders.targetEncodeOracleSql,
    "onehot_encode"         -> FeatureEncoders.oneHotOracleSql,
    "scale_standard"        -> Scaling.standardOracleSql,
    "scale_minmax"          -> Scaling.minMaxOracleSql,
    "winsorize"             -> Scaling.winsorizeOracleSql,
    "scale_robust"          -> Scaling.robustScaleOracleSql,
    "merge_upsert_delete"   -> MergeUpsert.mergeDeleteOracleSql,
    "schema_shrink"         -> SchemaTools.shrinkPlanOracleSql,
    "column_classify"       -> SchemaTools.classifyOracleSql,
    "numeric_profile"       -> SchemaTools.numericProfileOracleSql,
    "skew_kurtosis"         -> graft.operators.Moments.oracleSql,
    "weighted_median"       -> graft.operators.WeightedMedian.oracleSql,
    "class_weights"         -> SchemaTools.classWeightsOracleSql,
    "dim_date"              -> DimDate.oracleSql,
    "concurrent_table_stats" -> Concurrent.oracleSql,
    "sketch_quantiles_exact" -> Sketches.quantilesExactOracleSql,
    "sketch_quantiles_lineitem" -> Sketches.gkOracleSql,
    "sketch_distinct_exact"  -> graft.functions.DistinctSketch.oracleSql,
    "audience_overlap"       -> graft.functions.DistinctSketch.overlapOracleSql,
    "hierarchy_flatten"     -> Hierarchy.oracleSql,
    "bom_explode"           -> graft.operators.BomExplode.oracleSql,
    "graph_components"      -> graft.operators.Graph.graphComponentsOracleSql,
    "text_tokens"           -> TextFunctions.textTokensOracleSql,
    "pii_redact"            -> graft.functions.TextClean.piiRedactOracleSql,
    "extract_entities"      -> graft.functions.TextClean.extractEntitiesOracleSql,
    "text_normalize"        -> graft.functions.TextClean.textNormalizeOracleSql,
    "quality_filter"        -> graft.functions.TextClean.qualityFilterOracleSql,
    "text_quality"          -> TextFunctions.textQualityOracleSql,
    "text_langid"           -> TextFunctions.textLangidOracleSql,
    "doc_fingerprint"       -> TextFunctions.docFingerprintOracleSql,
    "winnow_fingerprints"   -> TextFunctions.winnowOracleSql,
    "dedup_incremental"     -> graft.dedup.IncrementalDedup.oracleSql,
    "corpus_stats"          -> TextFunctions.corpusStatsOracleSql,
    "topk_per_group"        -> graft.functions.TopKAgg.oracleSql,
    "dedup_exact"           -> ExactDedup.oracleSql,
    "dedup_cluster_stats"   -> ExactDedup.clusterStatsOracleSql,
    "dedup_ngram_jaccard"   -> NGramJaccard.oracleSql,
    "dedup_embedding"       -> EmbeddingDedup.oracleSql,
    // the degenerate 1x0-bit LSH pipeline must equal the exact all-pairs
    "dedup_embedding_exhaustive" -> EmbeddingDedup.oracleSql,
    "dedup_minhash_exhaustive"   -> MinHashLsh.exhaustiveOracleSql,
    "ann_bruteforce"        -> BruteForceKnn.oracleSql,
    "ann_ivf_exhaustive"    -> BruteForceKnn.oracleSql,
    "ann_lsh_exhaustive"    -> BruteForceKnn.oracleSql,
    "ann_pq_exhaustive"     -> BruteForceKnn.oracleSql,
    "mm_meta"               -> BinaryMedia.mmMetaOracleSql,
    "mm_decode_bmp"         -> BinaryMedia.mmDecodeBmpOracleSql,
    "mm_decode_wav"         -> BinaryMedia.mmDecodeWavOracleSql,
    "mm_framesample"        -> BinaryMedia.mmFramesampleOracleSql,
    "mm_resize"             -> BinaryMedia.mmResizeOracleSql,
    "mm_zip_expand"         -> ArchiveIngest.oracleSql,
    "asof_purchase_click"   -> graft.operators.AsOfJoin.oracleSql,
    "attribution_last_touch" -> graft.operators.Attribution.lastTouchOracleSql,
    "attribution_first_touch" -> graft.operators.Attribution.firstTouchOracleSql,
    "basket_pairs_lineitem" -> graft.operators.Basket.oracleSql,
    "cohort_retention_orders" -> graft.operators.Cohort.oracleSql,
    "hist_totalprice"       -> graft.operators.Histogram.oracleSql,
    "editdist_pairs"        -> graft.dedup.EditDistance.oracleSql,
    "tfidf_terms"           -> graft.functions.TextScoring.tfidfOracleSql,
    "bm25_topk"             -> graft.functions.TextScoring.bm25OracleSql,
    "pmi_bigrams"           -> graft.functions.NgramStats.pmiOracleSql,
    "gopher_repetition"     -> graft.functions.NgramStats.repetitionOracleSql,
    "doc_surprisal"         -> graft.functions.NgramStats.surprisalOracleSql,
    "doc_bigram_surprisal"  -> graft.functions.NgramStats.bigramSurprisalOracleSql,
    "doc_chunks"            -> graft.operators.Chunker.oracleSql,
    "pagerank_trade"        -> graft.operators.PageRank.oracleSql,
    "corr_lineitem"         -> graft.operators.GroupStats.oracleSql,
    "partitioned_roundtrip" -> graft.sources.PartitionedLayout.oracleSql,
    "partition_overwrite"   -> graft.sources.PartitionedLayout.overwriteOracleSql,
    "table_time_travel"     -> graft.sources.VersionedTable.oracleSql,
    "table_change_feed"     -> graft.sources.VersionedTable.changeFeedOracleSql,
    "ivm_change_feed"       -> graft.operators.ViewMaintain.oracleSql,
    "table_compact"         -> graft.sources.VersionedTable.compactOracleSql,
    "table_schema_evolution" -> graft.sources.VersionedTable.schemaEvolutionOracleSql,
    "table_checkpoint"      -> graft.sources.VersionedTable.checkpointOracleSql,
    "table_merge_pruned"    -> graft.sources.VersionedTable.mergePrunedOracleSql,
    "table_dv_delete"       -> graft.sources.VersionedTable.dvDeleteOracleSql,
    "table_vacuum"          -> graft.sources.VersionedTable.vacuumOracleSql,
    "bitemporal_lookup"     -> graft.operators.Bitemporal.oracleSql,
    "markov_transitions"    -> graft.operators.BehaviorStats.markovOracleSql,
    "decay_user_value"      -> graft.operators.BehaviorStats.decayOracleSql,
    "benford_totalprice"    -> graft.operators.DigitProfile.oracleSql,
    "hierarchy_rollup"      -> Hierarchy.rollupOracleSql,
    "peak_concurrency"      -> graft.operators.Intervals.oracleSql,
    "event_throttle"        -> graft.operators.Throttle.oracleSql,
    "resample_daily"        -> graft.operators.Resample.oracleSql,
    "chisq_contingency"     -> graft.operators.Contingency.oracleSql,
    "entity_components"     -> graft.dedup.EntityResolution.oracleSql,
    "psi_value_drift"       -> graft.operators.Drift.oracleSql,
    "rrf_fusion"            -> graft.operators.RankFusion.oracleSql,
    "auc_by_group"          -> graft.operators.ExactAuc.oracleSql,
    "calibration_bins"      -> graft.operators.Calibration.oracleSql,
    "key_skew_profile"      -> graft.operators.KeySkew.oracleSql,
    "mad_outliers"          -> graft.operators.Robust.oracleSql,
    "mutual_info"           -> graft.operators.MutualInfo.oracleSql,
    "ks_by_group"           -> graft.operators.ExactAuc.ksOracleSql,
    "group_quantiles"       -> graft.operators.GroupQuantiles.oracleSql,
    "merge_upsert_evolve"   -> MergeUpsert.mergeEvolveOracleSql,
    "asof_next_click"       -> graft.operators.AsOfJoin.forwardOracleSql,
    "kfold_balance"         -> graft.operators.KFold.oracleSql,
    "conversion_lag"        -> graft.operators.ConversionLag.oracleSql,
    "changepoint_cusum"     -> graft.operators.Changepoint.oracleSql,
    "vocab_coverage"        -> graft.functions.Vocab.oracleSql,
    "vocab_growth"          -> graft.functions.VocabGrowth.oracleSql,
    "skipgram_pairs"        -> graft.functions.NgramStats.skipgramOracleSql,
    "rank_transform"        -> graft.operators.Ranks.rankTransformOracleSql,
    "session_paths"         -> graft.operators.SessionPaths.oracleSql,
    "linreg_normal_eq"      -> graft.ml.LinReg.oracleSql,
    "ridge_normal_eq"       -> graft.ml.Ridge.oracleSql,
    "linear_shap"           -> graft.ml.LinearShap.oracleSql,
    "welch_t"               -> graft.operators.WelchT.oracleSql,
    "interval_islands"      -> graft.operators.Intervals.islandsOracleSql,
    "glove_cooccur"         -> graft.functions.NgramStats.gloveOracleSql,
    "quantile_normalize"    -> graft.operators.QuantileNormalize.oracleSql,
    "pca_power_step"        -> graft.ann.PcaPowerStep.oracleSql,
    "pca_power_step2"       -> graft.ann.PcaPowerStep.oracle2Sql,
    "ndcg_eval"             -> graft.operators.RankMetrics.oracleSql,
    "covisit_topk"          -> graft.operators.Covisitation.covisitOracleSql,
    "recsys_eval"           -> graft.operators.Covisitation.evalOracleSql,
    "triangle_count"        -> graft.operators.GraphMetrics.triangleOracleSql,
    "label_prop_step"       -> graft.operators.GraphMetrics.labelPropOracleSql,
    "link_predict"          -> graft.operators.GraphMetrics.linkPredictOracleSql,
    "clustering_coeff"      -> graft.operators.GraphMetrics.clusteringCoeffOracleSql,
    "assortativity"         -> graft.operators.GraphMetrics.assortativityOracleSql,
    "kcore_peel"            -> graft.operators.GraphMetrics.kcorePeelOracleSql,
    "nelson_aalen"          -> graft.operators.Survival.nelsonAalenOracleSql,
    "theil_sen"             -> graft.operators.TheilSen.oracleSql,
    "rfm_segment"           -> graft.operators.RfmSegment.oracleSql,
    "neyman_alloc"          -> graft.operators.Allocation.oracleSql,
    "hits_scores"           -> graft.operators.GraphMetrics.hitsOracleSql,
    "acf_lags"              -> graft.operators.Autocorr.oracleSql,
    "durbin_watson"         -> graft.operators.TsDiagnostics.durbinWatsonOracleSql,
    "ljung_box"             -> graft.operators.TsDiagnostics.ljungBoxOracleSql,
    "runs_test"             -> graft.operators.TsDiagnostics.runsTestOracleSql,
    "hampel_outliers"       -> graft.operators.Hampel.oracleSql,
    "ccf_lags"              -> graft.operators.CrossCorr.oracleSql,
    "fd_discover"           -> graft.operators.Profiling.fdOracleSql,
    "ind_discover"          -> graft.operators.Profiling.indOracleSql,
    "chao1_richness"        -> graft.functions.GoodTuring.chao1OracleSql,
    "ipf_rake"              -> graft.operators.IpfRake.oracleSql,
    "mann_kendall"          -> graft.operators.TrendTests.mannKendallOracleSql,
    "seasonal_mk"           -> graft.operators.TrendTests.seasonalMkOracleSql,
    "sen_slope_seasonal"    -> graft.operators.TheilSen.senSlopeSeasonalOracleSql,
    "friedman_test"         -> graft.operators.TrendTests.friedmanOracleSql,
    "skyline_2d"            -> graft.operators.Skyline.oracleSql,
    "pps_sample"            -> graft.operators.PpsSample.oracleSql,
    "assoc_rules"           -> graft.operators.Basket.rulesOracleSql,
    "lift_deciles"          -> graft.operators.Calibration.liftOracleSql,
    "knn_classify"          -> graft.ann.KnnClassify.oracleSql,
    "dedup_prefix"          -> graft.dedup.PrefixDedup.oracleSql,
    "mixture_plan"          -> graft.operators.MixturePlan.oracleSql,
    "dedup_containment"     -> graft.dedup.NGramJaccard.containmentOracleSql,
    "isotonic_step"         -> graft.ml.Isotonic.oracleSql,
    "roc_points"            -> graft.operators.RocCurve.oracleSql,
    "seasonal_decompose"    -> graft.operators.SeasonalDecompose.oracleSql,
    "gini_lorenz"           -> graft.operators.Gini.oracleSql,
    "kendall_tau"           -> graft.operators.Kendall.oracleSql,
    "ann_mutual_knn"        -> graft.ann.MutualKnn.oracleSql,
    "mann_whitney"          -> graft.operators.MannWhitney.oracleSql,
    "spearman_rho"          -> graft.operators.Spearman.oracleSql,
    "kruskal_wallis"        -> graft.operators.KruskalWallis.oracleSql,
    "levene_bf"             -> graft.operators.LeveneTest.oracleSql,
    "crossdoc_ngram_share"  -> graft.dedup.CrossDocNgrams.oracleSql,
    "textrank_keywords"     -> graft.functions.TextRank.oracleSql,
    "theta_sets"            -> graft.functions.ThetaSketch.oracleSql,
    "cms_registers"         -> graft.functions.CountMin.registersOracleSql,
    "cms_topk"              -> graft.functions.CountMin.estimateOracleSql,
    "mcnemar"               -> graft.operators.PairedTests.mcnemarOracleSql,
    "qini_uplift"           -> graft.operators.Uplift.oracleSql,
    "burstiness"            -> graft.operators.Burstiness.oracleSql,
    "logrank_test"          -> graft.operators.Survival.logrankOracleSql,
    "forecast_reconcile"    -> graft.operators.ForecastReconcile.oracleSql,
    "group_sequential"      -> graft.operators.SequentialTest.oracleSql,
    "cochran_armitage"      -> graft.operators.PairedTests.trendOracleSql,
    "eb_shrinkage"          -> graft.operators.EbShrinkage.oracleSql,
    "nb_classify"           -> graft.ml.NaiveBayes.oracleSql,
    "good_turing"           -> graft.functions.GoodTuring.oracleSql,
    "cohens_kappa"          -> graft.operators.Kappa.oracleSql,
    "cramer_von_mises"      -> graft.operators.CramerVonMises.oracleSql,
    "brier_decomp"          -> graft.operators.BrierDecomp.oracleSql,
    "jonckheere_trend"      -> graft.operators.Jonckheere.oracleSql,
    "zipf_fit"              -> graft.functions.ZipfFit.oracleSql,
    "ewma_chart"            -> graft.operators.EwmaChart.oracleSql,
    "bfs_layers"            -> graft.operators.GraphMetrics.bfsOracleSql,
    "sssp_bounded"          -> graft.operators.GraphMetrics.ssspOracleSql,
    "modularity"            -> graft.operators.GraphMetrics.modularityOracleSql,
    "cuped_adjust"          -> graft.operators.Cuped.oracleSql,
    "power_mde"             -> graft.operators.ExperimentDesign.powerMdeOracleSql,
    "diff_in_diff"          -> graft.operators.ExperimentDesign.didOracleSql,
    "dbscan_classify"       -> graft.operators.Dbscan.oracleSql,
    "hll_registers"         -> graft.functions.Hll.oracleSql,
    "sketch_distinct_events" -> graft.functions.Hll.groupedOracleSql,
    "survival_km"           -> graft.operators.Survival.oracleSql,
    "feature_hash"          -> graft.functions.FeatureHash.oracleSql,
    "bootstrap_ci"          -> graft.operators.Bootstrap.oracleSql,
    "permutation_test"      -> graft.operators.PermutationTest.oracleSql,
    "bh_fdr"                -> graft.operators.PermutationTest.bhOracleSql,
    "strat_ate"             -> graft.operators.StratifiedAte.oracleSql,
    "overlap_ate"           -> graft.operators.StratifiedAte.overlapOracleSql,
    "als_step"              -> graft.ml.AlsStep.oracleSql,
    "logreg_newton_step"    -> graft.ml.LogRegStep.oracleSql,
    "k_anonymity"           -> graft.operators.KAnonymity.oracleSql,
    "k_anon_mondrian"       -> graft.operators.MondrianAnon.oracleSql,
    "semdedup"              -> graft.dedup.SemDedup.oracleSql,
    "dedup_substring"       -> graft.dedup.SubstringDedup.oracleSql,
    "importance_select"     -> graft.operators.ImportanceSelect.oracleSql,
    "binseg_changepoint"    -> graft.operators.BinSeg.oracleSql,
    "pettitt_test"          -> graft.operators.Changepoint.pettittOracleSql,
    "demand_classify"       -> graft.operators.DemandClassify.oracleSql,
    "route_forecast"        -> graft.operators.RouteForecast.oracleSql,
    "corr_matrix"           -> graft.operators.CorrMatrix.oracleSql,
    "rtbf_cascade"          -> graft.operators.RtbfCascade.oracleSql,
    "lineage_extract"       -> graft.plans.ColumnLineage.oracleSql,
    "mm_decode_png"         -> graft.multimodal.BinaryMedia.mmDecodePngOracleSql,
    "zonemap_prune"         -> graft.sources.ZoneMap.oracleSql,
    "fs_linkage"            -> graft.dedup.FsLinkage.oracleSql,
    "dp_counts"             -> graft.operators.DpRelease.oracleSql,
    "shapley_attribution"   -> graft.operators.Shapley.oracleSql,
    "mmr_rerank"            -> graft.ann.MmrRerank.oracleSql,
    "bigram_next"           -> graft.functions.NgramStats.bigramNextOracleSql,
    "kneser_ney_bigrams"    -> graft.functions.NgramStats.kneserNeyOracleSql,
    "trimmed_mean"          -> graft.operators.Robust.trimmedMeanOracleSql,
    "huber_irls_step"       -> graft.ml.HuberStep.oracleSql,
    "bootstrap_ab"          -> graft.operators.Bootstrap.abOracleSql,
    "join_size_estimate"    -> graft.operators.JoinEstimate.oracleSql,
    "srm_check"             -> graft.operators.SrmCheck.oracleSql,
    "mm_decode_gif"         -> graft.multimodal.BinaryMedia.mmDecodeGifOracleSql,
    "script_spoof_audit"    -> graft.functions.ScriptAudit.oracleSql,
    "mm_video_frames"       -> graft.multimodal.BinaryMedia.mmVideoFramesOracleSql,
    "ts_cv_splits"          -> graft.operators.TsCvSplits.oracleSql,
    "seasonal_strength"     -> graft.operators.SeasonalDecompose.strengthOracleSql,
    "image_phash"           -> graft.multimodal.Perceptual.imagePhashOracleSql,
    "audio_fingerprint"     -> graft.multimodal.Perceptual.audioFingerprintOracleSql,
    "span_f1"               -> graft.operators.EvalMetrics.spanF1OracleSql,
    "pass_at_k"             -> graft.operators.EvalMetrics.passAtKOracleSql,
    "cohort_ltv"            -> graft.operators.GrowthAnalytics.cohortLtvOracleSql,
    "abc_classification"    -> graft.operators.GrowthAnalytics.abcOracleSql,
    "backfill_plan"         -> graft.operators.OpsAudit.backfillPlanOracleSql,
    "fk_orphans"            -> graft.operators.OpsAudit.fkOrphansOracleSql,
    "wasserstein_drift"     -> graft.operators.Drift.wassersteinOracleSql,
    "cramers_v_sq"          -> graft.operators.Contingency.cramersOracleSql,
    "pinball_loss"          -> graft.operators.Forecast.pinballOracleSql,
    "confusion_matrix"      -> graft.operators.ConfusionStats.oracleSql,
    "doc_readability"       -> graft.functions.Readability.oracleSql,
    "mood_median"           -> graft.operators.MoodMedian.oracleSql,
    "item_cosine"           -> graft.operators.ItemSimilarity.oracleSql,
    "closeness_centrality"  -> graft.operators.GraphMetrics.centralityOracleSql,
    "mase_eval"             -> graft.operators.Forecast.maseOracleSql,
    "esd_anomalies"         -> graft.operators.SeasonalDecompose.anomaliesOracleSql,
    "ansari_bradley"        -> graft.operators.AnsariBradley.oracleSql,
    "lasso_cd_sweep"        -> graft.ml.LassoStep.oracleSql,
    "cochran_q"             -> graft.operators.Reliability.cochranOracleSql,
    "cronbach_alpha"        -> graft.operators.Reliability.cronbachOracleSql,
    "croston_forecast"      -> graft.operators.Croston.oracleSql,
    "partial_corr"          -> graft.operators.PartialCorr.oracleSql,
    "ransac_line"           -> graft.ml.Ransac.oracleSql,
    "xml_roundtrip"         -> graft.sources.Formats.oracleSql,
    "iso_anomalies"         -> graft.operators.IsolationStumps.oracleSql,
    "page_trend"            -> graft.operators.TrendTests.pageOracleSql,
    "theil_u2"              -> graft.operators.Forecast.theilU2OracleSql,
    "by_fdr"                -> graft.operators.PermutationTest.byOracleSql,
    "hhi_concentration"     -> graft.operators.Concentration.oracleSql,
    "louvain_step"          -> graft.operators.GraphMetrics.louvainOracleSql,
    "survival_rmst"         -> graft.operators.Survival.rmstOracleSql,
    // dedup_minhash_lsh / dedup_simhash / ann_lsh / ann_ivf: probabilistic
    // candidate generation — rows-gated by the driver; semantics asserted
    // in DedupSpec / AnnSpec (planted pairs, measured recall floors)
  )
}
