package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipes.{CdcPipes, TpchPipes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public API surface: one named entry per
  * operator/endpoint from SURVEY.md §2 (the Spark analogue of the
  * reference's published pipe endpoints, §2.10). `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's differential correctness gate.
  *
  * Determinism contract shared by every query/oracle pair:
  *  - rows globally ordered by a unique key in BOTH engines;
  *  - fractional sums via integer-unit summation (ChFunctions.exactSum),
  *    so results don't depend on partition merge order;
  *  - `events.ts` nanos truncated to micros on the Spark side, matching
  *    DuckDB's ns→µs read-time truncation;
  *  - integer CASE-sums cast to BIGINT in DuckDB (its sum(int) is
  *    HUGEINT, which pandas would widen to float).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchPipes.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Staging location for the dedup pair-graph artifacts
    * ([[graft.operators.TextDedup.writeDedupArtifacts]]), keyed by the
    * source sf dir so scale factors can't cross-contaminate. The build
    * is input-fingerprinted: unchanged docs/embeddings parquet → the
    * staged artifacts are reused as-is (skip); any byte change →
    * rebuild. Regen-proof AND idempotent-cheap, and the per-dir build
    * lock serializes concurrent HTTP invocations. */
  private[graft] def dedupArtifactsDir(sfDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft_dedup_artifacts_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
      .getAbsolutePath

  private[graft] def fixtureDir(spark: SparkSession): String = synchronized {
    val dir = oracle.OracleCtes.fixtureFile
    val marker = new java.io.File(dir, "_DONE")
    if (!marker.exists()) {
      // a dir without the marker is a half-finished previous attempt
      // (crash between generation and marker): rebuild from scratch so
      // the append-mode users_batch can't accumulate duplicate
      // generations. (Verify/Bench never run concurrently.)
      if (dir.exists()) graft.sources.Layout.deleteRec(dir)
      val g = graft.fixtures.CdcFixtures.generate()
      graft.fixtures.CdcFixtures.writeAll(spark, g, dir.toString)
      graft.pipes.UsersPipes.usersBatchCopy(spark, dir.toString, s"$dir/users_batch")
      marker.createNewFile()
    }
    dir.toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC / latest-state family (SURVEY §2.4) over `events`
    "latest_event_per_user" -> (CdcPipes.latestEventPerUser _),
    "users_latest_rmt"      -> (CdcPipes.usersLatestRmt _),
    "users_api_batch"       -> (CdcPipes.usersApiBatch _),
    // time-series endpoints (SURVEY §2.5 A10, §2.7 G1)
    "active_users_per_hour" -> (CdcPipes.activeUsersPerHour _),
    "active_users_per_hour_salted" -> (CdcPipes.activeUsersPerHourSalted _),
    "active_users_7d_sliding" -> (CdcPipes.activeUsers7dSliding _),
    "users_weekly_churn"    -> (CdcPipes.usersWeeklyChurn _),
    "events_type_transitions" -> (CdcPipes.eventsTypeTransitions _),
    "events_cohort_retention" -> (CdcPipes.eventsCohortRetention _),
    "q18_large_orders"      -> ((s, d) => TpchPipes.q18LargeOrders(s, d)),
    "q20_dominant_suppliers" -> ((s, d) => TpchPipes.q20DominantSuppliers(s, d)),
    "q6_forecast_revenue"   -> (TpchPipes.q6ForecastRevenue _),
    "q9_product_profit"     -> ((s, d) => TpchPipes.q9ProductProfit(s, d)),
    "q10_returned_items"    -> (TpchPipes.q10ReturnedItems _),
    "q12_late_priority_audit" -> (TpchPipes.q12LatePriorityAudit _),
    "q13_order_count_distribution" -> (TpchPipes.q13OrderCountDistribution _),
    "q14_promo_revenue"     -> (TpchPipes.q14PromoRevenue _),
    "q15_top_supplier"      -> (TpchPipes.q15TopSupplier _),
    "q16_supplier_relationships" -> ((s, d) => TpchPipes.q16SupplierRelationships(s, d)),
    "q5_local_supplier_volume" -> ((s, d) => TpchPipes.q5LocalSupplierVolume(s, d)),
    "q7_volume_shipping"    -> ((s, d) => TpchPipes.q7VolumeShipping(s, d)),
    "customer_reconcile"    -> (CdcPipes.customerReconcile _),
    "active_users_per_hour_approx" -> ((s, d) => CdcPipes.activeUsersPerHourApprox(s, d)),
    "active_users_sketch_rollup" -> ((s, d) => CdcPipes.activeUsersSketchRollup(s, d)),
    "active_users_kmv_per_hour" -> ((s, d) => CdcPipes.activeUsersKmvPerHour(s, d)),
    "active_users_kmv_daily" -> ((s, d) => CdcPipes.activeUsersKmvDailyMerge(s, d)),
    "events_kmv_overlap"    -> ((s, d) => operators.Sketches.kmvTypeOverlap(s, d)),
    "events_quantile_sketch" -> ((s, d) => operators.Sketches.quantileSketch(s, d)),
    "docs_source_overlap"   -> ((s, d) => operators.Sketches.sourceShingleOverlap(s, d)),
    "error_pct_per_hour"    -> (CdcPipes.errorPctPerHour _),
    "active_vs_errors"      -> (CdcPipes.activeVsErrors _),
    "user_activity"         -> (CdcPipes.userActivity _),
    "events_by_type_status" -> (CdcPipes.eventsByTypeStatus _),
    "value_by_type_status"  -> (CdcPipes.valueByTypeStatus _),
    "events_ingest_normalize" -> (CdcPipes.eventsIngestNormalize _),
    "events_sessionization" -> (CdcPipes.eventsSessionization _),
    "events_surge_windows"  -> ((s, d) => operators.RangeJoin.surgeWindows(s, d).orderBy("surge_type", "window_start")),
    "events_interval_join"  -> ((s, d) => operators.RangeJoin.intervalJoin(s, d)),
    "events_session_concurrency" -> ((s, d) => operators.RangeJoin.sessionConcurrency(s, d)),
    "docs_profile"          -> ((s, d) => operators.Profile.docsProfile(s, d)),
    "docs_pipeline_funnel"  -> ((s, d) => operators.Profile.pipelineFunnel(s, d)),
    "docs_dsir_weights"     -> ((s, d) => operators.TrainingMix.dsirWeights(s, d)),
    "docs_pagerank"         -> ((s, d) =>
      operators.TextDedup.dupGraphPagerankAuto(s, d, dedupArtifactsDir(d))),
    "events_value_quantiles" -> (CdcPipes.eventsValueQuantiles _),
    "events_hourly_anomalies" -> ((s, d) => CdcPipes.eventsHourlyAnomalies(s, d)),
    "events_value_histogram" -> (CdcPipes.eventsValueHistogram _),
    "events_grouping_sets"  -> (CdcPipes.eventsGroupingSets _),
    "events_rolling_value"  -> (CdcPipes.eventsRollingValue _),
    "user_value_deciles"    -> (CdcPipes.userValueDeciles _),
    "user_rfm_segments"     -> (CdcPipes.userRfmSegments _),
    "user_window_features"  -> ((s, d) => CdcPipes.userWindowFeatures(s, d)),
    "user_attribution"      -> (CdcPipes.userAttribution _),
    "user_event_paths"      -> ((s, d) => CdcPipes.userEventPaths(s, d)),
    "q11_important_stock"   -> ((s, d) => TpchPipes.q11ImportantStock(s, d)),
    "orders_pivot"          -> (TpchPipes.ordersPivot _),
    "events_funnel"         -> ((s, d) => CdcPipes.eventsFunnel(s, d)),
    "cheapest_supplier_per_part" -> (TpchPipes.cheapestSupplierPerPart _),
    "nation_trade_flows"    -> (TpchPipes.nationTradeFlows _),
    "events_retention"      -> (CdcPipes.eventsRetention _),
    "orders_rollup"         -> (TpchPipes.ordersRollup _),
    "lineitem_cube"         -> (TpchPipes.lineitemCube _),
    "top3_orders_per_segment" -> (TpchPipes.top3OrdersPerSegment _),
    "events_quarantine"     -> (CdcPipes.eventsQuarantine _),
    "events_in_window"      -> ((s, d) => CdcPipes.eventsInWindow(s, d)),
    "events_asof_join"      -> (operators.AsOfJoin.eventsAsOfJoin _),
    // relational coverage (SURVEY §2.2/2.3/2.5/2.6/2.7)
    "q1_pricing_summary"    -> (TpchPipes.q1PricingSummary _),
    "q8_market_share"       -> ((s, d) => TpchPipes.q8MarketShare(s, d)),
    "q3_shipping_priority"  -> ((s, d) => TpchPipes.q3ShippingPriority(s, d)),
    "q4_order_priority"     -> (TpchPipes.q4OrderPriority _),
    "q17_small_qty_revenue" -> ((s, d) => TpchPipes.q17SmallQuantityRevenue(s, d)),
    "q19_disjunctive_revenue" -> (TpchPipes.q19DisjunctiveRevenue _),
    "q22_sales_opportunity" -> ((s, d) => TpchPipes.q22SalesOpportunity(s, d)),
    "q21_waiting_suppliers" -> (TpchPipes.q21WaitingSuppliers _),
    "orders_unpivot"        -> (TpchPipes.ordersUnpivot _),
    "orders_price_percentile" -> (TpchPipes.ordersPricePercentile _),
    "tpch_integrity_audit"  -> (operators.Audit.integrityAudit _),
    "mktsegment_revenue"    -> (TpchPipes.mktsegmentRevenue _),
    "region_revenue"        -> (TpchPipes.regionRevenue _),
    "top_customers"         -> (TpchPipes.topCustomers _),
    "customers_without_orders" -> (TpchPipes.customersWithoutOrders _),
    "customers_with_big_orders" -> (TpchPipes.customersWithBigOrders _),
    "high_value_orders"     -> (TpchPipes.highValueOrders _),
    "customer_order_stats"  -> (TpchPipes.customerOrderStats _),
    "orders_status_matrix"  -> (TpchPipes.ordersStatusMatrix _),
    "union_high_low_parts"  -> (TpchPipes.unionHighLowParts _),
    "parts_except"          -> (TpchPipes.partsExcept _),
    "regions_cross"         -> (TpchPipes.regionsCross _),
    "scalar_functions"      -> (TpchPipes.scalarFunctions _),
    // training-data pipeline: text analysis (SURVEY-beyond ops)
    "docs_token_stats"      -> (operators.TextAnalysis.tokenStats _),
    "docs_quality_score"    -> (operators.TextAnalysis.qualityScore _),
    "docs_lang_id"          -> (operators.TextAnalysis.langId _),
    "docs_fingerprint"      -> (operators.TextAnalysis.fingerprint _),
    "docs_rolling_fingerprints" -> ((s, d) => operators.TextAnalysis.rollingFingerprints(s, d)),
    "docs_contamination"    -> ((s, d) => operators.TextAnalysis.contaminationCheck(s, d)),
    "docs_cms_top_terms"    -> ((s, d) => operators.Sketches.cmsTopTerms(s, d)),
    "docs_bloom_contamination" -> ((s, d) => operators.Sketches.bloomContamination(s, d)),
    "docs_bm25_search"      -> ((s, d) => operators.Search.bm25Search(s, d)),
    "docs_bm25_rerank"      -> ((s, d) => operators.Search.bm25Rerank(s, d)),
    "docs_hybrid_rrf"       -> ((s, d) => operators.Search.rrfFusion(s, d)),
    "docs_chunks"           -> ((s, d) => operators.TextAnalysis.chunks(s, d)),
    "docs_split_assign"     -> (operators.TextAnalysis.splitAssign _),
    "docs_top_bigrams"      -> ((s, d) => operators.TextAnalysis.topBigrams(s, d)),
    "docs_bpe_merges"       -> ((s, d) => operators.TextAnalysis.bpeMergeCandidates(s, d)),
    "docs_bpe_encode"       -> ((s, d) => operators.TextAnalysis.bpeEncode(s, d)),
    "docs_top_terms"        -> ((s, d) => operators.TextAnalysis.topTermsPerDoc(s, d)),
    "docs_tfidf_pairs"      -> ((s, d) => operators.TextAnalysis.tfidfPairs(s, d)),
    "docs_tfidf_neighbors"  -> ((s, d) => operators.TextAnalysis.tfidfNeighbors(s, d)),
    "docs_topic_clusters"   -> ((s, d) => operators.TextAnalysis.topicClusters(s, d)),
    "docs_source_divergence" -> ((s, d) => operators.TextAnalysis.sourceDivergence(s, d)),
    // auto-routed through the staged pair graph when the artifact set
    // is current (same result, staged speedup) — see dupClustersAuto
    "docs_split_leakage"    -> ((s, d) =>
      operators.TextDedup.splitLeakageAuto(s, d, dedupArtifactsDir(d))),
    "docs_dedup_canonical"  -> ((s, d) =>
      operators.TextDedup.canonicalSelectAuto(s, d, dedupArtifactsDir(d))),
    "docs_repetition_filters" -> ((s, d) => operators.TextAnalysis.repetitionFilters(s, d)),
    "docs_lm_score"         -> (operators.TextAnalysis.lmScore _),
    "docs_lm_buckets"       -> (operators.TextAnalysis.lmBuckets _),
    "docs_boilerplate"      -> ((s, d) => operators.TextAnalysis.boilerplateCoverage(s, d)),
    "customer_pii_scrub"    -> (operators.Privacy.customerPiiScrub _),
    "docs_pii_scrub"        -> (operators.Privacy.docsPiiScrub _),
    "lineitem_zorder"       -> (operators.Zorder.lineitemZorder _),
    // training-data pipeline: mix construction
    "docs_sample_stratified" -> (operators.TrainingMix.stratifiedSample _),
    "docs_sample_per_source" -> ((s, d) => operators.TrainingMix.samplePerSource(s, d)),
    "docs_temperature_mix"  -> ((s, d) => operators.TrainingMix.temperatureMix(s, d)),
    "docs_top_quality_diverse" -> ((s, d) => operators.TrainingMix.topQualityDiverse(s, d)),
    "docs_budget_select"    -> ((s, d) => operators.TrainingMix.budgetSelect(s, d)),
    "docs_sample_weighted_stats" -> (operators.TrainingMix.sampleWeightedStats _),
    "docs_pack_sequences"   -> ((s, d) => operators.TrainingMix.packSequences(s, d)),
    "docs_training_corpus"  -> ((s, d) =>
      operators.TrainingMix.buildCorpusAuto(s, d, dedupArtifactsDir(d))),
    "docs_training_corpus_v2" -> ((s, d) =>
      operators.TrainingMix.buildCorpusV2Auto(s, d, dedupArtifactsDir(d))),
    // training-data pipeline: dedup suite
    "docs_exact_dedup"      -> (operators.TextDedup.exactDedup _),
    "docs_near_dup_pairs"   -> ((s, d) =>
      operators.TextDedup.nearDupPairsAuto(s, d, dedupArtifactsDir(d))),
    "docs_dup_clusters"     -> ((s, d) =>
      operators.TextDedup.dupClustersAuto(s, d, dedupArtifactsDir(d))),
    "docs_dedup_artifacts"  -> ((s, d) => {
      val art = dedupArtifactsDir(d)
      operators.TextDedup.writeDedupArtifacts(s, d, art)
      operators.TextDedup.dedupArtifactSummary(s, d, art)
    }),
    // auto-routed through the staged span table (round-13): same
    // result, the winnow+join pipeline runs at stage time not read time
    "docs_substring_spans"  -> ((s, d) =>
      operators.TextDedup.substringSpansAuto(s, d, dedupArtifactsDir(d))),
    "docs_span_doc_stats"   -> ((s, d) =>
      operators.TextDedup.spanDocStatsAuto(s, d, dedupArtifactsDir(d))),
    "docs_dedup_rewrite"    -> ((s, d) =>
      operators.TextDedup.dedupRewriteAuto(s, d, dedupArtifactsDir(d))),
    "docs_near_dup_edit_distance" -> ((s, d) =>
      operators.TextDedup.nearDupEditDistanceAuto(s, d, dedupArtifactsDir(d))),
    "docs_minhash_bands"    -> (operators.TextDedup.minhashBands _),
    // auto-routed (round-14): the staged band/shingle index IS this
    // query's input — serving from it removes the per-call corpus
    // re-shingle + 16-lane minhash recompute (162 s at sf100)
    "docs_minhash_lsh_pairs" -> ((s, d) =>
      operators.TextDedup.minhashLshPairsAuto(s, d, dedupArtifactsDir(d))),
    "docs_screen_increment" -> ((s, d) =>
      operators.TextDedup.screenIncrementAuto(s, d, dedupArtifactsDir(d))),
    "docs_simhash"          -> (operators.TextDedup.simhash _),
    // training-data pipeline: similarity search
    "emb_norms"             -> (operators.VectorOps.norms _),
    "emb_knn_bruteforce"    -> ((s, d) => operators.VectorOps.knnBruteForce(s, d)),
    "emb_knn_lsh"           -> ((s, d) => operators.VectorOps.knnLsh(s, d)),
    "emb_ann_recall"        -> ((s, d) => operators.VectorOps.annRecall(s, d)),
    // auto-routed: serves from the staged probe layout when the
    // artifact is current (strictly faster, same result), else
    // self-contained — the layout stops being an opt-in endpoint
    // variant and becomes how the default endpoint scales
    "emb_near_dup_pairs"    -> ((s, d) =>
      operators.VectorOps.nearDupPairsAuto(s, d, dedupArtifactsDir(d))),
    // the same pair graph served from the persisted multi-probe IVF
    // layout — currency-gated (round-14): when the staged artifact is
    // current, the staged emb_pairs table IS this output (the build
    // stored exactly this join's result) and it serves as a parquet
    // read; on miss the endpoint keeps its restage-and-join shape
    "emb_near_dup_pairs_ivf" -> ((s, d) =>
      operators.VectorOps.nearDupPairsIvfAuto(s, d, dedupArtifactsDir(d))),
    // incremental screening over the layout — currency-gated (round-14):
    // when current, incoming probes AND existing cells both read from
    // the staged layout (zero corpus scans, no per-call full-corpus
    // anchor assignment); on miss, build-then-screen as before
    "emb_screen_increment"  -> ((s, d) =>
      operators.VectorOps.screenIncrementLayoutAuto(s, d, dedupArtifactsDir(d))),
    "emb_ivf_assign"        -> ((s, d) => operators.VectorOps.ivfAssign(s, d)),
    "emb_pq_codes"          -> ((s, d) => operators.VectorOps.pqCodes(s, d)),
    "emb_knn_pq"            -> ((s, d) => operators.VectorOps.knnPq(s, d)),
    "emb_knn_ivf_pq"        -> ((s, d) => operators.VectorOps.knnIvfPq(s, d)),
    "emb_centroid_update"   -> ((s, d) => operators.VectorOps.centroidUpdate(s, d)),
    "emb_source_outliers"   -> ((s, d) => operators.VectorOps.sourceOutliers(s, d)),
    "emb_hard_negatives"    -> ((s, d) => operators.VectorOps.hardNegatives(s, d)),
    "emb_kmeans"            -> ((s, d) => operators.VectorOps.kmeans(s, d)),
    "emb_dup_clusters"      -> ((s, d) =>
      operators.VectorOps.dupClustersAuto(s, d, dedupArtifactsDir(d))),
    "emb_knn_ivf"           -> ((s, d) => operators.VectorOps.knnIvf(s, d)),
    "emb_quantize"          -> (operators.VectorOps.quantize _),
    // training-data pipeline: multimodal binary columns
    "docs_binary_meta"      -> (operators.Multimodal.binaryMeta _),
    "docs_decode_features"  -> (operators.Multimodal.decodeFeatures _),
    "docs_audio_features"   -> (operators.Multimodal.audioFeatures _),
    "docs_video_frames"     -> (operators.Multimodal.videoFrameFeatures _),
    "docs_frame_sample"     -> ((s, d) => operators.Multimodal.frameSample(s, d)),
    "docs_binary_chunks"    -> ((s, d) => operators.Multimodal.binaryChunks(s, d)),
    // pipe-for-pipe reference endpoints over generated CDC fixtures
    // (oracled against the same fixture parquet via read_parquet, and
    // differential-tested against generator truth in ReferencePipesSpec)
    "ref_users_api_rmt" -> ((s, _) => pipes.UsersPipes.usersApiRmt(s, fixtureDir(s))),
    "ref_users_api_mysql" -> ((s, _) => pipes.UsersPipes.usersApiMysql(s, fixtureDir(s))),
    "ref_users_snapshot_diff" -> ((s, _) => pipes.UsersPipes.usersSnapshotDiff(s, fixtureDir(s))),
    "users_scd2_history" -> ((s, _) => pipes.UsersPipes.usersScd2(s, fixtureDir(s))),
    "ref_users_api_batch" -> ((s, _) => {
      val d = fixtureDir(s)
      pipes.UsersPipes.usersApiBatch(s, d, s"$d/users_batch")
    }),
    "ref_latest_flight_info" -> ((s, _) =>
      pipes.AirportPipes.latestFlightInfo(s, fixtureDir(s)).orderBy("id")),
    "ref_latest_passenger_info" -> ((s, _) =>
      pipes.AirportPipes.latestPassengerInfo(s, fixtureDir(s)).orderBy("id")),
    "ref_latest_baggage_info" -> ((s, _) =>
      pipes.AirportPipes.latestBaggageInfo(s, fixtureDir(s)).orderBy("id")),
    "ref_active_flights_past_hour" -> ((s, _) =>
      pipes.AirportPipes.activeFlightsPastHour(s, fixtureDir(s))),
    "ref_flights_missed_pct_minute" -> ((s, _) =>
      pipes.AirportPipes.flightsMissedPctMinute(s, fixtureDir(s))),
    "ref_active_vs_missed_flights" -> ((s, _) =>
      // the reference pipe has no ORDER BY; pin one for the hash gate
      pipes.AirportPipes.activeVsMissedFlights(s, fixtureDir(s))
        .orderBy("time_interval")),
    "ref_passenger_activity" -> ((s, _) =>
      pipes.AirportPipes.passengerActivity(s, fixtureDir(s))),
    "ref_passengers_by_flight_status" -> ((s, _) =>
      pipes.AirportPipes.passengersByFlightStatus(s, fixtureDir(s))),
    "ref_baggage_by_flight_status" -> ((s, _) =>
      pipes.AirportPipes.baggageByFlightStatus(s, fixtureDir(s))),
  )

  /** DuckDB oracle SQL per query (contract: same column names as the
    * Spark result). The SQL lives in graft.oracle, one object per
    * family, so this file stays a registry. */
  def oracleSql: Map[String, String] =
    oracle.CdcOracles.sql ++ oracle.TpchOracles.sql ++
      oracle.DocsOracles.sql ++ oracle.EmbOracles.sql ++ oracle.RefOracles.sql
}
