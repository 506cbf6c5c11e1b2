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

  /** Version of the one-time deterministic CDC fixture set (seed 42)
    * used by the pipe-for-pipe reference endpoints (`ref_*` queries
    * below) — the reference tables (users/flights/passengers/baggage)
    * don't exist in the harness star schema, so those endpoints run on
    * generated Debezium-style logs written to a deterministic tmpdir
    * path. The DuckDB oracle reads the same parquet via read_parquet()
    * (see [[fixtureSqlPath]]), so the driver gate covers the literal
    * reference surface; ReferencePipesSpec additionally checks the
    * endpoints against the generator's in-memory source-of-truth. Bump
    * when CdcFixtures generation changes: the cache in java.io.tmpdir
    * outlives code changes within a container. */
  private val FixtureVersion = 3

  /** THE fixture location — single source for both the engine reads
    * (fixtureDir) and the oracle SQL (fixtureSqlPath); deriving the
    * path twice would let a rename silently point the oracle at stale
    * parquet. */
  private def fixtureFile: java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_cdc_fixtures_s42_v$FixtureVersion")

  /** Absolute fixture location as embedded in oracle SQL. Verify runs
    * the queries (which materialize the fixtures here) before dumping
    * oracle_sql.json, so the oracle always reads what the engine read. */
  private def fixtureSqlPath(table: String): String =
    s"read_parquet('${fixtureFile.getAbsolutePath}/$table/*.parquet')"

  /** Staging location for the dedup pair-graph artifacts
    * ([[graft.operators.TextDedup.writeDedupArtifacts]]), keyed by the
    * source sf dir so scale factors can't cross-contaminate. Unlike the
    * seed-deterministic CDC fixtures this DERIVES from the data, so the
    * registered query re-stages (overwrite) on every invocation — the
    * honest cost of the staging step, and regen-proof by construction. */
  private[graft] def dedupArtifactsDir(sfDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft_dedup_artifacts_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
      .getAbsolutePath

  private[graft] def fixtureDir(spark: SparkSession): String = synchronized {
    val dir = fixtureFile
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
    "docs_pagerank"         -> ((s, d) => operators.TextDedup.dupGraphPagerank(s, d)),
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
    "docs_split_leakage"    -> ((s, d) => operators.TextDedup.splitLeakageAudit(s, d)),
    "docs_dedup_canonical"  -> ((s, d) => operators.TextDedup.canonicalSelect(s, d)),
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
    "docs_training_corpus"  -> ((s, d) => operators.TrainingMix.buildCorpus(s, d)),
    "docs_training_corpus_v2" -> ((s, d) => operators.TrainingMix.buildCorpusV2(s, d)),
    // training-data pipeline: dedup suite
    "docs_exact_dedup"      -> (operators.TextDedup.exactDedup _),
    "docs_near_dup_pairs"   -> ((s, d) => operators.TextDedup.nearDupPairs(s, d)),
    "docs_dup_clusters"     -> ((s, d) => operators.TextDedup.dupClusters(s, d)),
    "docs_dedup_artifacts"  -> ((s, d) => {
      val art = dedupArtifactsDir(d)
      operators.TextDedup.writeDedupArtifacts(s, d, art)
      operators.TextDedup.dedupArtifactSummary(s, d, art)
    }),
    "docs_substring_spans"  -> ((s, d) => operators.TextDedup.substringSpans(s, d)),
    "docs_span_doc_stats"   -> ((s, d) => operators.TextDedup.spanDocStats(s, d)),
    "docs_dedup_rewrite"    -> ((s, d) => operators.TextDedup.dedupRewrite(s, d)),
    "docs_near_dup_edit_distance" -> ((s, d) => operators.TextDedup.nearDupEditDistance(s, d)),
    "docs_minhash_bands"    -> (operators.TextDedup.minhashBands _),
    "docs_minhash_lsh_pairs" -> ((s, d) => operators.TextDedup.minhashLshPairs(s, d)),
    "docs_screen_increment" -> ((s, d) => operators.TextDedup.screenIncrement(s, d)),
    "docs_simhash"          -> (operators.TextDedup.simhash _),
    // training-data pipeline: similarity search
    "emb_norms"             -> (operators.VectorOps.norms _),
    "emb_knn_bruteforce"    -> ((s, d) => operators.VectorOps.knnBruteForce(s, d)),
    "emb_knn_lsh"           -> ((s, d) => operators.VectorOps.knnLsh(s, d)),
    "emb_ann_recall"        -> ((s, d) => operators.VectorOps.annRecall(s, d)),
    "emb_near_dup_pairs"    -> ((s, d) => operators.VectorOps.nearDupPairs(s, d)),
    "emb_ivf_assign"        -> ((s, d) => operators.VectorOps.ivfAssign(s, d)),
    "emb_pq_codes"          -> ((s, d) => operators.VectorOps.pqCodes(s, d)),
    "emb_knn_pq"            -> ((s, d) => operators.VectorOps.knnPq(s, d)),
    "emb_knn_ivf_pq"        -> ((s, d) => operators.VectorOps.knnIvfPq(s, d)),
    "emb_centroid_update"   -> ((s, d) => operators.VectorOps.centroidUpdate(s, d)),
    "emb_source_outliers"   -> ((s, d) => operators.VectorOps.sourceOutliers(s, d)),
    "emb_hard_negatives"    -> ((s, d) => operators.VectorOps.hardNegatives(s, d)),
    "emb_kmeans"            -> ((s, d) => operators.VectorOps.kmeans(s, d)),
    "emb_dup_clusters"      -> ((s, d) => operators.VectorOps.dupClusters(s, d)),
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

  /** KMV oracle pieces (mirror CdcPipes.kmvHourlyKept / kmvEstimate):
    * the kept-partial CTE (≤ k smallest md5-low64 hashes per hour over
    * the 30-day window) and the estimator query over a (group, h)
    * relation — shared by the hourly endpoint and the daily merge so
    * the two oracles cannot drift. */
  private val KmvK = 64
  private def kmvKeptCte(k: Int = KmvK): String = {
    import graft.functions.OracleHash.duckLow64
    s"""anchor AS (SELECT max(ts) AS a FROM events),
       |hh AS (
       |  SELECT DISTINCT date_trunc('hour', ts) AS time_interval,
       |    ${duckLow64("(user_id)::VARCHAR")} AS h
       |  FROM events, anchor WHERE ts > a - INTERVAL 30 DAY),
       |kept AS (
       |  SELECT time_interval, h FROM (
       |    SELECT *, row_number() OVER (PARTITION BY time_interval ORDER BY h) AS rn FROM hh)
       |  WHERE rn <= $k)""".stripMargin
  }
  private def kmvSelect(src: String, group: String, k: Int = KmvK,
                        alias: String = "active_users_est"): String =
    s"""SELECT $group,
       |  floor((CASE WHEN n < $k THEN CAST(n AS DOUBLE)
       |    ELSE ${k - 1}.0 / ((CAST(hk AS DOUBLE) + 9223372036854775808.0) / 18446744073709551616.0)
       |    END) * 100 + 0.5) / 100.0 AS $alias
       |FROM (
       |  SELECT $group, count(*) AS n, max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM (SELECT $group, h, row_number() OVER (PARTITION BY $group ORDER BY h) AS rn FROM $src)
       |  GROUP BY $group)
       |ORDER BY $group""".stripMargin

  /** CMS lane rows (mirror Sketches.cmsLanes): one row per hash lane
    * with its md5-seeded bucket — UNION ALL because the DuckDB seeded32
    * mirror is generated per compile-time lane index. `carry` prefixes
    * columns to thread through (e.g. "term, exact_n, "). */
  private def cmsLanesSql(src: String, carry: String,
                          depth: Int = 4, width: Int = 1024): String = {
    import graft.functions.OracleHash.duckSeeded32
    (0 until depth).map(r =>
      s"SELECT $carry$r AS r, ${duckSeeded32(r, "term")} % $width AS bucket FROM $src")
      .mkString("\n  UNION ALL ")
  }

  /** Bloom position rows (mirror Sketches.bloomContamination's
    * `positions`): k md5-seeded bit positions per gram. */
  private def bloomPosSql(src: String, carry: String,
                          kHashes: Int = 4, mBits: Long = 1024L * 63): String = {
    import graft.functions.OracleHash.duckSeeded32
    (0 until kHashes).map(j =>
      s"SELECT $carry${duckSeeded32(j, "gram")} % $mBits AS p FROM $src")
      .mkString("\n  UNION ALL ")
  }

  /** The KMV estimator expression over (n, hk) columns at sketch size
    * `k` (mirror Sketches.kmvTypeOverlap's `est`). */
  private def kmvEstSql(n: String, hk: String, k: Int): String =
    s"""CASE WHEN $n < $k THEN CAST($n AS DOUBLE)
       |  ELSE ${k - 1}.0 / ((CAST($hk AS DOUBLE) + 9223372036854775808.0) / 18446744073709551616.0)
       |  END""".stripMargin

  /** Shared by the exact and salted variants: salting is a plan
    * rewrite, not a semantics change — one oracle states that in code. */
  private val activeUsersOracle =
    """WITH anchor AS (SELECT max(ts) AS a FROM events)
      |SELECT date_trunc('hour', ts) AS time_interval, count(DISTINCT user_id) AS active_users
      |FROM events, anchor WHERE ts > a - INTERVAL 30 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The multi-probe IVF embedding near-dup pipeline as DuckDB CTEs
    * (mirrors VectorOps.nearDupPairs), ending in `p(vec_a, vec_b,
    * cosine)` — shared by the pair endpoint and the embedding
    * dup-cluster closure so the two oracles can't drift apart. */
  private val embNearDupCtes =
    """anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings
      |  WHERE vec_id < greatest(8, CAST(ceil((SELECT count(*) FROM embeddings) / 250.0) AS BIGINT))),
      |sims AS (
      |  SELECT e.vec_id, list_id,
      |    floor(list_sum(list_transform(generate_series(1, len(anchor)),
      |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS sim
      |  FROM embeddings e, anchors),
      |probes AS (
      |  SELECT vec_id, list_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn FROM sims)
      |  WHERE rn <= 3),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM probes a JOIN probes b ON a.list_id = b.list_id AND a.vec_id < b.vec_id),
      |p AS (
      |  SELECT vec_a, vec_b,
      |    floor(list_sum(list_transform(generate_series(1, len(x.embedding)),
      |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
      |  FROM cand JOIN embeddings x ON x.vec_id = cand.vec_a
      |            JOIN embeddings y ON y.vec_id = cand.vec_b)""".stripMargin

  /** The Gopher repetition metrics as DuckDB CTEs (mirrors
    * TextAnalysis.repetitionFilters), ending in `per` (per-row
    * metrics) and `tp` (top-unigram fraction) — shared by the filter
    * endpoint and the v2 corpus build. */
  private val repetitionCtes =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |per AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |    floor(CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 10000 + 0.5) / 10000.0 AS distinct_ratio,
      |    CASE WHEN len(t) >= 3 THEN
      |      floor((len(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |             - len(list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))))
      |            * CAST(1 AS DOUBLE)
      |            / len(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |            * 10000 + 0.5) / 10000.0
      |    ELSE CAST(0 AS DOUBLE) END AS dup_trigram_frac
      |  FROM tok),
      |u AS (SELECT doc_id, len(t) AS n, unnest(t) AS w FROM tok),
      |tf AS (SELECT doc_id, n, w, count(*) AS c FROM u GROUP BY 1, 2, 3),
      |tp AS (
      |  SELECT doc_id, floor(CAST(max(c) AS DOUBLE) / n * 10000 + 0.5) / 10000.0 AS top_unigram_frac
      |  FROM tf GROUP BY doc_id, n)""".stripMargin

  /** Positional winnowing → df-cap → fingerprint join → offset-
    * consistent span groups, ending in `spans(doc_a, doc_b,
    * offset_delta, shared_fps, span_start_a, span_start_b,
    * span_chars)` — shared by the span endpoint and the per-doc
    * rollup (mirrors TextDedup.substringSpans stage for stage). */
  private val spanCtes =
    """rh AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, greatest(length(text)-7, 1)),
      |      i -> list_reduce(
      |             list_prepend(CAST(0 AS BIGINT),
      |               list_transform(generate_series(0, 7), j -> CAST(ascii(substring(text, i+j, 1)) AS BIGINT))),
      |             (acc, c) -> (acc*31 + c) % 1073741824)) AS h
      |  FROM documents),
      |wsel AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, greatest(len(h)-15, 1)),
      |      i -> {'pos': CAST(i - 1 + list_position(h[i:i+15], list_min(h[i:i+15])) - 1 AS INT),
      |            'fp': list_min(h[i:i+15])}) AS sel
      |  FROM rh),
      |spx AS (SELECT DISTINCT doc_id, pos, fp
      |       FROM (SELECT doc_id, unnest(sel, recursive := true) FROM wsel)),
      |dfq2 AS (SELECT fp, count(*) AS df FROM spx GROUP BY 1),
      |capped2 AS (SELECT spx.* FROM spx JOIN dfq2 USING (fp) WHERE df <= 100),
      |fpairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         a.pos AS pos_a, a.pos - b.pos AS offset_delta
      |  FROM capped2 a JOIN capped2 b ON a.fp = b.fp AND a.doc_id < b.doc_id),
      |spang AS (
      |  SELECT doc_a, doc_b, offset_delta, count(*) AS shared_fps,
      |         min(pos_a) AS span_start_a, max(pos_a) AS span_last_a
      |  FROM fpairs GROUP BY 1, 2, 3),
      |spans AS (
      |  SELECT doc_a, doc_b, offset_delta, shared_fps, span_start_a,
      |         span_start_a - offset_delta AS span_start_b,
      |         span_last_a - span_start_a + 8 AS span_chars
      |  FROM spang WHERE shared_fps >= 3)""".stripMargin

  /** The k-means train loop as a generated DuckDB CTE chain — one
    * (assign d/g, unnest x, centroid c, re-assemble a) block per
    * round, mirroring VectorOps.kmeans stage for stage: Euclidean key
    * c·c − 2·x·c on float-cast anchors (REAL round-trip = Spark's
    * `cast(centroid as float)`), 6dp floor-rounding, integer-unit
    * means. Generated, not hand-written, so changing `iters` cannot
    * desynchronize the two sides. */
  private def kmeansOracleSql(nLists: Int, iters: Int): String = {
    val sb = new StringBuilder(
      s"WITH a0 AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < $nLists)")
    for (k <- 0 until iters) sb.append(s""",
      |d$k AS (
      |  SELECT e.vec_id, e.embedding, a.list_id,
      |    floor((list_sum(list_transform(generate_series(1, len(a.anchor)),
      |             i -> CAST(a.anchor[i] AS DOUBLE) * CAST(a.anchor[i] AS DOUBLE)))
      |           - 2 * list_sum(list_transform(generate_series(1, len(a.anchor)),
      |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.anchor[i] AS DOUBLE))))
      |          * 1000000 + 0.5) / 1000000.0 AS dist
      |  FROM embeddings e, a$k a),
      |g$k AS (
      |  SELECT vec_id, embedding, list_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) rn FROM d$k)
      |  WHERE rn = 1),
      |x$k AS (
      |  SELECT list_id, CAST(g - 1 AS INT) AS dim,
      |    CAST(floor(CAST(embedding[g] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
      |  FROM g$k, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS g)),
      |c$k AS (
      |  SELECT list_id, dim, count(*) AS n_vectors,
      |    floor(CAST(sum(xs) AS BIGINT) / (count(*) * 1000000.0) * 1000000 + 0.5) / 1000000.0 AS centroid
      |  FROM x$k GROUP BY list_id, dim),
      |a${k + 1} AS (
      |  SELECT list_id, list_transform(list(centroid ORDER BY dim), c -> CAST(c AS REAL)) AS anchor
      |  FROM c$k GROUP BY list_id)""".stripMargin)
    sb.append(
      s"\nSELECT list_id, dim, n_vectors, centroid FROM c${iters - 1} ORDER BY list_id, dim")
    sb.toString
  }

  /** The df-capped near-dup pipeline as a DuckDB CTE chain (mirrors
    * TextDedup.nearDupFrom stage for stage), ending in `j(doc_a, doc_b,
    * jr)` — shared by the pair endpoint and the dup-cluster closure so
    * the two oracles can't drift apart. No `WITH` prefix: the cluster
    * oracle needs `WITH RECURSIVE`. */
  /** MinHash signature + LSH band CTEs (mirror TextDedup.minhashSignatures
    * / bandsOf over the OracleHash md5-low64 family), ending in
    * `bands(doc_id, band, band_hash)`. Shares the shingle CTEs' shapes
    * but stands alone so either oracle can be read in isolation. */
  private val minhashBandCtes: String = {
    import graft.functions.OracleHash.{duckSeeded32, duckCombine, Lanes}
    val bands = 4
    val rowsPerBand = Lanes / bands
    val sigCols = (0 until Lanes).map(j =>
      s"MIN(${duckSeeded32(j, "s")}) AS h$j").mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => s"h${b * rowsPerBand + r}")
      s"SELECT doc_id, $b AS band, ${duckCombine(hs)} AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, t[g] || ' ' || t[g+1] || ' ' || t[g+2] AS s
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS g)
       |  WHERE len(t) >= 3),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  /** Add-one-smoothed bigram LM scoring CTEs (mirror TextAnalysis.lmScore),
    * ending in `lm(doc_id, n_bigrams, lm_score)` — shared by the score
    * endpoint and the tercile-bucket endpoint so the two oracles can't
    * drift apart. */
  private val lmScoreCtes =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, t[g] AS w1, t[g+1] AS w2
      |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g)
      |  WHERE len(t) >= 2),
      |uni AS (
      |  SELECT w1, count(*) AS c1 FROM (
      |    SELECT unnest(t) AS w1 FROM tok) GROUP BY w1),
      |big AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |voc AS (SELECT count(*) AS v FROM uni),
      |terms AS (
      |  SELECT doc_id,
      |    CAST(floor((c2 + CAST(1 AS DOUBLE)) / (c1 + v) * 1000000000) AS BIGINT) AS u
      |  FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1), voc),
      |lm AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    floor(CAST(sum(u) AS BIGINT) / (count(*) * 1000000000.0) * 1000000 + 0.5) / 1000000.0 AS lm_score
      |  FROM terms GROUP BY doc_id)""".stripMargin

  /** Sparse TF-IDF weighting + pair-cosine pipeline as DuckDB CTEs,
    * ending in `tp(doc_a, doc_b, cos_raw)` — shared by the pair,
    * neighbor, and topic-cluster oracles. Integer-unit weights (capped
    * tf × clamped rational idf) make dot/norm sums exact BIGINTs; the
    * oracle joins term STRINGS where Spark joins xxhash64 longs
    * (equality-only role — a collision surfaces as a differential
    * failure, it cannot hide). */
  private val tfidfCtes =
    """tfr AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tfr GROUP BY 1),
      |ndocs AS (SELECT count(*) AS n_docs FROM documents),
      |tw AS (
      |  SELECT doc_id, term,
      |    least(tf, 255) * least(CAST(floor((n_docs + 1.0) / (df + 1.0) * 100 + 0.5) AS BIGINT), 100000) AS wu
      |  FROM tfr JOIN dft USING (term) CROSS JOIN ndocs
      |  WHERE df <= 100),
      |tnorms AS (SELECT doc_id, CAST(sum(wu * wu) AS BIGINT) AS norm2 FROM tw GROUP BY 1),
      |tdots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(sum(a.wu * b.wu) AS BIGINT) AS dot
      |  FROM tw a JOIN tw b ON a.term = b.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |tp AS (
      |  SELECT doc_a, doc_b,
      |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))) AS cos_raw
      |  FROM tdots
      |  JOIN tnorms na ON na.doc_id = doc_a
      |  JOIN tnorms nb ON nb.doc_id = doc_b)""".stripMargin

  private val nearDupCtes =
    // the oracle joins the 3-gram STRINGS while the Spark side joins
    // their xxhash64 (nearDupFrom's entry projection): jaccard depends
    // only on shingle equality, so the two agree exactly — and the
    // oracle differentially catches a hash collision as a count diff
    """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[g] || ' ' || t[g+1] || ' ' || t[g+2] AS s
      |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS g)
      |  WHERE len(t) >= 3),
      |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
      |marked AS (SELECT sh.doc_id, sh.s, df FROM sh JOIN dfreq USING (s)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |rare AS (SELECT doc_id, s FROM marked WHERE df <= 100),
      |rsizes AS (SELECT doc_id, count(*) AS n_rare FROM rare GROUP BY 1),
      |docs2 AS (
      |  SELECT sizes.doc_id, n, n - coalesce(n_rare, 0) AS n_common
      |  FROM sizes LEFT JOIN rsizes ON sizes.doc_id = rsizes.doc_id),
      |counts AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c_rare
      |  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |ub AS (
      |  SELECT doc_a, doc_b, c_rare, da.n AS na, db.n AS nb,
      |         c_rare + least(da.n_common, db.n_common) AS ub_c
      |  FROM counts JOIN docs2 da ON doc_a = da.doc_id
      |              JOIN docs2 db ON doc_b = db.doc_id
      |  WHERE (c_rare + least(da.n_common, db.n_common)) * 1.0 /
      |        (da.n + db.n - c_rare - least(da.n_common, db.n_common)) >= 0.5),
      |common AS (SELECT doc_id, s FROM marked WHERE df > 100),
      |corr AS (
      |  SELECT u.doc_a, u.doc_b, count(*) AS c_common
      |  FROM ub u JOIN common x ON x.doc_id = u.doc_a
      |            JOIN common y ON y.doc_id = u.doc_b AND y.s = x.s
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT ub.doc_a, ub.doc_b,
      |         (c_rare + coalesce(c_common, 0)) * 1.0 /
      |         (na + nb - c_rare - coalesce(c_common, 0)) AS jr
      |  FROM ub LEFT JOIN corr ON ub.doc_a = corr.doc_a AND ub.doc_b = corr.doc_b)""".stripMargin

  /** The winnowing fingerprint pipeline as DuckDB CTEs (mirrors the
    * native WinnowFingerprints expression: k=8 rolling hash, w=16
    * window minima, distinct), ending in `fp(doc_id, fps)` — shared by
    * the fingerprint endpoint and the contamination check. */
  /** Brute-force kNN as DuckDB CTEs ending in `bfr(query_id,
    * neighbor_id, cosine, rn)` — shared by the exact-search oracle and
    * the ANN recall@k evaluation so the ground truth cannot drift. */
  private val knnBfCtes =
    """bfq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
      |bfs AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    floor(list_sum(list_transform(generate_series(1, len(qe)),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
      |  FROM bfq q, embeddings e WHERE e.vec_id != q.query_id),
      |bfr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM bfs)""".stripMargin

  /** Multi-table multi-probe hyperplane LSH as DuckDB CTEs ending in
    * `lshr(query_id, neighbor_id, cosine, rn)` — fully re-derivable in
    * SQL because the planes come from md5 (VectorOps.planeComponent):
    * component (t,p,i) = first-4-bytes-BE of md5('p|t|p|i') mapped to
    * [-1,1) and rounded to float, every step exact in double on both
    * engines. Buckets are sign bits, probes flip one bit, candidates
    * dedupe, cosines rank 6dp-rounded with neighbor tie-break. Shared
    * by the LSH oracle and the recall@k evaluation. */
  private val knnLshCtes =
    """planes AS (
      |  SELECT t, p, list(CAST(
      |      ('0x' || substring(md5('p|' || t || '|' || p || '|' || i), 1, 8))::UBIGINT
      |        / 4294967296.0 * 2 - 1 AS FLOAT) ORDER BY i) AS pw
      |  FROM generate_series(0, 5) g1(t),
      |       generate_series(0, 2) g2(p),
      |       generate_series(1, 64) g3(i)
      |  GROUP BY t, p),
      |buckets AS (
      |  SELECT vec_id, t, CAST(sum(CASE WHEN
      |      list_sum(list_transform(generate_series(1, len(embedding)),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(pw[i] AS DOUBLE))) >= 0
      |    THEN 1 << p ELSE 0 END) AS INT) AS bucket
      |  FROM embeddings, planes
      |  GROUP BY vec_id, t),
      |qprobe AS (
      |  SELECT vec_id AS query_id, t, xor(bucket, flip) AS probe
      |  FROM buckets, (SELECT unnest([0, 1, 2, 4]) AS flip)
      |  WHERE vec_id < 20),
      |cand AS (
      |  SELECT DISTINCT query_id, b.vec_id AS neighbor_id
      |  FROM qprobe q JOIN buckets b ON b.t = q.t AND b.bucket = q.probe
      |  WHERE b.vec_id <> q.query_id),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    floor(list_sum(list_transform(generate_series(1, len(x.embedding)),
      |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
      |  FROM cand JOIN embeddings x ON x.vec_id = cand.query_id
      |            JOIN embeddings y ON y.vec_id = cand.neighbor_id),
      |lshr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)""".stripMargin

  /** The 30-min-gap sessionization as DuckDB CTEs ending in
    * `sess(user_id, session_id, session_start, session_end, n_events,
    * session_value)` — shared by the sessionization endpoint and the
    * session-concurrency interval join so the two cannot drift. */
  private val sessionCtes =
    """s AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM s),
      |sess AS (
      |  SELECT user_id, session_id,
      |    min(ts) AS session_start, max(ts) AS session_end,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
      |  FROM t GROUP BY user_id, session_id)""".stripMargin

  /** Per-type surge windows (hourly count > 2× the type's mean, pure
    * integer predicate, adjacent hours merged) as DuckDB CTEs ending in
    * `win(surge_type, window_start, window_end, surge_events)` — shared
    * by the window endpoint and the events-to-window range join. */
  private val surgeCtes =
    """hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, sum(n) AS tot, count(*) AS nh FROM hourly GROUP BY 1),
      |surge AS (
      |  SELECT h.event_type, h.hour, h.n
      |  FROM hourly h JOIN stats st USING (event_type)
      |  WHERE h.n * st.nh > st.tot * 2),
      |isl AS (
      |  SELECT *, epoch_us(hour) // 3600000000
      |         - row_number() OVER (PARTITION BY event_type ORDER BY hour) AS grp
      |  FROM surge),
      |win AS (
      |  SELECT event_type AS surge_type, min(hour) AS window_start,
      |         max(hour) + INTERVAL 1 HOUR AS window_end,
      |         CAST(sum(n) AS BIGINT) AS surge_events
      |  FROM isl GROUP BY event_type, grp)""".stripMargin

  private val winnowCtes =
    """rh AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, greatest(length(text)-7, 1)),
      |      i -> list_reduce(
      |             list_prepend(CAST(0 AS BIGINT),
      |               list_transform(generate_series(0, 7), j -> CAST(ascii(substring(text, i+j, 1)) AS BIGINT))),
      |             (acc, c) -> (acc*31 + c) % 1073741824)) AS h
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, greatest(len(h)-15, 1)),
      |      i -> list_min(h[i:i+15]))) AS fps
      |  FROM rh)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "latest_event_per_user" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "users_latest_rmt" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "users_api_batch" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "active_users_per_hour" -> activeUsersOracle,
    "active_users_per_hour_salted" -> activeUsersOracle,
    // Q18 shape: IN-subquery-with-HAVING decorrelated to an aggregate
    // join on the fact's own key; quantity sums are integral doubles
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200.0)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |            JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    // Q20 shape adapted (no partsupp): supplier dominates a part when
    // its shipped qty > share × the part's total shipped qty
    "q20_dominant_suppliers" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM sp GROUP BY 1),
        |f AS (
        |  SELECT l_suppkey, count(*) AS n_parts_dominated,
        |    floor(max(supp_qty / part_qty) * 10000 + 0.5) / 10000.0 AS max_share
        |  FROM sp JOIN pt USING (l_partkey)
        |  WHERE supp_qty > 0.3 * part_qty GROUP BY 1)
        |SELECT s_suppkey, s_name, n_parts_dominated, max_share
        |FROM f JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY n_parts_dominated DESC, s_suppkey""".stripMargin,
    // Q6 shape: triple-pushed-filter scan, one-row aggregate
    "q6_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    // Q9 shape: LIKE-gated 4-way join, profit by supplier nation × year
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // Q10 shape: one-quarter returned-line revenue per customer, top 20
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    // Q12 adapted: late = shipped >30 days after order date; mode = linestatus
    "q12_late_priority_audit" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    // Q5 shape: one-region revenue where supplier and customer share a nation
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    // Q7 shape: bilateral nation-pair trade volume by ship year
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // Q13 shape: histogram of orders-per-customer (LEFT JOIN keeps zeros)
    "q13_order_count_distribution" ->
      """WITH c AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |  ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14 shape: conditional-ratio aggregate from ONE integer-unit pass
    "q14_promo_revenue" ->
      """WITH t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_units,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_units
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT promo_units / 10000.0 AS promo_revenue,
        |  total_units / 10000.0 AS total_revenue,
        |  CASE WHEN total_units > 0
        |    THEN floor(promo_units * 100.0 / total_units * 10000 + 0.5) / 10000.0 END AS promo_pct
        |FROM t""".stripMargin,
    // Q15 shape: tie-preserving argmax over integer-unit revenue
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, rev_units / 10000.0 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_units = (SELECT max(rev_units) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // Q16 shape: distinct-supplier counts per part class, NOT-IN exclusion
    "q16_supplier_relationships" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |  AND p_brand <> 'Brand#15' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // cohort triangle: first-seen week per user, per-cell distinct
    // actives; day diff of week-truncated stamps div 7 is pure integer
    "events_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1),
        |m AS (
        |  SELECT cohort_week,
        |    CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS weeks_since,
        |    count(DISTINCT uw.user_id) AS n_active
        |  FROM uw JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort_week, weeks_since, n_active, cohort_size,
        |  floor(CAST(n_active AS DOUBLE) * 100.0 / cohort_size * 100 + 0.5) / 100.0 AS retention_pct
        |FROM m JOIN sz USING (cohort_week) ORDER BY 1, 2""".stripMargin,
    "events_type_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (SELECT from_type, to_type, count(*) AS n FROM t
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  floor(n * 1.0 / sum(n) OVER (PARTITION BY from_type) * 10000 + 0.5) / 10000.0 AS share
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "users_weekly_churn" ->
      """WITH w1 AS (SELECT DISTINCT user_id FROM events
        |            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
        |w2 AS (SELECT DISTINCT user_id FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15')
        |SELECT user_id, status FROM (
        |  SELECT user_id, 'retained' AS status FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2)
        |  UNION ALL
        |  SELECT user_id, 'churned' FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2)
        |  UNION ALL
        |  SELECT user_id, 'new' FROM (SELECT * FROM w2 EXCEPT SELECT * FROM w1))
        |ORDER BY user_id, status""".stripMargin,
    "customer_reconcile" ->
      """WITH high AS (
        |  SELECT o_custkey AS hk, count(*) AS n_high FROM orders
        |  WHERE o_totalprice > 400000 GROUP BY 1),
        |recent AS (
        |  SELECT o_custkey AS rk, count(*) AS n_recent FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1)
        |SELECT coalesce(hk, rk) AS custkey,
        |  CASE WHEN hk IS NOT NULL AND rk IS NOT NULL THEN 'both'
        |       WHEN hk IS NOT NULL THEN 'high_only'
        |       ELSE 'recent_only' END AS status,
        |  coalesce(n_high, 0) AS n_high,
        |  coalesce(n_recent, 0) AS n_recent
        |FROM high FULL OUTER JOIN recent ON hk = rk
        |ORDER BY custkey""".stripMargin,
    "active_users_7d_sliding" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |mx AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
        |cov AS (SELECT CAST(day + CAST(g AS INT) AS TIMESTAMP) AS cover_day, user_id
        |        FROM du, LATERAL (SELECT unnest(generate_series(0, 6)) AS g))
        |SELECT cover_day, count(DISTINCT user_id) AS active_users_7d
        |FROM cov, mx WHERE cover_day <= max_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // KMV sketch: approximate distinct with DETERMINISTIC arithmetic —
    // the hash, ranking, and double normalization reproduce exactly,
    // so unlike HLL this sketch is hash-match oracled. The shared CTE
    // is the stored partial (≤ k smallest hashes per hour).
    "active_users_kmv_per_hour" ->
      s"""WITH ${kmvKeptCte()}
        |${kmvSelect("kept", "time_interval")}""".stripMargin,
    // merged day partials == direct day sketch, exactly (the k
    // smallest of a union of per-hour k-minima are the day's k minima)
    "active_users_kmv_daily" ->
      s"""WITH ${kmvKeptCte()},
        |dayu AS (SELECT DISTINCT date_trunc('day', time_interval) AS day, h FROM kept)
        |${kmvSelect("dayu", "day")}""".stripMargin,
    // the approximate endpoints, re-expressed over the deterministic
    // KMV sketch at k=256 (the HLL variants remain spec-only): the
    // APPROXIMATE estimates are hash-match oracled
    "active_users_per_hour_approx" ->
      s"""WITH ${kmvKeptCte(256)}
        |${kmvSelect("kept", "time_interval", 256, "active_users_approx")}""".stripMargin,
    "active_users_sketch_rollup" ->
      s"""WITH ${kmvKeptCte(256)},
        |weeku AS (SELECT DISTINCT date_trunc('week', time_interval) AS week, h FROM kept),
        |est AS (${kmvSelect("weeku", "week", 256)}),
        |ev AS (SELECT date_trunc('week', ts) AS week, count(*) AS events
        |       FROM events, anchor WHERE ts > a - INTERVAL 30 DAY GROUP BY 1)
        |SELECT est.week, active_users_est, events
        |FROM est JOIN ev ON est.week = ev.week ORDER BY 1""".stripMargin,
    // KMV set-operation estimates: union = k smallest of merged
    // k-minima; intersection = union est × fraction of the union
    // sketch's minima present in both sides — every hash, rank and
    // IEEE step mirrored, so the approximate Jaccard is hash-matched
    "events_kmv_overlap" ->
      s"""WITH hashed AS (
        |  SELECT DISTINCT event_type, ${graft.functions.OracleHash.duckLow64("(user_id)::VARCHAR")} AS h FROM events),
        |kept AS (
        |  SELECT event_type, h, rn FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hashed)
        |  WHERE rn <= 128),
        |pte AS (
        |  SELECT event_type, ${kmvEstSql("n", "hk", 128)} AS est_users
        |  FROM (SELECT event_type, count(*) AS n, max(CASE WHEN rn = 128 THEN h END) AS hk
        |        FROM kept GROUP BY 1)),
        |ty AS (SELECT DISTINCT event_type FROM kept),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |       FROM ty a, ty b WHERE a.event_type < b.event_type),
        |mem AS (
        |  SELECT type_a, type_b, h,
        |    max(CASE WHEN k.event_type = type_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN k.event_type = type_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pr JOIN kept k ON k.event_type = type_a OR k.event_type = type_b
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn FROM mem),
        |ag AS (
        |  SELECT type_a, type_b, count(*) AS n_union,
        |    max(CASE WHEN rn = 128 THEN h END) AS hk,
        |    sum(CASE WHEN rn <= 128 AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
        |  FROM rk GROUP BY 1, 2),
        |fin AS (
        |  SELECT type_a, type_b, ${kmvEstSql("n_union", "hk", 128)} AS eu,
        |    CAST(n_both AS DOUBLE) / CAST(least(n_union, 128) AS DOUBLE) AS jr
        |  FROM ag)
        |SELECT type_a, type_b,
        |  floor(a.est_users * 100 + 0.5) / 100.0 AS est_users_a,
        |  floor(b.est_users * 100 + 0.5) / 100.0 AS est_users_b,
        |  floor(eu * 100 + 0.5) / 100.0 AS est_union,
        |  floor(jr * eu * 100 + 0.5) / 100.0 AS est_intersection,
        |  floor(jr * 10000 + 0.5) / 10000.0 AS est_jaccard
        |FROM fin JOIN pte a ON a.event_type = fin.type_a
        |         JOIN pte b ON b.event_type = fin.type_b
        |ORDER BY type_a, type_b""".stripMargin,
    // bottom-k quantile sketch: sample membership by md5 rank of the
    // unique event_id; quantile indices are PURE INTEGER ceil(q·n) =
    // (q_num·n + q_den−1) // q_den, values only selected, never
    // transformed — so the APPROXIMATE quantiles hash-match
    "events_quantile_sketch" ->
      s"""WITH base AS (SELECT event_type, event_id, value FROM events),
        |samp AS (
        |  SELECT event_type, event_id, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
        |    FROM (SELECT event_type, event_id, value,
        |            ${graft.functions.OracleHash.duckLow64("(event_id)::VARCHAR")} AS h
        |          FROM base))
        |  WHERE rn <= 256),
        |eq AS (
        |  SELECT event_type, max(n) AS n,
        |    max(CASE WHEN vrn = greatest((1 * n + 1) // 2, 1) THEN value END) AS exact_p50,
        |    max(CASE WHEN vrn = greatest((9 * n + 9) // 10, 1) THEN value END) AS exact_p90,
        |    max(CASE WHEN vrn = greatest((99 * n + 99) // 100, 1) THEN value END) AS exact_p99
        |  FROM (SELECT event_type, value,
        |          count(*) OVER (PARTITION BY event_type) AS n,
        |          row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrn
        |        FROM base) GROUP BY 1),
        |sq AS (
        |  SELECT event_type, max(n) AS n_sample,
        |    max(CASE WHEN vrn = greatest((1 * n + 1) // 2, 1) THEN value END) AS est_p50,
        |    max(CASE WHEN vrn = greatest((9 * n + 9) // 10, 1) THEN value END) AS est_p90,
        |    max(CASE WHEN vrn = greatest((99 * n + 99) // 100, 1) THEN value END) AS est_p99
        |  FROM (SELECT event_type, value,
        |          count(*) OVER (PARTITION BY event_type) AS n,
        |          row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrn
        |        FROM samp) GROUP BY 1)
        |SELECT event_type, n, n_sample, est_p50, est_p90, est_p99,
        |       exact_p50, exact_p90, exact_p99
        |FROM sq JOIN eq USING (event_type) ORDER BY event_type""".stripMargin,
    // cross-source shingle overlap: the events_kmv_overlap kernel over
    // word-3-gram shingle sets per document source
    "docs_source_overlap" ->
      s"""WITH sh AS (
        |  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
        |       LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
        |  WHERE len(t) >= 3),
        |hashed AS (
        |  SELECT DISTINCT source, ${graft.functions.OracleHash.duckLow64("shingle")} AS h FROM sh),
        |kept AS (
        |  SELECT source, h, rn FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hashed)
        |  WHERE rn <= 128),
        |pte AS (
        |  SELECT source, ${kmvEstSql("n", "hk", 128)} AS est_n
        |  FROM (SELECT source, count(*) AS n, max(CASE WHEN rn = 128 THEN h END) AS hk
        |        FROM kept GROUP BY 1)),
        |ty AS (SELECT DISTINCT source FROM kept),
        |pr AS (SELECT a.source AS source_a, b.source AS source_b
        |       FROM ty a, ty b WHERE a.source < b.source),
        |mem AS (
        |  SELECT source_a, source_b, h,
        |    max(CASE WHEN k.source = source_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN k.source = source_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pr JOIN kept k ON k.source = source_a OR k.source = source_b
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn FROM mem),
        |ag AS (
        |  SELECT source_a, source_b, count(*) AS n_union,
        |    max(CASE WHEN rn = 128 THEN h END) AS hk,
        |    sum(CASE WHEN rn <= 128 AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
        |  FROM rk GROUP BY 1, 2),
        |fin AS (
        |  SELECT source_a, source_b, ${kmvEstSql("n_union", "hk", 128)} AS eu,
        |    CAST(n_both AS DOUBLE) / CAST(least(n_union, 128) AS DOUBLE) AS jr
        |  FROM ag)
        |SELECT source_a, source_b,
        |  floor(a.est_n * 100 + 0.5) / 100.0 AS est_shingles_a,
        |  floor(b.est_n * 100 + 0.5) / 100.0 AS est_shingles_b,
        |  floor(eu * 100 + 0.5) / 100.0 AS est_union,
        |  floor(jr * eu * 100 + 0.5) / 100.0 AS est_intersection,
        |  floor(jr * 10000 + 0.5) / 10000.0 AS est_jaccard
        |FROM fin JOIN pte a ON a.source = fin.source_a
        |         JOIN pte b ON b.source = fin.source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "error_pct_per_hour" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |         count(*) AS total
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS s, date_trunc('hour', max(ts)) AS e FROM events),
        |series AS (SELECT unnest(generate_series(s, e, INTERVAL 1 HOUR)) AS time_interval FROM bounds)
        |SELECT series.time_interval,
        |       COALESCE(errors, 0) AS errors,
        |       COALESCE(total, 0) AS total,
        |       COALESCE(floor(errors * 100.0 / nullif(total, 0) * 100 + 0.5) / 100.0, 0.0) AS error_pct
        |FROM series LEFT JOIN agg ON series.time_interval = agg.h
        |ORDER BY series.time_interval""".stripMargin,
    "active_vs_errors" ->
      """WITH anchor AS (SELECT max(ts) AS a FROM events),
        |act AS (
        |  SELECT date_trunc('hour', ts) AS time_interval, count(DISTINCT user_id) AS active_users
        |  FROM events, anchor WHERE ts > a - INTERVAL 30 DAY GROUP BY 1),
        |agg AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |         count(*) AS total
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS s, date_trunc('hour', max(ts)) AS e FROM events),
        |series AS (SELECT unnest(generate_series(s, e, INTERVAL 1 HOUR)) AS time_interval FROM bounds),
        |err AS (
        |  SELECT series.time_interval,
        |         COALESCE(errors, 0) AS errors,
        |         COALESCE(total, 0) AS total,
        |         COALESCE(floor(errors * 100.0 / nullif(total, 0) * 100 + 0.5) / 100.0, 0.0) AS error_pct
        |  FROM series LEFT JOIN agg ON series.time_interval = agg.h)
        |SELECT act.time_interval, act.active_users, err.errors, err.error_pct
        |FROM act JOIN err ON act.time_interval = err.time_interval
        |ORDER BY act.time_interval""".stripMargin,
    "user_activity" ->
      """WITH p AS (
        |  SELECT date_trunc('day', ts) AS interval, count(DISTINCT user_id) AS purchasers
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT date_trunc('day', ts) AS interval, count(DISTINCT user_id) AS clickers
        |  FROM events WHERE event_type = 'click' GROUP BY 1)
        |SELECT p.interval, p.purchasers, c.clickers
        |FROM p JOIN c ON p.interval = c.interval ORDER BY p.interval""".stripMargin,
    "events_by_type_status" ->
      """SELECT event_type,
        |  count(*) AS total,
        |  CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS low,
        |  CAST(sum(CASE WHEN value >= 50 AND value < 150 THEN 1 ELSE 0 END) AS BIGINT) AS mid,
        |  CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  count(*) - CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |           - CAST(sum(CASE WHEN value >= 50 AND value < 150 THEN 1 ELSE 0 END) AS BIGINT)
        |           - CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS unbanded
        |FROM events GROUP BY event_type
        |ORDER BY CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2
        |  WHEN 'click' THEN 3 WHEN 'view' THEN 4 WHEN 'error' THEN 5 ELSE 6 END, event_type""".stripMargin,
    "value_by_type_status" ->
      """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS purchase_value,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'click' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS click_value,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'error' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS error_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_ingest_normalize" ->
      """SELECT event_id, user_id, ts,
        |  CAST(json_extract(props, '$.k') AS INT) AS prop_k,
        |  COALESCE(value, 0.0) AS value_filled,
        |  rpad(event_type, 10, ' ') AS event_type_fixed
        |FROM events ORDER BY event_id""".stripMargin,
    "events_sessionization" ->
      s"""WITH $sessionCtes
        |SELECT user_id, session_id, session_start, session_end, n_events, session_value
        |FROM sess ORDER BY user_id, session_id""".stripMargin,
    // binned interval self-join ≡ the plain non-equi overlap join
    "events_session_concurrency" ->
      s"""WITH $sessionCtes
        |SELECT s1.user_id, s1.session_id, s1.session_start, s1.session_end,
        |  count(s2.user_id) AS concurrent_sessions
        |FROM sess s1 LEFT JOIN sess s2
        |  ON s2.user_id != s1.user_id
        | AND s2.session_start <= s1.session_end
        | AND s1.session_start <= s2.session_end
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2""".stripMargin,
    "events_surge_windows" ->
      s"""WITH $surgeCtes
        |SELECT surge_type, window_start, window_end, surge_events
        |FROM win ORDER BY surge_type, window_start""".stripMargin,
    "events_interval_join" ->
      s"""WITH $surgeCtes
        |SELECT w.surge_type, w.window_start, w.window_end, e.event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS value_sum
        |FROM win w JOIN events e
        |  ON e.ts >= w.window_start AND e.ts < w.window_end
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 4""".stripMargin,
    "events_retention" ->
      """WITH first_seen AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |sizes AS (
        |  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
        |  FROM first_seen GROUP BY cohort_week),
        |r AS (
        |  SELECT f.cohort_week, CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS weeks_since,
        |         count(DISTINCT a.user_id) AS active_users
        |  FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        |  GROUP BY 1, 2)
        |SELECT r.cohort_week, r.weeks_since, r.active_users, sizes.cohort_size,
        |  floor(r.active_users * 100.0 / sizes.cohort_size * 100 + 0.5) / 100.0 AS retention_pct
        |FROM r JOIN sizes ON r.cohort_week = sizes.cohort_week
        |ORDER BY r.cohort_week, r.weeks_since""".stripMargin,
    "events_value_quantiles" ->
      """SELECT event_type,
        |  floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000.0 AS p95,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_value_histogram" ->
      """WITH hist AS (
        |  SELECT event_type, CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) // 100 AS bin,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT *,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM hist)
        |SELECT event_type, max(total) AS n_total, count(*) AS n_bins,
        |  min(CASE WHEN cum >= ceil(total * CAST(0.5 AS DOUBLE)) THEN bin END) AS p50_bin,
        |  min(CASE WHEN cum >= ceil(total * CAST(0.95 AS DOUBLE)) THEN bin END) AS p95_bin,
        |  max(bin) AS max_bin
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 7 DAY
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(ts) AS t3
        |  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 AND ts <= t1 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |  1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS funnel_level
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "nation_trade_flows" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cheapest_supplier_per_part" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice / l_quantity * 1000 + 0.5) AS BIGINT)) AS best_milli
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY best_milli, l_suppkey) AS rn
        |  FROM unit)
        |SELECT l_partkey, l_suppkey, s_name,
        |  best_milli / CAST(1000 AS DOUBLE) AS best_unit_price
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1 ORDER BY l_partkey""".stripMargin,
    "events_grouping_sets" ->
      """WITH e AS (
        |  SELECT event_type, dayofweek(ts) + 1 AS dow,
        |    CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) / CAST(100 AS DOUBLE) AS total_value,
        |  CAST(GROUPING(event_type) AS INT) AS g_type,
        |  CAST(GROUPING(dow) AS INT) AS g_dow
        |FROM e GROUP BY GROUPING SETS ((event_type), (dow), ())
        |ORDER BY g_type, g_dow, event_type NULLS FIRST, dow NULLS FIRST""".stripMargin,
    "events_rolling_value" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
        |    / CAST(100 AS DOUBLE) AS rolling_value,
        |  CAST(count(*) OVER w AS BIGINT) AS n_in_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "user_value_deciles" ->
      """WITH t AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      / CAST(100 AS DOUBLE) AS total_value
        |  FROM events GROUP BY user_id)
        |SELECT user_id, total_value,
        |  CAST(ntile(10) OVER (ORDER BY total_value DESC, user_id) AS INT) AS decile
        |FROM t ORDER BY user_id""".stripMargin,
    // RFM quintiles over deterministic total orders (metric + user_id
    // tiebreak; monetary coalesced to 0 — Spark and DuckDB disagree on
    // feature-store shape: 1/7/28-day trailing windows from ONE scan,
    // anchored to max(ts); last event = argmax by (ts, event_id)
    "user_window_features" ->
      """WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
        |lastev AS (
        |  SELECT user_id, event_type AS last_type
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_28d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 1 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_1d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 7 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_7d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_28d,
        |    CAST(count(DISTINCT CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN event_type END) AS BIGINT) AS n_types_28d,
        |    max(ts) AS last_ts
        |  FROM events CROSS JOIN ref GROUP BY 1)
        |SELECT user_id, n_1d, n_7d, n_28d, value_1d, value_7d, value_28d,
        |  n_types_28d, last_ts, last_type
        |FROM agg JOIN lastev USING (user_id) ORDER BY user_id""".stripMargin,
    // default NULL placement in ORDER BY)
    "user_rfm_segments" ->
      """WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
        |per AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
        |    coalesce(CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT), 0) AS m_units
        |  FROM events GROUP BY 1),
        |base AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE)) AS INT) AS recency_days,
        |    frequency, m_units
        |  FROM per CROSS JOIN ref),
        |scored AS (
        |  SELECT user_id, recency_days, frequency, m_units,
        |    6 - CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS INT) AS r_score,
        |    6 - CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_score,
        |    6 - CAST(ntile(5) OVER (ORDER BY m_units DESC, user_id) AS INT) AS m_score
        |  FROM base)
        |SELECT user_id, recency_days, frequency, m_units / 100.0 AS monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM scored ORDER BY user_id""".stripMargin,
    // first/last-touch credit before the user's FIRST purchase; edges
    // ordered by the total (ts, event_id) order on both engines
    "user_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, ts AS purchase_ts, event_id AS p_eid, value AS attributed_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |        FROM events WHERE event_type = 'purchase')
        |  WHERE rn = 1),
        |t AS (
        |  SELECT e.user_id, e.event_type AS t_type, e.ts AS t_ts, e.event_id AS t_eid,
        |         fp.purchase_ts, fp.attributed_value
        |  FROM events e JOIN fp ON e.user_id = fp.user_id
        |  WHERE e.event_type IN ('click', 'view')
        |    AND (e.ts < fp.purchase_ts OR (e.ts = fp.purchase_ts AND e.event_id < fp.p_eid))),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_ts, t_eid) AS fr,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_ts DESC, t_eid DESC) AS lr,
        |    count(*) OVER (PARTITION BY user_id) AS n_touches
        |  FROM t)
        |SELECT f.user_id, f.t_type AS first_touch_type, f.t_ts AS first_touch_ts,
        |       l.t_type AS last_touch_type, l.t_ts AS last_touch_ts,
        |       f.purchase_ts, f.attributed_value,
        |       CAST(f.n_touches AS BIGINT) AS n_touches
        |FROM r f JOIN r l ON f.user_id = l.user_id AND l.lr = 1
        |WHERE f.fr = 1
        |ORDER BY f.user_id""".stripMargin,
    // first-5-event journey prefixes; (n_users DESC, path) total order
    // makes the LIMIT deterministic
    "user_event_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    // Q11 group-vs-global-scalar HAVING; value in integer units end-to-end
    "q11_important_stock" ->
      """WITH lv AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_15'
        |  GROUP BY 1),
        |tot AS (SELECT sum(value_units) AS t FROM lv)
        |SELECT p_partkey, value_units / 10000.0 AS stock_value
        |FROM lv CROSS JOIN tot
        |WHERE value_units > t * 0.0001
        |ORDER BY value_units DESC, p_partkey""".stripMargin,
    "orders_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "events_hourly_anomalies" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *,
        |    count(*) OVER w AS m,
        |    CAST(sum(cents) OVER w AS BIGINT) AS s,
        |    CAST(sum(cents * cents) OVER w AS BIGINT) AS q
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n_events,
        |  cents / CAST(100 AS DOUBLE) AS total_value,
        |  CAST(m AS BIGINT) AS trailing_n,
        |  CASE WHEN m * q - s * s > 0 THEN
        |    floor((cents * m - s) / sqrt(CAST(m * q - s * s AS DOUBLE)) * 10000 + 0.5) / 10000.0
        |  END AS z_score,
        |  (cents * m - s) * (cents * m - s) > 9 * (m * q - s * s) AS is_anomaly
        |FROM t WHERE m >= 8 ORDER BY event_type, hour""".stripMargin,
    "orders_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "lineitem_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "top3_orders_per_segment" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice
        |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin,
    "events_quarantine" ->
      """SELECT event_id, user_id, props FROM events
        |WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL
        |ORDER BY event_id""".stripMargin,
    "events_in_window" ->
      """WITH bounds AS (SELECT max(ts) - INTERVAL 7 DAY AS s, max(ts) AS e FROM events)
        |SELECT date_trunc('day', ts) AS day, count(*) AS events, count(DISTINCT user_id) AS users
        |FROM events, bounds WHERE ts >= s AND ts <= e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // as-of implementation — two entirely different algorithms, one
    // contract
    "events_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  c.click_event_id, c.ts AS click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "tpch_integrity_audit" ->
      """WITH checks AS (
        |  SELECT 'customer.pk_unique' AS chk,
        |    CAST(count(*) AS BIGINT) AS n_checked,
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations
        |  FROM customer
        |  UNION ALL SELECT 'customer.acctbal_non_negative',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM customer
        |  UNION ALL SELECT 'orders.fk_custkey_resolves',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey AS __k FROM customer) k
        |    ON o_custkey = k.__k
        |  UNION ALL SELECT 'orders.status_in_set',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'lineitem.pk_unique',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.qty_in_range',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.fk_orderkey_resolves',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey AS __k FROM orders) k
        |    ON l_orderkey = k.__k
        |  UNION ALL SELECT 'events.value_present',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events)
        |SELECT chk AS "check", n_checked, n_violations
        |FROM checks ORDER BY chk""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "mktsegment_revenue" ->
      """SELECT c_mktsegment, count(*) AS order_count,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_spent,
        |  count(*) AS order_count
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey LIMIT 10""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "customers_with_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "high_value_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin,
    "customer_order_stats" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS order_count,
        |  CAST(sum(CAST(floor(COALESCE(o_totalprice, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "orders_status_matrix" ->
      """SELECT o_orderpriority, count(*) AS total,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |  WHEN '3-MEDIUM' THEN 3 ELSE 4 END, o_orderpriority""".stripMargin,
    "union_high_low_parts" ->
      """SELECT p_partkey, p_name, 'large' AS bucket FROM part WHERE p_size >= 40
        |UNION ALL
        |SELECT p_partkey, p_name, 'small' AS bucket FROM part WHERE p_size <= 5
        |ORDER BY p_partkey""".stripMargin,
    "parts_except" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE p_size > 45 ORDER BY p_partkey""".stripMargin,
    "regions_cross" ->
      """SELECT r_regionkey, r_name, nation_total
        |FROM region CROSS JOIN (SELECT count(*) AS nation_total FROM nation)
        |ORDER BY r_regionkey""".stripMargin,
    "docs_token_stats" ->
      """SELECT doc_id, n_chars,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_runs,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est,
        |  floor(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "emb_near_dup_pairs" ->
      s"""WITH $embNearDupCtes
        |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    // same recursive-closure shape as docs_dup_clusters, over the
    // embedding pair graph (CTEs shared with emb_near_dup_pairs)
    "emb_dup_clusters" ->
      s"""WITH RECURSIVE $embNearDupCtes,
        |pairs AS (SELECT vec_a, vec_b FROM p WHERE cosine >= 0.4),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        |          UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach AS (
        |  SELECT src AS vec_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.vec_id),
        |lab AS (SELECT vec_id, min(r) AS cluster_id FROM reach GROUP BY vec_id)
        |SELECT vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, vec_id""".stripMargin,
    "docs_quality_score" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
        |  floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS stopword_ratio,
        |  CASE WHEN floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.08 THEN 'high'
        |       WHEN floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.03 THEN 'mid'
        |       ELSE 'low' END AS quality_band
        |FROM documents ORDER BY doc_id""".stripMargin,
    // column profile: per column null/distinct/min/max (strings) + row count
    "docs_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, count(*) - count(doc_id) AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    substring(CAST(min(doc_id) AS VARCHAR), 1, 64) AS min_value,
        |    substring(CAST(max(doc_id) AS VARCHAR), 1, 64) AS max_value,
        |    count(*) AS n_rows FROM documents
        |  UNION ALL SELECT 'text', count(*) - count(text), count(DISTINCT text),
        |    substring(CAST(min(text) AS VARCHAR), 1, 64), substring(CAST(max(text) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'lang', count(*) - count(lang), count(DISTINCT lang),
        |    substring(CAST(min(lang) AS VARCHAR), 1, 64), substring(CAST(max(lang) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'source', count(*) - count(source), count(DISTINCT source),
        |    substring(CAST(min(source) AS VARCHAR), 1, 64), substring(CAST(max(source) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*) - count(n_chars), count(DISTINCT n_chars),
        |    substring(CAST(min(n_chars) AS VARCHAR), 1, 64), substring(CAST(max(n_chars) AS VARCHAR), 1, 64), count(*) FROM documents)
        |SELECT * FROM p ORDER BY column_name""".stripMargin,
    // curation funnel: raw → lang gate → quality gate → exact-dedup
    // canonical (within the quality-passed set) per source; the stage
    // predicates are the SAME expressions as docs_lang_id /
    // docs_quality_score / docs_exact_dedup so the funnel cannot drift
    "docs_pipeline_funnel" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS en_markers,
        |    (length(text) - length(replace(text, 'th', ''))) / 2 AS ngram_th,
        |    (length(text) - length(replace(text, 'the', ''))) / 3 AS ngram_the,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS ratio,
        |    md5(text) AS digest
        |  FROM documents),
        |g AS (
        |  SELECT *,
        |    (en_markers * 20 >= n_tokens AND ngram_th > 0) OR (en_markers + ngram_the > 0) AS lang_ok
        |  FROM f),
        |h AS (SELECT *, (lang_ok AND ratio >= 0.03) AS q_ok FROM g),
        |c AS (
        |  SELECT *, CASE WHEN q_ok AND row_number() OVER (PARTITION BY digest, q_ok ORDER BY doc_id) = 1
        |                 THEN 1 ELSE 0 END AS canon
        |  FROM h)
        |SELECT source, count(*) AS n_raw,
        |  CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
        |  CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
        |  CAST(sum(canon) AS BIGINT) AS n_canonical,
        |  CAST(sum(CASE WHEN canon = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS canonical_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // DSIR-shaped importance weights: hashed-bigram buckets, add-one
    // smoothed integer likelihood-ratio proxy, top-20%-per-source select
    "docs_dsir_weights" ->
      s"""WITH tok AS (
        |  SELECT doc_id, source,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.08 AS is_target,
        |    string_split(text, ' ') AS t
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, is_target, t[g] || ' ' || t[g+1] AS ngram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g)
        |  WHERE len(t) >= 2),
        |bk AS (
        |  SELECT doc_id, is_target,
        |    ((${graft.functions.OracleHash.duckLow64("ngram")} % 256) + 256) % 256 AS bucket
        |  FROM ng),
        |st AS (
        |  SELECT bucket, count(*) AS r_b,
        |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_b
        |  FROM bk GROUP BY 1),
        |wb AS (SELECT bucket, ((t_b + 1) * 10000) // (r_b + 1) AS w_b FROM st),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_feats, CAST(sum(w_b) AS BIGINT) AS score
        |  FROM bk JOIN wb USING (bucket) GROUP BY 1),
        |o AS (
        |  SELECT d.doc_id, d.source,
        |    COALESCE(n_feats, 0) AS n_feats, COALESCE(score, 0) AS score,
        |    CASE WHEN COALESCE(n_feats, 0) > 0 THEN score // n_feats ELSE 0 END AS score_per_feat
        |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY source ORDER BY score_per_feat DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM o)
        |SELECT doc_id, source, n_feats, score, score_per_feat,
        |  rn * 100 <= 20 * n_src AS selected
        |FROM r ORDER BY doc_id""".stripMargin,
    "docs_lang_id" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS en_markers,
        |  CAST((length(text) - length(replace(text, 'th', ''))) / 2 AS BIGINT) AS ngram_th,
        |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS ngram_the,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 20
        |            >= length(text) - length(replace(text, ' ', '')) + 1
        |            AND (length(text) - length(replace(text, 'th', ''))) / 2 > 0 THEN 'en'
        |       WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
        |            + (length(text) - length(replace(text, 'the', ''))) / 3 > 0 THEN 'en_maybe'
        |       ELSE 'und' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_fingerprint" ->
      """SELECT doc_id, md5(text) AS digest, sha256(text) AS digest_sha256,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_rolling_fingerprints" ->
      s"""WITH $winnowCtes
        |SELECT doc_id, unnest(fps) AS fingerprint FROM fp
        |ORDER BY doc_id, fingerprint""".stripMargin,
    // decontamination: (eval, train) pairs sharing df-capped winnowing
    // fingerprints — the fingerprint CTEs are the SAME text as the
    // rolling-fingerprints oracle, so the two cannot drift
    "docs_contamination" ->
      s"""WITH $winnowCtes,
        |x AS (SELECT doc_id, unnest(fps) AS fingerprint FROM fp),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |t AS (SELECT x.doc_id, split, fingerprint FROM x JOIN s USING (doc_id)),
        |dfq AS (SELECT fingerprint, count(*) AS df FROM t GROUP BY 1),
        |c AS (SELECT t.* FROM t JOIN dfq USING (fingerprint) WHERE df <= 100),
        |tr AS (SELECT doc_id AS train_doc_id, fingerprint FROM c WHERE split = 'train'),
        |ev AS (SELECT doc_id AS eval_doc_id, split, fingerprint FROM c WHERE split != 'train')
        |SELECT eval_doc_id, split, train_doc_id, count(*) AS shared_fps
        |FROM ev JOIN tr USING (fingerprint)
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY eval_doc_id, train_doc_id""".stripMargin,
    // count-min sketch: the estimate (min over lanes of the bucket
    // counter) is recomputed from the same md5 lanes, so the sketch's
    // approximate counts are hash-match verified, not just bounded
    "docs_cms_top_terms" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |lanes AS (
        |  ${cmsLanesSql("tok", "")}),
        |counters AS (SELECT r, bucket, count(*) AS c FROM lanes GROUP BY 1, 2),
        |cnt AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY 1),
        |top AS (SELECT * FROM cnt ORDER BY exact_n DESC, term LIMIT 20),
        |probe AS (
        |  ${cmsLanesSql("top", "term, exact_n, ")})
        |SELECT term, exact_n, min(c) AS cms_est, min(c) - exact_n AS overcount
        |FROM probe JOIN counters USING (r, bucket)
        |GROUP BY term, exact_n
        |ORDER BY exact_n DESC, term""".stripMargin,
    // Bloom filter over the test split's bigrams probed by every train
    // doc: n_bloom_hits >= n_exact_hits row by row; the gap IS the
    // false-positive count, audited rather than assumed from theory
    "docs_bloom_contamination" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, split, t[i] || ' ' || t[i+1] AS gram
        |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |  WHERE len(t) >= 2),
        |tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
        |pos AS (
        |  ${bloomPosSql("tg", "")}),
        |bm AS (SELECT p // 63 AS word_idx,
        |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        |       FROM pos GROUP BY 1),
        |tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE split = 'train'),
        |pp AS (
        |  ${bloomPosSql("tr", "doc_id, gram, ")}),
        |pj AS (
        |  SELECT doc_id, gram,
        |    CASE WHEN bits IS NOT NULL AND ((bits >> CAST(p % 63 AS INT)) & 1) = 1
        |         THEN 1 ELSE 0 END AS hit
        |  FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx),
        |mb AS (SELECT doc_id, gram, min(hit) AS maybe FROM pj GROUP BY 1, 2),
        |ex AS (
        |  SELECT tr.doc_id, tr.gram,
        |    max(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS exact_hit
        |  FROM tr LEFT JOIN tg ON tr.gram = tg.gram GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(maybe) AS BIGINT) AS n_bloom_hits,
        |  CAST(sum(exact_hit) AS BIGINT) AS n_exact_hits
        |FROM mb JOIN ex USING (doc_id, gram)
        |GROUP BY 1 HAVING sum(maybe) > 0
        |ORDER BY doc_id""".stripMargin,
    // BM25 with rational idf and micro-unit long partials: every IEEE
    // step mirrored op-for-op (Search.bm25OracleSql lives next to the
    // operator so the two arithmetic definitions review side-by-side)
    "docs_bm25_search" -> operators.Search.bm25OracleSql(),
    // two-stage retrieval: BM25 recall CTE nested verbatim, TF-IDF rerank
    "docs_bm25_rerank" -> operators.Search.bm25RerankOracleSql(),
    "docs_hybrid_rrf" -> operators.Search.rrfFusionOracleSql(),
    "docs_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_id, CAST(i * 24 + 1 AS INT) AS chunk_start,
        |         t[(i * 24 + 1) : (i * 24 + 32)] AS toks
        |  FROM tok, LATERAL (SELECT unnest(generate_series(0, greatest((len(t) - 9) // 24, 0))) AS i))
        |SELECT doc_id, chunk_id, chunk_start, CAST(len(toks) AS INT) AS n_tokens,
        |       array_to_string(toks, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "docs_split_assign" ->
      """SELECT doc_id, substr(md5(text), 1, 2) AS bucket_hex,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer-exact 0.2*avg rule: qc*n*5 < sum_qc <=> qty < sum/(5n)
    "q17_small_qty_revenue" ->
      """WITH f AS (
        |  SELECT l_partkey, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |st AS (SELECT l_partkey AS ap, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |              count(*) AS n
        |       FROM f GROUP BY 1)
        |SELECT count(*) AS n_lines, CAST(sum(pc) AS BIGINT) / 700.0 AS avg_yearly
        |FROM f JOIN st ON l_partkey = ap
        |WHERE qc * n * 5 < sum_qc""".stripMargin,
    // integer-exact above-average rule: bal_cents * n > sum_cents
    "q22_sales_opportunity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |st AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents, count(*) AS n FROM c),
        |big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |       CAST(sum(bal_cents) AS BIGINT) / 100.0 AS total_acctbal
        |FROM c, st
        |WHERE bal_cents * n > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // double correlation: EXISTS + NOT EXISTS on the same fact, equi
    // key + supplier inequality (Q21 shape over available columns)
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    // the pivot round-trip: wide matrix melted back to long form
    "orders_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
        |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
        |    CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, o_orderstatus, n FROM (
        |  SELECT o_orderpriority, 'O' AS o_orderstatus, n_open AS n FROM w
        |  UNION ALL SELECT o_orderpriority, 'F', n_finished FROM w
        |  UNION ALL SELECT o_orderpriority, 'P', n_pending FROM w)
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        |    / 10000.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "orders_price_percentile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
        |  floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume
        |FROM orders WHERE o_orderkey <= 1000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS vol_units,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
        |agg AS (
        |  SELECT o_year,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_units ELSE 0 END) AS BIGINT) AS nation_units,
        |    CAST(sum(vol_units) AS BIGINT) AS total_units
        |  FROM vol GROUP BY 1)
        |SELECT o_year,
        |  nation_units / CAST(10000 AS DOUBLE) AS nation_volume,
        |  total_units / CAST(10000 AS DOUBLE) AS total_volume,
        |  floor(CAST(nation_units AS DOUBLE) / total_units * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS mkt_share
        |FROM agg ORDER BY o_year""".stripMargin,
    "docs_bpe_merges" ->
      """WITH words AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(word, CAST(g AS INTEGER), 2) AS pair,
        |    CAST(sum(freq) AS BIGINT) AS pair_freq
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS g)
        |  GROUP BY 1)
        |SELECT pair, pair_freq FROM pairs
        |ORDER BY pair_freq DESC, pair LIMIT 20""".stripMargin,
    // BPE encode: same mining CTE as docs_bpe_merges, then list_reduce
    // applies the ranked merges over the spatialized doc (`~c ` per
    // letter; `~a ~b ` → `~ab `) — leftmost non-overlapping replace in
    // both engines IS sequential BPE application. md5 of the encoded
    // string pins every token boundary.
    "docs_bpe_encode" ->
      """WITH words AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(word, CAST(g AS INTEGER), 2) AS pair,
        |    CAST(sum(freq) AS BIGINT) AS pair_freq
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS g)
        |  GROUP BY 1),
        |ml AS (
        |  SELECT list(pair ORDER BY pair_freq DESC, pair) AS ms FROM (
        |    SELECT pair, pair_freq FROM pairs
        |    ORDER BY pair_freq DESC, pair LIMIT 20)),
        |enc AS (
        |  SELECT doc_id, text,
        |    list_reduce(
        |      list_prepend(regexp_replace(text, '([a-z])', '~\1 ', 'g'),
        |                   (SELECT ms FROM ml)),
        |      (s, m) -> replace(s, '~' || m[1] || ' ~' || m[2] || ' ',
        |                        '~' || m || ' ')) AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INT) AS n_words,
        |  CAST(len(replace(text, ' ', '')) AS INT) AS n_chars,
        |  CAST(len(s) - len(replace(s, '~', '')) AS INT) AS n_tokens,
        |  md5(s) AS enc_digest,
        |  floor(CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |        / (len(s) - len(replace(s, '~', ''))) * 1000000 + 0.5)
        |    / 1000000 AS chars_per_token
        |FROM enc ORDER BY doc_id""".stripMargin,
    "docs_top_bigrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        |ng AS (
        |  SELECT t[g] || ' ' || t[g+1] AS ngram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g)
        |  WHERE len(t) >= 2)
        |SELECT ngram, count(*) AS n FROM ng GROUP BY 1
        |ORDER BY n DESC, ngram LIMIT 20""".stripMargin,
    "emb_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, CAST(127 AS DOUBLE) / max_abs AS scale_f,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (CAST(127 AS DOUBLE) / max_abs) + 0.5) AS BIGINT)) AS q
        |  FROM m)
        |SELECT vec_id, floor(scale_f * 1000000 + 0.5) / 1000000.0 AS scale,
        |  CAST(list_min(q) AS BIGINT) AS q_min,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum
        |FROM s ORDER BY vec_id""".stripMargin,
    "docs_repetition_filters" ->
      s"""WITH $repetitionCtes
        |SELECT per.doc_id, n_tokens, distinct_ratio, dup_trigram_frac, top_unigram_frac,
        |  (top_unigram_frac <= 0.15 AND dup_trigram_frac <= 0.02) AS keep
        |FROM per JOIN tp ON per.doc_id = tp.doc_id
        |ORDER BY per.doc_id""".stripMargin,
    // corpus build v2: repetition verdict + substring-dedup verdict +
    // exact dedup + shared split/pack tail — every CTE block shared
    // with the stage's own oracled endpoint
    "docs_training_corpus_v2" ->
      s"""WITH $repetitionCtes,
        |$spanCtes,
        |sds AS (
        |  SELECT doc_id, max(span_chars) >= 40 AS has_long_dup FROM (
        |    SELECT doc_a AS doc_id, span_chars FROM spans
        |    UNION ALL SELECT doc_b, span_chars FROM spans) GROUP BY doc_id),
        |rkeep AS (
        |  SELECT per.doc_id FROM per JOIN tp ON per.doc_id = tp.doc_id
        |  WHERE top_unigram_frac <= 0.15 AND dup_trigram_frac <= 0.02),
        |q2 AS (
        |  SELECT d.doc_id, d.lang, d.text
        |  FROM documents d JOIN rkeep ON d.doc_id = rkeep.doc_id
        |  LEFT JOIN sds ON d.doc_id = sds.doc_id
        |  WHERE sds.has_long_dup IS NULL OR NOT sds.has_long_dup),
        |exd2 AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q2),
        |kept2 AS (SELECT doc_id, lang, text FROM exd2 WHERE rn = 1),
        |t2 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split,
        |    CAST(doc_id % 4 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM kept2),
        |p2 AS (
        |  SELECT doc_id, lang, split, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t2)
        |SELECT doc_id, lang, split, shard, n_tokens,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p2 ORDER BY doc_id""".stripMargin,
    "docs_lm_score" ->
      s"""WITH $lmScoreCtes
        |SELECT doc_id, n_bigrams, lm_score FROM lm ORDER BY doc_id""".stripMargin,
    // per-language tercile split of the LM scores (ntile ties on doc_id)
    "docs_lm_buckets" ->
      s"""WITH $lmScoreCtes,
        |r AS (
        |  SELECT lm.doc_id, d.lang, lm.lm_score,
        |    ntile(3) OVER (PARTITION BY d.lang
        |                   ORDER BY lm.lm_score DESC, lm.doc_id) AS t
        |  FROM lm JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, lm_score,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "docs_boilerplate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, t[g] || ' ' || t[g+1] || ' ' || t[g+2] AS s
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS g)
        |  WHERE len(t) >= 3),
        |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(sum(CASE WHEN df > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate
        |  FROM sh JOIN dfreq USING (s) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_boilerplate,
        |  floor(CAST(n_boilerplate AS DOUBLE) / n_shingles * 10000 + 0.5) / 10000.0 AS boilerplate_frac,
        |  n_boilerplate > 0 AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,
    "customer_pii_scrub" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_redacted,
        |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_pii_chars,
        |  md5(regexp_replace(c_name, '[0-9]', 'X', 'g')) AS redacted_digest
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the full scrub chain (emails → IPs → phones → digits) replayed in
    // RE2 over the SAME injected-PII construction: the md5 hash-match
    // proves the masker patterns behave identically under Java regex
    // and RE2 — the portability contract the pattern set is designed to
    "docs_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' ||
        |    ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
        |    ' call +1 (555) 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |    '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' ref A' || CAST((doc_id * 13) % 100000 AS VARCHAR) AS s
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, s,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |        '\+?(?:[0-9][() .-]{0,2}){6,}[0-9]', '<PHONE>', 'g'),
        |      '[0-9]', 'X', 'g') AS r
        |  FROM t)
        |SELECT doc_id, md5(r) AS scrubbed_digest,
        |  CAST((length(r) - length(replace(r, '<EMAIL>', ''))) // 7 AS INT) AS n_emails,
        |  CAST((length(r) - length(replace(r, '<IP>', ''))) // 4 AS INT) AS n_ips,
        |  CAST((length(r) - length(replace(r, '<PHONE>', ''))) // 7 AS INT) AS n_phones,
        |  CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS BIGINT) AS n_pii_chars,
        |  CAST(length(r) AS INT) AS scrubbed_len
        |FROM m ORDER BY doc_id""".stripMargin,
    "lineitem_zorder" ->
      """WITH s0 AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0
        |  FROM lineitem),
        |s1 AS (SELECT *, (x0 | (x0 << 8)) & 16711935 AS x1, (y0 | (y0 << 8)) & 16711935 AS y1 FROM s0),
        |s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
        |m AS (SELECT l_partkey, l_suppkey, x4 | (y4 << 1) AS morton FROM s4)
        |SELECT CAST(morton >> 22 AS INT) AS zbucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(morton) AS morton_min, max(morton) AS morton_max,
        |  min(l_partkey) AS part_min, max(l_partkey) AS part_max,
        |  min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "docs_exact_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS canonical_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin,
    "docs_near_dup_pairs" ->
      s"""WITH $nearDupCtes
        |SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |FROM j WHERE jr >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // PageRank over the near-dup graph: 3 unrolled integer-unit rounds
    // (rank div degree contributions, damping as 150000 + 85·Σ div 100)
    // over the SAME pair CTEs as docs_near_dup_pairs
    "docs_pagerank" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
           |  SELECT dst AS doc_id, sum(rank_units // deg) AS s
           |  FROM ed JOIN deg USING (src) JOIN $prev ON ed.src = $prev.doc_id
           |  GROUP BY 1),
           |r$i AS (
           |  SELECT deg.src AS doc_id,
           |    CAST(150000 + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS rank_units
           |  FROM deg LEFT JOIN c$i ON deg.src = c$i.doc_id)"""
      }.mkString(",\n")
      s"""WITH $nearDupCtes,
        |pr AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pr
        |       UNION ALL SELECT doc_b, doc_a FROM pr),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
        |r0 AS (SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS rank_units FROM deg),
        |$rounds
        |SELECT r3.doc_id, deg.deg AS degree, r3.rank_units,
        |  r3.rank_units / 1000000.0 AS rank
        |FROM r3 JOIN deg ON deg.src = r3.doc_id
        |ORDER BY r3.rank_units DESC, r3.doc_id""".stripMargin
    },
    // character-level second opinion over the verified pairs only.
    // Cross-engine contract pinned by ChFunctionsSpec ("levenshtein
    // unicode semantics"): Spark counts CODEPOINTS, DuckDB counts BYTES
    // ('café'→'cafe' is 1 vs 2), so this oracle row is exact on the
    // ASCII fixture corpus and would diverge on multi-byte text — the
    // Spark side's codepoint semantics is the user-facing contract.
    "docs_near_dup_edit_distance" ->
      s"""WITH $nearDupCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |  FROM j WHERE jr >= 0.5)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        |  CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
        |  floor(levenshtein(da.text, db.text) * 1.0 /
        |        greatest(length(da.text), length(db.text)) * 10000 + 0.5) / 10000.0
        |    AS edit_ratio
        |FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
        |             JOIN documents db ON db.doc_id = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "docs_minhash_bands" ->
      s"""WITH $minhashBandCtes
        |SELECT doc_id, band, band_hash FROM bands ORDER BY doc_id, band""".stripMargin,
    // incremental screening: the 10% increment (doc_id ≡ 0 mod 10)
    // probed against the existing corpus's digest + band index —
    // exact_dup / near_dup (best verified match) / novel per doc
    "docs_screen_increment" ->
      s"""WITH $minhashBandCtes,
        |exidx AS (
        |  SELECT md5(text) AS digest, min(doc_id) AS exact_match
        |  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
        |exact AS (
        |  SELECT d.doc_id, exact_match
        |  FROM (SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 10 = 0) d
        |  LEFT JOIN exidx USING (digest)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_hash = y.band_hash
        |  WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS ic
        |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
        |              JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b, ic * 1.0 / (sa.n + sb.n - ic) AS jr
        |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id),
        |near AS (
        |  SELECT doc_a AS doc_id, doc_b AS near_match, jaccard FROM (
        |    SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard,
        |      row_number() OVER (PARTITION BY doc_a
        |        ORDER BY floor(jr * 10000 + 0.5) / 10000.0 DESC, doc_b) AS rn
        |    FROM jac WHERE jr >= 0.5) WHERE rn = 1)
        |SELECT exact.doc_id,
        |  CASE WHEN exact_match IS NOT NULL THEN 'exact_dup'
        |       WHEN near_match IS NOT NULL THEN 'near_dup'
        |       ELSE 'novel' END AS verdict,
        |  coalesce(exact_match, near_match) AS matched_doc,
        |  CASE WHEN exact_match IS NULL THEN jaccard END AS jaccard
        |FROM exact LEFT JOIN near USING (doc_id) ORDER BY doc_id""".stripMargin,
    // LSH candidates (band-bucket self-join) verified with exact jaccard
    // over the FULL shingle sets — mirror of minhashLshPairs
    "docs_minhash_lsh_pairs" ->
      s"""WITH $minhashBandCtes,
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS ic
        |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
        |              JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b, ic * 1.0 / (sa.n + sb.n - ic) AS jr
        |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id)
        |SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |FROM jac WHERE jr >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // 64-lane ±1 vote per distinct token over the OracleHash md5-low64
    // bits; sign of each lane's vote becomes the output bit (mirror of
    // the native SimHash64 expression)
    "docs_simhash" ->
      s"""WITH tk AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substring(md5(w), 17, 16))::UBIGINT AS hu FROM tk),
        |votes AS (
        |  SELECT doc_id, bb.b AS b,
        |         SUM(CASE WHEN (hu >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
        |  GROUP BY 1, 2),
        |bits AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS su
        |  FROM votes GROUP BY 1)
        |SELECT doc_id,
        |  CAST(CAST(su AS HUGEINT) -
        |    CASE WHEN su >= 9223372036854775808::HUGEINT
        |         THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
        |  AS simhash
        |FROM bits ORDER BY doc_id""".stripMargin,
    // connected components over the near-dup pair graph: transitive
    // closure via a recursive CTE (fine at oracle SF; the engine side
    // is iterative min-label propagation)
    "docs_dup_clusters" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // staged-artifact summary: per dup cluster, the quality canonical
    // AND the pagerank hub — the oracle recomputes both from documents
    // (it cannot read the artifact), which is exactly the staged ≡
    // self-contained equivalence the artifact topology promises
    "docs_dedup_artifacts" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
           |  SELECT dst AS doc_id, sum(rank_units // deg) AS s
           |  FROM edges JOIN deg USING (src) JOIN $prev ON edges.src = $prev.doc_id
           |  GROUP BY 1),
           |r$i AS (
           |  SELECT deg.src AS doc_id,
           |    CAST(150000 + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS rank_units
           |  FROM deg LEFT JOIN c$i ON deg.src = c$i.doc_id)"""
      }.mkString(",\n")
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |cl AS (SELECT doc_id, cluster_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM lab),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |r0 AS (SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS rank_units FROM deg),
        |$rounds,
        |q AS (
        |  SELECT doc_id,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS q
        |  FROM documents),
        |canon AS (
        |  SELECT cluster_id, cl.doc_id, q, cluster_size,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id)),
        |hub AS (
        |  SELECT cluster_id, cl.doc_id, rank_units,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY rank_units DESC, cl.doc_id) AS rn
        |  FROM cl JOIN r3 ON cl.doc_id = r3.doc_id)
        |SELECT c.cluster_id, c.cluster_size, c.doc_id AS canonical_doc,
        |  c.q AS canonical_quality, h.doc_id AS hub_doc,
        |  h.rank_units AS hub_rank_units
        |FROM canon c JOIN hub h ON c.cluster_id = h.cluster_id
        |WHERE c.rn = 1 AND h.rn = 1
        |ORDER BY c.cluster_id""".stripMargin
    },
    // near-dup pairs straddling the content-digest train/val/test split
    // — exact dups can't leak (same digest → same bucket), so every row
    // is a non-identical near-dup crossing splits
    "docs_split_leakage" ->
      s"""WITH $nearDupCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |  FROM j WHERE jr >= 0.5),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT doc_a, doc_b, jaccard, sa.split AS split_a, sb.split AS split_b
        |FROM pairs
        |JOIN sp sa ON sa.doc_id = doc_a
        |JOIN sp sb ON sb.doc_id = doc_b
        |WHERE sa.split <> sb.split ORDER BY doc_a, doc_b""".stripMargin,
    // per dup cluster: the member to KEEP — quality argmax (rounded
    // 4dp stopword ratio, doc_id tiebreak), not the structural min id
    "docs_dedup_canonical" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |cl AS (SELECT doc_id, cluster_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM lab),
        |q AS (
        |  SELECT doc_id,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS q
        |  FROM documents),
        |rnk AS (
        |  SELECT cluster_id, cl.doc_id, q, cluster_size,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id) WHERE cluster_size > 1)
        |SELECT cluster_id, doc_id AS canonical_doc, q AS canonical_quality, cluster_size
        |FROM rnk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    // positional winnowing (shares the rh rolling-hash arithmetic with
    // winnowCtes) → df-cap → fingerprint join → offset-consistent runs
    "docs_substring_spans" ->
      s"""WITH $spanCtes
        |SELECT doc_a, doc_b, offset_delta, shared_fps, span_start_a,
        |       span_start_b, span_chars
        |FROM spans ORDER BY doc_a, doc_b, offset_delta""".stripMargin,
    // per-document rollup of the same spans CTE
    "docs_span_doc_stats" ->
      s"""WITH $spanCtes,
        |u AS (
        |  SELECT doc_a AS doc_id, doc_b AS partner, span_chars FROM spans
        |  UNION ALL
        |  SELECT doc_b, doc_a, span_chars FROM spans)
        |SELECT doc_id, count(*) AS n_spans,
        |  count(DISTINCT partner) AS n_partners,
        |  max(span_chars) AS max_span_chars,
        |  max(span_chars) >= 40 AS has_long_dup
        |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // widest losing span per doc cut out of the text (lower id keeps)
    "docs_dedup_rewrite" ->
      s"""WITH $spanCtes,
        |losing AS (
        |  SELECT DISTINCT doc_b AS doc_id, span_start_b AS cut_start, span_chars
        |  FROM spans WHERE span_chars >= 40),
        |widest AS (
        |  SELECT doc_id, cut_start, span_chars FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY span_chars DESC, cut_start) AS rn
        |    FROM losing) WHERE rn = 1)
        |SELECT d.doc_id,
        |  CASE WHEN w.cut_start IS NULL THEN d.text
        |       ELSE substring(d.text, 1, w.cut_start)
        |            || substring(d.text, w.cut_start + w.span_chars + 1) END AS text,
        |  w.cut_start, w.span_chars,
        |  w.cut_start IS NOT NULL AS was_cut
        |FROM documents d LEFT JOIN widest w USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "docs_top_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * (n_docs + CAST(1 AS DOUBLE)) / (df + CAST(1 AS DOUBLE)) AS wr
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY wr DESC, term) AS term_rank FROM s)
        |SELECT doc_id, term, tf, df,
        |  floor(wr * 1000000 + 0.5) / 1000000.0 AS weight, CAST(term_rank AS INT) AS term_rank
        |FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,
    // sparse TF-IDF cosine pairs: integer-unit weights (capped tf ×
    // clamped rational idf) make dot/norm sums exact BIGINTs; cosine is
    // then exactly-rounded IEEE ops on exact integers — identical in
    // both engines. df-capped terms excluded from weights AND norms on
    // both sides (the documented operator semantics, not an oracle
    // approximation). Oracle joins term STRINGS where Spark joins
    // xxhash64 longs — equality-only role, so a (negligible-probability)
    // collision would surface as a differential failure, not hide.
    "docs_tfidf_pairs" ->
      s"""WITH $tfidfCtes
        |SELECT doc_a, doc_b, floor(cos_raw * 10000 + 0.5) / 10000.0 AS cosine
        |FROM tp WHERE cos_raw >= 0.6 ORDER BY doc_a, doc_b""".stripMargin,
    // retrieval view of the pair frame (threshold 0.3): symmetrize and
    // rank per doc on the ROUNDED cosine (the published value) so the
    // top-k cut is engine-independent under 4dp ties
    "docs_tfidf_neighbors" ->
      s"""WITH $tfidfCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(cos_raw * 10000 + 0.5) / 10000.0 AS cosine
        |  FROM tp WHERE cos_raw >= 0.3),
        |sym AS (
        |  SELECT doc_a AS doc_id, doc_b AS neighbor, cosine FROM pairs
        |  UNION ALL
        |  SELECT doc_b AS doc_id, doc_a AS neighbor, cosine FROM pairs)
        |SELECT doc_id, rank, neighbor, cosine FROM (
        |  SELECT doc_id, neighbor, cosine,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cosine DESC, neighbor) AS INT) AS rank
        |  FROM sym)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // transitive closure of the tfidf pair graph — topical clusters
    // without any embedding model; same recursive min-label closure as
    // docs_dup_clusters, over cosine edges instead of jaccard edges
    "docs_topic_clusters" ->
      s"""WITH RECURSIVE $tfidfCtes,
        |pairs AS (SELECT doc_a, doc_b FROM tp WHERE cos_raw >= 0.6),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // χ² term-distribution divergence per source vs the corpus; the
    // absent-term tail is the closed form (N - Σ C_t∈s)/N; per-term
    // contributions floor to 1e-9 units so the long sum is associative
    "docs_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |st AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns, count(*) AS n_terms FROM st GROUP BY 1),
        |n AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM ct),
        |pres AS (
        |  SELECT source,
        |    CAST(sum(CAST(floor(
        |      (CAST(c * n - ct * ns AS DOUBLE) * CAST(c * n - ct * ns AS DOUBLE)) /
        |      ((CAST(ns AS DOUBLE) * ns) * (CAST(n AS DOUBLE) * ct))
        |      * 1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS present_units,
        |    CAST(sum(ct) AS BIGINT) AS cs
        |  FROM st JOIN ct USING (term) JOIN ns USING (source) CROSS JOIN n
        |  GROUP BY 1)
        |SELECT source, n_terms, ns AS n_tokens,
        |  (present_units + CAST(floor(CAST(n - cs AS DOUBLE) * 1.0E9 / n + 0.5) AS BIGINT)) / 1.0E9 AS chi2
        |FROM pres JOIN ns USING (source) CROSS JOIN n
        |ORDER BY source""".stripMargin,
    // per-source cap first, then the global ranking on the capped frame
    "docs_top_quality_diverse" ->
      """WITH scored AS (
        |  SELECT doc_id, source, lang,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS quality
        |  FROM documents),
        |capped AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id) AS INT) AS rank_in_source
        |  FROM scored QUALIFY rank_in_source <= 5)
        |SELECT global_rank, doc_id, source, lang, quality, rank_in_source FROM (
        |  SELECT *, CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS INT) AS global_rank
        |  FROM capped)
        |WHERE global_rank <= 50 ORDER BY global_rank""".stripMargin,
    "docs_sample_per_source" ->
      """SELECT source, rank_in_source, doc_id, lang, n_chars
        |FROM (SELECT source, doc_id, lang, n_chars,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |          AS rank_in_source
        |      FROM documents)
        |WHERE rank_in_source <= 10 ORDER BY source, rank_in_source""".stripMargin,
    // temperature mixing: p_s = budget·√n_s/Σ√n/n_s (T=0.5 — sqrt is
    // correctly rounded in every IEEE engine, general pow is not),
    // selection by the same md5-uniform as the KMV sketch
    "docs_temperature_mix" ->
      s"""WITH ps AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
        |ss AS (SELECT CAST(sum(CAST(floor(sqrt(n_s) * 1000000) AS BIGINT)) AS BIGINT)
        |         / 1000000.0 AS sum_sqrt FROM ps),
        |sel AS (
        |  SELECT d.doc_id, d.source, d.lang,
        |    least(1.0, 300.0 * sqrt(n_s) / sum_sqrt / n_s) AS p_s,
        |    (CAST(${graft.functions.OracleHash.duckLow64("(d.doc_id)::VARCHAR")} AS DOUBLE)
        |      + 9223372036854775808.0) / 18446744073709551616.0 AS u
        |  FROM documents d JOIN ps USING (source), ss)
        |SELECT doc_id, source, lang,
        |  floor(p_s * 1000000 + 0.5) / 1000000.0 AS sample_prob
        |FROM sel WHERE u < p_s ORDER BY doc_id""".stripMargin,
    "docs_sample_stratified" ->
      """SELECT doc_id, lang, source,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key,
        |  CASE WHEN lang = 'en' THEN CAST(2 AS DOUBLE) ELSE CAST(5 AS DOUBLE) END AS weight
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      < CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END
        |ORDER BY doc_id""".stripMargin,
    // token-budget selection: integer quality buckets, whole buckets
    // admitted while they fit (bulk), the one straddling bucket filled
    // greedily by (quality desc, doc_id) — a doc is in while tokens
    // admitted BEFORE it are under budget
    "docs_budget_select" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS nstop,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |      / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS quality
        |  FROM documents),
        |s2 AS (SELECT *, CAST((nstop * 100) // ntok AS INT) AS bucket FROM s),
        |b AS (SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS btok FROM s2 GROUP BY 1),
        |b2 AS (
        |  SELECT bucket, btok,
        |    CAST(coalesce(sum(btok) OVER (ORDER BY bucket DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_above
        |  FROM b),
        |t AS (SELECT s2.*, b2.btok, b2.tokens_above FROM s2 JOIN b2 USING (bucket)),
        |bulk AS (
        |  SELECT doc_id, bucket, quality, n_tokens, 'bulk' AS tier FROM t
        |  WHERE tokens_above + btok <= 10000),
        |bnd AS (
        |  SELECT doc_id, bucket, quality, n_tokens, 'boundary' AS tier FROM (
        |    SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket
        |        ORDER BY quality DESC, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS run
        |    FROM t WHERE tokens_above < 10000 AND tokens_above + btok > 10000)
        |  WHERE tokens_above + run < 10000)
        |SELECT * FROM (SELECT * FROM bulk UNION ALL SELECT * FROM bnd)
        |ORDER BY doc_id""".stripMargin,
    // the full corpus build: quality filter → exact-digest canonical →
    // near-dup cluster canonical (recursive closure) → split → pack
    "docs_training_corpus" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |q AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.03),
        |exd AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q),
        |kept AS (
        |  SELECT exd.doc_id, lang, text FROM exd LEFT JOIN lab ON exd.doc_id = lab.doc_id
        |  WHERE rn = 1 AND (lab.cluster_id IS NULL OR lab.cluster_id = exd.doc_id)),
        |t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split,
        |    CAST(doc_id % 4 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM kept),
        |p AS (
        |  SELECT doc_id, lang, split, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, lang, split, shard, n_tokens,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p ORDER BY doc_id""".stripMargin,
    "docs_sample_weighted_stats" ->
      """WITH s AS (
        |  SELECT lang, CASE WHEN lang = 'en' THEN 2 ELSE 5 END AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |        < CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(w) AS BIGINT) AS est_docs,
        |  CAST(sum(w * n_tokens) AS BIGINT) AS est_tokens
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "emb_kmeans" -> kmeansOracleSql(
      nLists = operators.VectorOps.KmeansLists,
      iters = operators.VectorOps.KmeansIters),
    "emb_centroid_update" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    floor(list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS sim
        |  FROM embeddings e, anchors),
        |assigned AS (
        |  SELECT embedding, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn FROM sims)
        |  WHERE rn = 1),
        |ex AS (
        |  SELECT list_id, CAST(g - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[g] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
        |  FROM assigned, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS g))
        |SELECT list_id, dim, count(*) AS n_vectors,
        |  floor(CAST(sum(xs) AS BIGINT) / (count(*) * 1000000.0) * 1000000 + 0.5) / 1000000.0 AS centroid
        |FROM ex GROUP BY list_id, dim ORDER BY list_id, dim""".stripMargin,
    // per-source integer-unit centroid (the centroidUpdate contract),
    // cosine of each doc to its OWN source's centroid, bottom-m per
    // source; inner join — docs without embeddings have no signal
    "emb_source_outliers" ->
      """WITH j AS (
        |  SELECT d.doc_id, d.source, e.embedding
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |x AS (
        |  SELECT source, CAST(g - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[g] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
        |  FROM j, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS g)),
        |c AS (
        |  SELECT source, dim,
        |    floor(CAST(sum(xs) AS BIGINT) / (count(*) * 1000000.0) * 1000000 + 0.5) / 1000000.0 AS centroid
        |  FROM x GROUP BY 1, 2),
        |cv AS (
        |  SELECT source, list_transform(list(centroid ORDER BY dim), c -> CAST(c AS REAL)) AS cvec
        |  FROM c GROUP BY 1),
        |s AS (
        |  SELECT j.doc_id, j.source,
        |    floor(
        |      list_sum(list_transform(generate_series(1, len(cvec)),
        |        i -> CAST(j.embedding[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(j.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM j JOIN cv USING (source)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY cosine, doc_id) AS outlier_rank
        |  FROM s)
        |SELECT source, outlier_rank, doc_id, cosine
        |FROM r WHERE outlier_rank <= 5 ORDER BY source, outlier_rank""".stripMargin,
    "docs_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, lang, shard, n_tokens, tokens_before,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p ORDER BY doc_id""".stripMargin,
    "emb_norms" ->
      """SELECT vec_id, label,
        |  floor(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000.0 AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_knn_bruteforce" ->
      s"""WITH $knnBfCtes
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM bfr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // recall@k acceptance gate: LSH top-k vs the brute-force truth —
    // both sides are the SAME CTE text as their standalone oracles
    "emb_ann_recall" ->
      s"""WITH $knnBfCtes,
        |$knnLshCtes,
        |bf AS (SELECT query_id, neighbor_id FROM bfr WHERE rn <= 5),
        |ls AS (SELECT query_id, neighbor_id FROM lshr WHERE rn <= 5)
        |SELECT bf.query_id, count(*) AS n_truth,
        |  CAST(sum(CASE WHEN ls.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  floor(CAST(sum(CASE WHEN ls.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*) * 10000 + 0.5) / 10000.0 AS recall_at_k
        |FROM bf LEFT JOIN ls ON bf.query_id = ls.query_id AND bf.neighbor_id = ls.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // hard negatives: the brute-force scoring contract with the label
    // inequality in the join — top-k most-similar DIFFERENT-label
    "emb_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS query_label
        |  FROM embeddings WHERE vec_id < 20),
        |s AS (
        |  SELECT query_id, query_label, e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM q, embeddings e WHERE e.vec_id != q.query_id AND e.label != q.query_label),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
        |SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // multi-table multi-probe hyperplane LSH — fully re-derivable in
    // SQL because the planes come from md5 (VectorOps.planeComponent):
    // component (t,p,i) = first-4-bytes-BE of md5('p|t|p|i') mapped to
    // [-1,1) and rounded to float, every step exact in double on both
    // engines. Buckets are sign bits, probes flip one bit, candidates
    // dedupe, cosines rank 6dp-rounded with neighbor tie-break.
    "emb_knn_lsh" ->
      s"""WITH $knnLshCtes
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM lshr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    "emb_ivf_assign" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT e.vec_id, list_id,
        |    floor(list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS sim
        |  FROM embeddings e, anchors),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM s)
        |SELECT list_id, count(*) AS n_vectors,
        |  floor(CAST(sum(CAST(floor(sim * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
        |        / (count(*) * 1000000.0) * 10000 + 0.5) / 10000.0 AS avg_sim
        |FROM r WHERE rn = 1 GROUP BY list_id ORDER BY list_id""".stripMargin,
    // ADC: per-query LUT of subspace distances to every codeword,
    // corpus scored by summing the entries its codes select (exact
    // 6dp integer units -> order-invariant ranking)
    "emb_knn_pq" ->
      """WITH anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS s),
        |dists AS (
        |  SELECT e.vec_id, subs.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a, subs),
        |codes AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT q.vec_id AS query_id, subs.s, a.code,
        |    CAST(floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) AS BIGINT) AS units
        |  FROM embeddings q, anchors a, subs WHERE q.vec_id < 20),
        |scored AS (
        |  SELECT lut.query_id, codes.vec_id AS neighbor_id,
        |         CAST(sum(units) AS BIGINT) / 1000000.0 AS adc_dist
        |  FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.code
        |  WHERE codes.vec_id != lut.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_dist, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // IVF pruning + ADC scoring composed (shares the code/LUT CTE text
    // with emb_knn_pq and the assignment shape with emb_knn_ivf)
    "emb_knn_ivf_pq" ->
      """WITH lanchors AS (
        |  SELECT vec_id AS list_id, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 8),
        |lsims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(a.anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS sim
        |  FROM embeddings e, lanchors a),
        |assigned AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
        |    FROM lsims) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
        |    FROM lsims WHERE vec_id < 20) WHERE rn <= 3),
        |anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS s),
        |dists AS (
        |  SELECT e.vec_id, subs.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a, subs),
        |codes AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT q.vec_id AS query_id, subs.s, a.code,
        |    CAST(floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) AS BIGINT) AS units
        |  FROM embeddings q, anchors a, subs WHERE q.vec_id < 20),
        |cand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM assigned a JOIN probes p USING (list_id)
        |  WHERE a.vec_id != p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id AS neighbor_id,
        |         CAST(sum(units) AS BIGINT) / 1000000.0 AS adc_dist
        |  FROM cand c JOIN codes k ON k.vec_id = c.vec_id
        |              JOIN lut ON lut.query_id = c.query_id
        |                      AND lut.s = k.s AND lut.code = k.code
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_dist, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // PQ: nearest per-subspace codeword by 6dp squared euclidean,
    // code-index tie-break; 8 4-bit codes packed little-endian
    "emb_pq_codes" ->
      """WITH anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |dists AS (
        |  SELECT e.vec_id, ss.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[ss.s * 8 + i] AS DOUBLE) - CAST(a.anchor[ss.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[ss.s * 8 + i] AS DOUBLE) - CAST(a.anchor[ss.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a,
        |       (SELECT unnest(generate_series(0, 7)) AS s) ss),
        |best AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1)
        |SELECT vec_id, CAST(sum(code * (1::BIGINT << (4 * s))) AS BIGINT) AS pq_code
        |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "emb_knn_ivf" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS sim
        |  FROM embeddings e, anchors),
        |assigned AS (
        |  SELECT vec_id, embedding, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn FROM sims)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS qe, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn
        |    FROM sims WHERE vec_id < 20)
        |  WHERE rn <= 3),
        |scored AS (
        |  SELECT query_id, a.vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM assigned a JOIN probes p ON a.list_id = p.list_id
        |  WHERE a.vec_id != p.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // ASCII corpus: char arithmetic on the VARCHAR == byte arithmetic
    // on the utf-8 payload (strlen/substring vs binary length/slice)
    "docs_binary_chunks" -> {
      val cb = operators.Multimodal.DefaultChunkBytes
      s"""WITH c AS (
        |  SELECT doc_id, CAST(g AS INT) AS chunk_idx,
        |    CAST(g * $cb AS BIGINT) AS chunk_offset,
        |    substring(text, g * $cb + 1, $cb) AS chunk
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(0, greatest((strlen(text) - 1) // $cb, 0))) AS g))
        |SELECT doc_id, chunk_idx, chunk_offset,
        |  CAST(strlen(chunk) AS INT) AS chunk_len, md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "docs_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS digest,
        |  'text/plain;charset=utf-8' AS content_type, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the deterministic stub decode IS oracle-able: FakeDecode's
    // byte-sum/modular-dims math re-expressed in ascii arithmetic (the
    // payload is utf-8 of ASCII text), so the driver gate covers the
    // full per-partition decode path, not just row counts
    "docs_decode_features" ->
      """WITH b AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_sum(list_transform(generate_series(1, strlen(text)),
        |      i -> ascii(substring(text, i, 1)))) AS s
        |  FROM documents)
        |SELECT doc_id, CAST(64 + (s % 512) AS INT) AS width,
        |  CAST(64 + (n % 512) AS INT) AS height,
        |  3 AS channels, CAST(s AS BIGINT) AS feature_sum
        |FROM b ORDER BY doc_id""".stripMargin,
    // closed forms of the synthesized square wave: the Spark side
    // builds a real RIFF/WAVE payload from these parameters and decodes
    // it with the REAL javax.sound codec — a match means the full
    // synth→header→codec→features round-trip is byte-correct
    "docs_audio_features" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |  CAST(1 + (doc_id % 2) AS INT) AS channels,
        |  16 AS bits,
        |  CAST(400 + (n_chars % 256) AS BIGINT) AS n_frames,
        |  CAST((400 + (n_chars % 256)) * 1000 // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_ms,
        |  CAST(1000 + (doc_id % 100) * 10 AS INT) AS peak,
        |  CAST(400 + (n_chars % 256) AS BIGINT) * (1 + (doc_id % 2))
        |    * (1000 + (doc_id % 100) * 10) * (1000 + (doc_id % 100) * 10) AS energy_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed forms of the synthesized gray ramp: the Spark side builds
    // a real animated GIF from these parameters and decodes it with the
    // REAL javax.imageio multi-frame reader — a match means the whole
    // container→LZW→palette→frame-stats round-trip is byte-correct
    "docs_video_frames" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(6 + (doc_id % 6) AS INT) AS width,
        |    CAST(6 + (doc_id % 5) AS INT) AS height,
        |    CAST(3 + (n_chars % 6) AS INT) AS n_frames,
        |    CAST((doc_id * 7) % 200 AS INT) AS base,
        |    CAST(1 + (doc_id % 9) AS INT) AS step
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, width, height, n_frames,
        |    list_transform(generate_series(0, n_frames - 1),
        |      i -> (base + i * step) % 256) AS means
        |  FROM p)
        |SELECT doc_id, width, height, n_frames,
        |  CAST(list_sum(means) AS BIGINT) AS mean_sum,
        |  CAST(list_max(means) AS INT) AS peak_mean,
        |  CAST(means[n_frames // 2 + 1] AS INT) AS mid_mean
        |FROM g ORDER BY doc_id""".stripMargin,
    // byte-level mirror of the frame sampler: the payload is utf-8 of
    // ASCII text, so ascii(substring(...)) IS the byte value
    "docs_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, strlen(text) AS n, text,
        |         unnest(generate_series(0, greatest((strlen(text) - 8) // 24, 0))) AS k
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(k * 24 AS INT) AS frame_offset,
        |    CAST(least(k * 24 + 32, n) - k * 24 AS INT) AS frame_len,
        |    CAST(list_sum(list_transform(generate_series(k * 24 + 1, least(k * 24 + 32, n)),
        |      i -> ascii(substring(text, i, 1)))) AS BIGINT) AS frame_sum
        |  FROM f WHERE k % 2 = 0)
        |SELECT doc_id, frame_idx, frame_offset, frame_len, frame_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
    "scalar_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_trunc('day', l_shipdate) AS ship_day,
        |  l_shipdate + INTERVAL 12 HOUR AS ship_noon,
        |  l_shipdate - INTERVAL 24 HOUR AS ship_prev,
        |  CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_yyyymm,
        |  floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100.0 AS net_price,
        |  COALESCE(nullif(l_returnflag, 'N'), '~') AS flag_or_tilde,
        |  rpad(l_linestatus, 2, ' ') AS status_fixed,
        |  CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS order_class
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  ) ++ refOracleSql

  // ---- DuckDB oracles for the pipe-for-pipe reference endpoints -----
  // Each re-expresses a reference `.pipe` in DuckDB SQL over the SAME
  // deterministic fixture parquet the engine reads (absolute tmpdir
  // path; Verify materializes the fixtures before dumping
  // oracle_sql.json). The fixture generator guarantees (id,
  // __timestamp) unique per log, so the latest-by row_number windows
  // below are single-winner deterministic.

  /** `LIMIT 1 BY id ORDER BY __timestamp DESC` as a DuckDB subquery. */
  private def latestBy(src: String): String =
    s"""(SELECT * FROM (SELECT *, row_number()
       |  OVER (PARTITION BY id ORDER BY __timestamp DESC) __rn FROM $src)
       |  WHERE __rn = 1)""".stripMargin

  /** Shared CTE prologue of the airport pipes: now() anchor + latest
    * flight/passenger state (flights_missed_pct_minute.pipe:3-20). */
  private def airportProlog: String = {
    val fl = fixtureSqlPath("flights_raw")
    s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM $fl),
       |f AS ${latestBy(fl)},
       |p AS ${latestBy(fixtureSqlPath("passengers_raw"))}""".stripMargin
  }

  /** flights_missed_pct_minute.pipe:3-60 as DuckDB CTEs (minus the
    * final SELECT): per-closed-flight missed counts, per-minute pct,
    * gap-filling minute series. */
  private def missedPctCtes: String =
    s"""$airportProlog,
       |node0 AS (
       |  SELECT f.closed_at, f.passenger_count AS booked_passengers,
       |         count(p.id) AS missed_passengers
       |  FROM f JOIN p ON p.flight_id = f.id
       |  WHERE f.closed_at IS NOT NULL AND p.status = 'notboarded'
       |  GROUP BY f.id, f.closed_at, f.passenger_count),
       |node1 AS (
       |  SELECT date_trunc('minute', closed_at) AS w,
       |    floor(coalesce(CAST(sum(missed_passengers) AS DOUBLE) * 100
       |      / nullif(CAST(sum(booked_passengers) AS BIGINT), 0), 0) * 100 + 0.5) / 100 AS pct
       |  FROM node0 CROSS JOIN nf
       |  WHERE closed_at >= now_ts - INTERVAL 1 HOUR AND closed_at <= now_ts
       |  GROUP BY 1),
       |series AS (
       |  SELECT date_trunc('minute', now_ts) - INTERVAL 1 HOUR
       |           + x * (INTERVAL 1 MINUTE) AS series_time, now_ts
       |  FROM nf CROSS JOIN range(61) t(x)),
       |missed AS (
       |  SELECT series_time AS time_interval, coalesce(pct, 0) AS flights_missed_pct
       |  FROM series LEFT JOIN node1 ON series_time = w
       |  WHERE series_time <= now_ts),
       |act AS (
       |  SELECT date_trunc('minute', updated_at) AS time_interval,
       |         count(DISTINCT id) AS active_flights
       |  FROM ${fixtureSqlPath("flights_raw")} CROSS JOIN nf
       |  WHERE created_at > now_ts - INTERVAL 1 HOUR AND departed_at IS NULL
       |  GROUP BY 1)""".stripMargin

  private val flightRankSql =
    """CASE flight_status WHEN 'departed' THEN 5 WHEN 'boarded' THEN 4
      |  WHEN 'boarding' THEN 3 WHEN 'closed' THEN 2 WHEN 'open' THEN 1
      |  ELSE 6 END""".stripMargin

  private def refOracleSql: Map[String, String] = Map(
    // users_api_rmt.pipe:6 over users_mv.pipe:4-17 (PG dialect)
    "ref_users_api_rmt" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |    coalesce(address, '') AS address,
         |    coalesce(phone_number, '') AS phone_number,
         |    coalesce(email_verified, 0) AS email_verified,
         |    coalesce(onboarded, 0) AS onboarded, coalesce(deleted, 0) AS deleted,
         |    __timestamp AS event_timestamp,
         |    rpad(coalesce(lang, ''), 2, ' ') AS lang,
         |    make_timestamp(coalesce(created_at, 0)) AS created_at,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at
         |  FROM ${fixtureSqlPath("users_raw")})
         |SELECT id, name, email, address, phone_number, email_verified,
         |       onboarded, deleted, event_timestamp, lang, created_at, updated_at
         |FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn FROM mv)
         |WHERE rn = 1 ORDER BY id""".stripMargin,
    // snapshot diff over the same mv collapse as ref_users_api_rmt
    "ref_users_snapshot_diff" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(email, '') AS email, coalesce(deleted, 0) AS deleted,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at
         |  FROM ${fixtureSqlPath("users_raw")}),
         |s1 AS (
         |  SELECT id, updated_at AS old_updated_at, email AS old_email
         |  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |        FROM mv WHERE updated_at <= TIMESTAMP '2024-05-01 00:15:00')
         |  WHERE rn = 1),
         |s2 AS (
         |  SELECT id, updated_at AS new_updated_at, email AS new_email, deleted AS new_deleted
         |  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn FROM mv)
         |  WHERE rn = 1),
         |d AS (
         |  SELECT s2.id, old_updated_at, new_updated_at, old_email, new_email, new_deleted,
         |    CASE WHEN old_updated_at IS NULL THEN 'insert'
         |         WHEN old_updated_at < new_updated_at THEN 'update'
         |         ELSE 'unchanged' END AS change_type
         |  FROM s2 LEFT JOIN s1 ON s2.id = s1.id)
         |SELECT id, change_type, old_updated_at, new_updated_at,
         |       old_email, new_email, new_deleted
         |FROM d WHERE change_type != 'unchanged' ORDER BY id""".stripMargin,
    "users_scd2_history" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |    coalesce(deleted, 0) AS deleted,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at,
         |    __timestamp AS event_timestamp
         |  FROM ${fixtureSqlPath("users_raw")})
         |SELECT id, CAST(version AS INT) AS version, name, email, deleted,
         |       valid_from, valid_to, is_current
         |FROM (
         |  SELECT id, name, email, deleted,
         |    row_number() OVER w AS version,
         |    updated_at AS valid_from,
         |    lead(updated_at) OVER w AS valid_to,
         |    (lead(updated_at) OVER w IS NULL) AS is_current
         |  FROM mv
         |  WINDOW w AS (PARTITION BY id ORDER BY updated_at, event_timestamp))
         |ORDER BY id, version""".stripMargin,
    // users_api.pipe (mysql): SELECT * FROM users_latest FINAL ORDER BY id
    "ref_users_api_mysql" ->
      s"""SELECT id, name, email, address, phone_number, email_verified,
         |       onboarded, deleted, created_at, updated_at,
         |       __timestamp AS event_timestamp, rpad(lang, 2, ' ') AS lang
         |FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |      FROM ${fixtureSqlPath("users_raw_mysql")})
         |WHERE rn = 1 ORDER BY id""".stripMargin,
    // users_api_batch.pipe:3-53 — after a full-log copy generation the
    // snapshot is the per-id latest row with the MV's coalesce defaults
    "ref_users_api_batch" ->
      s"""WITH latest AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |                 FROM ${fixtureSqlPath("users_raw")}) WHERE rn = 1)
         |SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |  coalesce(address, '') AS address,
         |  coalesce(phone_number, '') AS phone_number,
         |  coalesce(email_verified, 0) AS email_verified,
         |  coalesce(onboarded, 0) AS onboarded, coalesce(deleted, 0) AS deleted,
         |  __timestamp AS event_timestamp,
         |  rpad(coalesce(lang, ''), 2, ' ') AS lang,
         |  make_timestamp(coalesce(created_at, 0)) AS created_at,
         |  make_timestamp(updated_at) AS updated_at
         |FROM latest WHERE coalesce(deleted, 0) = 0 ORDER BY id""".stripMargin,
    // latest_*_info.pipe:6-9
    "ref_latest_flight_info" ->
      s"""SELECT id, flight_number, status, passenger_count, departed_at, closed_at
         |FROM ${latestBy(fixtureSqlPath("flights_raw"))} ORDER BY id""".stripMargin,
    "ref_latest_passenger_info" ->
      s"""SELECT id, flight_id, status
         |FROM ${latestBy(fixtureSqlPath("passengers_raw"))} ORDER BY id""".stripMargin,
    "ref_latest_baggage_info" ->
      s"""SELECT id, flight_id, status, weight
         |FROM ${latestBy(fixtureSqlPath("baggage_raw"))} ORDER BY id""".stripMargin,
    // active_flights_past_hour.pipe:6-13
    "ref_active_flights_past_hour" ->
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")})
         |SELECT date_trunc('minute', updated_at) AS time_interval,
         |       count(DISTINCT id) AS active_flights
         |FROM ${fixtureSqlPath("flights_raw")} CROSS JOIN nf
         |WHERE created_at > now_ts - INTERVAL 1 HOUR AND departed_at IS NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // flights_missed_pct_minute.pipe:3-60
    "ref_flights_missed_pct_minute" ->
      s"""$missedPctCtes
         |SELECT time_interval, flights_missed_pct FROM missed ORDER BY 1""".stripMargin,
    // active_vs_missed_flights.pipe:6-12
    "ref_active_vs_missed_flights" ->
      s"""$missedPctCtes
         |SELECT m.time_interval, m.flights_missed_pct, a.active_flights
         |FROM missed m JOIN act a ON m.time_interval = a.time_interval
         |ORDER BY 1""".stripMargin,
    // passenger_activity.pipe:3-47
    "ref_passenger_activity" ->
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")}),
         |node0 AS (
         |  SELECT id, date_trunc('minute', checkedin_at) AS started_at,
         |         date_trunc('minute', coalesce(onboarded_at, notboarded_at)) AS completed_at
         |  FROM ${fixtureSqlPath("passengers_raw")} CROSS JOIN nf
         |  WHERE updated_at > now_ts - INTERVAL 1 HOUR),
         |n1 AS (SELECT started_at AS iv, count(DISTINCT id) AS passengers_checkedin
         |       FROM node0 GROUP BY 1),
         |n2 AS (SELECT completed_at AS iv, count(DISTINCT id) AS passengers_completed
         |       FROM node0 GROUP BY 1)
         |SELECT n1.iv AS "interval", passengers_checkedin, passengers_completed
         |FROM n1 JOIN n2 ON n1.iv = n2.iv ORDER BY n1.iv""".stripMargin,
    // passengers_by_flight_status.pipe:3-38
    "ref_passengers_by_flight_status" ->
      s"""$airportProlog,
         |j AS (
         |  SELECT f.flight_number, f.passenger_count, f.status AS flight_status,
         |         p.status AS pstatus
         |  FROM f LEFT JOIN p ON p.flight_id = f.id CROSS JOIN nf
         |  WHERE f.status != 'departed' OR
         |        (f.status = 'departed' AND f.departed_at > now_ts - INTERVAL 20 SECOND))
         |SELECT flight_number, flight_status, passenger_count AS booked,
         |  count(CASE WHEN pstatus = 'checkedin' AND flight_status IN ('open', 'closed') THEN 1 END) AS checkedin,
         |  count(CASE WHEN pstatus = 'checkedin' AND flight_status = 'boarding' THEN 1 END) AS boarding,
         |  count(CASE WHEN pstatus = 'onboarded' AND flight_status IN ('boarding', 'boarded', 'departed') THEN 1 END) AS onboarded,
         |  count(CASE WHEN pstatus = 'notboarded' AND flight_status IN ('boarded', 'departed') THEN 1 END) AS notboarded,
         |  passenger_count
         |    - (count(CASE WHEN pstatus = 'checkedin' AND flight_status IN ('open', 'closed') THEN 1 END)
         |       + count(CASE WHEN pstatus = 'checkedin' AND flight_status = 'boarding' THEN 1 END)
         |       + count(CASE WHEN pstatus = 'onboarded' AND flight_status IN ('boarding', 'boarded', 'departed') THEN 1 END)
         |       + count(CASE WHEN pstatus = 'notboarded' AND flight_status IN ('boarded', 'departed') THEN 1 END)) AS notcheckedin
         |FROM j GROUP BY flight_number, passenger_count, flight_status
         |ORDER BY $flightRankSql, flight_number""".stripMargin,
    // baggage_by_flight_status.pipe:3-26 (integer-cent exact sums,
    // mirroring the engine's exactSum canon)
    "ref_baggage_by_flight_status" -> {
      def wsum(status: String, as: String) =
        s"""CAST(sum(CAST(floor((CASE WHEN bstatus = '$status' THEN weight
           |  ELSE CAST(0 AS DOUBLE) END) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS $as""".stripMargin
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")}),
         |f AS ${latestBy(fixtureSqlPath("flights_raw"))},
         |b AS ${latestBy(fixtureSqlPath("baggage_raw"))},
         |j AS (
         |  SELECT f.flight_number, f.departed_at AS f_departed,
         |         f.status AS flight_status, b.status AS bstatus, b.weight
         |  FROM f LEFT JOIN b ON b.flight_id = f.id CROSS JOIN nf
         |  WHERE f.departed_at IS NULL OR f.departed_at > now_ts - INTERVAL 30 SECOND)
         |SELECT flight_number, flight_status,
         |  ${wsum("checkedin", "baggage_checkedin")},
         |  ${wsum("loaded", "baggage_loaded")},
         |  ${wsum("offloaded", "baggage_offloaded")}
         |FROM j GROUP BY flight_number, f_departed, flight_status
         |ORDER BY $flightRankSql, flight_number""".stripMargin
    },
  )
}
