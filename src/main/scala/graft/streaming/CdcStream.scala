package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** The reference's ingestion + materialization path (SURVEY.md §3.2),
  * Spark-native: a raw CDC stream lands in an append-only log, a
  * materialized-view stream normalizes each ingested block into the
  * latest-state table's log, and readers apply the FINAL dedup view.
  *
  *   Kafka/file source → raw append (S1/S2)
  *     → MV transform stream (S4, users_mv.pipe:1-20)
  *       → versioned log (ReplacingMergeTree analogue, S3)
  *         → FINAL view / hourly copy snapshot (D2/D3)
  *
  * Scale: the streaming path is stateless (projection only), so
  * executors scale horizontally with source partitions and there is no
  * state store to grow. Latest-state is resolved at read (dedup view)
  * or by the scheduled compaction job — exactly the reference's
  * ReplacingMergeTree + background-merge split. The optional
  * flatMapGroupsWithState variant keeps per-key state in the stream
  * instead; its memory is bounded by key cardinality, which the
  * reference accepts too (its table IS that state).
  */
object CdcStream {

  /** The CDC event schema (events-table shape; ts = version). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S1 — streaming scan with declared schema (no inference, mirroring
    * the fixed SCHEMA block of `.datasource` files). File source here;
    * swap `.format("kafka")` + from_json for a broker deployment. */
  def readEvents(spark: SparkSession, srcDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(srcDir)

  /** S4 — the materialized-view transform (users_mv.pipe:4-17 semantics):
    * per-column extraction + defaults, applied to every ingested block. */
  def materializedView(raw: DataFrame): DataFrame =
    raw.select(
      col("event_id"), col("user_id"), col("ts"),
      col("event_type"),
      coalesce(col("value"), lit(0.0)).as("value"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"))

  /** Start the MV stream appending into the versioned log. With
    * `partitioned`, the sink lays out the log MergeTree-style
    * (ENGINE_PARTITION_KEY "toYYYYMM(...)", users_raw.datasource:17):
    * yyyymm directories that partition-prune incremental readers. */
  def startMv(spark: SparkSession, srcDir: String, logDir: String,
              checkpointDir: String, partitioned: Boolean = false): StreamingQuery = {
    val mv = materializedView(readEvents(spark, srcDir))
    val writer =
      if (partitioned)
        mv.withColumn("yyyymm", graft.functions.ChFunctions.toYYYYMM(col("ts")))
          .writeStream.partitionBy("yyyymm")
      else mv.writeStream
    writer
      .format("parquet")
      .option("path", logDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-side exactly-once-per-key dedup MV: at-least-once delivery
    * (Kafka redeliveries, producer retries) re-sends event_ids, and
    * dedup-on-read pays for those duplicates on EVERY query.
    * `dropDuplicatesWithinWatermark` removes them at ingest with
    * bounded state: one entry per event_id seen within the watermark
    * horizon, dropped as event time passes — the state never grows with
    * the stream, which is what makes the operator viable on an
    * unbounded 100 TB-scale log (a plain dropDuplicates would pin every
    * key forever). Redeliveries later than the horizon are the
    * at-least-once tail risk; the downstream RMT dedup-on-read view
    * still collapses those, so the MV is a cost optimization in front
    * of a correctness backstop, exactly like the reference's
    * ReplacingMergeTree posture. */
  def startDedupMv(spark: SparkSession, srcDir: String, outDir: String,
                   checkpointDir: String,
                   watermarkMinutes: Int = 60): StreamingQuery =
    dedupedStream(readEvents(spark, srcDir), watermarkMinutes)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `documents` table shape for streaming corpus ingest. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The `embeddings` table shape for streaming vector ingest. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming IVF index maintenance — the vector analogue of the
    * minhash-band MV: every arriving embedding is assigned to its
    * nearest anchor list IN ROW
    * ([[graft.operators.VectorOps.perRowListAssign]] — the window-free
    * form of the batch canon) and appended to the layout PARTITIONED
    * BY list_id — the same on-disk shape as
    * [[graft.operators.VectorOps.writeIvfLayout]], so the
    * streaming-maintained index is directly searchable by
    * `knnIvfOverLayout` with probe pruning running as dynamic
    * partition pruning in the scan. (One tie nuance: the per-row form
    * assigns by 6dp-ROUNDED similarity, the batch writer by raw —
    * a vector whose two best anchors agree to six decimals can land
    * in a different list than the batch layout; assignment is still
    * deterministic within each path, and IvfLayoutSpec's
    * search-equality contract is stated for the batch-written
    * layout.) At 100 TB this is how the ANN
    * index stays current: assignment cost is per-vector, the append
    * lands in the probed-list partition, and search reads only its
    * probed lists. */
  def startIvfAssignMv(spark: SparkSession, srcDir: String, outDir: String,
                       checkpointDir: String,
                       anchors: Seq[(Long, Array[Float])]): StreamingQuery = {
    graft.functions.GraftFunctions.register(spark)
    spark.readStream.schema(embSchema).parquet(srcDir)
      .select(col("vec_id"), col("label"), col("embedding"),
        graft.operators.VectorOps.perRowListAssign(col("embedding"), anchors)
          .as("list_id"))
      .writeStream
      .format("parquet")
      .partitionBy("list_id")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup screening — artifact upkeep AT INGEST: every
    * micro-batch of arriving vectors is screened against the staged
    * near-dup probe layout ([[graft.operators.VectorOps.screenAgainstLayout]])
    * and its verdicts (near_dup/novel + matched vector + exact cosine)
    * append to a verdict log, stamped with the batch id. The
    * reference's MV-at-ingest pattern (users_mv.pipe:19-20: precompute
    * at ingest, serve precomputed) applied to the dedup artifact: the
    * curation decision is made once, on arrival, instead of per
    * downstream consumer.
    *
    * Each vector's verdict depends only on (vector, layout) — no
    * cross-batch state — so N streamed batches equal one batch
    * recompute over the union (asserted in StreamingSpec), and
    * foreachBatch's at-least-once replay can only rewrite identical
    * rows (dedup-on-read by (vec_id) collapses them; the spec's
    * equality uses the distinct verdict set). At 100 TB: the
    * micro-batch probe frame broadcasts and DPP-prunes the layout
    * scan to the probed cells — ingest screening cost is
    * per-arriving-vector, never per-corpus. */
  def startVectorScreenMv(spark: SparkSession, srcDir: String, layout: String,
                          outDir: String, checkpointDir: String,
                          minCosine: Double = 0.4): StreamingQuery = {
    graft.functions.GraftFunctions.register(spark)
    spark.readStream.schema(embSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.VectorOps
          .screenAgainstLayout(spark, batch, layout, minCosine)
          .withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup screening for DOCUMENTS — the text half of the
    * ingest-screen pair (the round-9 ask was "docs/vectors";
    * [[startVectorScreenMv]] covers vectors): every micro-batch of
    * arriving documents is screened against the STAGED dedup
    * artifacts ([[graft.operators.TextDedup.screenDocsAgainstArtifacts]]
    * — candidates from the staged inverted index restricted to the
    * batch's own shingles) and its verdicts (near_dup/novel + matched
    * doc + exact Jaccard) append to a verdict log, stamped with the
    * batch id.
    *
    * Same contracts as the vector screen: a doc's verdict depends
    * only on (doc, staged state) — classification by STORED dfs, so N
    * streamed batches equal one batch screen over the union (asserted
    * in StreamingSpec), and at-least-once replay can only rewrite
    * identical rows. At 100 TB: per-batch cost is bounded by the
    * batch's shingles × maxDf candidate fan-out against the compact
    * staged index — never a corpus re-shingle, never corpus×corpus. */
  def startDocScreenMv(spark: SparkSession, srcDir: String, art: String,
                       outDir: String, checkpointDir: String,
                       minJaccard: Double = 0.5,
                       maxDf: Int = graft.operators.TextDedup.DefaultMaxDf): StreamingQuery = {
    graft.functions.GraftFunctions.register(spark)
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextDedup
          .screenDocsAgainstArtifacts(spark, batch, art, minJaccard, maxDf)
          .withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming PII scrub — the privacy MV: every arriving document is
    * redacted IN ROW ([[graft.operators.Privacy.scrub]], a pure
    * codegen'd projection) and appended with its audit count, so
    * nothing downstream of this sink ever sees raw PII. Stateless —
    * the scrub-at-ingest placement is the point: at 100 TB you scrub
    * each byte exactly once, on arrival, not per consumer. Equality
    * with the batch scrub over any replay is asserted in
    * StreamingSpec. */
  def startScrubMv(spark: SparkSession, srcDir: String, outDir: String,
                   checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .select(col("doc_id"),
        graft.operators.Privacy.scrub(col("text")).as("text"),
        graft.operators.Privacy.digitCount(col("text")).as("n_pii_digits"),
        col("lang"), col("source"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming near-dup signature maintenance — the dedup MV: each
    * arriving document's MinHash band signature is computed IN ROW
    * (stateless projection, [[graft.operators.TextDedup.minhashBandsPerRow]])
    * and appended to the bands log; dedup-on-read then bucket-joins the
    * log exactly like the batch path. This is how the 100 TB corpus
    * keeps its dedup index current incrementally: signature cost is
    * paid once per document at ingest, never re-paid per dedup query,
    * and the stream holds no state. */
  def startMinhashMv(spark: SparkSession, srcDir: String, bandsDir: String,
                     checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        explode(graft.operators.TextDedup.minhashBandsPerRow(col("text"))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
      .writeStream
      .format("parquet")
      .option("path", bandsDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  case class BandRow(doc_id: Long, band: Int, band_hash: Long)
  case class BandPair(band: Int, doc_a: Long, doc_b: Long)

  /** Streaming near-dup CANDIDATE emission — one step past maintaining
    * the band index: a stateful stream keyed by LSH bucket (band,
    * band_hash) whose state is the bucket's member docs; each arriving
    * doc emits a candidate pair with every previously-seen member,
    * exactly once per bucket (the pair carries its band, so downstream
    * verify/cluster stages dedup across bands exactly like the batch
    * path's `.distinct()`). The accumulated pair log equals the batch
    * LSH candidate join over the same corpus AS LONG AS no bucket
    * exceeds `maxBucket` members (StreamingSpec asserts both the
    * equality and that precondition at test SF).
    *
    * Scale: state per bucket is its member list, and emission cost is
    * the collision count — identical to the batch candidate join's
    * output, paid incrementally. `maxBucket` bounds both against hot
    * boilerplate buckets (the streaming analogue of the df cap): docs
    * arriving at a full bucket are dropped from pairing, deterministic
    * by arrival order — a documented recall boundary (a bucket that
    * wide is a boilerplate cluster; the batch comparison has no cap,
    * so past it the streams's pair set is a strict subset). */
  def incrementalCandidatePairs(spark: SparkSession, bands: DataFrame,
                                maxBucket: Int = 64): Dataset[BandPair] = {
    import spark.implicits._
    bands.select(col("doc_id"), col("band").cast("int").as("band"), col("band_hash"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState[Seq[Long], BandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val seenSet = seen.toSet
          val fresh = rows.map(_.doc_id).toSeq.distinct
            .filterNot(seenSet).sorted
          val out = Seq.newBuilder[BandPair]
          var acc = seen
          for (d <- fresh if acc.size < maxBucket) {
            acc.foreach(o =>
              out += BandPair(key._1, math.min(o, d), math.max(o, d)))
            acc = acc :+ d
          }
          state.update(acc)
          out.result().iterator
      }
  }

  /** The candidate-pair MV end to end: per-row band signatures
    * (stateless) feeding the stateful bucket pairing, appended to a
    * pair log — the dedup index AND its collision pairs both kept
    * current at ingest time. */
  def startCandidatePairsMv(spark: SparkSession, srcDir: String,
                            pairsDir: String, checkpointDir: String): StreamingQuery =
    incrementalCandidatePairs(spark,
      spark.readStream.schema(docSchema).parquet(srcDir)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          explode(graft.operators.TextDedup.minhashBandsPerRow(col("text"))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash")))
      .writeStream
      .format("parquet")
      .option("path", pairsDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  // value is Option: the batch as-of join passes a null purchase value
  // through untouched, and the incremental==batch contract must hold
  // column-for-column, so no coalesce here either
  case class AsOfEvent(user_id: Long, is_left: Boolean, ts: java.time.LocalDateTime,
                       event_id: Long, value: Option[Double])
  case class AsOfState(ts: java.time.LocalDateTime, event_id: Long)
  case class AsOfMatch(event_id: Long, user_id: Long, ts: java.time.LocalDateTime,
                       value: Option[Double], click_event_id: Option[Long],
                       click_ts: Option[java.time.LocalDateTime])

  /** Streaming as-of enrichment — the stateful stream form of
    * [[graft.operators.AsOfJoin]]: both sides arrive as one keyed
    * stream; per key the state is the latest right-side version seen,
    * right rows advance it, left rows emit enriched with it. Within a
    * micro-batch rows are processed in (ts, side, id) order — identical
    * to the batch window's sort — so as long as batches respect event
    * time ACROSS batch boundaries (CDC logs replayed in order, the
    * reference's topic contract), the incremental output equals the
    * batch as-of join (asserted in StreamingSpec).
    *
    * Scale: state is ONE version per key (the same bound as the
    * reference's latest-state table), emission is per left row; no
    * timeline is ever re-scanned. */
  def streamingAsOf(spark: SparkSession, events: DataFrame): Dataset[AsOfMatch] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), (col("event_type") === "purchase").as("is_left"),
        col("ts"), col("event_id"), col("value"))
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[AsOfEvent], state: GroupState[AsOfState]) =>
          var cur = state.getOption
          val out = Seq.newBuilder[AsOfMatch]
          // (ts, right-before-left, id): the batch window's exact order
          val ordered = rows.toSeq.sortBy(e =>
            (e.ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              e.ts.getNano / 1000, e.is_left, e.event_id))
          for (e <- ordered) {
            if (!e.is_left) {
              if (cur.forall(c => c.ts.isBefore(e.ts) ||
                  (c.ts == e.ts && c.event_id < e.event_id)))
                cur = Some(AsOfState(e.ts, e.event_id))
            } else
              out += AsOfMatch(e.event_id, key, e.ts, e.value,
                cur.map(_.event_id), cur.map(_.ts))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Watermarked stream-stream interval join: every error event joins
    * the SAME user's click events from the preceding `windowMinutes` —
    * the error-attribution query ("which interaction preceded this
    * failure") as a true two-stream join, not a stream-static lookup.
    *
    * Both sides carry a watermark, and the join condition bounds
    * click_ts to [error_ts − window, error_ts]; together these let the
    * engine EVICT click state older than watermark − window instead of
    * buffering one side forever — the property that makes a
    * stream-stream join runnable indefinitely at production rates.
    * Inner join: results emit as soon as both sides arrive, and
    * accumulated output equals the batch range join of everything
    * ingested (asserted in StreamingSpec across a checkpointed
    * restart, clicks and errors arriving in separate increments). */
  def streamClickErrorJoin(spark: SparkSession, clicks: DataFrame,
                           errors: DataFrame, windowMinutes: Int = 10,
                           watermarkDelay: String = "30 minutes"): DataFrame = {
    // watermarks need LTZ event time; session TZ is UTC so the cast is
    // a pure reinterpretation (same convention as dedupedStream)
    val c = clicks
      .filter(col("event_type") === "click")
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", watermarkDelay)
      .select(col("event_id").as("click_event_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("ts_ltz").as("click_ts_ltz"))
    val e = errors
      .filter(col("event_type") === "error")
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", watermarkDelay)
      .select(col("event_id").as("error_event_id"),
        col("user_id"), col("ts").as("error_ts"), col("ts_ltz"))
    e.join(c,
      col("click_user") === col("user_id") &&
        col("click_ts_ltz") <= col("ts_ltz") &&
        col("click_ts_ltz") >= col("ts_ltz") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("error_event_id", "user_id", "error_ts", "click_event_id", "click_ts")
  }

  /** S1 — the generic per-column JSONPath ingest projection for a parsed
    * `.datasource` (users_raw.datasource:3-14): each declared column is
    * extracted from the raw message by its `json:$.path` and cast to the
    * declared type; meta-columns are bound from the transport layer —
    * `__value` ← the raw message (KAFKA_STORE_RAW_VALUE),
    * `__timestamp` ← the Kafka record timestamp (ingest time).
    * get_json_object is codegen'd, so ingest is one fused projection.
    * Extraction failures yield nulls → route by [[startMvWithQuarantine]]'s
    * validity split (S8). */
  def jsonPathProjection(raw: DataFrame,
                         ds: graft.sources.KitParser.DatasourceDef): DataFrame = {
    val cols = ds.columns.map { c =>
      c.jsonPath match {
        case Some(path) =>
          get_json_object(col("__raw_value"), path).cast(c.dataType).as(c.name)
        case None if c.name == "__value" => col("__raw_value").as("__value")
        case None => lit(null).cast(c.dataType).as(c.name)
      }
    } :+ col("__kafka_timestamp").cast("timestamp_ntz").as("__timestamp")
    raw.select(cols: _*)
  }

  /** S1 — Kafka streaming scan for a parsed datasource definition: topic,
    * group id and offset reset come from the KAFKA_* binding
    * (users_raw.datasource:20-27). Not exercisable in this container
    * (no broker); the projection itself is covered in batch by
    * StreamingSpec via [[jsonPathProjection]]. */
  def readKafkaDatasource(spark: SparkSession, brokers: String,
                          ds: graft.sources.KitParser.DatasourceDef): DataFrame = {
    val stream = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", ds.kafkaTopic.getOrElse(
        throw new IllegalArgumentException(s"${ds.name} has no KAFKA_TOPIC")))
      .option("startingOffsets",
        ds.kafkaAutoOffsetReset.getOrElse("latest") match {
          case "earliest" => "earliest"; case _ => "latest"
        })
      .option("kafka.group.id", ds.kafkaGroupId.getOrElse(s"graft-${ds.name}"))
      .load()
      .select(col("value").cast("string").as("__raw_value"),
        col("timestamp").as("__kafka_timestamp"))
    jsonPathProjection(stream, ds)
  }

  /** S8 — schema-validity predicate for the ingest path: rows whose raw
    * payload fails per-column extraction are quarantined, not ingested
    * (tb_functions.py:141-142's `<ds>_quarantine` side table).
    * `prop_k` is a REQUIRED typed column of the MV (the users_mv
    * pattern: every JSONPath column must extract), so a present props
    * payload without an integer `k` is a schema mismatch by contract —
    * same as the reference quarantining a row whose column fails its
    * cast; a wholly-null props is the absent-payload case and valid.
    * The events_quarantine oracle applies the same k-extraction rule. */
  private def isValid = col("user_id").isNotNull && col("ts").isNotNull &&
    (col("props").isNull || get_json_object(col("props"), "$.k").cast("int").isNotNull)

  /** S4 + S8 — the MV stream with a quarantine side-sink: each micro
    * batch is split once; good rows are normalized into the log, bad
    * rows land in the quarantine table with a rejection timestamp.
    * Delivery is foreachBatch's AT-LEAST-ONCE (a crash between the
    * appends and the checkpoint commit replays the batch): log-side
    * duplicates are absorbed by the FINAL view's dedup-on-read, and
    * [[reprocessQuarantine]] distincts the quarantine side before
    * recovery — the batch id is stamped into `__quarantined_batch` so
    * a replay is diagnosable from the artifact. */
  def startMvWithQuarantine(spark: SparkSession, srcDir: String, logDir: String,
                            quarantineDir: String, checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tagged = batch.withColumn("__ok", isValid).cache()
        try {
          materializedView(tagged.filter(col("__ok")).drop("__ok"))
            .write.mode("append").parquet(logDir)
          tagged.filter(!col("__ok")).drop("__ok")
            .withColumn("__quarantined_batch", lit(batchId))
            .write.mode("append").parquet(quarantineDir)
        } finally tagged.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** S8 recovery — re-ingest quarantined rows after a fix. The missing
    * half of the quarantine lifecycle (land → inspect → FIX →
    * reprocess): `fix` is the operator's repair transform (the schema
    * fix, a props rewrite, a backfilled column …) applied to the
    * quarantined raw rows; rows that now pass the SAME validity
    * predicate the ingest split uses are normalized through the SAME
    * [[materializedView]] transform and appended to the log, rows that
    * still fail stay quarantined (their `__quarantined_batch` is reset
    * to -1 to mark a reprocess survivor).
    *
    * Crash safety + live-stream safety (move-out, then process —
    * never delete-then-move): the quarantine dir is first atomically
    * RENAMED to a work dir, so rows a concurrently-running
    * [[startMvWithQuarantine]] stream appends after that instant land
    * in a freshly recreated quarantine dir and simply wait for the
    * next pass — nothing is ever deleted out from under a writer. A
    * crash at ANY point leaves every row in exactly one of {log, work
    * dir, quarantine dir}: the next invocation restores a leftover
    * work dir into the quarantine dir by per-file atomic moves before
    * proceeding. The delete set is pinned to the READ set (one file
    * enumeration feeds both the parquet read and the cleanup), so
    * even a batch whose commit straddles the rename and lands a late
    * file inside the work dir loses nothing — the late file is
    * neither read nor deleted, and the next pass restores it. The at-least-once failure mode is rows present in
    * BOTH log and quarantine, which the dedup-on-read FINAL view
    * collapses (same (ts, event_id) version wins once), so
    * reprocessing is idempotent at the serving layer: re-running with
    * the same fix recovers 0 rows and changes nothing. Asserted in
    * StreamingSpec: corrupt → quarantine → fix → reprocess → endpoint
    * state equals the never-corrupted run (and a crash-simulation row
    * covers the leftover-work-dir restore).
    *
    * @return (recovered, stillQuarantined) row counts. */
  def reprocessQuarantine(spark: SparkSession, quarantineDir: String,
                          logDir: String)
                         (fix: DataFrame => DataFrame): (Long, Long) = {
    val qDir = new java.io.File(quarantineDir)
    val workDir = new java.io.File(quarantineDir + ".reprocess_work")
    if (workDir.isDirectory) {
      // leftover from a crashed (or straggler-bearing) previous
      // attempt: restore file-by-file (each move atomic, so a crash
      // mid-restore just resumes here)
      restoreWork(workDir, qDir)
    }
    if (!qDir.isDirectory) return (0L, 0L) // nothing ever quarantined
    java.nio.file.Files.move(qDir.toPath, workDir.toPath)
    // enumerate the work dir ONCE and make the read set and the
    // delete set the SAME explicit file list: a streaming batch whose
    // parquet commit straddled the rename can land a late file inside
    // the work dir after this listing, and a directory-wide
    // deleteRec would silently destroy those just-committed rows
    // (read-set ≠ delete-set). With the pinned list, a late file is
    // simply not read and not deleted — it waits in the work dir and
    // the leftover-restore pass above returns it to the quarantine
    // dir on the next invocation. (Underscore/dot files are Spark
    // commit machinery — _SUCCESS, _temporary — never row data.)
    val workFiles = Option(workDir.listFiles)
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    if (workFiles.isEmpty) {
      // nothing readable landed before the rename: put the (possibly
      // straggler-bearing) work dir back and report an empty pass
      restoreWork(workDir, qDir)
      return (0L, 0L)
    }
    // .distinct: foreachBatch is at-least-once, so a batch replayed
    // across a crash can have appended the same quarantine rows twice;
    // reprocess collapses them (the log side is absorbed by the FINAL
    // view's dedup-on-read, this is the quarantine-side analogue)
    val fixed = fix(spark.read.parquet(workFiles.map(_.toString).toIndexedSeq: _*)
        .drop("__quarantined_batch").distinct())
      .withColumn("__ok", isValid).cache()
    try {
      val recovered = fixed.filter(col("__ok")).drop("__ok")
      val nRecovered = recovered.count()
      if (nRecovered > 0)
        materializedView(recovered).write.mode("append").parquet(logDir)
      val still = fixed.filter(!col("__ok")).drop("__ok")
        .withColumn("__quarantined_batch", lit(-1L))
      val nStill = still.count()
      // APPEND (never overwrite — the live stream may already have
      // re-quarantined fresh rows next to ours); coalesce(1) keeps one
      // task even for 0 rows, so an all-recovered pass still leaves a
      // schema-bearing file the next reader/endpoint can open
      still.coalesce(1).write.mode("append").parquet(quarantineDir)
      // delete exactly what was read; any straggler stays for the
      // next invocation's restore pass, and the dir itself goes only
      // once it is truly empty
      workFiles.foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
      restoreWork(workDir, qDir)
      (nRecovered, nStill)
    } finally fixed.unpersist()
  }

  /** Return every file still in a reprocess work dir to the live
    * quarantine dir (per-file atomic moves), then remove the work dir
    * if — and only if — it is empty. Commit-machinery files
    * (`_SUCCESS`, `_temporary`) are deleted, not restored: they carry
    * no rows and a stale `_SUCCESS` in the quarantine dir would lie
    * about a completed write. */
  private def restoreWork(workDir: java.io.File, qDir: java.io.File): Unit = {
    qDir.mkdirs()
    for (f <- Option(workDir.listFiles).getOrElse(Array.empty[java.io.File])) {
      if (f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        java.nio.file.Files.move(f.toPath,
          new java.io.File(qDir, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else graft.sources.Layout.deleteRec(f)
    }
    // deletes only an empty dir; a file that landed between the loop
    // and here keeps the dir alive for the next restore pass
    workDir.delete()
  }

  /** Ingestion observability — the analogue of the reference's
    * per-run ingest stats: `observe` attaches named aggregates to the
    * MV stream itself, so every micro-batch reports rows seen, rows
    * quarantined and the value checksum through the engine's progress
    * events (no second pass over the data, no side channel). A
    * monitoring consumer reads `StreamingQueryProgress.observedMetrics`
    * — asserted in StreamingSpec against the batch truth. */
  def startObservedMv(spark: SparkSession, srcDir: String, logDir: String,
                      checkpointDir: String): StreamingQuery =
    materializedView(
        readEvents(spark, srcDir)
          .observe("ingest_stats",
            count(lit(1)).as("rows_seen"),
            sum(when(isValid, 0L).otherwise(1L)).as("rows_invalid"),
            sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long"))
              .as("value_cents")))
      .writeStream
      .format("parquet")
      .option("path", logDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** D2 — FINAL read view over the materialized log (partitioned or
    * not — the yyyymm layout column is not part of the row payload). */
  def finalView(spark: SparkSession, logDir: String): DataFrame = {
    val log = spark.read.parquet(logDir)
    val base = if (log.columns.contains("yyyymm")) log.drop("yyyymm") else log
    Dedup.latestByKey(base, Seq("user_id"),
      version = struct(col("ts"), col("event_id")),
      payload = Seq("event_id", "ts", "event_type", "value", "prop_k"))
  }

  /** S5/D3 — the scheduled copy job (users_batch_copy.pipe:8-70): read
    * the snapshot's high-watermark, collapse newer log events per key,
    * keep unsuperseded prior rows, append the new snapshot generation.
    * Each generation is stamped so readers take max(generation). */
  def runCopyJob(spark: SparkSession, logDir: String, snapDir: String): Unit = {
    val log = spark.read.parquet(logDir)
    val payload = Seq("event_id", "ts", "event_type", "value", "prop_k")
    val snapExists = new java.io.File(snapDir).exists() &&
      new java.io.File(snapDir).listFiles().exists(_.getName.endsWith(".parquet"))
    val next: DataFrame = if (!snapExists) {
      Dedup.latestByKey(log, Seq("user_id"),
          struct(col("ts"), col("event_id")), payload)
        .withColumn("generation", lit(1L))
    } else {
      val snap = spark.read.parquet(snapDir)
      val genRow = snap.agg(max(col("generation"))).first()
      if (genRow.isNullAt(0)) {
        // empty snapshot table (e.g. a zero-row first generation):
        // behave like the bootstrap path
        Dedup.latestByKey(log, Seq("user_id"),
            struct(col("ts"), col("event_id")), payload)
          .withColumn("generation", lit(1L))
      } else {
        val gen = genRow.getLong(0)
        val prior = snap.filter(col("generation") === gen).drop("generation")
        val wmRow = prior.agg(max(col("ts")).as("wm")).first()
        val wm = wmRow.getAs[java.time.LocalDateTime]("wm")
        // inclusive: a late event with ts == wm but a higher event_id
        // tie-break must still supersede the prior row
        Dedup.incrementalSnapshot(prior, log, Seq("user_id"),
            struct(col("ts"), col("event_id")), "ts", payload, lit(wm),
            inclusive = true)
          .withColumn("generation", lit(gen + 1))
      }
    }
    next.write.mode("append").parquet(snapDir)
  }

  /** Read the current snapshot (latest generation); empty table → empty
    * frame rather than an NPE on the null max. */
  def readSnapshot(spark: SparkSession, snapDir: String): DataFrame = {
    val snap = spark.read.parquet(snapDir)
    val genRow = snap.agg(max(col("generation"))).first()
    if (genRow.isNullAt(0)) snap.limit(0).drop("generation")
    else snap.filter(col("generation") === genRow.getLong(0)).drop("generation")
  }

  /** SummingMergeTree pattern (the third MergeTree engine, after
    * Replacing = [[finalView]] and Aggregating = the HLL sketch
    * rollup): each micro-batch appends PARTIAL sums per (hour,
    * event_type) — integer cents, so partials merge associatively —
    * and the read view collapses partials by summing. Merge-on-read
    * exactly like FINAL; a background compaction can collapse the log
    * at any time without changing results. State-free streaming: the
    * aggregate lives in storage as mergeable partials, not in a state
    * store, so the stream scales with source partitions and restarts
    * cold. */
  /** Streaming KMV distinct-sketch MV — the `-State` half of the
    * oracled KMV family (CdcPipes.activeUsersKmvPerHour): each micro
    * batch appends its per-hour ≤ k smallest distinct md5-low64 user
    * hashes to a partial log; [[kmvView]] is the `-Merge` read.
    *
    * Unlike the summing MV — whose partials double-count on replay and
    * need the overwrite-per-batch-id discipline — KMV partials are
    * DUPLICATE-IDEMPOTENT: the k smallest of a union are unchanged by
    * repeated elements, so plain append is exactly-once-equivalent
    * under ANY at-least-once redelivery (StreamingSpec replays the
    * whole stream twice and asserts the view is unchanged). At 100 TB
    * the log grows by ≤ k longs per (hour, batch) — metadata scale —
    * and the view's merge is a shuffle of kept hashes, never events. */
  def startKmvMv(spark: SparkSession, srcDir: String, partialsDir: String,
                 checkpointDir: String, k: Int = 64): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        batch
          .select(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("time_interval"),
            graft.functions.OracleHash.low64(col("user_id").cast("string")).as("h"))
          .distinct()
          .withColumn("__rn", row_number().over(
            Window.partitionBy("time_interval").orderBy("h")))
          .filter(col("__rn") <= k).drop("__rn")
          .write.mode("append").parquet(partialsDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `-Merge` read view over the KMV partial log. */
  def kmvView(spark: SparkSession, partialsDir: String, k: Int = 64): DataFrame =
    graft.pipes.CdcPipes.kmvMergeEstimate(spark.read.parquet(partialsDir), k)

  /** Streaming count-min MV: each micro-batch writes its own CMS
    * counter cells (≤ hours × depth × width rows — sketch scale, not
    * event scale); [[cmsView]] is the `-Merge` read (cell-wise sum).
    *
    * CMS partials, like sums and UNLIKE KMV minima, are NOT
    * duplicate-idempotent — a replayed batch's cells would
    * double-count — so this MV uses the same overwrite-per-batch-id
    * discipline as [[startSummingMv]]: re-execution of a batch id
    * rewrites the same directory and is a no-op. At 100 TB the counter
    * log grows by a bounded number of cells per (hour, batch) while
    * answering per-key frequency probes over any time range by merging
    * stored cells — never re-scanning events. */
  def startCmsMv(spark: SparkSession, srcDir: String, cellsDir: String,
                 checkpointDir: String,
                 depth: Int = 4, width: Int = 1024): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Sketches.cmsCounters(
            batch.select(
              date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
              col("user_id")),
            col("user_id").cast("string"), Seq("hour"), depth, width)
          .write.mode("overwrite").parquet(s"$cellsDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `-Merge` read over the CMS cell log: cell-wise addition (the
    * batch=N layout column is bookkeeping, not payload). */
  def cmsView(spark: SparkSession, cellsDir: String): DataFrame =
    spark.read.parquet(cellsDir)
      .groupBy("hour", "r", "bucket")
      .agg(sum(col("c")).as("c"))

  /** Streaming column-profile MV — data-quality monitoring as a
    * mergeable summary: each micro-batch writes 5 profile rows
    * (per-column counts + typed min/max lanes,
    * [[graft.operators.Profile.eventsProfilePartial]]). Counts are
    * sums — NOT duplicate-idempotent — so this MV uses the
    * overwrite-per-batch-id discipline of [[startCmsMv]]: a replayed
    * batch rewrites its own directory and the view cannot
    * double-count. The log grows by 5 rows per batch while answering
    * "how many nulls / what range has this column ever seen" without
    * re-scanning events. */
  def startProfileMv(spark: SparkSession, srcDir: String, partialsDir: String,
                     checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Profile.eventsProfilePartial(batch)
          .write.mode("overwrite").parquet(s"$partialsDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `-Merge` read over the profile-partial log. */
  def profileView(spark: SparkSession, partialsDir: String): DataFrame =
    graft.operators.Profile.mergeProfilePartials(
      spark.read.parquet(partialsDir)
        .drop("batch"))

  /** Streaming Bloom-filter MV over per-user event membership: each
    * micro-batch appends its words' OR-partials. The third idempotence
    * discipline of the sketch-MV family, completing the set: KMV
    * minima are duplicate-idempotent (plain append, [[startKmvMv]]),
    * CMS counters are not (overwrite-per-batch-id, [[startCmsMv]]),
    * and Bloom bits are OR-idempotent — re-delivered batches re-OR the
    * same bits, so plain append survives any at-least-once replay,
    * like KMV. The log grows by ≤ mWords longs per batch; the read
    * view ORs words — membership probes over the full history without
    * re-scanning events. */
  def startBloomMv(spark: SparkSession, srcDir: String, wordsDir: String,
                   checkpointDir: String,
                   mWords: Int = 1024, kHashes: Int = 4): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Sketches.bloomWords(
            batch.select(col("user_id").cast("string").as("key")),
            col("key"), mWords, kHashes)
          .write.mode("append").parquet(wordsDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `-Merge` read over the Bloom word log (word-wise OR), probed
    * with [[graft.operators.Sketches.bloomProbe]]. */
  def bloomView(spark: SparkSession, wordsDir: String): DataFrame =
    spark.read.parquet(wordsDir)
      .groupBy("word_idx")
      .agg(bit_or(col("bits")).as("bits"))

  /** Streaming quantile-sketch MV: each micro-batch appends its
    * bottom-`k` value sample per event type
    * ([[graft.operators.Sketches.quantilePartial]] — md5-rank
    * membership); [[quantileView]] is the `-Merge` read answering any
    * quantile from the merged sample. Like KMV minima and Bloom
    * words, the partials are duplicate-IDEMPOTENT (identical rows
    * re-rank to identical positions and the merge's distinct absorbs
    * them), so plain append survives any at-least-once redelivery.
    * The log grows by ≤ k rows per (type, batch) — sketch scale — and
    * p99 dashboards over the full history never re-scan events. */
  def startQuantileMv(spark: SparkSession, srcDir: String, partialsDir: String,
                      checkpointDir: String, k: Int = 64): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Sketches.quantilePartial(
            batch.select(col("event_type"), col("event_id"), col("value")), k)
          .write.mode("append").parquet(partialsDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The `-Merge` read over the quantile-partial log. */
  def quantileView(spark: SparkSession, partialsDir: String, k: Int = 64): DataFrame =
    graft.operators.Sketches.quantileMerge(spark.read.parquet(partialsDir), k)

  def startSummingMv(spark: SparkSession, srcDir: String, sumsDir: String,
                     checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
            col("event_type"))
          .agg(sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long"))
              .as("partial_cents"),
            count(lit(1)).as("partial_n"))
          // idempotent per micro-batch: foreachBatch is at-least-once,
          // and an append here would double-count a replayed batch's
          // partials (sums, unlike latest-state logs, do NOT absorb
          // duplicates). One directory per batch id, overwritten on
          // replay, makes re-execution a no-op.
          .write.mode("overwrite").parquet(s"$sumsDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The SummingMergeTree read view: collapse partials (the batch=N
    * layout column is bookkeeping, not payload). */
  def summingView(spark: SparkSession, sumsDir: String): DataFrame =
    spark.read.parquet(sumsDir)
      .groupBy("hour", "event_type")
      .agg((sum(col("partial_cents")) / 100.0).as("total_value"),
        sum(col("partial_n")).as("n"))

  /** Streaming feature store, write side: per micro-batch, fold the
    * event stream to (user, day, event_type) partials — count, integer
    * cents, and the running (ts, event_id, event_type) argmax struct.
    * The day grain is the feature-store contract: serving windows cut
    * at day boundaries, so partials are mergeable forever (counts and
    * cents add; the argmax struct maxes) and a day's partial stops
    * changing once its day has passed. Same idempotence discipline as
    * [[startSummingMv]]: one overwritten directory per batch id, so
    * at-least-once replay can't double-count. */
  def startUserDayFeaturesMv(spark: SparkSession, srcDir: String,
                             partialsDir: String,
                             checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(col("user_id"),
            date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("partial_n"),
            sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long"))
              .as("partial_cents"),
            max(struct(col("ts"), col("event_id"), col("event_type")))
              .as("partial_last"))
          .write.mode("overwrite").parquet(s"$partialsDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming feature store, read side: serve per-user 1/7/28-day
    * features from the day-partial log — the merge-on-read twin of the
    * batch [[graft.pipes.CdcPipes.userWindowFeatures]], at DAY grain
    * (windows are "the last k complete days through the newest day in
    * the log", so the serving cut is reproducible from partials alone;
    * the batch endpoint's exact-instant windows need the raw log).
    * Reading ≤28×|types| tiny rows per user replaces a rescan of the
    * full event history — the point of the MV at 100 TB: feature
    * freshness is one micro-batch behind, serving cost is partial-sized.
    * All lanes merge associatively (sums of longs, max of structs), so
    * replay/merge order can't change a served value. */
  def userDayFeaturesView(spark: SparkSession, partialsDir: String): DataFrame = {
    val p = spark.read.parquet(partialsDir)
    val anchor = p.agg(max(col("day")).as("__d"))
    def inWin(days: Int) = col("day") > col("__d") - expr(s"INTERVAL $days DAYS")
    p.crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        sum(when(inWin(1), col("partial_n")).otherwise(0L)).as("n_1d"),
        sum(when(inWin(7), col("partial_n")).otherwise(0L)).as("n_7d"),
        sum(when(inWin(28), col("partial_n")).otherwise(0L)).as("n_28d"),
        (sum(when(inWin(1), col("partial_cents")).otherwise(0L)) / 100.0).as("value_1d"),
        (sum(when(inWin(7), col("partial_cents")).otherwise(0L)) / 100.0).as("value_7d"),
        (sum(when(inWin(28), col("partial_cents")).otherwise(0L)) / 100.0).as("value_28d"),
        countDistinct(when(inWin(28), col("event_type"))).as("n_types_28d"),
        max(col("partial_last")).as("__last"))
      .select(col("user_id"), col("n_1d"), col("n_7d"), col("n_28d"),
        col("value_1d"), col("value_7d"), col("value_28d"), col("n_types_28d"),
        col("__last.ts").as("last_ts"),
        col("__last.event_type").as("last_type"))
  }

  /** At-least-once delivery dedup in the stream itself:
    * dropDuplicatesWithinWatermark keeps state only for the watermark
    * horizon, so redelivered events (Kafka consumer restarts, §2.9's
    * offset caveat) are dropped without unbounded state. Downstream
    * latest-state views are already duplicate-idempotent (DedupProps);
    * this bounds the LOG's growth too. */
  def dedupedStream(raw: DataFrame, watermarkMinutes: Int = 10): DataFrame =
    raw
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", s"$watermarkMinutes minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts_ltz")

  /** Watermarked tumbling-window aggregation — the standard streaming
    * time-series op (the reference computes its buckets at query time
    * over storage, SURVEY §2.9; this is the in-stream variant for
    * pipelines that want the aggregate maintained incrementally). Append
    * mode emits a window only once its watermark passes — state is
    * bounded by (windows in flight × groups), not history. */
  def windowedCounts(raw: DataFrame, windowMinutes: Int = 5,
                     watermarkMinutes: Int = 10): DataFrame =
    raw
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts_ltz"), s"$windowMinutes minutes"), col("event_type"))
      // integer cents, the file-wide money discipline: a raw double sum
      // depends on partial-aggregation order, so the same input replayed
      // across a restart could differ in the last ulp
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("total_cents"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("total_cents"))

  /** Streaming gap-sessionization via the native `session_window`
    * aggregation — the in-stream counterpart of the oracled batch
    * sessionization (`CdcPipes.eventsSessionization`): per-user
    * sessions close after `gapMinutes` of inactivity and are emitted
    * exactly once when the watermark passes their end (Append mode).
    *
    * Boundary semantics: `session_window` merges two events when their
    * gap is STRICTLY less than the gap duration (window ends are
    * exclusive), while the batch operator keeps an exactly-equal gap in
    * the same session (`diff > gap` starts a new one). The two agree on
    * every dataset with no boundary-exact inter-event gap — measure-zero
    * for µs timestamps; StreamingSpec asserts the fixture has none
    * before comparing replay to batch.
    *
    * Scale: state is one (user, open-session) entry, evicted as the
    * watermark passes — bounded by concurrently-active users in the
    * gap horizon, not history. Session value sums integer cents
    * ([[graft.functions.ChFunctions.exactSum]]), so emitted rows are
    * bit-identical to the batch aggregate regardless of merge order. */
  def sessionizedStream(raw: DataFrame, gapMinutes: Int = 30,
                        watermarkMinutes: Int = 60): DataFrame =
    raw
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", s"$watermarkMinutes minutes")
      .groupBy(col("user_id"),
        session_window(col("ts_ltz"), s"$gapMinutes minutes"))
      // aggregate the ORIGINAL ntz ts, not ts_ltz: an ltz→ntz cast-back
      // would re-extract the wall clock through the session timezone and
      // diverge from the batch operator for clocks inside a DST gap on
      // any non-UTC deployment (the watermark column alone needs LTZ)
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.ChFunctions.exactSum(col("value"), 2).as("session_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("session_value"))

  case class LatestState(event_id: Long, ts: java.time.LocalDateTime,
                         event_type: String, value: Double)
  case class LatestRow(user_id: Long, event_id: Long,
                       ts: java.time.LocalDateTime,
                       event_type: String, value: Double)

  /** In-stream latest-per-key via flatMapGroupsWithState — the stateful
    * alternative to dedup-on-read. Emits the new latest row for a key
    * whenever it changes (Update mode). Late/out-of-order events are
    * handled by version-max comparison, same guarantee as the views. */
  def latestStateful(spark: SparkSession, raw: DataFrame): Dataset[LatestRow] = {
    import spark.implicits._
    raw.select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[LatestRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestState, LatestRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[LatestRow], state: GroupState[LatestState]) =>
          def moreRecent(ts: java.time.LocalDateTime, id: Long,
                         ts2: java.time.LocalDateTime, id2: Long): Boolean = {
            val c = ts.compareTo(ts2); c > 0 || (c == 0 && id > id2)
          }
          val newest = rows.reduceLeft((x, y) =>
            if (moreRecent(y.ts, y.event_id, x.ts, x.event_id)) y else x)
          val cur = state.getOption
          val newer = cur.forall(c =>
            moreRecent(newest.ts, newest.event_id, c.ts, c.event_id))
          if (newer) {
            state.update(LatestState(newest.event_id, newest.ts,
              newest.event_type, newest.value))
            Iterator(LatestRow(key, newest.event_id, newest.ts,
              newest.event_type, newest.value))
          } else Iterator.empty
      }
  }
}
