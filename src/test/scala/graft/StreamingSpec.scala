package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.CdcStream
import graft.Tables

/** E2E CDC replay (SURVEY §5 test plan #4): events streamed in chunks
  * through the MV pipeline; the FINAL view over the materialized log
  * must equal batch dedup of everything ingested; the copy job's
  * snapshot must agree; the stateful stream must agree. Mirrors the
  * reference's compare_source_to_dest oracle (demo_users.py:167-204)
  * with its ≤15 s propagation budget. */
class StreamingSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graftstream").toString

  test("file-replay MV pipeline: FINAL view equals batch dedup; within budget") {
    val src = tmp(); val logDir = tmp() + "/log"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf) // 10k rows at sf0.001? (smallest)
    // replay in 3 chunks, running the AvailableNow stream after each —
    // incremental ingestion with checkpointed offsets
    val chunks = Seq(
      events.filter(col("event_id") % 3 === 0),
      events.filter(col("event_id") % 3 === 1),
      events.filter(col("event_id") % 3 === 2))
    // generate vs propagate timed separately, reported like the
    // reference's freshness probe (demo_users.py:239-262), so rounds
    // can track CDC freshness the way the bench tracks query time
    var genSec = 0.0; var propSec = 0.0
    val t0 = System.nanoTime()
    chunks.zipWithIndex.foreach { case (c, i) =>
      val g0 = System.nanoTime()
      c.write.parquet(s"$src/chunk$i")
      genSec += (System.nanoTime() - g0) / 1e9
      val p0 = System.nanoTime()
      val q = CdcStream.startMv(spark, s"$src/chunk*", logDir, ck)
      q.awaitTermination()
      propSec += (System.nanoTime() - p0) / 1e9
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    info(f"FRESHNESS mv_replay generate=$genSec%.2fs propagate=$propSec%.2fs total=$elapsed%.2fs (SLO 15s)")
    val streamed = CdcStream.finalView(spark, logDir)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().toSeq
    val batch = operators.Dedup.latestByKey(
        CdcStream.materializedView(events), Seq("user_id"),
        struct(col("ts"), col("event_id")),
        Seq("event_id", "ts", "event_type", "value", "prop_k"))
      .select("user_id", "event_id").orderBy("user_id")
      .collect().toSeq
    assert(streamed == batch)
    assert(elapsed < 15.0, s"propagation budget exceeded: $elapsed s")
  }

  test("copy job: two generations; snapshot equals FINAL view") {
    val logDir = tmp() + "/log"; val snapDir = tmp() + "/snap"
    val events = Tables.events(spark, sf)
    val mv = CdcStream.materializedView(events)
    // generation 1 over the first half of time
    val mid = expr("TIMESTAMP_NTZ '2024-07-01 00:00:00'")
    val g0 = System.nanoTime()
    mv.filter(col("ts") <= mid).write.parquet(logDir)
    val g1 = System.nanoTime()
    CdcStream.runCopyJob(spark, logDir, snapDir)
    val g2 = System.nanoTime()
    // more events arrive, generation 2
    mv.filter(col("ts") > mid).write.mode("append").parquet(logDir)
    val g3 = System.nanoTime()
    CdcStream.runCopyJob(spark, logDir, snapDir)
    val g4 = System.nanoTime()
    info(f"FRESHNESS copy_job generate=${((g1 - g0) + (g3 - g2)) / 1e9}%.2fs " +
      f"propagate=${((g2 - g1) + (g4 - g3)) / 1e9}%.2fs total=${(g4 - g0) / 1e9}%.2fs (SLO 15s)")
    val snap = CdcStream.readSnapshot(spark, snapDir)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    val fin = CdcStream.finalView(spark, logDir)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    assert(snap == fin)
  }

  test("copy job: late event tying the watermark ts still supersedes (regression)") {
    import spark.implicits._
    val logDir = tmp() + "/log"; val snapDir = tmp() + "/snap"
    val t = java.time.LocalDateTime.parse("2024-05-01T10:00:00")
    def row(eventId: Long, ts: java.time.LocalDateTime) =
      (eventId, 1L, ts, "click", 1.0, 1)
    Seq(row(1, t)).toDF("event_id", "user_id", "ts", "event_type", "value", "prop_k")
      .write.parquet(logDir)
    CdcStream.runCopyJob(spark, logDir, snapDir)
    // a late event arrives with the SAME ts as the snapshot's max but a
    // higher event_id tie-break — version order says it wins
    Seq(row(2, t)).toDF("event_id", "user_id", "ts", "event_type", "value", "prop_k")
      .write.mode("append").parquet(logDir)
    CdcStream.runCopyJob(spark, logDir, snapDir)
    val snap = CdcStream.readSnapshot(spark, snapDir)
      .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(snap.toSeq == Seq((1L, 2L)), s"late tie-break event lost: ${snap.toSeq}")
  }

  test("copy job over an empty batch table does not NPE (regression)") {
    val logDir = tmp() + "/log"; val batchDir = tmp() + "/users_batch"
    val d = tmp()
    val gen = graft.fixtures.CdcFixtures.generate(seed = 7, userOps = 30, airportTicks = 1)
    graft.fixtures.CdcFixtures.writeAll(spark, gen, d)
    // first copy over an EMPTY raw prefix → writes an empty batch table
    val emptyPrefix = tmp()
    graft.pipes.UsersPipes.usersRaw(spark, d).limit(0)
      .write.parquet(s"$emptyPrefix/users_raw")
    graft.pipes.UsersPipes.usersBatchCopy(spark, emptyPrefix, batchDir)
    // second copy over the real log must read the null watermark as 0
    graft.pipes.UsersPipes.usersBatchCopy(spark, d, batchDir)
    val api = graft.pipes.UsersPipes.usersApiBatch(spark, d, batchDir)
    val rmt = graft.pipes.UsersPipes.usersApiRmt(spark, d)
      .filter(org.apache.spark.sql.functions.col("deleted") === 0)
    assert(api.select("id").collect().toSeq == rmt.select("id").collect().toSeq)
  }

  test("quarantine side-sink splits malformed rows from the ingest path") {
    import spark.implicits._
    val src = tmp(); val logDir = tmp() + "/log"
    val qDir = tmp() + "/quarantine"; val ck = tmp() + "/ck"
    val good = Seq(
      (1L, java.time.LocalDateTime.parse("2024-05-01T00:00:01"), 10L, "click", 1.0, """{"k": 3}"""),
      (2L, java.time.LocalDateTime.parse("2024-05-01T00:00:02"), 11L, "view", 2.0, """{"k": 4}"""))
    val bad = Seq(
      (3L, java.time.LocalDateTime.parse("2024-05-01T00:00:03"), 12L, "click", 3.0, "not-json"),
      (4L, java.time.LocalDateTime.parse("2024-05-01T00:00:04"), 13L, "view", 4.0, """{"k": 5}"""))
    (good ++ bad)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("user_id", when(col("event_id") === 4, lit(null)).otherwise(col("user_id")))
      .write.parquet(s"$src/data")
    val q = CdcStream.startMvWithQuarantine(spark, s"$src/*", logDir, qDir, ck)
    q.awaitTermination()
    val ingested = spark.read.parquet(logDir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    val quarantined = spark.read.parquet(qDir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ingested == Set(1L, 2L))
    assert(quarantined == Set(3L, 4L))
  }

  test("quarantine recovery: corrupt -> quarantine -> fix -> reprocess " +
      "== the never-corrupted run; idempotent") {
    import spark.implicits._
    def rows(fixedProps: Boolean) = Seq(
      (1L, java.time.LocalDateTime.parse("2024-05-01T00:00:01"), 10L, "click", 1.0, """{"k": 3}"""),
      (2L, java.time.LocalDateTime.parse("2024-05-01T00:00:02"), 11L, "view", 2.0, """{"k": 4}"""),
      (3L, java.time.LocalDateTime.parse("2024-05-01T00:00:03"), 12L, "click", 3.0,
        if (fixedProps) """{"k": 0}""" else "not-json"),
      (4L, java.time.LocalDateTime.parse("2024-05-01T00:00:04"), 13L, "view", 4.0, """{"k": 5}"""))
    def src(fixedProps: Boolean) = {
      val d = tmp()
      rows(fixedProps)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        // event 4's user_id is null — unrecoverable by the props fix
        .withColumn("user_id", when(col("event_id") === 4, lit(null)).otherwise(col("user_id")))
        .write.parquet(s"$d/data")
      d
    }
    // corrupted ingest: 3 (bad props) and 4 (null key) quarantine
    val logDir = tmp() + "/log"; val qDir = tmp() + "/quarantine"
    CdcStream.startMvWithQuarantine(spark, src(fixedProps = false) + "/*",
      logDir, qDir, tmp() + "/ck").awaitTermination()
    // the schema fix repairs the props column; the null key it cannot
    val fix = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("props",
        when(get_json_object(col("props"), "$.k").isNull, """{"k": 0}""")
          .otherwise(col("props")))
    val (rec, still) = CdcStream.reprocessQuarantine(spark, qDir, logDir)(fix)
    assert(rec == 1L && still == 1L, s"recovered=$rec still=$still")
    // never-corrupted reference run: same rows with props already fixed,
    // event 4 (unrecoverable) excluded at the source
    val refLog = tmp() + "/reflog"
    CdcStream.startMvWithQuarantine(spark, src(fixedProps = true) + "/*",
      refLog, tmp() + "/refq", tmp() + "/refck").awaitTermination()
    def state(dir: String) = CdcStream.finalView(spark, dir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(state(logDir) == state(refLog))
    // still-quarantined rows carry the reprocess marker and ONLY event 4
    val q2 = spark.read.parquet(qDir)
      .select("event_id", "__quarantined_batch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q2 == Seq((4L, -1L)), q2.toString)
    // idempotence: the same fix again recovers nothing, changes nothing
    val (rec2, still2) = CdcStream.reprocessQuarantine(spark, qDir, logDir)(fix)
    assert(rec2 == 0L && still2 == 1L)
    assert(state(logDir) == state(refLog))
  }

  test("quarantine recovery: a crashed attempt's leftover work dir is " +
      "restored and the retry completes normally") {
    import spark.implicits._
    val srcDir = tmp()
    Seq(
      (1L, java.time.LocalDateTime.parse("2024-05-01T00:00:01"), 10L, "click", 1.0, """{"k": 3}"""),
      (3L, java.time.LocalDateTime.parse("2024-05-01T00:00:03"), 12L, "click", 3.0, "not-json"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$srcDir/data")
    val logDir = tmp() + "/log"; val qDir = tmp() + "/quarantine"
    CdcStream.startMvWithQuarantine(spark, s"$srcDir/*", logDir, qDir,
      tmp() + "/ck").awaitTermination()
    // simulate the worst crash point: the previous attempt renamed the
    // quarantine dir to its work dir and died before processing a row
    java.nio.file.Files.move(new java.io.File(qDir).toPath,
      new java.io.File(qDir + ".reprocess_work").toPath)
    val fix = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("props",
        when(get_json_object(col("props"), "$.k").isNull, """{"k": 0}""")
          .otherwise(col("props")))
    val (rec, still) = CdcStream.reprocessQuarantine(spark, qDir, logDir)(fix)
    assert(rec == 1L && still == 0L, s"recovered=$rec still=$still")
    assert(!new java.io.File(qDir + ".reprocess_work").exists(),
      "work dir must be consumed by the retry")
    // recovered row visible in the final view; quarantine empty but readable
    val ids = CdcStream.finalView(spark, logDir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    assert(spark.read.parquet(qDir).count() == 0)
  }

  test("JSONPath projection from a real parsed datasource ingests CDC messages") {
    import spark.implicits._
    val ds = graft.sources.KitParser.parseDatasource("users_raw",
      new String(java.nio.file.Files.readAllBytes(new java.io.File(
        "/root/reference/kits/users/pg/datasources/users_raw.datasource").toPath), "UTF-8"))
    // flattened Debezium after-image, PG dialect: unix-µs ints, __deleted
    val msg =
      """{"id": 7, "name": "n7", "email": "e7@x.com", "address": "a", "phone_number": "p",
        | "email_verified": 1, "onboarded": 0, "deleted": 0, "lang": "EN",
        | "created_at": 1714521600000000, "updated_at": 1714521660000000,
        | "__deleted": "false"}""".stripMargin.replace("\n", "")
    val raw = Seq((msg, java.time.LocalDateTime.parse("2024-05-01T00:01:05")))
      .toDF("__raw_value", "__kafka_timestamp")
    val row = CdcStream.jsonPathProjection(raw, ds).first()
    assert(row.getAs[Short]("id") == 7)
    assert(row.getAs[String]("name") == "n7")
    assert(row.getAs[Long]("updated_at") == 1714521660000000L)
    assert(row.getAs[String]("__deleted") == "false")
    assert(row.getAs[java.time.LocalDateTime]("__timestamp").toString == "2024-05-01T00:01:05")
    // malformed message → nulls (quarantine-routable), not a crash
    val bad = Seq(("{oops", java.time.LocalDateTime.parse("2024-05-01T00:01:06")))
      .toDF("__raw_value", "__kafka_timestamp")
    val badRow = CdcStream.jsonPathProjection(bad, ds).first()
    assert(badRow.isNullAt(badRow.fieldIndex("id")))
  }

  test("partitioned streaming sink lays out yyyymm directories; FINAL view unchanged") {
    val src = tmp(); val logDir = tmp() + "/log"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    events.write.parquet(s"$src/all")
    val q = CdcStream.startMv(spark, s"$src/*", logDir, ck, partitioned = true)
    q.awaitTermination()
    val dirs = new java.io.File(logDir).listFiles()
      .filter(_.getName.startsWith("yyyymm=")).map(_.getName).sorted
    val expectedMonths = events
      .select(graft.functions.ChFunctions.toYYYYMM(col("ts"))).distinct().count()
    assert(dirs.length == expectedMonths,
      s"one directory per month: got ${dirs.toSeq}, want $expectedMonths")
    val streamed = CdcStream.finalView(spark, logDir)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    val batch = operators.Dedup.latestByKey(
        CdcStream.materializedView(events), Seq("user_id"),
        struct(col("ts"), col("event_id")),
        Seq("event_id", "ts", "event_type", "value", "prop_k"))
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    assert(streamed == batch)
  }

  test("in-stream dedup drops redelivered events within the watermark") {
    import spark.implicits._
    val src = tmp(); val ck = tmp() + "/ck"
    val rows = Seq(
      (1L, java.time.LocalDateTime.parse("2024-05-01T00:00:01"), 10L, "click", 1.0, """{"k": 1}"""),
      (2L, java.time.LocalDateTime.parse("2024-05-01T00:01:00"), 11L, "view", 2.0, """{"k": 2}"""))
    // the same batch written twice = at-least-once redelivery
    (rows ++ rows).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$src/data")
    val q = CdcStream.dedupedStream(CdcStream.readEvents(spark, s"$src/*"))
      .writeStream.format("memory").queryName("dedup_mem")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT event_id FROM dedup_mem")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"duplicates survived: $got")
  }

  test("watermarked windowed aggregation: closed windows equal batch buckets") {
    val src = tmp(); val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    events.write.parquet(s"$src/all")
    val q = CdcStream.windowedCounts(CdcStream.readEvents(spark, s"$src/*"))
      .writeStream.format("memory").queryName("win_mem")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
        "SELECT window_start, event_type, n FROM win_mem")
      .collect().map(r => ((r.get(0).toString, r.getString(1)), r.getLong(2))).toMap
    // batch truth: 5-minute buckets over the same data; append mode only
    // emits windows older than the final watermark (max ts - 10 min)
    val batch = events
      .groupBy(expr("cast(date_trunc('minute', ts) - " +
        "make_interval(0,0,0,0,0, minute(ts) % 5, 0) as timestamp_ntz)").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.get(0).toString, r.getString(1)), r.getLong(2))).toMap
    assert(streamed.nonEmpty)
    // every emitted window must match the batch bucket exactly
    streamed.foreach { case (k, n) => assert(batch(k) == n, s"window $k") }
  }

  test("streaming session_window: closed sessions equal the batch sessionization") {
    val src = tmp(); val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    events.write.parquet(s"$src/all")
    // a far-future sentinel event pushes the global watermark past every
    // real session's end, so Append mode emits ALL of them
    val maxTs = events.agg(max(col("ts"))).first()
      .getAs[java.time.LocalDateTime](0)
    events.limit(1).select(
        lit(-1L).as("event_id"),
        lit(maxTs.plusHours(10)).cast("timestamp_ntz").as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$src/sentinel")
    // fixture precondition for the boundary-semantics difference noted
    // in sessionizedStream's scaladoc: no inter-event gap is EXACTLY
    // the 30-minute session boundary
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts").cast("timestamp"))
    val boundary = events
      .withColumn("d", us - lag(us, 1).over(w))
      .filter(col("d") === 1800L * 1000000L).count()
    assert(boundary == 0, "fixture has a boundary-exact gap; pick another gap")
    val q = CdcStream.sessionizedStream(CdcStream.readEvents(spark, s"$src/*"))
      .writeStream.format("memory").queryName("sess_mem")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, session_value " +
          "FROM sess_mem WHERE user_id >= 0")
      .collect()
      .map(r => ((r.getLong(0), r.get(1).toString),
        (r.get(2).toString, r.getLong(3), r.getDouble(4)))).toMap
    val batch = graft.pipes.CdcPipes.eventsSessionization(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.get(2).toString),
        (r.get(3).toString, r.getLong(4), r.getDouble(5)))).toMap
    assert(streamed.nonEmpty && streamed.size == batch.size,
      s"${streamed.size} streamed vs ${batch.size} batch sessions")
    batch.foreach { case (k, v) => assert(streamed(k) == v, s"session $k") }
  }

  test("bounded state: latestStateful state rows grow with KEYS, not events") {
    // the 100 TB claim for the stateful paths is that state is O(keys)
    // — replay E >> K events over K keys and read the engine's own
    // state-store accounting (StateOperatorProgress) to prove it
    def run(nKeys: Int, perKey: Int): Long = {
      val src = tmp(); val ck = tmp() + "/ck"
      spark.range(nKeys.toLong * perKey).select(
          col("id").as("event_id"),
          expr("cast(timestamp_micros(1704067200000000 + id * 1000000) as timestamp_ntz)").as("ts"),
          (col("id") % nKeys).as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"),
          lit(null).cast("string").as("props"))
        .write.parquet(s"$src/all")
      val name = s"latest_state_${nKeys}_$perKey"
      val q = CdcStream.latestStateful(spark, CdcStream.readEvents(spark, s"$src/*"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val p = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(p.nonEmpty, "no state operator progress recorded")
      p.last.stateOperators.head.numRowsTotal
    }
    assert(run(40, 250) == 40L, "state rows must equal key count (10k events, 40 keys)")
    assert(run(80, 500) == 80L, "2x keys → 2x state rows; 4x events must not show")
  }

  test("bounded state: candidate-pairs MV state rows equal LSH buckets, not docs x bands") {
    val src = tmp(); val pairsDir = tmp() + "/pairs"; val ck = tmp() + "/ck"
    val docs = Tables.documents(spark, sf)
    docs.write.parquet(s"$src/all")
    val q = CdcStream.startCandidatePairsMv(spark, s"$src/*", pairsDir, ck)
    q.awaitTermination()
    val p = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(p.nonEmpty)
    val stateRows = p.last.stateOperators.head.numRowsTotal
    val buckets = operators.TextDedup.minhashBands(spark, sf)
      .select("band", "band_hash").distinct().count()
    assert(stateRows == buckets,
      s"state rows $stateRows != distinct buckets $buckets — state must be one row per bucket")
    // and strictly below the (doc, band) row count the stream processed
    val docBandRows = operators.TextDedup.minhashBands(spark, sf).count()
    assert(stateRows < docBandRows,
      s"bucket state $stateRows not below processed rows $docBandRows")
  }

  test("bounded state: dropDuplicatesWithinWatermark evicts past the horizon") {
    val src = tmp(); val ck = tmp() + "/ck"
    // six 10-minute files, 1000 events each, replayed one file per
    // micro-batch: with a 10-minute watermark the state store must keep
    // roughly the horizon's events and EVICT the rest — never all 6000
    val perFile = 1000
    for (i <- 0 until 6)
      spark.range(perFile).select(
          (col("id") + i * 100000L).as("event_id"),
          expr(s"cast(timestamp_micros(1704067200000000L + ${i}L * 600000000L + id * (600000000L div $perFile)) as timestamp_ntz)").as("ts"),
          col("id").as("user_id"),
          lit("click").as("event_type"),
          lit(1.0).as("value"),
          lit(null).cast("string").as("props"))
        .write.parquet(s"$src/f$i")
    val raw = spark.readStream.schema(CdcStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$src/*")
    val q = CdcStream.dedupedStream(raw)
      .writeStream.format("memory").queryName("dedup_horizon")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(prog.length >= 4, s"wanted one batch per file, got ${prog.length}")
    val finalRows = prog.last.stateOperators.head.numRowsTotal
    val removed = prog.map(_.stateOperators.head.numRowsRemoved).sum
    assert(removed > 0, "watermark never evicted dedup state")
    assert(finalRows <= 3L * perFile,
      s"state $finalRows exceeds the watermark horizon bound (${3L * perFile}) — " +
        "dedup state must be horizon-bounded, not history-sized")
    assert(spark.sql("SELECT count(*) FROM dedup_horizon").first().getLong(0) == 6L * perFile,
      "no duplicates in input: every event must pass through exactly once")
  }

  test("stateful latest-per-key stream agrees with dedup view") {
    val src = tmp(); val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    events.write.parquet(s"$src/all")
    val raw = CdcStream.readEvents(spark, s"$src/*")
    val q = CdcStream.latestStateful(spark, raw)
      .writeStream.format("memory").queryName("latest_mem")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update mode may emit several generations per key; last wins
    val got = spark.sql(
      """SELECT user_id, max_by(event_id, struct(ts, event_id)) AS event_id
        |FROM latest_mem GROUP BY user_id""".stripMargin)
      .orderBy("user_id").collect().toSeq
    val want = pipes.CdcPipes.usersLatestRmt(spark, sf)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    assert(got == want)
  }

  test("streaming candidate pairs: exactly-once per bucket, equals batch LSH candidates") {
    val src = tmp(); val pairsDir = tmp() + "/pairs"; val ck = tmp() + "/ck"
    val docs = Tables.documents(spark, sf)
    val chunks = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    var afterChunk1 = 0L
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.write.parquet(s"$src/chunk$i")
      val q = CdcStream.startCandidatePairsMv(spark, s"$src/chunk*", pairsDir, ck)
      q.awaitTermination()
      if (i == 0) afterChunk1 = spark.read.parquet(pairsDir).count()
    }
    val emitted = spark.read.parquet(pairsDir)
      .select("band", "doc_a", "doc_b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // exactly-once per (band, pair): the second increment must emit only
    // NEW collisions, never re-emit chunk-1 pairs
    assert(emitted.distinct.size == emitted.size,
      "a (band, pair) was emitted twice across increments")
    assert(emitted.size > afterChunk1, "second increment emitted nothing new")
    // accumulated candidates equal the batch LSH candidate join —
    // valid because no bucket exceeds the stream's maxBucket cap here
    // (the documented equality precondition), asserted first:
    val bands = operators.TextDedup.minhashBands(spark, sf)
    val maxBucket = bands.groupBy("band", "band_hash")
      .count().agg(max("count")).first().getLong(0)
    assert(maxBucket <= 64, s"test corpus violates the cap precondition: $maxBucket")
    val batch = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted.map(p => (p._2, p._3)).toSet == batch)
  }

  test("summing MV: partial-sum log collapses to the batch aggregate after any replay") {
    val src = tmp(); val sumsDir = tmp() + "/sums"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    // three modulo chunks: every micro-batch contributes partials to
    // overlapping (hour, type) groups — the merge-on-read must add them
    Seq(0, 1, 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).write.parquet(s"$src/chunk$i")
      val q = CdcStream.startSummingMv(spark, s"$src/chunk*", sumsDir, ck)
      q.awaitTermination()
    }
    val merged = CdcStream.summingView(spark, sumsDir)
      .orderBy("hour", "event_type").collect().map(_.toString).toSeq
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg((sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long")) / 100.0)
          .as("total_value"),
        count(lit(1)).as("n"))
      .orderBy("hour", "event_type").collect().map(_.toString).toSeq
    assert(merged == batch)
    // the log holds MORE rows than groups (partials), the view exactly one per group
    assert(spark.read.parquet(sumsDir).count() > merged.size)
  }

  test("feature MV: day partials serve the batch day-grain features after any replay") {
    val src = tmp(); val pDir = tmp() + "/partials"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    Seq(0, 1, 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).write.parquet(s"$src/chunk$i")
      CdcStream.startUserDayFeaturesMv(spark, s"$src/chunk*", pDir, ck)
        .awaitTermination()
    }
    val served = CdcStream.userDayFeaturesView(spark, pDir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    // batch recompute of the SAME day-grain contract from the raw log
    val withDay = events.withColumn("day",
      date_trunc("day", col("ts")).cast("timestamp_ntz"))
    val anchor = withDay.agg(max(col("day")).as("__d"))
    def inWin(days: Int) = col("day") > col("__d") - expr(s"INTERVAL $days DAYS")
    val batch = withDay.crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        sum(when(inWin(1), 1L).otherwise(0L)).as("n_1d"),
        sum(when(inWin(7), 1L).otherwise(0L)).as("n_7d"),
        sum(when(inWin(28), 1L).otherwise(0L)).as("n_28d"),
        (sum(when(inWin(1), floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5)
          .cast("long")).otherwise(0L)) / 100.0).as("value_1d"),
        (sum(when(inWin(7), floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5)
          .cast("long")).otherwise(0L)) / 100.0).as("value_7d"),
        (sum(when(inWin(28), floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5)
          .cast("long")).otherwise(0L)) / 100.0).as("value_28d"),
        countDistinct(when(inWin(28), col("event_type"))).as("n_types_28d"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("__last"))
      .select(col("user_id"), col("n_1d"), col("n_7d"), col("n_28d"),
        col("value_1d"), col("value_7d"), col("value_28d"), col("n_types_28d"),
        col("__last.ts").as("last_ts"), col("__last.event_type").as("last_type"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(served == batch)
    // the log is partial-sized, the view one row per user
    assert(spark.read.parquet(pDir).count() >= served.size)
    // no new data → restart must not move the served features
    CdcStream.startUserDayFeaturesMv(spark, s"$src/chunk*", pDir, ck)
      .awaitTermination()
    val again = CdcStream.userDayFeaturesView(spark, pDir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(again == served)
  }

  test("CMS MV: merged cells equal the batch sketch; restart is a no-op") {
    val src = tmp(); val cellsDir = tmp() + "/cells"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    // modulo chunks: each micro-batch contributes cells to overlapping
    // (hour, lane, bucket) groups — merge-on-read must ADD them
    Seq(0, 1, 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).write.parquet(s"$src/chunk$i")
      CdcStream.startCmsMv(spark, s"$src/chunk*", cellsDir, ck).awaitTermination()
    }
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("hour", "r", "bucket").collect().map(_.toString).toSeq
    val streamed = snap(CdcStream.cmsView(spark, cellsDir))
    val batch = snap(operators.Sketches.cmsCounters(
      events.select(
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("user_id")),
      col("user_id").cast("string"), Seq("hour")))
    assert(streamed == batch,
      s"streamed ${streamed.size} cells vs batch ${batch.size}")
    // restart against the same checkpoint: no new data → no new batch,
    // and a re-executed batch id would overwrite its own directory —
    // either way the view must not move (CMS cells are NOT
    // duplicate-idempotent, so this is the discipline under test)
    CdcStream.startCmsMv(spark, s"$src/chunk*", cellsDir, ck).awaitTermination()
    assert(snap(CdcStream.cmsView(spark, cellsDir)) == streamed,
      "restart moved the counters")
  }

  test("Bloom MV: OR-merged words equal the batch filter; redelivery-idempotent") {
    val src = tmp(); val wordsDir = tmp() + "/words"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    Seq(0, 1, 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).write.parquet(s"$src/chunk$i")
      CdcStream.startBloomMv(spark, s"$src/chunk*", wordsDir, ck).awaitTermination()
    }
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("word_idx").collect().map(_.toString).toSeq
    val streamed = snap(CdcStream.bloomView(spark, wordsDir))
    val batch = snap(operators.Sketches.bloomWords(
      events.select(col("user_id").cast("string").as("key")), col("key")))
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    // no false negatives: every user in the log probes maybe=1
    val misses = operators.Sketches.bloomProbe(
        events.select(col("user_id").cast("string").as("key")).distinct(),
        col("key"), CdcStream.bloomView(spark, wordsDir))
      .filter(col("maybe") === 0).count()
    assert(misses == 0, "bloom filter missed a member it was built from")
    // at-least-once: re-deliver the ENTIRE stream (fresh checkpoint) —
    // bits are OR-idempotent, so plain append leaves the view unchanged
    CdcStream.startBloomMv(spark, s"$src/chunk*", wordsDir, tmp() + "/ck2")
      .awaitTermination()
    assert(snap(CdcStream.bloomView(spark, wordsDir)) == streamed,
      "full redelivery must not move the filter")
  }

  test("streaming as-of enrichment equals the batch as-of join under ordered replay") {
    val src = tmp(); val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    // two chunks split by TIME (the CDC topic's ordering contract);
    // within-batch order is arbitrary and resorted by the operator
    val mid = expr("TIMESTAMP_NTZ '2024-07-01 00:00:00'")
    val outDir = tmp() + "/asof"
    Seq(events.filter(col("ts") <= mid), events.filter(col("ts") > mid))
      .zipWithIndex.foreach { case (c, i) =>
        c.write.parquet(s"$src/chunk$i")
        val q = CdcStream.streamingAsOf(spark,
            CdcStream.readEvents(spark, s"$src/chunk*"))
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode(OutputMode.Append)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    val streamed = spark.read.parquet(outDir)
      .select("event_id", "click_event_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val batch = operators.AsOfJoin.eventsAsOfJoin(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("stream-stream interval join equals the batch range join across a restart") {
    val src = tmp(); val ck = tmp() + "/ck"; val outDir = tmp() + "/joined"
    val events = Tables.events(spark, sf)
    // time-ordered chunks: pairs whose click lands in chunk 0 and error
    // in chunk 1 must still join — that's the buffered state surviving
    // the checkpointed restart
    val mid = expr("TIMESTAMP_NTZ '2024-07-01 00:00:00'")
    Seq(events.filter(col("ts") <= mid), events.filter(col("ts") > mid))
      .zipWithIndex.foreach { case (c, i) =>
        c.write.parquet(s"$src/chunk$i")
        val q = CdcStream.streamClickErrorJoin(spark,
            CdcStream.readEvents(spark, s"$src/chunk*"),
            CdcStream.readEvents(spark, s"$src/chunk*"))
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ck)
          .outputMode(OutputMode.Append)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    val streamed = spark.read.parquet(outDir)
      .select("error_event_id", "click_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed.distinct.size == streamed.size, "a pair was emitted twice")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"),
        col("user_id").as("u"), col("ts").as("click_ts"))
    val batch = events.filter(col("event_type") === "error")
      .join(clicks, col("u") === col("user_id") &&
        col("click_ts") <= col("ts") &&
        col("click_ts") >= col("ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("event_id"), col("click_event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "test data has no click→error pairs in the window")
    assert(streamed.toSet == batch)
  }

  test("streaming IVF assignment MV agrees with the batch index histogram") {
    val src = tmp(); val outDir = tmp() + "/assign"; val ck = tmp() + "/ck"
    val emb = Tables.embeddings(spark, sf)
    val anchors = emb.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1).toSeq
    Seq(emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
      .zipWithIndex.foreach { case (c, i) =>
        c.write.parquet(s"$src/chunk$i")
        CdcStream.startIvfAssignMv(spark, s"$src/chunk*", outDir, ck, anchors)
          .awaitTermination()
      }
    // list_id is now a PARTITION column (the searchable layout shape,
    // same as writeIvfLayout) — directory-inferred as int, cast back
    val streamed = spark.read.parquet(outDir)
      .select(col("vec_id"), col("list_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(new java.io.File(outDir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("list_id=")),
      "streamed index must land partitioned by list_id")
    assert(streamed.length == emb.count(), "every vector assigned exactly once")
    assert(streamed.map(_._1).distinct.length == streamed.length)
    // per-VECTOR agreement with a driver recompute of the assignment
    // canon (histogram equality alone could mask a compensating
    // tie-break rotation between lists)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    streamed.foreach { case (vid, lid) =>
      val want = anchors.map { case (aid, av) =>
        (-math.floor(dotD(vecs(vid), av) * 1e6 + 0.5) / 1e6, aid)
      }.min._2
      assert(lid == want, s"vec $vid assigned to $lid, canon says $want")
    }
    // and the aggregate view matches the oracled batch histogram
    val histStreamed = streamed.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val histBatch = operators.VectorOps.ivfAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(histStreamed == histBatch)
  }

  test("schema drift at ingest: extra columns ignored, missing columns null, MV keeps running") {
    val src = tmp(); val outDir = tmp() + "/drift"; val ck = tmp() + "/ck"
    val docs = Tables.documents(spark, sf).limit(20)
    // chunk0: canonical shape. chunk1: a NEW upstream column appears
    // (producer upgraded first) AND n_chars is gone (producer bug) —
    // the declared-schema read must ignore the former and null the
    // latter instead of failing the query; the reference's posture is
    // that malformed input is data (quarantine), never an outage.
    docs.write.parquet(s"$src/chunk0")
    docs.withColumn("v2_extra", lit("surprise")).drop("n_chars")
      .write.parquet(s"$src/chunk1")
    CdcStream.startScrubMv(spark, s"$src/chunk*", outDir, ck).awaitTermination()
    val out = spark.read.parquet(outDir).select("doc_id").collect()
    assert(out.length == 40, "both chunks must land despite the drift")
    // and the dedup MV (which projects from the declared schema only)
    // produces identical band rows for the drifted replay of a doc
    val bands = tmp() + "/bands"; val ck2 = tmp() + "/ck2"
    CdcStream.startMinhashMv(spark, s"$src/chunk*", bands, ck2).awaitTermination()
    val perChunk = spark.read.parquet(bands)
      .groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
    assert(perChunk.forall(_ % 2 == 0),
      "every doc's band rows must appear once per replayed chunk, drifted or not")
  }

  test("streaming PII scrub MV equals the batch scrub over a two-chunk replay") {
    val src = tmp(); val outDir = tmp() + "/scrubbed"; val ck = tmp() + "/ck"
    val docs = Tables.documents(spark, sf)
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (c, i) =>
        c.write.parquet(s"$src/chunk$i")
        CdcStream.startScrubMv(spark, s"$src/chunk*", outDir, ck).awaitTermination()
      }
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "text", "n_pii_digits").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val batch = docs
      .select(col("doc_id"), operators.Privacy.scrub(col("text")).as("t"),
        operators.Privacy.digitCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("streaming minhash MV: incremental bands log equals the batch band table") {
    val src = tmp(); val bandsDir = tmp() + "/bands"; val ck = tmp() + "/ck"
    val docs = Tables.documents(spark, sf)
    // replay the corpus in two chunks — the dedup index grows
    // incrementally with checkpointed offsets, no recompute of chunk 1
    val chunks = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.write.parquet(s"$src/chunk$i")
      val q = CdcStream.startMinhashMv(spark, s"$src/chunk*", bandsDir, ck)
      q.awaitTermination()
    }
    val streamed = spark.read.parquet(bandsDir)
      .select("doc_id", "band", "band_hash")
      .collect().map(_.toString).sorted.toSeq
    val batch = operators.TextDedup.minhashBands(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }
  test("streaming dedup MV: at-least-once redelivery yields each event exactly once") {
    val src = tmp(); val out = tmp() + "/dedup"; val ck = tmp() + "/ck"
    val ev = Tables.events(spark, sf)
    val cut = expr("TIMESTAMP_NTZ '2024-01-15 00:00:00'")
    val tail = expr("TIMESTAMP_NTZ '2024-01-13 00:00:00'")
    // time-ordered replay, like a real CDC log: chunk 1 = first half;
    // chunk 2 re-delivers chunk 1's recent tail (at-least-once retry,
    // inside the 2-day lateness horizon so its state is still live)
    // plus the rest of the stream. The duplicates must vanish at
    // ingest, with state bounded by the horizon.
    val first = ev.filter(col("ts") < cut)
    val redelivered = first.filter(col("ts") >= tail)
    val rest = ev.filter(col("ts") >= cut)
    first.write.parquet(s"$src/chunk0")
    var q = CdcStream.startDedupMv(spark, s"$src/chunk*", out, ck, 2880)
    q.awaitTermination()
    redelivered.unionByName(rest).write.parquet(s"$src/chunk1")
    q = CdcStream.startDedupMv(spark, s"$src/chunk*", out, ck, 2880)
    q.awaitTermination()
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"got ${got.size} events, want ${want.size}")
  }
  test("observed MV: per-batch ingest metrics match the batch truth") {
    val src = tmp(); val log = tmp() + "/log"; val ck = tmp() + "/ck"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(s"$src/chunk0")
    val q = CdcStream.startObservedMv(spark, s"$src/chunk*", log, ck)
    q.awaitTermination()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest_stats")))
    assert(metrics.nonEmpty, "no observed metrics emitted")
    val rowsSeen = metrics.map(_.getAs[Long]("rows_seen")).sum
    val cents = metrics.map(_.getAs[Long]("value_cents")).sum
    assert(rowsSeen == ev.count())
    val wantCents = ev.agg(
      sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long")))
      .first().getLong(0)
    assert(cents == wantCents)
    assert(metrics.map(_.getAs[Long]("rows_invalid")).sum == 0L)
  }

  test("streaming KMV sketch MV: merged partials equal the batch sketch; replay-idempotent") {
    val src = tmp(); val pd = tmp() + "/kmv"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    val chunks = Seq(
      events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1))
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.write.parquet(s"$src/chunk$i")
      CdcStream.startKmvMv(spark, s"$src/chunk*", pd, ck).awaitTermination()
    }
    val streamed = CdcStream.kmvView(spark, pd)
      .collect().map(_.toString).toSeq
    // batch truth: the same per-hour k-min rule over all events at once
    val kept = events.select(
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("time_interval"),
        graft.functions.OracleHash.low64(col("user_id").cast("string")).as("h"))
      .distinct()
    val batch = pipes.CdcPipes.kmvMergeEstimate(kept)
      .collect().map(_.toString).toSeq
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    // at-least-once: re-deliver the ENTIRE stream (fresh checkpoint) —
    // KMV partials are duplicate-idempotent, so the view is unchanged
    CdcStream.startKmvMv(spark, s"$src/chunk*", pd, tmp() + "/ck2").awaitTermination()
    val replayed = CdcStream.kmvView(spark, pd)
      .collect().map(_.toString).toSeq
    assert(replayed == streamed, "full redelivery must not move the estimates")
  }

  test("streaming quantile-sketch MV: merged partials equal the batch sketch; replay-idempotent") {
    val src = tmp(); val pd = tmp() + "/q"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    val chunks = Seq(
      events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1))
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.write.parquet(s"$src/chunk$i")
      CdcStream.startQuantileMv(spark, s"$src/chunk*", pd, ck).awaitTermination()
    }
    val streamed = CdcStream.quantileView(spark, pd)
      .orderBy("event_type").collect().map(_.toString).toSeq
    // batch truth: the same bottom-k sample rule over all events at once
    val batch = operators.Sketches.quantileMerge(
        operators.Sketches.quantilePartial(
          events.select(col("event_type"), col("event_id"), col("value")), 64), 64)
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    // at-least-once: re-deliver the ENTIRE stream (fresh checkpoint) —
    // sample partials are duplicate-idempotent, so the view is unchanged
    CdcStream.startQuantileMv(spark, s"$src/chunk*", pd, tmp() + "/ck2").awaitTermination()
    val replayed = CdcStream.quantileView(spark, pd)
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(replayed == streamed, "full redelivery must not move the estimates")
  }

  test("Kafka ingest wiring runs against a live broker (KAFKA_BROKERS gate)") {
    // The reference's ingestion is Kafka-first (users_raw.datasource:20-27)
    // but this sandbox has no broker (and no spark-sql-kafka connector
    // jar): the wiring is exercised the day KAFKA_BROKERS points at one
    // (the deployment must also ship the connector on the classpath) and
    // skips cleanly here. COVERAGE.md documents the gate.
    val brokers = sys.env.get("KAFKA_BROKERS")
    assume(brokers.isDefined, "KAFKA_BROKERS not set - no broker in this environment")
    val dsText = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/kits/users/pg/datasources/users_raw.datasource")), "UTF-8")
    val ds = sources.KitParser.parseDatasource("users_raw", dsText)
    val stream = streaming.CdcStream.readKafkaDatasource(spark, brokers.get, ds)
    val q = stream.writeStream.format("memory").queryName("kafka_smoke")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      assert(q.isActive, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()
  }

  test("profile MV: merged partials equal the batch profile; restart is a no-op") {
    val src = tmp(); val partials = tmp() + "/prof"; val ck = tmp() + "/ck"
    val events = Tables.events(spark, sf)
    // modulo chunks: every batch overlaps every column's extrema groups,
    // so merge-on-read must ADD counts and re-extremize min/max
    Seq(0, 1, 2).foreach { i =>
      events.filter(col("event_id") % 3 === i).write.parquet(s"$src/chunk$i")
      CdcStream.startProfileMv(spark, s"$src/chunk*", partials, ck).awaitTermination()
    }
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("column_name").collect().map(_.toString).toSeq
    val streamed = snap(CdcStream.profileView(spark, partials))
    val batch = snap(operators.Profile.mergeProfilePartials(
      operators.Profile.eventsProfilePartial(events)))
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // null accounting and row totals are sane against the raw table
    val rows = CdcStream.profileView(spark, partials).collect()
    val n = events.count()
    assert(rows.forall(_.getAs[Long]("n_rows") == n))
    assert(rows.forall(r => r.getAs[Long]("n_nulls") >= 0 && r.getAs[Long]("n_nulls") <= n))
    // restart on the same checkpoint: counts are NOT duplicate-idempotent,
    // so the overwrite-per-batch-id discipline is what this pins
    CdcStream.startProfileMv(spark, s"$src/chunk*", partials, ck).awaitTermination()
    assert(snap(CdcStream.profileView(spark, partials)) == streamed,
      "restart moved the profile")
  }

  test("streaming dedup screening MV: per-batch verdicts against the staged " +
      "layout equal the batch recompute over the union") {
    val src = tmp(); val layout = tmp() + "/layout"
    val outDir = tmp() + "/verdicts"; val ck = tmp() + "/ck"
    operators.VectorOps.writeNearDupLayout(spark, sf, layout)
    // synthetic arrivals: perturbed copies of corpus vectors (should
    // tag near_dup against the layout) interleaved with fresh randoms
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat; v.map(_ / n)
    }
    def rand(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      unit(Array.fill(64)(r.nextGaussian().toFloat))
    }
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(3L, 17L, 40L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def near(base: Array[Float], seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      unit(base.map(x => x + 0.05f * r.nextGaussian().toFloat))
    }
    import spark.implicits._
    val chunks = Seq(
      Seq((10000L, near(corpus(3L), 1L), 0), (10001L, rand(11L), 0)),
      Seq((10002L, near(corpus(17L), 2L), 0), (10003L, rand(12L), 0)),
      Seq((10004L, near(corpus(40L), 3L), 0), (10005L, rand(13L), 0)))
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$src/chunk$i")
      CdcStream.startVectorScreenMv(spark, s"$src/chunk*", layout, outDir, ck)
        .awaitTermination()
    }
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("vec_id", "verdict", "matched_vec", "cosine")
        .collect().map(_.toString).sorted.toSeq
    val streamed = snap(spark.read.parquet(outDir).distinct())
    val batch = snap(operators.VectorOps.screenAgainstLayout(spark,
      chunks.flatten.toDF("vec_id", "embedding", "label"), layout))
    assert(streamed == batch, s"streamed verdicts diverge:\n$streamed\n$batch")
    // the engineered arrivals actually exercised both verdicts
    val verdicts = spark.read.parquet(outDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict")).toMap
    assert(verdicts(10000L) == "near_dup" && verdicts(10002L) == "near_dup" &&
      verdicts(10004L) == "near_dup", verdicts.toString)
    assert(verdicts.values.exists(_ == "novel"), verdicts.toString)
  }

  test("streaming DOC screening MV: per-batch verdicts against the staged " +
      "artifacts equal the batch recompute over the union") {
    val src = tmp(); val art = tmp() + "/art"
    val outDir = tmp() + "/verdicts"; val ck = tmp() + "/ck"
    operators.TextDedup.writeDedupArtifacts(spark, sf, art)
    // synthetic arrivals: slightly-edited copies of corpus docs (tag
    // near_dup against the staged index) interleaved with fresh text
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(3L, 17L, 40L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def edited(t: String): String = {
      val w = t.split(" "); (w.dropRight(2) :+ "zz1" :+ "zz2").mkString(" ")
    }
    def fresh(tag: Int): String =
      (0 until 30).map(j => s"novel${tag}_$j").mkString(" ")
    import spark.implicits._
    val chunks = Seq(
      Seq((20000L, edited(corpus(3L))), (20001L, fresh(1))),
      Seq((20002L, edited(corpus(17L))), (20003L, fresh(2))),
      Seq((20004L, edited(corpus(40L))), (20005L, fresh(3))))
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$src/chunk$i")
      CdcStream.startDocScreenMv(spark, s"$src/chunk*", art, outDir, ck)
        .awaitTermination()
    }
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("doc_id", "verdict", "matched_doc", "jaccard")
        .collect().map(_.toString).sorted.toSeq
    val streamed = snap(spark.read.parquet(outDir).distinct())
    val union = chunks.flatten
      .map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = snap(operators.TextDedup
      .screenDocsAgainstArtifacts(spark, union, art))
    assert(streamed == batch, s"streamed verdicts diverge:\n$streamed\n$batch")
    // the engineered arrivals exercised both verdicts with the right
    // attribution (each edited doc matches ITS source doc)
    val byId = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), Option(r.getAs[java.lang.Long]("matched_doc")))).toMap
    assert(byId(20000L) == ("near_dup", Some(3L)), byId.toString)
    assert(byId(20002L) == ("near_dup", Some(17L)), byId.toString)
    assert(byId(20004L) == ("near_dup", Some(40L)), byId.toString)
    assert(Seq(20001L, 20003L, 20005L).forall(byId(_)._1 == "novel"), byId.toString)
  }
}
