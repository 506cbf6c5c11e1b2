package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.ChFunctions._
import graft.pipes.CdcPipes

/** Range / interval joins — the two scale shapes Spark lacks as a
  * built-in operator, each expressed with the composition that survives
  * 100 TB (reference analogue: the time-window endpoint family, e.g.
  * `kits/airport/mysql/pipes/active_flights_past_hour.pipe:5-9`, which
  * only ever needs a *scalar* window; these operators generalize to a
  * *table* of windows):
  *
  *  1. [[intervalJoin]] — a large fact stream joined to a SMALL interval
  *     table. The physical answer is a broadcast of the intervals and a
  *     single codegen'd scan of the facts (BroadcastNestedLoopJoin): no
  *     shuffle of the 100 TB side at all, cost = rows × avg matching
  *     intervals. This is the shape for "events inside incident/surge
  *     windows", maintenance windows, campaign attribution windows.
  *  2. [[sessionConcurrency]] — interval × interval overlap where BOTH
  *     sides are large (all sessions vs all sessions). The scale answer
  *     is time-axis binning: explode each interval to the hour buckets
  *     it covers, equi-join on bucket (a plain shuffled hash join that
  *     partitions on time — skew-bounded by bucket width), then filter
  *     the exact overlap predicate and de-duplicate pairs that met in
  *     more than one bucket. Cost is sum over buckets of n_b², never
  *     |S|² — the standard distributed interval-join decomposition.
  */
object RangeJoin {

  /** Surge windows: per event_type, the maximal runs of adjacent hour
    * buckets whose event count exceeds 2× that type's mean hourly count.
    * Pure integer predicate (`n · n_hours > 2 · total`) so both engines
    * agree without float means; gaps-and-islands via `hour_index − rank`.
    *
    * Bounded output: ≤ |event_type| × |hours in retention|, i.e. a few
    * thousand rows even at 100 TB of events — which is exactly what makes
    * [[intervalJoin]] broadcastable. One shuffle on (event_type, hour),
    * map-side combined; the island window repartitions only the
    * already-tiny surge frame. */
  def surgeWindows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hourly = e
      .groupBy(col("event_type"), toStartOfHour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("nh"))
    val surge = hourly.join(stats, "event_type")
      .filter(col("n") * col("nh") > col("tot") * 2)
    val isl = surge
      .withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("hour")))
      .withColumn("grp",
        // tz-free hour index on the ntz value: an ntz→ltz cast would shift
        // by the session timezone and de-consecutive the indices across DST
        expr("timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', hour)") - col("rn"))
    isl.groupBy(col("event_type").as("surge_type"), col("grp"))
      .agg(
        min(col("hour")).as("window_start"),
        (max(col("hour")) + interval(hours = lit(1))).as("window_end"),
        sum(col("n")).as("surge_events"))
      .drop("grp")
  }

  /** Events range-joined to the surge windows: for each window, the
    * per-type breakdown of ALL events inside [start, end). The interval
    * side is the bounded [[surgeWindows]] frame → explicit `broadcast`,
    * so the plan is one scan of `events` with zero fact-side shuffle
    * before the final (tiny) aggregation. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = surgeWindows(spark, dir)
    e.join(broadcast(w),
        col("ts") >= col("window_start") && col("ts") < col("window_end"))
      .groupBy(col("surge_type"), col("window_start"), col("window_end"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        exactSum(col("value"), 2).as("value_sum"))
      .orderBy("surge_type", "window_start", "event_type")
  }

  /** Per-session concurrency: for each session (from the same 30-min-gap
    * definition as `events_sessionization`), how many OTHER users'
    * sessions overlap it in time (inclusive bounds — single-event
    * sessions are instants and still overlap anything covering them).
    *
    * Binned decomposition: sessions explode to covered hour buckets
    * (bounded by session length ÷ 1 h, small under a 30-min gap rule),
    * equi-join on bucket, exact overlap filter, DISTINCT on the pair ids
    * to collapse multi-bucket meetings, then a count per left session and
    * a left join back so zero-concurrency sessions keep their row. The
    * small session frame is lazily checkpoint-pinned so the sessionization
    * window isn't recomputed for both join sides and the backfill. */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame =
    concurrencyFrom(
      CdcPipes.eventsSessionization(spark, dir)
        .select("user_id", "session_id", "session_start", "session_end"))

  /** The binned overlap-count kernel over any
    * (user_id, session_id, session_start, session_end) frame —
    * property-tested against the naive non-equi join on arbitrary
    * generated interval sets (RangeJoinProps). */
  def concurrencyFrom(sessions: DataFrame): DataFrame = {
    val sess = sessions.localCheckpoint(false)
    val binned = sess.withColumn("hour",
      explode(sequence(
        toStartOfHour(col("session_start")),
        toStartOfHour(col("session_end")),
        expr("interval 1 hour"))))
    val left = binned.select(
      col("user_id").as("u1"), col("session_id").as("s1"),
      col("session_start").as("st1"), col("session_end").as("en1"),
      col("hour"))
    val right = binned.select(
      col("user_id").as("u2"), col("session_id").as("s2"),
      col("session_start").as("st2"), col("session_end").as("en2"),
      col("hour"))
    val pairs = left.join(right, Seq("hour"))
      .filter(col("u1") =!= col("u2") &&
        col("st2") <= col("en1") && col("st1") <= col("en2"))
      .select("u1", "s1", "u2", "s2")
      .distinct()
    val counts = pairs
      .groupBy(col("u1").as("user_id"), col("s1").as("session_id"))
      .agg(count(lit(1)).as("concurrent_sessions"))
    sess.join(counts, Seq("user_id", "session_id"), "left")
      .withColumn("concurrent_sessions",
        coalesce(col("concurrent_sessions"), lit(0L)))
      .orderBy("user_id", "session_id")
  }
}
