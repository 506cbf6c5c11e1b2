package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.pipes.CdcPipes

/** Semantics of the range-join family. The DuckDB oracle pins exact
  * values; these pin the structural guarantees — window disjointness,
  * surge containment, and (the load-bearing one) that the binned
  * interval-join decomposition equals the naive non-equi join it
  * replaces at scale. */
class RangeJoinSpec extends SparkSpec {

  test("surge windows are non-empty, well-ordered, and disjoint per type") {
    val w = RangeJoin.surgeWindows(spark, sf)
      .orderBy("surge_type", "window_start").collect()
    assert(w.nonEmpty)
    for (r <- w) {
      assert(r.getAs[Long]("surge_events") > 0)
      assert(r.getAs[java.time.LocalDateTime]("window_end")
        .isAfter(r.getAs[java.time.LocalDateTime]("window_start")))
    }
    w.groupBy(_.getAs[String]("surge_type")).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b.getAs[java.time.LocalDateTime]("window_start")
            .isBefore(a.getAs[java.time.LocalDateTime]("window_end")),
            "adjacent surge windows of one type overlap — island merge broke")
        case _ =>
      }
    }
  }

  test("interval join: the surge type's own events inside its window equal surge_events") {
    // a window is exactly its island's surge hours, so the count of
    // surge_type events within [start, end) must equal the binned total
    val byWindow = RangeJoin.intervalJoin(spark, sf)
      .filter(col("event_type") === col("surge_type"))
      .select("surge_type", "window_start", "n_events")
    val windows = RangeJoin.surgeWindows(spark, sf)
      .select("surge_type", "window_start", "surge_events")
    val joined = windows.join(byWindow, Seq("surge_type", "window_start"), "left").collect()
    assert(joined.nonEmpty)
    for (r <- joined)
      assert(r.getAs[Long]("n_events") == r.getAs[Long]("surge_events"),
        s"window ${r.get(0)}@${r.get(1)} count drifted from its island total")
  }

  test("binned session concurrency equals the naive non-equi overlap join") {
    val sess = CdcPipes.eventsSessionization(spark, sf)
      .select("user_id", "session_id", "session_start", "session_end")
    val a = sess.columns.foldLeft(sess)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = sess.columns.foldLeft(sess)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val naive = a.join(b,
        col("b_user_id") =!= col("a_user_id") &&
          col("b_session_start") <= col("a_session_end") &&
          col("a_session_start") <= col("b_session_end"), "left")
      .groupBy(col("a_user_id").as("user_id"), col("a_session_id").as("session_id"))
      .agg(count(col("b_user_id")).as("expected"))
    val got = RangeJoin.sessionConcurrency(spark, sf)
    val diff = got.join(naive, Seq("user_id", "session_id"))
      .filter(col("concurrent_sessions") =!= col("expected"))
    assert(diff.count() == 0, "binned decomposition drifted from the naive join")
    assert(got.count() == naive.count())
  }

  test("session concurrency plan: equi-join on the hour bucket, no cartesian") {
    val p = SparkEntry.queries("events_session_concurrency")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "pair generation must bin, not cross")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "both sides are large at scale — the join must stay an equi-join on the bucket")
  }

  test("interval join plan: windows broadcast, the fact scan never shuffles pre-agg") {
    val p = SparkEntry.queries("events_interval_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      "bounded interval table should broadcast under the range predicate")
  }
}
