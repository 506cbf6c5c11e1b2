package graft

import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._
import graft.operators.Dedup

/** Pins for the ClickHouse edge semantics called out in SURVEY §7.3 —
  * each test documents the engine's decision where CH and Spark could
  * differ, so the behavior is a contract rather than an accident. */
class EdgeSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("NOT IN with NULLs: anti-join keeps null-keyed left rows (decision)") {
    // SQL `x NOT IN (subquery)` returns no rows if the subquery yields a
    // NULL; the reference's NOT IN keys (ids) are non-nullable, so the
    // engine maps it to left_anti, which KEEPS a left row whose key is
    // null (null never matches). Pinned here; KitParser schemas show id
    // columns non-nullable in every kit, so the divergence is unreachable
    // on reference data.
    val left = Seq(Some(1), Some(2), None).toDF("id")
    val right = Seq(2).toDF("id")
    val anti = left.join(right, Seq("id"), "left_anti")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSet
    assert(anti == Set(1, -1))
  }

  test("countDistinct ignores NULLs (matches CH count(DISTINCT))") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    assert(df.agg(countDistinct($"v")).first().getLong(0) == 2)
  }

  test("toFixedString: space padding decision (CH pads FixedString with \\0)") {
    // Documented divergence: CHAR(n)-style space padding instead of
    // CH's NUL padding. Nothing in the reference compares FixedString
    // bytes; lang values are always exactly 2 chars (pinned next).
    assert(Seq("EN").toDF("l").select(toFixedString($"l", 2)).first().getString(0) == "EN")
    assert(Seq("E").toDF("l").select(toFixedString($"l", 2)).first().getString(0) == "E ")
  }

  test("latest-state dedup: delete-then-reinsert keeps the reinsert (version order)") {
    // soft-delete then reinsert with higher version must surface the
    // reinsert — latest-wins is by version, not by operation kind
    val log = Seq((1L, 10L, 0), (1L, 20L, 1), (1L, 30L, 0)).toDF("id", "ver", "deleted")
    val latest = Dedup.latestByKey(log, Seq("id"), col("ver"), Seq("ver", "deleted"))
      .as[(Long, Long, Int)].collect().toSet
    assert(latest == Set((1L, 30L, 0)))
  }

  test("toStartOfMinute on second-precision boundary is idempotent") {
    val df = Seq("2024-05-01 10:30:00").toDF("s")
      .select(toStartOfMinute($"s".cast("timestamp")).as("m"))
    assert(df.select(toStartOfMinute($"m") === $"m").first().getBoolean(0))
  }

  test("sum over empty group: null (SQL) — gap-fill must coalesce (pinned)") {
    // CH sum() over zero rows returns 0 for non-nullable args; Spark/SQL
    // returns NULL. Every gap-fill in the engine coalesces explicitly
    // (error_pct_per_hour, flights_missed_pct_minute), pinned here.
    val empty = Seq.empty[Long].toDF("v")
    assert(empty.agg(sum($"v")).first().isNullAt(0))
  }
}
