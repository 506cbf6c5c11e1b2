package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout
import graft.operators.Dedup

/** MergeTree-style layout: partition pruning must reach the plan, and
  * compaction must preserve FINAL-view semantics. */
class LayoutSpec extends SparkSpec {

  test("partitioned log: yyyymm predicate prunes partitions in the plan") {
    val path = Files.createTempDirectory("graftlayout").toString + "/log"
    val events = Tables.events(spark, sf)
    Layout.writeAppendLog(events, "ts", Seq("user_id", "ts"), path)
    val pruned = Layout.readLog(spark, path).filter(col("yyyymm") === 202401)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("yyyymm"), s"no partition pruning in plan:\n$plan")
    // pruned count equals logical filter on the original data
    val want = events.filter(date_format(col("ts"), "yyyyMM") === "202401").count()
    assert(pruned.count() == want)
  }

  test("compaction preserves FINAL-view semantics and shrinks the log") {
    val path = Files.createTempDirectory("graftcompact").toString + "/log"
    val events = Tables.events(spark, sf)
    Layout.writeAppendLog(events, "ts", Seq("user_id", "ts"), path)
    def finalView(p: String) =
      Dedup.latestByKey(Layout.readLog(spark, p).drop("yyyymm"),
          Seq("user_id"), struct(col("ts"), col("event_id")),
          Seq("event_id", "ts", "event_type", "value"))
        .select("user_id", "event_id").orderBy("user_id")
    val before = finalView(path).collect().toSeq
    val rowsBefore = Layout.readLog(spark, path).count()
    Layout.compact(spark, path, Seq("user_id"),
      struct(col("ts"), col("event_id")), "ts", Seq("user_id", "ts"))
    val after = finalView(path).collect().toSeq
    val rowsAfter = Layout.readLog(spark, path).count()
    assert(after == before)
    assert(rowsAfter < rowsBefore)
    assert(rowsAfter == before.size)
  }
}
