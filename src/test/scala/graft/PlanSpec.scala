package graft

import graft.pipes.TpchPipes

/** Physical-plan contracts (DESIGN.md): the scale-critical plan
  * properties are asserted, not assumed — a regression that silently
  * turns a broadcast join into a shuffle or stops pushdown fails here,
  * not at 100 TB. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("region_revenue: every dim joins as broadcast, no shuffle of dims") {
    val p = plan("region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("scalar_functions: filter pushed to the parquet scan, columns pruned") {
    val p = plan("scalar_functions")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,100)]"))
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"),
      "projection pruning should drop unused columns from the scan")
  }

  test("q1_pricing_summary: partial aggregation before the exchange") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(1000))
    // partial + final aggregate = two HashAggregate levels
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("users_latest_rmt: dedup is one aggregation, not a sort") {
    val p = plan("users_latest_rmt")
    assert(p.contains("max_by") || p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("whole-stage codegen covers the q1 pipeline (final AQE plan)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // execute THIS plan so AQE finalizes it (count() would plan separately)
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WholeStageCodegen stages in compact plan strings
    assert(p.contains("*(1)") && p.contains("*(2)"), p.take(1500))
  }

  test("emb_knn_bruteforce: query side broadcast (no corpus shuffle for the join)") {
    val p = plan("emb_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }
}
