package graft

import graft.operators.{ConnectedComponents, TextDedup}

/** Invariants of the integer-unit PageRank kernel — the oracle pins
  * exact values; these pin the conservation/symmetry meaning. */
class PagerankSpec extends SparkSpec {

  test("pagerank: mass conservation, base floor, isolated-pair fixpoint, determinism") {
    val pairs = TextDedup.nearDupPairs(spark, sf).select("doc_a", "doc_b")
    val rows = ConnectedComponents.pagerank(spark, pairs).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getAs[Long]("rank_units")).sum
    // truncating division only ever loses mass, and only a little
    assert(total <= n * 1000000L)
    assert(total >= n * 1000000L * 99 / 100, s"lost >1% of rank mass: $total of ${n * 1000000L}")
    for (r <- rows) assert(r.getAs[Long]("rank_units") >= 150000L, "below the damping base")
    // an isolated 2-clique is a fixpoint: each endpoint passes its whole
    // rank to the other, so both keep exactly the initial mass
    val deg = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("degree")).toMap
    val nbrs = pairs.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var isolatedPairs = 0
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      if (deg(id) == 1L && deg(nbrs(id).head) == 1L) {
        isolatedPairs += 1
        assert(r.getAs[Long]("rank_units") == 1000000L, s"2-clique node $id drifted")
      }
    }
    assert(isolatedPairs > 0, "fixture lost its isolated near-dup pairs — test is vacuous")
    // recomputation is bit-identical (no partitioning/order dependence)
    val again = ConnectedComponents.pagerank(spark, pairs).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_units"))).toSeq ==
      again.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_units"))).toSeq)
  }

  test("pagerankConverged: residual stop on a high-diameter graph; agrees with the fixed-round form") {
    import spark.implicits._
    // a 40-node path — diameter 39, the shape where "3 rounds is enough"
    // is FALSE: fixed-3-rounds ranks the interior flat, the converged
    // form must keep iterating until the residual dies
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val conv = ConnectedComponents.pagerankConverged(spark, path, tolUnits = 1000L).collect()
    assert(conv.length == 40)
    // endpoints (degree 1) rank strictly below their interior neighbors
    // at the converged fixpoint of an undirected path
    val byId = conv.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_units")).toMap
    assert(byId(0L) < byId(1L) && byId(39L) < byId(38L))
    // converged ≠ the 3-round snapshot on this graph (the probe did real work) …
    val fixed3 = ConnectedComponents.pagerank(spark, path, iters = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_units")).toMap
    assert(byId != fixed3, "high-diameter path converged in <=3 rounds — test is vacuous")
    // … but stopping-at-k equals fixed-k exactly (same integer arithmetic):
    // a huge tolerance stops after round 1, which must equal iters=1
    val conv1 = ConnectedComponents.pagerankConverged(spark, path, tolUnits = 10000000L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_units")).toMap
    val fixed1 = ConnectedComponents.pagerank(spark, path, iters = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_units")).toMap
    assert(conv1 == fixed1)
    // non-convergence throws loudly instead of returning a partial ranking
    intercept[IllegalStateException] {
      ConnectedComponents.pagerankConverged(spark, path, tolUnits = 0L, maxIters = 2).collect()
    }
  }
}
