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
}
