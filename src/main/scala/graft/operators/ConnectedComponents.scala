package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the clustering
  * core shared by text near-dup ([[TextDedup.dupClusters]]) and
  * embedding near-dup ([[VectorOps.dupClusters]]) dedup: a duplicate
  * GROUP is the transitive closure of pairwise matches, and the
  * canonical representative is the component's minimum id.
  *
  * Algorithm: iterative min-label propagation — each round every
  * vertex takes the min of its own and its neighbors' labels; a
  * fixpoint is a complete component labeling. Rounds = graph diameter;
  * dup clusters are near-cliques out of candidate generation, so 2-3
  * rounds in practice. A component wider than `maxRounds` (a
  * pathological chain) THROWS rather than silently returning a partial
  * clustering.
  *
  * Scale design: the edge list is the near-dup PAIR set — orders of
  * magnitude smaller than the corpus — and each round is one
  * co-partitioned join + map-side-combined min() on it. The edge list
  * is materialized once via localCheckpoint: unlike a pinned `.cache()`
  * (banned in registered queries), checkpoint blocks are freed with the
  * DataFrame, and without it every round would re-run the whole
  * candidate pipeline. The driver decides only WHEN to stop (an isEmpty
  * probe per round, the standard control loop of every iterative-graph
  * system); no row data crosses to the driver.
  */
object ConnectedComponents {

  /** Label the components of the graph whose edges are `pairs`' first
    * two columns. Returns (id, cluster_id, cluster_size), unordered —
    * callers pin their presentation sort. */
  def clusters(spark: SparkSession, pairs: DataFrame,
               maxRounds: Int = 64): DataFrame = {
    val es = pairs.toDF("a", "b").localCheckpoint(true)
    // size the iteration to the GRAPH, not the corpus: pairs are
    // materialized (the count is free), so pick the round parallelism
    // from the edge count — a tiny graph iterates in one partition
    // instead of paying shuffle.partitions × scheduling per round, a
    // huge one still spreads. ~50k edges per task balances task memory
    // against scheduling latency at any scale.
    val nParts = math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions,
      (es.count() / 50000L).toInt + 1))
    val edges = es.union(es.select(col("b"), col("a")))
      .toDF("src", "dst").repartition(nParts, col("src"))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var done = false
    var rounds = 0
    while (!done && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.toDF("src", "src_label"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_min"))
      // prev rides along so convergence is a filter on the checkpointed
      // frame itself — no extra join (and no recompute) per round
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("label").as("prev"))
        .localCheckpoint(true)
      done = next.filter(col("label") < col("prev")).isEmpty
      labels = next.select("id", "label")
      rounds += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds — a " +
          "component wider than the cap exists; raise maxRounds (silently " +
          "returning a partial clustering would split a true duplicate cluster)")
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id"), col("label").as("cluster_id"), col("cluster_size"))
  }
}
