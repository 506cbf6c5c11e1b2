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
    // both directions from ONE pass over the pair pipeline (explode,
    // not a self-union: a union of two projections of the same subtree
    // runs the whole candidate pipeline twice), so a single checkpoint
    // materializes the edge list. Round parallelism: the repartition
    // keys by src at the session's shuffle width and AQE coalesces the
    // tiny-graph case down, so a small graph iterates in few tasks
    // while a huge one still spreads.
    val edges = pairs.toDF("a", "b")
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .repartition(col("src"))
      .localCheckpoint(true)
    def propagate(labels: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(labels.toDF("src", "src_label"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_min"))
      labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var done = false
    var rounds = 0
    while (!done && rounds < maxRounds) {
      // TWO propagation rounds per materialized step, with the mid-step
      // label riding along: convergence = the SECOND round changed
      // nothing, i.e. it was a fixpoint round. Dup components are
      // near-cliques (diameter 1-2), so the common case — round 1
      // labels everything, round 2 proves it — finishes in ONE
      // checkpoint job + one probe over its in-memory blocks, where the
      // probe-per-round form paid four. The mid frame is not
      // checkpointed: its aggregation appears twice in the step's plan
      // and exchange reuse dedupes the shuffle.
      //
      // Two accelerations for high-diameter graphs (the embedding
      // near-dup graph has diameter-16 chains → 8 steps here) were
      // measured on sf0.1 and REJECTED, keep them off: (a) pointer
      // jumping (label(label(x)) self-join per step) buys about as
      // much per op as a relaxation on chains — steps 8 → 5 but each
      // step heavier, net wash; (b) chaining 6+ relaxations per
      // checkpoint cuts steps 8 → 3 but the deeper nested join+agg
      // plan costs Catalyst more than the saved jobs (net +25%), and
      // at 16-deep the optimizer stalls outright. The 2-op step with
      // exchange reuse is the measured optimum.
      val mid = propagate(labels).toDF("id", "mid")
      val nbrMin2 = edges
        .join(mid.toDF("src", "src_label"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_min"))
      val next = mid.join(nbrMin2, Seq("id"), "left")
        .select(col("id"),
          least(col("mid"), coalesce(col("nbr_min"), col("mid"))).as("label"),
          col("mid").as("prev"))
        .localCheckpoint(true)
      done = next.filter(col("label") < col("prev")).isEmpty
      labels = next.select("id", "label")
      rounds += 2
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

  /** PageRank over an undirected pair graph — the second iterative
    * graph kernel next to [[clusters]]: where CC answers "which docs
    * are the same", PageRank answers "which doc is the HUB of its
    * duplication neighborhood" (a centrality-based canonical pick, and
    * the standard authority signal for boilerplate/template detection).
    *
    * Determinism contract: all arithmetic in integer micro-units —
    * init 1,000,000 per node, per-edge contribution `rank div degree`
    * (truncating long division), damping 0.85 applied as
    * `150000 + (85 · Σcontrib) div 100` — so every step is associative
    * long math that any partial-agg order and any engine reproduce
    * exactly; the oracle unrolls the same `iters` rounds in SQL.
    *
    * Scale: nodes/edges are the near-dup PAIR graph (≪ corpus); each
    * round is one co-partitioned join + map-side-combined sum on the
    * checkpoint-pinned edge list — the standard distributed PageRank
    * round. Fixed `iters` (no convergence probe): centrality ranking
    * stabilizes in a few rounds on near-clique dup neighborhoods; for
    * general graphs use [[pagerankConverged]]. The edge/degree pins are
    * LAZY checkpoints (the repo's convention, like `concurrencyFrom`):
    * merely constructing the query — for plan inspection, or
    * register-then-discard — costs nothing; the upstream pair pipeline
    * runs once, on the first action. */
  def pagerank(spark: SparkSession, pairs: DataFrame,
               iters: Int = 3): DataFrame = {
    val (edges, deg) = edgesAndDegrees(pairs, eager = false)
    var ranks = deg.select(col("src").as("doc_id"), lit(1000000L).as("rank_units"))
    for (_ <- 1 to iters) ranks = prRound(edges, deg, ranks)
    finishRanks(deg, ranks)
  }

  /** PageRank with a residual convergence probe — the general-graph
    * form of [[pagerank]]: iterate until the largest per-node rank move
    * is ≤ `tolUnits` micro-units (probe `max|Δ|` per round, driver sees
    * one boolean — same control-loop shape as [[clusters]]), throwing
    * past `maxIters` instead of returning a half-converged ranking. Same
    * integer micro-unit arithmetic, so a run that happens to stop at
    * round `k` equals `pagerank(iters = k)` exactly. Eager checkpoints
    * here are CORRECT, not a deviation: the driver probe forces
    * materialization every round anyway, and each round's frame must be
    * pinned or round k would recompute rounds 1..k-1. */
  def pagerankConverged(spark: SparkSession, pairs: DataFrame,
                        tolUnits: Long = 1000L, maxIters: Int = 64): DataFrame = {
    val (edges, deg) = edgesAndDegrees(pairs, eager = true)
    var ranks = deg.select(col("src").as("doc_id"), lit(1000000L).as("rank_units"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIters) {
      val next = prRound(edges, deg, ranks).localCheckpoint(true)
      converged = next.toDF("doc_id", "next_units")
        .join(ranks, "doc_id")
        .filter(abs(col("next_units") - col("rank_units")) > tolUnits)
        .isEmpty
      ranks = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"pagerank residual still above $tolUnits µ-units after $maxIters rounds — " +
          "raise maxIters or tolUnits (returning a half-converged ranking " +
          "would silently misorder the centrality pick)")
    finishRanks(deg, ranks)
  }

  /** Shared kernel pieces: symmetric edge list + degrees (pinned lazily
    * or eagerly per the caller's control-flow needs), one damped
    * integer-unit propagation round, and the presentation join. */
  private def edgesAndDegrees(pairs: DataFrame, eager: Boolean): (DataFrame, DataFrame) = {
    val edges = pairs.toDF("a", "b")
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .repartition(col("src"))
      .localCheckpoint(eager)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager)
    (edges, deg)
  }

  private def prRound(edges: DataFrame, deg: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = edges
      .join(deg, "src")
      .join(ranks.withColumnRenamed("doc_id", "src"), "src")
      .select(col("dst").as("doc_id"), expr("rank_units div deg").as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("in_sum"))
    deg.select(col("src").as("doc_id"))
      .join(contrib, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(150000L) + expr("(85 * coalesce(in_sum, 0L)) div 100")).as("rank_units"))
  }

  private def finishRanks(deg: DataFrame, ranks: DataFrame): DataFrame =
    deg.select(col("src").as("doc_id"), col("deg"))
      .join(ranks, "doc_id")
      .select(col("doc_id"), col("deg").as("degree"), col("rank_units"),
        (col("rank_units") / 1000000.0).as("rank"))
      .orderBy(col("rank_units").desc, col("doc_id"))
}
