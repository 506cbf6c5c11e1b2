package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ChFunctions._

/** Similarity search over the `embeddings` table (Array[Float], 64-dim,
  * unit-normalized — so cosine similarity = dot product).
  *
  * Two tiers:
  *  - brute-force top-k: exact, O(|Q|·|N|) dots — the baseline and the
  *    verification truth. Queries are broadcast; the corpus is scanned
  *    once; per-partition top-k via the ranking window on the (small)
  *    |Q|·k candidate space after scoring.
  *  - random-hyperplane LSH: the scale path — each vector hashed to a
  *    bucket by the sign pattern of `NumPlanes` fixed hyperplane dots;
  *    candidate neighbors share the bucket, so the join is an equi-join
  *    on bucket id instead of a cross join. Recall is probabilistic
  *    (property-tested against brute force); at 100 TB this is the
  *    difference between a hash-partitioned equi-join and an unrunnable
  *    cartesian.
  *
  * All dots computed by the native codegen'd expression
  * [[graft.functions.VectorDot]] — double accumulation, left-to-right,
  * mirrored exactly by the DuckDB oracle's list arithmetic.
  */
object VectorOps {

  /** The embedding pair graph's BUILD threshold — the one cosine the
    * staged `emb_pairs` table is materialized at. Shared by the build
    * stage ([[TextDedup.writeDedupArtifacts]] via
    * [[nearDupPairsOverLayout]]'s default), the maintenance delta
    * kernel ([[DedupMaintenance]]'s `pairsBetweenProbes` call), the
    * endpoint default, and the [[nearDupPairsAuto]] routing gate — a
    * single definition so a retune can never leave the gate serving a
    * staged table built under a different (incomplete) threshold. */
  val EmbPairBuildMinCosine = 0.4

  /** dot(a, b) with double accumulation, left-to-right — the native
    * codegen'd expression (graft.functions.VectorDot, registered as
    * `vector_dot` per session); semantically identical to the HOF chain
    * aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0d, +) but one
    * fused loop per row instead of per-element interpreted calls. */
  private def dot(a: Column, b: Column): Column =
    call_function("vector_dot", a, b)

  /** The probe-assignment score EXACTLY as [[probeAssignmentsFrom]]
    * ranks it (6dp-rounded dot) — exposed so the anchor-churn
    * displacement test in [[DedupMaintenance]] compares stored
    * rankings under the identical rounding. */
  private[operators] def probeSim(emb: Column, anchor: Column): Column =
    floorRound(dot(emb, anchor), 6)

  /** L2 norms — plumbing validation for the vector column. */
  def norms(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        floorRound(sqrt(dot(col("embedding"), col("embedding"))), 4).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** Exact brute-force cosine top-k for query vectors `vec_id < nQueries`.
    * Cosine rounded to 6dp BEFORE ranking so ordering ties break on
    * neighbor id identically in any engine. */
  def knnBruteForce(spark: SparkSession, dir: String,
                    nQueries: Int = 20, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        floorRound(dot(col("qe"), col("embedding")), 6).as("cosine"))
    topK(scored, k)
  }

  /** Hard-negative mining for contrastive embedding training: for
    * each query vector, the `k` MOST similar vectors with a DIFFERENT
    * label — the near-miss negatives a trainer pairs with positives
    * (the label column stands in for "same document / same class").
    * Same scoring contract as [[knnBruteForce]] (6dp-rounded cosine,
    * neighbor-id tie-break); the label inequality rides the join
    * condition so mismatches are dropped BEFORE the ranking window
    * ever sees them.
    *
    * Scale: identical to the brute-force baseline (queries broadcast,
    * one codegen'd scan); at corpus scale the candidate side swaps to
    * the IVF layout exactly as [[knnIvf]] does — the label filter
    * composes unchanged. */
  def hardNegatives(spark: SparkSession, dir: String,
                    nQueries: Int = 20, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("label").as("query_label"))
    val scored = emb.join(broadcast(q),
        col("vec_id") =!= col("query_id") && col("label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"),
        col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
        floorRound(dot(col("qe"), col("embedding")), 6).as("cosine"))
    topK(scored, k)
  }

  /** One ranking window evaluation: row_number IS the rank — computing
    * it via limitBy and then a second identical window would double the
    * window work on the hot scored set. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")

  // Multi-table random-hyperplane LSH: L independent tables of b planes.
  // Collision prob for a pair at angle θ is p=(1-θ/π) per plane, so a
  // neighbor is found with prob 1-(1-p^b)^L — tunable recall without a
  // cross join. b=3, L=6 targets ~0.8 recall at cosine≈0.4 (the top-1
  // regime of uniform-random corpora, LSH's worst case; clustered real
  // embeddings collide far more).
  private val PlanesPerTable = 3
  private val NumTables = 6

  /** Deterministic hyperplanes, derived from md5 so a second engine
    * can re-derive them bit-for-bit (this is what makes the LSH
    * endpoint fully DuckDB-oracle-able instead of rows-only):
    * component (t, p, i) = first 4 bytes of md5("p|t|p|i") read
    * big-endian as uint32 u, mapped to u/2^32·2−1 and rounded to
    * float. Every step is exact in double (u has ≤32 significant
    * bits, 2^32 is a power of two) and both engines round
    * double→float to nearest, so the literal arrays shipped with the
    * plan equal DuckDB's `('0x'||substring(md5(...),1,8))::UBIGINT`
    * arithmetic exactly. Computed at plan-build on the driver; shipped
    * as float literal arrays matching the embedding element type for
    * the native dot. */
  private[operators] def planeComponent(t: Int, p: Int, i: Int): Float = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"p|$t|$p|$i".getBytes("UTF-8"))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u / 4294967296.0 * 2 - 1).toFloat
  }

  private def planes(dim: Int): Array[Array[Array[Float]]] =
    Array.tabulate(NumTables, PlanesPerTable, dim)((t, p, i) =>
      planeComponent(t, p, i + 1)) // 1-based i, matching SQL list indexing

  /** (table, bucket) pairs for a vector: sign-bit pattern per table. */
  private def tableBuckets(emb: Column, dim: Int): Column = {
    val ps = planes(dim)
    array((0 until NumTables).map { t =>
      val bucket = (0 until PlanesPerTable).map { p =>
        val plane = array(ps(t)(p).toIndexedSeq.map(lit): _*)
        when(dot(emb, plane) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }: _*)
  }

  /** Multi-table LSH approximate top-k: same output shape as
    * knnBruteForce; candidates are vectors sharing any table's bucket
    * with the query — an equi-join on (table, bucket) instead of a
    * cross join. */
  def knnLsh(spark: SparkSession, dir: String,
             nQueries: Int = 20, k: Int = 5, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        explode(tableBuckets(col("embedding"), dim)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // multi-probe: the query also visits every bucket at hamming
    // distance 1 in each table (flip one plane's sign bit) — per-table
    // hit prob rises from p^b to p^b + b·p^(b-1)(1-p) at no extra cost
    // on the corpus side (only the broadcast query side fans out)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("tbl").as("qtbl"), col("bucket").as("qbucket"))
      .withColumn("probe", explode(array(
        (col("qbucket") +: (0 until PlanesPerTable).map(p =>
          col("qbucket").bitwiseXOR(lit(1 << p)))): _*)))
    val scored = emb.join(broadcast(q),
        col("tbl") === col("qtbl") && col("bucket") === col("probe"))
      .filter(col("vec_id") =!= col("query_id"))
      // a pair can collide in several tables — collapse before ranking
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"),
        floorRound(dot(col("qe"), col("embedding")), 6).as("cosine"))
      .agg(count(lit(1)).as("__collisions"))
      .drop("__collisions")
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (the vector analogue of
    * docs_near_dup_pairs): pairs with cosine >= minCosine, candidates
    * from multi-probe IVF assignment, exact-verified.
    *
    * Each vector joins its `nprobe` nearest anchor lists; candidate
    * pairs share a list, so the join is an equi-join on list_id — hash-
    * partitionable, pair fan-out bounded by Σ (nprobe·|list|)² over
    * lists instead of corpus², and at 100 TB list_id is the partition
    * key (per-list local self-join, no global shuffle of pairs). The
    * cosine reported for surviving candidates is exact (same rounding
    * as the brute-force truth). Recall is probabilistic — a pair split
    * across disjoint probe sets is missed — and property-tested against
    * [[nearDupPairsExact]]; the threshold is data-relative (uniform-
    * random corpus, so "near" is the top of the cosine distribution).
    */
  def nearDupPairs(spark: SparkSession, dir: String, minCosine: Double = EmbPairBuildMinCosine,
                   nLists: Int = 0, nprobe: Int = 3): DataFrame =
    pairsFromProbes(probeAssignments(spark, dir, nLists, nprobe), minCosine)

  /** The multi-probe assignment frame (vec_id, embedding, list_id) —
    * each vector in its `nprobe` nearest anchor lists.
    *
    * nLists = 0 (default) derives the list count from the corpus:
    * max(8, ceil(sqrt(n)/2)) — the BALANCED schedule. The two cost terms
    * pull in opposite directions: anchor assignment is n·L dots, the
    * per-list candidate self-join is ~n·(n/L) pair dots; L = sqrt(n)
    * equalizes them at n^1.5 total. The round-7 n/250 schedule held
    * occupancy constant (linear join work) but left assignment at
    * n·L = n²/250 — the sf10 gate measured the quadratic: 128 s cold
    * at 500 k vectors, 10× the sf1 figure for 10× data; the sqrt
    * schedule cuts assignment 2.8× there and flattens the asymptote.
    * (A fixed list count is the opposite scale bug, caught by the
    * round-6 sf1 sweep: occupancy ∝ n, pairs ∝ n².) The count() is
    * parquet-metadata-only. Beyond ~10 M vectors recomputing the
    * assignment per query is the wrong surface even at n^1.5 — persist
    * it once ([[writeNearDupLayout]], staged by the dedup artifact
    * build) and every consumer reads the layout instead. */
  private[operators] def probeAssignments(spark: SparkSession, dir: String,
                                          nLists: Int = 0,
                                          nprobe: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    probeAssignmentsFrom(emb, anchorsOf(emb, resolveLists(emb, nLists)), nprobe)
  }

  /** The derived list count for a corpus (the BALANCED sqrt schedule —
    * see [[probeAssignments]]); `nLists > 0` pins it. The count() is
    * parquet-metadata-only. */
  private[operators] def resolveLists(emb: DataFrame, nLists: Int): Long =
    if (nLists > 0) nLists.toLong
    else math.max(8L, math.ceil(math.sqrt(emb.count().toDouble) / 2).toLong)

  /** Anchor frame: the first `lists` corpus vectors (deterministic,
    * content-derived — the suite's anchor convention). */
  private[operators] def anchorsOf(emb: DataFrame, lists: Long): DataFrame =
    emb.filter(col("vec_id") < lists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))

  /** Multi-probe assignment of ANY vector frame against a GIVEN anchor
    * frame — the kernel shared by the full build (anchors from the
    * same corpus) and incremental maintenance (a delta frame probed
    * against the BASE layout's anchors, so base assignments stay
    * byte-identical). Top-nprobe lists per vector (6dp-rounded sim,
    * list_id tie-break: deterministic in any engine, mirrored by the
    * DuckDB oracle). */
  private[operators] def probeAssignmentsFrom(emb: DataFrame, anchors: DataFrame,
                                              nprobe: Int): DataFrame =
    limitBy(
      emb.join(broadcast(anchors))
        .select(col("vec_id"), col("embedding"), col("list_id"),
          floorRound(dot(col("embedding"), col("anchor")), 6).as("__sim")),
      nprobe, Seq(col("vec_id")), Seq(col("__sim").desc, col("list_id")))
      .select("vec_id", "embedding", "list_id")

  /** Candidate pairs sharing a probed list, exact-verified — shared by
    * the self-contained form and the persisted-layout form, so the two
    * cannot drift. */
  private def pairsFromProbes(probes: DataFrame, minCosine: Double): DataFrame = {
    val a = probes.select(col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("list_id"))
    val b = probes.select(col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("list_id"))
    a.join(b, Seq("list_id"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        floorRound(dot(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      // a pair can share several probed lists — collapse after scoring
      // (duplicates carry identical cosines, so distinct is exact)
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Persist the multi-probe near-dup layout: [[probeAssignments]]
    * stored `partitionBy(list_id)` — the write-once step that takes
    * the n·L anchor-assignment dots OUT of every near-dup consumer.
    * The self-contained [[nearDupPairs]] pays assignment + join
    * (n^1.5 balanced) on every invocation; over the layout, the
    * assignment is a parquet read and the remaining work is the
    * per-list candidate join alone — and increment screening
    * ([[screenIncrementOverLayout]]) becomes a partition-pruned probe
    * scan, the same architectural move as [[writeIvfLayout]] for k-NN
    * and the reference's precompute-at-ingest materialized views
    * (kits/users/pg/pipes/users_mv.pipe:19-20). */
  def writeNearDupLayout(spark: SparkSession, dir: String, out: String,
                         nLists: Int = 0, nprobe: Int = 3,
                         withGen: Boolean = false): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val lists = resolveLists(emb, nLists)
    val probes = probeAssignmentsFrom(emb, anchorsOf(emb, lists), nprobe)
    // `withGen` = the artifact-build form: rows carry the merge-on-read
    // generation column ([[TextDedup.liveRows]]); standalone layouts
    // (IVF search, streaming screens) stay gen-free
    (if (withGen) probes.withColumn("gen", lit(0)) else probes)
      .write.partitionBy("list_id").mode("overwrite").parquet(out)
    // the layout's GEOMETRY is part of its definition, persisted like
    // a real ANN index's (an insert never re-derives k from n — the
    // sqrt schedule would move the anchor set under every consumer on
    // each append). Incremental maintenance reads this to assign delta
    // vectors against the SAME anchors; a full rebuild re-derives.
    java.nio.file.Files.write(new java.io.File(out, "_GEOMETRY").toPath,
      s"nLists=$lists\nnprobe=$nprobe".getBytes("UTF-8"))
  }

  /** The persisted layout geometry: (nLists, nprobe), or None for a
    * pre-geometry layout (forces full rebuild on increment). */
  def readLayoutGeometry(layout: String): Option[(Long, Int)] = {
    val f = new java.io.File(layout, "_GEOMETRY").toPath
    if (!java.nio.file.Files.exists(f)) None
    else {
      val kv = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        .linesIterator.map(_.split("=", 2)).collect {
          case Array(k, v) => k -> v }.toMap
      for (l <- kv.get("nLists"); p <- kv.get("nprobe"))
        yield (l.toLong, p.toInt)
    }
  }

  /** The layout read-back: the partition column comes back
    * directory-inferred as int — cast to long so downstream joins and
    * results are type-identical to the in-memory probe frame. A layout
    * living INSIDE a staged artifact dir (sibling `_FINGERPRINT`) is
    * read through the tombstone-resolved view — retracted vectors'
    * probe rows are dead; standalone layouts read raw. When the
    * artifact has no tombstones (fresh build, post-compaction) the
    * live view IS the raw scan, so the plan — dynamic partition
    * pruning included — is unchanged. */
  private[operators] def readNearDupLayout(spark: SparkSession,
                                           layout: String): DataFrame = {
    val f = new java.io.File(layout)
    val artifactCtx = f.getName == "emb_probe_layout" &&
      f.getParentFile != null &&
      new java.io.File(f.getParentFile, "_FINGERPRINT").exists()
    val raw =
      if (artifactCtx)
        TextDedup.liveRows(spark, f.getParentFile.toString,
          "emb_probe_layout", "vec_id")
      else spark.read.parquet(layout)
    raw.select(col("vec_id"), col("embedding"),
      col("list_id").cast("long").as("list_id"))
  }

  /** [[nearDupPairs]] served from the persisted layout — result-
    * identical (asserted in DedupArtifactsSpec; same pair kernel, same
    * assignment canon), but the corpus-sized anchor assignment is a
    * parquet read and each list's self-join is co-located with its
    * partition. This is the form that holds past ~10 M vectors. */
  def nearDupPairsOverLayout(spark: SparkSession, layout: String,
                             minCosine: Double = EmbPairBuildMinCosine): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    pairsFromProbes(readNearDupLayout(spark, layout), minCosine)
  }

  /** Every near-dup pair TOUCHING the delta: delta × base (both
    * orders normalized to (lo, hi)) plus delta × delta (a < b), all
    * sharing a probed list — the incremental-maintenance pair kernel.
    * Same scoring canon as [[pairsFromProbes]] (6dp-floored exact
    * cosine, distinct over multi-list collisions), and the two id
    * sets MUST be disjoint (guarded by the caller): with base
    * assignments unchanged, base∪delta's full pair set is exactly
    * staged-base-pairs ∪ this frame. */
  private[operators] def pairsBetweenProbes(deltaProbes: DataFrame,
                                            baseProbes: DataFrame,
                                            minCosine: Double): DataFrame = {
    val d = deltaProbes.select(col("vec_id").as("vd"),
      col("embedding").as("ed"), col("list_id"))
    val b = baseProbes.select(col("vec_id").as("vb"),
      col("embedding").as("eb"), col("list_id"))
    val cross = d.join(b, Seq("list_id"))
      .select(least(col("vd"), col("vb")).as("vec_a"),
        greatest(col("vd"), col("vb")).as("vec_b"),
        floorRound(dot(col("ed"), col("eb")), 6).as("cosine"))
    val d2 = deltaProbes.select(col("vec_id").as("vd2"),
      col("embedding").as("ed2"), col("list_id"))
    val within = d.join(d2, Seq("list_id"))
      .filter(col("vd") < col("vd2"))
      .select(col("vd").as("vec_a"), col("vd2").as("vec_b"),
        floorRound(dot(col("ed"), col("ed2")), 6).as("cosine"))
    cross.unionByName(within)
      .filter(col("cosine") >= minCosine)
      .distinct()
  }

  /** Auto-routed near-dup pairs — what the REGISTERED endpoint serves:
    * when the staged dedup artifact set is CURRENT for this dir
    * ([[TextDedup.artifactsCurrent]] — fingerprint match + complete
    * stages), the pair graph is computed over the persisted probe
    * layout (assignment is a parquet read, per-list join co-located:
    * 2.4× faster cold at sf100, and strictly better wherever the
    * artifact exists); otherwise it falls back to the self-contained
    * form. Result-identical either way (DedupArtifactsSpec asserts
    * layout ≡ self-contained, and the route choice is asserted in the
    * plan). Routing requires the DEFAULT geometry (nLists = 0-derived,
    * nprobe = 3 — what the artifact build stages); a caller asking for
    * a different geometry always computes self-contained, because the
    * staged assignment was built under different probe parameters.
    * minCosine does NOT gate routing: it is a post-filter over the
    * candidate join, valid at any value over the same layout.
    *
    * GEOMETRY gate (the round-11 advisory fix): an incrementally-
    * maintained layout keeps its _GEOMETRY pinned at the base-derived
    * nLists (an index never moves its anchors under an append), while
    * the self-contained fallback re-derives ceil(sqrt(n)/2) from the
    * CURRENT corpus — after enough appends the two diverge (450→11
    * lists vs 500→12), and "result-identical either way" would quietly
    * stop holding. So the route additionally requires the persisted
    * geometry to EQUAL the schedule's current derivation (one
    * parquet-metadata count); when the corpus has outgrown the pinned
    * anchors the endpoint falls back to the self-contained form —
    * always the oracle's semantics — and the index-pinned serving
    * shape remains explicitly available as [[nearDupPairsOverLayout]]
    * (the `emb_near_dup_pairs_ivf` endpoint, which restages first). */
  /** The [[nearDupPairsAuto]] routing predicate, factored out so the
    * plan-shape tests assert against EXACTLY the gate the endpoint
    * uses (a current-but-geometry-drifted artifact must read as
    * unrouted in both places): artifact current for `dir` AND the
    * persisted layout geometry equals the schedule's derivation over
    * the current corpus at the default nprobe. */
  private[graft] def embPairsRoutable(spark: SparkSession, dir: String,
                                      art: String): Boolean =
    TextDedup.artifactsCurrent(dir, art) &&
      readLayoutGeometry(s"$art/emb_probe_layout").exists { case (l, p) =>
        p == 3 && l == resolveLists(Tables.embeddings(spark, dir), 0) }

  def nearDupPairsAuto(spark: SparkSession, dir: String, art: String,
                       minCosine: Double = EmbPairBuildMinCosine, nLists: Int = 0,
                       nprobe: Int = 3): DataFrame =
    if (nLists == 0 && nprobe == 3 && embPairsRoutable(spark, dir, art))
      // the staged emb_pairs table stores this endpoint's OUTPUT at the
      // build threshold: any minCosine >= it is a pure
      // post-filter over it — a parquet read instead of re-running the
      // per-list candidate join (165 s -> sub-second at sf100). A
      // LOWER threshold needs pairs the staged table never kept, so it
      // recomputes over the layout, where minCosine applies during the
      // join (valid at any value, same geometry).
      if (minCosine >= EmbPairBuildMinCosine)
        TextDedup.stagedEmbPairs(spark, art)
          .filter(col("cosine") >= minCosine)
          .orderBy("vec_a", "vec_b")
      else
        nearDupPairsOverLayout(spark, s"$art/emb_probe_layout", minCosine)
    else
      nearDupPairs(spark, dir, minCosine, nLists, nprobe)

  /** The index-pinned endpoint (`emb_near_dup_pairs_ivf`), currency-
    * gated (round-13 verdict #6): the staged `emb_pairs` table IS this
    * endpoint's output — the artifact build runs EXACTLY
    * [[nearDupPairsOverLayout]] over the just-staged layout and stores
    * the result — so when the artifact set is current (and the pinned
    * geometry still equals the schedule's derivation, the same
    * [[embPairsRoutable]] gate as the default endpoint), re-running
    * the per-list candidate join re-derives a table already on disk
    * (179.6 s at sf100 for a parquet read's worth of information).
    * Routed: a presentation sort over the staged read. Fallback: the
    * explicit restage-and-join shape this endpoint has always been —
    * build (or extend) the artifacts, then join over the layout. */
  def nearDupPairsIvfAuto(spark: SparkSession, dir: String,
                          art: String): DataFrame =
    if (embPairsRoutable(spark, dir, art))
      TextDedup.stagedEmbPairs(spark, art).orderBy("vec_a", "vec_b")
    else {
      TextDedup.writeDedupArtifacts(spark, dir, art)
      nearDupPairsOverLayout(spark, s"$art/emb_probe_layout")
    }

  /** [[screenIncrementOverLayout]] served ENTIRELY from the staged
    * layout — zero corpus scans (round-13 verdict #6): the layout
    * stores every vector's top-nprobe assignments WITH its embedding,
    * so the incoming probe frame is `layout WHERE vec_id % 10 = 0`
    * (exactly what assigning the increment against the same anchors
    * yields — assignment is per-vector), the existing side is the
    * complement, and the incoming id set is the probe frame's distinct
    * ids. The per-call full-corpus anchor assignment — the dominant
    * cost of the self-contained form at sf100 — disappears into the
    * stage-time build. Same byte-sized broadcast guard, sized from the
    * layout's own metadata. */
  def screenIncrementStaged(spark: SparkSession, layout: String,
                            minCosine: Double = EmbPairBuildMinCosine,
                            broadcastProbeBytes: Long = 2L << 30): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // rows carry the assignments; the geometry pin is the witness this
    // IS a staged layout (a bare parquet dir must fail loudly)
    require(readLayoutGeometry(layout).isDefined,
      s"no _GEOMETRY under $layout — stage it with writeNearDupLayout")
    val lay = readNearDupLayout(spark, layout)
    val incomingProbes = lay.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("list_id"))
    val existing = lay.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("list_id"))
    val incomingIds = lay.filter(col("vec_id") % 10 === 0)
      .select("vec_id").distinct()
    val nProbeRows = incomingProbes.count()
    val dim = lay.select(size(col("embedding")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val probeBytes = nProbeRows * (4L * dim + 48L)
    val probeSide =
      if (probeBytes <= broadcastProbeBytes) broadcast(incomingProbes)
      else incomingProbes.hint("SHUFFLE_HASH")
    verdictsFrom(incomingIds, existing, probeSide, minCosine)
  }

  /** Auto-routed increment screen (`emb_screen_increment`): staged
    * layout when current at the schedule geometry ([[embPairsRoutable]]
    * — layout rows must equal what assigning the CURRENT corpus would
    * yield), else the self-contained form over a freshly-built (or
    * extended) artifact set — the restage shape stays the explicit
    * fallback. */
  def screenIncrementLayoutAuto(spark: SparkSession, dir: String,
                                art: String,
                                minCosine: Double = EmbPairBuildMinCosine): DataFrame =
    if (embPairsRoutable(spark, dir, art))
      screenIncrementStaged(spark, s"$art/emb_probe_layout", minCosine)
    else {
      TextDedup.writeDedupArtifacts(spark, dir, art)
      screenIncrementOverLayout(spark, dir, s"$art/emb_probe_layout", minCosine)
    }

  /** Incremental screening over the persisted layout — the embedding
    * analogue of [[TextDedup.screenIncrement]] (same increment
    * convention: vec_id % 10 == 0 is the incoming batch): each
    * incoming vector probes its nprobe nearest lists, candidates are
    * EXISTING layout rows sharing a probed list, the best exact match
    * decides near_dup vs novel.
    *
    * Join strategy is SIZE-GUARDED IN BYTES, because the probe frame
    * carries full embedding arrays and its row count is
    * nprobe·|increment| — proportional to the corpus under the %10
    * convention, so a hard `broadcast()` would hit Spark's 8 GB
    * broadcast ceiling (and driver memory) at exactly the scale this
    * function exists to serve. A ROW-count guard has the same failure
    * mode one dimension later: each probe row carries the embedding,
    * so at 768 dims a 4 M-row threshold is ~12 GB — the guard must
    * scale with row WIDTH. The estimate is rows × (4·dim + fixed
    * per-row overhead), with dim read from the first embedding row
    * (one column-pruned 1-row job, the same driver-scalar convention
    * as the watermark CTEs). Below `broadcastProbeBytes` the probe
    * frame IS broadcast and the probed list_ids reach the layout scan
    * as a dynamic partition filter (asserted in DedupArtifactsSpec) —
    * a small increment touches nprobe·|increment| cells, never the
    * corpus. Past the guard, the join degrades to a SHUFFLE_HASH on
    * list_id: both sides shuffle once, nothing corpus-proportional is
    * ever collected to one node (a huge increment probes essentially
    * every cell anyway, so the lost pruning is worth ~nothing there).
    * The two paths are result-identical — asserted in
    * DedupArtifactsSpec by forcing the shuffle path at test SF. The
    * 2 GiB default keeps the driver comfortably inside Spark's 8 GB
    * broadcast ceiling at any dim: ~4 M probe rows at 64 dims,
    * ~650 k at 768. */
  def screenIncrementOverLayout(spark: SparkSession, dir: String,
                                layout: String, minCosine: Double = EmbPairBuildMinCosine,
                                nLists: Int = 0, nprobe: Int = 3,
                                broadcastProbeBytes: Long = 2L << 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val incomingProbes = probeAssignments(spark, dir, nLists, nprobe)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("list_id"))
    val existing = readNearDupLayout(spark, layout)
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("list_id"))
    // cheap column-pruned count of the increment (one long column),
    // and the embedding width from a single row — together they size
    // the probe frame in BYTES (4 bytes per float component + ~48 of
    // array header / ids / row overhead per row)
    val nIncrement = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 10 === 0).count()
    val dim = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val probeBytes = nIncrement * nprobe * (4L * dim + 48L)
    val probeSide =
      if (probeBytes <= broadcastProbeBytes) broadcast(incomingProbes)
      else incomingProbes.hint("SHUFFLE_HASH")
    verdictsFrom(
      Tables.embeddings(spark, dir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id")),
      existing, probeSide, minCosine)
  }

  /** The screening verdict kernel shared by [[screenIncrementOverLayout]]
    * and [[screenAgainstLayout]]: best exact match per probing vector
    * (6dp cosine desc, matched id asc — the canonical attribution),
    * left-joined back so unmatched vectors report `novel`. The
    * `vec_a =!= vec_b` guard keeps a RE-INGESTED vector (its vec_id
    * already in the layout, or equal to an anchor id) from matching
    * itself at cosine 1.0 and reporting `near_dup` of itself — a no-op
    * under the increment screen's %10 disjointness convention, load-
    * bearing for [[screenAgainstLayout]]'s arbitrary incoming frames. */
  private def verdictsFrom(incomingIds: DataFrame, existing: DataFrame,
                           probeSide: DataFrame, minCosine: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = existing.join(probeSide, Seq("list_id"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        floorRound(dot(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy("vec_a")
          .orderBy(col("cosine").desc, col("vec_b"))))
      .filter(col("__rn") === 1)
      .select(col("vec_a").as("vec_id"), col("vec_b").as("matched_vec"),
        col("cosine"))
    incomingIds
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("matched_vec").isNotNull, "near_dup")
          .otherwise("novel").as("verdict"),
        col("matched_vec"), col("cosine"))
      .orderBy("vec_id")
  }

  /** Screen an ARBITRARY (vec_id, embedding) frame against the staged
    * probe layout — the streaming-ingest form of
    * [[screenIncrementOverLayout]] (which owns the registered %10
    * harness convention): each incoming vector probes its nprobe
    * nearest lists under the layout's PERSISTED `_GEOMETRY` (anchors
    * are read from the layout itself — every anchor id < nLists is
    * assigned to its own list, embedding aboard), candidates are
    * layout rows sharing a probed list, best exact match decides
    * `near_dup` vs `novel`. Same byte-sized broadcast guard as the
    * increment screen: micro-batches broadcast and prune the layout
    * scan; a corpus-sized frame degrades to a SHUFFLE_HASH join
    * instead of detonating the driver. This is what
    * [[graft.streaming.CdcStream.startVectorScreenMv]] runs per
    * micro-batch — dedup verdicts tagged AT INGEST, the reference's
    * MV-at-ingest pattern (kits/users/pg/pipes/users_mv.pipe:19-20)
    * applied to the dedup artifact. */
  def screenAgainstLayout(spark: SparkSession, incoming: DataFrame,
                          layout: String, minCosine: Double = EmbPairBuildMinCosine,
                          broadcastProbeBytes: Long = 2L << 30): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (nLists, nprobe) = readLayoutGeometry(layout).getOrElse(
      throw new IllegalArgumentException(
        s"no _GEOMETRY under $layout — stage it with writeNearDupLayout"))
    val lay = readNearDupLayout(spark, layout)
    val anchors = lay.filter(col("vec_id") < nLists)
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("anchor"))
      .select(col("vec_id").as("list_id"), col("anchor"))
    val probes = probeAssignmentsFrom(
        incoming.select(col("vec_id"), col("embedding")), anchors, nprobe)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("list_id"))
    val existing = lay.select(col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("list_id"))
    val n = incoming.count()
    val dim = incoming.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    val probeSide =
      if (n * nprobe * (4L * dim + 48L) <= broadcastProbeBytes)
        broadcast(probes)
      else probes.hint("SHUFFLE_HASH")
    verdictsFrom(incoming.select("vec_id"), existing, probeSide, minCosine)
  }

  /** Semantic duplicate clusters: connected components over the
    * embedding near-dup pair graph ([[nearDupPairs]], cosine >= 0.4) —
    * the embedding analogue of [[TextDedup.dupClusters]], completing
    * the vector dedup path from pairs to the keep-the-canonical
    * decision. Same shared clustering core, same scale shape: the
    * iteration runs on the PAIR graph, not the corpus. */
  def dupClusters(spark: SparkSession, dir: String,
                  maxRounds: Int = 64): DataFrame =
    ConnectedComponents.clusters(spark,
        nearDupPairs(spark, dir).select("vec_a", "vec_b"), maxRounds)
      .toDF("vec_id", "cluster_id", "cluster_size")
      .orderBy("cluster_id", "vec_id")

  /** [[dupClusters]] served from the staged dedup artifact
    * ([[TextDedup.writeDedupArtifacts]] stages the embedding graph
    * alongside the text graph) — a sort over a parquet read. */
  def dupClustersStaged(spark: SparkSession, art: String): DataFrame =
    TextDedup.stagedEmbClusters(spark, art).orderBy("cluster_id", "vec_id")

  /** Auto-routed [[dupClusters]]: serves the STAGED embedding clusters
    * when the artifact set is current — the CC iteration already ran
    * at stage time over the layout-derived pair graph, so the route
    * needs the same geometry gate as [[nearDupPairsAuto]] (the staged
    * graph was built under the layout's anchors; an outgrown pinned
    * geometry would quietly diverge from the self-contained
    * re-derivation). Non-default `maxRounds` wants possibly-
    * unconverged CC semantics, not a converged cache — same gate as
    * [[TextDedup.dupClustersAuto]]. */
  def dupClustersAuto(spark: SparkSession, dir: String, art: String,
                      maxRounds: Int = 64): DataFrame =
    if (maxRounds == 64 && TextDedup.artifactsCurrent(dir, art) &&
        readLayoutGeometry(s"$art/emb_probe_layout").exists { case (l, p) =>
          p == 3 && l == resolveLists(Tables.embeddings(spark, dir), 0) })
      dupClustersStaged(spark, art)
    else dupClusters(spark, dir, maxRounds)

  /** The all-pairs truth (spec-only; NOT a registered endpoint): the
    * triangular cross join is O(n²) dots — unrunnable at scale, kept to
    * verify the IVF/LSH candidate paths at small SF. */
  def nearDupPairsExact(spark: SparkSession, dir: String,
                        minCosine: Double = EmbPairBuildMinCosine): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        floorRound(dot(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .orderBy("vec_a", "vec_b")
  }

  /** IVF search: the corpus is partitioned by nearest-anchor list (the
    * ivfAssign layout); a query scores only the vectors in its `nprobe`
    * closest lists — at scale, list_id is the partition key and this is
    * partition-pruned local search instead of a full scan. Recall rises
    * with nprobe (nprobe = nLists degenerates to brute force). */
  def knnIvf(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5,
             nLists: Int = 8, nprobe: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    // corpus side: nearest list per vector (the stored IVF layout)
    val assigned = limitBy(
      emb.join(broadcast(anchors))
        .select(col("vec_id"), col("embedding"), col("list_id"),
          dot(col("embedding"), col("anchor")).as("__sim")),
      1, Seq(col("vec_id")), Seq(col("__sim").desc, col("list_id")))
      .drop("__sim")
    // query side: top-nprobe lists per query (tiny, broadcast)
    val probes = limitBy(
      emb.filter(col("vec_id") < nQueries)
        .join(broadcast(anchors))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("list_id"), dot(col("embedding"), col("anchor")).as("__sim")),
      nprobe, Seq(col("query_id")), Seq(col("__sim").desc, col("list_id")))
      .drop("__sim")
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        floorRound(dot(col("qe"), col("embedding")), 6).as("cosine"))
    // no dedup needed: each corpus vector lives in exactly one list
    topK(scored, k)
  }

  /** Persist the IVF layout the search half assumes: the corpus stored
    * `partitionBy(list_id)` (nearest-anchor assignment, same limitBy
    * rule as [[knnIvf]]'s on-the-fly form). At 100 TB this is the
    * write-once step that turns every subsequent probe into partition
    * pruning instead of a full scan. */
  def writeIvfLayout(spark: SparkSession, dir: String, out: String,
                     nLists: Int = 8): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    limitBy(
      emb.join(broadcast(anchors))
        .select(col("vec_id"), col("label"), col("embedding"), col("list_id"),
          dot(col("embedding"), col("anchor")).as("__sim")),
      1, Seq(col("vec_id")), Seq(col("__sim").desc, col("list_id")))
      .drop("__sim")
      .write.partitionBy("list_id").mode("overwrite").parquet(out)
  }

  /** IVF search over the persisted layout — probe pruning happens in
    * the SCAN, not in an operator: the broadcast probe frame joins on
    * the partition column, so dynamic partition pruning pushes the
    * probed list_ids into the parquet scan as a runtime partition
    * filter and the nLists−nprobe unprobed partitions are never read.
    * Value-identical to [[knnIvf]] (same assignment rule, asserted in
    * IvfLayoutSpec along with the pruning subquery in the plan); the
    * difference is WHERE the pruning runs — this is the form that
    * scales, because scan bytes are nprobe/nLists of the corpus. */
  def knnIvfOverLayout(spark: SparkSession, layout: String, dir: String,
                       nQueries: Int = 20, k: Int = 5,
                       nLists: Int = 8, nprobe: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val table = spark.read.parquet(layout)
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    val probes = limitBy(
      emb.filter(col("vec_id") < nQueries)
        .join(broadcast(anchors))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("list_id"), dot(col("embedding"), col("anchor")).as("__sim")),
      nprobe, Seq(col("query_id")), Seq(col("__sim").desc, col("list_id")))
      .drop("__sim")
    val scored = table.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        floorRound(dot(col("qe"), col("embedding")), 6).as("cosine"))
    topK(scored, k)
  }

  /** Symmetric int8 quantization summary per vector: scale =
    * 127/max(|x|), q_i = floor(x·scale + 0.5) — the compression step
    * before shipping embeddings to an ANN index (4× smaller, dot
    * products in int arithmetic). Registered as the per-vector summary
    * (scale + q min/max/sum) so the oracle compares scalars; the q
    * array itself stays on the executors. Pure projection, no
    * shuffle. */
  def quantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("max_abs",
        expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
      .withColumn("scale_f", lit(127.0) / col("max_abs"))
      .withColumn("q", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * scale_f + 0.5) as bigint))"))
      .select(
        col("vec_id"),
        floorRound(col("scale_f"), 6).as("scale"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"),
        expr("aggregate(q, cast(0 as bigint), (s, x) -> s + x)").as("q_sum"))
      .orderBy("vec_id")

  /** One k-means update step for the IVF anchors: every vector joins
    * its nearest-anchor list (the ivfAssign layout, same 6dp-sim +
    * list_id tie-break canon), then the new centroid is the
    * per-dimension mean of the members. The mean runs on integer units
    * (each component floor-scaled to 1e-6 before summing as Long), so
    * the result is invariant to partition/merge order — the property
    * that lets a 1000-executor run reproduce the centroids bit-for-bit,
    * and lets DuckDB verify them.
    *
    * Scale: one broadcast of the nLists anchors, one shuffle of
    * (list_id, dim) partial sums with map-side combine — the exchange
    * carries nLists × dims rows per mapper, independent of corpus
    * size. This IS the k-means train loop body for IVF index building;
    * iterate by feeding the output back as the next anchor set. */
  def centroidUpdate(spark: SparkSession, dir: String, nLists: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    integerUnitCentroids(
        assignToLists(Tables.embeddings(spark, dir), nLists)
          .select("embedding", "list_id"))
      .orderBy("list_id", "dim")
  }

  /** The integer-unit per-dimension centroid aggregation — the exact
    * bit-for-bit arithmetic contract (1e-6-unit Long sums, floor-
    * rounded mean) shared by [[centroidUpdate]] and every [[kmeans]]
    * round, and mirrored by both DuckDB oracles; ONE definition so the
    * two endpoints cannot drift. */
  private def integerUnitCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("list_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("list_id", "dim")
      .agg(count(lit(1)).as("n_vectors"),
        floorRound(
          sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")) /
            (count(lit(1)) * 1e6), 6).as("centroid"))

  /** Semantic outlier scoring per document source — the embedding-side
    * quality gate next to the text-side LM terciles
    * ([[TextAnalysis.lmBuckets]]): each source's integer-unit centroid
    * (same arithmetic contract as [[centroidUpdate]]/[[kmeans]], so a
    * 1000-executor run reproduces it bit-for-bit), then every doc's
    * cosine to its OWN source's centroid, and the `m` least-typical
    * docs per source — the rows a curation pass reviews for
    * mislabeled/contaminated content before a dump enters the mix.
    *
    * Scale: the centroid is one (source, dim) shuffle with map-side
    * combine (|sources| × dims rows per mapper, corpus-size-
    * independent); the rebuilt centroid vectors are a |sources|-row
    * broadcast; scoring is a codegen'd per-row dot; the bottom-m cut
    * is one ranking shuffle on source. Docs without embeddings drop
    * out (inner join) — they have no semantic signal to score. */
  def sourceOutliers(spark: SparkSession, dir: String, m: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val joined = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        col("vec_id") === col("doc_id"))
      .select(col("doc_id"), col("source"), col("embedding"))
    val cvec = integerUnitCentroids(
        joined.select(col("source").as("list_id"), col("embedding")))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("cs"))
      .select(col("list_id").as("source"),
        expr("transform(cs, c -> CAST(c.centroid AS FLOAT))").as("cvec"))
    joined
      .join(broadcast(cvec), "source")
      .select(col("source"), col("doc_id"),
        floorRound(dot(col("embedding"), col("cvec")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("cvec"), col("cvec")))), 6).as("cosine"))
      .withColumn("outlier_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("cosine"), col("doc_id"))))
      .filter(col("outlier_rank") <= m)
      .select("source", "outlier_rank", "doc_id", "cosine")
      .orderBy("source", "outlier_rank")
  }

  /** Full k-means refinement for the IVF index: `iters` rounds of
    * assign-to-nearest-centroid / recompute-centroids, starting from
    * the first `nLists` corpus vectors (the [[ivfAssign]] seed).
    *
    * Assignment canon: Euclidean distance via the expansion
    * |x−c|² = |x|² − 2x·c + |c|², with the |x|² term dropped (constant
    * per row, irrelevant to ranking) — so the key is c·c − 2·x·c,
    * 6dp-floor-rounded, ties broken by list_id. Centroids are
    * per-dimension INTEGER-UNIT means (components scaled to 1e-6 units
    * and summed as longs), then floor-rounded and cast back to float
    * for the next round's dot products — every step is exact-rounded
    * IEEE arithmetic, so a 1000-executor run and the DuckDB oracle
    * reproduce the trained centroids bit-for-bit after ANY number of
    * rounds. A list that loses all members simply disappears (standard
    * empty-cluster behavior; reseeding is a policy layered on top).
    *
    * Scale per round: one broadcast of nLists centroid vectors, one
    * corpus scan, one shuffle of (list, dim) partial sums with
    * map-side combine (nLists × dims rows per mapper, independent of
    * corpus size) — the unrolled chain is `iters` such rounds and
    * Catalyst sees it as one plan; no driver-side data moves. */
  /** Defaults shared with the generated DuckDB oracle
    * (SparkEntry.kmeansOracleSql) — one constant each, so retuning the
    * operator cannot desynchronize the gate. */
  val KmeansLists = 8
  val KmeansIters = 3

  def kmeans(spark: SparkSession, dir: String,
             nLists: Int = KmeansLists, iters: Int = KmeansIters): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    var anchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    var centroids: DataFrame = null
    for (_ <- 0 until iters) {
      val assigned = limitBy(
        emb.join(broadcast(anchors))
          .select(col("vec_id"), col("embedding"), col("list_id"),
            floorRound(
              dot(col("anchor"), col("anchor")) -
                lit(2.0) * dot(col("embedding"), col("anchor")), 6).as("__dist")),
        1, Seq(col("vec_id")), Seq(col("__dist").asc, col("list_id")))
      centroids = integerUnitCentroids(assigned)
      // truncate the lineage each iteration (round-15): anchors is
      // nLists tiny rows, but lazily it drags every PRIOR iteration's
      // assign→centroid subtree into the next plan — iters-deep nested
      // plans that Catalyst re-analyzes per iteration and the broadcast
      // build re-executes. Checkpointed, each iteration's plan is one
      // scan + assign + aggregate against a materialized anchor leaf.
      anchors = centroids.groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("dc"))
        .select(col("list_id"),
          expr("transform(dc, s -> cast(s.centroid as float))").as("anchor"))
        .localCheckpoint(false)
    }
    centroids.orderBy("list_id", "dim")
  }

  /** IVF-style partition assignment: each vector assigned to its nearest
    * of `nLists` anchor vectors (anchors = the first nLists corpus
    * vectors — deterministic, data-derived). The cluster histogram is
    * the queryable output; at scale the assignment is the partition key
    * that turns ANN into per-list local search. */
  /** The assignment canon shared by the stored layout ([[ivfAssign]])
    * and the k-means step ([[centroidUpdate]]): nearest anchor by
    * 6dp-rounded similarity, list_id tie-break. One definition — the
    * index layout and its training step cannot drift apart. */
  private def assignToLists(emb: DataFrame, nLists: Int): DataFrame = {
    val anchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    limitBy(
      emb.join(broadcast(anchors))
        .select(col("vec_id"), col("embedding"), col("list_id"),
          floorRound(dot(col("embedding"), col("anchor")), 6).as("__sim")),
      1, Seq(col("vec_id")), Seq(col("__sim").desc, col("list_id")))
  }

  /** Per-row nearest-list assignment against a FIXED anchor set — the
    * streaming-MV form of [[assignToLists]]: `least` over
    * (−sim, list_id) structs is the same "6dp sim desc, list_id asc"
    * canon expressed without a ranking window (windows are illegal on
    * streams), fully codegen'd, zero state. The anchor set is the
    * index DEFINITION (like the LSH hyperplanes) — a handful of
    * vectors shipped with the plan. Agreement with the batch window
    * path is asserted in StreamingSpec via the oracled per-list
    * histogram. */
  def perRowListAssign(emb: Column, anchors: Seq[(Long, Array[Float])]): Column = {
    val cands = anchors.map { case (lid, a) =>
      val al = array(a.toIndexedSeq.map(lit): _*)
      struct((-floorRound(dot(emb, al), 6)).as("negsim"), lit(lid).as("list_id"))
    }
    least(cands: _*).getField("list_id")
  }

  def ivfAssign(spark: SparkSession, dir: String, nLists: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    assignToLists(Tables.embeddings(spark, dir), nLists)
      .withColumnRenamed("__sim", "sim")
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vectors"),
        // exact integer-unit average (sim is 6dp) — order-insensitive
        floorRound(sum(floor(col("sim") * 1e6 + 0.5).cast("long")) / (count(lit(1)) * 1e6), 4)
          .as("avg_sim"))
      .orderBy("list_id")
  }
  /** Product-quantization codes (the IVF-PQ compression step): split
    * each 64-dim vector into 8 contiguous 8-dim subspaces, assign every
    * subspace to its nearest of 16 per-subspace codewords by squared
    * euclidean distance, and pack the 8 4-bit codes into one integer —
    * a 256× compression of the vector for memory-resident ANN rescoring.
    *
    * Codewords follow the suite's anchor convention (the first k
    * vectors, sliced per subspace): deterministic, content-derived, and
    * reproducible in the oracle — [[kmeans]] is the training step that
    * would refine them in production. Distances are floor-rounded to
    * 6dp with a code-index tie-break, the same determinism contract as
    * IVF assignment.
    *
    * Scale: codewords broadcast (k rows); per vector the 8×16 distance
    * matrix is computed in one projection and reduced by 8 min_by
    * aggregates in a single shuffle on vec_id. At 100 TB the join is a
    * broadcast against every corpus partition — no corpus shuffle at
    * all if the groupBy is replaced by a per-row argmin (the join emits
    * k rows per vector only because the codeword table is a FRAME; a
    * generated CASE chain would fuse it into the scan). */
  def pqCodes(spark: SparkSession, dir: String,
              m: Int = 8, k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    pqBest(Tables.embeddings(spark, dir), m, k)
      .select(col("vec_id"),
        (0 until m).map(s => col(s"c$s") * lit(1L << (4 * s)))
          .reduce(_ + _).cast("long").as("pq_code"))
      .orderBy("vec_id")
  }

  /** Squared euclidean between subspace `s` of two vectors, 6dp
    * floor-rounded; sequential sum in slice order — bit-identical in
    * any engine that sums in list order, like the dot products
    * elsewhere in this file. Computed by the native codegen'd
    * [[graft.functions.SubspaceDist]] (one fused loop per call) — the
    * interpreted aggregate(zip_with(slice,slice)) form it replaces ran
    * 128 lambda evaluations per corpus row in pqBest. */
  private def subDist(e: Column, a: Column, s: Int, sub: Int): Column =
    floorRound(call_function("subspace_dist", e, a, lit(s * sub), lit(sub)), 6)

  /** Per-vector best codeword per subspace: (vec_id, c0..c{m-1}). */
  private def pqBest(emb: DataFrame, m: Int, k: Int): DataFrame = {
    val sub = 64 / m
    val anchors = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("code"), col("embedding").as("anchor"))
    val scored = emb.join(broadcast(anchors))
      .select(col("vec_id") +: col("code") +:
        (0 until m).map(s =>
          subDist(col("embedding"), col("anchor"), s, sub).as(s"d$s")): _*)
    scored.groupBy("vec_id")
      .agg(
        min_by(col("code"), struct(col("d0"), col("code"))).as("c0"),
        (1 until m).map(s =>
          min_by(col("code"), struct(col(s"d$s"), col("code"))).as(s"c$s")): _*)
  }

  /** PQ k-NN via asymmetric distance computation (ADC) — the search
    * half of IVF-PQ: each query computes its m×k lookup table of
    * subspace distances to every codeword ONCE, and a corpus vector is
    * scored by summing the m table entries its packed code selects —
    * 8 integer adds per candidate instead of a 64-dim float dot, the
    * arithmetic that makes billion-scale rescoring affordable.
    *
    * Scale: the LUT is (queries × k × m) rows — broadcast; the corpus
    * side ships only (vec_id, subspace, code), never the embeddings.
    * Distances accumulate as exact 6dp integer units, so ranking is
    * partition-order invariant and oracle-reproducible. Approximation
    * error vs exact euclidean is the PQ reconstruction error
    * (recall property-tested against brute force). */
  def knnPq(spark: SparkSession, dir: String, nQueries: Int = 20,
            k: Int = 5, m: Int = 8, kCodes: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val sub = 64 / m
    val codes = pqBest(emb, m, kCodes)
      .select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("s"), col(s"c$s").as("code"))): _*)).as("sc"))
      .select(col("vec_id"), col("sc.s").as("s"), col("sc.code").as("code"))
    val anchors = emb.filter(col("vec_id") < kCodes)
      .select(col("vec_id").cast("int").as("code"), col("embedding").as("anchor"))
    val lut = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(anchors)
      .select(col("query_id"), col("code"), explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          floor(subDist(col("qe"), col("anchor"), s, sub) * 1e6 + 0.5)
            .cast("long").as("units"))): _*)).as("su"))
      .select(col("query_id"), col("su.s").as("s"), col("code"),
        col("su.units").as("units"))
    codes.join(broadcast(lut), Seq("s", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg((sum(col("units")) / 1e6).as("adc_dist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
  /** IVF-PQ search — the two halves composed, the ANN shape that runs
    * at billion scale: IVF pruning restricts each query to its nprobe
    * nearest lists (the corpus is stored partitioned by list), and the
    * surviving candidates are scored by PQ asymmetric distance — codes,
    * never embeddings, on the scan side. The per-query LUT and probe
    * table broadcast; the only corpus-sized work is the pruned
    * candidate join plus 8 integer adds per candidate. Recall stacks
    * both approximations (probe misses + reconstruction error) —
    * property-tested like its halves; exact rescoring of this
    * candidate set is [[knnIvf]]'s job. */
  def knnIvfPq(spark: SparkSession, dir: String, nQueries: Int = 20,
               k: Int = 5, nLists: Int = 8, nprobe: Int = 3,
               m: Int = 8, kCodes: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val sub = 64 / m
    val listAnchors = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("anchor"))
    val assigned = limitBy(
      emb.join(broadcast(listAnchors))
        .select(col("vec_id"), col("list_id"),
          dot(col("embedding"), col("anchor")).as("__sim")),
      1, Seq(col("vec_id")), Seq(col("__sim").desc, col("list_id")))
      .select("vec_id", "list_id")
    val probes = limitBy(
      emb.filter(col("vec_id") < nQueries)
        .join(broadcast(listAnchors))
        .select(col("vec_id").as("query_id"), col("list_id"),
          dot(col("embedding"), col("anchor")).as("__sim")),
      nprobe, Seq(col("query_id")), Seq(col("__sim").desc, col("list_id")))
      .select("query_id", "list_id")
    val codeAnchors = emb.filter(col("vec_id") < kCodes)
      .select(col("vec_id").cast("int").as("code"), col("embedding").as("anchor"))
    val codes = pqBest(emb, m, kCodes)
      .select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("s"), col(s"c$s").as("code"))): _*)).as("sc"))
      .select(col("vec_id"), col("sc.s").as("s"), col("sc.code").as("code"))
    val lut = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(codeAnchors)
      .select(col("query_id"), col("code"), explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          floor(subDist(col("qe"), col("anchor"), s, sub) * 1e6 + 0.5)
            .cast("long").as("units"))): _*)).as("su"))
      .select(col("query_id"), col("su.s").as("s"), col("code"),
        col("su.units").as("units"))
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg((sum(col("units")) / 1e6).as("adc_dist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** ANN quality evaluation: recall@k of the hyperplane-LSH index
    * ([[knnLsh]]) against the brute-force ground truth
    * ([[knnBruteForce]]) — the acceptance gate every approximate index
    * needs before it replaces the exact path in production. Per query:
    * |LSH top-k ∩ exact top-k| / k, 4dp-floored.
    *
    * Scale: the expensive side (exact top-k) is only ever computed for
    * the evaluation query sample (`nQueries`), never the corpus — this
    * is the standard offline recall harness; the join is two tiny
    * (nQueries × k)-row frames. */
  def annRecall(spark: SparkSession, dir: String,
                nQueries: Int = 20, k: Int = 5): DataFrame = {
    val truth = knnBruteForce(spark, dir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = knnLsh(spark, dir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall_at_k",
        floorRound(col("hits").cast("double") / col("n_truth"), 4))
      .orderBy("query_id")
  }
}
