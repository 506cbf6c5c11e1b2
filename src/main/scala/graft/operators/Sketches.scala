package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ChFunctions.floorRound
import graft.functions.OracleHash

/** The mergeable-summary family beyond distinct counts: count-min
  * frequency sketches, Bloom-filter membership, and KMV set-operation
  * estimates. Together with the KMV distinct sketch
  * ([[graft.pipes.CdcPipes.activeUsersKmvPerHour]]) these are the
  * Spark re-expression of the `-State`/`-Merge` pre-aggregation
  * pattern the reference's engine ships for dashboards
  * (AggregatingMergeTree; cf. kits' MV pipes): build tiny associative
  * partials once per partition/day, answer any rollup by merging
  * partials — never by re-scanning the log.
  *
  * Everything here is DETERMINISTIC: every hash routes through
  * [[OracleHash]] (md5-derived), so the correctness gate verifies the
  * APPROXIMATE answers hash-for-hash in DuckDB — not just error
  * bounds.
  */
object Sketches {

  /** The `depth` CMS lanes of a term: (lane, bucket) structs, bucket =
    * seeded32 hash mod `width`. Shared by the build and probe sides so
    * the two cannot drift. */
  private def cmsLanes(term: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r => struct(
      lit(r).as("r"),
      pmod(OracleHash.seeded32(r, term), lit(width.toLong)).as("bucket"))): _*)

  /** CMS counter cells over `df`'s `key` expression, additionally
    * grouped by `groupCols` (e.g. an hour column for time-partitioned
    * sketches): one row per (group…, lane, bucket) with its count —
    * ≤ groups × depth × width rows regardless of input size, mergeable
    * across partials by cell-wise addition (which is also why the
    * build is just a count aggregate: Spark's partial/final split IS
    * the sketch merge). Shared by [[cmsTopTerms]] and the streaming MV
    * ([[graft.streaming.CdcStream.startCmsMv]]) so batch and stream
    * cannot drift. */
  def cmsCounters(df: DataFrame, key: Column, groupCols: Seq[String],
                  depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(groupCols.map(col) :+ explode(cmsLanes(key, depth, width)).as("rb"): _*)
      .select(groupCols.map(col) :+ col("rb.r").as("r") :+ col("rb.bucket").as("bucket"): _*)
      .groupBy((groupCols :+ "r" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("c"))

  /** Count-min sketch over the corpus vocabulary, evaluated on the
    * exact top-`topN` heavy hitters: per term, the exact count next to
    * the CMS estimate (min over `depth` lanes of the lane's bucket
    * counter) and the collision overcount (always ≥ 0 — CMS never
    * undercounts).
    *
    * Scale: the sketch build is ONE map-side-combinable count shuffle
    * of `depth` integer pairs per token — counters are bounded at
    * depth × width cells regardless of corpus size (the point of CMS:
    * a ~32 KB summary of an unbounded vocabulary, mergeable across
    * days/partitions by cell-wise addition, which is exactly the
    * partial-aggregate plan Spark already runs). The probe side joins
    * the parameter-bounded counter table back to the top-N terms via
    * an explicit broadcast. At 100 TB the heavy-hitter list would be
    * served FROM the sketch alone; the exact column here is the gate's
    * ground truth, and doubles as the false-positive audit. */
  def cmsTopTerms(spark: SparkSession, dir: String,
                  depth: Int = 4, width: Int = 1024,
                  topN: Int = 20): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val counters = cmsCounters(terms, col("term"), Nil, depth, width)
    val top = terms.groupBy("term").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("term"))
      .limit(topN)
    top
      .select(col("term"), col("exact_n"),
        explode(cmsLanes(col("term"), depth, width)).as("rb"))
      // depth × width cells — parameter-bounded, broadcast by design
      .join(broadcast(counters),
        col("rb.r") === counters("r") && col("rb.bucket") === counters("bucket"))
      .groupBy("term", "exact_n")
      .agg(min(col("c")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_n"))
      .orderBy(col("exact_n").desc, col("term"))
  }

  /** Bits live in 63-bit words so the packed BIGINT stays positive in
    * both engines (no sign-extension corner on the shift probe). */
  private val BitsPerWord = 63

  /** Bloom-filter decontamination probe: pack the TEST split's bigram
    * set into an `mWords`×63-bit filter (k md5-seeded positions per
    * gram, OR-folded into words), then probe every TRAIN document's
    * bigrams against it. Per train doc: distinct bigrams, how many the
    * filter maybe-contains, and the exact containment count (bloom ≥
    * exact; the gap is the filter's false positives, audited by the
    * oracle rather than assumed from theory).
    *
    * This is the shape benchmark-decontamination takes at 100 TB: the
    * held-out set's fingerprint filter is a parameter-bounded bitmap
    * (mWords longs — KBs, broadcast to every executor), so screening
    * the full corpus is a scan + broadcast-join, never a shuffle of
    * corpus n-grams against the benchmark. The exact-containment join
    * (here the audit column) is the expensive path the filter exists
    * to avoid. The filter is mergeable (word-wise OR) across benchmark
    * shards. */
  /** The k md5-seeded bit positions of a key in an mWords×63-bit
    * filter. */
  private def bloomPositions(key: Column, mWords: Int, kHashes: Int): Column = {
    val mBits = mWords.toLong * BitsPerWord
    array((0 until kHashes).map(j =>
      pmod(OracleHash.seeded32(j, key), lit(mBits))): _*)
  }

  /** OR-partial Bloom words over `df`'s `key` expression: (word_idx,
    * bits) — ≤ mWords rows regardless of input size, mergeable across
    * partials/shards by word-wise OR (and therefore duplicate-
    * idempotent: re-adding a key re-ORs the same bits). Shared by
    * [[bloomContamination]] and the streaming MV
    * ([[graft.streaming.CdcStream.startBloomMv]]). */
  def bloomWords(df: DataFrame, key: Column,
                 mWords: Int = 1024, kHashes: Int = 4): DataFrame =
    df.select(explode(bloomPositions(key, mWords, kHashes)).as("p"))
      .select(expr(s"p div $BitsPerWord").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $BitsPerWord AS INT))").as("w"))
      .groupBy("word_idx").agg(bit_or(col("w")).as("bits"))

  /** Probe `df` (rows must be DISTINCT — they are grouped back to
    * themselves) against a [[bloomWords]] bitmap: appends `maybe` = 1
    * iff all k of the key's bits are set. The bitmap is parameter-
    * bounded and joined as an explicit broadcast — probing N rows is a
    * scan, never a shuffle. */
  def bloomProbe(df: DataFrame, key: Column, bitmap: DataFrame,
                 mWords: Int = 1024, kHashes: Int = 4): DataFrame = {
    val keep = df.columns.map(col)
    df.withColumn("__p", explode(bloomPositions(key, mWords, kHashes)))
      .withColumn("__word_idx", expr(s"__p div $BitsPerWord"))
      .withColumn("__bit", expr(s"CAST(__p % $BitsPerWord AS INT)"))
      .join(broadcast(bitmap), col("__word_idx") === bitmap("word_idx"), "left")
      .withColumn("__hit", when(col("bits").isNotNull &&
        expr("(shiftright(bits, __bit) & 1) = 1"), 1).otherwise(0))
      .groupBy(keep: _*)
      .agg(min(col("__hit")).as("maybe"))
  }

  def bloomContamination(spark: SparkSession, dir: String,
                         mWords: Int = 1024, kHashes: Int = 4): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        TextAnalysis.splitOf(col("text")).as("split"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("split"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', t[i-1], t[i]))"))
        .as("gram"))

    val testGrams = grams.filter(col("split") === "test")
      .select("gram").distinct()
    val bitmap = bloomWords(testGrams, col("gram"), mWords, kHashes)

    val trainGrams = grams.filter(col("split") === "train")
      .select("doc_id", "gram").distinct()
    val probed = bloomProbe(trainGrams, col("gram"), bitmap, mWords, kHashes)
    val exact = trainGrams
      .join(testGrams.withColumn("present", lit(1)), Seq("gram"), "left")
      .groupBy("doc_id", "gram")
      .agg(max(coalesce(col("present"), lit(0))).as("exact_hit"))
    probed.join(exact, Seq("doc_id", "gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("maybe")).as("n_bloom_hits"),
        sum(col("exact_hit")).as("n_exact_hits"))
      .filter(col("n_bloom_hits") > 0)
      .orderBy("doc_id")
  }

  /** KMV set-operation estimates between per-event-type user sets —
    * the deterministic analogue of theta-sketch set operations: for
    * every pair of event types, estimated distinct users of each,
    * of the union (k smallest of the merged k-minima), and of the
    * intersection (union estimate × the fraction of the union sketch's
    * k minima present in BOTH sides' sketches), plus the Jaccard
    * estimate itself.
    *
    * Scale: the only corpus-sized work is the per-type distinct-hash
    * shuffle; everything after operates on ≤ k longs per type
    * (parameter-bounded), so cross-set overlap questions at 100 TB —
    * "how much do these two audiences overlap" — are answered from
    * stored sketch partials without revisiting the log, and the
    * sketches merge associatively across time partitions. Every hash,
    * rank and IEEE step reproduces in DuckDB, so even the APPROXIMATE
    * Jaccard is hash-match verified. */
  def kmvTypeOverlap(spark: SparkSession, dir: String,
                     k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = (h: Column) =>
      (h.cast("double") + lit(9.223372036854776e18)) / lit(1.8446744073709552e19)
    val est = (n: Column, hk: Column) =>
      when(n < k, n.cast("double")).otherwise(lit((k - 1).toDouble) / norm(hk))

    val hashed = Tables.events(spark, dir)
      .select(col("event_type"),
        OracleHash.low64(col("user_id").cast("string")).as("h"))
      .distinct()
    val kept = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k)
    val perType = kept.groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("event_type"), est(col("n"), col("hk")).as("est_users"))

    val types = kept.select("event_type").distinct()
    val pairs = types.select(col("event_type").as("type_a"))
      .crossJoin(broadcast(types.select(col("event_type").as("type_b"))))
      .filter(col("type_a") < col("type_b"))
    val members = pairs
      .join(kept.select(col("event_type"), col("h")),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .groupBy("type_a", "type_b", "h")
      .agg(max(when(col("event_type") === col("type_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("event_type") === col("type_b"), 1).otherwise(0)).as("in_b"))
    val agg = members
      .withColumn("rn", row_number().over(
        Window.partitionBy("type_a", "type_b").orderBy("h")))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_union"),
        max(when(col("rn") === k, col("h"))).as("hk"),
        sum(when(col("rn") <= k && col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_both"))
      .withColumn("est_union_raw", est(col("n_union"), col("hk")))
      .withColumn("jacc_raw",
        col("n_both").cast("double") / least(col("n_union"), lit(k.toLong)).cast("double"))

    agg
      .join(broadcast(perType.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("est_users", "ua")), "type_a")
      .join(broadcast(perType.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("est_users", "ub")), "type_b")
      .select(col("type_a"), col("type_b"),
        floorRound(col("ua"), 2).as("est_users_a"),
        floorRound(col("ub"), 2).as("est_users_b"),
        floorRound(col("est_union_raw"), 2).as("est_union"),
        floorRound(col("jacc_raw") * col("est_union_raw"), 2).as("est_intersection"),
        floorRound(col("jacc_raw"), 4).as("est_jaccard"))
      .orderBy("type_a", "type_b")
  }
}
