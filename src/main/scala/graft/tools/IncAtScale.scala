package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupMaintenance, TextDedup}

/** Delta-sized maintenance proof AT SCALE (round-13 verdict #3): the
  * 100 TB story rested on unit-scale soaks — nobody had pushed one
  * real increment through `update` against the sf100 artifact set.
  * This tool runs that measurement against a PRE-EXISTING data dir +
  * artifact set (hardlink copies of the real sf100 pair — see
  * tools/inc_at_scale.sh):
  *
  *   1. `update` on the untouched copy — either "skip" (artifact fully
  *      current) or "full" (a stage-set EXTENSION, e.g. the round-14
  *      `doc_verdicts` surface staging onto a pre-round-14 set: only
  *      the missing stage runs — timed, because that number IS the
  *      pay-at-ingest cost of the new surface);
  *   2. append a ~`deltaPermille`‰ synthetic doc delta (new ids past
  *      max; half exact copies of sampled real docs, half suffixed
  *      near-copies — so the increment must produce real pair-graph
  *      edges), ONE new parquet file, no existing file touched;
  *   3. `update` again — MUST take the "incremental" path; wall time
  *      is the headline (expect minutes, vs the ~1950 s sf100 cold
  *      build), with the phase breakdown on stderr via
  *      SPARK_GRAFT_INC_DEBUG=1;
  *   4. identity spot-checks WITHOUT a second full build: the
  *      maintained `doc_digests` live view must equal an md5 recompute
  *      over the post-append corpus (full-surface identity, one corpus
  *      scan), and the staged pair graph must contain edges reaching
  *      the delta ids (the engineered duplicates arrived).
  *
  * Usage: `runMain graft.tools.IncAtScale <dataDir> <artDir> [permille]`
  * Prints one JSON line.
  */
object IncAtScale {
  def main(args: Array[String]): Unit = {
    graft.RunLock.acquireOrDie("IncAtScale")
    val data = args(0)
    val art = args(1)
    val permille = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.shuffleConfigs(data, cpus)
      .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => String): (Double, String) = {
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      val mode = body
      ((System.nanoTime() - t0) / 1e9, mode)
    }

    // leg 1: bring the copied artifact set current (skip when already;
    // a stage-set extension when the set predates a new surface)
    val (tExtend, mExtend) = timed { DedupMaintenance.update(spark, data, art) }
    require(mExtend == "skip" || mExtend == "full",
      s"pre-append update took unexpected path: $mExtend")

    // leg 2: the synthetic delta — ~permille‰ of the corpus, new ids,
    // engineered duplicates (exact + suffixed near-copies)
    val docs = graft.Tables.documents(spark, data)
    val nDocs = docs.count()
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    val step = math.max(1L, 1000L / permille)
    val delta = docs
      .filter(pmod(col("doc_id"), lit(step)) === 7)
      .select((col("doc_id") + lit(maxId + 1L)).as("doc_id"), col("lang"),
        col("source"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" inc14 probe tail")))
          .as("text"))
    val nDelta = delta.count()
    delta.withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(1)
      .write.mode("append").parquet(s"$data/documents.parquet")
    spark.catalog.refreshByPath(data)

    // leg 3: the increment itself — the headline number
    val (tInc, mInc) = timed { DedupMaintenance.update(spark, data, art) }
    require(mInc == "incremental",
      s"post-append update must take the incremental path, took: $mInc")
    val lastInc = DedupMaintenance.lastIncrement(art).getOrElse("{}")

    // leg 4a: full-surface identity on doc_digests (maintained view ==
    // recompute over the post-append corpus)
    val maintained = TextDedup.readDocDigests(spark, art)
      .select(col("doc_id"), col("digest"))
    val fresh = graft.Tables.documents(spark, data)
      .select(col("doc_id"), md5(col("text")).as("digest"))
    val diff = maintained.unionByName(fresh)
      .groupBy("doc_id", "digest").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    require(diff == 0, s"doc_digests diverged from recompute: $diff rows")

    // leg 4b: the engineered duplicates produced pair-graph edges
    val deltaPairs = TextDedup.stagedPairs(spark, art)
      .filter(col("doc_b") > maxId).count()
    require(deltaPairs > 0, "no pair edge reaches the delta ids")

    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"probe":"inc_at_scale","data":"$data","n_docs":$nDocs,""" +
      s""""n_delta":$nDelta,"extend_sec":${f2(tExtend)},""" +
      s""""extend_mode":"$mExtend","inc_sec":${f2(tInc)},""" +
      s""""delta_pairs":$deltaPairs,"last_inc":$lastInc}""")
    spark.stop()
  }
}
