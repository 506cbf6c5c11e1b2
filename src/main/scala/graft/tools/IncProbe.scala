package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupMaintenance, TextDedup, VectorOps}

/** Incremental-maintenance cost probe — the measurement behind the
  * round-10 claim "delta cost ∝ delta, not corpus": split an sf dir's
  * documents/embeddings into a base (98%) and two equal append deltas
  * (1% each), then time
  *
  *   1. the FULL artifact build over the base,
  *   2. `DedupMaintenance.update` after appending delta 1 (incremental),
  *   3. the same after appending delta 2 (incremental again — proves
  *      increments COMPOSE: the second rides on state the first
  *      appended),
  *   4. a from-scratch full rebuild over the merged input at the
  *      layout's pinned geometry (the incremental path's competitor),
  *
  * and cross-check pair counts between the incrementally-maintained
  * dir and the fresh rebuild (the bit-identity proof lives in
  * DedupMaintenanceSpec at small SF; at probe SF the counts guard
  * against a silent divergence).
  *
  * Usage: `runMain graft.tools.IncProbe <sfDir> <workDir> [basePct deltaPct]`
  * (e.g. /tmp/sf10 /tmp/inc_probe 98 1 — base 98%, two 1% deltas).
  * Prints one JSON line.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    graft.RunLock.acquireOrDie("IncProbe")
    val sfDir = args(0)
    val work = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.shuffleConfigs(sfDir, cpus)
      .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val data = s"$work/data"
    val art = s"$work/art"
    val artFull = s"$work/art_full"
    graft.sources.Layout.deleteRec(new java.io.File(work))

    val docs = graft.Tables.documents(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val nDocs = docs.count(); val nEmb = emb.count()
    val basePct = args.lift(2).map(_.toLong).getOrElse(98L)
    val deltaPct = args.lift(3).map(_.toLong).getOrElse(1L)
    // cut by RANK, not raw id: the GenScale dirs offset each replica's
    // ids by k*1e9, so a percent-of-count compared against raw ids
    // would select a sliver of replica 0 and call it "98% of the
    // corpus" (first probe attempt did exactly that — flat times and
    // sf10==sf30 pair counts gave it away)
    def cutId(df: org.apache.spark.sql.DataFrame, idCol: String,
              n: Long, pct: Long): Long =
      df.select(col(idCol)).orderBy(col(idCol))
        .limit(((n * pct) / 100).toInt)
        .agg(max(col(idCol))).first().getLong(0)
    val dCut1 = cutId(docs, "doc_id", nDocs, basePct)
    val dCut2 = cutId(docs, "doc_id", nDocs, basePct + deltaPct)
    val eCut1 = cutId(emb, "vec_id", nEmb, basePct)
    val eCut2 = cutId(emb, "vec_id", nEmb, basePct + deltaPct)
    docs.filter(col("doc_id") <= dCut1)
      .write.parquet(s"$data/documents.parquet")
    emb.filter(col("vec_id") <= eCut1)
      .write.parquet(s"$data/embeddings.parquet")

    def timed(label: String)(body: => String): (String, Double, String) = {
      System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      val mode = body
      ((label, (System.nanoTime() - t0) / 1e9, mode))
    }
    def appendSlice(lo: Long, hiD: Long, loE: Long, hiE: Long): Unit = {
      docs.filter(col("doc_id") > lo && col("doc_id") <= hiD)
        .write.mode("append").parquet(s"$data/documents.parquet")
      emb.filter(col("vec_id") > loE && col("vec_id") <= hiE)
        .write.mode("append").parquet(s"$data/embeddings.parquet")
    }

    /** Copy-on-write rewrite of ONE existing part file — the lakehouse
      * update/delete shape DedupMaintenance resolves through the staged
      * file maps. The stale Hadoop-local checksum sidecar must go with
      * the old bytes. */
    def rewriteFile(target: java.io.File,
                    df: org.apache.spark.sql.DataFrame): Unit = {
      val t = java.nio.file.Files.createTempDirectory("cow_probe").toString
      df.repartition(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      require(target.delete(), s"couldn't drop $target")
      val crc = new java.io.File(target.getParentFile, s".${target.getName}.crc")
      if (crc.exists) crc.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(System.currentTimeMillis() + 1000)
    }
    def docParts(): Seq[java.io.File] =
      new java.io.File(s"$data/documents.parquet").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).sortBy(_.getName).toSeq

    val r1 = timed("full_base") { DedupMaintenance.update(spark, data, art) }
    appendSlice(dCut1, dCut2, eCut1, eCut2)
    val r2 = timed(s"inc_${deltaPct}pct") { DedupMaintenance.update(spark, data, art) }
    appendSlice(dCut2, Long.MaxValue, eCut2, Long.MaxValue)
    val r3 = timed(s"inc_${100 - basePct - deltaPct}pct") { DedupMaintenance.update(spark, data, art) }
    // FLOOR leg: a single appended doc — the fixed cost every
    // increment pays regardless of delta size (job round-trips,
    // guards, tombstone probes, the one restricted index scan)
    spark.range(1).selectExpr("9000000000L as doc_id",
      "'floor probe doc one two three four five six' as text")
      .write.mode("append").parquet(s"$data/documents.parquet")
    val r7 = timed("inc_1doc_floor") { DedupMaintenance.update(spark, data, art) }
    // UPDATE leg: rewrite the LARGEST base part file (by size, not the
    // UUID-random name order) with ~2% of its texts edited —
    // retract-then-reapply at touched-file cost, the 60%-update CDC
    // shape (demo_users.py:17-19)
    val updTarget = docParts().maxBy(_.length)
    val updRows = spark.read.parquet(updTarget.toString).count()
    rewriteFile(updTarget, spark.read.parquet(updTarget.toString)
      .withColumn("text", expr(
        "case when doc_id % 50 = 0 then concat(text, ' upd probe') " +
          "else text end")))
    val r5 = timed("upd_one_file") { DedupMaintenance.update(spark, data, art) }
    // DELETE leg: drop ~1% of the largest file the UPDATE leg did NOT
    // touch — its repartition(1) rewrite can demote the update target
    // in the size order, so a plain second-largest pick could re-hit
    // the same (just-rewritten) file and the two legs would stop
    // measuring independent costs
    val delTarget = docParts().filterNot(_ == updTarget).maxBy(_.length)
    val delRows = spark.read.parquet(delTarget.toString).count()
    rewriteFile(delTarget, spark.read.parquet(delTarget.toString)
      .filter("doc_id % 97 != 0"))
    val r6 = timed("del_rows_one_file") { DedupMaintenance.update(spark, data, art) }
    val l = VectorOps.readLayoutGeometry(s"$art/emb_probe_layout").get._1
    val r4 = timed("full_merged") {
      if (TextDedup.writeDedupArtifacts(spark, data, artFull,
          embNLists = l.toInt)) "full" else "skip"
    }
    require(r1._3 == "full" && Seq(r2, r3, r7, r5, r6).forall(_._3 == "incremental"),
      s"probe took the wrong paths: ${Seq(r1, r2, r3, r7, r5, r6).map(_._3)}")
    // divergence guard: the maintained artifacts and the fresh rebuild
    // must agree on LIVE graph sizes (tombstone-resolved views)
    def live(artDir: String, t: String): Long = t match {
      case "pairs" => TextDedup.stagedPairs(spark, artDir).count()
      case "emb_pairs" => TextDedup.stagedEmbPairs(spark, artDir).count()
      case "clusters" => TextDedup.stagedClusters(spark, artDir).count()
      case _ => TextDedup.stagedEmbClusters(spark, artDir).count()
    }
    val counts = Seq("pairs", "emb_pairs", "clusters", "emb_clusters").map { t =>
      val a = live(art, t); val b = live(artFull, t)
      require(a == b, s"$t diverged: incremental=$a fresh=$b")
      t -> a
    }
    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val runs = Seq(r1, r2, r3, r7, r5, r6, r4)
      .map { case (l0, s, m) => s""""$l0":{"sec":${f2(s)},"mode":"$m"}""" }
      .mkString(",")
    val cj = counts.map { case (t, c) => s""""$t":$c""" }.mkString(",")
    println(s"""{"probe":"inc","sf":"$sfDir","n_docs":$nDocs,"n_emb":$nEmb,"upd_file_rows":$updRows,"del_file_rows":$delRows,$runs,"counts":{$cj}}""")
    spark.stop()
  }
}
