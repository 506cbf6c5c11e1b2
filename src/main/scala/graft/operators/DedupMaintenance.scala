package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._

/** Incremental maintenance of the staged dedup artifacts
  * ([[TextDedup.writeDedupArtifacts]]) — the reference's
  * incremental-per-block architecture (kits/users/pg/pipes/
  * users_mv.pipe:19-20 precomputes at ingest; users_batch_copy.pipe:10-26
  * advances a watermark instead of recomputing the snapshot) applied to
  * the dedup pipeline: an APPEND of new documents/embeddings updates all
  * eight staged artifacts at a cost proportional to the DELTA, not the
  * corpus, and the result is IDENTICAL to a full rebuild over the merged
  * input (asserted in DedupMaintenanceSpec).
  *
  * What an increment does, per side:
  *
  * TEXT — the delta docs are shingled and hashed (∝ delta); the staged
  * document-frequency table gives merged-corpus dfs for exactly the
  * shingles the delta touches; every NEW pair must share a shingle with
  * a delta doc, so the counting join runs over (rare delta rows) ×
  * (staged index rows restricted to the delta's shingle set) plus the
  * delta self-join — base×base pairs are untouched by construction.
  * New pairs APPEND to `pairs`; `shingle_index`/`shingle_df`/`doc_stats`
  * receive delta appends (df partials sum on read); clusters merge via
  * contraction ([[ConnectedComponents.mergeClusters]] — CC over the
  * delta-sized contracted graph, never the corpus graph).
  *
  * EMBEDDINGS — the layout's persisted `_GEOMETRY` pins the anchor set
  * (an index never re-derives k from n on insert), so base assignments
  * are byte-stable; delta vectors probe the SAME anchors (∝ delta·L
  * dots), new pairs come from delta-probes × layout on list_id
  * ([[VectorOps.pairsBetweenProbes]]), and the probe rows append to the
  * partitioned layout.
  *
  * VALIDITY GUARDS (any failure → full rebuild, correctness never
  * bent):
  *  - any pre-existing input file modified or removed (not an append);
  *  - a shingle's df would CROSS maxDf (base ≤ maxDf < merged): the
  *    rare/common classification of base rows would change, so the
  *    stored pairs/doc_stats would no longer equal a fresh rebuild's.
  *    Crossings are rare boilerplate-growth events; detecting one costs
  *    one scan of the compact df table;
  *  - a delta doc_id/vec_id colliding with an existing one (an update,
  *    not an append), or a delta vec_id below nLists (would join the
  *    anchor set);
  *  - missing maintenance state (pre-v3 artifact dirs, absent layout
  *    geometry).
  *
  * CRASH SAFETY — appends are not atomic, so the increment writes an
  * `_INC_JOURNAL` first and removes it after the new `_FINGERPRINT`
  * lands. A crash in between leaves the journal: `artifactsCurrent`
  * then reports stale (consumers fall back to self-contained forms) and
  * the next update() takes the proven full-rebuild path. The
  * cluster-table swap (write `clusters__new`, delete, rename) sits
  * inside the same journal window.
  *
  * KNOWN BOUNDARY (documented, inherited from the base operator): the
  * increment reproduces the df-capped pipeline exactly, including its
  * candidate-recall contract — at the test SFs max df < maxDf, so
  * incremental(base+delta) ≡ full-rebuild(base∪delta) bit-for-bit.
  */
object DedupMaintenance {

  /** Bring the staged artifacts up to date with `dir`. Returns the
    * path taken: "skip" (already current), "incremental" (delta-only
    * maintenance), or "full" (first build, or a guard fired). */
  def update(spark: SparkSession, dir: String, out: String,
             minJaccard: Double = 0.5, maxDf: Int = 100,
             embNLists: Int = 0): String =
    TextDedup.artifactLock(out).synchronized {
      TextDedup.withArtifactFileLock(out) {
        if (TextDedup.artifactsCurrent(dir, out, minJaccard, maxDf) &&
            TextDedup.stagedGeometryOk(out, embNLists)) "skip"
        else {
          val fpNew = TextDedup.inputFingerprint(dir, minJaccard, maxDf)
          val delta = additionsOnlyDelta(dir, out, minJaccard, maxDf)
          val incremented = delta.exists { case (docFiles, embFiles) =>
            tryIncrement(spark, dir, out, docFiles, embFiles,
              minJaccard, maxDf, embNLists, fpNew)
          }
          if (incremented) "incremental"
          else {
            TextDedup.buildLocked(spark, dir, out, minJaccard, maxDf, embNLists)
            "full"
          }
        }
      }
    }

  /** Diff the stored fingerprint against the current input: Some((new
    * doc files, new emb files)) when the change is PURELY additive and
    * the stored state is usable; None → full rebuild. */
  private def additionsOnlyDelta(dir: String, out: String, minJaccard: Double,
                                 maxDf: Int): Option[(Seq[java.io.File], Seq[java.io.File])] = {
    val marker = new java.io.File(out, "_FINGERPRINT").toPath
    if (java.nio.file.Files.exists(TextDedup.incJournal(out))) return None
    if (!java.nio.file.Files.exists(marker)) return None
    if (!TextDedup.artifactStages.forall(TextDedup.stageComplete(out, _)))
      return None
    val stored = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
      .linesIterator.toSeq
    // params or format differ → not diffable
    if (stored.headOption.getOrElse("") !=
        TextDedup.fingerprintHeader(minJaccard, maxDf)) return None
    def split(line: String): (String, String) = {
      // relpath may not contain ':' (parquet part names don't); the
      // LAST two fields are size:mtime
      val i = line.lastIndexOf(':'); val j = line.lastIndexOf(':', i - 1)
      (line.take(j), line.substring(j + 1))
    }
    val old = stored.drop(1).map(split).toMap
    val cur = TextDedup.inputDataFiles(dir)
      .map { case (rel, f) => rel -> (s"${f.length}:${f.lastModified}", f) }
      .toMap
    // every old file must still exist, byte-identical
    val intact = old.forall { case (rel, sig) =>
      cur.get(rel).exists(_._1 == sig) }
    if (!intact) return None
    val fresh = (cur.keySet -- old.keySet).toSeq.sorted
    if (fresh.isEmpty) return None // fingerprint differs but no additions: params/header edge
    val (docRel, rest) = fresh.partition(_.startsWith("documents.parquet/"))
    val (embRel, other) = rest.partition(_.startsWith("embeddings.parquet/"))
    if (other.nonEmpty) return None // a single-file table replaced by a dir, etc.
    Some((docRel.map(cur(_)._2), embRel.map(cur(_)._2)))
  }

  /** Run the guarded increment. Returns false — having written NOTHING
    * — when any validity guard fires. All guard probes read only the
    * compact staged state (ids, hashes, dfs), never base text or base
    * embeddings. */
  private def tryIncrement(spark: SparkSession, dir: String, out: String,
                           docFiles: Seq[java.io.File], embFiles: Seq[java.io.File],
                           minJaccard: Double, maxDf: Int, embNLists: Int,
                           fpNew: String): Boolean = {
    graft.functions.GraftFunctions.register(spark)
    val layout = s"$out/emb_probe_layout"

    // ---- plan + guard phase (no writes) ----
    val deltaDocs =
      if (docFiles.isEmpty) None
      else Some(spark.read.parquet(docFiles.map(_.toString): _*))
    val deltaEmb =
      if (embFiles.isEmpty) None
      else Some(spark.read.parquet(embFiles.map(_.toString): _*))

    // text guards + reusable delta frames (checkpointed: each is read
    // by several downstream joins, and all are delta-sized)
    val textState = deltaDocs.map { docs =>
      val deltaSh = TextDedup.shingles(docs)
        .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
        .localCheckpoint(true)
      val dfDelta = deltaSh.groupBy("shingle")
        .agg(count(lit(1)).as("df")).localCheckpoint(true)
      (docs, deltaSh, dfDelta)
    }
    for ((docs, _, dfDelta) <- textState) {
      val dfBase = TextDedup.readShingleDf(spark, out)
      val crossing = dfBase.toDF("shingle", "dfb")
        .join(dfDelta.toDF("shingle", "dfd"), "shingle")
        .filter(col("dfb") <= maxDf && col("dfb") + col("dfd") > maxDf)
      if (!crossing.isEmpty) return false // classification of base rows would change
      val collide = docs.select("doc_id")
        .join(TextDedup.readDocStats(spark, out), Seq("doc_id"), "left_semi")
      if (!collide.isEmpty) return false // an update, not an append
    }

    // embedding guards
    val geom = deltaEmb.flatMap(_ => VectorOps.readLayoutGeometry(layout))
    for (emb <- deltaEmb) {
      val (nLists, _) = geom.getOrElse(return false) // pre-geometry layout
      if (embNLists > 0 && embNLists != nLists) return false // different requested geometry
      if (!emb.filter(col("vec_id") < nLists).isEmpty) return false // would join the anchor set
      val collide = emb.select("vec_id")
        .join(spark.read.parquet(layout).select("vec_id"),
          Seq("vec_id"), "left_semi")
      if (!collide.isEmpty) return false
    }

    // ---- write phase (journaled) ----
    java.nio.file.Files.write(TextDedup.incJournal(out),
      fpNew.getBytes("UTF-8"))

    for ((_, deltaSh, dfDelta) <- textState) {
      val newPairs = deltaTextPairs(spark, out, deltaSh, dfDelta,
        minJaccard, maxDf).localCheckpoint(true)
      newPairs.write.mode("append").parquet(s"$out/pairs")
      swapIn(spark, s"$out/clusters",
        ConnectedComponents.mergeClusters(spark,
            TextDedup.stagedClusters(spark, out)
              .select("doc_id", "cluster_id", "cluster_size"),
            newPairs.select("doc_a", "doc_b"))
          .toDF("doc_id", "cluster_id", "cluster_size"))
      // state appends last: the pair computation above reads the
      // PRE-append index/df/stats
      deltaSh.write.mode("append").parquet(s"$out/shingle_index")
      dfDelta.write.mode("append").parquet(s"$out/shingle_df")
      deltaStatsOf(deltaSh, dfDelta, spark, out, maxDf)
        .write.mode("append").parquet(s"$out/doc_stats")
    }

    for (emb <- deltaEmb) {
      val (nLists, nprobe) = geom.get
      val anchors = VectorOps.anchorsOf(
        graft.Tables.embeddings(spark, dir), nLists)
      val deltaProbes = VectorOps.probeAssignmentsFrom(emb, anchors, nprobe)
        .localCheckpoint(true)
      val basePn = spark.read.parquet(layout)
        .select(col("vec_id"), col("embedding"),
          col("list_id").cast("long").as("list_id"))
      val newPairs = VectorOps.pairsBetweenProbes(deltaProbes, basePn, 0.4)
        .localCheckpoint(true)
      newPairs.write.mode("append").parquet(s"$out/emb_pairs")
      swapIn(spark, s"$out/emb_clusters",
        ConnectedComponents.mergeClusters(spark,
            spark.read.parquet(s"$out/emb_clusters")
              .select("vec_id", "cluster_id", "cluster_size"),
            newPairs.select("vec_a", "vec_b"))
          .toDF("vec_id", "cluster_id", "cluster_size"))
      deltaProbes.write.partitionBy("list_id").mode("append").parquet(layout)
    }

    // stage markers advance to the new fingerprint (so a subsequent
    // full-build call sees every stage current), then the fingerprint,
    // then the journal dies — strictly in that order
    for (s <- TextDedup.artifactStages)
      java.nio.file.Files.write(
        new java.io.File(out, s"_STAGE_$s").toPath, fpNew.getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(out, "_FINGERPRINT").toPath, fpNew.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(TextDedup.incJournal(out))
    true
  }

  /** Every text near-dup pair TOUCHING the delta, exact — the
    * incremental analogue of [[TextDedup.nearDupFromHashed]]. The key
    * observation making this delta-proportional: a NEW pair shares ≥1
    * shingle with a delta doc, and a shared shingle is BY DEFINITION
    * in the delta doc's set — so every join against staged state is
    * first restricted to the delta's shingle set (delta-sized), and
    * the only corpus-proportional work is the column-pruned scan of
    * the compact staged index feeding that restriction. df
    * classification uses MERGED dfs (staged partials + delta counts)
    * for delta rows and the STORED stats for base rows — identical to
    * a fresh rebuild's, because the no-crossing guard already proved
    * no base shingle changes class. */
  private def deltaTextPairs(spark: SparkSession, out: String,
                             deltaSh: DataFrame, dfDelta: DataFrame,
                             minJaccard: Double, maxDf: Int): DataFrame = {
    val baseIdx = TextDedup.readShingleIndex(spark, out)
    val baseStats = TextDedup.readDocStats(spark, out)
    // merged-corpus df for exactly the shingles the delta touches
    val dfNew = dfDelta.toDF("shingle", "dfd")
      .join(TextDedup.readShingleDf(spark, out).toDF("shingle", "dfb"),
        Seq("shingle"), "left")
      .select(col("shingle"),
        (col("dfd") + coalesce(col("dfb"), lit(0L))).as("df_new"))
    val deltaStats = deltaSh.join(dfNew, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("df_new") <= maxDf, 1L).otherwise(0L)).as("n_rare"))
    val rareShingles = dfNew.filter(col("df_new") <= maxDf).select("shingle")
    val rareDelta = deltaSh.join(rareShingles, "shingle")
      .join(deltaStats, "doc_id")
      .select(col("doc_id"), col("shingle"), col("n"),
        (col("n") - col("n_rare")).as("n_common"))
    val rareBase = baseIdx.join(rareShingles, "shingle")
      .join(baseStats, "doc_id")
      .select(col("doc_id"), col("shingle"), col("n"),
        (col("n") - col("n_rare")).as("n_common"))
    // counting join, two branches: delta × base (order-normalized with
    // the per-doc stats riding in structs) and delta × delta (a < b)
    def side(df: DataFrame) = df.select(col("shingle"),
      struct(col("doc_id").as("d"), col("n"), col("n_common").as("c")).as("s"))
    val cross = side(rareDelta).toDF("shingle", "x")
      .join(side(rareBase).toDF("shingle", "y"), Seq("shingle"))
      .select(
        when(col("x.d") < col("y.d"), col("x")).otherwise(col("y")).as("lo"),
        when(col("x.d") < col("y.d"), col("y")).otherwise(col("x")).as("hi"))
    val within = side(rareDelta).toDF("shingle", "x")
      .join(side(rareDelta).toDF("shingle", "y"), Seq("shingle"))
      .filter(col("x.d") < col("y.d"))
      .select(col("x").as("lo"), col("y").as("hi"))
    val counts = cross.unionByName(within)
      .groupBy(col("lo.d").as("doc_a"), col("hi.d").as("doc_b"),
        col("lo.n").as("na"), col("hi.n").as("nb"),
        col("lo.c").as("ca"), col("hi.c").as("cb"))
      .agg(count(lit(1)).as("c_rare"))
    // optimistic bound + exact correction over capped-out shingles —
    // the same two steps as nearDupFromHashed, with `common` likewise
    // restricted to the delta's shingle set (a shared common shingle
    // is in the delta doc too)
    val ub = counts
      .withColumn("ub_c", col("c_rare") + least(col("ca"), col("cb")))
      .filter(col("ub_c") * 1.0 / (col("na") + col("nb") - col("ub_c")) >= minJaccard)
    val commonShingles = dfNew.filter(col("df_new") > maxDf).select("shingle")
    val commonRows = deltaSh.join(commonShingles, "shingle")
      .unionByName(baseIdx.join(commonShingles, "shingle"))
      .select("doc_id", "shingle")
    val corr = ub.select("doc_a", "doc_b")
      .join(commonRows.toDF("doc_a", "shingle"), Seq("doc_a"))
      .join(commonRows.toDF("doc_b", "shingle"), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c_common"))
    ub.join(corr, Seq("doc_a", "doc_b"), "left")
      .withColumn("c", col("c_rare") + coalesce(col("c_common"), lit(0L)))
      .withColumn("jaccard_raw",
        col("c") * 1.0 / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard_raw") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        floorRound(col("jaccard_raw"), 4).as("jaccard"))
  }

  /** Per-delta-doc (n, n_rare) under MERGED dfs — the doc_stats append. */
  private def deltaStatsOf(deltaSh: DataFrame, dfDelta: DataFrame,
                           spark: SparkSession, out: String, maxDf: Int): DataFrame =
    deltaSh
      .join(dfDelta.toDF("shingle", "dfd")
          .join(TextDedup.readShingleDf(spark, out).toDF("shingle", "dfb"),
            Seq("shingle"), "left")
          .select(col("shingle"),
            (col("dfd") + coalesce(col("dfb"), lit(0L))).as("df_new")),
        "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("df_new") <= maxDf, 1L).otherwise(0L)).as("n_rare"))

  /** Replace a staged table with a new frame: write beside, delete,
    * rename. NOT atomic — the caller's journal covers the window (a
    * crash mid-swap → journal present → full rebuild). A direct
    * overwrite would be worse: Spark deletes the target before the
    * (lazy) plan reads it. */
  private def swapIn(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val tmp = path + "__new"
    df.write.mode("overwrite").parquet(tmp)
    graft.sources.Layout.deleteRec(new java.io.File(path))
    java.nio.file.Files.move(new java.io.File(tmp).toPath,
      new java.io.File(path).toPath)
  }
}
