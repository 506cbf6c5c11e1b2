package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{DedupMaintenance, TextDedup, VectorOps}

/** Incremental artifact maintenance (DedupMaintenance.update): an
  * append-only input change must update every staged artifact to a
  * state IDENTICAL to a full rebuild over the merged input, at
  * delta-proportional cost; any input change the increment cannot
  * prove safe must take the full-rebuild path, never bend
  * correctness. */
class DedupMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // ---- synthetic corpus with engineered duplicates ----
  // texts: 25 unique words per doc; a near-dup copies a text and
  // replaces the last 2 words (3-gram jaccard ≈ 0.7)
  private def words(tag: String) =
    (0 until 25).map(j => s"w${tag}_$j").mkString(" ")
  private def nearText(tag: String) =
    (0 until 23).map(j => s"w${tag}_$j").mkString(" ") + " zz1 zz2"
  // embeddings: seeded unit vectors; a near-dup is a perturbed copy
  private def vec(seed: Long): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.fill(64)(r.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }
  private def near(base: Array[Float], seed: Long): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = base.map(x => x + 0.05f * r.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def baseDocs: Seq[(Long, String)] =
    (0L until 40L).map(i => // doc 6 is a near-dup of doc 5 (base-internal pair)
      if (i == 6L) i -> nearText("5") else i -> words(i.toString))
  private def deltaDocs: Seq[(Long, String)] = Seq(
    100L -> nearText("7"),   // delta × base pair (7, 100)
    101L -> words("d101"),
    102L -> nearText("d101") // delta × delta pair (101, 102)
  ) ++ (103L to 109L).map(i => i -> words(i.toString))

  private def baseEmbFixed: Seq[(Long, Array[Float], Int)] =
    (0L until 39L).map(i => (i, vec(i), 0)) :+
      ((39L, near(vec(20), 901L), 0)) // base-internal near pair (20, 39)
  private def deltaEmb: Seq[(Long, Array[Float], Int)] = Seq(
    (100L, near(vec(7), 902L), 0),        // delta × base pair (7, 100)
    (101L, near(near(vec(7), 902L), 903L), 0) // delta × delta pair (100, 101)
  ) ++ (103L to 109L).map(i => (i, vec(i + 500), 0))

  private def writeBase(dir: String): Unit = {
    baseDocs.toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    baseEmbFixed.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }
  private def appendDelta(dir: String): Unit = {
    deltaDocs.toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    deltaEmb.toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Every artifact surface compared between two staged dirs. */
  private def assertArtifactsEqual(a: String, b: String): Unit = {
    for (t <- Seq("pairs", "clusters", "emb_pairs", "emb_clusters")) {
      assert(rows(spark.read.parquet(s"$a/$t")) ==
        rows(spark.read.parquet(s"$b/$t")), s"artifact $t differs")
    }
    assert(rows(spark.read.parquet(s"$a/emb_probe_layout")
        .selectExpr("vec_id", "cast(list_id as long) as list_id")) ==
      rows(spark.read.parquet(s"$b/emb_probe_layout")
        .selectExpr("vec_id", "cast(list_id as long) as list_id")),
      "probe layout assignment differs")
    assert(rows(TextDedup.readShingleDf(spark, a)) ==
      rows(TextDedup.readShingleDf(spark, b)), "summed shingle_df differs")
    assert(rows(TextDedup.readDocStats(spark, a)) ==
      rows(TextDedup.readDocStats(spark, b)), "doc_stats differs")
    assert(rows(TextDedup.readShingleIndex(spark, a)) ==
      rows(TextDedup.readShingleIndex(spark, b)), "shingle_index differs")
  }

  test("incremental(base+delta) equals full-rebuild(base∪delta) on every " +
      "artifact, then skips") {
    val data = tmp("dm_data"); val art = tmp("dm_art")
    writeBase(data)
    assert(DedupMaintenance.update(spark, data, art) == "full")
    appendDelta(data)
    assert(DedupMaintenance.update(spark, data, art) == "incremental")
    assert(TextDedup.artifactsCurrent(data, art))
    // the engineered pairs actually exist and cross the delta boundary
    val pairs = spark.read.parquet(s"$art/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 6L)), s"base pair missing: $pairs")
    assert(pairs.contains((7L, 100L)), s"delta×base pair missing: $pairs")
    assert(pairs.contains((101L, 102L)), s"delta×delta pair missing: $pairs")
    val epairs = spark.read.parquet(s"$art/emb_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(epairs.contains((20L, 39L)), s"base emb pair missing: $epairs")
    assert(epairs.contains((7L, 100L)), s"delta×base emb pair missing: $epairs")
    assert(epairs.contains((100L, 101L)), s"delta×delta emb pair missing: $epairs")
    // the merged (7,100,101) emb component must have ONE label = min id 7
    val eclust = spark.read.parquet(s"$art/emb_clusters")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(eclust(100L)._1 == eclust(7L)._1 && eclust(101L)._1 == eclust(7L)._1)
    // identity vs a fresh full rebuild at the layout's pinned geometry
    val l = VectorOps.readLayoutGeometry(s"$art/emb_probe_layout").get._1
    val art2 = tmp("dm_art2")
    TextDedup.writeDedupArtifacts(spark, data, art2, embNLists = l.toInt)
    assertArtifactsEqual(art, art2)
    // nothing changed since → skip
    assert(DedupMaintenance.update(spark, data, art) == "skip")
  }

  test("a crashed increment (journal present) forces the full-rebuild path " +
      "and marks the artifacts stale") {
    val data = tmp("dm_j_data"); val art = tmp("dm_j_art")
    writeBase(data)
    assert(DedupMaintenance.update(spark, data, art) == "full")
    appendDelta(data)
    java.nio.file.Files.write(
      new java.io.File(art, "_INC_JOURNAL").toPath, "crashed".getBytes)
    assert(!TextDedup.artifactsCurrent(data, art),
      "a journal must mark the artifacts stale")
    assert(DedupMaintenance.update(spark, data, art) == "full")
    assert(TextDedup.artifactsCurrent(data, art))
    assert(!java.nio.file.Files.exists(
      new java.io.File(art, "_INC_JOURNAL").toPath))
  }

  test("a MODIFIED pre-existing input file is not an append: full rebuild") {
    val data = tmp("dm_m_data"); val art = tmp("dm_m_art")
    writeBase(data)
    // snapshot the BASE file set before the append: the touched file
    // must be one the stored fingerprint knows (a freshly-appended
    // delta file is an addition whatever its mtime, and part-file
    // UUIDs make name order between base and delta files random)
    val baseFile = new java.io.File(s"$data/documents.parquet").listFiles()
      .filter(x => x.isFile && !x.getName.startsWith("_") && !x.getName.startsWith("."))
      .minBy(_.getName)
    assert(DedupMaintenance.update(spark, data, art) == "full")
    appendDelta(data)
    // touch it (mtime change = content no longer provably identical)
    assert(baseFile.setLastModified(baseFile.lastModified() + 60000))
    assert(DedupMaintenance.update(spark, data, art) == "full")
  }

  test("a df-cap crossing (base ≤ maxDf < merged) fires the guard: " +
      "full rebuild, never a stale classification") {
    val data = tmp("dm_x_data"); val art = tmp("dm_x_art")
    // two base docs share every shingle of `words("shared")` → df = 2;
    // maxDf = 2 classifies them rare. One more copy in the delta pushes
    // df to 3 > maxDf: base rows change class, so the stored doc_stats
    // and pair candidates are no longer rebuild-identical.
    (Seq(0L -> words("shared"), 1L -> words("shared")) ++
      (2L until 10L).map(i => i -> words(i.toString)))
      .toDF("doc_id", "text").write.parquet(s"$data/documents.parquet")
    baseEmbFixed.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$data/embeddings.parquet")
    assert(DedupMaintenance.update(spark, data, art, maxDf = 2) == "full")
    Seq(50L -> words("shared")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$data/documents.parquet")
    assert(DedupMaintenance.update(spark, data, art, maxDf = 2) == "full")
    // and the rebuilt artifacts equal a from-scratch build (the guard
    // fell back, it did not corrupt)
    val l = VectorOps.readLayoutGeometry(s"$art/emb_probe_layout").get._1
    val art2 = tmp("dm_x_art2")
    TextDedup.writeDedupArtifacts(spark, data, art2, maxDf = 2,
      embNLists = l.toInt)
    assertArtifactsEqual(art, art2)
  }

  test("a delta vec_id colliding with a stored vector is an update: full rebuild") {
    val data = tmp("dm_c_data"); val art = tmp("dm_c_art")
    writeBase(data)
    assert(DedupMaintenance.update(spark, data, art) == "full")
    Seq((3L, vec(777), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(s"$data/embeddings.parquet")
    assert(DedupMaintenance.update(spark, data, art) == "full")
  }

  test("real corpus (sf0.001): split-append increment equals the merged " +
      "full rebuild") {
    val data = tmp("dm_r_data"); val art = tmp("dm_r_art")
    Tables.documents(spark, sf).filter("doc_id < 450")
      .write.parquet(s"$data/documents.parquet")
    Tables.embeddings(spark, sf).filter("vec_id < 450")
      .write.parquet(s"$data/embeddings.parquet")
    assert(DedupMaintenance.update(spark, data, art) == "full")
    Tables.documents(spark, sf).filter("doc_id >= 450")
      .write.mode("append").parquet(s"$data/documents.parquet")
    Tables.embeddings(spark, sf).filter("vec_id >= 450")
      .write.mode("append").parquet(s"$data/embeddings.parquet")
    assert(DedupMaintenance.update(spark, data, art) == "incremental")
    val l = VectorOps.readLayoutGeometry(s"$art/emb_probe_layout").get._1
    val art2 = tmp("dm_r_art2")
    TextDedup.writeDedupArtifacts(spark, data, art2, embNLists = l.toInt)
    assertArtifactsEqual(art, art2)
    // geometry drift (round-11 advisory): the maintained layout stays
    // pinned at the 450-vector derivation (11 lists) while the merged
    // 500-vector corpus derives 12 — the registered auto-route must
    // fall back to the self-contained form rather than serve
    // index-pinned pairs under a stale schedule
    val derived = math.max(8L, math.ceil(math.sqrt(
      Tables.embeddings(spark, data).count().toDouble) / 2).toLong)
    assert(derived != l, s"fixture no longer drifts: pinned=$l derived=$derived")
    val auto = VectorOps.nearDupPairsAuto(spark, data, art)
    assert(!auto.inputFiles.exists(_.contains("emb_probe_layout")),
      "drifted geometry must not route through the layout")
  }
}
