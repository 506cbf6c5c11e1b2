package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Semantic properties of the mergeable-sketch family — the DuckDB
  * oracle pins the exact values; these pin the guarantees a user
  * relies on (one-sided error, supersets, error bounds) so a future
  * rewrite cannot silently trade them away. */
class SketchesSpec extends SparkSpec {

  test("CMS never undercounts, and is exact when lanes don't collide") {
    val rows = Sketches.cmsTopTerms(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, est) = (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_est"))
      assert(est >= exact, s"CMS undercounted ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
    // a wide sketch on the same corpus collides less: estimates can
    // only move toward exact
    val wide = Sketches.cmsTopTerms(spark, sf, width = 16384)
      .select(col("term"), col("cms_est").as("wide_est"))
    val narrow = Sketches.cmsTopTerms(spark, sf)
      .join(wide, "term")
      .filter(col("wide_est") > col("cms_est"))
    assert(narrow.count() == 0, "widening the sketch increased an estimate")
  }

  test("Bloom hits are a superset of exact containment per doc") {
    val rows = Sketches.bloomContamination(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_exact_hits"),
        s"bloom missed a true member for doc ${r.get(0)}")
      assert(r.getAs[Long]("n_bloom_hits") <= r.getAs[Long]("n_grams"))
    }
    // the filter admits every true member by construction; the docs
    // with exact hits must all be present among the flagged
    val flagged = Sketches.bloomContamination(spark, sf)
      .filter(col("n_exact_hits") > 0).count()
    assert(flagged > 0, "synthetic corpus should have cross-split duplicates")
  }

  test("bloomProbe: probing with a smaller mWords than the bitmap was " +
      "built with fails loudly, naming the mismatch") {
    import spark.implicits._
    val keys = Seq("a b", "c d", "e f").toDF("k")
    val bitmap = Sketches.bloomWords(keys, col("k"), mWords = 1024)
    val e = intercept[IllegalArgumentException] {
      Sketches.bloomProbe(keys, col("k"), bitmap, mWords = 8)
    }
    assert(e.getMessage.contains("word_idx") && e.getMessage.contains("8"),
      e.getMessage)
    // matching mWords still probes cleanly
    val ok = Sketches.bloomProbe(keys, col("k"), bitmap, mWords = 1024)
      .collect()
    assert(ok.forall(_.getAs[Int]("maybe") == 1))
  }

  test("bloomProbe: probing with a LARGER mWords than the build's fails " +
      "loudly too — the round-14 silent-false-negative direction") {
    import spark.implicits._
    val keys = Seq("a b", "c d", "e f").toDF("k")
    // a small-geometry build passes every bounds check under a larger
    // probe; only the metadata row can catch it
    val bitmap = Sketches.bloomWords(keys, col("k"), mWords = 8)
    val e = intercept[IllegalArgumentException] {
      Sketches.bloomProbe(keys, col("k"), bitmap, mWords = 1024)
    }
    assert(e.getMessage.contains("mWords=8") &&
      e.getMessage.contains("mWords=1024"), e.getMessage)
    // a bitmap stripped of its metadata row is rejected outright
    // rather than probed under assumed geometry
    val stripped = bitmap.filter(col("word_idx") =!= -1L)
    val e2 = intercept[IllegalArgumentException] {
      Sketches.bloomProbe(keys, col("k"), stripped, mWords = 8)
    }
    assert(e2.getMessage.contains("metadata"), e2.getMessage)
    // OR-merging two same-geometry partials keeps the metadata row
    // intact and probes cleanly (the streaming-MV merge discipline)
    val merged = Sketches.bloomWords(Seq("a b").toDF("k"), col("k"), mWords = 8)
      .unionByName(Sketches.bloomWords(Seq("c d").toDF("k"), col("k"), mWords = 8))
      .groupBy("word_idx")
      .agg(org.apache.spark.sql.functions.bit_or(col("bits")).as("bits"))
    val ok = Sketches.bloomProbe(Seq("a b", "c d").toDF("k"), col("k"),
      merged, mWords = 8).collect()
    assert(ok.forall(_.getAs[Int]("maybe") == 1))
  }

  test("KMV overlap estimates are error-bounded against exact Jaccard") {
    val est = Sketches.kmvTypeOverlap(spark, sf, k = 128)
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
    val a = e.select(col("event_type").as("type_a"), col("user_id"))
    val b = e.select(col("event_type").as("type_b"), col("user_id"))
    val exact = a.join(b, "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_inter"))
    val sizes = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val joined = est
      .join(exact, Seq("type_a", "type_b"), "left")
      .join(sizes.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "na"), "type_a")
      .join(sizes.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "nb"), "type_b")
      .withColumn("n_union_exact",
        col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))
      .withColumn("jacc_exact",
        coalesce(col("n_inter"), lit(0L)).cast("double") / col("n_union_exact"))
      .collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      // SE ≈ 1/√(k−2) ≈ 9% at k=128; allow 4 SE on the union estimate
      val (eu, nu) = (r.getAs[Double]("est_union"), r.getAs[Long]("n_union_exact"))
      assert(math.abs(eu - nu) <= math.max(4 * nu / math.sqrt(126.0), 4.0),
        s"union estimate $eu vs exact $nu for ${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}")
      // Jaccard is a ratio of two sketch reads; give it a wider band
      val (ej, xj) = (r.getAs[Double]("est_jaccard"), r.getAs[Double]("jacc_exact"))
      assert(math.abs(ej - xj) <= 0.35,
        s"jaccard estimate $ej vs exact $xj for ${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}")
    }
  }

  /** md5-low64 of a string, driver-side — mirrors OracleHash.low64
    * (last 8 digest bytes, big-endian). */
  private def low64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 8, 8).getLong
  }

  test("quantile sketch: full driver recompute (sample membership, both quantile sides)") {
    val events = Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def typeOne(vs: Seq[(Double, Long)], qNum: Int, qDen: Int): Double = {
      val sorted = vs.sortBy(identity)
      val idx = math.max((qNum.toLong * sorted.size + qDen - 1) / qDen, 1L)
      sorted(idx.toInt - 1)._1
    }
    val want = events.groupBy(_._1).map { case (tpe, rows) =>
      val sample = rows.sortBy(r => (low64(r._2.toString), r._2)).take(256)
      val sVs = sample.map(r => (r._3, r._2)).toSeq
      val eVs = rows.map(r => (r._3, r._2)).toSeq
      (tpe, (rows.size.toLong, sample.size.toLong,
        typeOne(sVs, 1, 2), typeOne(sVs, 9, 10), typeOne(sVs, 99, 100),
        typeOne(eVs, 1, 2), typeOne(eVs, 9, 10), typeOne(eVs, 99, 100)))
    }
    val got = Sketches.quantileSketch(spark, sf).collect().map { r =>
      (r.getAs[String]("event_type"),
        (r.getAs[Long]("n"), r.getAs[Long]("n_sample"),
          r.getAs[Double]("est_p50"), r.getAs[Double]("est_p90"), r.getAs[Double]("est_p99"),
          r.getAs[Double]("exact_p50"), r.getAs[Double]("exact_p90"), r.getAs[Double]("exact_p99")))
    }.toMap
    assert(got.keySet == want.keySet)
    for ((tpe, w) <- want) assert(got(tpe) == w, s"type $tpe")
  }

  test("quantile sketch sample merges: bottom-k of shard partials == direct sketch") {
    // the mergeability claim, executed: split the log in two by
    // event_id parity, keep each shard's bottom-k, merge, re-cut at k
    // — membership must equal the single-pass sample
    val events = Tables.events(spark, sf)
      .select("event_id").collect().map(_.getLong(0))
    val ranked = events.map(id => (low64(id.toString), id)).sortBy(identity)
    val direct = ranked.take(256).map(_._2).toSet
    val merged = (events.filter(_ % 2 == 0).map(id => (low64(id.toString), id)).sortBy(identity).take(256) ++
      events.filter(_ % 2 == 1).map(id => (low64(id.toString), id)).sortBy(identity).take(256))
      .sortBy(identity).take(256).map(_._2).toSet
    assert(direct == merged)
  }

  test("source overlap: jaccard in [0,1], union >= each side within rounding") {
    val rows = Sketches.sourceShingleOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      val (ea, eb, eu) = (r.getAs[Double]("est_shingles_a"),
        r.getAs[Double]("est_shingles_b"), r.getAs[Double]("est_union"))
      assert(eu + 0.01 >= math.max(ea, eb) - math.max(ea, eb) * 0.2,
        s"union $eu far below max side ${math.max(ea, eb)}")
      assert(r.getAs[Double]("est_intersection") <= eu + 0.01)
    }
  }
}
