package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipes.{CdcPipes, TpchPipes, UsersPipes}
import graft.operators.{TextAnalysis, TrainingMix}

/** Specs for the round-4 extension operators: SCD2 history, the
  * correlated-subquery TPC-H shapes (Q4/Q17), sliding 7-day distinct,
  * deterministic per-group sampling, LM-score terciles. Each checks
  * the registered query against an independent formulation (Spark SQL
  * correlated subqueries, driver-side recomputes, or cross-endpoint
  * consistency). */
class ExtensionOpsSpec extends SparkSpec {

  private lazy val cdcDir: String = {
    val d = Files.createTempDirectory("graftscd2").toString
    graft.fixtures.CdcFixtures.writeAll(spark, graft.fixtures.CdcFixtures.generate(), d)
    d
  }

  test("KMV sketch: JVM recompute matches both endpoints; merge identity; error bounded") {
    val k = 64
    def low64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (8 until 16).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
    }
    def estimate(hashes: Set[Long]): Double = {
      val x =
        if (hashes.size < k) hashes.size.toDouble
        else {
          val hk = hashes.toSeq.sorted.apply(k - 1)
          (k - 1).toDouble / ((hk.toDouble + 9.223372036854776e18) / 1.8446744073709552e19)
        }
      math.floor(x * 100 + 0.5) / 100
    }
    val rows = graft.Tables.events(spark, sf).select("ts", "user_id").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), low64(r.get(1).toString)))
    val cutoff = rows.map(_._1).max.minusDays(30)
    val inWindow = rows.filter(_._1.isAfter(cutoff))
    val byHour = inWindow
      .groupBy(t => t._1.truncatedTo(java.time.temporal.ChronoUnit.HOURS))
      .view.mapValues(_.map(_._2).toSet).toMap
    // hourly endpoint == JVM recompute, bit for bit
    val gotHourly = CdcPipes.activeUsersKmvPerHour(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getDouble(1)).toMap
    assert(gotHourly.keySet == byHour.keySet)
    gotHourly.foreach { case (h, est) =>
      assert(est == estimate(byHour(h)), s"hour $h") }
    // merge identity: the daily endpoint (computed ONLY from hourly
    // kept partials) equals the direct day-level sketch exactly
    val byDay = inWindow
      .groupBy(t => t._1.truncatedTo(java.time.temporal.ChronoUnit.DAYS))
      .view.mapValues(_.map(_._2).toSet).toMap
    val gotDaily = CdcPipes.activeUsersKmvDailyMerge(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getDouble(1)).toMap
    assert(gotDaily.keySet == byDay.keySet)
    gotDaily.foreach { case (d, est) =>
      assert(est == estimate(byDay(d)), s"day $d") }
    // estimator accuracy where the sketch actually estimates
    byDay.filter(_._2.size >= k).foreach { case (d, hs) =>
      val exact = hs.size.toDouble
      assert(math.abs(gotDaily(d) - exact) / exact <= 0.6,
        s"day $d: est ${gotDaily(d)} vs exact $exact")
    }
  }

  test("temperature mix: JVM recompute of the exact selection; low-resource boosted") {
    def low64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (8 until 16).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
    }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nS = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // integer-unit Σ√n, mirroring the operator: order-free exact sum
    val sumSqrt =
      nS.values.map(n => math.floor(math.sqrt(n.toDouble) * 1e6).toLong).sum / 1e6
    def p(s: String): Double =
      math.min(1.0, 300.0 * math.sqrt(nS(s).toDouble) / sumSqrt / nS(s))
    val want = docs.filter { case (id, s) =>
      val u = (low64(id.toString).toDouble + 9.223372036854776e18) / 1.8446744073709552e19
      u < p(s)
    }.map(_._1).toSet
    val got = TrainingMix.temperatureMix(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == want, s"selection must be the exact deterministic set " +
      s"(got ${got.size}, want ${want.size})")
    // the temperature's purpose: every source's sampling PROBABILITY
    // rises as its share falls (p ∝ 1/√n_s)
    val bySize = nS.toSeq.sortBy(_._2)
    bySize.sliding(2).foreach { case Seq((s1, n1), (s2, n2)) =>
      if (n1 < n2) assert(p(s1) >= p(s2), s"$s1($n1) vs $s2($n2)")
    }
  }

  test("usersScd2: contiguous versions, chained intervals, one current row per id") {
    val rows = UsersPipes.usersScd2(spark, cdcDir)
      .select("id", "version", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getAs[java.time.LocalDateTime](2),
        Option(r.getAs[java.time.LocalDateTime](3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to vs.length), s"id $id versions not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"id $id: valid_to of v${a._2} != valid_from of v${b._2}")
        case _ => ()
      }
      assert(sorted.count(_._5) == 1, s"id $id: not exactly one current row")
      assert(sorted.last._5 && sorted.last._4.isEmpty, s"id $id: current row malformed")
      sorted.filter(_._4.isDefined).foreach { v =>
        assert(v._3.isBefore(v._4.get), s"id $id v${v._2}: empty/negative interval")
      }
    }
  }

  test("usersScd2 current version agrees with the RMT latest-state endpoint") {
    val current = UsersPipes.usersScd2(spark, cdcDir)
      .filter(col("is_current"))
      .select("id", "name", "email", "deleted", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getAs[java.time.LocalDateTime](4))).toSet
    val rmt = UsersPipes.usersApiRmt(spark, cdcDir)
      .select("id", "name", "email", "deleted", "updated_at")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getAs[java.time.LocalDateTime](4))).toSet
    assert(current == rmt)
  }

  test("q4: decorrelated semi join equals the literal EXISTS subquery") {
    Tables.orders(spark, sf).createOrReplaceTempView("t_orders")
    Tables.lineitem(spark, sf).createOrReplaceTempView("t_lineitem")
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM t_orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM t_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = TpchPipes.q4OrderPriority(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaDf == viaSql && viaDf.nonEmpty)
  }

  test("q17: integer 0.2*avg rule matches a driver-side recompute") {
    val parts = Tables.part(spark, sf).filter(col("p_brand") === "Brand#13")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .filter(t => parts.contains(t._1))
    val stats = lines.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.map(_._2).sum, vs.length.toLong) }
    val kept = lines.filter { case (k, qc, _) =>
      val (sumQc, n) = stats(k); qc * n * 5 < sumQc }
    val wantLines = kept.length.toLong
    val wantAvg = kept.map(_._3).sum / 700.0
    val got = TpchPipes.q17SmallQuantityRevenue(spark, sf).collect()(0)
    assert(got.getLong(0) == wantLines && wantLines > 0)
    assert(got.getDouble(1) == wantAvg)
  }

  test("7-day sliding distinct matches a per-day window recompute") {
    val pairs = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    implicit val dayOrd: Ordering[java.time.LocalDate] =
      Ordering.by(_.toEpochDay)
    val maxDay = pairs.map(_._1).max
    val allDays = pairs.map(_._1).distinct
      .flatMap(d => (0 to 6).map(i => d.plusDays(i.toLong)))
      .distinct.filter(!_.isAfter(maxDay)).sorted
    val expect = allDays.map { d =>
      d -> pairs.filter(p => !p._1.isAfter(d) && !p._1.isBefore(d.minusDays(6)))
        .map(_._2).distinct.length.toLong
    }.toMap
    val got = CdcPipes.activeUsers7dSliding(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).toLocalDate -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("per-source sample picks exactly the k smallest md5 rank keys") {
    val k = 10
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def key(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes)
      d.map("%02x".format(_)).mkString
    }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (key(r._2), r._2)).take(k)
        .zipWithIndex.map { case ((_, id), i) => (src, i + 1, id) }.toSeq
    }.toSet
    val got = TrainingMix.samplePerSource(spark, sf, k)
      .select("source", "rank_in_source", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("LM terciles: balanced per language and score-ordered") {
    val rows = TextAnalysis.lmBuckets(spark, sf)
      .select("lang", "lm_score", "bucket").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, vs) =>
      val byBucket = vs.groupBy(_._3).view.mapValues(_.length).toMap
      val counts = Seq("head", "middle", "tail").map(byBucket.getOrElse(_, 0))
      assert(counts.max - counts.min <= 1, s"$lang tercile skew: $counts")
      def scores(b: String) = vs.filter(_._3 == b).map(_._2)
      for (Seq(hi, lo) <- Seq("head", "middle", "tail").sliding(2)
           if scores(hi).nonEmpty && scores(lo).nonEmpty)
        assert(scores(hi).min >= scores(lo).max,
          s"$lang: $hi scores below $lo")
    }
  }
  test("PQ codes: anchors self-code and a driver recompute agrees") {
    val emb = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_._1)
    val anchors = emb.filter(_._1 < 16)
    def code(v: Array[Float]): Long = {
      (0 until 8).map { sub =>
        val best = anchors.map { case (c, a) =>
          var d = 0.0
          var i = sub * 8
          while (i < sub * 8 + 8) {
            val t = v(i).toDouble - a(i).toDouble; d += t * t; i += 1
          }
          (math.floor(d * 1e6 + 0.5) / 1e6, c)
        }.min
        best._2 << (4 * sub)
      }.sum
    }
    val want = emb.map { case (id, v) => (id, code(v)) }.toSeq
    val got = operators.VectorOps.pqCodes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(got == want)
    // every anchor's 8 subspace distances to itself are 0 -> code c in
    // every lane
    anchors.foreach { case (c, _) =>
      val packed = (0 until 8).map(s => c << (4 * s)).sum
      assert(got(c.toInt)._2 == packed, s"anchor $c should self-code")
    }
  }
  test("PQ ADC search: driver recompute agrees; ranking beats chance") {
    val emb = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val anchors = emb.filter(_._1 < 16)
    def subUnits(v: Array[Float], a: Array[Float], s: Int): Long = {
      var d = 0.0; var i = s * 8
      while (i < s * 8 + 8) { val t = v(i).toDouble - a(i).toDouble; d += t * t; i += 1 }
      math.floor((math.floor(d * 1e6 + 0.5) / 1e6) * 1e6 + 0.5).toLong
    }
    val codes = emb.map { case (id, v) =>
      id -> (0 until 8).map { s =>
        anchors.map { case (c, a) => (subUnits(v, a, s), c) }.min._2
      }
    }.toMap
    val queries = emb.filter(_._1 < 20)
    val want = queries.flatMap { case (qid, qv) =>
      val lut = anchors.map { case (c, a) =>
        c -> (0 until 8).map(s => subUnits(qv, a, s)) }.toMap
      emb.filter(_._1 != qid).map { case (nid, _) =>
        val units = (0 until 8).map(s => lut(codes(nid)(s).toLong)(s)).sum
        (qid, nid, units / 1e6)
      }.sortBy(t => (t._3, t._2)).take(5)
        .zipWithIndex.map { case ((q, n, d), i) => (q, n, d, i + 1) }
    }.toSeq.sortBy(t => (t._1, t._4))
    val got = operators.VectorOps.knnPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want)
    // uniform-random vectors are PQ's worst case (no cluster structure
    // for the codebook to exploit), so top-1 recall is not asserted;
    // the load-bearing property is that ADC ranking beats chance: the
    // TRUE distance of the ADC-top-5 must average below the corpus mean
    // for nearly every query
    def trueDist(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < 64) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
      d
    }
    val byId = emb.toMap
    val better = queries.count { case (qid, qv) =>
      val all = emb.filter(_._1 != qid).map(e => trueDist(qv, e._2))
      val top = got.filter(_._1 == qid).map(t => trueDist(qv, byId(t._2)))
      top.sum / top.size < all.sum / all.size
    }
    assert(better >= queries.length - 2, s"ADC beat chance for only $better/${queries.length} queries")
  }
  test("IVF-PQ search: candidates honor the probe set; ADC matches the PQ half") {
    val got = operators.VectorOps.knnIvfPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // every neighbor must live in one of its query's probed lists —
    // recompute assignment + probes from the shared convention
    val emb = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val anchors = emb.filter(_._1 < 8)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < 64) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }
    val assign = emb.map { case (id, v) =>
      id -> anchors.map { case (l, a) => (-dot(v, a), l) }.min._2 }.toMap
    val probes = emb.filter(_._1 < 20).map { case (id, v) =>
      id -> anchors.map { case (l, a) => (-dot(v, a), l) }.sorted.take(3)
        .map(_._2).toSet }.toMap
    got.foreach { case (q, n, _) =>
      assert(probes(q).contains(assign(n)),
        s"neighbor $n of query $q outside the probed lists") }
    // ADC value consistency with the unpruned PQ search where both
    // rank the same pair
    val pq = operators.VectorOps.knnPq(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val shared = got.flatMap { case (q, n, d) => pq.get((q, n)).map(d2 => (d, d2)) }
    assert(shared.nonEmpty && shared.forall { case (a, b) => a == b })
  }
  test("diverse top-k: per-source cap respected, global order correct") {
    val rows = TrainingMix.topQualityDiverse(spark, sf, k = 20, perSource = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getDouble(4), r.getInt(5)))
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    rows.groupBy(_._3).foreach { case (src, vs) =>
      assert(vs.length <= 3, s"source $src over the cap") }
    // global order: quality non-increasing, doc_id ascending on ties
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2))
      case _ => ()
    }
  }
  test("dedup rewrite: losers lose exactly their widest span, winners untouched") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val spans = operators.TextDedup.substringSpans(spark, sf)
      .filter(col("span_chars") >= 40)
      .select("doc_b", "span_start_b", "span_chars").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val widest = spans.groupBy(_._1).map { case (id, vs) =>
      id -> vs.map(v => (v._2, v._3)).minBy { case (st, ch) => (-ch, st) } }
    val got = operators.TextDedup.dedupRewrite(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(4)))
    assert(got.length == docs.size)
    got.foreach { case (id, text, wasCut) =>
      widest.get(id) match {
        case None =>
          assert(!wasCut && text == docs(id), s"doc $id should be untouched")
        case Some((st, ch)) =>
          val t = docs(id)
          assert(wasCut && text == t.substring(0, st) + t.substring(st + ch),
            s"doc $id cut mismatch")
      }
    }
    assert(widest.nonEmpty, "fixture should contain at least one losing span")
  }
  test("pivot/unpivot round-trip recovers the grouped counts") {
    val long = TpchPipes.ordersUnpivot(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val want = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // unpivot emits explicit zeros for absent combos; want omits them
    want.foreach { case (k, v) => assert(long(k) == v, s"$k") }
    long.filterNot(kv => want.contains(kv._1)).values.foreach(v => assert(v == 0L))
  }
}
