package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, VectorOps}

/** Invariants of the profiling / funnel / ANN-evaluation operators —
  * the oracle pins exact values, these pin the meaning. */
class ProfileSpec extends SparkSpec {

  test("docs_profile: key uniqueness, zero nulls, consistent row counts") {
    val rows = Profile.docsProfile(spark, sf).collect()
    assert(rows.map(_.getAs[String]("column_name")).toSet ==
      Set("doc_id", "text", "lang", "source", "n_chars"))
    val nRows = rows.head.getAs[Long]("n_rows")
    assert(rows.forall(_.getAs[Long]("n_rows") == nRows))
    val byCol = rows.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol("doc_id").getAs[Long]("n_distinct") == nRows, "doc_id must be unique")
    assert(byCol("doc_id").getAs[Long]("n_nulls") == 0L)
    // min/max render numerically for the int columns
    assert(byCol("n_chars").getAs[String]("min_value").toLong <=
      byCol("n_chars").getAs[String]("max_value").toLong)
    for (r <- rows) assert(r.getAs[Long]("n_distinct") <= nRows - r.getAs[Long]("n_nulls"))
  }

  test("docs_profile plan: one pass over the table (a single parquet scan)") {
    val p = Profile.docsProfile(spark, sf).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("pipeline funnel: stages only shrink, totals reconcile") {
    val rows = Profile.pipelineFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (raw, lang, q, canon) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_lang_ok"),
        r.getAs[Long]("n_quality_ok"), r.getAs[Long]("n_canonical"))
      assert(raw >= lang && lang >= q && q >= canon, s"funnel grew at ${r.get(0)}")
      assert((canon > 0) == (r.getAs[Long]("canonical_tokens") > 0))
    }
    val total = rows.map(_.getAs[Long]("n_raw")).sum
    assert(total == graft.Tables.documents(spark, sf).count())
  }

  test("funnel canonical counts match exact dedup run on the quality-passed set") {
    val d = graft.Tables.documents(spark, sf)
    val nTok = length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
    val enM = expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))")
    val th = (length(col("text")) - length(regexp_replace(col("text"), "th", ""))) / 2
    val the = (length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3
    val langOk = (enM * 20 >= nTok && th > 0) || (enM + the > 0)
    val qOk = d.filter(langOk &&
      graft.functions.ChFunctions.floorRound(
        expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))").cast("double") /
          nTok, 4) >= 0.03)
    val expected = qOk.groupBy(md5(col("text"))).agg(count(lit(1))).count()
    val got = Profile.pipelineFunnel(spark, sf)
      .agg(sum(col("n_canonical"))).collect()(0).getLong(0)
    assert(got == expected, "canonical stage must equal distinct digests of the filtered set")
  }

  test("DSIR weights: target-heavy buckets score above raw, selection is 20% per source") {
    import graft.operators.TrainingMix
    val rows = TrainingMix.dsirWeights(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    // per-source selection quota: floor-of-threshold semantics, rn*100 <= 20*n
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sel = rs.count(_.getAs[Boolean]("selected"))
      assert(sel == rs.length * 20 / 100, s"quota drift at $src: $sel of ${rs.length}")
    }
    // a selected doc never scores below an unselected one of the same source
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val selMin = rs.filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("score_per_feat"))
      val unsMax = rs.filterNot(_.getAs[Boolean]("selected")).map(_.getAs[Long]("score_per_feat"))
      if (selMin.nonEmpty && unsMax.nonEmpty) assert(selMin.min >= unsMax.max)
    }
    // scores are per-feature normalized sums of positive bucket weights
    for (r <- rows if r.getAs[Long]("n_feats") > 0)
      assert(r.getAs[Long]("score") > 0 && r.getAs[Long]("score_per_feat") >= 0)
  }

  test("ANN recall: bounded, consistent with hits, and the index finds something") {
    val rows = VectorOps.annRecall(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val (n, h, rec) = (r.getAs[Long]("n_truth"), r.getAs[Long]("hits"),
        r.getAs[Double]("recall_at_k"))
      assert(n == 5L)
      assert(h >= 0L && h <= n)
      assert(math.abs(rec - math.floor(h.toDouble / n * 10000 + 0.5) / 10000.0) < 1e-12)
    }
    assert(rows.map(_.getAs[Long]("hits")).sum > 0, "LSH recalled nothing at all")
  }
}
