package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Keyword retrieval over the document corpus — the search primitive a
  * training-data pipeline leans on for benchmark decontamination
  * triage, targeted corpus audits ("show me the docs that talk about
  * X"), and eval-set curation. Classic BM25 ranking, re-expressed so
  * the SCORE itself is deterministic across engines and therefore
  * hash-verifiable by the DuckDB oracle:
  *
  *  - idf uses the RATIONAL BM25 form (N − df + 0.5)/(df + 0.5), not
  *    log-idf: like [[TextAnalysis.topTermsPerDoc]]'s rational tf-idf,
  *    every step is an IEEE exactly-rounded +,−,×,÷ — bit-identical in
  *    any IEEE-754 engine — where transcendental log implementations
  *    may differ in the last ulp. Rational idf preserves BM25's
  *    ranking ORDER (it is monotone in df) — only the score scale
  *    changes, which callers don't contract on.
  *  - each term's partial score is floored to integer MICRO-units and
  *    the per-document total is a sum of LONGS — associative, so any
  *    partial-aggregation order (and any engine) produces the same
  *    total, where a raw double sum would be order-dependent in the
  *    last ulp.
  *
  * Materialization note (round-15 advisory): the `localCheckpoint`
  * calls here pin their candidate/vocabulary-bounded frames in
  * executor storage until the consuming DataFrame is GC'd, and a
  * non-reliable checkpoint is not recomputable on executor loss. Both
  * are deliberate single-process trade-offs (this engine's contract is
  * `local[n]`; the driver IS the executor): the pinned frames are
  * KB-scale by construction (≤ kCandidates rows / query-bounded
  * postings), and there is no executor to lose. A multi-executor
  * deployment of the long-lived API server would swap these for
  * `persist(MEMORY_AND_DISK)` + explicit unpersist after the serving
  * action, or a reliable checkpoint dir.
  *
  * Scale: the inverted-index probe without materializing the index —
  * postings are filtered to the query's terms AT THE SCAN (the filter
  * sits directly on the exploded token stream, before any exchange),
  * so the only shuffled data is the matching postings: one map-side-
  * combinable tf shuffle on (doc_id, term), a vocabulary-sized-in-
  * theory but query-bounded-in-practice df aggregate, and a top-k. The
  * corpus stats (N, avgdl) are a 1-row broadcast. At 100 TB the same
  * plan serves ad-hoc search; a standing search service would persist
  * the tf table bucketed by term ([[graft.sources.Layout.writeBucketed]])
  * and skip the scan entirely.
  */
object Search {

  val DefaultQuery = "spark vector join"

  /** BM25 constants. Every constant that reaches the arithmetic is
    * spelled as the SAME decimal literal in both engines (1.2, 2.2,
    * 0.25, 0.75): `K1 + 1.0` computed in Scala could round differently
    * from DuckDB parsing the literal "2.2", so the k1+1 numerator
    * factor is its own literal, never derived. */
  private val K1 = 1.2
  private val K1p1 = 2.2
  private val B = 0.75
  private val OneMinusB = 0.25

  /** The per-(doc, query-term) micro-unit BM25 partial — the one
    * arithmetic definition shared by operator and oracle docs. All
    * inputs arrive as doubles; the op ORDER below is mirrored
    * token-for-token in the oracle SQL so every intermediate rounds
    * identically. */
  private def termMicros(tf: Column, df: Column, nDocs: Column,
                         dl: Column, avgdl: Column): Column = {
    val idf = (nDocs - df + lit(0.5)) / (df + lit(0.5))
    val norm = lit(OneMinusB) + (lit(B) * dl) / avgdl
    val denom = tf + lit(K1) * norm
    floor(idf * ((tf * lit(K1p1)) / denom) * lit(1e6)).cast("long")
  }

  /** Top-`k` documents for a whitespace-tokenized query, BM25-ranked.
    * Output: rank, doc_id, lang, source, n_terms_matched,
    * score_micros (the exact long the rank is decided on) and its
    * double rendering. Ties break on doc_id ascending. */
  def bm25Search(spark: SparkSession, dir: String,
                 query: String = DefaultQuery, k: Int = 10): DataFrame = {
    val qTerms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(qTerms.nonEmpty, "bm25Search: empty query")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("t")).cast("long").as("dl"), col("t"))
    // 1-row corpus stats: N and avgdl (long sum / long count, divided
    // as doubles — exactly one IEEE division in both engines).
    // Round-16: dl without tokenizing — size(split(text, ' ')) equals
    // spaces + 1 EXACTLY (split keeps empty tokens, so every space is
    // a boundary; '' → 1 either way), and this scan needs only the
    // count, so two length() calls replace the per-doc token-array
    // allocation the old docs.agg paid.
    val stats = Tables.documents(spark, dir)
      .select((length(col("text")) -
        length(replace(col("text"), lit(" "), lit(""))) + 1)
        .cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    // postings restricted to the query BEFORE any exchange: the only
    // shuffled rows are matches
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(qTerms: _*))
    // tf feeds TWO consumers (the scored join and the df aggregate);
    // without materialization Catalyst expands the postings scan +
    // explode subtree once PER consumer — the plan carried the corpus
    // text scan twice (round-15 before-plan: ops (1)-(9) and (10)-(18)
    // are the same tf computation). localCheckpoint pins the
    // query-bounded frame (only matching postings — the inverted-index
    // slice a search engine materializes anyway) so the corpus is
    // scanned once for it at any scale.
    val tf = postings.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // df per query term — ≤ |query| rows; un-hinted join (AQE
    // broadcasts a frame this small on its own)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("term_micros", termMicros(
        col("tf").cast("double"), col("df").cast("double"),
        col("n_docs").cast("double"), col("dl").cast("double"), col("avgdl")))
      .groupBy("doc_id")
      .agg(sum(col("term_micros")).as("score_micros"),
        count(lit(1)).as("n_terms_matched"))
    scored
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micros").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"),
        col("n_terms_matched"), col("score_micros"),
        (col("score_micros").cast("double") / lit(1e6)).as("score"))
      .orderBy("rank")
  }

  /** Two-stage retrieval — the production search shape: a cheap
    * recall stage (BM25 over the scan-filtered postings, top
    * `kCandidates`) followed by an exact re-scoring stage over ONLY
    * the candidates (full-vector TF-IDF cosine between the query and
    * each candidate document, the [[TextAnalysis.tfidfPairs]] weight
    * discipline: capped-tf × capped rational-idf integer units, long
    * dot/norm sums, one IEEE division). Final order ranks on the
    * ROUNDED cosine with BM25-then-id tiebreaks, so the published
    * ranking is engine-reproducible.
    *
    * Scale: stage 1 is [[bm25Search]]'s plan; stage 2's frames are all
    * candidate-bounded — candidate term vectors via a broadcast
    * semi-join of the token stream (≤ kCandidates docs' tokens
    * shuffle), corpus df computed ONLY for the candidate∪query term
    * set (broadcast term-set join before the df aggregate), query
    * vector and corpus stats 1-row/≤|terms| broadcasts. The rerank
    * never materializes a corpus-sized vector table — that's the point
    * of staging at 100 TB. */
  def bm25Rerank(spark: SparkSession, dir: String,
                 query: String = DefaultQuery,
                 kCandidates: Int = 50, k: Int = 10): DataFrame = {
    val qTerms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(qTerms.nonEmpty, "bm25Rerank: empty query")
    // the recall pool is ≤ kCandidates rows — materialize it so the
    // whole BM25 subtree (3 corpus scans) appears ONCE in the rerank
    // plan instead of once per downstream reference (round-15
    // before-plan: 84 scan nodes / 2448 plan lines, because cands,
    // dvec and the final join each re-expanded it)
    val cands = bm25Search(spark, dir, query, kCandidates)
      .select(col("doc_id"), col("lang"), col("source"), col("score_micros"))
      .localCheckpoint(false)
    rerankCore(spark, dir, cands, qTerms, k)
  }

  /** The exact-TF-IDF-cosine rerank over a PRE-MATERIALIZED candidate
    * frame (doc_id, lang, source, score_micros) — shared by
    * [[bm25Rerank]] and [[rrfFusion]] so the fusion computes the recall
    * pool once, not once per ranker. `cands` must be a materialized
    * (checkpointed) ≤ kCandidates-row frame: every reference here
    * re-expands its plan otherwise. */
  private def rerankCore(spark: SparkSession, dir: String,
                         cands: DataFrame, qTerms: Seq[String],
                         k: Int): DataFrame = {
    import spark.implicits._
    import graft.functions.ChFunctions.floorRound
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    // candidate term vectors. Round-16: join BEFORE the explode — the
    // old shape exploded the WHOLE corpus token stream and then
    // broadcast-semi-joined it down to the candidates, paying a full
    // corpus tokenize for ≤ kCandidates docs' vectors; a generator
    // cannot be join-pushed by Catalyst, so the order is fixed by hand.
    // Materialized — ctf feeds THREE consumers (termSet, dvec via the
    // dfr join, and na2).
    val ctf = Tables.documents(spark, dir)
      .join(broadcast(cands.select("doc_id")), "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val termSet = ctf.select("term").union(qTerms.toDF("term")).distinct()
    // df = docs containing the term. Round-16: per-doc array_distinct
    // BEFORE the explode — distinct-within-doc is row-local, so the
    // corpus-wide (doc_id, term) DISTINCT shuffle the old shape paid
    // (the one aggregate Catalyst cannot push the term-set join below)
    // disappears; only the broadcast-filtered per-doc term memberships
    // reach the map-side-combinable count. Same df exactly: distinct
    // per doc then count ≡ count of distinct (doc, term) pairs.
    // Materialized: dfr feeds dvec AND qvec.
    val dfr = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .join(broadcast(termSet), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .localCheckpoint(false)
    def idfUnits = least(
      floor((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)) * 100 + 0.5)
        .cast("long"), lit(100000L))
    val dvec = ctf.join(dfr, "term").crossJoin(broadcast(nDocs))
      .withColumn("wu", least(col("tf"), lit(255L)) * idfUnits)
      .select("doc_id", "term", "wu")
      .localCheckpoint(false)
    val qvec = dfr.filter(col("term").isin(qTerms: _*))
      .crossJoin(broadcast(nDocs))
      .select(col("term"), idfUnits.as("qu"))
    val nq2 = qvec.agg(sum(col("qu") * col("qu")).as("nq2"))
    val dots = dvec.join(broadcast(qvec), "term")
      .groupBy("doc_id").agg(sum(col("wu") * col("qu")).as("dot"))
    val na2 = dvec.groupBy("doc_id").agg(sum(col("wu") * col("wu")).as("na2"))
    cands.join(dots, "doc_id").join(na2, "doc_id").crossJoin(broadcast(nq2))
      .withColumn("cosine", floorRound(col("dot").cast("double") /
        (sqrt(col("na2").cast("double")) * sqrt(col("nq2").cast("double"))), 4))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("score_micros").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("lang"), col("source"),
        col("score_micros"), col("cosine"))
      .orderBy("rank")
  }

  /** Oracle-side rendering of [[bm25Rerank]]: the BM25 chain nested as
    * the candidate CTE, then the same candidate-bounded TF-IDF rerank
    * arithmetic token-for-token. */
  def bm25RerankOracleSql(query: String = DefaultQuery,
                          kCandidates: Int = 50, k: Int = 10): String = {
    val qTerms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    val inList = qTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH cand AS (${bm25OracleSql(query, kCandidates)}),
      |toks2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |ctf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM toks2 JOIN cand USING (doc_id) GROUP BY 1, 2),
      |terms AS (SELECT DISTINCT term FROM ctf UNION SELECT unnest([$inList]) AS term),
      |dfr AS (
      |  SELECT term, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, term FROM toks2) dt JOIN terms USING (term)
      |  GROUP BY 1),
      |dvec AS (
      |  SELECT doc_id, term,
      |    least(tf, 255) * least(CAST(floor((n_docs + 1.0) / (df + 1.0) * 100 + 0.5) AS BIGINT), 100000) AS wu
      |  FROM ctf JOIN dfr USING (term) CROSS JOIN nd),
      |qvec AS (
      |  SELECT term,
      |    least(CAST(floor((n_docs + 1.0) / (df + 1.0) * 100 + 0.5) AS BIGINT), 100000) AS qu
      |  FROM dfr CROSS JOIN nd WHERE term IN ($inList)),
      |nq AS (SELECT CAST(sum(qu * qu) AS BIGINT) AS nq2 FROM qvec),
      |dots AS (
      |  SELECT doc_id, CAST(sum(wu * qu) AS BIGINT) AS dot
      |  FROM dvec JOIN qvec USING (term) GROUP BY 1),
      |na AS (SELECT doc_id, CAST(sum(wu * wu) AS BIGINT) AS na2 FROM dvec GROUP BY 1),
      |fin AS (
      |  SELECT cand.doc_id, lang, source, score_micros,
      |    floor(CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nq2 AS DOUBLE))) * 10000 + 0.5) / 10000.0 AS cosine
      |  FROM cand JOIN dots USING (doc_id) JOIN na USING (doc_id) CROSS JOIN nq),
      |rr AS (
      |  SELECT row_number() OVER (ORDER BY cosine DESC, score_micros DESC, doc_id) AS rank,
      |    doc_id, lang, source, score_micros, cosine
      |  FROM fin)
      |SELECT rank, doc_id, lang, source, score_micros, cosine
      |FROM rr WHERE rank <= $k ORDER BY rank""".stripMargin
  }

  /** The oracle-side rendering of [[bm25Search]] for a literal query:
    * the same CTE chain with the same op order. Lives next to the
    * operator so the two arithmetic definitions can be reviewed
    * side-by-side. */
  def bm25OracleSql(query: String = DefaultQuery, k: Int = 10): String = {
    val qTerms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    val inList = qTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH d AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
      |dd AS (SELECT doc_id, lang, source, CAST(len(t) AS BIGINT) AS dl, t FROM d),
      |stats AS (
      |  SELECT count(*) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dd),
      |post AS (
      |  SELECT doc_id, dl, unnest(t) AS term FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf FROM post
      |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(sum(CAST(floor(
      |      ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
      |      * ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |         (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))
      |      * 1e6) AS BIGINT)) AS BIGINT) AS score_micros,
      |    count(*) AS n_terms_matched
      |  FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY doc_id),
      |ranked AS (
      |  SELECT row_number() OVER (ORDER BY score_micros DESC, scored.doc_id) AS rank,
      |    scored.doc_id, lang, source, n_terms_matched, score_micros,
      |    CAST(score_micros AS DOUBLE) / 1e6 AS score
      |  FROM scored JOIN dd ON scored.doc_id = dd.doc_id)
      |SELECT rank, doc_id, lang, source, n_terms_matched, score_micros, score
      |FROM ranked WHERE rank <= $k ORDER BY rank""".stripMargin
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    * fuse the BM25 ranking and the exact TF-IDF-cosine ranking of the
    * same recall pool by `Σ 1e9 div (60 + rank)` — the standard
    * score-free fusion that rewards agreement between rankers without
    * comparing their incomparable score scales. Integer division keeps
    * the fused score exactly reproducible cross-engine (the classic
    * 1/(60+r) floats would hang equality on summation order).
    *
    * Scale: both rankers are the candidate-bounded plans ([[bm25Search]],
    * [[bm25Rerank]]); the fusion itself joins two ≤`kPool`-row frames.
    * RRF generalizes unchanged to heterogeneous rankers (e.g. an ANN
    * ranking as the third voice) — anything that emits (doc_id, rank). */
  def rrfFusion(spark: SparkSession, dir: String,
                query: String = DefaultQuery,
                kPool: Int = 50, k: Int = 10): DataFrame = {
    val qTerms = query.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(qTerms.nonEmpty, "rrfFusion: empty query")
    // BOTH rankers rank the same ≤ kPool recall pool — compute it once
    // (the pre-round-15 shape called bm25Search twice: once for the
    // BM25 ranking, once inside bm25Rerank for the candidate pool,
    // doubling the corpus scans and the plan)
    val pool = bm25Search(spark, dir, query, kPool).localCheckpoint(false)
    val a = pool.select(col("doc_id"), col("rank").as("rank_bm25"))
    val b = rerankCore(spark, dir,
        pool.select(col("doc_id"), col("lang"), col("source"),
          col("score_micros")),
        qTerms, kPool)
      .select(col("doc_id"), col("rank").as("rank_cos"))
    a.join(b, Seq("doc_id"), "full")
      .withColumn("rrf_units",
        expr("coalesce(1000000000 div (60 + rank_bm25), 0L) + " +
          "coalesce(1000000000 div (60 + rank_cos), 0L)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_units").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("rank_bm25"), col("rank_cos"),
        col("rrf_units"))
      .orderBy("rank")
  }

  /** Oracle-side rendering of [[rrfFusion]]: both ranker chains nested
    * as CTEs (the SAME text as their standalone oracles), fused with
    * the identical integer-division arithmetic. */
  def rrfFusionOracleSql(query: String = DefaultQuery,
                         kPool: Int = 50, k: Int = 10): String = {
    s"""WITH bmr AS (${bm25OracleSql(query, kPool)}),
      |csr AS (${bm25RerankOracleSql(query, kPool, kPool)}),
      |f AS (
      |  SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id,
      |    bmr.rank AS rank_bm25, csr.rank AS rank_cos,
      |    CAST(COALESCE(1000000000 // (60 + bmr.rank), 0)
      |       + COALESCE(1000000000 // (60 + csr.rank), 0) AS BIGINT) AS rrf_units
      |  FROM bmr FULL JOIN csr ON bmr.doc_id = csr.doc_id),
      |rr AS (
      |  SELECT row_number() OVER (ORDER BY rrf_units DESC, doc_id) AS rank,
      |    doc_id, rank_bm25, rank_cos, rrf_units
      |  FROM f)
      |SELECT rank, doc_id, rank_bm25, rank_cos, rrf_units
      |FROM rr WHERE rank <= $k ORDER BY rank""".stripMargin
  }
}
