package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Search, TextDedup, VectorOps}

/** §2.10 for the LLM-operator surface: the reference's typed template
  * parameters (`{{Float32(min_jaccard, 0.5)}}`, `{% if defined(p) %}` —
  * flights_missed_pct_minute.pipe:22,31-32) re-expressed as a
  * string-keyed param map over the dedup/ANN endpoints — the engine
  * half of `GET /v0/pipes/{name}.json?min_jaccard=0.6`. Strings in,
  * typed values out, defaults when absent — an HTTP layer passes its
  * query params through verbatim, no recompile to retune a threshold.
  *
  * Unknown keys fail fast (the reference's API 400s on them rather
  * than silently ignoring a typo'd `min_jacard`), as do unparseable
  * values — a fat-fingered dashboard query must not degrade into the
  * default-threshold answer. */
object ParamEndpoints {

  /** Text near-dup pairs; `min_jaccard` (default 0.5). */
  def docsNearDupPairs(spark: SparkSession, dir: String,
                       params: Map[String, String]): DataFrame = {
    validate(params, Set("min_jaccard"))
    TextDedup.nearDupPairs(spark, dir, double(params, "min_jaccard", 0.5))
  }

  /** MinHash+LSH near-dup pairs; `min_jaccard` (default 0.5).
    * Auto-routes through the staged band/shingle index when the
    * param-free artifact segment is current (min_jaccard is a
    * read-time verification threshold — any value routes). */
  def docsMinhashLshPairs(spark: SparkSession, dir: String,
                          params: Map[String, String]): DataFrame = {
    validate(params, Set("min_jaccard"))
    TextDedup.minhashLshPairsAuto(spark, dir,
      graft.SparkEntry.dedupArtifactsDir(dir),
      double(params, "min_jaccard", 0.5))
  }

  /** Embedding near-dup pairs; `min_cosine` (default 0.4) and `nprobe`
    * (default 3). Auto-routes through the staged probe layout when the
    * artifact is current and the geometry is the staged default
    * (min_cosine is a post-filter — any value routes; a non-default
    * nprobe computes self-contained). */
  def embNearDupPairs(spark: SparkSession, dir: String,
                      params: Map[String, String]): DataFrame = {
    validate(params, Set("min_cosine", "nprobe"))
    VectorOps.nearDupPairsAuto(spark, dir, graft.SparkEntry.dedupArtifactsDir(dir),
      double(params, "min_cosine", 0.4), nprobe = int(params, "nprobe", 3))
  }

  /** IVF k-NN; `n_queries` / `k` / `nprobe` with the registered
    * endpoint's defaults. */
  def embKnnIvf(spark: SparkSession, dir: String,
                params: Map[String, String]): DataFrame = {
    validate(params, Set("n_queries", "k", "nprobe"))
    VectorOps.knnIvf(spark, dir,
      nQueries = int(params, "n_queries", 20),
      k = int(params, "k", 5),
      nprobe = int(params, "nprobe", 3))
  }

  /** BM25 keyword search; `q` (`{{String(q, …)}}` — whitespace-
    * tokenized query) and `k` result count. An empty or blank `q`
    * fails fast like any unparseable param. */
  def docsBm25Search(spark: SparkSession, dir: String,
                     params: Map[String, String]): DataFrame = {
    validate(params, Set("q", "k"))
    val q = params.getOrElse("q", Search.DefaultQuery)
    require(q.trim.nonEmpty, "param q: empty query")
    Search.bm25Search(spark, dir, q, int(params, "k", 10))
  }

  /** Events in a time window; `start` / `end` as `DateTime` params
    * (ISO local or `yyyy-MM-dd HH:mm:ss` — the reference's
    * `{{DateTime(start)}}` accepts the same), both optional with the
    * pipe's anchored defaults. The literal reference pattern
    * (flights_missed_pct_minute.pipe:22,31-32). */
  def eventsInWindow(spark: SparkSession, dir: String,
                     params: Map[String, String]): DataFrame = {
    validate(params, Set("start", "end"))
    graft.pipes.CdcPipes.eventsInWindow(spark, dir,
      start = timestamp(params, "start"), end = timestamp(params, "end"))
  }

  /** Two-stage retrieval: `q` free text, `k_candidates` recall-stage
    * width, `k` served depth. */
  def docsBm25Rerank(spark: SparkSession, dir: String,
                     params: Map[String, String]): DataFrame = {
    validate(params, Set("q", "k_candidates", "k"))
    val q = params.getOrElse("q", Search.DefaultQuery)
    require(q.trim.nonEmpty, "param q: empty query")
    Search.bm25Rerank(spark, dir, q,
      kCandidates = int(params, "k_candidates", 50), k = int(params, "k", 10))
  }

  /** Point-in-time feature serving: `asof` DateTime param pins the
    * snapshot instant (training-label alignment — features must not
    * see events after the label's timestamp); absent anchors to the
    * corpus max like the batch endpoint. */
  def userWindowFeatures(spark: SparkSession, dir: String,
                         params: Map[String, String]): DataFrame = {
    validate(params, Set("asof"))
    graft.pipes.CdcPipes.userWindowFeatures(spark, dir,
      asOf = timestamp(params, "asof"))
  }

  /** The reference's own parameterized pipe, served with its template
    * contract (`{% if defined(start) %}` …
    * flights_missed_pct_minute.pipe:22,31-32): `start` / `end` DateTime
    * params bound the per-minute aggregation, defaults anchor to the
    * pipe's now()-1h window. Runs on the generated CDC fixture log like
    * every ref_* pipe (the sf dir param is ignored by convention). */
  def refFlightsMissedPctMinute(spark: SparkSession, dir: String,
                                params: Map[String, String]): DataFrame = {
    validate(params, Set("start", "end"))
    graft.pipes.AirportPipes.flightsMissedPctMinute(spark,
      graft.SparkEntry.fixtureDir(spark),
      start = timestamp(params, "start"), end = timestamp(params, "end"))
  }

  /** `{{DateTime(key)}}` — absent means the endpoint's default.
    * Parsed as LocalDateTime (naive wall clock), never through
    * java.sql.Timestamp: Timestamp.valueOf interprets the string in
    * the driver JVM's default timezone, silently shifting the window
    * by the TZ offset on any non-UTC deployment. */
  private[sources] def timestamp(params: Map[String, String],
                                 key: String): Option[java.time.LocalDateTime] =
    params.get(key).map { v =>
      try java.time.LocalDateTime.parse(v.replace(' ', 'T'))
      catch { case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"param $key: not a timestamp (want yyyy-MM-dd HH:mm:ss): $v") }
    }

  /** `{{Float32(key, default)}}`. */
  private def double(params: Map[String, String], key: String,
                     default: Double): Double =
    params.get(key).map { v =>
      try v.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"param $key: not a number: $v") }
    }.getOrElse(default)

  /** `{{Int32(key, default)}}`. */
  private def int(params: Map[String, String], key: String,
                  default: Int): Int =
    params.get(key).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"param $key: not an integer: $v") }
    }.getOrElse(default)

  private def validate(params: Map[String, String],
                       allowed: Set[String]): Unit = {
    val unknown = params.keySet -- allowed
    require(unknown.isEmpty,
      s"unknown params: ${unknown.mkString(", ")} (allowed: ${allowed.mkString(", ")})")
  }
}
