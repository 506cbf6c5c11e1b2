package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ChFunctions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, quality scoring, language-ID
  * heuristics, and content fingerprinting.
  *
  * Everything is built from codegen'd string expressions and higher-order
  * array functions — per-row compute with NO shuffle except the final
  * presentation sort, so these scale linearly with the scan: the shape
  * you want when scoring 100 TB of text.
  */
object TextAnalysis {

  /** Whitespace token count via length arithmetic (identical formula in
    * the DuckDB oracle — robust to engine-specific split semantics). */
  private def tokenCount(c: org.apache.spark.sql.Column) =
    length(c) - length(regexp_replace(c, " ", "")) + 1

  /** Per-doc token statistics: whitespace tokens, a BPE-ish subword
    * estimate (letter-run regex count + chars/4 blend — the standard
    * fast proxy when the real tokenizer is too hot for a scan), char
    * counts, average token length. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_word_runs"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_bpe_est"),
        floorRound(length(regexp_replace(col("text"), " ", "")).cast("double")
          / tokenCount(col("text")), 4).as("avg_token_len"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, vowel ratio, length band — the
    * length/punct/stopword-ratio family used to filter web corpora. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))")
          .cast("long").as("n_stopwords"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", "")))
          .cast("long").as("n_vowels"))
      .withColumn("stopword_ratio",
        floorRound(col("n_stopwords").cast("double") / col("n_tokens"), 4))
      .withColumn("quality_band",
        when(col("stopword_ratio") >= 0.08, "high")
          .when(col("stopword_ratio") >= 0.03, "mid")
          .otherwise("low"))
      .orderBy("doc_id")

  /** Language-ID heuristic: character-n-gram + marker-token scoring
    * (the profile-counting shape of real langid — char bigram 'th' and
    * trigram 'the' frequencies plus stopword tokens; markers chosen for
    * the synthetic corpus). Deterministic and replicated verbatim in
    * the oracle. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang"),
        expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))")
          .cast("long").as("en_markers"),
        // char-n-gram counts by length arithmetic (replace is exact)
        ((length(col("text")) - length(regexp_replace(col("text"), "th", ""))) / 2)
          .cast("long").as("ngram_th"),
        ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3)
          .cast("long").as("ngram_the"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("lang_pred",
        when(col("en_markers") * 20 >= col("n_tokens") && col("ngram_th") > 0, "en")
          .when(col("en_markers") + col("ngram_the") > 0, "en_maybe")
          .otherwise("und"))
      .orderBy("doc_id")

  /** Rolling-hash chunk fingerprints (winnowing): a polynomial rolling
    * hash over every k-char window, then the minimum hash of each
    * w-window of those (the winnowing guarantee: any shared substring of
    * length >= k+w-1 yields a shared fingerprint) — the content-defined
    * chunking used for partial-overlap dedup, where digests only catch
    * exact duplicates. Entirely per-row; the fingerprint explosion is
    * the only row growth. */
  def rollingFingerprints(spark: SparkSession, dir: String,
                          k: Int = 8, w: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // native compiled loop (graft.functions.WinnowFingerprints);
    // bit-identical to the HOF chain
    //   array_distinct(transform(seq, i -> array_min(slice(rolling, i, w))))
    // but ~50× faster — HOF lambdas evaluate interpreted per element
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(call_function("winnow_fingerprints", col("text"), lit(k), lit(w)))
          .as("fingerprint"))
      .orderBy("doc_id", "fingerprint")
  }

  /** Content fingerprinting: normalized digest for exact-dup detection at
    * scale (dedup on the 16-byte digest, never on the raw text — the
    * shuffle moves digests, not documents). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("digest"),
        sha2(col("text"), 256).as("digest_sha256"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy("doc_id")
}
