package graft.oracle

import graft.operators
import OracleCtes._

/** DuckDB oracle SQL — documents (text/LLM-pipeline) family (see OracleCtes for shared fragments). */
private[graft] object DocsOracles {
  val sql: Map[String, String] = Map(
    // cross-source shingle overlap: the events_kmv_overlap kernel over
    // word-3-gram shingle sets per document source
    "docs_source_overlap" ->
      s"""WITH sh AS (
        |  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
        |       LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
        |  WHERE len(t) >= 3),
        |hashed AS (
        |  SELECT DISTINCT source, ${graft.functions.OracleHash.duckLow64("shingle")} AS h FROM sh),
        |kept AS (
        |  SELECT source, h, rn FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hashed)
        |  WHERE rn <= 128),
        |pte AS (
        |  SELECT source, ${kmvEstSql("n", "hk", 128)} AS est_n
        |  FROM (SELECT source, count(*) AS n, max(CASE WHEN rn = 128 THEN h END) AS hk
        |        FROM kept GROUP BY 1)),
        |ty AS (SELECT DISTINCT source FROM kept),
        |pr AS (SELECT a.source AS source_a, b.source AS source_b
        |       FROM ty a, ty b WHERE a.source < b.source),
        |mem AS (
        |  SELECT source_a, source_b, h,
        |    max(CASE WHEN k.source = source_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN k.source = source_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pr JOIN kept k ON k.source = source_a OR k.source = source_b
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn FROM mem),
        |ag AS (
        |  SELECT source_a, source_b, count(*) AS n_union,
        |    max(CASE WHEN rn = 128 THEN h END) AS hk,
        |    sum(CASE WHEN rn <= 128 AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
        |  FROM rk GROUP BY 1, 2),
        |fin AS (
        |  SELECT source_a, source_b, ${kmvEstSql("n_union", "hk", 128)} AS eu,
        |    CAST(n_both AS DOUBLE) / CAST(least(n_union, 128) AS DOUBLE) AS jr
        |  FROM ag)
        |SELECT source_a, source_b,
        |  floor(a.est_n * 100 + 0.5) / 100.0 AS est_shingles_a,
        |  floor(b.est_n * 100 + 0.5) / 100.0 AS est_shingles_b,
        |  floor(eu * 100 + 0.5) / 100.0 AS est_union,
        |  floor(jr * eu * 100 + 0.5) / 100.0 AS est_intersection,
        |  floor(jr * 10000 + 0.5) / 10000.0 AS est_jaccard
        |FROM fin JOIN pte a ON a.source = fin.source_a
        |         JOIN pte b ON b.source = fin.source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "docs_token_stats" ->
      """SELECT doc_id, n_chars,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_runs,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est,
        |  floor(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_quality_score" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
        |  floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS stopword_ratio,
        |  CASE WHEN floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.08 THEN 'high'
        |       WHEN floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.03 THEN 'mid'
        |       ELSE 'low' END AS quality_band
        |FROM documents ORDER BY doc_id""".stripMargin,
    // column profile: per column null/distinct/min/max (strings) + row count
    "docs_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, count(*) - count(doc_id) AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    substring(CAST(min(doc_id) AS VARCHAR), 1, 64) AS min_value,
        |    substring(CAST(max(doc_id) AS VARCHAR), 1, 64) AS max_value,
        |    count(*) AS n_rows FROM documents
        |  UNION ALL SELECT 'text', count(*) - count(text), count(DISTINCT text),
        |    substring(CAST(min(text) AS VARCHAR), 1, 64), substring(CAST(max(text) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'lang', count(*) - count(lang), count(DISTINCT lang),
        |    substring(CAST(min(lang) AS VARCHAR), 1, 64), substring(CAST(max(lang) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'source', count(*) - count(source), count(DISTINCT source),
        |    substring(CAST(min(source) AS VARCHAR), 1, 64), substring(CAST(max(source) AS VARCHAR), 1, 64), count(*) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*) - count(n_chars), count(DISTINCT n_chars),
        |    substring(CAST(min(n_chars) AS VARCHAR), 1, 64), substring(CAST(max(n_chars) AS VARCHAR), 1, 64), count(*) FROM documents)
        |SELECT * FROM p ORDER BY column_name""".stripMargin,
    // curation funnel: raw → lang gate → quality gate → exact-dedup
    // canonical (within the quality-passed set) per source; the stage
    // predicates are the SAME expressions as docs_lang_id /
    // docs_quality_score / docs_exact_dedup so the funnel cannot drift
    "docs_pipeline_funnel" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS en_markers,
        |    (length(text) - length(replace(text, 'th', ''))) / 2 AS ngram_th,
        |    (length(text) - length(replace(text, 'the', ''))) / 3 AS ngram_the,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS ratio,
        |    md5(text) AS digest
        |  FROM documents),
        |g AS (
        |  SELECT *,
        |    (en_markers * 20 >= n_tokens AND ngram_th > 0) OR (en_markers + ngram_the > 0) AS lang_ok
        |  FROM f),
        |h AS (SELECT *, (lang_ok AND ratio >= 0.03) AS q_ok FROM g),
        |c AS (
        |  SELECT *, CASE WHEN q_ok AND row_number() OVER (PARTITION BY digest, q_ok ORDER BY doc_id) = 1
        |                 THEN 1 ELSE 0 END AS canon
        |  FROM h)
        |SELECT source, count(*) AS n_raw,
        |  CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
        |  CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
        |  CAST(sum(canon) AS BIGINT) AS n_canonical,
        |  CAST(sum(CASE WHEN canon = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS canonical_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // DSIR-shaped importance weights: hashed-bigram buckets, add-one
    // smoothed integer likelihood-ratio proxy, top-20%-per-source select
    "docs_dsir_weights" ->
      s"""WITH tok AS (
        |  SELECT doc_id, source,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.08 AS is_target,
        |    string_split(text, ' ') AS t
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, is_target, t[g] || ' ' || t[g+1] AS ngram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g)
        |  WHERE len(t) >= 2),
        |bk AS (
        |  SELECT doc_id, is_target,
        |    ((${graft.functions.OracleHash.duckLow64("ngram")} % 256) + 256) % 256 AS bucket
        |  FROM ng),
        |st AS (
        |  SELECT bucket, count(*) AS r_b,
        |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_b
        |  FROM bk GROUP BY 1),
        |wb AS (SELECT bucket, ((t_b + 1) * 10000) // (r_b + 1) AS w_b FROM st),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_feats, CAST(sum(w_b) AS BIGINT) AS score
        |  FROM bk JOIN wb USING (bucket) GROUP BY 1),
        |o AS (
        |  SELECT d.doc_id, d.source,
        |    COALESCE(n_feats, 0) AS n_feats, COALESCE(score, 0) AS score,
        |    CASE WHEN COALESCE(n_feats, 0) > 0 THEN score // n_feats ELSE 0 END AS score_per_feat
        |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY source ORDER BY score_per_feat DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM o)
        |SELECT doc_id, source, n_feats, score, score_per_feat,
        |  rn * 100 <= 20 * n_src AS selected
        |FROM r ORDER BY doc_id""".stripMargin,
    "docs_lang_id" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS en_markers,
        |  CAST((length(text) - length(replace(text, 'th', ''))) / 2 AS BIGINT) AS ngram_th,
        |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS ngram_the,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 20
        |            >= length(text) - length(replace(text, ' ', '')) + 1
        |            AND (length(text) - length(replace(text, 'th', ''))) / 2 > 0 THEN 'en'
        |       WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
        |            + (length(text) - length(replace(text, 'the', ''))) / 3 > 0 THEN 'en_maybe'
        |       ELSE 'und' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_fingerprint" ->
      """SELECT doc_id, md5(text) AS digest, sha256(text) AS digest_sha256,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_rolling_fingerprints" ->
      s"""WITH $winnowCtes
        |SELECT doc_id, unnest(fps) AS fingerprint FROM fp
        |ORDER BY doc_id, fingerprint""".stripMargin,
    // decontamination: (eval, train) pairs sharing df-capped winnowing
    // fingerprints — the fingerprint CTEs are the SAME text as the
    // rolling-fingerprints oracle, so the two cannot drift
    "docs_contamination" ->
      s"""WITH $winnowCtes,
        |x AS (SELECT doc_id, unnest(fps) AS fingerprint FROM fp),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |t AS (SELECT x.doc_id, split, fingerprint FROM x JOIN s USING (doc_id)),
        |dfq AS (SELECT fingerprint, count(*) AS df FROM t GROUP BY 1),
        |c AS (SELECT t.* FROM t JOIN dfq USING (fingerprint) WHERE df <= 100),
        |tr AS (SELECT doc_id AS train_doc_id, fingerprint FROM c WHERE split = 'train'),
        |ev AS (SELECT doc_id AS eval_doc_id, split, fingerprint FROM c WHERE split != 'train')
        |SELECT eval_doc_id, split, train_doc_id, count(*) AS shared_fps
        |FROM ev JOIN tr USING (fingerprint)
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY eval_doc_id, train_doc_id""".stripMargin,
    // count-min sketch: the estimate (min over lanes of the bucket
    // counter) is recomputed from the same md5 lanes, so the sketch's
    // approximate counts are hash-match verified, not just bounded
    "docs_cms_top_terms" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |lanes AS (
        |  ${cmsLanesSql("tok", "")}),
        |counters AS (SELECT r, bucket, count(*) AS c FROM lanes GROUP BY 1, 2),
        |cnt AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY 1),
        |top AS (SELECT * FROM cnt ORDER BY exact_n DESC, term LIMIT 20),
        |probe AS (
        |  ${cmsLanesSql("top", "term, exact_n, ")})
        |SELECT term, exact_n, min(c) AS cms_est, min(c) - exact_n AS overcount
        |FROM probe JOIN counters USING (r, bucket)
        |GROUP BY term, exact_n
        |ORDER BY exact_n DESC, term""".stripMargin,
    // Bloom filter over the test split's bigrams probed by every train
    // doc: n_bloom_hits >= n_exact_hits row by row; the gap IS the
    // false-positive count, audited rather than assumed from theory
    "docs_bloom_contamination" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, split, t[i] || ' ' || t[i+1] AS gram
        |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |  WHERE len(t) >= 2),
        |tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
        |pos AS (
        |  ${bloomPosSql("tg", "")}),
        |bm AS (SELECT p // 63 AS word_idx,
        |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        |       FROM pos GROUP BY 1),
        |tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE split = 'train'),
        |pp AS (
        |  ${bloomPosSql("tr", "doc_id, gram, ")}),
        |pj AS (
        |  SELECT doc_id, gram,
        |    CASE WHEN bits IS NOT NULL AND ((bits >> CAST(p % 63 AS INT)) & 1) = 1
        |         THEN 1 ELSE 0 END AS hit
        |  FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx),
        |mb AS (SELECT doc_id, gram, min(hit) AS maybe FROM pj GROUP BY 1, 2),
        |ex AS (
        |  SELECT tr.doc_id, tr.gram,
        |    max(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS exact_hit
        |  FROM tr LEFT JOIN tg ON tr.gram = tg.gram GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(maybe) AS BIGINT) AS n_bloom_hits,
        |  CAST(sum(exact_hit) AS BIGINT) AS n_exact_hits
        |FROM mb JOIN ex USING (doc_id, gram)
        |GROUP BY 1 HAVING sum(maybe) > 0
        |ORDER BY doc_id""".stripMargin,
    // BM25 with rational idf and micro-unit long partials: every IEEE
    // step mirrored op-for-op (Search.bm25OracleSql lives next to the
    // operator so the two arithmetic definitions review side-by-side)
    "docs_bm25_search" -> operators.Search.bm25OracleSql(),
    // two-stage retrieval: BM25 recall CTE nested verbatim, TF-IDF rerank
    "docs_bm25_rerank" -> operators.Search.bm25RerankOracleSql(),
    "docs_hybrid_rrf" -> operators.Search.rrfFusionOracleSql(),
    "docs_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_id, CAST(i * 24 + 1 AS INT) AS chunk_start,
        |         t[(i * 24 + 1) : (i * 24 + 32)] AS toks
        |  FROM tok, LATERAL (SELECT unnest(generate_series(0, greatest((len(t) - 9) // 24, 0))) AS i))
        |SELECT doc_id, chunk_id, chunk_start, CAST(len(toks) AS INT) AS n_tokens,
        |       array_to_string(toks, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "docs_split_assign" ->
      """SELECT doc_id, substr(md5(text), 1, 2) AS bucket_hex,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "docs_bpe_merges" ->
      """WITH words AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(word, CAST(g AS INTEGER), 2) AS pair,
        |    CAST(sum(freq) AS BIGINT) AS pair_freq
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS g)
        |  GROUP BY 1)
        |SELECT pair, pair_freq FROM pairs
        |ORDER BY pair_freq DESC, pair LIMIT 20""".stripMargin,
    // BPE encode: same mining CTE as docs_bpe_merges, then list_reduce
    // applies the ranked merges over the spatialized doc (`~c ` per
    // letter; `~a ~b ` → `~ab `) — leftmost non-overlapping replace in
    // both engines IS sequential BPE application. md5 of the encoded
    // string pins every token boundary.
    "docs_bpe_encode" ->
      """WITH words AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(word, CAST(g AS INTEGER), 2) AS pair,
        |    CAST(sum(freq) AS BIGINT) AS pair_freq
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS g)
        |  GROUP BY 1),
        |ml AS (
        |  SELECT list(pair ORDER BY pair_freq DESC, pair) AS ms FROM (
        |    SELECT pair, pair_freq FROM pairs
        |    ORDER BY pair_freq DESC, pair LIMIT 20)),
        |enc AS (
        |  SELECT doc_id, text,
        |    list_reduce(
        |      list_prepend(regexp_replace(text, '([a-z])', '~\1 ', 'g'),
        |                   (SELECT ms FROM ml)),
        |      (s, m) -> replace(s, '~' || m[1] || ' ~' || m[2] || ' ',
        |                        '~' || m || ' ')) AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INT) AS n_words,
        |  CAST(len(replace(text, ' ', '')) AS INT) AS n_chars,
        |  CAST(len(s) - len(replace(s, '~', '')) AS INT) AS n_tokens,
        |  md5(s) AS enc_digest,
        |  floor(CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |        / (len(s) - len(replace(s, '~', ''))) * 1000000 + 0.5)
        |    / 1000000 AS chars_per_token
        |FROM enc ORDER BY doc_id""".stripMargin,
    "docs_top_bigrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        |ng AS (
        |  SELECT t[g] || ' ' || t[g+1] AS ngram
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g)
        |  WHERE len(t) >= 2)
        |SELECT ngram, count(*) AS n FROM ng GROUP BY 1
        |ORDER BY n DESC, ngram LIMIT 20""".stripMargin,
    "docs_repetition_filters" ->
      s"""WITH $repetitionCtes
        |SELECT per.doc_id, n_tokens, distinct_ratio, dup_trigram_frac, top_unigram_frac,
        |  (top_unigram_frac <= 0.15 AND dup_trigram_frac <= 0.02) AS keep
        |FROM per JOIN tp ON per.doc_id = tp.doc_id
        |ORDER BY per.doc_id""".stripMargin,
    // corpus build v2: repetition verdict + substring-dedup verdict +
    // exact dedup + shared split/pack tail — every CTE block shared
    // with the stage's own oracled endpoint
    "docs_training_corpus_v2" ->
      s"""WITH $repetitionCtes,
        |$spanCtes,
        |sds AS (
        |  SELECT doc_id, max(span_chars) >= 40 AS has_long_dup FROM (
        |    SELECT doc_a AS doc_id, span_chars FROM spans
        |    UNION ALL SELECT doc_b, span_chars FROM spans) GROUP BY doc_id),
        |rkeep AS (
        |  SELECT per.doc_id FROM per JOIN tp ON per.doc_id = tp.doc_id
        |  WHERE top_unigram_frac <= 0.15 AND dup_trigram_frac <= 0.02),
        |q2 AS (
        |  SELECT d.doc_id, d.lang, d.text
        |  FROM documents d JOIN rkeep ON d.doc_id = rkeep.doc_id
        |  LEFT JOIN sds ON d.doc_id = sds.doc_id
        |  WHERE sds.has_long_dup IS NULL OR NOT sds.has_long_dup),
        |exd2 AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q2),
        |kept2 AS (SELECT doc_id, lang, text FROM exd2 WHERE rn = 1),
        |t2 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split,
        |    CAST(doc_id % 4 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM kept2),
        |p2 AS (
        |  SELECT doc_id, lang, split, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t2)
        |SELECT doc_id, lang, split, shard, n_tokens,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p2 ORDER BY doc_id""".stripMargin,
    "docs_lm_score" ->
      s"""WITH $lmScoreCtes
        |SELECT doc_id, n_bigrams, lm_score FROM lm ORDER BY doc_id""".stripMargin,
    // per-language tercile split of the LM scores (ntile ties on doc_id)
    "docs_lm_buckets" ->
      s"""WITH $lmScoreCtes,
        |r AS (
        |  SELECT lm.doc_id, d.lang, lm.lm_score,
        |    ntile(3) OVER (PARTITION BY d.lang
        |                   ORDER BY lm.lm_score DESC, lm.doc_id) AS t
        |  FROM lm JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, lm_score,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "docs_boilerplate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, t[g] || ' ' || t[g+1] || ' ' || t[g+2] AS s
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS g)
        |  WHERE len(t) >= 3),
        |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(sum(CASE WHEN df > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate
        |  FROM sh JOIN dfreq USING (s) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_boilerplate,
        |  floor(CAST(n_boilerplate AS DOUBLE) / n_shingles * 10000 + 0.5) / 10000.0 AS boilerplate_frac,
        |  n_boilerplate > 0 AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,
    // the full scrub chain (emails → IPs → phones → digits) replayed in
    // RE2 over the SAME injected-PII construction: the md5 hash-match
    // proves the masker patterns behave identically under Java regex
    // and RE2 — the portability contract the pattern set is designed to
    "docs_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' ||
        |    ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
        |    ' call +1 (555) 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |    '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' ref A' || CAST((doc_id * 13) % 100000 AS VARCHAR) AS s
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, s,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |        '\+?(?:[0-9][() .-]{0,2}){6,}[0-9]', '<PHONE>', 'g'),
        |      '[0-9]', 'X', 'g') AS r
        |  FROM t)
        |SELECT doc_id, md5(r) AS scrubbed_digest,
        |  CAST((length(r) - length(replace(r, '<EMAIL>', ''))) // 7 AS INT) AS n_emails,
        |  CAST((length(r) - length(replace(r, '<IP>', ''))) // 4 AS INT) AS n_ips,
        |  CAST((length(r) - length(replace(r, '<PHONE>', ''))) // 7 AS INT) AS n_phones,
        |  CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS BIGINT) AS n_pii_chars,
        |  CAST(length(r) AS INT) AS scrubbed_len
        |FROM m ORDER BY doc_id""".stripMargin,
    "docs_exact_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS canonical_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin,
    "docs_near_dup_pairs" ->
      s"""WITH $nearDupCtes
        |SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |FROM j WHERE jr >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // PageRank over the near-dup graph: 3 unrolled integer-unit rounds
    // (rank div degree contributions, damping as 150000 + 85·Σ div 100)
    // over the SAME pair CTEs as docs_near_dup_pairs
    "docs_pagerank" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
           |  SELECT dst AS doc_id, sum(rank_units // deg) AS s
           |  FROM ed JOIN deg USING (src) JOIN $prev ON ed.src = $prev.doc_id
           |  GROUP BY 1),
           |r$i AS (
           |  SELECT deg.src AS doc_id,
           |    CAST(150000 + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS rank_units
           |  FROM deg LEFT JOIN c$i ON deg.src = c$i.doc_id)"""
      }.mkString(",\n")
      s"""WITH $nearDupCtes,
        |pr AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pr
        |       UNION ALL SELECT doc_b, doc_a FROM pr),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
        |r0 AS (SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS rank_units FROM deg),
        |$rounds
        |SELECT r3.doc_id, deg.deg AS degree, r3.rank_units,
        |  r3.rank_units / 1000000.0 AS rank
        |FROM r3 JOIN deg ON deg.src = r3.doc_id
        |ORDER BY r3.rank_units DESC, r3.doc_id""".stripMargin
    },
    // character-level second opinion over the verified pairs only.
    // Cross-engine contract pinned by ChFunctionsSpec ("levenshtein
    // unicode semantics"): Spark counts CODEPOINTS, DuckDB counts BYTES
    // ('café'→'cafe' is 1 vs 2), so this oracle row is exact on the
    // ASCII fixture corpus and would diverge on multi-byte text — the
    // Spark side's codepoint semantics is the user-facing contract.
    "docs_near_dup_edit_distance" ->
      s"""WITH $nearDupCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |  FROM j WHERE jr >= 0.5)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        |  CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
        |  floor(levenshtein(da.text, db.text) * 1.0 /
        |        greatest(length(da.text), length(db.text)) * 10000 + 0.5) / 10000.0
        |    AS edit_ratio
        |FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
        |             JOIN documents db ON db.doc_id = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "docs_minhash_bands" ->
      s"""WITH $minhashBandCtes
        |SELECT doc_id, band, band_hash FROM bands ORDER BY doc_id, band""".stripMargin,
    // incremental screening: the 10% increment (doc_id ≡ 0 mod 10)
    // probed against the existing corpus's digest + band index —
    // exact_dup / near_dup (best verified match) / novel per doc
    "docs_screen_increment" ->
      s"""WITH $minhashBandCtes,
        |exidx AS (
        |  SELECT md5(text) AS digest, min(doc_id) AS exact_match
        |  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
        |exact AS (
        |  SELECT d.doc_id, exact_match
        |  FROM (SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 10 = 0) d
        |  LEFT JOIN exidx USING (digest)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_hash = y.band_hash
        |  WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS ic
        |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
        |              JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b, ic * 1.0 / (sa.n + sb.n - ic) AS jr
        |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id),
        |near AS (
        |  SELECT doc_a AS doc_id, doc_b AS near_match, jaccard FROM (
        |    SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard,
        |      row_number() OVER (PARTITION BY doc_a
        |        ORDER BY floor(jr * 10000 + 0.5) / 10000.0 DESC, doc_b) AS rn
        |    FROM jac WHERE jr >= 0.5) WHERE rn = 1)
        |SELECT exact.doc_id,
        |  CASE WHEN exact_match IS NOT NULL THEN 'exact_dup'
        |       WHEN near_match IS NOT NULL THEN 'near_dup'
        |       ELSE 'novel' END AS verdict,
        |  coalesce(exact_match, near_match) AS matched_doc,
        |  CASE WHEN exact_match IS NULL THEN jaccard END AS jaccard
        |FROM exact LEFT JOIN near USING (doc_id) ORDER BY doc_id""".stripMargin,
    // LSH candidates (band-bucket self-join) verified with exact jaccard
    // over the FULL shingle sets — mirror of minhashLshPairs
    "docs_minhash_lsh_pairs" ->
      s"""WITH $minhashBandCtes,
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS ic
        |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
        |              JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b, ic * 1.0 / (sa.n + sb.n - ic) AS jr
        |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id)
        |SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |FROM jac WHERE jr >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // 64-lane ±1 vote per distinct token over the OracleHash md5-low64
    // bits; sign of each lane's vote becomes the output bit (mirror of
    // the native SimHash64 expression)
    "docs_simhash" ->
      s"""WITH tk AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substring(md5(w), 17, 16))::UBIGINT AS hu FROM tk),
        |votes AS (
        |  SELECT doc_id, bb.b AS b,
        |         SUM(CASE WHEN (hu >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
        |  GROUP BY 1, 2),
        |bits AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS su
        |  FROM votes GROUP BY 1)
        |SELECT doc_id,
        |  CAST(CAST(su AS HUGEINT) -
        |    CASE WHEN su >= 9223372036854775808::HUGEINT
        |         THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
        |  AS simhash
        |FROM bits ORDER BY doc_id""".stripMargin,
    // connected components over the near-dup pair graph: transitive
    // closure via a recursive CTE (fine at oracle SF; the engine side
    // is iterative min-label propagation)
    "docs_dup_clusters" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // staged-artifact summary: per dup cluster, the quality canonical
    // AND the pagerank hub — the oracle recomputes both from documents
    // (it cannot read the artifact), which is exactly the staged ≡
    // self-contained equivalence the artifact topology promises
    "docs_dedup_artifacts" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
           |  SELECT dst AS doc_id, sum(rank_units // deg) AS s
           |  FROM edges JOIN deg USING (src) JOIN $prev ON edges.src = $prev.doc_id
           |  GROUP BY 1),
           |r$i AS (
           |  SELECT deg.src AS doc_id,
           |    CAST(150000 + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS rank_units
           |  FROM deg LEFT JOIN c$i ON deg.src = c$i.doc_id)"""
      }.mkString(",\n")
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |cl AS (SELECT doc_id, cluster_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM lab),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |r0 AS (SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS rank_units FROM deg),
        |$rounds,
        |q AS (
        |  SELECT doc_id,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS q
        |  FROM documents),
        |canon AS (
        |  SELECT cluster_id, cl.doc_id, q, cluster_size,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id)),
        |hub AS (
        |  SELECT cluster_id, cl.doc_id, rank_units,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY rank_units DESC, cl.doc_id) AS rn
        |  FROM cl JOIN r3 ON cl.doc_id = r3.doc_id)
        |SELECT c.cluster_id, c.cluster_size, c.doc_id AS canonical_doc,
        |  c.q AS canonical_quality, h.doc_id AS hub_doc,
        |  h.rank_units AS hub_rank_units
        |FROM canon c JOIN hub h ON c.cluster_id = h.cluster_id
        |WHERE c.rn = 1 AND h.rn = 1
        |ORDER BY c.cluster_id""".stripMargin
    },
    // near-dup pairs straddling the content-digest train/val/test split
    // — exact dups can't leak (same digest → same bucket), so every row
    // is a non-identical near-dup crossing splits
    "docs_split_leakage" ->
      s"""WITH $nearDupCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(jr * 10000 + 0.5) / 10000.0 AS jaccard
        |  FROM j WHERE jr >= 0.5),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT doc_a, doc_b, jaccard, sa.split AS split_a, sb.split AS split_b
        |FROM pairs
        |JOIN sp sa ON sa.doc_id = doc_a
        |JOIN sp sb ON sb.doc_id = doc_b
        |WHERE sa.split <> sb.split ORDER BY doc_a, doc_b""".stripMargin,
    // per dup cluster: the member to KEEP — quality argmax (rounded
    // 4dp stopword ratio, doc_id tiebreak), not the structural min id
    "docs_dedup_canonical" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |cl AS (SELECT doc_id, cluster_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM lab),
        |q AS (
        |  SELECT doc_id,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS q
        |  FROM documents),
        |rnk AS (
        |  SELECT cluster_id, cl.doc_id, q, cluster_size,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id) WHERE cluster_size > 1)
        |SELECT cluster_id, doc_id AS canonical_doc, q AS canonical_quality, cluster_size
        |FROM rnk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    // positional winnowing (shares the rh rolling-hash arithmetic with
    // winnowCtes) → df-cap → fingerprint join → offset-consistent runs
    "docs_substring_spans" ->
      s"""WITH $spanCtes
        |SELECT doc_a, doc_b, offset_delta, shared_fps, span_start_a,
        |       span_start_b, span_chars
        |FROM spans ORDER BY doc_a, doc_b, offset_delta""".stripMargin,
    // per-document rollup of the same spans CTE
    "docs_span_doc_stats" ->
      s"""WITH $spanCtes,
        |u AS (
        |  SELECT doc_a AS doc_id, doc_b AS partner, span_chars FROM spans
        |  UNION ALL
        |  SELECT doc_b, doc_a, span_chars FROM spans)
        |SELECT doc_id, count(*) AS n_spans,
        |  count(DISTINCT partner) AS n_partners,
        |  max(span_chars) AS max_span_chars,
        |  max(span_chars) >= 40 AS has_long_dup
        |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // widest losing span per doc cut out of the text (lower id keeps)
    "docs_dedup_rewrite" ->
      s"""WITH $spanCtes,
        |losing AS (
        |  SELECT DISTINCT doc_b AS doc_id, span_start_b AS cut_start, span_chars
        |  FROM spans WHERE span_chars >= 40),
        |widest AS (
        |  SELECT doc_id, cut_start, span_chars FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY span_chars DESC, cut_start) AS rn
        |    FROM losing) WHERE rn = 1)
        |SELECT d.doc_id,
        |  CASE WHEN w.cut_start IS NULL THEN d.text
        |       ELSE substring(d.text, 1, w.cut_start)
        |            || substring(d.text, w.cut_start + w.span_chars + 1) END AS text,
        |  w.cut_start, w.span_chars,
        |  w.cut_start IS NOT NULL AS was_cut
        |FROM documents d LEFT JOIN widest w USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "docs_top_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * (n_docs + CAST(1 AS DOUBLE)) / (df + CAST(1 AS DOUBLE)) AS wr
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY wr DESC, term) AS term_rank FROM s)
        |SELECT doc_id, term, tf, df,
        |  floor(wr * 1000000 + 0.5) / 1000000.0 AS weight, CAST(term_rank AS INT) AS term_rank
        |FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,
    // sparse TF-IDF cosine pairs: integer-unit weights (capped tf ×
    // clamped rational idf) make dot/norm sums exact BIGINTs; cosine is
    // then exactly-rounded IEEE ops on exact integers — identical in
    // both engines. df-capped terms excluded from weights AND norms on
    // both sides (the documented operator semantics, not an oracle
    // approximation). Oracle joins term STRINGS where Spark joins
    // xxhash64 longs — equality-only role, so a (negligible-probability)
    // collision would surface as a differential failure, not hide.
    "docs_tfidf_pairs" ->
      s"""WITH $tfidfCtes
        |SELECT doc_a, doc_b, floor(cos_raw * 10000 + 0.5) / 10000.0 AS cosine
        |FROM tp WHERE cos_raw >= 0.6 ORDER BY doc_a, doc_b""".stripMargin,
    // retrieval view of the pair frame (threshold 0.3): symmetrize and
    // rank per doc on the ROUNDED cosine (the published value) so the
    // top-k cut is engine-independent under 4dp ties
    "docs_tfidf_neighbors" ->
      s"""WITH $tfidfCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, floor(cos_raw * 10000 + 0.5) / 10000.0 AS cosine
        |  FROM tp WHERE cos_raw >= 0.3),
        |sym AS (
        |  SELECT doc_a AS doc_id, doc_b AS neighbor, cosine FROM pairs
        |  UNION ALL
        |  SELECT doc_b AS doc_id, doc_a AS neighbor, cosine FROM pairs)
        |SELECT doc_id, rank, neighbor, cosine FROM (
        |  SELECT doc_id, neighbor, cosine,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cosine DESC, neighbor) AS INT) AS rank
        |  FROM sym)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // transitive closure of the tfidf pair graph — topical clusters
    // without any embedding model; same recursive min-label closure as
    // docs_dup_clusters, over cosine edges instead of jaccard edges
    "docs_topic_clusters" ->
      s"""WITH RECURSIVE $tfidfCtes,
        |pairs AS (SELECT doc_a, doc_b FROM tp WHERE cos_raw >= 0.6),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, doc_id""".stripMargin,
    // χ² term-distribution divergence per source vs the corpus; the
    // absent-term tail is the closed form (N - Σ C_t∈s)/N; per-term
    // contributions floor to 1e-9 units so the long sum is associative
    "docs_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |st AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns, count(*) AS n_terms FROM st GROUP BY 1),
        |n AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM ct),
        |pres AS (
        |  SELECT source,
        |    CAST(sum(CAST(floor(
        |      (CAST(c * n - ct * ns AS DOUBLE) * CAST(c * n - ct * ns AS DOUBLE)) /
        |      ((CAST(ns AS DOUBLE) * ns) * (CAST(n AS DOUBLE) * ct))
        |      * 1.0E9 + 0.5) AS BIGINT)) AS BIGINT) AS present_units,
        |    CAST(sum(ct) AS BIGINT) AS cs
        |  FROM st JOIN ct USING (term) JOIN ns USING (source) CROSS JOIN n
        |  GROUP BY 1)
        |SELECT source, n_terms, ns AS n_tokens,
        |  (present_units + CAST(floor(CAST(n - cs AS DOUBLE) * 1.0E9 / n + 0.5) AS BIGINT)) / 1.0E9 AS chi2
        |FROM pres JOIN ns USING (source) CROSS JOIN n
        |ORDER BY source""".stripMargin,
    // per-source cap first, then the global ranking on the capped frame
    "docs_top_quality_diverse" ->
      """WITH scored AS (
        |  SELECT doc_id, source, lang,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |          / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS quality
        |  FROM documents),
        |capped AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id) AS INT) AS rank_in_source
        |  FROM scored QUALIFY rank_in_source <= 5)
        |SELECT global_rank, doc_id, source, lang, quality, rank_in_source FROM (
        |  SELECT *, CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS INT) AS global_rank
        |  FROM capped)
        |WHERE global_rank <= 50 ORDER BY global_rank""".stripMargin,
    "docs_sample_per_source" ->
      """SELECT source, rank_in_source, doc_id, lang, n_chars
        |FROM (SELECT source, doc_id, lang, n_chars,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |          AS rank_in_source
        |      FROM documents)
        |WHERE rank_in_source <= 10 ORDER BY source, rank_in_source""".stripMargin,
    // temperature mixing: p_s = budget·√n_s/Σ√n/n_s (T=0.5 — sqrt is
    // correctly rounded in every IEEE engine, general pow is not),
    // selection by the same md5-uniform as the KMV sketch
    "docs_temperature_mix" ->
      s"""WITH ps AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
        |ss AS (SELECT CAST(sum(CAST(floor(sqrt(n_s) * 1000000) AS BIGINT)) AS BIGINT)
        |         / 1000000.0 AS sum_sqrt FROM ps),
        |sel AS (
        |  SELECT d.doc_id, d.source, d.lang,
        |    least(1.0, 300.0 * sqrt(n_s) / sum_sqrt / n_s) AS p_s,
        |    (CAST(${graft.functions.OracleHash.duckLow64("(d.doc_id)::VARCHAR")} AS DOUBLE)
        |      + 9223372036854775808.0) / 18446744073709551616.0 AS u
        |  FROM documents d JOIN ps USING (source), ss)
        |SELECT doc_id, source, lang,
        |  floor(p_s * 1000000 + 0.5) / 1000000.0 AS sample_prob
        |FROM sel WHERE u < p_s ORDER BY doc_id""".stripMargin,
    "docs_sample_stratified" ->
      """SELECT doc_id, lang, source,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key,
        |  CASE WHEN lang = 'en' THEN CAST(2 AS DOUBLE) ELSE CAST(5 AS DOUBLE) END AS weight
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      < CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END
        |ORDER BY doc_id""".stripMargin,
    // token-budget selection: integer quality buckets, whole buckets
    // admitted while they fit (bulk), the one straddling bucket filled
    // greedily by (quality desc, doc_id) — a doc is in while tokens
    // admitted BEFORE it are under budget
    "docs_budget_select" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS nstop,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ntok,
        |    floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |      / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 AS quality
        |  FROM documents),
        |s2 AS (SELECT *, CAST((nstop * 100) // ntok AS INT) AS bucket FROM s),
        |b AS (SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS btok FROM s2 GROUP BY 1),
        |b2 AS (
        |  SELECT bucket, btok,
        |    CAST(coalesce(sum(btok) OVER (ORDER BY bucket DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_above
        |  FROM b),
        |t AS (SELECT s2.*, b2.btok, b2.tokens_above FROM s2 JOIN b2 USING (bucket)),
        |bulk AS (
        |  SELECT doc_id, bucket, quality, n_tokens, 'bulk' AS tier FROM t
        |  WHERE tokens_above + btok <= 10000),
        |bnd AS (
        |  SELECT doc_id, bucket, quality, n_tokens, 'boundary' AS tier FROM (
        |    SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket
        |        ORDER BY quality DESC, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS run
        |    FROM t WHERE tokens_above < 10000 AND tokens_above + btok > 10000)
        |  WHERE tokens_above + run < 10000)
        |SELECT * FROM (SELECT * FROM bulk UNION ALL SELECT * FROM bnd)
        |ORDER BY doc_id""".stripMargin,
    // the full corpus build: quality filter → exact-digest canonical →
    // near-dup cluster canonical (recursive closure) → split → pack
    "docs_training_corpus" ->
      s"""WITH RECURSIVE $nearDupCtes,
        |pairs AS (SELECT doc_a, doc_b FROM j WHERE jr >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT src AS doc_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
        |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        |q AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE floor(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1) * 10000 + 0.5) / 10000.0 >= 0.03),
        |exd AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q),
        |kept AS (
        |  SELECT exd.doc_id, lang, text FROM exd LEFT JOIN lab ON exd.doc_id = lab.doc_id
        |  WHERE rn = 1 AND (lab.cluster_id IS NULL OR lab.cluster_id = exd.doc_id)),
        |t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split,
        |    CAST(doc_id % 4 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM kept),
        |p AS (
        |  SELECT doc_id, lang, split, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, lang, split, shard, n_tokens,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p ORDER BY doc_id""".stripMargin,
    "docs_sample_weighted_stats" ->
      """WITH s AS (
        |  SELECT lang, CASE WHEN lang = 'en' THEN 2 ELSE 5 END AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |        < CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(w) AS BIGINT) AS est_docs,
        |  CAST(sum(w * n_tokens) AS BIGINT) AS est_tokens
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "docs_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, lang, shard, n_tokens, tokens_before,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id
        |FROM p ORDER BY doc_id""".stripMargin,
    // ASCII corpus: char arithmetic on the VARCHAR == byte arithmetic
    // on the utf-8 payload (strlen/substring vs binary length/slice)
    "docs_binary_chunks" -> {
      val cb = operators.Multimodal.DefaultChunkBytes
      s"""WITH c AS (
        |  SELECT doc_id, CAST(g AS INT) AS chunk_idx,
        |    CAST(g * $cb AS BIGINT) AS chunk_offset,
        |    substring(text, g * $cb + 1, $cb) AS chunk
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(0, greatest((strlen(text) - 1) // $cb, 0))) AS g))
        |SELECT doc_id, chunk_idx, chunk_offset,
        |  CAST(strlen(chunk) AS INT) AS chunk_len, md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    },
    "docs_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS digest,
        |  'text/plain;charset=utf-8' AS content_type, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the deterministic stub decode IS oracle-able: FakeDecode's
    // byte-sum/modular-dims math re-expressed in ascii arithmetic (the
    // payload is utf-8 of ASCII text), so the driver gate covers the
    // full per-partition decode path, not just row counts
    "docs_decode_features" ->
      """WITH b AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_sum(list_transform(generate_series(1, strlen(text)),
        |      i -> ascii(substring(text, i, 1)))) AS s
        |  FROM documents)
        |SELECT doc_id, CAST(64 + (s % 512) AS INT) AS width,
        |  CAST(64 + (n % 512) AS INT) AS height,
        |  3 AS channels, CAST(s AS BIGINT) AS feature_sum
        |FROM b ORDER BY doc_id""".stripMargin,
    // closed forms of the synthesized square wave: the Spark side
    // builds a real RIFF/WAVE payload from these parameters and decodes
    // it with the REAL javax.sound codec — a match means the full
    // synth→header→codec→features round-trip is byte-correct
    "docs_audio_features" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |  CAST(1 + (doc_id % 2) AS INT) AS channels,
        |  16 AS bits,
        |  CAST(400 + (n_chars % 256) AS BIGINT) AS n_frames,
        |  CAST((400 + (n_chars % 256)) * 1000 // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_ms,
        |  CAST(1000 + (doc_id % 100) * 10 AS INT) AS peak,
        |  CAST(400 + (n_chars % 256) AS BIGINT) * (1 + (doc_id % 2))
        |    * (1000 + (doc_id % 100) * 10) * (1000 + (doc_id % 100) * 10) AS energy_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed forms of the synthesized gray ramp: the Spark side builds
    // a real animated GIF from these parameters and decodes it with the
    // REAL javax.imageio multi-frame reader — a match means the whole
    // container→LZW→palette→frame-stats round-trip is byte-correct
    "docs_video_frames" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(6 + (doc_id % 6) AS INT) AS width,
        |    CAST(6 + (doc_id % 5) AS INT) AS height,
        |    CAST(3 + (n_chars % 6) AS INT) AS n_frames,
        |    CAST((doc_id * 7) % 200 AS INT) AS base,
        |    CAST(1 + (doc_id % 9) AS INT) AS step
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, width, height, n_frames,
        |    list_transform(generate_series(0, n_frames - 1),
        |      i -> (base + i * step) % 256) AS means
        |  FROM p)
        |SELECT doc_id, width, height, n_frames,
        |  CAST(list_sum(means) AS BIGINT) AS mean_sum,
        |  CAST(list_max(means) AS INT) AS peak_mean,
        |  CAST(means[n_frames // 2 + 1] AS INT) AS mid_mean
        |FROM g ORDER BY doc_id""".stripMargin,
    // byte-level mirror of the frame sampler: the payload is utf-8 of
    // ASCII text, so ascii(substring(...)) IS the byte value
    "docs_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, strlen(text) AS n, text,
        |         unnest(generate_series(0, greatest((strlen(text) - 8) // 24, 0))) AS k
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(k * 24 AS INT) AS frame_offset,
        |    CAST(least(k * 24 + 32, n) - k * 24 AS INT) AS frame_len,
        |    CAST(list_sum(list_transform(generate_series(k * 24 + 1, least(k * 24 + 32, n)),
        |      i -> ascii(substring(text, i, 1)))) AS BIGINT) AS frame_sum
        |  FROM f WHERE k % 2 = 0)
        |SELECT doc_id, frame_idx, frame_offset, frame_len, frame_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
