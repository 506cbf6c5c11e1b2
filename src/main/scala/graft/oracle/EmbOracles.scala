package graft.oracle

import graft.operators
import OracleCtes._

/** DuckDB oracle SQL — embeddings (vector) family (see OracleCtes for shared fragments). */
private[graft] object EmbOracles {
  val sql: Map[String, String] = Map(
    "emb_near_dup_pairs" ->
      s"""WITH $embNearDupCtes
        |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    // the layout-served form is result-identical by construction (same
    // assignment canon, same pair kernel — pairsFromProbes is ONE
    // definition); the oracle states that identity in code
    "emb_near_dup_pairs_ivf" ->
      s"""WITH $embNearDupCtes
        |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    // increment screening over the layout: incoming (vec_id%10=0)
    // probe lists vs existing layout rows; best exact match >= 0.4
    // decides near_dup vs novel (CTEs shared with emb_near_dup_pairs)
    "emb_screen_increment" ->
      s"""WITH $embNearDupCtes,
        |inc AS (SELECT vec_id, list_id FROM probes WHERE vec_id % 10 = 0),
        |ex  AS (SELECT vec_id, list_id FROM probes WHERE vec_id % 10 != 0),
        |scand AS (SELECT DISTINCT i.vec_id AS vec_a, e.vec_id AS vec_b
        |          FROM inc i JOIN ex e USING (list_id)),
        |sc AS (
        |  SELECT vec_a, vec_b,
        |    floor(list_sum(list_transform(generate_series(1, len(x.embedding)),
        |      i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM scand JOIN embeddings x ON x.vec_id = scand.vec_a
        |             JOIN embeddings y ON y.vec_id = scand.vec_b),
        |best AS (
        |  SELECT vec_a, vec_b, cosine FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS rn
        |    FROM sc WHERE cosine >= 0.4) WHERE rn = 1)
        |SELECT e.vec_id,
        |  CASE WHEN best.vec_b IS NOT NULL THEN 'near_dup' ELSE 'novel' END AS verdict,
        |  best.vec_b AS matched_vec, best.cosine AS cosine
        |FROM embeddings e LEFT JOIN best ON best.vec_a = e.vec_id
        |WHERE e.vec_id % 10 = 0
        |ORDER BY e.vec_id""".stripMargin,
    // same recursive-closure shape as docs_dup_clusters, over the
    // embedding pair graph (CTEs shared with emb_near_dup_pairs)
    "emb_dup_clusters" ->
      s"""WITH RECURSIVE $embNearDupCtes,
        |pairs AS (SELECT vec_a, vec_b FROM p WHERE cosine >= 0.4),
        |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        |          UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach AS (
        |  SELECT src AS vec_id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.vec_id),
        |lab AS (SELECT vec_id, min(r) AS cluster_id FROM reach GROUP BY vec_id)
        |SELECT vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY cluster_id, vec_id""".stripMargin,
    "emb_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, CAST(127 AS DOUBLE) / max_abs AS scale_f,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (CAST(127 AS DOUBLE) / max_abs) + 0.5) AS BIGINT)) AS q
        |  FROM m)
        |SELECT vec_id, floor(scale_f * 1000000 + 0.5) / 1000000.0 AS scale,
        |  CAST(list_min(q) AS BIGINT) AS q_min,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum
        |FROM s ORDER BY vec_id""".stripMargin,
    "emb_kmeans" -> kmeansOracleSql(
      nLists = operators.VectorOps.KmeansLists,
      iters = operators.VectorOps.KmeansIters),
    "emb_centroid_update" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    floor(list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS sim
        |  FROM embeddings e, anchors),
        |assigned AS (
        |  SELECT embedding, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn FROM sims)
        |  WHERE rn = 1),
        |ex AS (
        |  SELECT list_id, CAST(g - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[g] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
        |  FROM assigned, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS g))
        |SELECT list_id, dim, count(*) AS n_vectors,
        |  floor(CAST(sum(xs) AS BIGINT) / (count(*) * 1000000.0) * 1000000 + 0.5) / 1000000.0 AS centroid
        |FROM ex GROUP BY list_id, dim ORDER BY list_id, dim""".stripMargin,
    // per-source integer-unit centroid (the centroidUpdate contract),
    // cosine of each doc to its OWN source's centroid, bottom-m per
    // source; inner join — docs without embeddings have no signal
    "emb_source_outliers" ->
      """WITH j AS (
        |  SELECT d.doc_id, d.source, e.embedding
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |x AS (
        |  SELECT source, CAST(g - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[g] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
        |  FROM j, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS g)),
        |c AS (
        |  SELECT source, dim,
        |    floor(CAST(sum(xs) AS BIGINT) / (count(*) * 1000000.0) * 1000000 + 0.5) / 1000000.0 AS centroid
        |  FROM x GROUP BY 1, 2),
        |cv AS (
        |  SELECT source, list_transform(list(centroid ORDER BY dim), c -> CAST(c AS REAL)) AS cvec
        |  FROM c GROUP BY 1),
        |s AS (
        |  SELECT j.doc_id, j.source,
        |    floor(
        |      list_sum(list_transform(generate_series(1, len(cvec)),
        |        i -> CAST(j.embedding[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(j.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM j JOIN cv USING (source)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY cosine, doc_id) AS outlier_rank
        |  FROM s)
        |SELECT source, outlier_rank, doc_id, cosine
        |FROM r WHERE outlier_rank <= 5 ORDER BY source, outlier_rank""".stripMargin,
    "emb_norms" ->
      """SELECT vec_id, label,
        |  floor(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000.0 AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_knn_bruteforce" ->
      s"""WITH $knnBfCtes
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM bfr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // recall@k acceptance gate: LSH top-k vs the brute-force truth —
    // both sides are the SAME CTE text as their standalone oracles
    "emb_ann_recall" ->
      s"""WITH $knnBfCtes,
        |$knnLshCtes,
        |bf AS (SELECT query_id, neighbor_id FROM bfr WHERE rn <= 5),
        |ls AS (SELECT query_id, neighbor_id FROM lshr WHERE rn <= 5)
        |SELECT bf.query_id, count(*) AS n_truth,
        |  CAST(sum(CASE WHEN ls.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  floor(CAST(sum(CASE WHEN ls.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*) * 10000 + 0.5) / 10000.0 AS recall_at_k
        |FROM bf LEFT JOIN ls ON bf.query_id = ls.query_id AND bf.neighbor_id = ls.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // hard negatives: the brute-force scoring contract with the label
    // inequality in the join — top-k most-similar DIFFERENT-label
    "emb_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS query_label
        |  FROM embeddings WHERE vec_id < 20),
        |s AS (
        |  SELECT query_id, query_label, e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM q, embeddings e WHERE e.vec_id != q.query_id AND e.label != q.query_label),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
        |SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // multi-table multi-probe hyperplane LSH — fully re-derivable in
    // SQL because the planes come from md5 (VectorOps.planeComponent):
    // component (t,p,i) = first-4-bytes-BE of md5('p|t|p|i') mapped to
    // [-1,1) and rounded to float, every step exact in double on both
    // engines. Buckets are sign bits, probes flip one bit, candidates
    // dedupe, cosines rank 6dp-rounded with neighbor tie-break.
    "emb_knn_lsh" ->
      s"""WITH $knnLshCtes
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM lshr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    "emb_ivf_assign" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT e.vec_id, list_id,
        |    floor(list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS sim
        |  FROM embeddings e, anchors),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn FROM s)
        |SELECT list_id, count(*) AS n_vectors,
        |  floor(CAST(sum(CAST(floor(sim * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
        |        / (count(*) * 1000000.0) * 10000 + 0.5) / 10000.0 AS avg_sim
        |FROM r WHERE rn = 1 GROUP BY list_id ORDER BY list_id""".stripMargin,
    // ADC: per-query LUT of subspace distances to every codeword,
    // corpus scored by summing the entries its codes select (exact
    // 6dp integer units -> order-invariant ranking)
    "emb_knn_pq" ->
      """WITH anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS s),
        |dists AS (
        |  SELECT e.vec_id, subs.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a, subs),
        |codes AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT q.vec_id AS query_id, subs.s, a.code,
        |    CAST(floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) AS BIGINT) AS units
        |  FROM embeddings q, anchors a, subs WHERE q.vec_id < 20),
        |scored AS (
        |  SELECT lut.query_id, codes.vec_id AS neighbor_id,
        |         CAST(sum(units) AS BIGINT) / 1000000.0 AS adc_dist
        |  FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.code
        |  WHERE codes.vec_id != lut.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_dist, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // IVF pruning + ADC scoring composed (shares the code/LUT CTE text
    // with emb_knn_pq and the assignment shape with emb_knn_ivf)
    "emb_knn_ivf_pq" ->
      """WITH lanchors AS (
        |  SELECT vec_id AS list_id, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 8),
        |lsims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(a.anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS sim
        |  FROM embeddings e, lanchors a),
        |assigned AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
        |    FROM lsims) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
        |    FROM lsims WHERE vec_id < 20) WHERE rn <= 3),
        |anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS s),
        |dists AS (
        |  SELECT e.vec_id, subs.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a, subs),
        |codes AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT q.vec_id AS query_id, subs.s, a.code,
        |    CAST(floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))
        |         * (CAST(q.embedding[subs.s * 8 + i] AS DOUBLE) - CAST(a.anchor[subs.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) AS BIGINT) AS units
        |  FROM embeddings q, anchors a, subs WHERE q.vec_id < 20),
        |cand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM assigned a JOIN probes p USING (list_id)
        |  WHERE a.vec_id != p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id AS neighbor_id,
        |         CAST(sum(units) AS BIGINT) / 1000000.0 AS adc_dist
        |  FROM cand c JOIN codes k ON k.vec_id = c.vec_id
        |              JOIN lut ON lut.query_id = c.query_id
        |                      AND lut.s = k.s AND lut.code = k.code
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_dist, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // PQ: nearest per-subspace codeword by 6dp squared euclidean,
    // code-index tie-break; 8 4-bit codes packed little-endian
    "emb_pq_codes" ->
      """WITH anchors AS (
        |  SELECT CAST(vec_id AS INT) AS code, embedding AS anchor
        |  FROM embeddings WHERE vec_id < 16),
        |dists AS (
        |  SELECT e.vec_id, ss.s, a.code,
        |    floor(list_sum(list_transform(generate_series(1, 8),
        |      i -> (CAST(e.embedding[ss.s * 8 + i] AS DOUBLE) - CAST(a.anchor[ss.s * 8 + i] AS DOUBLE))
        |         * (CAST(e.embedding[ss.s * 8 + i] AS DOUBLE) - CAST(a.anchor[ss.s * 8 + i] AS DOUBLE))))
        |      * 1000000 + 0.5) / 1000000.0 AS d
        |  FROM embeddings e, anchors a,
        |       (SELECT unnest(generate_series(0, 7)) AS s) ss),
        |best AS (
        |  SELECT vec_id, s, code
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
        |        FROM dists)
        |  WHERE rn = 1)
        |SELECT vec_id, CAST(sum(code * (1::BIGINT << (4 * s))) AS BIGINT) AS pq_code
        |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "emb_knn_ivf" ->
      """WITH anchors AS (SELECT vec_id AS list_id, embedding AS anchor FROM embeddings WHERE vec_id < 8),
        |sims AS (
        |  SELECT e.vec_id, e.embedding, list_id,
        |    list_sum(list_transform(generate_series(1, len(anchor)),
        |      i -> CAST(anchor[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS sim
        |  FROM embeddings e, anchors),
        |assigned AS (
        |  SELECT vec_id, embedding, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn FROM sims)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS qe, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) rn
        |    FROM sims WHERE vec_id < 20)
        |  WHERE rn <= 3),
        |scored AS (
        |  SELECT query_id, a.vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(generate_series(1, len(qe)),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS cosine
        |  FROM assigned a JOIN probes p ON a.list_id = p.list_id
        |  WHERE a.vec_id != p.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rn FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
  )
}
