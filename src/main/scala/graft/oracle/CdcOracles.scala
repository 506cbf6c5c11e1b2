package graft.oracle

import graft.operators
import OracleCtes._

/** DuckDB oracle SQL — CDC/events/users/time-series family (see OracleCtes for shared fragments). */
private[graft] object CdcOracles {
  val sql: Map[String, String] = Map(
    "latest_event_per_user" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "users_latest_rmt" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "users_api_batch" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "active_users_per_hour" -> activeUsersOracle,
    "active_users_per_hour_salted" -> activeUsersOracle,
    // cohort triangle: first-seen week per user, per-cell distinct
    // actives; day diff of week-truncated stamps div 7 is pure integer
    "events_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1),
        |m AS (
        |  SELECT cohort_week,
        |    CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS weeks_since,
        |    count(DISTINCT uw.user_id) AS n_active
        |  FROM uw JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort_week, weeks_since, n_active, cohort_size,
        |  floor(CAST(n_active AS DOUBLE) * 100.0 / cohort_size * 100 + 0.5) / 100.0 AS retention_pct
        |FROM m JOIN sz USING (cohort_week) ORDER BY 1, 2""".stripMargin,
    "events_type_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (SELECT from_type, to_type, count(*) AS n FROM t
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  floor(n * 1.0 / sum(n) OVER (PARTITION BY from_type) * 10000 + 0.5) / 10000.0 AS share
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "users_weekly_churn" ->
      """WITH w1 AS (SELECT DISTINCT user_id FROM events
        |            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
        |w2 AS (SELECT DISTINCT user_id FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15')
        |SELECT user_id, status FROM (
        |  SELECT user_id, 'retained' AS status FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2)
        |  UNION ALL
        |  SELECT user_id, 'churned' FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2)
        |  UNION ALL
        |  SELECT user_id, 'new' FROM (SELECT * FROM w2 EXCEPT SELECT * FROM w1))
        |ORDER BY user_id, status""".stripMargin,
    "customer_reconcile" ->
      """WITH high AS (
        |  SELECT o_custkey AS hk, count(*) AS n_high FROM orders
        |  WHERE o_totalprice > 400000 GROUP BY 1),
        |recent AS (
        |  SELECT o_custkey AS rk, count(*) AS n_recent FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1)
        |SELECT coalesce(hk, rk) AS custkey,
        |  CASE WHEN hk IS NOT NULL AND rk IS NOT NULL THEN 'both'
        |       WHEN hk IS NOT NULL THEN 'high_only'
        |       ELSE 'recent_only' END AS status,
        |  coalesce(n_high, 0) AS n_high,
        |  coalesce(n_recent, 0) AS n_recent
        |FROM high FULL OUTER JOIN recent ON hk = rk
        |ORDER BY custkey""".stripMargin,
    "active_users_7d_sliding" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |mx AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
        |cov AS (SELECT CAST(day + CAST(g AS INT) AS TIMESTAMP) AS cover_day, user_id
        |        FROM du, LATERAL (SELECT unnest(generate_series(0, 6)) AS g))
        |SELECT cover_day, count(DISTINCT user_id) AS active_users_7d
        |FROM cov, mx WHERE cover_day <= max_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // KMV sketch: approximate distinct with DETERMINISTIC arithmetic —
    // the hash, ranking, and double normalization reproduce exactly,
    // so unlike HLL this sketch is hash-match oracled. The shared CTE
    // is the stored partial (≤ k smallest hashes per hour).
    "active_users_kmv_per_hour" ->
      s"""WITH ${kmvKeptCte()}
        |${kmvSelect("kept", "time_interval")}""".stripMargin,
    // merged day partials == direct day sketch, exactly (the k
    // smallest of a union of per-hour k-minima are the day's k minima)
    "active_users_kmv_daily" ->
      s"""WITH ${kmvKeptCte()},
        |dayu AS (SELECT DISTINCT date_trunc('day', time_interval) AS day, h FROM kept)
        |${kmvSelect("dayu", "day")}""".stripMargin,
    // the approximate endpoints, re-expressed over the deterministic
    // KMV sketch at k=256 (the HLL variants remain spec-only): the
    // APPROXIMATE estimates are hash-match oracled
    "active_users_per_hour_approx" ->
      s"""WITH ${kmvKeptCte(256)}
        |${kmvSelect("kept", "time_interval", 256, "active_users_approx")}""".stripMargin,
    "active_users_sketch_rollup" ->
      s"""WITH ${kmvKeptCte(256)},
        |weeku AS (SELECT DISTINCT date_trunc('week', time_interval) AS week, h FROM kept),
        |est AS (${kmvSelect("weeku", "week", 256)}),
        |ev AS (SELECT date_trunc('week', ts) AS week, count(*) AS events
        |       FROM events, anchor WHERE ts > a - INTERVAL 30 DAY GROUP BY 1)
        |SELECT est.week, active_users_est, events
        |FROM est JOIN ev ON est.week = ev.week ORDER BY 1""".stripMargin,
    // KMV set-operation estimates: union = k smallest of merged
    // k-minima; intersection = union est × fraction of the union
    // sketch's minima present in both sides — every hash, rank and
    // IEEE step mirrored, so the approximate Jaccard is hash-matched
    "events_kmv_overlap" ->
      s"""WITH hashed AS (
        |  SELECT DISTINCT event_type, ${graft.functions.OracleHash.duckLow64("(user_id)::VARCHAR")} AS h FROM events),
        |kept AS (
        |  SELECT event_type, h, rn FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hashed)
        |  WHERE rn <= 128),
        |pte AS (
        |  SELECT event_type, ${kmvEstSql("n", "hk", 128)} AS est_users
        |  FROM (SELECT event_type, count(*) AS n, max(CASE WHEN rn = 128 THEN h END) AS hk
        |        FROM kept GROUP BY 1)),
        |ty AS (SELECT DISTINCT event_type FROM kept),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |       FROM ty a, ty b WHERE a.event_type < b.event_type),
        |mem AS (
        |  SELECT type_a, type_b, h,
        |    max(CASE WHEN k.event_type = type_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN k.event_type = type_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pr JOIN kept k ON k.event_type = type_a OR k.event_type = type_b
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn FROM mem),
        |ag AS (
        |  SELECT type_a, type_b, count(*) AS n_union,
        |    max(CASE WHEN rn = 128 THEN h END) AS hk,
        |    sum(CASE WHEN rn <= 128 AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
        |  FROM rk GROUP BY 1, 2),
        |fin AS (
        |  SELECT type_a, type_b, ${kmvEstSql("n_union", "hk", 128)} AS eu,
        |    CAST(n_both AS DOUBLE) / CAST(least(n_union, 128) AS DOUBLE) AS jr
        |  FROM ag)
        |SELECT type_a, type_b,
        |  floor(a.est_users * 100 + 0.5) / 100.0 AS est_users_a,
        |  floor(b.est_users * 100 + 0.5) / 100.0 AS est_users_b,
        |  floor(eu * 100 + 0.5) / 100.0 AS est_union,
        |  floor(jr * eu * 100 + 0.5) / 100.0 AS est_intersection,
        |  floor(jr * 10000 + 0.5) / 10000.0 AS est_jaccard
        |FROM fin JOIN pte a ON a.event_type = fin.type_a
        |         JOIN pte b ON b.event_type = fin.type_b
        |ORDER BY type_a, type_b""".stripMargin,
    // bottom-k quantile sketch: sample membership by md5 rank of the
    // unique event_id; quantile indices are PURE INTEGER ceil(q·n) =
    // (q_num·n + q_den−1) // q_den, values only selected, never
    // transformed — so the APPROXIMATE quantiles hash-match
    "events_quantile_sketch" ->
      s"""WITH base AS (SELECT event_type, event_id, value FROM events),
        |samp AS (
        |  SELECT event_type, event_id, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
        |    FROM (SELECT event_type, event_id, value,
        |            ${graft.functions.OracleHash.duckLow64("(event_id)::VARCHAR")} AS h
        |          FROM base))
        |  WHERE rn <= 256),
        |eq AS (
        |  SELECT event_type, max(n) AS n,
        |    max(CASE WHEN vrn = greatest((1 * n + 1) // 2, 1) THEN value END) AS exact_p50,
        |    max(CASE WHEN vrn = greatest((9 * n + 9) // 10, 1) THEN value END) AS exact_p90,
        |    max(CASE WHEN vrn = greatest((99 * n + 99) // 100, 1) THEN value END) AS exact_p99
        |  FROM (SELECT event_type, value,
        |          count(*) OVER (PARTITION BY event_type) AS n,
        |          row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrn
        |        FROM base) GROUP BY 1),
        |sq AS (
        |  SELECT event_type, max(n) AS n_sample,
        |    max(CASE WHEN vrn = greatest((1 * n + 1) // 2, 1) THEN value END) AS est_p50,
        |    max(CASE WHEN vrn = greatest((9 * n + 9) // 10, 1) THEN value END) AS est_p90,
        |    max(CASE WHEN vrn = greatest((99 * n + 99) // 100, 1) THEN value END) AS est_p99
        |  FROM (SELECT event_type, value,
        |          count(*) OVER (PARTITION BY event_type) AS n,
        |          row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrn
        |        FROM samp) GROUP BY 1)
        |SELECT event_type, n, n_sample, est_p50, est_p90, est_p99,
        |       exact_p50, exact_p90, exact_p99
        |FROM sq JOIN eq USING (event_type) ORDER BY event_type""".stripMargin,
    "error_pct_per_hour" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |         count(*) AS total
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS s, date_trunc('hour', max(ts)) AS e FROM events),
        |series AS (SELECT unnest(generate_series(s, e, INTERVAL 1 HOUR)) AS time_interval FROM bounds)
        |SELECT series.time_interval,
        |       COALESCE(errors, 0) AS errors,
        |       COALESCE(total, 0) AS total,
        |       COALESCE(floor(errors * 100.0 / nullif(total, 0) * 100 + 0.5) / 100.0, 0.0) AS error_pct
        |FROM series LEFT JOIN agg ON series.time_interval = agg.h
        |ORDER BY series.time_interval""".stripMargin,
    "active_vs_errors" ->
      """WITH anchor AS (SELECT max(ts) AS a FROM events),
        |act AS (
        |  SELECT date_trunc('hour', ts) AS time_interval, count(DISTINCT user_id) AS active_users
        |  FROM events, anchor WHERE ts > a - INTERVAL 30 DAY GROUP BY 1),
        |agg AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |         count(*) AS total
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT date_trunc('hour', min(ts)) AS s, date_trunc('hour', max(ts)) AS e FROM events),
        |series AS (SELECT unnest(generate_series(s, e, INTERVAL 1 HOUR)) AS time_interval FROM bounds),
        |err AS (
        |  SELECT series.time_interval,
        |         COALESCE(errors, 0) AS errors,
        |         COALESCE(total, 0) AS total,
        |         COALESCE(floor(errors * 100.0 / nullif(total, 0) * 100 + 0.5) / 100.0, 0.0) AS error_pct
        |  FROM series LEFT JOIN agg ON series.time_interval = agg.h)
        |SELECT act.time_interval, act.active_users, err.errors, err.error_pct
        |FROM act JOIN err ON act.time_interval = err.time_interval
        |ORDER BY act.time_interval""".stripMargin,
    "user_activity" ->
      """WITH p AS (
        |  SELECT date_trunc('day', ts) AS interval, count(DISTINCT user_id) AS purchasers
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT date_trunc('day', ts) AS interval, count(DISTINCT user_id) AS clickers
        |  FROM events WHERE event_type = 'click' GROUP BY 1)
        |SELECT p.interval, p.purchasers, c.clickers
        |FROM p JOIN c ON p.interval = c.interval ORDER BY p.interval""".stripMargin,
    "events_by_type_status" ->
      """SELECT event_type,
        |  count(*) AS total,
        |  CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS low,
        |  CAST(sum(CASE WHEN value >= 50 AND value < 150 THEN 1 ELSE 0 END) AS BIGINT) AS mid,
        |  CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  count(*) - CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |           - CAST(sum(CASE WHEN value >= 50 AND value < 150 THEN 1 ELSE 0 END) AS BIGINT)
        |           - CAST(sum(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS unbanded
        |FROM events GROUP BY event_type
        |ORDER BY CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2
        |  WHEN 'click' THEN 3 WHEN 'view' THEN 4 WHEN 'error' THEN 5 ELSE 6 END, event_type""".stripMargin,
    "value_by_type_status" ->
      """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS purchase_value,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'click' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS click_value,
        |  CAST(sum(CAST(floor(CASE WHEN event_type = 'error' THEN value ELSE 0 END * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS error_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_ingest_normalize" ->
      """SELECT event_id, user_id, ts,
        |  CAST(json_extract(props, '$.k') AS INT) AS prop_k,
        |  COALESCE(value, 0.0) AS value_filled,
        |  rpad(event_type, 10, ' ') AS event_type_fixed
        |FROM events ORDER BY event_id""".stripMargin,
    "events_sessionization" ->
      s"""WITH $sessionCtes
        |SELECT user_id, session_id, session_start, session_end, n_events, session_value
        |FROM sess ORDER BY user_id, session_id""".stripMargin,
    // binned interval self-join ≡ the plain non-equi overlap join
    "events_session_concurrency" ->
      s"""WITH $sessionCtes
        |SELECT s1.user_id, s1.session_id, s1.session_start, s1.session_end,
        |  count(s2.user_id) AS concurrent_sessions
        |FROM sess s1 LEFT JOIN sess s2
        |  ON s2.user_id != s1.user_id
        | AND s2.session_start <= s1.session_end
        | AND s1.session_start <= s2.session_end
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2""".stripMargin,
    "events_surge_windows" ->
      s"""WITH $surgeCtes
        |SELECT surge_type, window_start, window_end, surge_events
        |FROM win ORDER BY surge_type, window_start""".stripMargin,
    "events_interval_join" ->
      s"""WITH $surgeCtes
        |SELECT w.surge_type, w.window_start, w.window_end, e.event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS value_sum
        |FROM win w JOIN events e
        |  ON e.ts >= w.window_start AND e.ts < w.window_end
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 4""".stripMargin,
    "events_retention" ->
      """WITH first_seen AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |sizes AS (
        |  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
        |  FROM first_seen GROUP BY cohort_week),
        |r AS (
        |  SELECT f.cohort_week, CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS weeks_since,
        |         count(DISTINCT a.user_id) AS active_users
        |  FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        |  GROUP BY 1, 2)
        |SELECT r.cohort_week, r.weeks_since, r.active_users, sizes.cohort_size,
        |  floor(r.active_users * 100.0 / sizes.cohort_size * 100 + 0.5) / 100.0 AS retention_pct
        |FROM r JOIN sizes ON r.cohort_week = sizes.cohort_week
        |ORDER BY r.cohort_week, r.weeks_since""".stripMargin,
    "events_value_quantiles" ->
      """SELECT event_type,
        |  floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000.0 AS p95,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_value_histogram" ->
      """WITH hist AS (
        |  SELECT event_type, CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) // 100 AS bin,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT *,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM hist)
        |SELECT event_type, max(total) AS n_total, count(*) AS n_bins,
        |  min(CASE WHEN cum >= ceil(total * CAST(0.5 AS DOUBLE)) THEN bin END) AS p50_bin,
        |  min(CASE WHEN cum >= ceil(total * CAST(0.95 AS DOUBLE)) THEN bin END) AS p95_bin,
        |  max(bin) AS max_bin
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 7 DAY
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(ts) AS t3
        |  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 AND ts <= t1 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |  1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS funnel_level
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,
    "events_grouping_sets" ->
      """WITH e AS (
        |  SELECT event_type, dayofweek(ts) + 1 AS dow,
        |    CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) / CAST(100 AS DOUBLE) AS total_value,
        |  CAST(GROUPING(event_type) AS INT) AS g_type,
        |  CAST(GROUPING(dow) AS INT) AS g_dow
        |FROM e GROUP BY GROUPING SETS ((event_type), (dow), ())
        |ORDER BY g_type, g_dow, event_type NULLS FIRST, dow NULLS FIRST""".stripMargin,
    "events_rolling_value" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
        |    / CAST(100 AS DOUBLE) AS rolling_value,
        |  CAST(count(*) OVER w AS BIGINT) AS n_in_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "user_value_deciles" ->
      """WITH t AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      / CAST(100 AS DOUBLE) AS total_value
        |  FROM events GROUP BY user_id)
        |SELECT user_id, total_value,
        |  CAST(ntile(10) OVER (ORDER BY total_value DESC, user_id) AS INT) AS decile
        |FROM t ORDER BY user_id""".stripMargin,
    // RFM quintiles over deterministic total orders (metric + user_id
    // tiebreak; monetary coalesced to 0 — Spark and DuckDB disagree on
    // feature-store shape: 1/7/28-day trailing windows from ONE scan,
    // anchored to max(ts); last event = argmax by (ts, event_id)
    "user_window_features" ->
      """WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
        |lastev AS (
        |  SELECT user_id, event_type AS last_type
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
        |    CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_28d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 1 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_1d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 7 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_7d,
        |    coalesce(CAST(sum(CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) END) AS BIGINT), 0) / 100.0 AS value_28d,
        |    CAST(count(DISTINCT CASE WHEN ts > ref_ts - INTERVAL 28 DAY THEN event_type END) AS BIGINT) AS n_types_28d,
        |    max(ts) AS last_ts
        |  FROM events CROSS JOIN ref GROUP BY 1)
        |SELECT user_id, n_1d, n_7d, n_28d, value_1d, value_7d, value_28d,
        |  n_types_28d, last_ts, last_type
        |FROM agg JOIN lastev USING (user_id) ORDER BY user_id""".stripMargin,
    // default NULL placement in ORDER BY)
    "user_rfm_segments" ->
      """WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
        |per AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
        |    coalesce(CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT), 0) AS m_units
        |  FROM events GROUP BY 1),
        |base AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE)) AS INT) AS recency_days,
        |    frequency, m_units
        |  FROM per CROSS JOIN ref),
        |scored AS (
        |  SELECT user_id, recency_days, frequency, m_units,
        |    6 - CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS INT) AS r_score,
        |    6 - CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_score,
        |    6 - CAST(ntile(5) OVER (ORDER BY m_units DESC, user_id) AS INT) AS m_score
        |  FROM base)
        |SELECT user_id, recency_days, frequency, m_units / 100.0 AS monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM scored ORDER BY user_id""".stripMargin,
    // first/last-touch credit before the user's FIRST purchase; edges
    // ordered by the total (ts, event_id) order on both engines
    "user_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, ts AS purchase_ts, event_id AS p_eid, value AS attributed_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |        FROM events WHERE event_type = 'purchase')
        |  WHERE rn = 1),
        |t AS (
        |  SELECT e.user_id, e.event_type AS t_type, e.ts AS t_ts, e.event_id AS t_eid,
        |         fp.purchase_ts, fp.attributed_value
        |  FROM events e JOIN fp ON e.user_id = fp.user_id
        |  WHERE e.event_type IN ('click', 'view')
        |    AND (e.ts < fp.purchase_ts OR (e.ts = fp.purchase_ts AND e.event_id < fp.p_eid))),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_ts, t_eid) AS fr,
        |    row_number() OVER (PARTITION BY user_id ORDER BY t_ts DESC, t_eid DESC) AS lr,
        |    count(*) OVER (PARTITION BY user_id) AS n_touches
        |  FROM t)
        |SELECT f.user_id, f.t_type AS first_touch_type, f.t_ts AS first_touch_ts,
        |       l.t_type AS last_touch_type, l.t_ts AS last_touch_ts,
        |       f.purchase_ts, f.attributed_value,
        |       CAST(f.n_touches AS BIGINT) AS n_touches
        |FROM r f JOIN r l ON f.user_id = l.user_id AND l.lr = 1
        |WHERE f.fr = 1
        |ORDER BY f.user_id""".stripMargin,
    // first-5-event journey prefixes; (n_users DESC, path) total order
    // makes the LIMIT deterministic
    "user_event_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    "events_hourly_anomalies" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *,
        |    count(*) OVER w AS m,
        |    CAST(sum(cents) OVER w AS BIGINT) AS s,
        |    CAST(sum(cents * cents) OVER w AS BIGINT) AS q
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n_events,
        |  cents / CAST(100 AS DOUBLE) AS total_value,
        |  CAST(m AS BIGINT) AS trailing_n,
        |  CASE WHEN m * q - s * s > 0 THEN
        |    floor((cents * m - s) / sqrt(CAST(m * q - s * s AS DOUBLE)) * 10000 + 0.5) / 10000.0
        |  END AS z_score,
        |  (cents * m - s) * (cents * m - s) > 9 * (m * q - s * s) AS is_anomaly
        |FROM t WHERE m >= 8 ORDER BY event_type, hour""".stripMargin,
    "events_quarantine" ->
      """SELECT event_id, user_id, props FROM events
        |WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL
        |ORDER BY event_id""".stripMargin,
    "events_in_window" ->
      """WITH bounds AS (SELECT max(ts) - INTERVAL 7 DAY AS s, max(ts) AS e FROM events)
        |SELECT date_trunc('day', ts) AS day, count(*) AS events, count(DISTINCT user_id) AS users
        |FROM events, bounds WHERE ts >= s AND ts <= e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // as-of implementation — two entirely different algorithms, one
    // contract
    "events_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  c.click_event_id, c.ts AS click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "scalar_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_trunc('day', l_shipdate) AS ship_day,
        |  l_shipdate + INTERVAL 12 HOUR AS ship_noon,
        |  l_shipdate - INTERVAL 24 HOUR AS ship_prev,
        |  CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_yyyymm,
        |  floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100.0 AS net_price,
        |  COALESCE(nullif(l_returnflag, 'N'), '~') AS flag_or_tilde,
        |  rpad(l_linestatus, 2, ' ') AS status_fixed,
        |  CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS order_class
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
