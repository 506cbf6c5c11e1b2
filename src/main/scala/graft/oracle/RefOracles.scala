package graft.oracle

import OracleCtes._

/** DuckDB oracles for the pipe-for-pipe reference endpoints (ref_*): each
  * re-expresses a reference `.pipe` in DuckDB SQL over the SAME
  * deterministic fixture parquet the engine reads (absolute tmpdir path;
  * Verify materializes the fixtures before dumping oracle_sql.json). */
private[graft] object RefOracles {
  val sql: Map[String, String] = Map(
    // users_api_rmt.pipe:6 over users_mv.pipe:4-17 (PG dialect)
    "ref_users_api_rmt" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |    coalesce(address, '') AS address,
         |    coalesce(phone_number, '') AS phone_number,
         |    coalesce(email_verified, 0) AS email_verified,
         |    coalesce(onboarded, 0) AS onboarded, coalesce(deleted, 0) AS deleted,
         |    __timestamp AS event_timestamp,
         |    rpad(coalesce(lang, ''), 2, ' ') AS lang,
         |    make_timestamp(coalesce(created_at, 0)) AS created_at,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at
         |  FROM ${fixtureSqlPath("users_raw")})
         |SELECT id, name, email, address, phone_number, email_verified,
         |       onboarded, deleted, event_timestamp, lang, created_at, updated_at
         |FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn FROM mv)
         |WHERE rn = 1 ORDER BY id""".stripMargin,
    // snapshot diff over the same mv collapse as ref_users_api_rmt
    "ref_users_snapshot_diff" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(email, '') AS email, coalesce(deleted, 0) AS deleted,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at
         |  FROM ${fixtureSqlPath("users_raw")}),
         |s1 AS (
         |  SELECT id, updated_at AS old_updated_at, email AS old_email
         |  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |        FROM mv WHERE updated_at <= TIMESTAMP '2024-05-01 00:15:00')
         |  WHERE rn = 1),
         |s2 AS (
         |  SELECT id, updated_at AS new_updated_at, email AS new_email, deleted AS new_deleted
         |  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn FROM mv)
         |  WHERE rn = 1),
         |d AS (
         |  SELECT s2.id, old_updated_at, new_updated_at, old_email, new_email, new_deleted,
         |    CASE WHEN old_updated_at IS NULL THEN 'insert'
         |         WHEN old_updated_at < new_updated_at THEN 'update'
         |         ELSE 'unchanged' END AS change_type
         |  FROM s2 LEFT JOIN s1 ON s2.id = s1.id)
         |SELECT id, change_type, old_updated_at, new_updated_at,
         |       old_email, new_email, new_deleted
         |FROM d WHERE change_type != 'unchanged' ORDER BY id""".stripMargin,
    "users_scd2_history" ->
      s"""WITH mv AS (
         |  SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |    coalesce(deleted, 0) AS deleted,
         |    coalesce(make_timestamp(updated_at), __timestamp) AS updated_at,
         |    __timestamp AS event_timestamp
         |  FROM ${fixtureSqlPath("users_raw")})
         |SELECT id, CAST(version AS INT) AS version, name, email, deleted,
         |       valid_from, valid_to, is_current
         |FROM (
         |  SELECT id, name, email, deleted,
         |    row_number() OVER w AS version,
         |    updated_at AS valid_from,
         |    lead(updated_at) OVER w AS valid_to,
         |    (lead(updated_at) OVER w IS NULL) AS is_current
         |  FROM mv
         |  WINDOW w AS (PARTITION BY id ORDER BY updated_at, event_timestamp))
         |ORDER BY id, version""".stripMargin,
    // users_api.pipe (mysql): SELECT * FROM users_latest FINAL ORDER BY id
    "ref_users_api_mysql" ->
      s"""SELECT id, name, email, address, phone_number, email_verified,
         |       onboarded, deleted, created_at, updated_at,
         |       __timestamp AS event_timestamp, rpad(lang, 2, ' ') AS lang
         |FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |      FROM ${fixtureSqlPath("users_raw_mysql")})
         |WHERE rn = 1 ORDER BY id""".stripMargin,
    // users_api_batch.pipe:3-53 — after a full-log copy generation the
    // snapshot is the per-id latest row with the MV's coalesce defaults
    "ref_users_api_batch" ->
      s"""WITH latest AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY updated_at DESC) rn
         |                 FROM ${fixtureSqlPath("users_raw")}) WHERE rn = 1)
         |SELECT id, coalesce(name, '') AS name, coalesce(email, '') AS email,
         |  coalesce(address, '') AS address,
         |  coalesce(phone_number, '') AS phone_number,
         |  coalesce(email_verified, 0) AS email_verified,
         |  coalesce(onboarded, 0) AS onboarded, coalesce(deleted, 0) AS deleted,
         |  __timestamp AS event_timestamp,
         |  rpad(coalesce(lang, ''), 2, ' ') AS lang,
         |  make_timestamp(coalesce(created_at, 0)) AS created_at,
         |  make_timestamp(updated_at) AS updated_at
         |FROM latest WHERE coalesce(deleted, 0) = 0 ORDER BY id""".stripMargin,
    // latest_*_info.pipe:6-9
    "ref_latest_flight_info" ->
      s"""SELECT id, flight_number, status, passenger_count, departed_at, closed_at
         |FROM ${latestBy(fixtureSqlPath("flights_raw"))} ORDER BY id""".stripMargin,
    "ref_latest_passenger_info" ->
      s"""SELECT id, flight_id, status
         |FROM ${latestBy(fixtureSqlPath("passengers_raw"))} ORDER BY id""".stripMargin,
    "ref_latest_baggage_info" ->
      s"""SELECT id, flight_id, status, weight
         |FROM ${latestBy(fixtureSqlPath("baggage_raw"))} ORDER BY id""".stripMargin,
    // active_flights_past_hour.pipe:6-13
    "ref_active_flights_past_hour" ->
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")})
         |SELECT date_trunc('minute', updated_at) AS time_interval,
         |       count(DISTINCT id) AS active_flights
         |FROM ${fixtureSqlPath("flights_raw")} CROSS JOIN nf
         |WHERE created_at > now_ts - INTERVAL 1 HOUR AND departed_at IS NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // flights_missed_pct_minute.pipe:3-60
    "ref_flights_missed_pct_minute" ->
      s"""$missedPctCtes
         |SELECT time_interval, flights_missed_pct FROM missed ORDER BY 1""".stripMargin,
    // active_vs_missed_flights.pipe:6-12
    "ref_active_vs_missed_flights" ->
      s"""$missedPctCtes
         |SELECT m.time_interval, m.flights_missed_pct, a.active_flights
         |FROM missed m JOIN act a ON m.time_interval = a.time_interval
         |ORDER BY 1""".stripMargin,
    // passenger_activity.pipe:3-47
    "ref_passenger_activity" ->
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")}),
         |node0 AS (
         |  SELECT id, date_trunc('minute', checkedin_at) AS started_at,
         |         date_trunc('minute', coalesce(onboarded_at, notboarded_at)) AS completed_at
         |  FROM ${fixtureSqlPath("passengers_raw")} CROSS JOIN nf
         |  WHERE updated_at > now_ts - INTERVAL 1 HOUR),
         |n1 AS (SELECT started_at AS iv, count(DISTINCT id) AS passengers_checkedin
         |       FROM node0 GROUP BY 1),
         |n2 AS (SELECT completed_at AS iv, count(DISTINCT id) AS passengers_completed
         |       FROM node0 GROUP BY 1)
         |SELECT n1.iv AS "interval", passengers_checkedin, passengers_completed
         |FROM n1 JOIN n2 ON n1.iv = n2.iv ORDER BY n1.iv""".stripMargin,
    // passengers_by_flight_status.pipe:3-38
    "ref_passengers_by_flight_status" ->
      s"""$airportProlog,
         |j AS (
         |  SELECT f.flight_number, f.passenger_count, f.status AS flight_status,
         |         p.status AS pstatus
         |  FROM f LEFT JOIN p ON p.flight_id = f.id CROSS JOIN nf
         |  WHERE f.status != 'departed' OR
         |        (f.status = 'departed' AND f.departed_at > now_ts - INTERVAL 20 SECOND))
         |SELECT flight_number, flight_status, passenger_count AS booked,
         |  count(CASE WHEN pstatus = 'checkedin' AND flight_status IN ('open', 'closed') THEN 1 END) AS checkedin,
         |  count(CASE WHEN pstatus = 'checkedin' AND flight_status = 'boarding' THEN 1 END) AS boarding,
         |  count(CASE WHEN pstatus = 'onboarded' AND flight_status IN ('boarding', 'boarded', 'departed') THEN 1 END) AS onboarded,
         |  count(CASE WHEN pstatus = 'notboarded' AND flight_status IN ('boarded', 'departed') THEN 1 END) AS notboarded,
         |  passenger_count
         |    - (count(CASE WHEN pstatus = 'checkedin' AND flight_status IN ('open', 'closed') THEN 1 END)
         |       + count(CASE WHEN pstatus = 'checkedin' AND flight_status = 'boarding' THEN 1 END)
         |       + count(CASE WHEN pstatus = 'onboarded' AND flight_status IN ('boarding', 'boarded', 'departed') THEN 1 END)
         |       + count(CASE WHEN pstatus = 'notboarded' AND flight_status IN ('boarded', 'departed') THEN 1 END)) AS notcheckedin
         |FROM j GROUP BY flight_number, passenger_count, flight_status
         |ORDER BY $flightRankSql, flight_number""".stripMargin,
    // baggage_by_flight_status.pipe:3-26 (integer-cent exact sums,
    // mirroring the engine's exactSum canon)
    "ref_baggage_by_flight_status" -> {
      def wsum(status: String, as: String) =
        s"""CAST(sum(CAST(floor((CASE WHEN bstatus = '$status' THEN weight
           |  ELSE CAST(0 AS DOUBLE) END) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS $as""".stripMargin
      s"""WITH nf AS (SELECT max(__timestamp) AS now_ts FROM ${fixtureSqlPath("flights_raw")}),
         |f AS ${latestBy(fixtureSqlPath("flights_raw"))},
         |b AS ${latestBy(fixtureSqlPath("baggage_raw"))},
         |j AS (
         |  SELECT f.flight_number, f.departed_at AS f_departed,
         |         f.status AS flight_status, b.status AS bstatus, b.weight
         |  FROM f LEFT JOIN b ON b.flight_id = f.id CROSS JOIN nf
         |  WHERE f.departed_at IS NULL OR f.departed_at > now_ts - INTERVAL 30 SECOND)
         |SELECT flight_number, flight_status,
         |  ${wsum("checkedin", "baggage_checkedin")},
         |  ${wsum("loaded", "baggage_loaded")},
         |  ${wsum("offloaded", "baggage_offloaded")}
         |FROM j GROUP BY flight_number, f_departed, flight_status
         |ORDER BY $flightRankSql, flight_number""".stripMargin
    },
  )
}
