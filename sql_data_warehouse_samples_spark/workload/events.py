"""Event-table workload: windowed aggregation, sessionization, JSON.

The reference is pure batch MPP (SURVEY §2.14) — the streaming surface is
the driver-mandated extension.  These queries exercise the *batch* semantics
of the same operators (tumbling/sliding/session windows) so they are
oracle-checkable; `sql_data_warehouse_samples_spark.streaming` wires the
identical expressions onto readStream/writeStream.

DuckDB reads the parquet `ts` (ns) as µs TIMESTAMP, same truncation Spark
applies, so boundaries agree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query
from ._util import dsum, tbl

# ---------------------------------------------------------------------------
# q37 — tumbling window aggregate (Structured Streaming's F.window in batch
# mode; epoch-aligned 1h windows == date_trunc('hour')).
# ---------------------------------------------------------------------------


@query(
    "q37_tumbling_hourly",
    oracle="""
SELECT
  DATE_TRUNC('hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
""",
)
def q37_tumbling_hourly(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# q38 — sliding window (1h length, 30m slide).  Oracle: each event belongs to
# exactly length/slide = 2 windows; enumerate both via UNION ALL.
# ---------------------------------------------------------------------------


@query(
    "q38_sliding_hourly",
    oracle="""
WITH contrib AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start, value
  FROM events
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM contrib
GROUP BY window_start
""",
)
def q38_sliding_hourly(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# q39 — session windows (10-minute inactivity gap) per user.  Spark:
# F.session_window; oracle: gaps-and-islands (LAG + cumulative flag sum).
# Session end = last event + gap, per session_window semantics.
# ---------------------------------------------------------------------------


@query(
    "q39_user_sessions",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '10 minutes'
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '10 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def q39_user_sessions(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# q37+q39 battery — round-8 rotation: tumbling-window aggregation and
# session windows (gaps-and-islands) in ONE driver slot; the standalone
# q37/q39 stay registered post-window with their own oracles.  Union of two
# aggregations over the same events table (each branch's oracle is the
# standalone query's, re-projected onto the shared battery schema).
# ---------------------------------------------------------------------------


@query(
    "q37_q39_events_battery",
    oracle="""
SELECT 'q37_tumbling' AS family,
       event_type AS k,
       DATE_TRUNC('hour', ts) AS w_start,
       CAST(NULL AS TIMESTAMP) AS w_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type, DATE_TRUNC('hour', ts)
UNION ALL
SELECT 'q39_sessions' AS family,
       CAST(user_id AS VARCHAR) AS k,
       MIN(ts) AS w_start,
       MAX(ts) + INTERVAL '10 minutes' AS w_end,
       COUNT(*) AS n_events,
       CAST(NULL AS DOUBLE) AS total_value,
       CAST(0 AS BIGINT) AS n_users
FROM (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, ts,
           CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '10 minutes'
                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
  )
)
GROUP BY user_id, session_id
""",
)
def q37_q39_events_battery(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.lit("q37_tumbling").alias("family"),
            F.col("event_type").alias("k"),
            F.col("w.start").alias("w_start"),
            F.lit(None).cast("timestamp").alias("w_end"),
            "n_events",
            "total_value",
            "n_users",
        )
    )
    sessions = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("q39_sessions").alias("family"),
            F.col("user_id").cast("string").alias("k"),
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            F.lit(None).cast("double").alias("total_value"),
            F.lit(0).cast("long").alias("n_users"),
        )
    )
    return tumbling.unionByName(sessions)


# ---------------------------------------------------------------------------
# q40 — JSON extraction (driver-mandate surface; Spark from_json /
# get_json_object over the events.props payload).
# ---------------------------------------------------------------------------


@query(
    "q40_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
)
def q40_json_props(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q41 — pivot (A7's idiomatic alternative per SURVEY §2.4: groupBy().pivot()).
# Explicit value list keeps the plan single-pass (no distinct-scan job).
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q41_event_pivot",
    oracle="""
SELECT CAST(ts AS DATE) AS event_day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def q41_event_pivot(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("event_day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# q42 — event funnel via window functions: first signup→purchase conversion
# lag per user (lag/lead family on event streams).
# ---------------------------------------------------------------------------


@query(
    "q42_signup_to_purchase",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT user_id, first_signup, first_purchase,
       DATEDIFF('second', first_signup, first_purchase) AS seconds_to_convert
FROM firsts
WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
  AND first_purchase > first_signup
""",
)
def q42_signup_to_purchase(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_signup"))
    ).select(
        "user_id",
        "first_signup",
        "first_purchase",
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_signup")
        ).alias("seconds_to_convert"),
    )


# ---------------------------------------------------------------------------
# q48 — grouped-map applyInPandas (§2.14 UDF surface: the grouped-map member
# of the pandas-UDF family; scalar pandas_udf and mapInPandas are covered by
# t-ops and m01).  Per-user session-ish summary computed in pandas with
# exact integer/timestamp math so the DuckDB oracle matches bit-for-bit.
# Scale shape: one shuffle on user_id; each group processed in an Arrow
# batch — the standard pattern for per-entity feature extraction.
# ---------------------------------------------------------------------------


@query(
    "q48_grouped_map_summary",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(datediff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_sec,
       MIN(event_id) AS first_event_id
FROM events
GROUP BY user_id
""",
)
def q48_grouped_map_summary(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")

    def summarize(pdf):
        import pandas as pd

        # datediff('second') counts boundary crossings → floor both ends
        span = (pdf["ts"].max().floor("s") - pdf["ts"].min().floor("s")) // pd.Timedelta(
            seconds=1
        )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_types": [pdf["event_type"].nunique()],
                "span_sec": [int(span)],
                "first_event_id": [pdf["event_id"].min()],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        summarize,
        "user_id long, n_events long, n_types long, span_sec long,"
        " first_event_id long",
    )


# ---------------------------------------------------------------------------
# q56 — cohort retention matrix: users grouped by first-signup week, the
# fraction of each cohort active k weeks later.  The classic event-analytics
# report (cohort × weeks-since grid).  Scale shape: one user-keyed join of
# events against the driver-small firsts frame, a distinct on the
# (user, cohort, week) triple, then a tiny grouped aggregate.
# ---------------------------------------------------------------------------


@query(
    "q56_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(ts) AS fs FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
coh AS (
  SELECT user_id, fs, CAST(date_trunc('week', fs) AS DATE) AS cohort_week
  FROM firsts
),
act AS (
  SELECT DISTINCT c.user_id, c.cohort_week,
         CAST(FLOOR(datediff('day', c.cohort_week, CAST(e.ts AS DATE)) / 7.0)
              AS INT) AS weeks_since
  FROM events e JOIN coh c ON e.user_id = c.user_id
  WHERE e.ts >= c.fs
),
sizes AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM coh GROUP BY 1)
SELECT a.cohort_week, a.weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(MAX(s.n_cohort) AS BIGINT) AS n_cohort,
       ROUND(COUNT(*) * 100.0 / MAX(s.n_cohort), 4) AS retention_pct
FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY 1, 2
""",
)
def q56_retention_cohorts(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fs"))
    )
    coh = firsts.select(
        "user_id", "fs", F.date_trunc("week", "fs").cast("date").alias("cohort_week")
    )
    act = (
        ev.join(coh, "user_id")
        .filter(F.col("ts") >= F.col("fs"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7.0
            ).cast("int").alias("weeks_since"),
        )
        .distinct()
    )
    sizes = coh.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        act.groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.round(F.col("n_active") * 100.0 / F.col("n_cohort"), 4).alias(
                "retention_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q58 — as-of attribution join (operators/asof.asof_join): each purchase
# matched to the user's most recent view at-or-before it.  The reference
# expresses point-in-time lookups as correlated TOP 1 ... ORDER BY ts DESC
# subqueries (LatestBackup.sql:2-10); the Spark form is a single union +
# per-user ordered window — one shuffle, no row amplification.  Oracle:
# DuckDB's native ASOF LEFT JOIN.  (user_id, ts) is unique in the events
# table, so the matched row is deterministic.
# ---------------------------------------------------------------------------


@query(
    "q58_asof_attribution",
    oracle="""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts,
         CAST(value AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT event_id AS view_id, user_id, ts AS v_ts
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id AS user_id, purchase_id, p_ts, purchase_value, view_id, v_ts,
       epoch_us(p_ts) - epoch_us(v_ts) AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.p_ts >= v.v_ts
""",
)
def q58_asof_attribution(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").cast("double").alias("purchase_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="p_ts", right_ts="v_ts"
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "p_ts",
        "purchase_value",
        "view_id",
        "v_ts",
        # timestampdiff works on both TIMESTAMP and TIMESTAMP_NTZ (unix_micros
        # does not); exact µs arithmetic either way, matching epoch_us diff.
        F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# q59 — interval (range-containment) join (operators/intervals.interval_join):
# purchases by ANY user landing inside the activity sessions of users 0-19.
# The bucketed equi-join turns the classic O(|P|·|I|) range predicate into a
# hash join on the 10-minute bucket + residual filter (plan-asserted: no
# nested-loop/cartesian join).  Oracle: DuckDB native inequality join over
# the same gaps-and-islands sessions as q39.
# ---------------------------------------------------------------------------


@query(
    "q59_session_interval_join",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '10 minutes'
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 20
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
bounds AS (
  SELECT user_id AS session_user, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL '10 minutes' AS session_end
  FROM sessions GROUP BY user_id, session_id
),
p AS (
  SELECT ts AS p_ts, CAST(value AS DOUBLE) AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT session_user, session_start,
       COUNT(*) AS n_concurrent_purchases,
       CAST(SUM(CAST(p_value AS DECIMAL(18,4))) AS DOUBLE) AS concurrent_value
FROM bounds b JOIN p ON p.p_ts >= b.session_start AND p.p_ts < b.session_end
GROUP BY session_user, session_start
""",
)
def q59_session_interval_join(spark, sf_dir):
    from ..operators.intervals import interval_join

    ev = tbl(spark, sf_dir, "events")
    bounds = (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            F.col("user_id").alias("session_user"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("value").cast("double").alias("p_value")
    )
    joined = interval_join(
        purchases, bounds, point_ts="p_ts",
        start_ts="session_start", end_ts="session_end",
    )
    return joined.groupBy("session_user", "session_start").agg(
        F.count(F.lit(1)).alias("n_concurrent_purchases"),
        dsum("p_value", "concurrent_value"),
    )
