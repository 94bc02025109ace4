"""Event-stream analytics (batch forms; streaming twins in
``gemmsql.streaming``).

Windows and sessionization over the ``events`` table.  Timestamps are
compared in exact integer microseconds (``unix_micros`` / DuckDB
``epoch_us``) — float-free, so engine and oracle agree bit-for-bit.

Scale: both queries shuffle once on their grouping key (window bucket /
user_id).  Sessionization partitions by user — at 100 TB the per-user
event count bounds the window sort; skewed power-users are handled by
AQE skew splitting on the preceding shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in microseconds


def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows x event_type: count + sum + avg."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


HOURLY_EVENT_STATS_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value,
       ROUND(CAST(AVG(value) AS DOUBLE), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide) via Spark's ``window``;
    each event lands in 2 overlapping buckets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# oracle: replicate the 2-buckets-per-event expansion explicitly
SLIDING_EVENT_COUNTS_SQL = """
WITH expanded AS (
  SELECT epoch_us(to_timestamp(
           FLOOR(epoch(ts) / 1800) * 1800 - o.off)) AS w_start_us,
         event_type, value
  FROM events
  CROSS JOIN (SELECT UNNEST([0, 1800]) AS off) o
)
SELECT w_start_us, event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value
FROM expanded GROUP BY 1, 2
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after a
    >30 min silence per user.  Output: one row per session."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > SESSION_GAP_US, 1
        ).otherwise(0)
        .cast("long"),
    ).withColumn(
        "sess_no",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "sess_no").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT *, SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM marked
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value
FROM numbered GROUP BY 1, 2
"""


def time_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of self-join: for every event, microseconds since the same
    user's most recent STRICTLY EARLIER 'error' event (null if none).

    Spark has no native as-of join; the scalable formulation is a
    running windowed max over the partitioned, time-sorted stream —
    one shuffle on user_id, no range cross-product."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    err_ts = F.when(F.col("event_type") == "error", F.col("ts_us"))
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.max(err_ts).over(w)).alias("us_since_error"),
    )


TIME_SINCE_LAST_ERROR_SQL = """
SELECT event_id, user_id,
  epoch_us(ts) - MAX(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS us_since_error
FROM events
"""


def user_value_movavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average of ``value`` over the trailing 4 events
    (current + 3 preceding) — the time-series smoothing pattern."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("movavg_value"),
    )


USER_VALUE_MOVAVG_SQL = """
SELECT event_id, user_id,
  ROUND(CAST(AVG(value) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS movavg_value
FROM events
"""


def props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` column: per event_type stats of
    the numeric field ``k`` (semi-structured payload pattern)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


PROPS_STATS_SQL = """
SELECT event_type,
  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  ROUND(CAST(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE), 6) AS avg_k
FROM events GROUP BY 1
"""


def user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile: event mix + running stats — distinct counts and
    conditional aggregation in one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 6).alias("purchase_value"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_errors"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )


USER_ACTIVITY_PROFILE_SQL = """
SELECT user_id, COUNT(*) AS n_events,
  COUNT(DISTINCT event_type) AS n_types,
  ROUND(CAST(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS DOUBLE), 6) AS purchase_value,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
  epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
FROM events GROUP BY 1
"""


# --- funnel analysis -------------------------------------------------

FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day conversion window
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view -> click -> purchase ->
    ``(step_no, stage, n_users, frac)`` — the product-analytics
    sequence-match pattern (no analog in the reference; north-star
    event tier).

    Semantics: per user, t1 = first 'view'; t2 = first 'click'
    STRICTLY after t1; t3 = first 'purchase' STRICTLY after t2; steps
    2-3 must land within ``FUNNEL_WINDOW_US`` of t1.  ``n_users`` =
    users reaching each stage; ``frac`` = n_users / stage-1 users.

    Scale shape (r6 rewrite): ONE scan, ONE wide shuffle.  The event
    scan is filtered to the 3 funnel types (pushed to parquet) and
    hash-partitioned ONCE by user_id; the chained per-user minima are
    three cascaded unordered windows over that same partitioning
    (Catalyst inserts no further exchange — each t_k is a constant per
    user that the next window's CASE may reference), then one per-user
    reduce on the already-partitioned frame and a 1-row global count.
    The previous shape (per-step min-agg joined to the previous step)
    was semantically identical but cost 7 scans / 10 exchanges at the
    same sf — step tables shrink, yet every one re-read the corpus.
    No self cross-product; the final frame is 3 rows.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    )
    ts, typ = F.col("ts_us"), F.col("event_type")
    t1 = ev.withColumn(
        "t1",
        F.min(F.when(typ == FUNNEL_STEPS[0], ts)).over(w),
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (typ == FUNNEL_STEPS[1])
                & (ts > F.col("t1"))
                & (ts <= F.col("t1") + F.lit(FUNNEL_WINDOW_US)),
                ts,
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (typ == FUNNEL_STEPS[2])
                & (ts > F.col("t2"))
                & (ts <= F.col("t1") + F.lit(FUNNEL_WINDOW_US)),
                ts,
            )
        ).over(w),
    )
    users = t3.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )
    r = users.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return r.select(
        F.expr(
            "stack(3, CAST(1 AS BIGINT), '{s0}', n1,"
            " CAST(2 AS BIGINT), '{s1}', n2,"
            " CAST(3 AS BIGINT), '{s2}', n3)"
            " AS (step_no, stage, n_users)".format(
                s0=FUNNEL_STEPS[0], s1=FUNNEL_STEPS[1], s2=FUNNEL_STEPS[2]
            )
        ),
        F.col("n1").alias("base_n"),
    ).select(
        "step_no", "stage", "n_users",
        F.round(F.col("n_users") / F.col("base_n"), 6).alias("frac"),
    )


FUNNEL_COUNTS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT user_id, MIN(ts_us) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT ev.user_id, MIN(s1.t1) AS t1, MIN(ev.ts_us) AS t2
  FROM ev JOIN s1 ON ev.user_id = s1.user_id
  WHERE ev.event_type = 'click' AND ev.ts_us > s1.t1
    AND ev.ts_us <= s1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY 1
),
s3 AS (
  SELECT ev.user_id, MIN(ev.ts_us) AS t3
  FROM ev JOIN s2 ON ev.user_id = s2.user_id
  WHERE ev.event_type = 'purchase' AND ev.ts_us > s2.t2
    AND ev.ts_us <= s2.t1 + {FUNNEL_WINDOW_US}
  GROUP BY 1
),
counts AS (
  SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS stage,
         COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT step_no, stage, n_users,
       ROUND(CAST(n_users AS DOUBLE)
             / (SELECT COUNT(*) FROM s1), 6) AS frac
FROM counts
"""


# --- cohort retention ------------------------------------------------

DAY_US = 24 * 3600 * 1_000_000


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly cohort retention over ``orders`` ->
    ``(cohort_q, q_offset, n_custs, retention)`` — the classic
    growth-analytics triangle.  Cohort = integer epoch-quarter of a
    customer's FIRST order ((year*12 + month - 1) div 3 —
    engine-agnostic integer arithmetic, no locale-dependent
    date_trunc); ``q_offset`` = whole quarters between that first
    order and each quarter the customer ordered in again;
    ``retention`` = n_custs / cohort size (the offset-0 count, which
    every customer is in by construction).  The orders table spans
    1995-2001, so the triangle is ~27 cohorts deep with genuinely
    decaying retention (~10 orders per customer over 80 months).

    Scale shape (r6 rewrite): ONE scan, TWO shuffles.  first_q is an
    unordered window over one o_custkey partitioning (no min-agg +
    join-back, which re-scanned orders); the per-customer distinct
    rides the SAME partitioning (custkey is a subset of the distinct
    key, so EnsureRequirements inserts no exchange); the only other
    shuffle is the tiny per-cell count.  Cohort sizes are read off
    per_cell itself (the offset-0 row every customer is in by
    construction) instead of recomputing the active frame, and join
    back as a BROADCAST (cohorts ~ timespan / quarter: O(100) rows
    even for decades).  No cross-product.
    """
    from pyspark.sql import Window as W

    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "(year(o_orderdate) * 12 + month(o_orderdate) - 1) div 3"
        ).alias("q"),
    )
    first_q = F.min("q").over(W.partitionBy("o_custkey"))
    active = (
        od.select(
            "o_custkey",
            first_q.alias("cohort_q"),
            (F.col("q") - first_q).alias("q_offset"),
        )
        .distinct()
    )
    per_cell = active.groupBy("cohort_q", "q_offset").agg(
        F.count("*").cast("long").alias("n_custs")
    )
    from gemmsql.caching import scoped_cache

    per_cell = scoped_cache(per_cell, fresh_scope=True)  # O(cohorts^2) rows
    sizes = per_cell.where(F.col("q_offset") == 0).select(
        "cohort_q", F.col("n_custs").alias("cohort_n")
    )
    return (
        per_cell.join(F.broadcast(sizes), "cohort_q")
        .select(
            "cohort_q",
            "q_offset",
            "n_custs",
            F.round(F.col("n_custs") / F.col("cohort_n"), 6).alias(
                "retention"
            ),
        )
    )


COHORT_RETENTION_SQL = """
WITH od AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1) // 3 AS q
  FROM orders
),
firsts AS (
  SELECT o_custkey, MIN(q) AS first_q FROM od GROUP BY 1
),
active AS (
  SELECT DISTINCT od.o_custkey, firsts.first_q AS cohort_q,
         od.q - firsts.first_q AS q_offset
  FROM od JOIN firsts ON od.o_custkey = firsts.o_custkey
),
per_cell AS (
  SELECT cohort_q, q_offset, COUNT(*) AS n_custs
  FROM active GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_q, COUNT(*) AS cohort_n FROM active
  WHERE q_offset = 0 GROUP BY 1
)
SELECT per_cell.cohort_q, per_cell.q_offset, per_cell.n_custs,
       ROUND(CAST(per_cell.n_custs AS DOUBLE) / sizes.cohort_n, 6)
         AS retention
FROM per_cell JOIN sizes ON per_cell.cohort_q = sizes.cohort_q
"""


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts + value
    totals at THREE time grains (hour / day / week) in ONE scan ->
    ``(grain, bucket_ts, n_events, sum_value)``.

    The naive form is three scans + a union; ``GROUPING SETS`` over
    the three derived bucket columns expands map-side instead, so the
    corpus is read once and each row fans out to its three buckets
    before one shuffle — the TimescaleDB/Druid rollup shape, and on
    100 TB the difference between one pass and three.  ``grain`` is
    recovered from the grouping-id bitmask; week buckets are
    Monday-anchored (``date_trunc('week')`` on both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("week", F.col("ts")).alias("w"),
        "value",
    )
    agg = ev.groupingSets(
        [[F.col("h")], [F.col("d")], [F.col("w")]],
        F.col("h"), F.col("d"), F.col("w"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    grain = (
        F.when(F.col("h").isNotNull(), F.lit("hour"))
        .when(F.col("d").isNotNull(), F.lit("day"))
        .otherwise(F.lit("week"))
    )
    return agg.select(
        grain.alias("grain"),
        F.coalesce("h", "d", "w").alias("bucket_ts"),
        "n_events",
        "sum_value",
    )


TIME_ROLLUP_SQL = """
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
         date_trunc('week', ts) AS w, value
  FROM events
)
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day' ELSE 'week' END AS grain,
       COALESCE(h, d, w) AS bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value
FROM ev
GROUP BY GROUPING SETS ((h), (d), (w))
"""


HOUR_US = 3_600_000_000


def user_value_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine densification — the metrics gap-fill every
    monitoring/feature pipeline needs: per user, an HOURLY spine from
    their first to last event hour, with missing hours materialized
    and filled two ways -> ``(user_id, hour_us, n, is_gap,
    ffill_value, interp_value)``.

    - ``ffill_value``: the last observed hourly mean carried forward
      (step interpolation);
    - ``interp_value``: linear interpolation between the surrounding
      anchor hours (exact at anchors).  The spine's endpoints are
      anchors by construction, so neither fill is ever null.

    Scale shape (r11 rework — the r10 formulation joined a dense
    spine back to the anchors and ran FOUR ignore-null window passes
    over the EXPLODED rows; at sf0.1 that was the single most
    expensive bench line): every anchor hour knows its next anchor
    via one ``lead`` pass, so each anchor GENERATES its own gap rows
    (in-row ``sequence`` explode up to the next anchor, exclusive)
    with both fills computed at generation time — the previous
    anchor's value IS the forward fill, and both interpolation
    endpoints are in hand.  No spine join, no windows over the dense
    output: one hourly aggregation shuffle, one anchors-only window
    pass, one explode.  The per-user anchor count bounds the window
    sort exactly as sessionize's event count does."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        "value",
    )
    hourly = ev.groupBy("user_id", "hour_us").agg(
        F.count("*").alias("n"), F.avg("value").alias("av")
    )
    w = W.partitionBy("user_id").orderBy("hour_us")
    anchors = hourly.select(
        "user_id",
        "hour_us",
        "n",
        "av",
        F.lead("hour_us").over(w).alias("nt"),
        F.lead("av").over(w).alias("nv"),
    )
    dense = anchors.select(
        "user_id",
        "n",
        "av",
        "hour_us",
        "nt",
        "nv",
        F.explode(
            F.expr(
                f"sequence(hour_us,"
                f" coalesce(nt - {HOUR_US}, hour_us), {HOUR_US})"
            )
        ).alias("h"),
    )
    at_anchor = F.col("h") == F.col("hour_us")
    interp = F.when(at_anchor, F.col("av")).otherwise(
        F.col("av")
        + (F.col("nv") - F.col("av"))
        * (F.col("h") - F.col("hour_us"))
        / (F.col("nt") - F.col("hour_us"))
    )
    # interpolation lands on exact decimal midpoints (dyadic slope
    # fractions), where Spark's half-up and DuckDB's half-even ROUND
    # disagree — quantize with the repo-standard floor(x*1e6 + 0.5)
    q = lambda c: (F.floor(c * 1e6 + F.lit(0.5)) / 1e6).cast("double")
    return dense.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("h").alias("hour_us"),
        F.when(at_anchor, F.col("n")).otherwise(0).cast("long").alias("n"),
        F.when(at_anchor, 0).otherwise(1).cast("long").alias("is_gap"),
        q(F.col("av")).alias("ffill_value"),
        q(interp).alias("interp_value"),
    )


USER_VALUE_GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us,
         COUNT(*) AS n, AVG(value) AS av
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(hour_us) AS lo, MAX(hour_us) AS hi
  FROM hourly GROUP BY 1
),
spine AS (
  SELECT b.user_id, s.hour_us
  FROM bounds b,
       UNNEST(generate_series(b.lo, b.hi, {HOUR_US})) AS s(hour_us)
),
j AS (
  SELECT s.user_id, s.hour_us, h.n, h.av
  FROM spine s LEFT JOIN hourly h USING (user_id, hour_us)
),
w AS (
  SELECT *,
    last_value(av IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour_us
       ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN av IS NOT NULL THEN hour_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY hour_us
            ROWS UNBOUNDED PRECEDING) AS pt,
    first_value(av IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour_us
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN av IS NOT NULL THEN hour_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY hour_us
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT CAST(user_id AS BIGINT) AS user_id, hour_us,
  CAST(COALESCE(n, 0) AS BIGINT) AS n,
  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
  CAST(FLOOR(CAST(pv AS DOUBLE) * 1e6 + 0.5) / 1e6 AS DOUBLE)
    AS ffill_value,
  CAST(FLOOR(CAST(CASE WHEN av IS NOT NULL THEN av
             ELSE pv + (nv - pv) * (hour_us - pt) / (nt - pt)
        END AS DOUBLE) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS interp_value
FROM w
"""
