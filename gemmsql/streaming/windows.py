"""Streaming window aggregations over the events table.

Batch/stream parity: each streaming query here reuses the same grouping
and aggregate expressions as its batch twin in
``gemmsql.pipeline.events``, so a file-source replay of the events
parquet produces identical results (asserted in tests).  Watermarks
bound state: at 100 TB/day ingest, the 1-hour watermark caps the window
state store to ~2 hours of keys per executor.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table


# staged targets this process already wrote: the five gates replay the
# same events table, so stage once per (sf_dir -> target) per session
# instead of rewriting it per gate (in-process memo only — a fresh
# process always overwrites, so stale tempdirs from earlier runs can't
# leak in)
_STAGED: set[tuple[str, str]] = set()

# per-process invocation counter for gate checkpoint dirs: a memory-sink
# stream cannot recover from an existing checkpoint, so a gate that runs
# twice in one process (pytest runs them via several suites) needs a
# fresh dir each time
_CKPT_SEQ = [0]


def _fresh_ckpt(prefix: str) -> str:
    import tempfile

    _CKPT_SEQ[0] += 1
    return os.path.join(
        tempfile.gettempdir(), f"{prefix}_{os.getpid()}_{_CKPT_SEQ[0]}"
    )


def stage_stream_dir(spark: SparkSession, sf_dir: str, target_dir: str) -> str:
    """Materialize the (nanos-normalized) events table into a parquet
    directory usable as a file-stream source (testdata is read-only and
    single-file; streams want a directory they can list)."""
    key = (sf_dir, target_dir)
    if key in _STAGED:
        return target_dir
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").parquet(target_dir)
    _STAGED.add(key)
    return target_dir


def read_events_stream(
    spark: SparkSession, stream_dir: str, *, max_files_per_trigger: int = 4
) -> DataFrame:
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(stream_dir)
    )


def streaming_hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1 h windows x event_type with a 1 h watermark — the
    streaming twin of ``pipeline.events.hourly_event_stats``."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 1 h / 30 min windows (twin of sliding_event_counts)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (``session_window``) per user — the
    streaming counterpart of the batch gaps-and-islands sessionize."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, *, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming query to completion against a memory sink and
    return the result table (synchronous; for tests/smoke)."""
    spark = df.sparkSession
    ckpt = f"/tmp/gemmsql_ckpt/{name}_{os.getpid()}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


#: state-store partitions for the gate streams — env-overridable so a
#: production deployment sizes it to state volume (it is baked into a
#: checkpoint at first batch); the local default keeps the driver's
#: bench comparable
GATE_STATE_PARTITIONS = int(
    os.environ.get("GEMMSQL_GATE_STATE_PARTITIONS", "8")
)


@contextmanager
def state_partitions(spark: SparkSession, n: int = GATE_STATE_PARTITIONS):
    """Pin ``spark.sql.shuffle.partitions`` (= streaming state
    partitions) around a gate stream's start→drain, then restore.

    Stateful streaming cost here is dominated by PER-STATE-PARTITION
    overhead, not data: every micro-batch commits every state store
    (a stream-stream join keeps four per partition), plus availableNow
    runs one extra empty finalization batch to advance the watermark.
    Measured on the sf0.1 join gate (100 k rows): 32 partitions →
    ~10-12 s wall; 4-8 partitions → ~3.8-6 s first run, ~3.9 s warm
    (≈26 k source rows/s).  State partitions should be sized to state
    volume — at 100 TB/day you'd raise this (and it's baked into the
    checkpoint at first batch, so production picks it once per
    checkpoint lineage; the gates use fresh per-run checkpoints)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _await_gate(q, timeout: int = 300) -> None:
    """Wait for an ``availableNow`` gate query to self-terminate.

    ``awaitTermination(timeout)`` returns False on timeout; ignoring
    that (round 2) meant a slow run would read the memory sink early
    and surface as a spurious hash mismatch instead of a clear error."""
    try:
        if not q.awaitTermination(timeout):
            raise TimeoutError(
                f"streaming gate query {q.name!r} still running after "
                f"{timeout}s — refusing to hash a partial sink"
            )
    finally:
        q.stop()


def streaming_dedup_exact(
    events: DataFrame,
    *,
    within: str = "1 hour",
    keys: tuple[str, ...] = ("user_id", "event_type", "value"),
) -> DataFrame:
    """Streaming exact dedup — the stream twin of
    ``pipeline.dedup.dedup_exact``: drop events whose (user_id,
    event_type, value) repeat within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state store to
    the watermark window — the property that makes exact dedup viable
    on an unbounded stream (the batch operator's full-corpus hash
    groupBy becomes an expiring hash set)."""
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_enrich_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension.  The static side is broadcast per micro-batch — no
    stream-side shuffle, no state; the standard pattern for dimension
    enrichment at any scale."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return events.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )


def streaming_hourly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_hourly_counts`: replays the
    events table through a real file-source micro-batch stream
    (``availableNow``), materializes the windowed aggregation via a
    memory sink, and returns the result as a batch DataFrame.

    Because the driver hash-compares this against the BATCH oracle SQL,
    stream/batch parity is enforced by the correctness gate itself —
    the engine's streaming path must produce bit-identical aggregates
    to the SQL semantics, not just "approximately streaming" results.
    (Complete output mode: every window emits, the watermark only
    bounds state on unbounded streams.)"""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target)
    name = "stream_gate_hourly"
    with state_partitions(spark):
        q = (
            streaming_hourly_counts(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


STREAMING_HOURLY_GATE_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def streaming_sessionize_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_session_windows`: native
    ``session_window`` sessionization replayed through a real
    availableNow file stream, hash-compared against a gaps-and-islands
    SQL oracle.

    Boundary semantics pinned by the oracle: session_window starts a
    NEW session when the inter-event gap is >= the gap parameter (an
    event arriving exactly at the previous session's end does not
    extend it), and window end = last event ts + gap."""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target)
    name = "stream_gate_sessions"
    with state_partitions(spark):
        q = (
            streaming_session_windows(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


STREAMING_SESSIONIZE_GATE_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_us IS NULL
                 OR ts_us - prev_us >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sessions AS (
  SELECT *, SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + 30 * 60 * 1000000 AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(value) AS DOUBLE), 6) AS sum_value
FROM sessions GROUP BY user_id, sess_id
"""


def streaming_enrich_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_enrich_events`: the event
    stream is enriched with the customer dimension (stream-static
    broadcast join, re-resolved per micro-batch) and aggregated per
    market segment; the driver hash-compares against a plain batch SQL
    join — so the stream-static join path itself sits behind the hard
    correctness gate, like the window and session queries."""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target)
    dim = load_table(spark, sf_dir, "customer")
    enriched = streaming_enrich_events(ev, dim)
    agg = enriched.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    name = "stream_gate_enrich"
    with state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


STREAMING_ENRICH_GATE_SQL = """
SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       COUNT(*) AS n,
       ROUND(CAST(SUM(e.value) AS DOUBLE), 6) AS sum_value
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
"""


def streaming_click_to_purchase(
    clicks: DataFrame, purchases: DataFrame, *, horizon: str = "31 days"
) -> DataFrame:
    """Stream-stream inner join: purchases preceded by a click from the
    same user within 6 hours.  Both sides carry a watermark and the join
    condition bounds event time on BOTH streams, so the state store
    evicts rows once the watermark passes them — the canonical funnel /
    attribution join shape that stays bounded on an unbounded stream.

    ``horizon`` is the watermark delay.  In production it is minutes to
    hours (state = horizon + 6 h of events per side); the driver gate
    replays a 30-day historical file dump whose listing order is not
    time order, so the gate passes a horizon covering the whole replay
    to make the batch twin exact.  The join plan and state-cleanup
    mechanics are identical either way.
    """
    c = clicks.withWatermark("ts", horizon).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.withWatermark("ts", horizon).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id")


def streaming_click_to_purchase_outer(
    clicks: DataFrame, purchases: DataFrame, *, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase, with its
    preceding same-user click within 6 hours or NULL.  The attribution
    report that must also show UNattributed purchases.

    Semantics pinned by test: matched pairs emit eagerly (same as the
    inner join); an UNMATCHED purchase emits with NULL click only once
    the joint watermark ``min(max_click_ts, max_purchase_ts) - horizon``
    passes its event time — before that the engine must hold it in
    state (a matching click could still arrive).  This is why the
    inner-join gate's noDataMicroBatches optimization MUST NOT be
    applied to outer joins: the availableNow finalization batch is the
    only batch whose watermark passes the replayed rows, so disabling
    it silently drops every unmatched row
    (tests/test_streaming.py::test_streaming_outer_join_*).

    ``horizon`` here is a real production-style delay (unmatched rows
    finalize ``horizon`` after the stream's frontier), unlike the inner
    gate's replay-covering horizon — the outer join NEEDS the watermark
    to pass rows for its null side to materialize at all."""
    c = clicks.withWatermark("ts", horizon).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.withWatermark("ts", horizon).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftOuter",
    ).select("purchase_id", "click_id")


def streaming_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_click_to_purchase`: replays
    the events table through TWO file-source streams (clicks and
    purchases), joins them stream-to-stream, and hash-compares against
    a plain batch self-join oracle — putting Structured Streaming's
    stream-stream join path behind the hard correctness gate."""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev_c = read_events_stream(spark, target).where(F.col("event_type") == "click")
    ev_p = read_events_stream(spark, target).where(
        F.col("event_type") == "purchase"
    )
    joined = streaming_click_to_purchase(ev_c, ev_p)
    name = "stream_gate_join"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_join_{tag}")
    # r6 (VERDICT r5 next #8): of the five gates, ONLY this one paid
    # the empty watermark-finalization micro-batch (~0.9 s of a 2.4 s
    # replay, measured via recentProgress: batch 1 rows=0 total=930ms
    # stateCommit=2280ms; the complete/update-mode gates run exactly
    # one batch).  For an INNER stream-stream join the no-data batch
    # only EVICTS state — matches emit eagerly in the data batch — and
    # an availableNow replay terminates right after, so eviction serves
    # nobody: disabling it is output-identical (2198 rows, hash-gated
    # by the driver) and cuts the replay 2.4 s -> 1.6 s.  Leave the
    # default ON for outer joins / append-mode windowed aggs, where the
    # no-data batch is what EMITS watermark-closed results.
    no_data = "spark.sql.streaming.noDataMicroBatches.enabled"
    old_no_data = spark.conf.get(no_data)
    spark.conf.set(no_data, "false")
    try:
        with state_partitions(spark):
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_gate(q)
    finally:
        spark.conf.set(no_data, old_no_data)
    return spark.table(name)


STREAMING_JOIN_GATE_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.ts BETWEEN p.ts - INTERVAL 6 HOUR AND p.ts
"""


def streaming_outer_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_click_to_purchase_outer`:
    the LEFT OUTER stream-stream join behind the hard hash gate.

    Unlike the inner gate, the horizon here is a REAL 1-hour watermark
    delay — the outer join needs the watermark to pass rows for its
    NULL side to materialize, and the oracle replays the exact emission
    rule: matched pairs equal the batch inner join; an unmatched
    purchase appears (NULL click) iff its event time precedes
    ``min(max_click_ts, max_purchase_ts) - horizon``.  Determinism
    requires the whole historical dump (whose file listing order is not
    time order) to land in ONE micro-batch, so this gate reads with an
    effectively unbounded maxFilesPerTrigger — batch 0 finds every
    match, the availableNow finalization batch emits the watermark-
    passed unmatched rows.  A production stream ingests in time order
    and needs no such pinning.  noDataMicroBatches stays ON here: the
    finalization batch IS the null-side emission (see
    test_streaming_outer_join_needs_finalization_batch)."""
    import os
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev_c = read_events_stream(
        spark, target, max_files_per_trigger=1_000_000
    ).where(F.col("event_type") == "click")
    ev_p = read_events_stream(
        spark, target, max_files_per_trigger=1_000_000
    ).where(F.col("event_type") == "purchase")
    joined = streaming_click_to_purchase_outer(ev_c, ev_p)
    name = "stream_gate_outer_join"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_outer_join_{tag}")
    with state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


#: bin width for the streaming histogram gate (event values span
#: ~0..500 -> <= 50 bins per (day, type) group).
HIST_GATE_BIN_W = 10
#: watermark delay for the histogram gate's day windows.
HIST_GATE_DELAY = "1 hour"


def streaming_value_hist_windows(events: DataFrame) -> DataFrame:
    """Day-windowed per-type value histogram under a 1-hour watermark
    -> ``(day_us, event_type, bin, c)`` — the streaming form of
    :func:`gemmsql.sketches.value_histogram` with a time window added:
    state is (days x types x bins) rows and append mode emits each
    day's histogram exactly once, when the watermark passes midnight.

    This is the sketch tier's streaming story: the histogram is a
    per-bin SUM monoid, so the windowed groupBy IS the merge — no
    custom state handler needed, and the emitted state replays the
    batch formula bit-for-bit."""
    return (
        events.withWatermark("ts", HIST_GATE_DELAY)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "event_type",
            F.floor(F.col("value") / HIST_GATE_BIN_W)
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            F.unix_micros(F.col("w.start")).alias("day_us"),
            "event_type",
            "bin",
            "c",
        )
    )


def streaming_hist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of the histogram-quantile sketch under
    watermarks -> ``(day_us, event_type, n_events, p50, p90, p99)``:
    the day-windowed histogram state maintained by a REAL availableNow
    stream in APPEND mode, then rank-extracted by the same
    ``quantiles_from_histogram`` pass the batch gate uses.

    The watermark is load-bearing in the HASH: append mode only emits
    windows the watermark has passed, so the still-open final day is
    withheld, and the oracle replays exactly that emission rule
    (``day_end <= max(ts) - horizon``).  The whole dump lands in one
    micro-batch (file listing order is not time order — a second
    batch would see its rows as late and drop them; a production
    stream ingests in time order and needs no such pinning), and the
    availableNow finalization batch advances the watermark to emit
    every closed day.  noDataMicroBatches stays ON: the finalization
    batch IS the emission."""
    import os
    import tempfile

    from gemmsql.sketches import quantiles_from_histogram

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target, max_files_per_trigger=1_000_000)
    name = "stream_gate_hist"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_hist_{tag}")
    with state_partitions(spark):
        q = (
            streaming_value_hist_windows(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return quantiles_from_histogram(
        spark.table(name),
        ["day_us", "event_type"],
        bin_w=HIST_GATE_BIN_W,
        n_alias="n_events",
    )


_HIST_GATE_Q_COLS = ",\n".join(
    f"       CAST(MIN(CASE WHEN cum >= (n * {q} + 99) // 100 "
    f"THEN bin * {HIST_GATE_BIN_W} END) AS BIGINT) AS p{q}"
    for q in (50, 90, 99)
)

# Boundary behavior (ADVICE r7, closed in round 9): the HAVING below
# replays the append-mode emission rule (day_end <= max(ts) - 1h).
# Spark's eviction at EXACT watermark == window-end equality is
# INCLUSIVE — probed empirically and pinned by
# tests/test_streaming.py::
# test_hist_gate_boundary_watermark_exactly_on_window_end, whose
# corpus lands max(ts) - horizon precisely on a day boundary — so the
# inclusive <= here matches Spark even on the boundary.  If a Spark
# upgrade flips that comparison, the pinned test trips; the fix then
# is nudging the horizon off the boundary.
STREAMING_HIST_GATE_SQL = f"""
WITH closed AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         CAST(FLOOR(value / {HIST_GATE_BIN_W}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM events
  GROUP BY 1, 2, 3
  HAVING day + INTERVAL 1 DAY <=
         (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
),
cum AS (
  SELECT day, event_type, bin,
         SUM(c) OVER (PARTITION BY day, event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY day, event_type) AS n
  FROM closed
)
SELECT epoch_us(day) AS day_us, event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
{_HIST_GATE_Q_COLS}
FROM cum GROUP BY 1, 2
"""


#: dedup-state horizon for the dedup gate — the production state
#: bound (state for a key expires ``within`` after its event time).
DEDUP_GATE_WITHIN = "2 days"


def streaming_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of :func:`streaming_dedup_exact` — streaming
    exact deduplication under a watermark -> the distinct
    ``(user_id, event_type, day_us)`` key set.

    The REAL ``dropDuplicatesWithinWatermark`` operator runs over an
    availableNow replay of the events table: every first-seen key row
    is emitted, repeats within the 2-day horizon are absorbed by the
    dedup state store, and the result is projected to the key columns
    so the hash is independent of which physical instance arrived
    first.  The batch oracle is plain ``SELECT DISTINCT`` — the gate
    therefore enforces that the streaming dedup state machine
    implements exact set semantics, the property the training-data
    tier's exact dedup (`pipeline.dedup.dedup_exact`) relies on when
    it moves from corpus batches to an ingest stream.

    Determinism pinning: the dump replays as ONE micro-batch (file
    listing order is not time order), so no key's state can expire
    mid-replay and re-emit — within a batch the operator is a plain
    aggregation.  Every in-data duplicate pair is well inside the
    2-day horizon anyway (same calendar day, <= 24 h apart), which is
    the API's guaranteed-dedup regime.  A production stream ingests in
    time order across many batches and sizes ``within`` to its
    replay/late-data window; the state bound (keys live ``within``
    past their event time, then expire) is what makes exact dedup
    viable on an unbounded stream at 100 TB/day."""
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target, max_files_per_trigger=1_000_000)
    keyed = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
        "ts",
    )
    name = "stream_gate_dedup"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_dedup_{tag}")
    with state_partitions(spark):
        q = (
            keyed.withWatermark("ts", DEDUP_GATE_WITHIN)
            .dropDuplicatesWithinWatermark(
                ["user_id", "event_type", "day_us"]
            )
            .select("user_id", "event_type", "day_us")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


STREAMING_DEDUP_GATE_SQL = """
SELECT DISTINCT user_id, event_type,
       epoch_us(date_trunc('day', ts)) AS day_us
FROM events
"""


STREAMING_OUTER_JOIN_GATE_SQL = """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click'),
matched AS (
  SELECT p.purchase_id, c.click_id
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.ts BETWEEN p.ts - INTERVAL 6 HOUR AND p.ts
),
wm AS (SELECT LEAST((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM p))
              - INTERVAL 1 HOUR AS w)
SELECT purchase_id, click_id FROM matched
UNION ALL
SELECT p.purchase_id, CAST(NULL AS BIGINT) AS click_id
FROM p CROSS JOIN wm
WHERE p.ts < wm.w
  AND NOT EXISTS (SELECT 1 FROM matched m
                  WHERE m.purchase_id = p.purchase_id)
"""


# --------------------------------------------------------- DQ gate (r10)

#: the streaming DQ suite's thresholds — value_band and type_known
#: FAIL by design (value > 150 and event_type = 'error' rows exist in
#: every day window) so violation counts are hash-load-bearing.
DQ_GATE_VALUE_HI = 150.0
DQ_GATE_TYPES = ("click", "view", "purchase", "signup")
DQ_GATE_PROPS_RE = '^\\{"k": [0-9]+\\}$'


def streaming_dq_rules():
    """The batch DQ engine's Rule objects, applied to the events
    stream — same kinds, same ``_violation_expr`` predicates, so the
    streaming gate runs the ENGINE's rules, not a reimplementation."""
    from gemmsql.pipeline.dq import Rule

    return [
        Rule("user_not_null", "not_null", column="user_id"),
        Rule("value_band", "in_range", column="value",
             params={"lo": 0.0, "hi": DQ_GATE_VALUE_HI}),
        Rule("type_known", "in_set", column="event_type",
             params={"values": DQ_GATE_TYPES}),
        Rule("props_format", "regex", column="props",
             params={"pattern": DQ_GATE_PROPS_RE}),
    ]


def streaming_dq_windows(events: DataFrame) -> DataFrame:
    """Day-windowed fused DQ aggregation under a 1 h watermark -> one
    row per (closed day, rule): ``(day_us, rule, kind, n_checked,
    n_violations, passed)``.

    The batch engine's fused one-scan design IS a monoid (count +
    per-rule violation sums), so it streams as a single windowed
    aggregate — however many rules, ONE stateful operator; the
    per-rule explode is a stateless projection after it."""
    from gemmsql.pipeline.dq import _violation_expr

    rules = streaming_dq_rules()
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(f"__v{i}")
        for i, r in enumerate(rules)
    ]
    # NO spread here (r18 negative result): unlike the asof gate's
    # broadcast-join probe, the 4-rule partial agg is cheap enough
    # that a pre-shuffle repartition measured as a wash-to-loss
    # (1.54-1.86s vs 1.63 baseline)
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(*aggs)
        .select(
            F.unix_micros(F.col("w.start")).alias("day_us"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("__n").cast("long").alias("n_checked"),
                    F.col(f"__v{i}").cast("long").alias("n_violations"),
                )
                for i, r in enumerate(rules)
            ])).alias("r"),
        )
        .select(
            "day_us",
            "r.*",
        )
        .withColumn(
            "passed", (F.col("n_violations") == 0).cast("long")
        )
    )


def streaming_dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of the DQ expectation engine under watermarks
    (VERDICT r9 next #7): the fused rule suite maintained by a REAL
    availableNow stream in APPEND mode — per closed day, per rule,
    checked/violation counts.  The watermark is load-bearing in the
    hash exactly as in the hist gate: append mode withholds the
    still-open final day, and the oracle replays that emission rule
    (``day_end <= max(ts) - 1h``; the inclusive boundary is pinned by
    the hist gate's boundary test — same eviction machinery)."""
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target, max_files_per_trigger=1_000_000)
    name = "stream_gate_dq"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_dq_{tag}")
    with state_partitions(spark):
        q = (
            streaming_dq_windows(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


def streaming_quarantine_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quarantine (VERDICT r10 next #4): the batch DQ
    engine's row-routing (``pipeline.dq.quarantine`` — the SAME
    function, same Rule objects as :func:`streaming_dq_gate`) run on
    the live events stream -> ``(rule, event_id)`` per violation.

    The row-rule projection (``array_compact`` + ``explode``) is
    STATELESS — no aggregation, no watermark, no state store — so
    append mode emits every violating row as its micro-batch arrives;
    the operational half of streaming DQ (the windowed count gate is
    the monitoring half).  The oracle is the batch WHERE-clause twin
    per rule over the full table: with no watermark there is no
    withheld tail, so row membership must match exactly."""
    import tempfile

    from gemmsql.pipeline.dq import quarantine

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target, max_files_per_trigger=1_000_000)
    routed = quarantine(ev, streaming_dq_rules(), ["event_id"]).select(
        "rule", F.col("event_id").cast("long").alias("event_id")
    )
    name = "stream_gate_quarantine"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_quarantine_{tag}")
    q = (
        routed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await_gate(q)
    return spark.table(name)


STREAMING_QUARANTINE_GATE_SQL = """
SELECT 'user_not_null' AS rule, CAST(event_id AS BIGINT) AS event_id
FROM events WHERE user_id IS NULL
UNION ALL
SELECT 'value_band', event_id FROM events
WHERE value IS NULL OR value < 0.0 OR value > 150.0
UNION ALL
SELECT 'type_known', event_id FROM events
WHERE event_type IS NULL
      OR event_type NOT IN ('click', 'view', 'purchase', 'signup')
UNION ALL
SELECT 'props_format', event_id FROM events
WHERE props IS NULL
      OR NOT regexp_matches(props, '^\\{"k": [0-9]+\\}$')
"""


STREAMING_DQ_GATE_SQL = """
WITH agg AS (
  SELECT date_trunc('day', ts) AS day,
         COUNT(*) AS n,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v0,
         SUM(CASE WHEN value IS NULL OR value < 0.0 OR value > 150.0
                  THEN 1 ELSE 0 END) AS v1,
         SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
                       ('click', 'view', 'purchase', 'signup')
                  THEN 1 ELSE 0 END) AS v2,
         SUM(CASE WHEN props IS NULL
                       OR NOT regexp_matches(props, '^\\{"k": [0-9]+\\}$')
                  THEN 1 ELSE 0 END) AS v3
  FROM events
  GROUP BY 1
  HAVING day + INTERVAL 1 DAY <=
         (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
),
rules AS (
  SELECT day, 'user_not_null' AS rule, 'not_null' AS kind,
         n AS n_checked, v0 AS n_violations FROM agg
  UNION ALL
  SELECT day, 'value_band', 'in_range', n, v1 FROM agg
  UNION ALL
  SELECT day, 'type_known', 'in_set', n, v2 FROM agg
  UNION ALL
  SELECT day, 'props_format', 'regex', n, v3 FROM agg
)
SELECT epoch_us(day) AS day_us, rule, kind,
       CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS passed
FROM rules
"""


def streaming_asof_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of enrichment (VERDICT r11 next #7) — the one
    join family the other nine gates don't cover: every event on the
    live stream picks up the customer's most recent order on or
    before it (backward as-of, 30-day tolerance) -> ``(event_id,
    orderkey, days_diff)``, -1 for no match within tolerance.

    Streaming formulation: the batch union+window merge-asof
    (`pipeline.joins.asof_join`) needs an unbounded per-key sort, so
    the stream side instead BOUNDS the candidate set with the
    tolerance itself — a stream-static left join whose range
    predicate (``0 <= lts - rts <= 30``) ships at most 31 days of the
    broadcast order dimension per event — then a day-windowed
    watermarked MAX(struct(rts, ok)) picks the as-of row per event in
    append mode.  Bounded-tolerance pick-max == unbounded
    pick-then-filter for the backward direction (backward distances
    are ordered), which is what makes the batch twin exact.

    The watermark is load-bearing exactly as in the DQ/hist gates:
    append mode withholds the open final day, the oracle (DuckDB's
    NATIVE ASOF JOIN, tolerance applied after the pick) replays the
    same emission rule.  Scale shape: broadcast dimension, stateless
    join, state = one struct per event for <= 1 open day + 1 h."""
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = (
        read_events_stream(spark, target, max_files_per_trigger=1_000_000)
        .withWatermark("ts", "1 hour")
        .select(
            "event_id", "ts",
            F.col("user_id").alias("ev_user"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long").alias("lts"),
        )
        # byte-light spread (r18): the staged events dir is ONE parquet
        # file, so the scan -> broadcast-range-join -> partial-agg chunk
        # of every micro-batch ran as a single task; one narrow exchange
        # fans the probe across the cluster (the windowed agg's state
        # exchange exists either way)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("ok"))
        .select(
            F.col("o_custkey").alias("ord_user"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("rts"),
            "ok",
        )
    )
    j = ev.join(
        F.broadcast(orders),
        (F.col("ev_user") == F.col("ord_user"))
        & (F.col("rts") <= F.col("lts"))
        & (F.col("lts") - F.col("rts") <= 30),
        "left_outer",
    )
    agg = (
        j.groupBy(F.window("ts", "1 day"), "event_id", "lts")
        .agg(F.max(F.struct("rts", "ok")).alias("m"))
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.coalesce(F.col("m.ok"), F.lit(-1)).cast("long")
            .alias("orderkey"),
            F.coalesce(F.col("lts") - F.col("m.rts"), F.lit(-1))
            .cast("long").alias("days_diff"),
        )
    )
    name = "stream_gate_asof"
    ckpt = _fresh_ckpt(f"gemmsql_ckpt_asof_{tag}")
    with state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return spark.table(name)


#: DuckDB twin: native ASOF JOIN (a genuinely independent as-of
#: implementation), tolerance applied after the pick, the day-window
#: emission rule replayed verbatim from the DQ/hist gates
STREAMING_ASOF_GATE_SQL = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS lts
  FROM events
  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <=
        (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
),
r AS (
  SELECT o_custkey AS user_id,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS rts,
         MAX(o_orderkey) AS ok
  FROM orders GROUP BY 1, 2
),
b AS (
  SELECT e.event_id, e.lts, r.ok, e.lts - r.rts AS dist
  FROM e ASOF LEFT JOIN r
    ON e.user_id = r.user_id AND r.rts <= e.lts
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(COALESCE(CASE WHEN dist <= 30 THEN ok END, -1) AS BIGINT)
         AS orderkey,
       CAST(COALESCE(CASE WHEN dist <= 30 THEN dist END, -1) AS BIGINT)
         AS days_diff
FROM b
"""
