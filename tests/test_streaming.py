"""Streaming/batch parity tests (file-source replay of events)."""

from __future__ import annotations

import math
import tempfile

import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_dir(spark):
    from gemmsql.streaming import stage_stream_dir

    d = tempfile.mkdtemp(prefix="gemmsql_stream_")
    return stage_stream_dir(spark, SF_SMOKE, d)


def test_streaming_hourly_matches_batch(spark, stream_dir):
    from gemmsql.streaming import read_events_stream, run_to_memory, streaming_hourly_counts
    from gemmsql.pipeline.events import hourly_event_stats

    ev = read_events_stream(spark, stream_dir)
    got = run_to_memory(
        streaming_hourly_counts(ev), "hourly_s"
    ).toPandas().sort_values(["hour_us", "event_type"]).reset_index(drop=True)
    want = (
        hourly_event_stats(spark, SF_SMOKE)
        .drop("avg_value")
        .toPandas()
        .sort_values(["hour_us", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_streaming_session_windows(spark, stream_dir):
    from gemmsql.streaming import read_events_stream, run_to_memory, streaming_session_windows

    ev = read_events_stream(spark, stream_dir)
    out = run_to_memory(streaming_session_windows(ev), "sessions_s").toPandas()
    assert len(out) > 0
    assert (out["session_end_us"] > out["session_start_us"]).all()
    # session_window end = last event + gap; duration >= gap
    assert (
        out["session_end_us"] - out["session_start_us"] >= 30 * 60 * 1_000_000
    ).all()


def test_streaming_stateful_logsumexp(spark, stream_dir):
    from gemmsql.streaming import read_events_stream, streaming_logsumexp, run_to_memory
    from gemmsql.datamodel import load_table

    ev = read_events_stream(spark, stream_dir)
    out = run_to_memory(
        streaming_logsumexp(ev), "lse_s", output_mode="update"
    ).toPandas()
    # last update per key is the full-stream accumulator
    last = out.groupby("key").last()
    batch = load_table(spark, SF_SMOKE, "events").toPandas()
    for k, row in last.iterrows():
        s = batch[batch["event_type"] == k]["value"].to_numpy(dtype=np.float64)
        assert row["n"] == len(s)
        assert math.isclose(row["z"], float(np.logaddexp.reduce(s)), rel_tol=1e-9)


def test_streaming_user_profile_state_crosses_batches(spark, stream_dir):
    """The stateful per-user profile must accumulate across micro-
    batches: with 4 files per trigger the replay takes several batches,
    users re-appear, and every re-appearance emits a strictly larger
    running snapshot.  The final snapshot equals the batch aggregate."""
    from gemmsql.streaming import read_events_stream, run_to_memory
    from gemmsql.streaming.stateful import final_snapshots, streaming_user_profile
    from gemmsql.datamodel import load_table

    # sf0.001 stages as a single file -> force 4 files, 1 per trigger,
    # so the state genuinely crosses micro-batches
    d = tempfile.mkdtemp(prefix="gemmsql_stream_state_")
    load_table(spark, SF_SMOKE, "events").repartitionByRange(
        4, "ts"
    ).write.mode("overwrite").parquet(d)
    ev = read_events_stream(spark, d, max_files_per_trigger=1)
    snaps = run_to_memory(
        streaming_user_profile(ev), "profile_s", output_mode="update"
    )
    n_snaps = snaps.count()
    n_users = snaps.select("user_id").distinct().count()
    assert n_snaps > n_users, "expected re-emissions across micro-batches"

    got = (
        final_snapshots(snaps)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
            ).alias("sum_micro"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n_purchase"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got[want.columns].astype("int64").equals(want.astype("int64"))


def test_streaming_dedup_exact(spark, stream_dir):
    from gemmsql.streaming.windows import read_events_stream, streaming_dedup_exact

    ev = read_events_stream(spark, stream_dir)
    q = (
        streaming_dedup_exact(ev, keys=("user_id", "event_type"))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").count()
    # batch truth: exact distinct on the same key triple
    from gemmsql.datamodel import load_table
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .dropDuplicates(["user_id", "event_type"])
        .count()
    )
    # watermark-scoped dedup can only keep MORE rows than global dedup
    # (duplicates farther apart than the horizon survive), never fewer
    assert got >= batch
    total = load_table(spark, SF_SMOKE, "events").count()
    assert got < total, "dedup must actually drop something"


def test_streaming_enrich_events(spark, stream_dir):
    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import read_events_stream, streaming_enrich_events

    ev = read_events_stream(spark, stream_dir)
    cust = load_table(spark, SF_SMOKE, "customer")
    q = (
        streaming_enrich_events(ev, cust)
        .writeStream.format("memory")
        .queryName("enrich_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("enrich_stream")
    assert out.count() == load_table(spark, SF_SMOKE, "events").count()
    segs = {r["segment"] for r in out.select("segment").distinct().collect()}
    assert len(segs) > 1, "dimension enrichment must attach real segments"


def test_streaming_click_to_purchase_matches_batch(spark, stream_dir):
    """Stream-stream join == batch self-join on the same replay."""
    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        read_events_stream,
        streaming_click_to_purchase,
    )

    clicks = read_events_stream(spark, stream_dir).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, stream_dir).where(
        F.col("event_type") == "purchase"
    )
    q = (
        streaming_click_to_purchase(clicks, purchases)
        .writeStream.format("memory")
        .queryName("join_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("join_stream").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    c = ev.where(F.col("event_type") == "click").alias("c")
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 6 HOURS"))
            & (F.col("c.ts") <= F.col("p.ts")),
        )
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_hll_registers_match_batch(spark, stream_dir):
    """The md5-register HLL is a register-max monoid, so the SAME
    hll_registers() plan runs as a streaming aggregation with bounded
    state — and its final registers must be bit-identical to the batch
    sketch's (stream/batch parity of the sketch itself)."""
    from gemmsql.datamodel import load_table
    from gemmsql.sketches import hll_registers
    from gemmsql.streaming import read_events_stream, run_to_memory

    ev = read_events_stream(spark, stream_dir)
    got = (
        run_to_memory(hll_registers(ev), "hll_regs_s")
        .toPandas()
        .sort_values(["event_type", "reg"])
        .reset_index(drop=True)
    )
    want = (
        hll_registers(load_table(spark, SF_SMOKE, "events"))
        .toPandas()
        .sort_values(["event_type", "reg"])
        .reset_index(drop=True)
    )
    assert got.equals(want), "streaming HLL registers diverge from batch"


def test_streaming_restart_recovers_exactly_once(spark):
    """Checkpoint-recovery parity (VERDICT r4 next #8): run the
    stream-stream join to a FILE sink, kill the query mid-replay,
    restart from the same checkpoint, and assert the final committed
    output still matches the batch oracle exactly — the recovery
    property a production streaming deployment actually relies on
    (file sink + checkpoint = exactly-once via the _spark_metadata
    transaction log; no duplicated and no lost matches)."""
    import os
    import time

    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        state_partitions,
        streaming_click_to_purchase,
    )

    base = tempfile.mkdtemp(prefix="gemmsql_restart_")
    src_dir = os.path.join(base, "src")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    # 8 source files + maxFilesPerTrigger=1 -> 8 micro-batches, so the
    # mid-stream kill lands between committed batches
    load_table(spark, SF_SMOKE, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(src_dir)

    def start():
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        clicks = ev.where(F.col("event_type") == "click")
        purchases = ev.where(F.col("event_type") == "purchase")
        return (
            streaming_click_to_purchase(clicks, purchases)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    with state_partitions(spark, 4):
        q = start()
        # kill after at least one batch committed but (normally) before
        # the replay drains
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
            if not q.isActive:
                break
            time.sleep(0.05)
        killed_midway = q.isActive
        q.stop()
        q.awaitTermination(60)

        # restart from the same checkpoint; availableNow drains the rest
        q2 = start()
        assert q2.awaitTermination(300), "restarted stream did not finish"
        restart_batches = [p["batchId"] for p in q2.recentProgress]

    got = (
        spark.read.parquet(out_dir)  # reads only files in _spark_metadata
        .toPandas()
        .sort_values(["purchase_id", "click_id"])
        .reset_index(drop=True)
    )
    ev = load_table(spark, SF_SMOKE, "events")
    ev.createOrReplaceTempView("events_restart")
    want = (
        spark.sql(
            """
            SELECT p.event_id AS purchase_id, c.event_id AS click_id
            FROM events_restart p JOIN events_restart c
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND c.ts BETWEEN p.ts - INTERVAL 6 HOUR AND p.ts
            """
        )
        .toPandas()
        .sort_values(["purchase_id", "click_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.to_numpy() == want.to_numpy()).all()
    # the recovery leg must actually have run: the kill lands
    # mid-replay (8 batches, stopped at ~batch 1) and the restarted
    # query continues from the checkpoint, processing further batches
    assert killed_midway, "replay drained before the kill — not a recovery test"
    assert restart_batches, "restart processed no batches"


def test_watermark_finalized_windows_drop_late_rows(spark):
    """The watermark guarantee, pinned: append mode emits each window
    EXACTLY ONCE after the watermark passes it, and a row arriving
    after its window was finalized is dropped (reported in
    numRowsDroppedByWatermark) — never resurrecting or duplicating the
    emitted result.  (Late rows whose window is still in state MAY
    merge — Spark's filter is best-effort on open state — so this
    pins the stronger, load-bearing half: finalized means final.
    Without it every straggler at 100 TB/day would reopen old windows
    and state would never evict.)"""
    import os

    from gemmsql.streaming.windows import state_partitions

    base = tempfile.mkdtemp(prefix="gemmsql_late_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    H = 3600 * 1_000_000
    schema = (
        "event_id long, ts_us long, user_id long, "
        "event_type string, value double"
    )

    def write_batch(name, rows):
        df = (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .drop("ts_us")
        )
        df.coalesce(1).write.parquet(os.path.join(src_dir, name))
        return df.schema

    # batch 1: hours 0..9 -> watermark advances to 7 after the batch
    sch = write_batch("b=1", [(i, i * H, 1, "e", 1.0) for i in range(10)])
    # batch 2: hour 10 -> windows 0..6 finalize + emit; watermark -> 8
    write_batch("b=2", [(200, 10 * H, 1, "e", 1.0)])
    # batch 3: a straggler into ALREADY-EMITTED hour 1 + fresh hour 11
    write_batch(
        "b=3",
        [(300, 1 * H + 60_000_000, 1, "e", 1.0), (301, 11 * H, 1, "e", 1.0)],
    )

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/b=*")
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("h_us"), "n")
    )
    name = "late_gate"
    with state_partitions(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    rows = [(r["h_us"] // H, r["n"]) for r in spark.table(name).collect()]
    # exactly-once emission: hours 0..8 (final watermark = 9), each
    # window once, each n=1 — the hour-1 straggler did NOT resurrect
    # or double-emit its finalized window
    assert sorted(rows) == [(h, 1) for h in range(9)]
    assert len(rows) == len({h for h, _ in rows}), "window emitted twice"
    assert dropped == 1, "the post-finalization straggler must be dropped"


def test_streaming_sliding_matches_batch(spark, stream_dir):
    """Sliding 1 h / 30 min windows: streaming replay == batch twin
    (the one windowed shape that had no streaming-side test)."""
    from gemmsql.pipeline.events import sliding_event_counts
    from gemmsql.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_sliding_counts,
    )

    ev = read_events_stream(spark, stream_dir)
    got = (
        run_to_memory(streaming_sliding_counts(ev), "sliding_s")
        .toPandas()
        .sort_values(["w_start_us", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        sliding_event_counts(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["w_start_us", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    common = [c for c in want.columns if c in got.columns]
    assert (
        got[common].to_numpy() == want[common].to_numpy()
    ).all(), "stream/batch sliding-window mismatch"


def test_rocksdb_state_store_same_results(spark):
    """The RocksDB state store — the provider a 100 TB deployment uses
    when state outgrows executor heap — must produce the same
    stream-stream join output as the default HDFS-backed store (state
    providers change WHERE state lives, never WHAT is computed)."""
    import os

    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        state_partitions,
        streaming_click_to_purchase,
    )

    base = tempfile.mkdtemp(prefix="gemmsql_rocksdb_")
    src_dir = os.path.join(base, "src")
    load_table(spark, SF_SMOKE, "events").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )

    def run(tag):
        ev = spark.readStream.schema(schema).parquet(src_dir)
        joined = streaming_click_to_purchase(
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "purchase"),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(f"rdb_{tag}")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return {
            (r["purchase_id"], r["click_id"])
            for r in spark.table(f"rdb_{tag}").collect()
        }

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    with state_partitions(spark, 4):
        default_out = run("hdfs")
        try:
            spark.conf.set(
                key,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            rocksdb_out = run("rocks")
        finally:
            spark.conf.set(key, old)
    assert rocksdb_out == default_out
    assert len(rocksdb_out) > 0


def test_streaming_cm_sketch_matches_batch(spark, stream_dir):
    """The count-min sketch is a per-counter SUM monoid, so the SAME
    cm_sketch() plan runs as a streaming aggregation with D*W bounded
    state — and its final counters must be bit-identical to the batch
    sketch's (stream/batch parity, like the HLL registers)."""
    from pyspark.sql import functions as F

    from gemmsql.datamodel import load_table
    from gemmsql.sketches import cm_sketch
    from gemmsql.streaming import read_events_stream, run_to_memory

    def tokens(ev):
        return ev.select(F.col("event_type").alias("word"))

    got = (
        run_to_memory(tokens(read_events_stream(spark, stream_dir))
                      .transform(cm_sketch), "cm_sketch_s")
        .toPandas()
        .sort_values(["k", "pos"])
        .reset_index(drop=True)
    )
    want = (
        cm_sketch(tokens(load_table(spark, SF_SMOKE, "events")))
        .toPandas()
        .sort_values(["k", "pos"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    assert got.equals(want), "streaming CM counters diverge from batch"


def _run_outer_join(spark, stream_dir, name):
    from gemmsql.streaming.windows import (
        read_events_stream,
        streaming_click_to_purchase_outer,
    )

    clicks = read_events_stream(spark, stream_dir).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, stream_dir).where(
        F.col("event_type") == "purchase"
    )
    q = (
        streaming_click_to_purchase_outer(clicks, purchases)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.table(name).collect()
    matched = {
        (r["purchase_id"], r["click_id"]) for r in rows
        if r["click_id"] is not None
    }
    unmatched = {r["purchase_id"] for r in rows if r["click_id"] is None}
    return matched, unmatched


def _outer_join_batch_expectation(spark):
    """Batch twin: inner pairs + the unmatched purchases whose event
    time the joint watermark min(max_c, max_p) - horizon passes."""
    import datetime

    from gemmsql.datamodel import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    c = ev.where(F.col("event_type") == "click").alias("c")
    inner = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 6 HOURS"))
            & (F.col("c.ts") <= F.col("p.ts")),
        )
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    max_c = c.agg(F.max("ts")).collect()[0][0]
    max_p = p.agg(F.max("ts")).collect()[0][0]
    watermark = min(max_c, max_p) - datetime.timedelta(hours=1)
    matched_pids = {pid for pid, _ in inner}
    unmatched = {
        r["event_id"]
        for r in p.select("p.event_id", "p.ts").collect()
        if r["event_id"] not in matched_pids and r["ts"] < watermark
    }
    return inner, unmatched


def test_streaming_outer_join_matches_batch(spark, stream_dir):
    """LEFT OUTER stream-stream join: matched pairs equal the batch
    inner join exactly; unmatched purchases emit with NULL click
    exactly when the joint watermark passes their event time."""
    got_m, got_u = _run_outer_join(spark, stream_dir, "outer_join_stream")
    want_m, want_u = _outer_join_batch_expectation(spark)
    assert got_m == want_m and len(want_m) > 0
    assert got_u == want_u and len(want_u) > 0


def test_streaming_outer_join_needs_finalization_batch(spark, stream_dir):
    """The inner-join gate disables noDataMicroBatches (SCALE.md r6);
    this pins WHY that must stay scoped: for an OUTER join the
    availableNow finalization batch is what advances the watermark past
    the replayed rows, so disabling it silently drops every unmatched
    row while matched pairs still look correct — the nastiest kind of
    wrong answer."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        got_m, got_u = _run_outer_join(
            spark, stream_dir, "outer_join_stream_nodata"
        )
    finally:
        spark.conf.set(key, old)
    want_m, _ = _outer_join_batch_expectation(spark)
    assert got_m == want_m          # matched legs still look fine...
    assert got_u == set()           # ...but every unmatched row is gone


def test_streaming_outer_join_gate_oracle_parity(spark):
    """In-repo twin of the driver's hash gate for the round-6 entrant
    (VERDICT r5 next #3: no gate entrant without in-repo parity): the
    outer-join gate vs its DuckDB oracle at the smoke tier."""
    import duckdb

    from gemmsql.streaming.windows import (
        STREAMING_OUTER_JOIN_GATE_SQL,
        streaming_outer_join_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_outer_join_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    odf = con.execute(STREAMING_OUTER_JOIN_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    assert sdf["click_id"].isna().any()     # the NULL side materialized


def test_streaming_value_histogram_matches_batch(spark, stream_dir):
    """The histogram-quantile sketch's state is a per-bin SUM monoid,
    so the SAME value_histogram() plan runs as a streaming aggregation
    with groups x bins bounded state — final counters bit-identical to
    batch (the CM/HLL stream/batch parity discipline)."""
    from gemmsql.datamodel import load_table
    from gemmsql.sketches import value_histogram
    from gemmsql.streaming import read_events_stream, run_to_memory

    def hist(ev):
        return value_histogram(ev, "event_type", "value", bin_w=10)

    got = (
        run_to_memory(hist(read_events_stream(spark, stream_dir)),
                      "value_hist_s")
        .toPandas()
        .sort_values(["g", "bin"])
        .reset_index(drop=True)
    )
    want = (
        hist(load_table(spark, SF_SMOKE, "events"))
        .toPandas()
        .sort_values(["g", "bin"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    assert got.equals(want), "streaming histogram diverges from batch"


def test_streaming_hist_gate_oracle_parity_and_watermark(spark):
    """In-repo twin of the driver's hash gate for the round-7 entrant
    (no gate entrant without in-repo parity): the append-mode
    day-windowed histogram-quantile gate vs its DuckDB oracle at the
    smoke tier — and the watermark semantics must be load-bearing: the
    final (still-open) day window is withheld by append mode, so it
    must be absent from the result."""
    import duckdb

    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        STREAMING_HIST_GATE_SQL,
        streaming_hist_gate,
    )
    from pyspark.sql import functions as F
    from tests.test_rotation import _hash

    sdf = streaming_hist_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    odf = con.execute(STREAMING_HIST_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    # the last event's day is an open window — append mode withholds it
    last_day_us = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.unix_micros(F.date_trunc("day", F.max("ts"))))
        .collect()[0][0]
    )
    assert last_day_us not in set(sdf["day_us"]), (
        "open day window leaked through the watermark gate"
    )
    assert len(sdf) > 0


def test_streaming_dedup_gate_oracle_parity_and_absorption(spark):
    """In-repo twin of the driver's hash gate for the round-7 seventh
    streaming gate (no gate entrant without in-repo parity): the
    dropDuplicatesWithinWatermark replay must equal batch DISTINCT —
    and the dedup state must actually absorb repeats (strictly fewer
    output rows than input events), or the gate would be vacuous."""
    import duckdb

    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        STREAMING_DEDUP_GATE_SQL,
        streaming_dedup_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_dedup_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    odf = con.execute(STREAMING_DEDUP_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert 0 < len(sdf) < n_events, (
        "dedup gate absorbed nothing — duplicate keys missing from the"
        " fixture data"
    )


def test_hist_gate_boundary_watermark_exactly_on_window_end(spark):
    """ADVICE r7 closed properly (round 9): a pinned corpus whose
    ``max(ts) - horizon`` lands EXACTLY on a day-window end, at
    microsecond AND millisecond precision.  Probed empirically: Spark's
    append-mode eviction is INCLUSIVE at equality (watermark ==
    window.end emits the window), which matches the oracle's
    ``day_end <= max(ts) - horizon`` rule — so both sides emit the
    boundary day and agree; no horizon nudge needed.  If a Spark
    upgrade ever flips the eviction comparison to strict, this test is
    the tripwire (and the documented fix is nudging the horizon off
    the boundary)."""
    import os

    import duckdb

    from gemmsql.streaming.windows import (
        STREAMING_HIST_GATE_SQL,
        _await_gate,
        _fresh_ckpt,
        state_partitions,
        streaming_value_hist_windows,
    )
    from gemmsql.sketches import quantiles_from_histogram
    from gemmsql.streaming.windows import HIST_GATE_BIN_W
    from tests.test_rotation import _hash

    base = tempfile.mkdtemp(prefix="gemmsql_boundary_")
    src = os.path.join(base, "src")
    DAY = 86400 * 1_000_000
    H = 3600 * 1_000_000
    d0 = 19723 * DAY
    # day0 rows; one row at day1 00:00 (keeps day1 open) and the max
    # at day1 01:00 -> watermark = max - 1h = day1 00:00 == day0's
    # window end, exactly.
    rows = [(i, d0 + i * H, 1, "e", float(10 * i)) for i in range(5)]
    rows.append((100, d0 + DAY, 1, "e", 42.0))
    rows.append((101, d0 + DAY + H, 1, "e", 55.0))
    schema = (
        "event_id long, ts_us long, user_id long, "
        "event_type string, value double"
    )
    df = (
        spark.createDataFrame(rows, schema)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
        .withColumn("props", F.lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    sch = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ev = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1000000")
        .parquet(src)
    )
    with state_partitions(spark):
        q = (
            streaming_value_hist_windows(ev)
            .writeStream.format("memory")
            .queryName("hist_boundary_gate")
            .outputMode("append")
            .option("checkpointLocation", _fresh_ckpt("gemmsql_ckpt_bnd"))
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    sdf = quantiles_from_histogram(
        spark.table("hist_boundary_gate"),
        ["day_us", "event_type"],
        bin_w=HIST_GATE_BIN_W,
        n_alias="n_events",
    ).toPandas()
    # the boundary day is emitted (inclusive eviction) and the open
    # day1 is withheld
    assert set(sdf["day_us"]) == {d0}
    # full-value agreement with the oracle's emission-rule replay
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{src}/*.parquet'")
    odf = con.execute(STREAMING_HIST_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)


def test_streaming_dq_gate_oracle_parity_and_watermark(spark):
    """In-repo twin of the round-10 streaming DQ gate (no gate entrant
    without in-repo parity): the batch engine's fused rule suite run
    as a day-windowed append-mode stream must hash-equal the batch
    oracle, the open final day must be withheld by the watermark, and
    the failing rules must actually fail (nonzero violation counts) or
    the gate would be vacuous."""
    import duckdb

    from gemmsql.datamodel import load_table
    from gemmsql.streaming.windows import (
        STREAMING_DQ_GATE_SQL,
        streaming_dq_gate,
    )
    from pyspark.sql import functions as F
    from tests.test_rotation import _hash

    sdf = streaming_dq_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    odf = con.execute(STREAMING_DQ_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    last_day_us = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.unix_micros(F.date_trunc("day", F.max("ts"))))
        .collect()[0][0]
    )
    assert last_day_us not in set(sdf["day_us"]), (
        "open day window leaked through the watermark gate"
    )
    by_rule = sdf.groupby("rule")["n_violations"].sum()
    assert by_rule["value_band"] > 0 and by_rule["type_known"] > 0
    assert by_rule["user_not_null"] == 0


def test_streaming_quarantine_gate_oracle_parity(spark):
    """In-repo twin of the round-12 streaming quarantine gate (no
    gate entrant without in-repo parity; the rotation-tier copy moved
    to the driver gate in r12): the stateless row-routing stream must
    match the batch WHERE twins with exact row membership — no
    watermark means no withheld tail — and at least one rule must
    actually route rows or the gate would be vacuous."""
    import duckdb

    from gemmsql.streaming.windows import (
        STREAMING_QUARANTINE_GATE_SQL,
        streaming_quarantine_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_quarantine_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    odf = con.execute(STREAMING_QUARANTINE_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    assert (sdf["rule"] == "value_band").sum() > 0


def test_streaming_asof_gate_oracle_parity(spark):
    """In-repo twin of the round-13 streaming as-of gate (promoted
    from rotation in r13 — no gate entrant without in-repo parity):
    the tolerance-bounded broadcast as-of + watermarked day-window
    pick-max must match DuckDB's NATIVE ASOF JOIN plus the emission
    rule with exact row membership."""
    import duckdb

    from gemmsql.streaming.windows import (
        STREAMING_ASOF_GATE_SQL,
        streaming_asof_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_asof_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    odf = con.execute(STREAMING_ASOF_GATE_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)


def test_streaming_ivm_gate_oracle_parity(spark):
    """In-repo twin of the round-13 streaming IVM gate: the change
    feed replayed as a 4-micro-batch update-mode stream, snapshot
    applied to the v1 base, must land on the direct-v3 aggregate the
    batch oracle computes from an independent replay."""
    import duckdb

    from gemmsql.pipeline.tablelog import (
        cdf_ivm_rollup_sql,
        streaming_ivm_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_ivm_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    odf = con.execute(cdf_ivm_rollup_sql(SF_SMOKE)).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)


def test_streaming_mor_ivm_gate_oracle_parity(spark):
    """In-repo twin of the round-15 streaming MOR-IVM gate (promoted
    from rotation in r15 — no gate entrant without in-repo parity):
    a delete_keys_mor commit landing mid-stream must leave the
    maintained view hash-equal to the batch snapshot_read_mor
    recompute, which is mor_delete_read's DuckDB twin verbatim."""
    import duckdb

    from gemmsql.pipeline.tablelog import (
        MOR_DELETE_READ_SQL,
        streaming_mor_ivm_gate,
    )
    from tests.test_rotation import _hash

    sdf = streaming_mor_ivm_gate(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    odf = con.execute(MOR_DELETE_READ_SQL).df()
    con.close()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
