"""Custom stateful streaming operators via ``applyInPandasWithState``
(Spark's ``GroupState`` arbitrary-state API).

Two operators:

- :func:`streaming_logsumexp` — the monoid fold as streaming state:
  per-key running ``(z = logsumexp of scores, n = count)`` across
  micro-batches.  The state update IS ``binary_reduce`` (reference
  attention.py:31-36 / xentropy.py:39-44): merge the incoming batch's
  partial ``z_b`` into the stored ``z`` with logaddexp.  This is the
  template for porting any engine monoid op to streaming — state
  schema == accumulator schema, update == merge.  Float tier,
  NumPy-differential tested.
- :func:`streaming_user_profile` / :func:`streaming_stateful_gate` —
  a per-user RUNNING PROFILE (event count, exact micro-unit value sum,
  first/last event time, purchase count) maintained as explicit group
  state and re-emitted as a snapshot whenever the user's group appears
  in a batch.  The state is all exact int64 (values quantized to
  micros BEFORE entering Python, timestamps as unix micros), so the
  profile is independent of batch boundaries and row order.  The gate
  materializes every snapshot via a memory sink in ``update`` mode and
  keeps each user's LAST snapshot (``max_by`` on the strictly
  increasing event count) — equal to the batch aggregate no matter how
  the file source splits micro-batches.  That makes user-defined
  streaming state hash-comparable to a plain batch SQL oracle: the
  correctness gate enforces stream/batch parity for arbitrary state,
  not just built-in windowed aggregations.

Scale shape: state is O(distinct keys) small fixed-width rows,
partitioned by the grouping key across executors (RocksDB/HDFS state
store on a real cluster); each micro-batch shuffles only its own rows
to the key's partition.  The Python hop is Arrow-batched.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def _logaddexp(a: float, b: float) -> float:
    return float(np.logaddexp(a, b))


def streaming_logsumexp(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    score_col: str = "value",
) -> DataFrame:
    """Per-key running ``(logsumexp(score), count)`` over a stream.

    Emits one updated row per key per micro-batch (update semantics)."""

    def update(key, pdfs, state: GroupState):
        z = -np.inf
        n = 0
        if state.exists:
            z, n = state.get
        for pdf in pdfs:
            s = pdf[score_col].to_numpy(dtype=np.float64)
            if len(s):
                z = _logaddexp(z, float(np.logaddexp.reduce(s)))
                n += len(s)
        state.update((float(z), int(n)))
        yield pd.DataFrame({"key": [key[0]], "z": [z], "n": [n]})

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, z double, n long",
            stateStructType="z double, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------- user profile gate

_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_micro", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_purchase", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sv", LongType()),
        StructField("mn", LongType()),
        StructField("mx", LongType()),
        StructField("np", LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the group state and
    emit the updated running snapshot (exact integer arithmetic only —
    batch-boundary and row-order independent)."""
    n = sv = np_ = 0
    mn = mx = None
    if state.exists:
        n, sv, mn, mx, np_ = state.get
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        sv += int(pdf["v_micro"].sum())
        np_ += int(pdf["is_p"].sum())
        bmn = int(pdf["ts_us"].min())
        bmx = int(pdf["ts_us"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, sv, mn, mx, np_))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_micro": [sv],
            "first_us": [mn],
            "last_us": [mx],
            "n_purchase": [np_],
        }
    )


def streaming_user_profile(events: DataFrame) -> DataFrame:
    """Stateful per-user running profile over a streaming events frame:
    quantize to exact integers JVM-side, then fold through
    ``applyInPandasWithState``."""
    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("v_micro"),
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_snapshots(snapshots: DataFrame) -> DataFrame:
    """Collapse running snapshots to each user's final one: ``n_events``
    strictly increases per emission, so ``max_by`` picks the last."""
    return snapshots.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_micro", "n_events").alias("sum_micro"),
        F.max_by("first_us", "n_events").alias("first_us"),
        F.max_by("last_us", "n_events").alias("last_us"),
        F.max_by("n_purchase", "n_events").alias("n_purchase"),
    )


def streaming_stateful_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form: replay events through a real availableNow file
    stream (4 files/micro-batch -> state genuinely crosses batches),
    collapse to final snapshots, and return a batch frame hash-equal to
    :data:`STREAMING_STATEFUL_GATE_SQL`."""
    from gemmsql.streaming.windows import (
        _await_gate,
        read_events_stream,
        stage_stream_dir,
        state_partitions,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    target = os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}")
    stage_stream_dir(spark, sf_dir, target)
    ev = read_events_stream(spark, target)
    name = "stream_gate_stateful"
    with state_partitions(spark):
        q = (
            streaming_user_profile(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _await_gate(q)
    return final_snapshots(spark.table(name)).select(
        "user_id",
        "n_events",
        F.round(F.col("sum_micro").cast("double") / 1e6, 6).alias("sum_value"),
        "first_us",
        "last_us",
        "n_purchase",
    )


STREAMING_STATEFUL_GATE_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0, 6) AS sum_value,
       MIN(epoch_us(ts)) AS first_us,
       MAX(epoch_us(ts)) AS last_us,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase
FROM events GROUP BY user_id
"""
