"""gemmsql.check — the differential harness itself (reference
core.py:67-147): equality verdicts, speed protocol, and the driver-side
collection guard (VERDICT r4 wrong #3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gemmsql.check import check_equality, check_speed


def test_check_equality_verdicts(spark):
    a = spark.range(10).select(
        F.col("id").alias("i"), (F.col("id") * 2.0).alias("v")
    )
    b = spark.range(10).select(
        F.col("id").alias("i"), (F.col("id") * 2.0).alias("v")
    )
    rep = check_equality(a, b, ["i"])
    assert rep["ok"] is True
    assert rep["columns"]["v"]["allclose"] is True

    c = b.withColumn("v", F.col("v") + 0.5)
    rep = check_equality(a, c, ["i"])
    assert rep["ok"] is False
    assert rep["columns"]["v"]["max_abs"] == pytest.approx(0.5)

    # shape mismatch short-circuits
    rep = check_equality(a, b.filter("i < 5"), ["i"])
    assert rep["ok"] is False and "shape" in rep


def test_check_equality_refuses_full_scale_collect(spark):
    """The harness collects both sides; a result bigger than max_rows
    must be refused, not silently pulled onto the driver."""
    big = spark.range(100).select(F.col("id").alias("i"))
    with pytest.raises(ValueError, match="max_rows"):
        check_equality(big, big, ["i"], max_rows=50)
    # guard costs a limit(n+1).count(), not a full count
    ok = check_equality(big, big, ["i"], max_rows=100)
    assert ok["ok"] is True


def test_check_speed_runs(spark):
    sec = check_speed(
        lambda: spark.range(1000).select(F.sum("id").alias("s")),
        runs=2,
        warmup=0,
    )
    assert sec > 0.0
