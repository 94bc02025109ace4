"""Persisted HLL sketch store (`gemmsql/sketches.py`): the
incremental-analytics contract.  Full Spark-vs-DuckDB hash parity for
`sketch_store_rollup` runs in tests/test_rotation.py; here we pin the
properties parity can't see."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from gemmsql import sketches as sk


def test_incremental_equals_direct(spark):
    """Merging persisted day sketches must give BIT-IDENTICAL
    estimates to sketching the raw union — register-max is the merge
    monoid, so the store adds no approximation on top of HLL's."""
    direct = {
        r["event_type"]: r["approx_users"]
        for r in sk.user_reach_sketch(spark, SF_SMOKE).collect()
    }
    rollup = {
        r["event_type"]: r["approx_users"]
        for r in sk.sketch_store_rollup(spark, SF_SMOKE).collect()
        if r["scope"] == "all"
    }
    assert rollup == direct


def test_store_is_register_bounded(spark):
    """<= 4096 register rows per (day, event_type), whatever the
    day's event volume — the fixed-state property that makes the
    store kilobytes at any scale."""
    store = spark.read.parquet(sk.stage_sketch_store(spark, SF_SMOKE))
    worst = (
        store.groupBy("day", "event_type")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert worst <= sk.HLL_M
    # and registers are unique per group: the monoid state, not rows
    dup = (
        store.groupBy("day", "event_type", "reg")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_adding_a_day_is_a_pure_merge(spark):
    """The incremental property a daily pipeline relies on: the
    estimate over days <= D+1 equals re-merging the <= D rollup state
    with day D+1's registers alone — no earlier day is touched."""
    store = spark.read.parquet(sk.stage_sketch_store(spark, SF_SMOKE))
    days = sorted(r["day"] for r in store.select("day").distinct().collect())
    upto, nxt = days[-2], days[-1]
    prefix = store.filter(F.col("day") <= upto)
    merged_prefix = prefix.groupBy("event_type", "reg").agg(
        F.max("rho").alias("rho")
    )
    incremental = (
        merged_prefix.unionByName(
            store.filter(F.col("day") == nxt).select(
                "event_type", "reg", "rho"
            )
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    full = (
        store.filter(F.col("day") <= nxt)
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    a = sorted(map(tuple, sk.hll_estimate(incremental, ["event_type"]).collect()))
    b = sorted(map(tuple, sk.hll_estimate(full, ["event_type"]).collect()))
    assert a == b


def test_staging_is_idempotent(spark):
    d1 = sk.stage_sketch_store(spark, SF_SMOKE)
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    d2 = sk.stage_sketch_store(spark, SF_SMOKE)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "_SUCCESS")) == mtime


def test_sample_sketch_merge_equals_whole(spark):
    """The bottom-k paired sample is a monoid: sketches of disjoint
    halves merge into EXACTLY the whole's sketch."""
    import numpy as np

    from gemmsql.datamodel import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    whole = {r["event_type"]: (list(r["hs"]), list(r["vs"]))
             for r in sk.sample_quantile_sketch(ev, k=64).collect()}
    merged = {}
    for half in ("event_id % 2 = 0", "event_id % 2 = 1"):
        part = sk.sample_quantile_sketch(ev.filter(half), k=64)
        for r in part.collect():
            h, v = merged.get(r["event_type"], ([], []))
            merged[r["event_type"]] = (h + list(r["hs"]),
                                       v + list(r["vs"]))
    for et, (h, v) in merged.items():
        o = np.argsort(np.array(h), kind="stable")[:64]
        assert (list(np.array(h)[o]), list(np.array(v)[o])) == whole[et]


def test_sample_quantiles_rank_error_bounded(spark):
    """The estimator contract: each sample quantile's TRUE rank in
    the full group stays within ~2/sqrt(k) of the asked fraction."""
    from gemmsql.datamodel import load_table

    got = {r["event_type"]: r
           for r in sk.sample_quantiles(spark, SF_SMOKE).collect()}
    full = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .toPandas()
    )
    for et, grp in full.groupby("event_type"):
        vals = grp["value"].sort_values().to_numpy()
        n = len(vals)
        for name, q in (("p25", 0.25), ("p50", 0.5),
                        ("p75", 0.75), ("p95", 0.95)):
            est = got[et][name]
            rank = (vals <= est).sum() / n
            assert abs(rank - q) < 0.25, (et, name, rank, q)


def test_segment_value_quantiles_rank_error_bounded(spark):
    """The production call site's exact-quantile contract: each
    per-segment sample quantile's TRUE rank in the segment's full
    value distribution stays within ~2/sqrt(k) of the asked
    fraction."""
    from gemmsql.datamodel import load_table

    got = {r["segment"]: r
           for r in sk.segment_value_quantiles(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment")
    full = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .select("c_mktsegment", "value")
        .toPandas()
    )
    assert set(got) == set(full["c_mktsegment"].unique())
    for seg, grp in full.groupby("c_mktsegment"):
        vals = grp["value"].sort_values().to_numpy()
        n = len(vals)
        for name, q in (("p25", 0.25), ("p50", 0.5),
                        ("p75", 0.75), ("p95", 0.95)):
            est = got[seg][name]
            rank = (vals <= est).sum() / n
            assert abs(rank - q) < 0.25, (seg, name, rank, q)
