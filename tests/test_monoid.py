"""Tests for the make_monoid_op factory (the mk_GeMMMapReduce analog)
and the numerics kernels."""

from __future__ import annotations

import math

import numpy as np

from gemmsql.monoid import make_monoid_op
from gemmsql.numerics import group_logsumexp, logaddexp
from pyspark.sql import functions as F


def test_monoid_sum_op(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    op = make_monoid_op(
        zero=lambda: 0.0,
        lift=lambda row, acc: acc + row["v"],
        merge=lambda a, b: a + b,
        finish=lambda a: {"total": a},
        schema="k long, total double",
    )
    got = {r["k"]: r["total"] for r in op(df, ["k"]).collect()}
    want = {}
    for i in range(100):
        want[i % 7] = want.get(i % 7, 0.0) + float(i)
    assert got == want


def test_monoid_logsumexp_op_matches_sql_kernel(spark):
    rng = np.random.default_rng(0)
    data = [(int(i % 5), float(v)) for i, v in enumerate(rng.normal(size=200) * 3)]
    df = spark.createDataFrame(data, "k int, s double")
    op = make_monoid_op(
        zero=lambda: float("-inf"),
        lift=lambda row, acc: np.logaddexp(acc, row["s"]),
        merge=lambda a, b: float(np.logaddexp(a, b)),
        finish=lambda a: {"lse": float(a)},
        schema="k int, lse double",
    )
    got = {r["k"]: r["lse"] for r in op(df, ["k"]).collect()}
    sql = {
        r["k"]: r["lse"]
        for r in group_logsumexp(df, ["k"], "s", "lse").collect()
    }
    for k in got:
        assert math.isclose(got[k], sql[k], rel_tol=1e-12)


def test_logaddexp_column_expr(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (-1000.0, -1001.0), (50.0, -50.0)], "a double, b double"
    )
    got = df.select(logaddexp(F.col("a"), F.col("b")).alias("o")).collect()
    for row, (a, b) in zip(got, [(1.0, 2.0), (-1000.0, -1001.0), (50.0, -50.0)]):
        assert math.isclose(row["o"], float(np.logaddexp(a, b)), rel_tol=1e-12)


def test_datamodel_roundtrip(spark):
    from gemmsql.datamodel import coo_from_vectors, embeddings_vectors, vectors_from_coo
    from tests.conftest import SF_SMOKE

    vec = embeddings_vectors(spark, SF_SMOKE).select("i", "vec")
    coo = coo_from_vectors(vec)
    back = vectors_from_coo(coo)
    a = vec.orderBy("i").toPandas()
    b = back.orderBy("i").toPandas()
    assert (a["i"] == b["i"]).all()
    assert np.allclose(
        np.asarray(a["vec"].tolist()), np.asarray(b["vec"].tolist())
    )


# ---- property-based monoid laws (hypothesis) ----------------------------

from hypothesis import given, settings, strategies as st

finite = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False)


@settings(max_examples=10, deadline=None)
@given(st.lists(finite, min_size=1, max_size=12))
def test_collected_lse_matches_numpy(spark, zs):
    """collected_lse over any partial list == numpy logsumexp."""
    from gemmsql.numerics import collected_lse

    df = spark.createDataFrame(
        [(1, [{"z": float(z)} for z in zs])],
        "i int, ps array<struct<z: double>>",
    )
    got = df.select(collected_lse(F.col("ps"), "z").alias("o")).first()["o"]
    want = float(np.logaddexp.reduce(np.asarray(zs, dtype=np.float64)))
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(finite, finite), min_size=2, max_size=10),
    st.randoms(use_true_random=False),
)
def test_logspace_merge_is_order_independent(spark, pairs, rnd):
    """The fused (z, n) weighted merge (entropy's binary_reduce) gives
    the same result for ANY permutation of the partial list — the
    associativity/commutativity the reference requires of
    binary_reduce (core.py:32), now as an executable law."""
    from gemmsql.numerics import collected_lse

    def run(order):
        df = spark.createDataFrame(
            [(1, [{"p": float(p), "n": float(n)} for p, n in order])],
            "i int, ps array<struct<p: double, n: double>>",
        )
        g = df.withColumn("z", collected_lse(F.col("ps"), "p"))
        wsum = F.aggregate(
            F.col("ps"), F.lit(0.0),
            lambda acc, p: acc + p["n"] * F.exp(p["p"] - F.col("z")),
        )
        r = g.select(F.col("z").alias("z"), wsum.alias("w")).first()
        return r["z"], r["w"]

    base = run(pairs)
    shuffled = list(pairs)
    rnd.shuffle(shuffled)
    other = run(shuffled)
    assert math.isclose(base[0], other[0], rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(base[1], other[1], rel_tol=1e-9, abs_tol=1e-9)


def test_block_id_is_integral_floor(spark):
    """block_id == floor(i / block): a tile INDEX, not a fraction
    (VERDICT r1 'what's wrong' #3)."""
    from pyspark.sql import functions as F
    from gemmsql.datamodel import block_id

    df = spark.range(10).select(F.col("id").alias("i"))
    got = df.select("i", block_id("i", 4).alias("b")).orderBy("i").collect()
    assert [r["b"] for r in got] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert dict(df.select(block_id("i", 4).alias("b")).dtypes)["b"] == "bigint"
