"""Generalized as-of join semantics (gemmsql/pipeline/joins.py):
direction, tolerance, and tie rules on hand-built frames."""

from __future__ import annotations

import pytest

from gemmsql.pipeline.joins import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 5, "c")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 12, 200), (1, 15, 300), (2, 50, 400)],
        "k long, rts long, v long",
    )
    return left, right


def _run(frames, **kw):
    left, right = frames
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload={"v": "v"}, **kw,
    )
    return {(r["k"], r["ts"]): r["v"] for r in out.collect()}


def test_backward_default(frames):
    got = _run(frames)
    # ts=15 sees the SAME-instant right row (inclusive default)
    assert got == {(1, 10): 100, (1, 15): 300, (2, 5): None}


def test_backward_exclusive(frames):
    got = _run(frames, inclusive=False)
    assert got[(1, 15)] == 200  # same-instant row no longer visible


def test_forward(frames):
    got = _run(frames, direction="forward")
    assert got == {(1, 10): 200, (1, 15): 300, (2, 5): 400}


def test_nearest_prefers_backward_on_tie(frames):
    got = _run(frames, direction="nearest")
    # ts=10: backward dist 2 (rts=8), forward dist 2 (rts=12) -> backward
    assert got[(1, 10)] == 100
    assert got[(1, 15)] == 300  # exact hit, dist 0
    assert got[(2, 5)] == 400   # only a forward match exists


def test_tolerance_nulls_far_matches(frames):
    got = _run(frames, direction="nearest", tolerance=1)
    assert got == {(1, 10): None, (1, 15): 300, (2, 5): None}
    got = _run(frames, direction="forward", tolerance=45)
    assert got[(2, 5)] == 400
