"""Property tests (hypothesis) for the closed-form scaling rules the
ANN/LSH family relies on.  These rules are replayed verbatim by the
DuckDB oracles, so their algebraic properties — monotonicity, the
bound they exist to enforce, minimality — are contract, not detail.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gemmsql.pipeline.similarity import (
    DUP_PLANES_MIN,
    IVF_K_MIN,
    MIN_PLANES,
    TARGET_BUCKET,
    dup_planes_for,
    ivf_k_for,
    n_planes_for,
)

N = st.integers(min_value=1, max_value=10**15)


@settings(max_examples=300)
@given(N)
def test_ivf_k_bound_and_minimality(n):
    k = ivf_k_for(n)
    assert k >= IVF_K_MIN and (k & (k - 1)) == 0
    assert k * k >= n
    if k > IVF_K_MIN:
        assert (k // 2) ** 2 < n


@settings(max_examples=300)
@given(N, N)
def test_rules_monotone(a, b):
    lo, hi = sorted((a, b))
    assert ivf_k_for(lo) <= ivf_k_for(hi)
    assert n_planes_for(lo) <= n_planes_for(hi)
    assert dup_planes_for(lo) <= dup_planes_for(hi)


@settings(max_examples=300)
@given(N)
def test_plane_rules_bound_expected_bucket(n):
    for rule, floor in ((n_planes_for, MIN_PLANES),
                        (dup_planes_for, DUP_PLANES_MIN)):
        p = rule(n)
        assert p >= floor
        assert (TARGET_BUCKET << p) >= n          # expected bucket <= target
        if p > floor:
            assert (TARGET_BUCKET << (p - 1)) < n  # minimal such p
