"""NumPy-differential and invariant tests for the graph tier plus the
histogram-quantile sketch and the interval range join.

The gated queries' DuckDB hash parity lives in tests/test_gate_parity;
these tests check the MATH against an independent formulation — brute
force over the collected sf0.001 graph (200 nodes, ~9k edges), exactly
the discipline the ML ops get from their NumPy twins.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def adj(spark):
    """Dense 0/1 adjacency of the sf0.001 co-purchase graph plus the
    node-id index, from a single collect of the edge list."""
    from gemmsql.pipeline.graph import copurchase_edges

    edges = copurchase_edges(spark, SF_SMOKE).toPandas()
    nodes = sorted(set(edges["x"]) | set(edges["y"]))
    idx = {n: i for i, n in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for x, y in zip(edges["x"], edges["y"]):
        a[idx[x], idx[y]] = 1
        a[idx[y], idx[x]] = 1
    return a, nodes


def test_triangle_count_exact_matches_bruteforce(spark, adj):
    """colors=1 per-node counts == diag(A^3) / 2 (each triangle at a
    node is a closed 3-walk in both directions)."""
    from gemmsql.pipeline.graph import triangle_count

    a, nodes = adj
    per_node = np.diagonal(a @ a @ a) // 2
    got = triangle_count(spark, SF_SMOKE).toPandas()
    got_map = dict(zip(got["part"], got["n_triangles"]))
    for n, want in zip(nodes, per_node):
        assert got_map.get(n, 0) == want, f"node {n}"
    # total triangles = trace(A^3) / 6
    assert sum(got_map.values()) == int(np.trace(a @ a @ a)) // 2


def test_colorful_sampling_is_induced_subgraph(spark, adj):
    """The gated colorful counts must equal exact counting on the
    monochromatic induced subgraph, and n_est = colors^2 * n."""
    from gemmsql.pipeline.graph import TRI_COLORS, triangle_count_gate

    a, nodes = adj
    # replicate the md5 color: conv(substr(md5(str(n)),1,15),16,10) % c
    import hashlib

    def color(n):
        h = int(hashlib.md5(str(n).encode()).hexdigest()[:15], 16)
        return h % TRI_COLORS

    c = np.array([color(n) for n in nodes])
    mono = a * (c[:, None] == c[None, :])
    per_node = np.diagonal(mono @ mono @ mono) // 2
    got = triangle_count_gate(spark, SF_SMOKE).toPandas()
    got_n = dict(zip(got["part"], got["n_triangles"]))
    got_e = dict(zip(got["part"], got["n_est"]))
    for n, want in zip(nodes, per_node):
        assert got_n.get(n, 0) == want, f"node {n}"
    for n, v in got_n.items():
        assert got_e[n] == v * TRI_COLORS * TRI_COLORS


def test_pagerank_step_matches_integer_model(spark, adj):
    """The gated kernel == the integer model computed in NumPy."""
    from gemmsql.pipeline.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
        pagerank_step,
    )

    a, nodes = adj
    deg = a.sum(axis=1)
    share = (PR_DAMP_NUM * (PR_SCALE // deg)) // PR_DAMP_DEN
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    want = a.T @ share + teleport
    got = pagerank_step(spark, SF_SMOKE).toPandas()
    got_map = dict(zip(got["part"], got["rank1"]))
    for n, w in zip(nodes, want):
        assert got_map[n] == w, f"node {n}"


def test_pagerank_iter3_matches_integer_model(spark, adj):
    """The gated 3-iteration loop == the integer model iterated in
    NumPy (independent of the chained-CTE DuckDB twin, which
    test_gate_parity checks)."""
    from gemmsql.pipeline.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
        pagerank_iter3,
    )

    a, nodes = adj
    deg = a.sum(axis=1)
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    r = np.full(len(nodes), PR_SCALE, dtype=np.int64)
    for _ in range(PR_ITERS):
        share = (PR_DAMP_NUM * (r // deg)) // PR_DAMP_DEN
        r = a.T @ share + teleport
    got = pagerank_iter3(spark, SF_SMOKE).toPandas()
    got_map = dict(zip(got["part"], got["rank3"]))
    for n, w in zip(nodes, r):
        assert got_map[n] == w, f"node {n}"


def test_pagerank_iterated_matches_numpy(spark, adj):
    """The float library-tier power iteration tracks the NumPy
    reference to float tolerance after several iterations."""
    from gemmsql.pipeline.graph import pagerank

    a, nodes = adj
    deg = a.sum(axis=1).astype(float)
    r = np.ones(len(nodes))
    for _ in range(4):
        r = 0.15 + 0.85 * (a.T @ (r / deg))
    got = pagerank(spark, SF_SMOKE, iters=4).toPandas()
    got_map = dict(zip(got["part"], got["rank"]))
    for n, w in zip(nodes, r):
        assert math.isclose(got_map[n], w, rel_tol=1e-9), f"node {n}"


def test_hist_quantiles_bins_contain_exact_ranks(spark):
    """Each reported pXX must be the lower edge of the bin holding the
    exact rank-ceil(n*q/100) order statistic."""
    from gemmsql.datamodel import load_table
    from gemmsql.sketches import HIST_BIN_W, HIST_QS, hist_quantiles

    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    got = hist_quantiles(spark, SF_SMOKE).toPandas()
    for _, row in got.iterrows():
        vals = np.sort(
            orders.loc[
                orders["o_orderpriority"] == row["o_orderpriority"],
                "o_totalprice",
            ].to_numpy()
        )
        assert row["n_orders"] == len(vals)
        for q in HIST_QS:
            rank = -(-len(vals) * q // 100)  # ceil
            exact = vals[rank - 1]
            lo = row[f"p{q}"]
            assert lo <= exact < lo + HIST_BIN_W, (
                row["o_orderpriority"], q
            )


def test_concurrent_orders_matches_bruteforce(spark):
    """Pair counts == brute-force O(n^2) overlap check per customer on
    the collected sf0.001 intervals."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.joins import concurrent_orders

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_orderkey")
        .agg({"l_shipdate": "max"})
        .withColumnRenamed("max(l_shipdate)", "ship_end")
        .toPandas()
    )
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .toPandas()
    )
    iv = orders.merge(
        li, left_on="o_orderkey", right_on="l_orderkey"
    )
    want: dict[int, int] = {}
    for ck, grp in iv.groupby("o_custkey"):
        rows = list(
            zip(grp["o_orderkey"], grp["o_orderdate"], grp["ship_end"])
        )
        n = 0
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if a[1] <= b[2] and b[1] <= a[2]:
                    n += 1
        want[ck] = n
    got = concurrent_orders(spark, SF_SMOKE).toPandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert row["n_overlapping"] == want[row["o_custkey"]], (
            row["o_custkey"]
        )


def test_orientation_of_empty_edge_frame(spark):
    """An edge-free shard (all single-item baskets) must flow through
    orientation as an empty frame with the right schema, not crash."""
    from gemmsql.pipeline.graph import _oriented

    empty = spark.createDataFrame([], "x long, y long")
    o = _oriented(empty)
    assert o.columns == ["u", "v", "rv"] and o.count() == 0


def test_copurchase_min_support_filters(spark):
    """Support-2 backbone must be a subset of the raw edge set and
    every kept pair must genuinely repeat."""
    from gemmsql.pipeline.graph import copurchase_edges

    raw = copurchase_edges(spark, SF_SMOKE).toPandas()
    s2 = copurchase_edges(spark, SF_SMOKE, min_support=2).toPandas()
    raw_set = set(zip(raw["x"], raw["y"]))
    s2_set = set(zip(s2["x"], s2["y"]))
    assert s2_set <= raw_set
    assert 0 < len(s2_set) < len(raw_set)


def test_part_communities_are_consistent(spark):
    """Labels must be component-consistent: both endpoints of every
    supported edge share a component, and the component id is the
    minimum member."""
    from gemmsql.pipeline.graph import (
        COMMUNITY_SUPPORT,
        copurchase_edges,
        part_communities,
    )

    labels = part_communities(spark, SF_SMOKE).toPandas()
    lab = dict(zip(labels["part"], labels["component"]))
    edges = copurchase_edges(
        spark, SF_SMOKE, min_support=COMMUNITY_SUPPORT
    ).toPandas()
    for x, y in zip(edges["x"], edges["y"]):
        assert lab[x] == lab[y], (x, y)
    comp_min: dict[int, int] = {}
    for p, c in lab.items():
        comp_min[c] = min(comp_min.get(c, p), p)
    for c, mn in comp_min.items():
        assert c == mn, f"component {c} labeled above its minimum {mn}"


def test_new_ops_bit_stable_across_partitionings(spark):
    """The late-round-6 gate entrants are integer/fixed-point exact, so
    their results must be BIT-IDENTICAL under a different shuffle
    partitioning (the ML gates' discipline) — any drift would mean an
    order-dependent reduction snuck in."""
    import pandas as pd

    from gemmsql.pipeline.graph import pagerank_step, triangle_count_gate
    from gemmsql.pipeline.joins import concurrent_orders
    from gemmsql.sketches import hist_quantiles

    cases = [
        (triangle_count_gate, ["part"]),
        (pagerank_step, ["part"]),
        (hist_quantiles, ["o_orderpriority"]),
        (concurrent_orders, ["o_custkey"]),
    ]
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    outs = {}
    try:
        for parts in ("7", old):
            spark.conf.set(key, parts)
            for fn, by in cases:
                df = fn(spark, SF_SMOKE).toPandas()
                outs.setdefault(fn.__name__, []).append(
                    df.sort_values(by).reset_index(drop=True)
                )
    finally:
        spark.conf.set(key, old)
    for name, (a, b) in outs.items():
        pd.testing.assert_frame_equal(a, b, check_exact=True), name


def test_orientation_guard_fires_outside_envelope(spark):
    """A node id past 2^32 must fail the packed-rank envelope loudly —
    the guard rides inside the consumed degree column, so Catalyst
    cannot prune it (the mixture_temperature lesson)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from gemmsql.pipeline.graph import _oriented

    edges = spark.createDataFrame(
        [(1 << 33, 7), (7, 9)], "x long, y long"
    )
    with _pytest.raises((Py4JJavaError, Exception), match="overflow"):
        _oriented(edges).collect()


def test_interval_join_keyless_bruteforce_and_dedupe(spark):
    """The chunk-bucketed keyless join must return every overlapping
    pair EXACTLY once — including pairs whose intervals share several
    buckets (the first-cell dedupe) and pairs spanning a bucket
    boundary — against an O(n^2) brute force."""
    from gemmsql.pipeline.joins import interval_join_keyless

    rows = [
        (1, 0, 250),     # spans buckets 0-2
        (2, 100, 120),   # inside bucket 1 (overlaps 1 and 5)
        (3, 240, 400),   # spans 2-4, overlaps 1 in bucket 2 only
        (4, 500, 510),   # bucket 5, overlaps 3? no (400 < 500); 5 yes
        (5, 95, 505),    # spans 0-5, overlaps everyone
        (6, 600, 610),   # overlaps nothing
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = (
        interval_join_keyless(df, id_col="id", start="s", end="e", chunk=100)
        .select("id1", "id2")
        .toPandas()
    )
    pairs = [tuple(r) for r in got.values]
    want = {
        (a, b)
        for (a, sa, ea) in rows
        for (b, sb, eb) in rows
        if a < b and sa <= eb and sb <= ea
    }
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    assert set(pairs) == want


def test_concurrent_events_matches_bruteforce(spark):
    """Gate counts == brute-force O(n^2) overlap on the collected
    sf0.001 error events (independent of the DuckDB twin)."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.joins import CE_WINDOW_US, concurrent_events

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .where("event_type = 'error'")
        .selectExpr("event_id", "unix_micros(ts) AS s")
        .toPandas()
    )
    s = ev["s"].to_numpy()
    e = s + CE_WINDOW_US
    n = len(ev)
    cnt = {int(i): 0 for i in ev["event_id"]}
    for a in range(n):
        for b in range(a + 1, n):
            if s[a] <= e[b] and s[b] <= e[a]:
                cnt[int(ev["event_id"][a])] += 1
                cnt[int(ev["event_id"][b])] += 1
    got = concurrent_events(spark, SF_SMOKE).toPandas()
    assert len(got) == n
    for _, row in got.iterrows():
        assert row["n_concurrent"] == cnt[int(row["event_id"])]


def test_interval_hot_key_split_matches_plain_path(spark):
    """The hot-key chunk-split (SCALE.md mitigation, code since round
    9): one pathological key with many mutually overlapping intervals
    plus normal cold keys — the split path must return EXACTLY the
    plain equi-key path's pairs, the probe must actually route the hot
    key through chunk bucketing, and no plan may contain a cartesian."""
    from gemmsql.pipeline.joins import interval_self_join

    rows = []
    # hot key 99: 60 intervals all overlapping around [0, 1000)
    for i in range(60):
        rows.append((99, 1000 + i, i * 10, i * 10 + 400))
    # cold keys 1..5: 6 intervals each, mixed overlap
    for k in range(1, 6):
        for i in range(6):
            rows.append((k, k * 100 + i, i * 50, i * 50 + 30 + 10 * k))
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")

    def pairs(d):
        return sorted(
            (r.k, r.id1, r.id2) for r in d.select("k", "id1", "id2").collect()
        )

    plain = interval_self_join(df, key="k", id_col="id", start="s", end="e")
    split = interval_self_join(
        df, key="k", id_col="id", start="s", end="e",
        hot_key_threshold=20, chunk=200,
    )
    assert pairs(plain) == pairs(split)
    # the hot key must produce pairs through the split path too
    assert any(k == 99 for k, _, _ in pairs(split))
    # threshold nobody exceeds -> pure equi-key path, same answer
    nothot = interval_self_join(
        df, key="k", id_col="id", start="s", end="e",
        hot_key_threshold=10_000, chunk=200,
    )
    assert pairs(plain) == pairs(nothot)
    from tests.test_plans import plan_of

    assert "Cartesian" not in plan_of(split)
    with pytest.raises(ValueError, match="chunk"):
        interval_self_join(
            df, key="k", id_col="id", start="s", end="e",
            hot_key_threshold=5,
        )
