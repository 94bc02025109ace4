"""Graph analytics over the co-purchase graph: triangles, PageRank,
communities, item similarity, association rules.

The graph: undirected part co-purchase edges — ``(x, y)`` iff parts
``x`` and ``y`` appear in the same order (distinct pairs, derived from
``lineitem`` baskets).  The reference has no graph surface at all;
these are the canonical large-graph kernels a corpus/feature pipeline
needs, each expressed as plain equi-joins so Catalyst/AQE handle skew
and physical strategy.

Scale shapes (the part that must survive 100 TB):

- **Edge derivation** is one shuffle on ``l_orderkey``; per-order
  fan-out is C(items_per_order, 2) — bounded by basket size, never by
  corpus size.
- **Triangle counting** uses the degree-ordered node-iterator
  (Schank & Wagner's *forward*/compact-forward scheme, also the
  orientation used by every vertex-centric triangle paper since):
  orient each undirected edge from the endpoint of smaller
  ``(degree, id)`` rank to the larger.  Out-degree in the oriented DAG
  is O(sqrt(m)) regardless of hub skew, so the wedge join generates
  sum_u C(outdeg(u), 2) = O(m^1.5) candidates worst-case — the
  provably optimal join-based bound — instead of the hub-quadratic
  blowup of an unoriented formulation.  Both joins (wedge build on
  ``u``, closure probe on ``(v1, v2)``) are shuffle equi-joins; no
  cartesian anywhere, and AQE splits residual skew.
- **PageRank step** is the per-iteration kernel (like
  ``cluster.kmeans_assign_step``): out-degree is a groupBy, the
  contribution scatter is one shuffle on the destination node.  The
  driver never sees the graph; iterating is a loop over the same
  single-shuffle kernel.

Determinism: counts are exact integers; the PageRank step uses the
same fixed-point trick as the gated ML ops — integer ``div`` for the
damped share so Spark and DuckDB agree bit-for-bit (a double SUM over
a shuffled edge set is order-dependent in the last ulp; an int64 SUM
is associative).  Rank encoding packs ``(degree, node)`` into one
int64 (``degree * 2^32 + node``) — exact while nodes < 2^32 and
degree < 2^31, asserted envelope, far past this graph and checkable
before orientation at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.caching import scoped_cache
from gemmsql.datamodel import load_table

#: fixed-point scale for the PageRank integer arithmetic: rank0 = PR_SCALE.
PR_SCALE = 1_000_000_000
#: damping numerator/denominator (0.85) applied in integer space.
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100

_RANK_SHIFT = 1 << 32  # (degree, node) -> degree * 2^32 + node


def _color_sql(expr: str, colors: int) -> str:
    """Deterministic node color in [0, colors) — the md5 gate every
    sampled op in the repo uses (the Spark twin is the inline
    ``pmod(conv(substring(md5(...))))`` in the basket pair expansion),
    so DuckDB replays it bit-for-bit."""
    return (
        f"CAST('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {colors}"
    )


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    *,
    colors: int = 1,
    min_support: int = 1,
) -> DataFrame:
    """Distinct undirected co-purchase edges ``(x, y)`` with
    ``x < y`` — parts bought together in at least one order.

    One shuffle on ``l_orderkey``; the self-join fan-out is bounded by
    basket size (C(7,2) for TPC-H-ish data), so edge count is linear
    in order count.

    ``colors > 1`` applies Pagh-Tsourakakis colorful sampling: each
    node gets a deterministic hash color in ``[0, colors)`` and only
    monochromatic edges survive.  The induced subgraph keeps each
    triangle with probability ``colors^-2`` (both partners must match
    the third node's color), so downstream triangle counts scaled by
    ``colors^2`` are unbiased — the standard way to trade accuracy
    for a ``colors^2`` cut in wedge volume on a 100 TB graph.

    ``min_support > 1`` keeps only pairs co-purchased in at least that
    many orders — the standard association-rule support floor that
    turns the near-complete raw graph into a sparse backbone."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps"))
    )
    # in-row pair expansion: one shuffle (the groupBy) + a narrow map,
    # instead of a second shuffle for a self-join on l_orderkey
    if colors > 1:
        # annotate each item with its color ONCE (md5 per item, not
        # per pair), then pair only within color classes — cross-color
        # pairs are never materialized
        color = (
            "pmod(cast(conv(substring(md5(cast(p as string)), 1, 15), "
            "16, 10) as bigint), " + str(colors) + ")"
        )
        baskets = baskets.select(
            F.expr(
                f"sort_array(transform(ps, p -> struct({color} AS c, "
                "p AS p)))"
            ).alias("ps")
        )
        pairs = F.expr(
            "flatten(transform(ps, (p, i) -> "
            "transform(filter(slice(ps, i + 2, size(ps) - i - 1), "
            "q -> q.c = p.c), q -> struct(p.p AS x, q.p AS y))))"
        )
    else:
        pairs = F.expr(
            "flatten(transform(ps, (p, i) -> "
            "transform(slice(ps, i + 2, size(ps) - i - 1), "
            "q -> struct(p AS x, q AS y))))"
        )
    flat = baskets.select(F.explode(pairs).alias("e")).select("e.x", "e.y")
    if min_support > 1:
        return (
            flat.groupBy("x", "y")
            .agg(F.count("*").alias("w"))
            .where(F.col("w") >= min_support)
            .select("x", "y")
        )
    return flat.distinct()


def _oriented(edges: DataFrame) -> DataFrame:
    """Degree-orient ``edges``: each undirected edge becomes one
    directed row ``(u, v, rv)`` pointing from the smaller
    ``(degree, id)`` rank to the larger; ``rv`` carries the head's
    packed rank so wedge endpoints can be ordered consistently with
    the orientation (plain id order would miss triangles whose closing
    edge runs against id order).

    The packed-rank int64 envelope (node < 2^32, degree < 2^31) rides
    as an EXECUTABLE guard inside the consumed ``d`` column — the
    ``text._guarded_long`` discipline: a projected-then-dropped
    assert_true is pruned by Catalyst, but this branch feeds every
    rank, so an out-of-envelope graph fails loudly instead of
    silently mis-orienting."""
    in_envelope = (F.col("n") >= 0) & (F.col("n") < _RANK_SHIFT)
    deg = (
        edges.select(F.col("x").alias("n"))
        .unionAll(edges.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .select(
            "n",
            F.when(
                in_envelope & (F.col("d") < _RANK_SHIFT // 2), F.col("d")
            )
            .otherwise(
                F.raise_error(F.lit("graph rank packing: int64 overflow"))
            )
            .alias("d"),
        )
    )
    dx = deg.select(
        F.col("n").alias("x"),
        (F.col("d") * _RANK_SHIFT + F.col("x")).alias("rx"),
    )
    dy = deg.select(
        F.col("n").alias("y"),
        (F.col("d") * _RANK_SHIFT + F.col("y")).alias("ry"),
    )
    e = edges.join(dx, "x").join(dy, "y")
    fwd = F.col("rx") < F.col("ry")
    return e.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(fwd, F.col("ry")).otherwise(F.col("rx")).alias("rv"),
    )


#: colors used by the gated query — wedge volume / 16, triangles kept
#: with probability 1/16, estimates scaled back by 16.
TRI_COLORS = 4


def triangle_count(
    spark: SparkSession, sf_dir: str, *, colors: int = 1
) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph ->
    ``(part, n_triangles)`` for every part in at least one triangle
    (exact for ``colors=1``; for ``colors>1`` the counts are over the
    color-sampled subgraph and ``n_est = colors^2 * n_triangles`` is
    the unbiased per-node estimate).

    Compact-forward triangle enumeration: wedge pairs emitted in-row
    from each tail's rank-sorted out-adjacency (endpoints ordered by
    packed rank, matching the orientation), closure probe on
    ``(v1, v2)``.  Each triangle is enumerated exactly once, then
    exploded to its three corners for the per-node count."""
    # the edge set feeds degrees (twice) + orientation, and the
    # oriented DAG feeds wedges + closure: cache both, or Spark
    # re-derives the pair explosion once per reference (5x/2x work)
    edges = scoped_cache(
        copurchase_edges(spark, sf_dir, colors=colors), fresh_scope=True
    )
    o = scoped_cache(_oriented(edges))
    # wedge generation in-row: one groupBy on the tail builds each
    # node's out-adjacency (rank-sorted, O(sqrt(m)) long by the
    # orientation bound), then a narrow map emits the C(outdeg, 2)
    # rank-ordered endpoint pairs — no self-join shuffle for wedges
    adj = o.groupBy("u").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("rv"), F.col("v")))
        ).alias("nb")
    )
    pairs = F.expr(
        "flatten(transform(nb, (p, i) -> "
        "transform(slice(nb, i + 2, size(nb) - i - 1), "
        "q -> struct(p.v AS v1, q.v AS v2))))"
    )
    wedges = adj.select(
        F.col("u"), F.explode(pairs).alias("w")
    ).select("u", "w.v1", "w.v2")
    closing = o.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("part")
    )
    out = corners.groupBy("part").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    if colors > 1:
        out = out.withColumn(
            "n_est",
            (F.col("n_triangles") * (colors * colors)).cast("long"),
        )
    return out


def triangle_count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gated formulation: colorful sampling at ``TRI_COLORS``."""
    return triangle_count(spark, sf_dir, colors=TRI_COLORS)


TRIANGLE_COUNT_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (SELECT DISTINCT a.pk AS x, b.pk AS y
      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
      WHERE {_color_sql('a.pk', TRI_COLORS)}
            = {_color_sql('b.pk', TRI_COLORS)}),
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
o AS (SELECT CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN e.x ELSE e.y END AS u,
             CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN e.y ELSE e.x END AS v,
             CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN dy.d * {_RANK_SHIFT} + e.y
                  ELSE dx.d * {_RANK_SHIFT} + e.x END AS rv
      FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
tris AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
         FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.rv < e2.rv
         JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
corners AS (SELECT u AS part FROM tris
            UNION ALL SELECT v1 FROM tris
            UNION ALL SELECT v2 FROM tris)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST(COUNT(*) * {TRI_COLORS * TRI_COLORS} AS BIGINT) AS n_est
FROM corners GROUP BY 1
"""


def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One damped PageRank iteration from the uniform start ->
    ``(part, rank1)`` in PR_SCALE fixed-point.

    rank0(u) = PR_SCALE for every node (unnormalized uniform start);
    each node sends ``(85 * (PR_SCALE div outdeg)) div 100`` along
    every incident edge (the graph is undirected, so each edge carries
    a contribution both ways) and every node keeps a
    ``15% * PR_SCALE`` teleport floor.  Integer ``div`` both times
    makes the per-edge contribution — and therefore the int64 SUM —
    bit-exact on both engines; relative ranking is unchanged and the
    quantization error is < outdeg ulps of 1e-9.

    This is the per-iteration kernel: power iteration is a driver loop
    re-running this one-shuffle step on the previous rank frame."""
    # consumed by the degree union (twice) and the contribution join —
    # cache, or the pair explosion runs three times
    edges = scoped_cache(copurchase_edges(spark, sf_dir), fresh_scope=True)
    deg = (
        edges.select(F.col("x").alias("n"))
        .unionAll(edges.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    share = f"({PR_DAMP_NUM} * ({PR_SCALE} div d)) div {PR_DAMP_DEN}"
    dx = deg.select(
        F.col("n").alias("x"), F.expr(share).alias("cx")
    )
    dy = deg.select(
        F.col("n").alias("y"), F.expr(share).alias("cy")
    )
    # each undirected edge carries a contribution both ways; emit both
    # rows from one edge row (the deg joins are node-sized — AQE
    # broadcasts them at any realistic node/edge ratio)
    contrib = (
        edges.join(dx, "x")
        .join(dy, "y")
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("y").alias("part"), F.col("cx").alias("c")),
                    F.struct(F.col("x").alias("part"), F.col("cy").alias("c")),
                )
            ).alias("e")
        )
        .select("e.part", "e.c")
    )
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    return contrib.groupBy("part").agg(
        (F.sum("c") + F.lit(teleport)).cast("long").alias("rank1")
    )


PAGERANK_STEP_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (SELECT DISTINCT a.pk AS x, b.pk AS y
      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
d AS (SELECT x AS src, y AS dst FROM e UNION ALL SELECT y, x FROM e),
od AS (SELECT src, COUNT(*) AS od FROM d GROUP BY 1),
contrib AS (SELECT d.dst AS part,
                   ({PR_DAMP_NUM} * ({PR_SCALE} // od.od)) // {PR_DAMP_DEN}
                     AS c
            FROM d JOIN od ON od.src = d.src)
SELECT part,
       CAST(SUM(c) + {(PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN}
            AS BIGINT) AS rank1
FROM contrib GROUP BY 1
"""

#: iterations run by the gated multi-step PageRank.
PR_ITERS = 3


def pagerank_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:data:`PR_ITERS` damped PageRank iterations from the uniform
    start -> ``(part, rank3)`` in PR_SCALE fixed-point — the gated
    version of the :func:`pagerank` power-iteration LOOP, not just the
    per-step kernel.

    Same integer contract as :func:`pagerank_step` applied
    iteratively: rank0(u) = PR_SCALE; each iteration every node sends
    ``(85 * (rank_t div outdeg)) div 100`` along each incident edge
    and keeps the 15% teleport floor.  Both ``div``s are exact int64,
    so the rank frame after any number of iterations is a pure
    function of the edge set — bit-identical on Spark and DuckDB
    regardless of partitioning or join order, which is what lets the
    distributed loop (not merely one step) be hash-gated against the
    chained-CTE twin :data:`PAGERANK_ITER3_SQL`.

    Scale shape: identical to :func:`pagerank` — edges and degrees
    cached once, each iteration is ONE shuffle (the contribution
    scatter keyed on destination); the superseded rank frame is
    unpersisted eagerly so state stays one iteration deep and the
    driver never sees the graph.  Every co-purchase node has degree
    >= 1, so no dangling-mass term exists on either engine."""
    edges = scoped_cache(copurchase_edges(spark, sf_dir), fresh_scope=True)
    deg = scoped_cache(
        edges.select(F.col("x").alias("n"))
        .unionAll(edges.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    ranks = scoped_cache(
        deg.select("n", "d", F.lit(PR_SCALE).cast("long").alias("rank"))
    )
    share = f"({PR_DAMP_NUM} * (rank div d)) div {PR_DAMP_DEN}"
    for _ in range(PR_ITERS):
        rx = ranks.select(F.col("n").alias("x"), F.expr(share).alias("cx"))
        ry = ranks.select(F.col("n").alias("y"), F.expr(share).alias("cy"))
        contrib = (
            edges.join(rx, "x")
            .join(ry, "y")
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("y").alias("n"), F.col("cx").alias("c")
                        ),
                        F.struct(
                            F.col("x").alias("n"), F.col("cy").alias("c")
                        ),
                    )
                ).alias("e")
            )
            .select("e.n", "e.c")
        )
        nxt = scoped_cache(
            contrib.groupBy("n")
            .agg((F.sum("c") + F.lit(teleport)).cast("long").alias("rank"))
            .join(deg, "n")
            .select("n", "d", "rank")
        )
        nxt.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = nxt
    return ranks.select(
        F.col("n").alias("part"), F.col("rank").alias("rank3")
    )


def _pr_iter_cte(prev: str, cur: str) -> str:
    """One chained-CTE PageRank iteration: rank frame ``prev`` ->
    ``cur``, the SQL twin of the loop body in :func:`pagerank_iter3`."""
    tele = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    return (
        f"{cur} AS (SELECT d.dst AS n,"
        f" CAST(SUM(({PR_DAMP_NUM} * (r.rank // od.od)) // {PR_DAMP_DEN})"
        f" + {tele} AS BIGINT) AS rank"
        f" FROM d JOIN od ON od.src = d.src"
        f" JOIN {prev} r ON r.n = d.src GROUP BY 1)"
    )


PAGERANK_ITER3_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (SELECT DISTINCT a.pk AS x, b.pk AS y
      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
d AS (SELECT x AS src, y AS dst FROM e UNION ALL SELECT y, x FROM e),
od AS (SELECT src, COUNT(*) AS od FROM d GROUP BY 1),
r0 AS (SELECT src AS n, CAST({PR_SCALE} AS BIGINT) AS rank FROM od),
{_pr_iter_cte('r0', 'r1')},
{_pr_iter_cte('r1', 'r2')},
{_pr_iter_cte('r2', 'r3')}
SELECT n AS part, rank AS rank3 FROM r3
"""


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    *,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Full PageRank power iteration -> ``(part, rank)`` (library
    tier: float ranks, NumPy-differential tested — the gated integer
    kernel is :func:`pagerank_step`).

    Driver loop over the one-shuffle scatter kernel: the edge set and
    per-node degrees are cached once; each iteration joins the
    current rank frame to the edges, scatters ``damping * rank / deg``
    both ways, and sums per destination.  The rank frame is
    re-persisted per iteration so lineage stays one fold deep (the
    ``bpe.learn`` loop pattern); the graph never visits the driver.
    Every node of the co-purchase graph has degree >= 1, so no
    dangling-mass term is needed."""
    edges = scoped_cache(copurchase_edges(spark, sf_dir), fresh_scope=True)
    deg = scoped_cache(
        edges.select(F.col("x").alias("n"))
        .unionAll(edges.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # iteration frames: superseded ones are unpersisted eagerly below;
    # the FINAL frame must stay cached for the caller, so it is also
    # registered in the cache scope and ages out two queries later
    # instead of leaking for the session
    ranks = scoped_cache(
        deg.select("n", "d", F.lit(1.0).alias("rank"))
    )
    for _ in range(iters):
        rx = ranks.select(
            F.col("n").alias("x"), (F.col("rank") / F.col("d")).alias("sx")
        )
        ry = ranks.select(
            F.col("n").alias("y"), (F.col("rank") / F.col("d")).alias("sy")
        )
        contrib = (
            edges.join(rx, "x")
            .join(ry, "y")
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("y").alias("n"), F.col("sx").alias("s")
                        ),
                        F.struct(
                            F.col("x").alias("n"), F.col("sy").alias("s")
                        ),
                    )
                ).alias("e")
            )
            .select("e.n", "e.s")
        )
        nxt = scoped_cache(
            contrib.groupBy("n")
            .agg(
                (F.lit(1.0 - damping) + damping * F.sum("s")).alias("rank")
            )
            .join(deg, "n")
            .select("n", "d", "rank")
        )
        nxt.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = nxt
    return ranks.select(F.col("n").alias("part"), "rank")


#: neighbors kept per part by the similarity query.
SIM_TOP_K = 5


def item_similarity(
    spark: SparkSession, sf_dir: str, *, k: int = SIM_TOP_K
) -> DataFrame:
    """Item-item Jaccard similarity over order baskets (the classic
    collaborative-filtering primitive) -> top-``k`` neighbors per part:
    ``(part, neighbor, co, sim, rank)`` with
    ``sim = |orders(x) ∩ orders(y)| / |orders(x) ∪ orders(y)|``.

    Scale shape: co-occurrence counts ride the same one-shuffle basket
    pair expansion as :func:`copurchase_edges` (fan-out bounded by
    basket size); part order-counts are a groupBy whose frame is
    node-sized, so AQE broadcasts the two degree joins; ranking is a
    per-part window (never global).  Determinism: ``co``/``union`` are
    exact integers and the one IEEE divide produces identical doubles
    on both engines, so ORDER BY (sim, neighbor) replays exactly."""
    # consumed by both the pair counts and the degree counts — cache,
    # or the basket groupBy runs twice
    baskets = scoped_cache(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps")),
        fresh_scope=True,
    )
    pairs = F.expr(
        "flatten(transform(ps, (p, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "q -> struct(p AS x, q AS y))))"
    )
    co = (
        baskets.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.x").alias("x"), F.col("e.y").alias("y"))
        .agg(F.count("*").cast("long").alias("co"))
    )
    deg = (
        baskets.select(F.explode("ps").alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    sym = co.join(dx, "x").join(dy, "y")
    both = sym.select(
        F.col("x").alias("part"), F.col("y").alias("neighbor"),
        "co", (F.col("dx") + F.col("dy") - F.col("co")).alias("un"),
    ).unionAll(
        sym.select(
            F.col("y").alias("part"), F.col("x").alias("neighbor"),
            "co", (F.col("dx") + F.col("dy") - F.col("co")).alias("un"),
        )
    )
    from pyspark.sql import Window as W

    sim = F.col("co").cast("double") / F.col("un").cast("double")
    w = W.partitionBy("part").orderBy(
        sim.desc(), F.col("neighbor").asc()
    )
    return (
        both.select(
            "part", "neighbor", "co",
            F.round(sim, 6).alias("sim"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


ITEM_SIMILARITY_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
co AS (SELECT a.pk AS x, b.pk AS y, CAST(COUNT(*) AS BIGINT) AS co
       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
deg AS (SELECT pk AS n, CAST(COUNT(*) AS BIGINT) AS d FROM it GROUP BY 1),
sym AS (SELECT co.x, co.y, co.co, dx.d AS dx, dy.d AS dy
        FROM co JOIN deg dx ON dx.n = co.x JOIN deg dy ON dy.n = co.y),
sides AS (
  SELECT x AS part, y AS neighbor, co, dx + dy - co AS un FROM sym
  UNION ALL
  SELECT y, x, co, dx + dy - co FROM sym
),
ranked AS (
  SELECT part, neighbor, co,
         CAST(co AS DOUBLE) / CAST(un AS DOUBLE) AS sim_raw,
         ROW_NUMBER() OVER (PARTITION BY part
            ORDER BY CAST(co AS DOUBLE) / CAST(un AS DOUBLE) DESC,
                     neighbor) AS rank
  FROM sides
)
SELECT part, neighbor, co, ROUND(sim_raw, 6) AS sim,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {SIM_TOP_K}
"""


#: support floor for the community query's edge backbone.
COMMUNITY_SUPPORT = 2


def part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the support-{COMMUNITY_SUPPORT}
    co-purchase backbone -> ``(part, component, n_parts)`` where
    ``component`` is the minimum part id of the component and
    ``n_parts`` its size (parts with no supported edge are singleton
    components of themselves).

    Reuses the skew-safe large-star/small-star contraction from the
    dedup tier (``dedup.connected_components_star`` — Kiveris et al.,
    O(log n) rounds, hubs shrink instead of broadcasting; the 100 TB
    CC algorithm).  The DuckDB twin is a recursive min-reachability
    CTE — an independent formulation, so the contraction itself is
    hash-gated."""
    from gemmsql.pipeline.dedup import connected_components_star

    edges = scoped_cache(
        copurchase_edges(spark, sf_dir, min_support=COMMUNITY_SUPPORT),
        fresh_scope=True,
    )
    bidir = edges.select(
        F.col("x").alias("src"), F.col("y").alias("dst")
    ).unionAll(edges.select(F.col("y").alias("src"), F.col("x").alias("dst")))
    nodes = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("doc_id"))
        .distinct()
    )
    labels = connected_components_star(bidir, nodes)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("n_parts")
    )
    return labels.join(sizes, "label").select(
        F.col("doc_id").alias("part"),
        F.col("label").alias("component"),
        "n_parts",
    )


PART_COMMUNITIES_SQL = f"""
WITH RECURSIVE it AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
e2 AS (
  SELECT a.pk AS x, b.pk AS y
  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING COUNT(*) >= {COMMUNITY_SUPPORT}
),
e AS (SELECT x AS src, y AS dst FROM e2 UNION ALL SELECT y, x FROM e2),
reach(n, m) AS (
  SELECT DISTINCT pk, pk FROM it
  UNION
  SELECT r.n, e.dst FROM reach r JOIN e ON e.src = r.m
),
lab AS (SELECT n AS part, MIN(m) AS component FROM reach GROUP BY 1),
sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_parts
       FROM lab GROUP BY 1)
SELECT lab.part, lab.component, sz.n_parts
FROM lab JOIN sz USING (component)
"""


# exact twin of TRIANGLE_COUNT_SQL: no color filter, no estimate column
TRIANGLE_COUNT_EXACT_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (SELECT DISTINCT a.pk AS x, b.pk AS y
      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (SELECT n, COUNT(*) AS d
        FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
o AS (SELECT CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN e.x ELSE e.y END AS u,
             CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN e.y ELSE e.x END AS v,
             CASE WHEN dx.d * {_RANK_SHIFT} + e.x < dy.d * {_RANK_SHIFT} + e.y
                  THEN dy.d * {_RANK_SHIFT} + e.y
                  ELSE dx.d * {_RANK_SHIFT} + e.x END AS rv
      FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
tris AS (SELECT e1.u, e1.v AS v1, e2.v AS v2
         FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.rv < e2.rv
         JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
corners AS (SELECT u AS part FROM tris
            UNION ALL SELECT v1 FROM tris
            UNION ALL SELECT v2 FROM tris)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY 1
"""


#: minimum pair support for emitted rules.
RULE_MIN_SUPPORT = 2
#: rules kept per antecedent.
RULE_TOP_K = 3


def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over order baskets ->
    ``(antecedent, consequent, support, confidence, lift, rank)``:
    the classic market-basket analysis (the pair level of Apriori —
    deeper itemsets recurse on exactly this kernel).

    support = co-purchase count, confidence = support / orders(A),
    lift = support * N / (orders(A) * orders(B)); both rule
    directions are emitted and the top-``RULE_TOP_K`` per antecedent
    kept by (confidence, lift, consequent) — a per-key window.  Scale
    shape is :func:`item_similarity`'s: one basket shuffle, node-sized
    degree joins (AQE-broadcast), no pair ever materialized below the
    support floor's groupBy."""
    baskets = scoped_cache(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps")),
        fresh_scope=True,
    )
    n_orders = baskets.count()  # one long from an already-cached frame
    pairs = F.expr(
        "flatten(transform(ps, (p, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "q -> struct(p AS x, q AS y))))"
    )
    co = (
        baskets.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.x").alias("x"), F.col("e.y").alias("y"))
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= RULE_MIN_SUPPORT)
    )
    deg = (
        baskets.select(F.explode("ps").alias("n"))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    sym = co.join(dx, "x").join(dy, "y")
    both = sym.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"),
        "support", F.col("dx").alias("da"), F.col("dy").alias("db"),
    ).unionAll(
        sym.select(
            F.col("y").alias("antecedent"), F.col("x").alias("consequent"),
            "support", F.col("dy").alias("da"), F.col("dx").alias("db"),
        )
    )
    from pyspark.sql import Window as W

    conf = F.col("support").cast("double") / F.col("da").cast("double")
    lift = (
        F.col("support").cast("double") * F.lit(float(n_orders))
        / (F.col("da").cast("double") * F.col("db").cast("double"))
    )
    w = W.partitionBy("antecedent").orderBy(
        conf.desc(), lift.desc(), F.col("consequent").asc()
    )
    return (
        both.select(
            "antecedent", "consequent", "support",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= RULE_TOP_K)
    )


BASKET_RULES_SQL = f"""
WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS DOUBLE) AS n_orders FROM it),
co AS (SELECT a.pk AS x, b.pk AS y, CAST(COUNT(*) AS BIGINT) AS support
       FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
       GROUP BY 1, 2 HAVING COUNT(*) >= {RULE_MIN_SUPPORT}),
deg AS (SELECT pk AS m, CAST(COUNT(*) AS BIGINT) AS d FROM it GROUP BY 1),
sym AS (SELECT co.x, co.y, co.support, dx.d AS dx, dy.d AS dy
        FROM co JOIN deg dx ON dx.m = co.x JOIN deg dy ON dy.m = co.y),
sides AS (
  SELECT x AS antecedent, y AS consequent, support, dx AS da, dy AS db
  FROM sym
  UNION ALL
  SELECT y, x, support, dy, dx FROM sym
),
ranked AS (
  SELECT antecedent, consequent, support,
         CAST(support AS DOUBLE) / CAST(da AS DOUBLE) AS conf_raw,
         CAST(support AS DOUBLE) * (SELECT n_orders FROM n)
           / (CAST(da AS DOUBLE) * CAST(db AS DOUBLE)) AS lift_raw,
         ROW_NUMBER() OVER (PARTITION BY antecedent ORDER BY
           CAST(support AS DOUBLE) / CAST(da AS DOUBLE) DESC,
           CAST(support AS DOUBLE) * (SELECT n_orders FROM n)
             / (CAST(da AS DOUBLE) * CAST(db AS DOUBLE)) DESC,
           consequent) AS rank
  FROM sides
)
SELECT antecedent, consequent, support,
       ROUND(conf_raw, 6) AS confidence, ROUND(lift_raw, 6) AS lift,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {RULE_TOP_K}
"""
