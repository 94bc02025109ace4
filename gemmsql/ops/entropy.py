"""Shannon entropy of ``softmax(pred @ trg^T)`` rows (reference entropy.py).

``H[m] = z_m - sum_n softmax(s)_mn * s_mn`` where ``z = logsumexp``
(oracle: -sum p log p, entropy.py:56-58).

Monoid (entropy.py:18-23): ``(p, n)`` with p merged by logaddexp and n —
an *unnormalized softmax-weighted score sum* ``sum(exp(s - p_b) * s)`` —
merged by the weighted-average rule ``n = n_a e^{p_a - p} + n_b e^{p_b - p}``.
That merge is order-independent, so in SQL it collapses to one global
two-pass aggregate.  Backward is NOT implemented in the reference
(entropy.py:14-16) and intentionally not here either.  Output ``(i, entropy)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemmsql.numerics import collected_lse, group_logsumexp
from gemmsql.ops._blocked import blocked_partials
from gemmsql.ops.attention import attention_scores


def row_entropy_coo(pred_coo: DataFrame, trg_coo: DataFrame) -> DataFrame:
    s = attention_scores(pred_coo, trg_coo)
    z = group_logsumexp(s, ["qi"], "s", "z")
    return (
        s.join(z, "qi")
        .groupBy(F.col("qi").alias("i"))
        .agg(
            (
                F.max("z")
                - F.sum(F.exp(F.col("s") - F.col("z")) * F.col("s"))
            ).alias("entropy")
        )
    )


def _entropy_kernel(lids, lmat, _extra, rids, rmat) -> pd.DataFrame:
    s = lmat @ rmat.T
    p = np.logaddexp.reduce(s, axis=1)
    n = (np.exp(s - p[:, None]) * s).sum(axis=1)  # reference entropy.py:11
    return pd.DataFrame({"i": lids, "p": p, "n": n})


def row_entropy(
    pred_vec: DataFrame,
    trg_vec: DataFrame,
    *,
    block: int = 4096,
    broadcast_trg: bool | str = "auto",
) -> DataFrame:
    """Blocked path -> ``(i, entropy)``.  Small trg sides broadcast
    (narrow map, replication 1) exactly like attention's KV rule."""
    from gemmsql.ops._blocked import broadcast_right_partials
    from gemmsql.ops.attention import BROADCAST_KV_MAX_ROWS

    schema = "i long, p double, n double"
    if broadcast_trg == "auto":
        from gemmsql.stats import rows_for_choice

        broadcast_trg = rows_for_choice(trg_vec) <= BROADCAST_KV_MAX_ROWS
    if broadcast_trg:
        partials = broadcast_right_partials(
            pred_vec, trg_vec, _entropy_kernel, schema
        )
    else:
        partials = blocked_partials(
            pred_vec, trg_vec, _entropy_kernel, schema,
            left_block=block, right_block=block,
        )
    # fused one-shuffle merge (see attention_blocked): z and the
    # softmax-weighted score mean fold in-row over the partial list
    g = partials.groupBy("i").agg(
        F.collect_list(F.struct("p", "n")).alias("ps")
    ).withColumn("z", collected_lse(F.col("ps"), "p"))
    wsum = F.aggregate(
        F.col("ps"),
        F.lit(0.0),
        lambda acc, p: acc + p["n"] * F.exp(p["p"] - F.col("z")),
    )
    return g.select("i", (F.col("z") - wsum).alias("entropy"))
