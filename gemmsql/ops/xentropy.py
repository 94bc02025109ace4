"""Cross-entropy over factored logits (reference xentropy.py).

``loss[m] = logsumexp_n(pred_m . trg_n) - pred_m . trg_true[m]``
== ``cross_entropy(pred @ trg^T, true)`` (oracle, xentropy.py:79-80).

Monoid (xentropy.py:39-44): accumulator ``(p, n)`` with
``p`` merged by logaddexp and ``n`` (the true-class score, picked when
the true class falls inside a tile, xentropy.py:12) merged by plain sum.

The blocked path emits per-tile partials ``(i, p_b, n_b)`` and merges
them with the two built-in-style SQL aggregates; the relational path
does the same with a score join.  Output: ``(i, loss)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemmsql.numerics import collected_lse, group_logsumexp
from gemmsql.ops._blocked import blocked_partials
from gemmsql.ops.attention import attention_scores


def xentropy_coo(
    pred_coo: DataFrame, trg_coo: DataFrame, labels: DataFrame
) -> DataFrame:
    """Relational path.  ``labels``: ``(i, label)`` with label = trg row id."""
    s = attention_scores(pred_coo, trg_coo)  # (qi, ki, s)
    z = group_logsumexp(s, ["qi"], "s", "z")
    tru = (
        s.join(
            labels.select(F.col("i").alias("qi"), "label"),
            ["qi"],
        )
        .where(F.col("ki") == F.col("label"))
        .groupBy("qi")
        .agg(F.sum("s").alias("n"))
    )
    return (
        z.join(tru, "qi")
        .select(F.col("qi").alias("i"), (F.col("z") - F.col("n")).alias("loss"))
    )


def _xent_kernel(lids, lmat, extra, rids, rmat) -> pd.DataFrame:
    s = lmat @ rmat.T
    p = np.logaddexp.reduce(s, axis=1)  # per-tile logsumexp partial
    # one-hot pick: score of the true class if it lives in this tile
    # (reference xentropy.py:12: true[:,None] == tixs[None,:])
    match = extra["label"].to_numpy()[:, None] == rids[None, :]
    n = (s * match).sum(axis=1)
    return pd.DataFrame({"i": lids, "p": p, "n": n})


def xentropy(
    pred_vec: DataFrame,
    trg_vec: DataFrame,
    *,
    block: int = 4096,
    broadcast_trg: bool | str = "auto",
) -> DataFrame:
    """Blocked path.  ``pred_vec``: ``(i, vec, label)`` where label is the
    true class id == a ``trg_vec`` row id (reference xentropy.py:75-77
    uses tixs = arange(N)).  Small class-embedding tables broadcast —
    the common real case (vocab embeddings fit in memory even when the
    prediction side is enormous)."""
    from gemmsql.ops._blocked import broadcast_right_partials
    from gemmsql.ops.attention import BROADCAST_KV_MAX_ROWS

    schema = "i long, p double, n double"
    if broadcast_trg == "auto":
        from gemmsql.stats import rows_for_choice

        broadcast_trg = rows_for_choice(trg_vec) <= BROADCAST_KV_MAX_ROWS
    if broadcast_trg:
        partials = broadcast_right_partials(
            pred_vec, trg_vec, _xent_kernel, schema, left_extra=("label",)
        )
    else:
        partials = blocked_partials(
            pred_vec, trg_vec, _xent_kernel, schema,
            left_block=block, right_block=block, left_extra=("label",),
        )
    # fused one-shuffle merge: logsumexp + true-class sum fold in-row
    g = partials.groupBy("i").agg(
        F.collect_list(F.struct("p", "n")).alias("ps"),
        F.sum("n").alias("n"),
    ).withColumn("z", collected_lse(F.col("ps"), "p"))
    return g.select("i", (F.col("z") - F.col("n")).alias("loss"))
