"""Gumbel-max categorical sampling over factored logits
(reference sampling.py).

``c[m] ~ Categorical(softmax(pred_m . trg^T))`` via per-tile Gumbel-max
(sampling.py:14) with a hierarchical Bernoulli merge between partial
winners (sampling.py:21-30) — a streaming weighted-sampling scheme.
Returns ``(prob of chosen, chosen global index)`` (sampling.py:59-61).

Spark formulation: adding ONE Gumbel noise per (row, class) and taking
the global argmax is *exactly* equivalent to the reference's
hierarchical merge (Gumbel-max is associative under max), so the monoid
merge is plain ``max_by``.  Noise comes from numpy's counter-based
Philox generator seeded per (seed, left-block, right-block), which makes
the whole operator deterministic for a fixed seed and block size — but
the output is still a *sample*, so the driver check is rows-only, same
weak treatment the reference gives it (its __main__ only smoke-prints,
sampling.py:67-75).  Output: ``(i, prob, choice)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemmsql.numerics import collected_lse
from gemmsql.ops._blocked import blocked_partials


def _sample_kernel(seed: int):
    def kernel(lids, lmat, _extra, rids, rmat) -> pd.DataFrame:
        s = lmat @ rmat.T
        # counter-based RNG: same (seed, tile) -> same noise, any order
        lb = int(lids.min()); rb = int(rids.min())
        rng = np.random.Generator(
            np.random.Philox(key=[seed, lb * 1_000_003 + rb])
        )
        g = -np.log(-np.log(rng.random(s.shape)))
        pert = s + g
        amax = pert.argmax(axis=1)
        rows = np.arange(s.shape[0])
        return pd.DataFrame(
            {
                "i": lids,
                "z": pert[rows, amax],          # perturbed winner score
                "sc": s[rows, amax],            # raw score of winner
                "c": rids[amax],                # global class id of winner
                "tz": np.logaddexp.reduce(s, axis=1),  # tile mass
            }
        )

    return kernel


def sample_categorical(
    pred_vec: DataFrame,
    trg_vec: DataFrame,
    *,
    seed: int = 42,
    block: int = 4096,
) -> DataFrame:
    partials = blocked_partials(
        pred_vec, trg_vec, _sample_kernel(seed),
        "i long, z double, sc double, c long, tz double",
        left_block=block, right_block=block,
    )
    # global winner = argmax over perturbed scores (associative max_by);
    # total mass = logsumexp of tile masses (reference sampling.py:30);
    # both fold in ONE aggregation — max_by merges map-side, and the
    # collected tz list folds in-row (see numerics.collected_lse)
    g = partials.groupBy("i").agg(
        F.max_by(F.struct("sc", "c"), "z").alias("w"),
        F.collect_list(F.struct("tz")).alias("ps"),
    ).withColumn("tzt", collected_lse(F.col("ps"), "tz"))
    return g.select(
        "i",
        F.exp(F.col("w.sc") - F.col("tzt")).alias("prob"),
        F.col("w.c").alias("choice"),
    )
