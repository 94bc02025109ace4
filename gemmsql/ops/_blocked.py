"""Blocked (tiled) execution of pairwise score operators.

The reference's ``chunker`` enumerates the cross product of row tiles
(reference attention.py:46-57: 256-row query tiles x 256-row key tiles;
runtime-tunable in C++, gemm_map_reduce_attention.cpp:82-83).  The Spark
equivalent is a join of block tables on block ids: each (left-block,
right-block) pair becomes one ``applyInPandas`` group whose NumPy kernel
plays ``proj_fold``; the per-pair partial accumulators are then merged
per output row by an associative SQL aggregate (``binary_reduce``).

Shuffle accounting (the thing that matters at 100 TB): left rows are
replicated once per right block and vice versa — the textbook blocked
matmul communication bound O(|L| * nrb + |R| * nlb).  Choosing block
sizes ~sqrt(memory) minimizes it; when the right side fits in executor
memory, :func:`broadcast_right_partials` degenerates to replication
factor 1 (a narrow map, no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kernel(left_ids, left_mat, left_extra, right_ids, right_mat) -> pdf
Kernel = Callable[[np.ndarray, np.ndarray, pd.DataFrame, np.ndarray, np.ndarray], pd.DataFrame]


def _to_mat(series) -> np.ndarray:
    return np.asarray(series.tolist(), dtype=np.float64)


def blocked_partials(
    left: DataFrame,
    right: DataFrame,
    kernel: Kernel,
    partial_schema: str,
    *,
    left_block: int = 4096,
    right_block: int = 4096,
    left_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Run ``kernel`` on every (left-block, right-block) tile pair.

    ``left``/``right`` are vector-row DataFrames ``(i, vec[, extras])``.
    Returns the union of per-pair partial accumulator rows (one or more
    rows per left row id per right block), ready for a monoid merge.
    """
    lb = left.withColumn("_lb", F.floor(F.col("i") / left_block).cast("int"))
    rb = right.withColumn("_rb", F.floor(F.col("i") / right_block).cast("int"))

    lids = lb.select("_lb").distinct()
    rids = rb.select("_rb").distinct()

    extra = list(left_extra)
    l_rep = lb.crossJoin(F.broadcast(rids)).select(
        "_lb", "_rb", F.lit(0).alias("_side"), "i", "vec",
        *[F.col(c) for c in extra],
    )
    r_rep = rb.crossJoin(F.broadcast(lids)).select(
        "_lb", "_rb", F.lit(1).alias("_side"), "i", "vec",
        *[F.lit(None).cast(lb.schema[c].dataType).alias(c) for c in extra],
    )
    both = l_rep.unionByName(r_rep)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["_side"] == 0]
        rp = pdf[pdf["_side"] == 1]
        if len(lp) == 0 or len(rp) == 0:
            # empty tile: monoid identity contribution -> no rows
            return pd.DataFrame(columns=[f.split()[0] for f in partial_schema.split(",")])
        return kernel(
            lp["i"].to_numpy(),
            _to_mat(lp["vec"]),
            lp[extra].reset_index(drop=True),
            rp["i"].to_numpy(),
            _to_mat(rp["vec"]),
        )

    return both.groupBy("_lb", "_rb").applyInPandas(
        lambda _key, pdf: run(pdf), partial_schema
    )


def broadcast_right_partials(
    left: DataFrame,
    right: DataFrame,
    kernel: Kernel,
    partial_schema: str,
    *,
    left_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Same contract as :func:`blocked_partials` but with the whole right
    side broadcast — replication factor 1, no shuffle (use when the right
    side fits in memory; e.g. a class-embedding table)."""
    spark = left.sparkSession
    rp = right.select("i", "vec").toPandas()
    b = spark.sparkContext.broadcast((rp["i"].to_numpy(), _to_mat(rp["vec"])))
    extra = list(left_extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rids, rmat = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield kernel(
                pdf["i"].to_numpy(), _to_mat(pdf["vec"]),
                pdf[extra].reset_index(drop=True), rids, rmat,
            )

    from gemmsql.ops.gate import _spread

    # byte-light/compute-heavy spread (r18): the broadcast path only
    # runs for bounded tables whose scan is ONE partition — without
    # the fan-out the kernel serializes on a single core
    return _spread(left.select("i", "vec", *extra)).mapInPandas(
        run, partial_schema
    )
