"""``make_monoid_op`` — the Spark analog of ``mk_GeMMMapReduce``.

The reference's one novel API (reference core.py:15-64) builds an operator
from five user functions; the forward pass is a tile loop of
``a = binary_reduce(a, proj_fold(x_tile))`` (core.py:25-35).  Spark's
partial+final aggregation executes exactly that contract in parallel:
``zero`` is the monoid identity (``init``), ``lift`` maps one partition's
rows to a monoid value (``proj_fold``), ``merge`` is the associative
combine (``binary_reduce``), ``finish`` projects the accumulator to the
output (the ``.apply(...)[k]`` selection, e.g. attention.py:69-70).

Two execution strategies, same semantics:

- :func:`aggregate_pandas` — Arrow-batched: ``applyInPandas`` computes
  per-(key, tile) partials, then a second grouped merge folds partials
  per key.  This is the PRODUCTION path for dense block math (NumPy
  kernels, vectorized transfer) and what every registered query uses.
- :func:`aggregate_by_key` — ``RDD.aggregateByKey(zero, seq, comb)``:
  the exact structural twin of the reference loop, kept as the
  COMPATIBILITY path only.  It folds row-at-a-time through Python
  lambdas (~10-100x slower than the Arrow path) — use it to port a
  reference operator verbatim or to cross-check semantics, never in a
  hot path.  ``make_monoid_op`` defaults to the pandas strategy when
  given a pandas merge function.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def make_monoid_op(
    *,
    zero: Callable[[], Any],
    lift: Callable[[Row, Any], Any],
    merge: Callable[[Any, Any], Any],
    finish: Callable[[Any], dict] | None = None,
    schema: str | None = None,
    pandas_partials: Callable[..., DataFrame] | None = None,
    pandas_merge=None,
    pandas_merge_schema: str | None = None,
):
    """Return ``op(df, keys) -> DataFrame`` running the monoid fold per key.

    ``lift(row, acc) -> acc`` folds one row into an accumulator (the
    reference fuses projection and fold the same way, README.md:36-37);
    ``merge`` combines two accumulators and must be associative +
    commutative (reference requirement for ``binary_reduce``).

    Strategy default: when an Arrow formulation is supplied
    (``pandas_partials`` producing per-(key, tile) partials +
    ``pandas_merge``/``pandas_merge_schema`` folding them), the operator
    runs on the vectorized pandas path; the row-at-a-time
    ``aggregate_by_key`` twin is the fallback for quick ports only.
    """

    def op(df: DataFrame, keys: Sequence[str]) -> DataFrame:
        if pandas_partials is not None:
            partials = pandas_partials(df, keys)
            return aggregate_pandas(
                partials, keys, pandas_merge, pandas_merge_schema
            )
        return aggregate_by_key(
            df, keys, zero=zero, lift=lift, merge=merge, finish=finish,
            schema=schema,
        )

    return op


def aggregate_by_key(
    df: DataFrame,
    keys: Sequence[str],
    *,
    zero: Callable[[], Any],
    lift: Callable[[Row, Any], Any],
    merge: Callable[[Any, Any], Any],
    finish: Callable[[Any], dict] | None = None,
    schema: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Monoid fold via ``RDD.aggregateByKey`` (map-side partials, then
    shuffle of accumulators only — never the raw rows).

    COMPATIBILITY PATH: row-at-a-time Python lambdas, ~10-100x slower
    than the Arrow/pandas strategy.  No registered query uses it; it
    exists as the structural twin of the reference API for verbatim
    ports and semantic cross-checks (tests/test_monoid.py)."""
    keys = list(keys)
    spark = df.sparkSession
    other = [c for c in df.columns if c not in keys]

    def to_kv(row):
        return tuple(row[k] for k in keys), row

    def seq(acc, row):
        return lift(row, acc)

    rdd = df.rdd.map(to_kv)
    agg = rdd.aggregateByKey(
        zero(), seq, merge, numPartitions=num_partitions
    )

    fin = finish or (lambda a: {"acc": a})

    def to_row(kv):
        k, acc = kv
        d = dict(zip(keys, k))
        d.update(fin(acc))
        return d

    out = agg.map(to_row)
    if schema is not None:
        return spark.createDataFrame(out, schema=schema)
    return spark.createDataFrame(out)


def aggregate_pandas(
    grouped_partials: DataFrame,
    keys: Sequence[str],
    merge_fn,
    merge_schema: str,
) -> DataFrame:
    """Final merge of per-tile partial accumulators: group the partial
    table by ``keys`` and fold each group with ``merge_fn`` (a pandas
    DataFrame -> pandas DataFrame of one row).  Stage 1 (the ``proj_fold``
    producing ``grouped_partials``) is operator-specific."""
    return grouped_partials.groupBy(*keys).applyInPandas(merge_fn, merge_schema)
