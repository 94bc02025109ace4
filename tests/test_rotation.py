"""Oracle checks for the queries rotated OUT of the 50-entry driver
registry this round (see ``__spark_entry__.queries`` docstring).

The driver gate only sees the first 50 registered queries; these five
multiply-proven relational/event variants sit out the round-3 rotation
but must stay correct — the same Spark-vs-DuckDB hash comparison the
driver runs, executed here in pytest so the hard signal never lapses.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    # mirrors tools/driver_check.norm_cell
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0
        return repr(round(v, 6))
    return repr(v)


def _hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode() + b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _rotated():
    from gemmsql.pipeline import events, relational

    return [
        ("quiet_customers", relational.quiet_customers,
         relational.QUIET_CUSTOMERS_SQL),
        ("returning_customers", relational.returning_customers,
         relational.RETURNING_CUSTOMERS_SQL),
        ("order_priority_pivot", relational.order_priority_pivot,
         relational.ORDER_PRIORITY_PIVOT_SQL),
        ("props_stats", events.props_stats, events.PROPS_STATS_SQL),
        ("user_value_movavg", events.user_value_movavg,
         events.USER_VALUE_MOVAVG_SQL),
    ]


def _library_tier():
    """Ops that live outside the 50-entry registry by design but have
    full SQL twins — same hash parity, enforced here."""
    from gemmsql.pipeline import similarity, text

    return [
        ("vocab_build", text.vocab_build, text.VOCAB_BUILD_SQL),
        ("bigram_pmi", text.bigram_pmi, text.BIGRAM_PMI_SQL),
        ("semantic_dups", similarity.semantic_dups,
         similarity.SEMANTIC_DUPS_SQL),
        ("cell_profile", similarity.cell_profile,
         similarity.CELL_PROFILE_SQL),
    ]


@pytest.mark.parametrize(
    "name,fn,sql",
    _rotated() + _library_tier(),
    ids=[r[0] for r in _rotated() + _library_tier()],
)
def test_rotated_query_matches_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_SMOKE).toPandas()
    odf = duck.execute(sql).df()
    assert len(sdf) == len(odf), name
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert _hash(sdf) == _hash(odf), f"{name}: value hash mismatch"
