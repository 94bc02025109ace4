"""Spark-vs-DuckDB hash parity for EVERY active gate query.

Round-6 hardening (VERDICT r5 next #3): ``mixture_temperature`` reached
the driver with an engine/oracle constant drift because it was the only
gated query whose DuckDB parity lived *only* in the driver.  This test
runs the driver's own comparison — row count, column set, value hash —
over the full ``__spark_entry__.queries()`` registry at the smoke tier
(sf0.001), so a gate entrant cannot merge without in-repo parity and an
oracle drift is caught the same session it is introduced.

The rotation tier (``tests/test_rotation.py``) gives retired queries the
identical check; together the two files cover every oracle in the repo.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.test_rotation import TABLES, _hash  # same comparator as driver

# the parquet-footer oracle embeds the staged path for the sf tier it
# runs at (the driver pins sf0.01; this harness runs the smoke tier)
os.environ["GEMMSQL_ORACLE_SF_DIR"] = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()

# Streaming gates replay through availableNow micro-batches — their
# parity (plus restart recovery and watermark finalization) is pinned in
# tests/test_streaming.py against the same batch oracles, so rerunning
# the full stream stack here would only duplicate minutes of replay.
_BATCH = [n for n in _QUERIES if not n.startswith("streaming_")]


def test_registry_split_is_total():
    assert set(_BATCH) | {n for n in _QUERIES if n.startswith("streaming_")} \
        == set(_QUERIES)


@pytest.mark.parametrize("name", _BATCH, ids=_BATCH)
def test_gate_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(_ORACLES[name]).df()
    assert len(sdf) == len(odf), (
        f"{name}: rows {len(sdf)} (spark) vs {len(odf)} (oracle)"
    )
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert _hash(sdf) == _hash(odf), f"{name}: value hash mismatch"
