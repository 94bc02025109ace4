"""gemmsql.stats: parquet-footer statistics (no Spark session needed)."""

from __future__ import annotations

import duckdb

from gemmsql import stats
from tests.conftest import SF_SMOKE


def test_embeddings_stats_match_data():
    n, dim = stats.embeddings_stats(SF_SMOKE)
    con = duckdb.connect()
    want_n, want_dim = con.execute(
        f"SELECT COUNT(*), MAX(len(embedding)) FROM "
        f"'{SF_SMOKE}/embeddings.parquet'"
    ).fetchone()
    con.close()
    assert (n, dim) == (want_n, want_dim)


def test_table_rows_cached_and_correct():
    stats.clear()
    n1 = stats.table_rows(SF_SMOKE, "events")
    assert ("%s" % SF_SMOKE, "events") in [
        (k[0], k[1]) for k in stats._CACHE
    ]
    n2 = stats.table_rows(SF_SMOKE, "events")  # cache hit
    con = duckdb.connect()
    want = con.execute(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    con.close()
    assert n1 == n2 == want
