"""BM25 lexical retrieval: ranking invariants and plan shape.

Hash parity with the DuckDB twin is driver-gated (``bm25_topk`` is in
the 50-entry registry); these tests pin the ranking contract and the
scale shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bm25_ranks_are_dense_and_scores_monotone(spark):
    from gemmsql.pipeline.retrieval import K, QUERIES, bm25_topk

    pdf = bm25_topk(spark, SF_SMOKE).toPandas()
    assert set(pdf["query_id"]) == {qid for qid, _ in QUERIES}
    for qid, grp in pdf.groupby("query_id"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= K
        # scores non-increasing down the ranking
        assert (g["score"].diff().dropna() <= 1e-12).all()
        assert (g["score"] > 0).all()


def test_bm25_favors_matching_documents(spark):
    """A doc containing every query term at high tf must outrank a doc
    containing none (which cannot appear at all)."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline.retrieval import bm25_topk

    pdf = bm25_topk(spark, SF_SMOKE).toPandas()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    top = pdf[(pdf["query_id"] == 1) & (pdf["rank"] == 1)].iloc[0]
    text = docs[top["doc_id"]]
    assert "table" in text.split() or "scan" in text.split()


def test_bm25_plan_broadcasts_and_partitions_window(spark):
    from gemmsql.pipeline.retrieval import bm25_topk
    from tests.conftest import SF_CORRECT

    # cold cache scope (the other tests in this file warm SF_SMOKE;
    # a warm InMemoryTableScan plan duplicates scan text and breaks
    # the live-scan arithmetic)
    p = (
        bm25_topk(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p, "df/totals/panel joins must broadcast"
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "windowspecdefinition(query_id" in p, (
        "top-k window must partition by query_id, never global"
    )
    # live corpus scans: tf materialization + totals (the cached tf
    # table repeats its defining scan per InMemoryRelation occurrence)
    live = p.count("FileScan parquet") - p.count("InMemoryRelation")
    assert live <= 2, f"{live} live corpus scans; expected tf + totals"
