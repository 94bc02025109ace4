"""DSIR importance-resampling weights: semantic invariants.

Hash parity with the DuckDB twin is driver-gated (``dsir_weights`` is
in the 50-entry registry); these tests pin the *statistical* contract:
the target domain's own documents must score higher under the
target/raw likelihood ratio than the rest of the corpus, and the
weights must be finite and feature-count-consistent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_target_domain_scores_higher(spark):
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline import dsir

    w = dsir.dsir_weights(spark, SF_SMOKE)
    src = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    by_domain = (
        w.join(src, "doc_id")
        .withColumn(
            "is_target", (F.col("source") == dsir.TARGET_SOURCE).cast("int")
        )
        .groupBy("is_target")
        .agg(F.avg(F.col("logw") / F.col("n_feats")).alias("mean_per_feat"))
        .collect()
    )
    means = {r["is_target"]: r["mean_per_feat"] for r in by_domain}
    assert means[1] > means[0], (
        "target-domain docs must have higher per-feature log weight"
    )


def test_weights_cover_every_document_once(spark):
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline import dsir

    w = dsir.dsir_weights(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    agg = w.agg(
        F.count("*").alias("n"),
        F.count_distinct("doc_id").alias("nd"),
        F.sum(F.col("logw").isNull().cast("int")).alias("nulls"),
    ).first()
    assert agg["n"] == agg["nd"] == n_docs
    assert agg["nulls"] == 0


def test_n_feats_is_unigrams_plus_bigrams(spark):
    """n_feats per doc == n_tokens + (n_tokens - 1) for multi-token
    docs — the unigram+bigram feature construction."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline import dsir

    w = dsir.dsir_weights(spark, SF_SMOKE)
    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("nt"))
    )
    bad = (
        w.join(toks, "doc_id")
        .where(F.col("n_feats") != 2 * F.col("nt") - 1)
        .count()
    )
    assert bad == 0
