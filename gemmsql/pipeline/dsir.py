"""Data Selection with Importance Resampling (DSIR) over ``documents``
— Xie et al. 2023 (arXiv:2302.03169): score every raw document by how
much more likely its hashed n-gram features are under a TARGET domain
distribution than under the RAW corpus distribution, then resample by
the importance weight.  This is the standard "make CommonCrawl look
like Wikipedia" selection step of an LLM pretraining pipeline.

Feature model (the paper's): unigrams + bigrams of the whitespace
tokenization, hashed into ``N_BUCKETS`` buckets; bucket distributions
are add-one-smoothed multinomials; a document's log importance weight
is the sum over its feature occurrences of
``ln p_target(bucket) - ln p_raw(bucket)``.

Oracle-exactness: the bucket hash is the repo's standard md5 gate
(first 15 hex digits mod ``N_BUCKETS`` — replayed verbatim in DuckDB),
each ``ln`` is quantized to the 1e-9 integer grid (the ``bigram_pmi``
discipline), and per-document sums are exact int64 — full hash parity.

Scale shape (100 TB): exactly TWO corpus passes.  Pass 1 explodes the
in-row feature stream into ONE hash aggregation producing both the raw
and the target bucket counts (the target subset is a conditional sum on
the same scan, not a second input); corpus totals reduce the
``N_BUCKETS``-row count table, not the corpus.  Pass 2 re-explodes the
features and joins the BROADCAST count table (no corpus-side shuffle
for the lookup) into the final doc_id aggregation, co-keyed with the
source read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.caching import scoped_cache
from gemmsql.datamodel import load_table

N_BUCKETS = 4096
TARGET_SOURCE = "src0"


def _qln(col):
    """ln quantized to the 1e-9 integer grid (bigram_pmi discipline)."""
    return F.floor(F.log(col.cast("double")) * 1e9 + 0.5).cast("long")


def _doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket) — one row per unigram/bigram occurrence,
    bucketed by the md5 gate.

    In-row construction via ONE concatenated array per document (the
    unigrams followed by the joined bigrams), so each consumer of the
    feature stream costs a single corpus scan — a union of two explodes
    would double every scan."""
    w = docs.select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    all_feats = F.concat(
        F.col("w"),
        F.when(
            F.size("w") >= 2,
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> concat(w[i], ' ', w[i + 1]))"
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)")),
    )
    feats = w.select(
        "doc_id", "source", F.explode(all_feats).alias("feat")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("feat"), 1, 15), 16, 10).cast("long"),
        F.lit(N_BUCKETS),
    )
    return feats.select("doc_id", "source", bucket.alias("bucket"))


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weights ->
    ``(doc_id, n_feats, logw)`` with ``logw`` the add-one-smoothed
    target/raw log-likelihood ratio (target domain =
    ``source = 'src0'``), rounded to 6 digits.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = _doc_features(docs)

    # ONE corpus-scale counting pass: raw and target bucket counts come
    # out of the same hash aggregation; the corpus totals then reduce
    # the <=N_BUCKETS-row count table, not the corpus.  The count table
    # is scope-cached so the broadcast lookup and the totals reduction
    # share one materialization instead of re-scanning the corpus.
    counts = scoped_cache(
        feats.groupBy("bucket").agg(
            F.count("*").cast("long").alias("c_r"),
            F.sum(
                (F.col("source") == TARGET_SOURCE).cast("long")
            ).cast("long").alias("c_t"),
        ),
        fresh_scope=True,
    )
    totals = counts.agg(
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum("c_t").cast("long").alias("n_t"),
    ).withColumn("k", F.lit(1))

    term = (
        _qln(F.col("c_t") + F.lit(1))
        - _qln(F.col("n_t") + F.lit(N_BUCKETS))
        - _qln(F.col("c_r") + F.lit(1))
        + _qln(F.col("n_r") + F.lit(N_BUCKETS))
    )
    scored = (
        feats.join(F.broadcast(counts), "bucket")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(totals), "k")
        .select("doc_id", term.alias("t"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_feats"),
        F.round(F.sum("t").cast("double") / 1e9, 6).alias("logw"),
    )


DSIR_WEIGHTS_SQL = f"""
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
uni AS (SELECT doc_id, source, unnest(w) AS feat FROM w),
bg AS (
  SELECT doc_id, source, w[i] || ' ' || w[i + 1] AS feat
  FROM w, UNNEST(range(1, len(w))) AS t(i)
),
feats AS (
  SELECT doc_id, source,
         CAST('0x' || substring(md5(feat), 1, 15) AS BIGINT)
           % {N_BUCKETS} AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bg)
),
raw AS (SELECT bucket, COUNT(*) AS c_r FROM feats GROUP BY bucket),
tgt AS (SELECT bucket, COUNT(*) AS c_t FROM feats
        WHERE source = '{TARGET_SOURCE}' GROUP BY bucket),
tot AS (
  SELECT COUNT(*) AS n_r,
         SUM(CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END) AS n_t
  FROM feats
),
scored AS (
  SELECT f.doc_id,
      CAST(FLOOR(LN(CAST(COALESCE(tgt.c_t, 0) + 1 AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT)
    - CAST(FLOOR(LN(CAST(tot.n_t + {N_BUCKETS} AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT)
    - CAST(FLOOR(LN(CAST(raw.c_r + 1 AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT)
    + CAST(FLOOR(LN(CAST(tot.n_r + {N_BUCKETS} AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT) AS t
  FROM feats f
  JOIN raw ON raw.bucket = f.bucket
  LEFT JOIN tgt ON tgt.bucket = f.bucket
  CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_feats,
       ROUND(CAST(SUM(t) AS DOUBLE) / 1000000000.0, 6) AS logw
FROM scored GROUP BY doc_id
"""
