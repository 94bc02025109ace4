"""Similarity search over the embedding column.

- :func:`cosine_topk` — exact brute-force top-k, tiled: per
  (query-block, index-block) the NumPy kernel emits only its LOCAL
  top-k per query row (a top-k monoid partial — top-k of a union is the
  top-k of concatenated partial top-ks), then a global window keeps the
  final k.  Shuffle is O(N * n_blocks * k), never O(N^2).
- :func:`lsh_bucket_topk` — the approximate scale path: sign-LSH
  bucketing (deterministic md5-derived hyperplanes), candidates only
  within a bucket.  Recall is tested against the exact path in pytest;
  the driver check is rows-only (approximate by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gemmsql.datamodel import embeddings_vectors
from gemmsql.ops._blocked import blocked_partials


def _topk_kernel(k: int):
    def kernel(lids, lmat, _extra, rids, rmat) -> pd.DataFrame:
        ln = lmat / np.linalg.norm(lmat, axis=1, keepdims=True)
        rn = rmat / np.linalg.norm(rmat, axis=1, keepdims=True)
        c = ln @ rn.T
        # mask self-pairs
        self_mask = lids[:, None] == rids[None, :]
        c = np.where(self_mask, -np.inf, c)
        kk = min(k, c.shape[1])
        idx = np.argpartition(-c, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(c.shape[0]), kk)
        cols = idx.ravel()
        keep = np.isfinite(c[rows, cols])
        return pd.DataFrame(
            {
                "i": lids[rows[keep]],
                "j": rids[cols[keep]],
                "cos": c[rows[keep], cols[keep]],
            }
        )

    return kernel


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int = 5,
    block: int = 4096,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector -> (i, j, cos, rank)."""
    vec = embeddings_vectors(spark, sf_dir).select("i", "vec")
    partials = blocked_partials(
        vec, vec, _topk_kernel(k), "i long, j long, cos double",
        left_block=block, right_block=block,
    )
    w = W.partitionBy("i").orderBy(F.col("cos").desc(), F.col("j"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", F.round("cos", 6).alias("cos"),
                F.col("rank").cast("long").alias("rank"))
    )


COSINE_TOPK_SQL = """
WITH coo AS (
  SELECT vec_id AS i,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
norms AS (SELECT i, SQRT(SUM(v * v)) AS nrm FROM coo GROUP BY 1),
dots AS (
  SELECT a.i AS qi, b.i AS ki, SUM(a.v * b.v) AS dot
  FROM coo a JOIN coo b USING (j) WHERE a.i <> b.i GROUP BY 1, 2
),
cos AS (
  SELECT qi, ki, dot / (na.nrm * nb.nrm) AS cos
  FROM dots JOIN norms na ON na.i = qi JOIN norms nb ON nb.i = ki
),
ranked AS (
  SELECT qi, ki, cos,
         ROW_NUMBER() OVER (PARTITION BY qi ORDER BY cos DESC, ki) AS rank
  FROM cos
)
SELECT qi AS i, ki AS j, ROUND(CAST(cos AS DOUBLE), 6) AS cos,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def _dup_kernel(threshold: float):
    def kernel(lids, lmat, _extra, rids, rmat) -> pd.DataFrame:
        ln = lmat / np.linalg.norm(lmat, axis=1, keepdims=True)
        rn = rmat / np.linalg.norm(rmat, axis=1, keepdims=True)
        c = ln @ rn.T
        # upper triangle only (i < j) so each pair is emitted once
        mask = (c >= threshold) & (lids[:, None] < rids[None, :])
        r, co = np.nonzero(mask)
        return pd.DataFrame(
            {"doc_a": lids[r], "doc_b": rids[co], "cos": c[r, co]}
        )

    return kernel


def embedding_dups(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = 0.4,
    block: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (doc_a < doc_b, cos >= t).

    Tiled all-pairs scan emitting ONLY above-threshold pairs from each
    tile — the shuffle carries matches, not the N^2 score matrix.  The
    100 TB path swaps the tile cross-product for LSH-bucketed candidate
    generation (same kernel per bucket)."""
    vec = embeddings_vectors(spark, sf_dir).select("i", "vec")
    pairs = blocked_partials(
        vec, vec, _dup_kernel(threshold),
        "doc_a long, doc_b long, cos double",
        left_block=block, right_block=block,
    )
    return pairs.select("doc_a", "doc_b", F.round("cos", 6).alias("cos"))


EMBEDDING_DUPS_SQL = """
WITH coo AS (
  SELECT vec_id AS i,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
norms AS (SELECT i, SQRT(SUM(v * v)) AS nrm FROM coo GROUP BY 1),
dots AS (
  SELECT a.i AS doc_a, b.i AS doc_b, SUM(a.v * b.v) AS dot
  FROM coo a JOIN coo b USING (j) WHERE a.i < b.i GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(CAST(dot / (na.nrm * nb.nrm) AS DOUBLE), 6) AS cos
FROM dots JOIN norms na ON na.i = doc_a JOIN norms nb ON nb.i = doc_b
WHERE dot / (na.nrm * nb.nrm) >= 0.4
"""


N_PLANES = 6
N_TABLES = 4


def _plane_matrix(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes for all LSH tables:
    (dim, N_TABLES * N_PLANES), from a counter-based Philox stream with a
    fixed seed, so every run and every executor sees the same planes."""
    rng = np.random.Generator(np.random.Philox(key=[20260813, 7]))
    return rng.standard_normal((dim, N_TABLES * N_PLANES))


def lsh_bucket_topk(
    spark: SparkSession, sf_dir: str, *, k: int = 5
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing a
    sign-LSH bucket in ANY of the N_TABLES independent hash tables
    (multi-table LSH — the standard recall lever).

    At 100 TB: one narrow map to bucket ids (N_TABLES rows per vector),
    one shuffle on (table, bucket), per-bucket brute force bounded by
    bucket size, then a per-row top-k over deduplicated candidates.
    Output (i, j, cos, rank) like :func:`cosine_topk` but possibly
    missing true neighbors that hash elsewhere (recall tested)."""
    vec = embeddings_vectors(spark, sf_dir).select("i", "vec")
    dim = len(vec.select("vec").first()[0])
    planes = spark.sparkContext.broadcast(_plane_matrix(dim))

    def bucketize(batches):
        pm = planes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
            bits = (x @ pm) > 0  # (n, N_TABLES*N_PLANES)
            out = []
            for t in range(N_TABLES):
                tb = bits[:, t * N_PLANES : (t + 1) * N_PLANES]
                bucket = (tb * (1 << np.arange(N_PLANES))).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "i": pdf["i"].values,
                            "bucket": (t << 32) | bucket.astype(np.int64),
                            "vec": pdf["vec"].values,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    bucketed = vec.mapInPandas(
        bucketize, schema="i long, bucket long, vec array<double>"
    )

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
        ids = pdf["i"].to_numpy()
        n = x / np.linalg.norm(x, axis=1, keepdims=True)
        c = n @ n.T
        np.fill_diagonal(c, -np.inf)
        out_i, out_j, out_c = [], [], []
        kk = min(k, max(c.shape[1] - 1, 1))
        for r in range(c.shape[0]):
            idx = np.argpartition(-c[r], kth=kk - 1)[:kk]
            idx = idx[np.isfinite(c[r, idx])]
            out_i.extend([ids[r]] * len(idx))
            out_j.extend(ids[idx])
            out_c.extend(c[r, idx])
        return pd.DataFrame({"i": out_i, "j": out_j, "cos": out_c})

    cand = (
        bucketed.groupBy("bucket")
        .applyInPandas(per_bucket, "i long, j long, cos double")
        .groupBy("i", "j")  # dedup pairs found in multiple tables
        .agg(F.max("cos").alias("cos"))
    )
    w = W.partitionBy("i").orderBy(F.col("cos").desc(), F.col("j"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("i", "j", F.round("cos", 6).alias("cos"),
                F.col("rank").cast("long").alias("rank"))
    )
