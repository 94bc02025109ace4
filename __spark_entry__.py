"""Driver contract for the gemmsql engine.

``entry(spark)`` runs the flagship query (feature gram matrix — the
engine's minimal monoidal map-reduce, SURVEY.md §7 step 2) at sf0.001.
``queries()`` exposes every implemented operator; ``oracle_sql()`` gives
the DuckDB ANSI-SQL twin for each (hash-compared at sf0.01).

Float discipline: every float output column is ROUND(CAST(. AS DOUBLE), 6)
on BOTH sides (FIXTURES.md tolerance rule); ids are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------- helpers

def _vec(spark: SparkSession, sf_dir: str):
    from gemmsql.datamodel import embeddings_vectors

    return embeddings_vectors(spark, sf_dir)


def _r(col: str):
    return F.round(F.col(col).cast("double"), 6)


# DuckDB CTE: embeddings exploded to COO (i, j, v), 0-based dims, double.
_COO = (
    "coo AS (SELECT vec_id AS i,"
    " CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,"
    " CAST(unnest(embedding) AS DOUBLE) AS v"
    " FROM embeddings)"
)

# DuckDB CTE: pairwise scores s[qi,ki] = pred_qi . trg_ki (self-factored)
_SCORES = (
    _COO + ", scores AS (SELECT a.i AS qi, b.i AS ki, SUM(a.v * b.v) AS s"
    " FROM coo a JOIN coo b USING (j) GROUP BY a.i, b.i)"
    ", lse AS (SELECT qi, MAX(s) AS mx FROM scores GROUP BY qi)"
    ", z AS (SELECT s.qi, l.mx + LN(SUM(EXP(s.s - l.mx))) AS z"
    " FROM scores s JOIN lse l USING (qi) GROUP BY s.qi, l.mx)"
)


# ---------------------------------------------------------------- queries

def q_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import gram

    g = gram(_vec(spark, sf_dir))
    return g.select(
        F.col("j1").cast("long").alias("j1"),
        F.col("j2").cast("long").alias("j2"),
        _r("v").alias("val"),
    )


def q_relu_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import gram

    g = gram(_vec(spark, sf_dir))
    return g.select(
        F.col("j1").cast("long").alias("j1"),
        F.col("j2").cast("long").alias("j2"),
        F.round(F.greatest(F.col("v"), F.lit(0.0)), 6).alias("val"),
    )


def _weights(spark: SparkSession, sf_dir: str):
    """W = X^T X / N, the deterministic small weight matrix used by the
    MLP query (driver tables carry no weights; reference generates random
    ones, mlp.py:84-86 — here a data-derived deterministic stand-in)."""
    import numpy as np
    from gemmsql.ops import gram

    vec = _vec(spark, sf_dir)
    n = vec.count()
    gp = gram(vec).toPandas().sort_values(["j1", "j2"])
    d = int(gp["j1"].max()) + 1
    return vec, (gp["v"].to_numpy().reshape(d, d) / n)


def q_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import mlp

    vec, w = _weights(spark, sf_dir)
    y = mlp(vec.select("i", "vec"), w, w)
    return y.select(
        "i", F.posexplode("vec").alias("k", "v")
    ).select(
        F.col("i").cast("long").alias("i"),
        F.col("k").cast("long").alias("k"),
        _r("v").alias("val"),
    )


def q_attention(spark: SparkSession, sf_dir: str, scale: bool = False) -> DataFrame:
    from gemmsql.ops import attention_blocked

    vec = _vec(spark, sf_dir).select("i", "vec")
    out = attention_blocked(vec, vec, scale=scale)
    return out.select(
        F.col("i").cast("long").alias("i"),
        F.col("d").cast("long").alias("d"),
        _r("val").alias("val"),
    )


def q_xentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import xentropy

    vec = _vec(spark, sf_dir)
    out = xentropy(vec.select("i", "vec", "label"), vec.select("i", "vec"))
    return out.select(
        F.col("i").cast("long").alias("i"), _r("loss").alias("loss")
    )


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import row_entropy

    vec = _vec(spark, sf_dir).select("i", "vec")
    out = row_entropy(vec, vec)
    return out.select(
        F.col("i").cast("long").alias("i"), _r("entropy").alias("entropy")
    )


def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops import sample_categorical

    vec = _vec(spark, sf_dir).select("i", "vec")
    out = sample_categorical(vec, vec, seed=42)
    return out.select(
        F.col("i").cast("long").alias("i"),
        _r("prob").alias("prob"),
        F.col("choice").cast("long").alias("choice"),
    )


def _ones_like(vec: DataFrame) -> DataFrame:
    """Cotangent of ones aligned with ``vec`` rows (the reference's
    ``mock`` cotangent, core.py:72, fixed to 1 for SQL expressibility)."""
    return vec.select("i", F.transform("vec", lambda _: F.lit(1.0)).alias("vec"))


def _explode_grads(parts: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union named vector-row gradients into (which, i, d, val) COO."""
    outs = []
    for which, df in parts:
        outs.append(
            df.select(
                F.lit(which).alias("which"),
                F.col("i").cast("long").alias("i"),
                F.posexplode("vec").alias("d", "v"),
            ).select(
                "which", "i", F.col("d").cast("long").alias("d"),
                _r("v").alias("val"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_attention_grads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (reference attention.py:11-29) through the driver gate:
    gradients of unscaled self-attention wrt (Q, K, V), cotangent=1."""
    from gemmsql.ops.backward import attention_bwd

    vec = _vec(spark, sf_dir).select("i", "vec")
    gq, gk, gv = attention_bwd(vec, vec, _ones_like(vec))
    return _explode_grads([("gq", gq), ("gk", gk), ("gv", gv)])


def q_xentropy_grads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (reference xentropy.py:15-37) through the driver gate:
    gradients of sum_m loss_m wrt (pred, trg)."""
    from gemmsql.ops.backward import xentropy_bwd

    vec = _vec(spark, sf_dir)
    gpred, gtrg = xentropy_bwd(
        vec.select("i", "vec", "label"), vec.select("i", "vec")
    )
    return _explode_grads([("gpred", gpred), ("gtrg", gtrg)])


def q_mlp_grads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 (reference mlp.py:9-16) through the driver gate: gradients of
    relu(X W) W wrt (X, P, Q), cotangent=1, W = X^T X / N."""
    from gemmsql.ops.backward import mlp_bwd

    vec, w = _weights(spark, sf_dir)
    gx, gp, gq = mlp_bwd(vec.select("i", "vec"), _ones_like(vec), w, w)
    out = _explode_grads([("gx", gx)])
    for which, df in (("gp", gp), ("gq", gq)):
        out = out.unionByName(
            df.select(
                F.lit(which).alias("which"),
                F.col("i").cast("long").alias("i"),
                F.col("j").cast("long").alias("d"),
                _r("v").alias("val"),
            )
        )
    return out


def q_attention_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.ops.attention import attention_batched

    vec = _vec(spark, sf_dir).select(
        (F.col("i") % 8).alias("b"), "i", "vec"
    )
    out = attention_batched(vec, vec, scale=True)
    return out.select(
        "b", "i", "d", F.round(F.col("val"), 6).alias("val")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.pipeline.similarity import cosine_topk

    return cosine_topk(spark, sf_dir, k=5)


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.pipeline.similarity import lsh_bucket_topk

    return lsh_bucket_topk(spark, sf_dir, k=5)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.pipeline.similarity import ivf_topk

    return ivf_topk(spark, sf_dir, k=5)


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.pipeline.similarity import embedding_dups

    return embedding_dups(spark, sf_dir, threshold=0.4)


def _sketch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.sketches import user_reach_sketch

    return user_reach_sketch(spark, sf_dir)


def _streaming_gate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.streaming.windows import streaming_hourly_gate

    return streaming_hourly_gate(spark, sf_dir)


def _streaming_sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.streaming.windows import streaming_sessionize_gate

    return streaming_sessionize_gate(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: feature gram matrix of the embeddings table at sf0.001 —
    map-side NumPy partials, O(D^2) shuffle (SURVEY.md §7 step 2)."""
    return q_gram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gemmsql.pipeline import dedup, events, joins, relational, text
    from gemmsql.pipeline.multimodal import payload_meta

    return {
        # --- reference operator surface (SURVEY.md §2) ---
        "gram": q_gram,
        "relu_gram": q_relu_gram,
        "mlp": q_mlp,
        "attention": q_attention,
        "attention_scaled": lambda s, d: q_attention(s, d, scale=True),
        "attention_batched": q_attention_batched,
        "xentropy": q_xentropy,
        "entropy": q_entropy,
        "sampling": q_sampling,  # stochastic: rows-only (no oracle), like the reference
        # --- backward passes (recompute-strategy second jobs) ---
        "attention_grads": q_attention_grads,
        "xentropy_grads": q_xentropy_grads,
        "mlp_grads": q_mlp_grads,
        # --- relational / OLAP ---
        "pricing_summary": relational.pricing_summary,
        "shipping_priority": relational.shipping_priority,
        "nation_revenue": relational.nation_revenue,
        "top_orders_per_customer": relational.top_orders_per_customer,
        "sales_rollup": relational.sales_rollup,
        "order_priority_pivot": relational.order_priority_pivot,
        "segment_quantiles": relational.segment_quantiles,
        "quiet_customers": relational.quiet_customers,
        "returning_customers": relational.returning_customers,
        "high_value_customers": relational.high_value_customers,
        "brand_sales_cube": relational.brand_sales_cube,
        "price_band_join": relational.price_band_join,
        # --- event analytics ---
        "hourly_event_stats": events.hourly_event_stats,
        "sliding_event_counts": events.sliding_event_counts,
        "sessionize": events.sessionize,
        "user_activity_profile": events.user_activity_profile,
        "time_since_last_error": events.time_since_last_error,
        "user_value_movavg": events.user_value_movavg,
        "props_stats": events.props_stats,
        "last_order_before_event": joins.last_order_before_event,
        "user_reach_sketch": _sketch_query,  # approximate: rows-only (bounds tested in pytest)
        "streaming_hourly_gate": _streaming_gate_query,
        "streaming_sessionize_gate": _streaming_sessionize_query,
        # --- dedup ---
        "dedup_exact": dedup.dedup_exact,
        "jaccard_pairs": dedup.jaccard_pairs,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash,
        "dedup_clusters": dedup.dedup_clusters,
        # --- text analysis ---
        "text_stats": text.text_stats,
        "token_counts": text.token_counts,
        "language_scores": text.language_scores,
        "fingerprints": text.fingerprints,
        "tfidf_top_terms": text.tfidf_top_terms,
        "quality_score": text.quality_score,
        "stratified_sample": text.stratified_sample,
        # --- similarity search ---
        "cosine_topk": q_cosine_topk,
        "lsh_topk": q_lsh_topk,  # approximate: rows-only (recall tested in pytest)
        "ivf_topk": q_ivf_topk,
        "embedding_dups": q_embedding_dups,
        # --- multimodal ---
        "payload_meta": payload_meta,
    }


ATTENTION_BATCHED_SQL = """
WITH coo AS (
  SELECT vec_id AS i, vec_id % 8 AS b,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
dim AS (SELECT COUNT(DISTINCT j) AS d FROM coo),
scores AS (
  SELECT a.b, a.i AS qi, c.i AS ki, SUM(a.v * c.v) / SQRT(MAX(dim.d)) AS s
  FROM coo a JOIN coo c ON a.j = c.j AND a.b = c.b CROSS JOIN dim
  GROUP BY a.b, a.i, c.i
),
mx AS (SELECT b, qi, MAX(s) AS mx FROM scores GROUP BY 1, 2),
z AS (
  SELECT s.b, s.qi, m.mx + LN(SUM(EXP(s.s - m.mx))) AS z
  FROM scores s JOIN mx m ON m.b = s.b AND m.qi = s.qi GROUP BY s.b, s.qi, m.mx
)
SELECT s.b, s.qi AS i, v.j AS d,
       ROUND(CAST(SUM(EXP(s.s - z.z) * v.v) AS DOUBLE), 6) AS val
FROM scores s
JOIN z ON z.b = s.b AND z.qi = s.qi
JOIN coo v ON v.i = s.ki AND v.b = s.b
GROUP BY s.b, s.qi, v.j
"""


ATTENTION_GRADS_SQL = f"""
WITH {_SCORES},
dims AS (SELECT DISTINCT j FROM coo),
vsum AS (SELECT i, SUM(v) AS vs FROM coo GROUP BY i),
w AS (SELECT s.qi, s.ki, EXP(s.s - z.z) AS w FROM scores s JOIN z USING (qi)),
r AS (SELECT w.qi, SUM(w.w * vsum.vs) AS r
      FROM w JOIN vsum ON vsum.i = w.ki GROUP BY w.qi),
gs AS (SELECT w.qi, w.ki, w.w * (vsum.vs - r.r) AS g
       FROM w JOIN vsum ON vsum.i = w.ki JOIN r ON r.qi = w.qi),
gvs AS (SELECT ki, SUM(w) AS s FROM w GROUP BY ki)
SELECT 'gq' AS which, gs.qi AS i, k.j AS d,
       ROUND(CAST(SUM(gs.g * k.v) AS DOUBLE), 6) AS val
FROM gs JOIN coo k ON k.i = gs.ki GROUP BY gs.qi, k.j
UNION ALL
SELECT 'gk', gs.ki, q.j, ROUND(CAST(SUM(gs.g * q.v) AS DOUBLE), 6)
FROM gs JOIN coo q ON q.i = gs.qi GROUP BY gs.ki, q.j
UNION ALL
SELECT 'gv', gvs.ki, dims.j, ROUND(CAST(gvs.s AS DOUBLE), 6)
FROM gvs CROSS JOIN dims
"""

XENTROPY_GRADS_SQL = f"""
WITH {_SCORES},
w AS (SELECT s.qi, s.ki, EXP(s.s - z.z) AS w FROM scores s JOIN z USING (qi)),
delta AS (SELECT w.qi, w.ki,
                 w.w - CASE WHEN w.ki = CAST(e.label AS BIGINT)
                            THEN 1 ELSE 0 END AS dv
          FROM w JOIN embeddings e ON e.vec_id = w.qi)
SELECT 'gpred' AS which, delta.qi AS i, t.j AS d,
       ROUND(CAST(SUM(delta.dv * t.v) AS DOUBLE), 6) AS val
FROM delta JOIN coo t ON t.i = delta.ki GROUP BY delta.qi, t.j
UNION ALL
SELECT 'gtrg', delta.ki, p.j, ROUND(CAST(SUM(delta.dv * p.v) AS DOUBLE), 6)
FROM delta JOIN coo p ON p.i = delta.qi GROUP BY delta.ki, p.j
"""

MLP_GRADS_SQL = f"""
WITH {_COO},
n AS (SELECT COUNT(*) AS n FROM embeddings),
dims AS (SELECT DISTINCT j FROM coo),
w AS (SELECT a.j AS i, b.j AS k, SUM(a.v * b.v) / MAX(n.n) AS v
      FROM coo a JOIN coo b USING (i) CROSS JOIN n GROUP BY a.j, b.j),
h AS (SELECT x.i, w.k AS j, GREATEST(SUM(x.v * w.v), 0.0) AS v
      FROM coo x JOIN w ON x.j = w.i GROUP BY x.i, w.k),
qs AS (SELECT i AS k, SUM(v) AS qs FROM w GROUP BY i),
gh AS (SELECT h.i AS m, h.j AS k,
              CASE WHEN h.v > 0 THEN qs.qs ELSE 0 END AS v
       FROM h JOIN qs ON qs.k = h.j),
gqk AS (SELECT j AS k, SUM(v) AS s FROM h GROUP BY j)
SELECT 'gx' AS which, gh.m AS i, w2.i AS d,
       ROUND(CAST(SUM(gh.v * w2.v) AS DOUBLE), 6) AS val
FROM gh JOIN w w2 ON w2.k = gh.k GROUP BY gh.m, w2.i
UNION ALL
SELECT 'gp', x.j, gh.k, ROUND(CAST(SUM(x.v * gh.v) AS DOUBLE), 6)
FROM coo x JOIN gh ON gh.m = x.i GROUP BY x.j, gh.k
UNION ALL
SELECT 'gq', gqk.k, dims.j, ROUND(CAST(gqk.s AS DOUBLE), 6)
FROM gqk CROSS JOIN dims
"""


def oracle_sql() -> dict[str, str]:
    gram_sql = (
        f"WITH {_COO} SELECT a.j AS j1, b.j AS j2,"
        " ROUND(CAST(SUM(a.v * b.v) AS DOUBLE), 6) AS val"
        " FROM coo a JOIN coo b USING (i) GROUP BY a.j, b.j"
    )
    relu_gram_sql = (
        f"WITH {_COO} SELECT a.j AS j1, b.j AS j2,"
        " ROUND(CAST(GREATEST(SUM(a.v * b.v), 0.0) AS DOUBLE), 6) AS val"
        " FROM coo a JOIN coo b USING (i) GROUP BY a.j, b.j"
    )
    mlp_sql = (
        f"WITH {_COO},"
        " n AS (SELECT COUNT(*) AS n FROM embeddings),"
        " w AS (SELECT a.j AS i, b.j AS k, SUM(a.v * b.v) / MAX(n.n) AS v"
        "   FROM coo a JOIN coo b USING (i) CROSS JOIN n GROUP BY a.j, b.j),"
        " h AS (SELECT x.i, w.k AS j, GREATEST(SUM(x.v * w.v), 0.0) AS v"
        "   FROM coo x JOIN w ON x.j = w.i GROUP BY x.i, w.k)"
        " SELECT h.i AS i, w.k AS k,"
        " ROUND(CAST(SUM(h.v * w.v) AS DOUBLE), 6) AS val"
        " FROM h JOIN w ON h.j = w.i GROUP BY h.i, w.k"
    )
    att_body = (
        " SELECT s.qi AS i, v.j AS d,"
        " ROUND(CAST(SUM(EXP(s.s - z.z) * v.v) AS DOUBLE), 6) AS val"
        " FROM scores s JOIN z USING (qi) JOIN coo v ON s.ki = v.i"
        " GROUP BY s.qi, v.j"
    )
    attention_sql = f"WITH {_SCORES}{att_body}"
    scaled_scores = _SCORES.replace(
        "SUM(a.v * b.v) AS s",
        "SUM(a.v * b.v) / SQRT((SELECT COUNT(DISTINCT j) FROM coo)) AS s",
    )
    attention_scaled_sql = f"WITH {scaled_scores}{att_body}"
    xentropy_sql = (
        f"WITH {_SCORES}"
        " SELECT z.qi AS i, ROUND(CAST(z.z - s.s AS DOUBLE), 6) AS loss"
        " FROM z JOIN embeddings e ON z.qi = e.vec_id"
        " JOIN scores s ON s.qi = z.qi AND s.ki = CAST(e.label AS BIGINT)"
    )
    entropy_sql = (
        f"WITH {_SCORES}"
        " SELECT s.qi AS i,"
        " ROUND(CAST(MAX(z.z) - SUM(EXP(s.s - z.z) * s.s) AS DOUBLE), 6)"
        " AS entropy"
        " FROM scores s JOIN z USING (qi) GROUP BY s.qi"
    )
    from gemmsql.pipeline import dedup, events, joins, relational, text
    from gemmsql.pipeline.multimodal import PAYLOAD_META_SQL
    from gemmsql.streaming.windows import (
        STREAMING_HOURLY_GATE_SQL,
        STREAMING_SESSIONIZE_GATE_SQL,
    )
    from gemmsql.pipeline.similarity import (
        COSINE_TOPK_SQL,
        EMBEDDING_DUPS_SQL,
        IVF_TOPK_SQL,
    )

    return {
        "gram": gram_sql,
        "relu_gram": relu_gram_sql,
        "mlp": mlp_sql,
        "attention": attention_sql,
        "attention_scaled": attention_scaled_sql,
        "attention_batched": ATTENTION_BATCHED_SQL,
        "xentropy": xentropy_sql,
        "entropy": entropy_sql,
        # "sampling": omitted — stochastic; driver records rows-only check
        # (mirrors the reference's own untested sampling, sampling.py:67-75)
        "attention_grads": ATTENTION_GRADS_SQL,
        "xentropy_grads": XENTROPY_GRADS_SQL,
        "mlp_grads": MLP_GRADS_SQL,
        "pricing_summary": relational.PRICING_SUMMARY_SQL,
        "shipping_priority": relational.SHIPPING_PRIORITY_SQL,
        "nation_revenue": relational.NATION_REVENUE_SQL,
        "top_orders_per_customer": relational.TOP_ORDERS_SQL,
        "sales_rollup": relational.SALES_ROLLUP_SQL,
        "order_priority_pivot": relational.ORDER_PRIORITY_PIVOT_SQL,
        "segment_quantiles": relational.SEGMENT_QUANTILES_SQL,
        "quiet_customers": relational.QUIET_CUSTOMERS_SQL,
        "returning_customers": relational.RETURNING_CUSTOMERS_SQL,
        "high_value_customers": relational.HIGH_VALUE_CUSTOMERS_SQL,
        "brand_sales_cube": relational.BRAND_SALES_CUBE_SQL,
        "price_band_join": relational.PRICE_BAND_JOIN_SQL,
        "hourly_event_stats": events.HOURLY_EVENT_STATS_SQL,
        "sliding_event_counts": events.SLIDING_EVENT_COUNTS_SQL,
        "sessionize": events.SESSIONIZE_SQL,
        "user_activity_profile": events.USER_ACTIVITY_PROFILE_SQL,
        "time_since_last_error": events.TIME_SINCE_LAST_ERROR_SQL,
        "user_value_movavg": events.USER_VALUE_MOVAVG_SQL,
        "props_stats": events.PROPS_STATS_SQL,
        "last_order_before_event": joins.LAST_ORDER_BEFORE_EVENT_SQL,
        "streaming_hourly_gate": STREAMING_HOURLY_GATE_SQL,
        "streaming_sessionize_gate": STREAMING_SESSIONIZE_GATE_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "jaccard_pairs": dedup.jaccard_pairs_sql(),
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs_sql(),
        "simhash": dedup.simhash_sql(),
        "dedup_clusters": dedup.dedup_clusters_sql(),
        "text_stats": text.TEXT_STATS_SQL,
        "token_counts": text.TOKEN_COUNTS_SQL,
        "language_scores": text.language_scores_sql(),
        "fingerprints": text.FINGERPRINTS_SQL,
        "tfidf_top_terms": text.TFIDF_TOP_TERMS_SQL,
        "quality_score": text.quality_score_sql(),
        "stratified_sample": text.stratified_sample_sql(),
        "cosine_topk": COSINE_TOPK_SQL,
        "ivf_topk": IVF_TOPK_SQL,
        "embedding_dups": EMBEDDING_DUPS_SQL,
        # "lsh_topk": omitted — approximate; rows-only
        "payload_meta": PAYLOAD_META_SQL,
    }
