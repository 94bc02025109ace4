"""Sketch aggregates — the sub-linear-memory path for distinct counts
and quantiles at 100 TB.

Exact distinct over a 100 TB key column shuffles every distinct key;
the sketches here keep fixed-size state per group and merge
associatively (they ARE monoids — HyperLogLog++ register-max and
KLL/GK quantile summaries — the same partial+final contract as every
engine aggregate, reference core.py:15-64).  Accuracy bounds are
asserted in tests/test_pipeline.py against exact answers; queries using
sketches register as rows-only driver checks (approximate by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table


def user_reach_sketch(
    spark: SparkSession, sf_dir: str, *, rsd: float = 0.02
) -> DataFrame:
    """Per event_type: HLL++ distinct users + approximate value
    quantiles — fixed state per group regardless of cardinality."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("q"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.col("approx_users").cast("long").alias("approx_users"),
            F.round(F.col("q")[0], 6).alias("p50"),
            F.round(F.col("q")[1], 6).alias("p90"),
            F.round(F.col("q")[2], 6).alias("p99"),
            "n",
        )
    )
