"""SparkSession factory for the gemmsql engine.

Local-mode defaults follow the driver environment (local[32], single JVM)
but every knob is env-overridable so the same code runs on a real cluster:
on 1000 executors only ``shuffle_partitions`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gemmsql",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on (runtime partition coalescing + skew-join splitting) — the
      scale path for skewed keys at 100 TB.
    - Arrow on — every pandas-UDF kernel transfers via Arrow batches.
    - UTC session timezone — parity with the DuckDB oracle (UTC-naive).
    - shuffle partitions ~ cores locally; on a cluster set it to
      2-3x total cores via ``GEMMSQL_SHUFFLE_PARTITIONS``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("GEMMSQL_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("GEMMSQL_SHUFFLE_PARTITIONS", "32")
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("GEMMSQL_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
