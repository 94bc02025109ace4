"""Matrix / table data model for gemmsql.

The reference models everything as dense 2-D torch tensors with shape
asserts (reference attention.py:38-44, mlp.py:23-30).  Here matrices are
DataFrames in one of three layouts:

- **COO**: ``(i bigint, j bigint, v double)`` — the canonical,
  Catalyst-friendly relational form; joins/aggs express matmul.
- **vector-row**: ``(i bigint, vec array<double>)`` — one row per matrix
  row; matches the driver's ``embeddings`` table and is the input shape
  for NumPy block kernels.
- **block**: produced on the fly inside kernels by grouping on
  ``block_id(i, block_size)`` — the Spark analog of the reference's
  ``slicer`` tile enumerator (reference core.py:8-13): a tile is the set
  of rows with the same block id, and the tile cross-product is a join
  of block tables on block ids.

All loaders read the driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) parquet (Spark
        # rejects it — read int64 nanos, truncate to micros like DuckDB)
        # and as tz-naive micros (Spark 4 reads TIMESTAMP_NTZ).  Either
        # way normalize to TIMESTAMP: session TZ is pinned UTC, so the
        # NTZ cast is identity and matches DuckDB epoch semantics.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_us(col) -> F.Column:
    """Exact integer epoch-microseconds of a timestamp column, tolerant
    of TIMESTAMP_NTZ parquet reads (session TZ is pinned UTC, so the
    NTZ->TZ cast is identity and matches DuckDB ``epoch_us``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every driver table as a temp view; return the dict."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def embeddings_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embeddings`` as vector-row form ``(i bigint, vec array<double>)``.

    Upcasts float->double so downstream aggregates match the float64
    discipline of the reference (reference attention.py:99-101).
    """
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("i"),
        F.col("embedding").cast("array<double>").alias("vec"),
        F.col("label").cast("long").alias("label"),
    )


def embeddings_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embeddings`` exploded to COO ``(i, j, v)``; j is 0-based."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.col("vec_id").alias("i"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "v"),
        )
        .select("i", F.col("j").cast("long").alias("j"), "v")
    )


def coo_from_vectors(vec_df: DataFrame, i="i", vec="vec") -> DataFrame:
    return vec_df.select(
        F.col(i).alias("i"), F.posexplode(F.col(vec)).alias("j", "v")
    ).select("i", F.col("j").cast("long").alias("j"), "v")


def vectors_from_coo(coo: DataFrame, dim: int | None = None) -> DataFrame:
    """COO -> vector-row.  Missing entries become 0.0 when ``dim`` given."""
    pairs = coo.groupBy("i").agg(
        F.array_sort(F.collect_list(F.struct("j", "v"))).alias("jv")
    )
    vec = F.col("jv.v")
    if dim is not None:
        # dense fill: positions are assumed contiguous 0..dim-1 when dim set
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.coalesce(
                F.element_at(F.map_from_arrays(F.col("jv.j"), F.col("jv.v")),
                             d.cast("long")),
                F.lit(0.0),
            ),
        )
    return pairs.select("i", vec.alias("vec"))


def block_id(col, block_size: int):
    """Spark analog of the reference's ``slicer`` (core.py:8-13):
    tile index of a row/column id for a given block size (integral —
    floor(id / block_size), same as the _blocked.py tiling)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / block_size).cast("long")


def with_block_id(df: DataFrame, col: str, block_size: int, out: str = "b") -> DataFrame:
    return df.withColumn(out, F.floor(F.col(col) / block_size).cast("int"))
