"""Sources and sinks beyond the driver's parquet tables.

The reference has NO storage layer at all — inputs are torch.randn in
``__main__`` blocks and the only sink is stdout (SURVEY.md §2.9).  This
module is the engine's I/O surface: schema-enforced readers for the
formats a lake actually contains, and scale-safe writers.

Design rules (100 TB):
- always pass an explicit schema to csv/json readers — schema inference
  is a full extra pass over the data;
- writes are partitioned by a low-cardinality column and bucketed only
  when a downstream join will reuse the bucketing (bucketing costs one
  shuffle now to save one later — a bet, not a default);
- ``maxRecordsPerFile`` caps file sizes so a skewed partition cannot
  produce one giant file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    """CSV with a REQUIRED explicit schema (no inference pass)."""
    opts = {"header": "true", **options}
    return spark.read.options(**opts).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    """JSON-lines with a REQUIRED explicit schema."""
    return spark.read.options(**options).schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink with bounded file sizes."""
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles on ``bucket_by`` so later
    equi-joins/aggregations on that key skip their Exchange entirely —
    the persisted form of co-partitioning two fact tables."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def write_noop(df: DataFrame) -> None:
    """Benchmark sink: full computation, no output."""
    df.write.format("noop").mode("overwrite").save()


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (Spark's
    vectorized ORC reader honors PushedFilters + ReadSchema)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, *, max_records_per_file: int = 1_000_000) -> None:
    df.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    ).orc(path)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Opaque-payload ingestion via Spark's ``binaryFile`` source ->
    (path, modificationTime, length, content binary).

    This is how image/audio/video corpora enter the engine at 100 TB:
    the scan ships bytes + typed metadata, and decode happens (if at
    all) in Arrow-batched kernels downstream
    (``pipeline.multimodal``).  Filters on path/length are pushed into
    the file listing — ``pathGlobFilter`` prunes before any byte is
    read."""
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def write_clustered(
    df: DataFrame,
    path: str,
    *,
    cluster_by: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
    n_files: int | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized sink: hive-partition on low-cardinality keys
    and range-split + SORT the data on ``cluster_by`` before writing,
    so every output file covers a narrow, ordered key range.

    Why it matters at 100 TB: parquet readers skip row groups whose
    min/max stats exclude the predicate.  An unsorted write scatters
    every key across every file (stats span the full domain — nothing
    skips); this sink makes the stats tight, which turns point/range
    predicates on ``cluster_by`` into touched-bytes proportional to
    selectivity — the lakehouse "clustering" story without a table
    format.  ``repartitionByRange`` adds the one range-exchange this
    costs; with ``partition_by`` the exchange groups by partition key
    instead so each task writes one hive partition."""
    cluster = list(cluster_by)
    if partition_by:
        part = list(partition_by)
        d = df.repartition(*part).sortWithinPartitions(*(part + cluster))
    elif n_files is not None:
        d = df.repartitionByRange(n_files, *cluster).sortWithinPartitions(
            *cluster
        )
    else:
        d = df.repartitionByRange(*cluster).sortWithinPartitions(*cluster)
    w = d.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    cluster_by: tuple[str, ...],
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction — the maintenance op every long-lived
    lake runs (streaming sinks and incremental upserts accrete tiny
    files; each one costs a task, an open, and a footer read on every
    later scan).  Reads ``src_dir``, sizes the output file count from
    the ACTUAL source bytes (``ceil(total / target_file_bytes)`` — a
    driver-side metadata listing, no data pass), and rewrites through
    :func:`write_clustered` so compaction also restores stat
    tightness on ``cluster_by`` (compact-and-cluster, the OPTIMIZE
    shape table formats ship).  Returns the output file count.

    Scale shape: one range exchange + one write — the same cost as
    any clustered write of the same volume; the sizing listing reads
    directory metadata only."""
    import math
    import os as _os

    total = sum(
        e.stat().st_size
        for e in _os.scandir(src_dir)
        if e.name.endswith(".parquet")
    )
    if total == 0:
        raise ValueError(f"no parquet bytes under {src_dir}")
    n_files = max(1, math.ceil(total / target_file_bytes))
    write_clustered(
        spark.read.parquet(src_dir),
        dst_dir,
        cluster_by=cluster_by,
        n_files=n_files,
        mode=mode,
    )
    return n_files


ZORDER_BITS = 16  # per-dimension resolution of the Morton curve


def _morton_expr(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """SQL bigint: bit-interleave the already-scaled integer columns
    ``cols`` (each in [0, 2^bits)) into one Morton (Z-order) value.
    Pure JVM-side bitwise arithmetic — stays inside whole-stage
    codegen; D * bits <= 63."""
    d = len(cols)
    terms = []
    for ci, c in enumerate(cols):
        for b in range(bits):
            # bit b of col ci lands at interleaved position b*d + ci
            terms.append(
                f"(shiftleft(shiftright({c}, {b}) & 1, {b * d + ci}))"
            )
    return " + ".join(terms)


def zorder_value_expr(df: DataFrame, zorder_by: tuple[str, ...]) -> str:
    """The Morton-value SQL expression for ``df`` over ``zorder_by``:
    each column min/max-scales to ``ZORDER_BITS`` bits (one tiny agg
    job over the input — a write-path cost, never per-query) and the
    bits interleave.  Factored out of :func:`write_zordered` so the
    transactional OPTIMIZE (``tablelog.optimize_table``) can cluster
    its rewrite on the same curve."""
    from pyspark.sql import functions as F

    cols = list(zorder_by)
    if not 1 <= len(cols) * ZORDER_BITS <= 63:
        raise ValueError(f"need 1..3 z-order columns, got {len(cols)}")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << ZORDER_BITS) - 1
    scaled = []
    for i, c in enumerate(cols):
        if stats[f"lo_{i}"] is None or stats[f"hi_{i}"] is None:
            raise ValueError(
                f"z-order column {c!r} must be numeric and non-empty "
                "(min/max cast to double returned null)"
            )
        lo, hi = float(stats[f"lo_{i}"]), float(stats[f"hi_{i}"])
        span = (hi - lo) or 1.0
        scaled.append(
            f"CAST(least({float(top)}, greatest(0.0D,"
            f" (CAST({c} AS DOUBLE) - {lo!r}D) / {span!r}D"
            f" * {float(top)}D)) AS BIGINT)"
        )
    return _morton_expr(scaled)


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: tuple[str, ...],
    n_files: int | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet sink: multi-dimensional
    data skipping without a table format.

    :func:`write_clustered` makes ONE column's per-file min/max stats
    tight; a predicate on any other column still touches every file.
    This sink scales each ``zorder_by`` column to a ``ZORDER_BITS``-bit
    integer (min/max linear scaling — one tiny agg job over the input,
    a write-path cost, never per-query), bit-interleaves them into a
    Morton value, and range-splits + sorts on that value — so every
    output file covers a small HYPERCUBE of the key space and parquet
    row-group stats stay narrow on EVERY z-ordered dimension at once
    (the Delta/Iceberg OPTIMIZE ZORDER story, done with plain Spark
    exchanges).  The cost over a plain write is one agg job + one
    range exchange, identical to single-key clustering.

    At 100 TB: pick 2-4 columns that real predicates filter on
    together (e.g. date x customer); more dimensions dilute the
    per-dimension tightness (bits/dim shrink), which is why this takes
    an explicit tuple rather than defaulting to "all columns".
    """
    from pyspark.sql import functions as F

    z = df.withColumn("__z", F.expr(zorder_value_expr(df, zorder_by)))
    if n_files is not None:
        d = z.repartitionByRange(n_files, "__z")
    else:
        d = z.repartitionByRange("__z")
    (
        d.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
