"""Parquet footer metadata reader — a from-scratch Thrift compact-
protocol parser for ``FileMetaData`` — plus the gated row-group-stats
query.

Why this exists at 100 TB: every data-skipping decision the engine's
write path sets up (`sources.write_clustered` / `write_zordered` sort
the data so per-file and per-row-group min/max stats become tight)
is only *auditable* by reading those stats back.  Spark's scan uses
them internally but does not expose them; this module reads the
footer directly — the same bytes every reader (Spark, DuckDB, Arrow)
consumes — so layout quality becomes a queryable table: one row per
(file, row group, column) with value counts, null counts, min/max,
and page offsets.  That is the observability half of the clustering
story: SCALE.md can *claim* tight hypercubes, this can *measure*
them.

From scratch here (public format documentation only: the Apache
Parquet format spec's ``parquet.thrift`` and the Thrift compact
protocol spec):

- **Thrift compact protocol** (:class:`_Reader` + :func:`_read_struct`):
  varints, zigzag integers, field-id deltas, short/long binary,
  list/set/map headers, bool-in-field-type encoding, nested structs,
  and — critically for forward compatibility — generic skipping of
  any field the mapping layer does not know (Spark, Arrow and DuckDB
  all append footer fields over time; a parser that chokes on unknown
  ids is broken on arrival).
- **FileMetaData mapping** (:func:`parse_footer`): version, schema
  tree (walked into dotted leaf paths), row groups, column chunks,
  column metadata, statistics (``min_value``/``max_value`` with the
  physical-type + logical-type aware rendering: INT32/INT64 little-
  endian, UTF8 byte arrays, DATE as ISO days-since-epoch).
- **Footer framing** (:func:`read_footer_tail`): ``PAR1`` magic at
  both ends, the 4-byte little-endian footer length, and the strict
  requirement that the Thrift struct consumes the footer exactly.

The file access pattern is the scale-honest one: executors ``seek``
to the tail and read ONLY ``footer_len + 8`` bytes — a metadata scan
of a 100 TB lake reads megabytes, not the lake (`rowgroup_stats`
parallelizes over files; content bytes are never shipped).

Correctness is pinned three independent ways: pyarrow's C++ Thrift
parser over the same files (``tests/test_parquet_meta.py``), DuckDB's
``parquet_metadata()`` over a Spark-written dataset (the rotation
gate ``parquet_footer_stats`` — three engines, one footer), and
structure fuzz (truncation / bad magic / bad length all raise).

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this belongs to the lakehouse-layout tier
of the brief.)
"""

from __future__ import annotations

import datetime
import os
import struct
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

# Thrift compact type ids
_STOP, _TRUE, _FALSE, _BYTE, _I16, _I32, _I64 = 0, 1, 2, 3, 4, 5, 6
_DOUBLE, _BINARY, _LIST, _SET, _MAP, _STRUCT = 7, 8, 9, 10, 11, 12

PHYSICAL_TYPES = (
    "BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
    "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY",
)
_EPOCH = datetime.date(1970, 1, 1)


class _Reader:
    """Cursor over the footer bytes."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("footer truncated")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("footer truncated")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.u8()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("varint overflow")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)


def _read_value(r: _Reader, ttype: int):
    if ttype == _TRUE:
        return True
    if ttype == _FALSE:
        return False
    if ttype == _BYTE:
        return struct.unpack("b", r.take(1))[0]
    if ttype in (_I16, _I32, _I64):
        return r.zigzag()
    if ttype == _DOUBLE:
        return struct.unpack("<d", r.take(8))[0]
    if ttype == _BINARY:
        return r.take(r.varint())
    if ttype in (_LIST, _SET):
        head = r.u8()
        n = head >> 4
        et = head & 0x0F
        if n == 15:
            n = r.varint()
        if et in (_TRUE, _FALSE):
            return [r.u8() == 1 for _ in range(n)]
        return [_read_value(r, et) for _ in range(n)]
    if ttype == _MAP:
        n = r.varint()
        if n == 0:
            return {}
        kv = r.u8()
        kt, vt = kv >> 4, kv & 0x0F
        return {_read_value(r, kt): _read_value(r, vt) for _ in range(n)}
    if ttype == _STRUCT:
        return _read_struct(r)
    raise ValueError(f"unknown thrift compact type {ttype}")


def _read_struct(r: _Reader) -> dict[int, object]:
    """Generic struct -> {field_id: value}; unknown ids are read (and
    thereby skipped) by the same value reader — forward compatible."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        head = r.u8()
        if head == _STOP:
            return fields
        delta = head >> 4
        ttype = head & 0x0F
        fid = fid + delta if delta else r.zigzag()
        fields[fid] = _read_value(r, ttype)


# -------------------------------------------------- FileMetaData mapping

def _utf8(v, default=None):
    return v.decode("utf-8") if isinstance(v, bytes) else default


def _schema_leaves(elems: list[dict]) -> list[dict]:
    """Depth-first walk of the flattened SchemaElement list (root
    first, ``num_children`` giving the tree shape) -> leaf dicts with
    dotted paths, physical type, converted type, logical type."""
    pos = 0

    def walk(prefix: list[str], is_root: bool) -> list[dict]:
        nonlocal pos
        el = elems[pos]
        pos += 1
        name = _utf8(el.get(4), "")
        n_children = el.get(5, 0) or 0
        path = prefix if is_root else prefix + [name]
        if n_children:
            out: list[dict] = []
            for _ in range(n_children):
                out.extend(walk(path, False))
            return out
        if is_root:
            raise ValueError("schema root has no children")
        logical = el.get(10) or {}
        return [{
            "path": ".".join(path),
            "type": PHYSICAL_TYPES[el[1]] if 1 in el else None,
            "converted": el.get(6),
            "is_string": el.get(6) == 0 or 1 in logical,
            "is_date": el.get(6) == 6 or 6 in logical,
        }]

    leaves = walk([], True)
    if pos != len(elems):
        raise ValueError("schema tree does not consume the element list")
    return leaves


def _render_stat(raw: bytes | None, leaf: dict) -> str | None:
    """Decode a Statistics min_value/max_value to the VARCHAR form
    DuckDB's parquet_metadata() renders (the cross-engine contract the
    gate pins)."""
    if raw is None:
        return None
    t = leaf["type"]
    if leaf["is_date"] and t == "INT32":
        days = struct.unpack("<i", raw)[0]
        return (_EPOCH + datetime.timedelta(days=days)).isoformat()
    if t == "INT32":
        return str(struct.unpack("<i", raw)[0])
    if t == "INT64":
        return str(struct.unpack("<q", raw)[0])
    if t == "BYTE_ARRAY" and leaf["is_string"]:
        return raw.decode("utf-8")
    if t == "FLOAT":
        return str(struct.unpack("<f", raw)[0])
    if t == "DOUBLE":
        return str(struct.unpack("<d", raw)[0])
    if t == "BOOLEAN":
        return "true" if raw and raw[0] else "false"
    return None  # INT96 / raw binary: no portable rendering


def parse_footer(footer: bytes) -> dict:
    """Thrift-compact ``FileMetaData`` bytes -> named dict:
    ``version num_rows created_by leaves row_groups``; each row group:
    ``num_rows total_byte_size columns``; each column: ``path type
    num_values null_count distinct_count min_value max_value
    total_compressed_size total_uncompressed_size data_page_offset
    dictionary_page_offset codec``."""
    r = _Reader(footer)
    raw = _read_struct(r)
    if r.pos != len(footer):
        raise ValueError(
            f"{len(footer) - r.pos} unconsumed footer bytes"
        )
    if 2 not in raw or 4 not in raw:
        raise ValueError("FileMetaData missing schema or row groups")
    leaves = _schema_leaves(raw[2])
    by_path = {l["path"]: l for l in leaves}
    groups = []
    total_rows = 0
    for rg in raw[4]:
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3)
            if md is None:
                raise ValueError("ColumnChunk without ColumnMetaData")
            path = ".".join(_utf8(p, "") for p in md.get(3, []))
            leaf = by_path.get(path)
            if leaf is None:
                raise ValueError(f"column {path!r} not in the schema")
            stats = md.get(12) or {}
            cols.append({
                "path": path,
                "type": PHYSICAL_TYPES[md[1]],
                "num_values": md.get(5),
                "codec": md.get(4),
                "total_uncompressed_size": md.get(6),
                "total_compressed_size": md.get(7),
                "data_page_offset": md.get(9),
                "index_page_offset": md.get(10),
                "dictionary_page_offset": md.get(11),
                "null_count": stats.get(3),
                "distinct_count": stats.get(4),
                "min_value": _render_stat(stats.get(6), leaf),
                "max_value": _render_stat(stats.get(5), leaf),
            })
        groups.append({
            "num_rows": rg.get(3),
            "total_byte_size": rg.get(2),
            "columns": cols,
        })
        total_rows += rg.get(3) or 0
    num_rows = raw.get(3)
    if num_rows is not None and num_rows != total_rows:
        raise ValueError(
            f"FileMetaData.num_rows {num_rows} != row-group sum {total_rows}"
        )
    return {
        "version": raw.get(1),
        "num_rows": num_rows,
        "created_by": _utf8(raw.get(6)),
        "leaves": leaves,
        "row_groups": groups,
    }


def read_footer_tail(path: str) -> dict:
    """Open ``path``, read ONLY the footer (seek to the tail — the
    access pattern that makes a lake-wide metadata scan read MB, not
    TB), validate both magics and the length frame, and parse."""
    with open(path, "rb") as fh:
        fh.seek(0, os.SEEK_END)
        size = fh.tell()
        if size < 12:
            raise ValueError("file too small to be parquet")
        fh.seek(-8, os.SEEK_END)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError("missing tail PAR1 magic")
        flen = struct.unpack("<I", tail[:4])[0]
        if flen + 12 > size:
            raise ValueError("footer length exceeds the file")
        fh.seek(-(8 + flen), os.SEEK_END)
        footer = fh.read(flen)
        fh.seek(0)
        if fh.read(4) != b"PAR1":
            raise ValueError("missing head PAR1 magic")
    return parse_footer(footer)


# ------------------------------------------------------------ Spark op

_STATS_SCHEMA = (
    "fname string, row_group long, rg_rows long, col string,"
    " ptype string, num_values long, null_count long,"
    " min_value string, max_value string, comp_size long,"
    " unc_size long, dict_off long, data_off long"
)


def rowgroup_stats(spark: SparkSession, directory: str) -> DataFrame:
    """Footer stats for every ``*.parquet`` under ``directory`` -> one
    row per (file, row group, leaf column).

    Scale shape: the file list is the parallel unit (a metadata-only
    driver listing, same as any scan planning); each executor seeks
    to its files' tails and reads just the footers — zero content
    bytes shipped, zero shuffle."""
    paths = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".parquet")
    )
    if not paths:
        raise ValueError(f"no parquet files under {directory}")
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(spark.sparkContext.defaultParallelism)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for p in b["path"]:
                meta = read_footer_tail(p)
                base = os.path.basename(p)
                for gi, rg in enumerate(meta["row_groups"]):
                    for c in rg["columns"]:
                        rows.append((
                            base, gi, rg["num_rows"], c["path"],
                            c["type"], c["num_values"], c["null_count"],
                            c["min_value"], c["max_value"],
                            c["total_compressed_size"],
                            c["total_uncompressed_size"],
                            c["dictionary_page_offset"],
                            c["data_page_offset"],
                        ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[
                        f.split()[0] for f in _STATS_SCHEMA.split(",")
                    ],
                )

    return pdf.mapInPandas(parse, schema=_STATS_SCHEMA)


# ---------------------------------------------------- gated corpus query

def _staged_dir(sf_dir: str) -> str:
    # Stable inputs ONLY (leaf + full-path hash, no pid): the oracle SQL
    # embeds this path, and the driver may build the SQL in a different
    # process than the one that staged the files (ADVICE r9 #5).  The
    # staged bytes are deterministic per sf_dir, so cross-process reuse
    # is sound; publication is made atomic in stage_footer_corpus.
    from gemmsql.pipeline.staging import staged_dir_tag

    return os.path.join(
        tempfile.gettempdir(), f"gemmsql_pqmeta_{staged_dir_tag(sf_dir)}"
    )


_PQMETA_STAGED: set[str] = set()


def stage_footer_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Write the deterministic 4-file dataset the footer gate reads:
    lineitem's (orderkey, linenumber, returnflag, shipdate-as-DATE),
    hash-repartitioned to 4 files and sorted within each so bytes —
    and therefore footers — are run-to-run identical.  Written to a
    pid-private temp dir and renamed into the stable path so a
    concurrent stager can never expose a half-written directory."""
    target = _staged_dir(sf_dir)
    done = os.path.join(target, "_SUCCESS")
    if os.path.exists(done):
        _PQMETA_STAGED.add(target)
        return target
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )
    tmp = f"{target}.tmp{os.getpid()}"
    (
        li.repartition(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(tmp)
    )
    try:
        os.rename(tmp, target)
    except OSError:
        # another process published the identical bytes first
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    _PQMETA_STAGED.add(target)
    return target


def parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-engine footer gate: Spark writes the corpus, the
    from-scratch Thrift parser reads the stats back, and the DuckDB
    twin (:func:`parquet_footer_stats_sql`) reads the SAME files with
    its native ``parquet_metadata()`` — row counts, value counts,
    null counts, min/max renderings, sizes and page offsets must all
    hash-match.  INT64, INT32, UTF8 and DATE stat renderings are each
    load-bearing."""
    return rowgroup_stats(spark, stage_footer_corpus(spark, sf_dir))


def _layout_dirs(sf_dir: str) -> tuple[str, str]:
    from gemmsql.pipeline.staging import staged_dir_tag

    tag = staged_dir_tag(sf_dir)
    return (
        os.path.join(tempfile.gettempdir(), f"gemmsql_layout_c_{tag}"),
        os.path.join(tempfile.gettempdir(), f"gemmsql_layout_p_{tag}"),
    )


def stage_layout_corpora(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the SAME lineitem projection twice — once through
    :func:`gemmsql.sources.write_clustered` (range-split + sorted on
    ``l_orderkey``) and once hash-partitioned with no sort — so the
    layout audit has a layout that SHOULD pass and one that should
    not.  Atomic publication as in :func:`stage_footer_corpus`."""
    from gemmsql.sources import write_clustered

    c_dir, p_dir = _layout_dirs(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )
    for target, kind in ((c_dir, "clustered"), (p_dir, "plain")):
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            continue
        tmp = f"{target}.tmp{os.getpid()}"
        if kind == "clustered":
            write_clustered(li, tmp, cluster_by=("l_orderkey",), n_files=4)
        else:
            (
                li.repartition(4, "l_orderkey")
                .write.mode("overwrite")
                .parquet(tmp)
            )
        try:
            os.rename(tmp, target)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return c_dir, p_dir


#: audited leaf columns -> SQL snippet turning the rendered stat
#: string into an orderable BIGINT (dates become days since epoch)
_AUDIT_COLS = {
    "l_orderkey": "CAST({v} AS BIGINT)",
    "l_linenumber": "CAST({v} AS BIGINT)",
    "l_shipdate": "CAST(CAST({v} AS DATE) - DATE '1970-01-01' AS BIGINT)",
}


def layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-layout quality audit a 100 TB lake runs (VERDICT r10
    next #5): write a clustered and an unclustered copy of the same
    data, read the row-group min/max statistics back with the
    from-scratch Thrift footer parser, and judge per (layout, column)
    whether the row-group key ranges are pairwise DISJOINT — the
    property that makes parquet stats-based skipping effective.

    One row per (layout, col): ``n_groups``, ``n_overlaps`` (count of
    consecutive range pairs, ordered by min, where the previous max
    reaches into the next min), ``clustered`` (the verdict:
    overlaps == 0), and the global min/max.  The verdict is
    hash-load-bearing BOTH ways: the range-sorted write must audit
    clustered on its cluster key and NOT clustered on the others; the
    hash-partitioned write must fail on every column.  Oracle: DuckDB
    ``parquet_metadata()`` over the SAME files with the identical
    window aggregation.

    Scale shape: the audit reads footers only (``rowgroup_stats`` —
    tail seeks, zero content bytes), and the overlap window runs over
    one row per (file, row group, column) — metadata volume, ~1e-6 of
    the data it audits."""
    from pyspark.sql import Window as W

    c_dir, p_dir = stage_layout_corpora(spark, sf_dir)
    stats = rowgroup_stats(spark, c_dir).withColumn(
        "layout", F.lit("clustered")
    ).unionByName(
        rowgroup_stats(spark, p_dir).withColumn("layout", F.lit("plain"))
    )
    typed = stats.where(
        F.col("col").isin(*_AUDIT_COLS)
    ).select(
        "layout",
        "col",
        "fname",
        "row_group",
        "min_value",
        "max_value",
        F.when(
            F.col("col") == "l_shipdate",
            F.datediff(F.to_date("min_value"), F.lit("1970-01-01").cast("date")),
        ).otherwise(F.col("min_value").cast("long")).alias("lo"),
        F.when(
            F.col("col") == "l_shipdate",
            F.datediff(F.to_date("max_value"), F.lit("1970-01-01").cast("date")),
        ).otherwise(F.col("max_value").cast("long")).alias("hi"),
    )
    w = W.partitionBy("layout", "col").orderBy(
        "lo", "hi", "fname", "row_group"
    )
    flagged = typed.withColumn("prev_hi", F.lag("hi").over(w))
    out = flagged.groupBy("layout", "col").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(
            F.when(F.col("prev_hi") >= F.col("lo"), 1).otherwise(0)
        ).cast("long").alias("n_overlaps"),
        F.min("lo").cast("long").alias("min_key"),
        F.max("hi").cast("long").alias("max_key"),
    ).select(
        "layout",
        "col",
        "n_groups",
        "n_overlaps",
        (F.col("n_overlaps") == 0).cast("long").alias("clustered"),
        "min_key",
        "max_key",
    )
    return out


def _zorder_dirs(sf_dir: str) -> tuple[str, str, str]:
    from gemmsql.pipeline.staging import staged_dir_tag

    tag = staged_dir_tag(sf_dir)
    return tuple(
        os.path.join(tempfile.gettempdir(), f"gemmsql_zorder_{k}_{tag}")
        for k in ("z", "c", "p")
    )


def stage_zorder_corpora(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Write the SAME 2-D lineitem projection three ways — Z-ordered
    on (l_orderkey, l_partkey), range-clustered on l_orderkey alone,
    and hash-partitioned unsorted — the three layouts whose stat
    tightness the z-order story claims to rank."""
    from gemmsql.sources import write_clustered, write_zordered

    z_dir, c_dir, p_dir = _zorder_dirs(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    for target, kind in ((z_dir, "z"), (c_dir, "c"), (p_dir, "p")):
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            continue
        tmp = f"{target}.tmp{os.getpid()}"
        if kind == "z":
            write_zordered(
                li, tmp, zorder_by=("l_orderkey", "l_partkey"), n_files=4
            )
        elif kind == "c":
            write_clustered(li, tmp, cluster_by=("l_orderkey",), n_files=4)
        else:
            li.repartition(4, "l_orderkey").write.mode("overwrite").parquet(
                tmp
            )
        # publish atomically; a losing concurrent stager discards its copy
        try:
            os.rename(tmp, target)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return z_dir, c_dir, p_dir


#: round-half-up(1e6 * sum_width / (n * span)) in EXACT integer
#: arithmetic — the cross-engine tightness quantizer (all inputs
#: positive BIGINTs, so one expression serves Spark and DuckDB)
_TIGHT_INT = (
    "(2 * 1000000 * {sw} + {n} * {span}) {div} (2 * {n} * {span})"
)


def zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional layout audit (the measurement behind
    SCALE.md's z-order claim): per (layout, column), the average
    row-group stat width as a fraction of the column's global span,
    quantized to micro units -> ``(layout, col, n_groups, span,
    sum_width, tightness)``.

    What the numbers must show — and the hash therefore pins:
    Z-ordering makes EVERY interleaved dimension's row-group ranges
    narrow at once (each file covers a hypercube: ~span/2 per dim at
    4 files), single-key clustering makes only its own key narrow
    (~span/4) while the other dimension stays full-width, and the
    hash-partitioned write stays full-width everywhere.  Tightness is
    computed in exact integer arithmetic so Spark and the DuckDB
    ``parquet_metadata()`` twin agree bit-for-bit.

    Scale shape: identical to :func:`layout_audit` — footers only."""
    z_dir, c_dir, p_dir = stage_zorder_corpora(spark, sf_dir)
    stats = None
    for layout, d in (("zorder", z_dir), ("clustered", c_dir),
                      ("plain", p_dir)):
        s = rowgroup_stats(spark, d).withColumn("layout", F.lit(layout))
        stats = s if stats is None else stats.unionByName(s)
    typed = stats.where(
        F.col("col").isin("l_orderkey", "l_partkey")
    ).select(
        "layout",
        "col",
        F.col("min_value").cast("long").alias("lo"),
        F.col("max_value").cast("long").alias("hi"),
    )
    agg = typed.groupBy("layout", "col").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (F.max("hi") - F.min("lo")).cast("long").alias("span"),
        F.sum(F.col("hi") - F.col("lo")).cast("long").alias("sum_width"),
    )
    tight = _TIGHT_INT.format(
        sw="sum_width", n="n_groups", span="span", div="div"
    )
    return agg.select(
        "layout",
        "col",
        "n_groups",
        "span",
        "sum_width",
        F.expr(tight).cast("long").alias("tightness"),
    )


def zorder_audit_sql(sf_dir: str) -> str:
    """DuckDB twin: native ``parquet_metadata()`` over the same three
    staged layouts, identical integer tightness."""
    z_dir, c_dir, p_dir = _zorder_dirs(sf_dir)
    branches = " UNION ALL ".join(
        f"""
SELECT '{layout}' AS layout, path_in_schema AS col,
       CAST(stats_min_value AS BIGINT) AS lo,
       CAST(stats_max_value AS BIGINT) AS hi
FROM parquet_metadata('{d}/*.parquet')
WHERE path_in_schema IN ('l_orderkey', 'l_partkey')"""
        for layout, d in (
            ("zorder", z_dir), ("clustered", c_dir), ("plain", p_dir)
        )
    )
    tight = _TIGHT_INT.format(
        sw="SUM(hi - lo)", n="COUNT(*)",
        span="(MAX(hi) - MIN(lo))", div="//",
    )
    return f"""
WITH typed AS ({branches})
SELECT layout, col,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MAX(hi) - MIN(lo) AS BIGINT) AS span,
       CAST(SUM(hi - lo) AS BIGINT) AS sum_width,
       CAST({tight} AS BIGINT) AS tightness
FROM typed GROUP BY layout, col
"""


def _compaction_dirs(sf_dir: str) -> tuple[str, str]:
    from gemmsql.pipeline.staging import staged_dir_tag

    tag = staged_dir_tag(sf_dir)
    return (
        os.path.join(tempfile.gettempdir(), f"gemmsql_compact_src_{tag}"),
        os.path.join(tempfile.gettempdir(), f"gemmsql_compact_dst_{tag}"),
    )


#: compaction gate's output-file sizing — small so the staged fixture
#: compacts to SEVERAL files (>= 2 keeps the tightness metric
#: meaningful: one file would trivially span the full domain)
_COMPACT_TARGET_BYTES = 24 * 1024


def stage_compaction_corpora(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Stage the small-files problem and its fix: a 64-file
    hash-partitioned write of (l_orderkey, l_linenumber), then
    :func:`gemmsql.sources.compact_parquet` over it (compact AND
    re-cluster on l_orderkey, output count sized from actual source
    bytes)."""
    from gemmsql.sources import compact_parquet

    src, dst = _compaction_dirs(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        tmp = f"{src}.tmp{os.getpid()}"
        li.repartition(64, "l_orderkey").write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, src)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        tmp = f"{dst}.tmp{os.getpid()}"
        compact_parquet(
            spark, src, tmp,
            cluster_by=("l_orderkey",),
            target_file_bytes=_COMPACT_TARGET_BYTES,
        )
        try:
            os.rename(tmp, dst)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return src, dst


def compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after audit of :func:`gemmsql.sources.compact_parquet`
    -> one row per phase: ``(phase, n_files, n_groups, n_rows,
    tightness, checksum)``.

    The hash pins the three properties compaction must deliver
    together: the file count COLLAPSES (64 tiny files -> a handful
    sized from actual bytes), the cluster key's stat tightness is
    RESTORED (the quantized width ratio drops from ~full-span to
    ~span/n), and the DATA IS UNTOUCHED — ``checksum`` is computed
    from the table contents of each directory (not its metadata), so
    a rewrite that loses or duplicates any row cannot hash-match.
    Metadata comes from the from-scratch footer parser; the DuckDB
    twin re-derives every number from the same files
    (``parquet_metadata()`` + a direct data scan)."""
    src, dst = stage_compaction_corpora(spark, sf_dir)
    out = None
    for phase, d in (("before", src), ("after", dst)):
        meta = rowgroup_stats(spark, d).where(
            F.col("col") == "l_orderkey"
        ).agg(
            F.countDistinct("fname").cast("long").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("rg_rows").cast("long").alias("n_rows"),
            (
                F.max(F.col("max_value").cast("long"))
                - F.min(F.col("min_value").cast("long"))
            ).cast("long").alias("span"),
            F.sum(
                F.col("max_value").cast("long")
                - F.col("min_value").cast("long")
            ).cast("long").alias("sum_width"),
        )
        data = spark.read.parquet(d).agg(
            F.sum(
                F.col("l_orderkey") * 31 + F.col("l_linenumber")
            ).cast("long").alias("checksum")
        )
        one = meta.crossJoin(data).select(
            F.lit(phase).alias("phase"),
            "n_files",
            "n_groups",
            "n_rows",
            F.expr(_TIGHT_INT.format(
                sw="sum_width", n="n_groups", span="span", div="div"
            )).cast("long").alias("tightness"),
            "checksum",
        )
        out = one if out is None else out.unionByName(one)
    return out


def compaction_audit_sql(sf_dir: str) -> str:
    """DuckDB twin over the same staged directories."""
    src, dst = _compaction_dirs(sf_dir)
    tight = _TIGHT_INT.format(
        sw="SUM(hi - lo)", n="COUNT(*)",
        span="(MAX(hi) - MIN(lo))", div="//",
    )
    branches = " UNION ALL ".join(
        f"""
SELECT '{phase}' AS phase,
       CAST(COUNT(DISTINCT file_name) AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(row_group_num_rows) AS BIGINT) AS n_rows,
       CAST({tight} AS BIGINT) AS tightness,
       (SELECT CAST(SUM(l_orderkey * 31 + l_linenumber) AS BIGINT)
        FROM '{d}/*.parquet') AS checksum
FROM (SELECT file_name, row_group_num_rows,
             CAST(stats_min_value AS BIGINT) AS lo,
             CAST(stats_max_value AS BIGINT) AS hi
      FROM parquet_metadata('{d}/*.parquet')
      WHERE path_in_schema = 'l_orderkey')"""
        for phase, d in (("before", src), ("after", dst))
    )
    return branches


def layout_audit_sql(sf_dir: str) -> str:
    """DuckDB twin over the same staged layouts: native
    ``parquet_metadata()`` + the identical overlap window."""
    c_dir, p_dir = _layout_dirs(sf_dir)
    branches = []
    for layout, d in (("clustered", c_dir), ("plain", p_dir)):
        for col, cast in _AUDIT_COLS.items():
            lo = cast.format(v="stats_min_value")
            hi = cast.format(v="stats_max_value")
            branches.append(f"""
SELECT '{layout}' AS layout, path_in_schema AS col,
       regexp_extract(file_name, '[^/]+$') AS fname,
       CAST(row_group_id AS BIGINT) AS row_group,
       {lo} AS lo, {hi} AS hi
FROM parquet_metadata('{d}/*.parquet')
WHERE path_in_schema = '{col}'""")
    union = " UNION ALL ".join(branches)
    return f"""
WITH typed AS ({union}),
flagged AS (
  SELECT layout, col, lo, hi,
         LAG(hi) OVER (PARTITION BY layout, col
                       ORDER BY lo, hi, fname, row_group) AS prev_hi
  FROM typed
)
SELECT layout, col,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN prev_hi >= lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlaps,
       CAST(CASE WHEN SUM(CASE WHEN prev_hi >= lo THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS clustered,
       CAST(MIN(lo) AS BIGINT) AS min_key,
       CAST(MAX(hi) AS BIGINT) AS max_key
FROM flagged GROUP BY layout, col
"""


def parquet_footer_stats_sql(sf_dir: str) -> str:
    """DuckDB twin over the same staged directory (the rotation
    harness runs the Spark side first, which stages it)."""
    return f"""
SELECT regexp_extract(file_name, '[^/]+$') AS fname,
       CAST(row_group_id AS BIGINT) AS row_group,
       CAST(row_group_num_rows AS BIGINT) AS rg_rows,
       path_in_schema AS col,
       type AS ptype,
       CAST(num_values AS BIGINT) AS num_values,
       CAST(stats_null_count AS BIGINT) AS null_count,
       stats_min_value AS min_value,
       stats_max_value AS max_value,
       CAST(total_compressed_size AS BIGINT) AS comp_size,
       CAST(total_uncompressed_size AS BIGINT) AS unc_size,
       CAST(dictionary_page_offset AS BIGINT) AS dict_off,
       CAST(data_page_offset AS BIGINT) AS data_off
FROM parquet_metadata('{_staged_dir(sf_dir)}/*.parquet')
"""
