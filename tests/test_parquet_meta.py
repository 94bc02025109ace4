"""Parquet footer parser tier: Thrift-compact parse pinned against
pyarrow's C++ parser over identical files, framing strictness, and
stat-rendering checks.  (The third engine — DuckDB parquet_metadata()
over a Spark-written dataset — is the rotation gate
``parquet_footer_stats`` in test_rotation.py.)"""

from __future__ import annotations

import datetime
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gemmsql.pipeline.parquet_meta import (
    _Reader,
    _read_struct,
    parse_footer,
    read_footer_tail,
)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqm") / "sample.parquet")
    t = pa.table({
        "k": pa.array([5, 1, 3, 1000, -7, 2], type=pa.int64()),
        "i": pa.array([7, 2, 9, 4, 0, -1], type=pa.int32()),
        "s": ["bb", "a", "zz", "c", "m", "q"],
        "d": pa.array([
            datetime.date(1995, 3, 15), datetime.date(1993, 1, 2),
            datetime.date(1998, 12, 31), datetime.date(1994, 6, 1),
            datetime.date(1970, 1, 1), datetime.date(2024, 2, 29),
        ]),
        "f": pa.array([1.5, -2.25, 3.0, 0.5, 9.0, -1.0],
                      type=pa.float64()),
    })
    pq.write_table(t, path, row_group_size=2, compression="snappy")
    return path


def test_matches_pyarrow_parser(sample):
    """Every field we extract must agree with pyarrow's independent
    C++ Thrift implementation reading the same footer."""
    ours = read_footer_tail(sample)
    ref = pq.ParquetFile(sample).metadata
    assert ours["num_rows"] == ref.num_rows
    assert len(ours["row_groups"]) == ref.num_row_groups == 3
    assert ours["created_by"] == ref.created_by
    names = [l["path"] for l in ours["leaves"]]
    assert names == ["k", "i", "s", "d", "f"]
    for gi, rg in enumerate(ours["row_groups"]):
        rref = ref.row_group(gi)
        assert rg["num_rows"] == rref.num_rows
        assert rg["total_byte_size"] == rref.total_byte_size
        for ci, col in enumerate(rg["columns"]):
            cref = rref.column(ci)
            assert col["path"] == ".".join(cref.path_in_schema.split("."))
            assert col["type"] == cref.physical_type
            assert col["num_values"] == cref.num_values
            assert col["total_compressed_size"] == cref.total_compressed_size
            assert (
                col["total_uncompressed_size"]
                == cref.total_uncompressed_size
            )
            assert col["data_page_offset"] == cref.data_page_offset
            assert col["null_count"] == cref.statistics.null_count
            # rendering: ours is the DuckDB-style VARCHAR form
            smin, smax = cref.statistics.min, cref.statistics.max
            if isinstance(smin, datetime.date):
                assert col["min_value"] == smin.isoformat()
                assert col["max_value"] == smax.isoformat()
            else:
                assert col["min_value"] == str(smin)
                assert col["max_value"] == str(smax)


def test_nested_schema_paths(tmp_path):
    path = str(tmp_path / "nested.parquet")
    t = pa.table({
        "top": pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]),
        "plain": pa.array([10, 20], type=pa.int64()),
    })
    pq.write_table(t, path)
    ours = read_footer_tail(path)
    assert [l["path"] for l in ours["leaves"]] == [
        "top.a", "top.b", "plain"
    ]


def test_framing_strictness(sample, tmp_path):
    raw = open(sample, "rb").read()
    bad = tmp_path / "bad.parquet"
    # tail magic broken
    bad.write_bytes(raw[:-4] + b"XXXX")
    with pytest.raises(ValueError):
        read_footer_tail(str(bad))
    # head magic broken
    bad.write_bytes(b"XXXX" + raw[4:])
    with pytest.raises(ValueError):
        read_footer_tail(str(bad))
    # footer length pointing past the file
    flen = struct.unpack("<I", raw[-8:-4])[0]
    bad.write_bytes(
        raw[:-8] + struct.pack("<I", len(raw)) + b"PAR1"
    )
    with pytest.raises(ValueError):
        read_footer_tail(str(bad))
    # footer length one byte short -> unconsumed/truncated parse
    bad.write_bytes(raw[:-8] + struct.pack("<I", flen - 1) + b"PAR1")
    with pytest.raises(ValueError):
        read_footer_tail(str(bad))
    with pytest.raises(ValueError):
        read_footer_tail(__file__)  # not parquet at all


def test_thrift_reader_primitives():
    """Hand-packed compact-protocol fragments: varint, zigzag,
    field-delta and long-form field ids, list headers, skip of an
    unknown nested struct."""
    r = _Reader(bytes([0xAC, 0x02]))  # varint 300
    assert r.varint() == 300
    r = _Reader(bytes([0x03]))  # zigzag -2
    assert r.zigzag() == -2
    # struct { 1: i32 = 5; 16: i32 = 7 } — id 16 needs the long form
    buf = bytes([
        0x15, 0x0A,        # delta 1, type i32, zigzag(5)=10
        0x05, 0x20, 0x0E,  # delta 0 -> long form, zigzag(16)=32, zz(7)=14
        0x00,
    ])
    assert _read_struct(_Reader(buf)) == {1: 5, 16: 7}
    # struct { 2: list<i64> [1, -1] ; 3: struct {1: bool true} }
    buf = bytes([
        0x29, 0x26, 0x02, 0x01,  # field 2: list header (2, i64), zz 2, 1
        0x1C, 0x11, 0x00,        # field 3: struct, field 1 bool-true, stop
        0x00,
    ])
    assert _read_struct(_Reader(buf)) == {2: [1, -1], 3: {1: True}}
    # truncated struct
    with pytest.raises(ValueError):
        _read_struct(_Reader(bytes([0x15])))


def test_clustering_tightens_footer_stats(spark, tmp_path):
    """The observability payoff: write the same table plain and
    clustered, read BOTH layouts' footers back with the from-scratch
    parser, and verify the clustered files' per-file key spans are
    actually narrow — the measured version of the SCALE.md
    data-skipping claim (a predicate touching one quarter of the key
    range hits ~1 clustered file but ALL plain files)."""
    import os

    from gemmsql.datamodel import load_table
    from gemmsql.sources import write_clustered
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    plain_dir = str(tmp_path / "plain")
    clus_dir = str(tmp_path / "clustered")
    orders.repartition(4).write.parquet(plain_dir)
    write_clustered(
        orders, clus_dir, cluster_by=("o_orderkey",), n_files=4
    )

    def spans(d):
        out = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            lo = hi = None
            for rg in read_footer_tail(os.path.join(d, f))["row_groups"]:
                for c in rg["columns"]:
                    if c["path"] == "o_orderkey":
                        lo = min(lo or 1 << 62, int(c["min_value"]))
                        hi = max(hi or 0, int(c["max_value"]))
            out.append(hi - lo)
        return out

    plain, clustered = spans(plain_dir), spans(clus_dir)
    assert len(clustered) == 4
    full = max(plain)  # a round-robin file spans ~the whole key range
    assert sum(clustered) < full, (plain, clustered)
    assert max(clustered) < full / 2, (plain, clustered)


def test_unconsumed_footer_rejected(sample):
    raw = open(sample, "rb").read()
    flen = struct.unpack("<I", raw[-8:-4])[0]
    footer = raw[-8 - flen : -8]
    with pytest.raises(ValueError):
        parse_footer(footer + b"\x00")  # stray trailing byte
