"""Shared container-split machinery (VERDICT r12 next #8).

Six shard containers (ZIP, TFRecord, Ogg, Avro, tar, the media
readers) each grew the same three-stage split scaffold: an index walk
turns one sequential shard into unit-aligned byte ranges, the ranges
spread as (shard, split_idx) tasks, and each task re-runs the strict
fragment decoder.  This module is that scaffold, once:

- :func:`cut_ranges` — the greedy unit-aligned range cutter every
  planner uses (cut BEFORE a unit once the byte budget is spent and
  the cut is legal there), with the coverage check that catches an
  index that disagrees with the payload.
- :func:`split_ingest_frame` — the plan -> repartition -> decode
  pipeline for the document containers: a per-shard planner emits
  ranges (plus per-shard metadata the fragment decoder needs, e.g.
  Avro's sync marker and codec), ranges spread on
  ``(shard_id, split_idx)``, and a per-chunk decoder yields the
  canonical ``(doc_id, lang, source, text)`` records that reduce to
  the shared ``(doc_id, lang, source, n_chars, text_md5)`` gate row.

Scale shape (unchanged by the refactor — this is the SAME plan the
per-container copies produced): a 4 GiB shard at the default 4 MiB
target fans out as ~1024 unit-aligned tasks; the planner reads only
the index (header walk / sidecar / central directory), never decodes
a record, and every split re-verifies its own CRCs.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this is the ingest tier's shared spine.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

#: the document containers' shared gate-row schema
DOC_OUT_SCHEMA = (
    "doc_id long, lang string, source string, "
    "n_chars long, text_md5 string"
)


def cut_ranges(
    unit_lens: Sequence[int],
    target_split_bytes: int,
    *,
    can_cut: Sequence[bool] | None = None,
    total: int | None = None,
    base: int = 0,
) -> list[tuple[int, int]]:
    """Greedy unit-aligned cut plan: byte ranges of at least
    ``target_split_bytes`` (except the tail), cutting BEFORE unit
    ``i`` only where ``can_cut[i]`` allows (default: every unit
    boundary is legal).  ``base`` offsets the ranges (e.g. past a
    file header); ``total`` (payload length past ``base``) enables
    the index-coverage check."""
    ranges: list[tuple[int, int]] = []
    start = pos = base
    for i, ln in enumerate(unit_lens):
        if (
            pos - start >= target_split_bytes
            and (can_cut is None or can_cut[i])
        ):
            ranges.append((start, pos))
            start = pos
        pos += int(ln)
    if total is not None and pos - base != total:
        raise ValueError("index does not cover the shard")
    if start < pos:
        ranges.append((start, pos))
    return ranges



def doc_rows_frame(
    records: Iterable[tuple[int, str, str, str]],
) -> pd.DataFrame:
    """Reduce canonical ``(doc_id, lang, source, text)`` records to
    the shared gate row (text itself never leaves the decoder)."""
    ids, langs, sources, ncs, md5s = [], [], [], [], []
    for doc_id, lang, source, text in records:
        ids.append(doc_id)
        langs.append(lang)
        sources.append(source)
        ncs.append(len(text))
        md5s.append(hashlib.md5(text.encode()).hexdigest())
    return pd.DataFrame({
        "doc_id": ids, "lang": langs, "source": sources,
        "n_chars": ncs, "text_md5": md5s,
    })


def meta_doc(payload: bytes) -> tuple[int, str, str, str]:
    """Decode the JSON doc record the tar/TFRecord/Ogg gate shards
    carry as their payload framing."""
    import json

    meta = json.loads(payload)
    return meta["doc_id"], meta["lang"], meta["source"], meta["text"]


def split_ingest_frame(
    shards: DataFrame,
    plan_row: Callable[[dict, bytes], tuple[list[tuple[int, int]], dict]],
    decode_chunk: Callable[[bytes, dict], Iterable[tuple[int, str, str, str]]],
    *,
    extra_cols: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """The shared split pipeline.  ``shards`` carries ``doc_id`` (the
    shard id) and ``payload`` plus whatever index columns the planner
    wants; ``plan_row(row, payload)`` returns the byte ranges (from
    :func:`cut_ranges`) and a dict of per-shard extras matching
    ``extra_cols``; ``decode_chunk(chunk, row)`` re-runs the strict
    fragment parser and yields canonical doc records."""
    names = [n for n, _ in extra_cols]
    extra_schema = "".join(f", {n} {t}" for n, t in extra_cols)

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict[str, list] = {
                "shard_id": [], "split_idx": [], "chunk": [],
                **{n: [] for n in names},
            }
            for row in pdf.to_dict("records"):
                payload = bytes(row["payload"])
                ranges, extras = plan_row(row, payload)
                for k, (a, b) in enumerate(ranges):
                    out["shard_id"].append(row["doc_id"])
                    out["split_idx"].append(k)
                    out["chunk"].append(payload[a:b])
                    for n in names:
                        out[n].append(extras[n])
            yield pd.DataFrame(out)

    planned = shards.mapInPandas(
        plan,
        schema="shard_id long, split_idx long, chunk binary" + extra_schema,
    ).repartition(
        # explicit count: byte-light/compute-heavy spread — see the
        # media_split r17 note (AQE would coalesce to one partition)
        shards.sparkSession.sparkContext.defaultParallelism,
        "shard_id", "split_idx")

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield doc_rows_frame(
                rec
                for row in pdf.to_dict("records")
                for rec in decode_chunk(bytes(row["chunk"]), row)
            )

    return planned.mapInPandas(ingest, schema=DOC_OUT_SCHEMA)
