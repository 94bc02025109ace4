"""Sequence packing — assembling documents into fixed-budget training
sequences (the last batch-side step of an LLM data pipeline).

``pack_sequences`` groups documents into sequences whose total token
count stays within ``budget``, via first-fit-decreasing INSIDE
deterministic hash buckets:

- every doc goes to bucket ``h60(doc_id) % n_buckets`` — a stateless
  narrow map, so the layout is reproducible across runs, retries, and
  cluster sizes (the same hash-gate argument as
  ``text.stratified_sample``);
- packing runs per bucket in one ``applyInPandas`` group, FFD order
  (n_tokens desc, doc_id asc) — deterministic and within 11/9·OPT + 1
  of optimal bin count (classic FFD bound);
- sequence ids are ``bucket << 32 | local_seq`` — globally unique with
  no coordination.

At 100 TB: buckets are the parallelism unit (pick n_buckets ~ cores ·
4); each bucket holds ~corpus/n_buckets docs and packs in memory.  No
global sort, no driver collect; the only shuffle is the bucket
groupBy.  Docs longer than the budget are emitted as single-doc
sequences flagged ``truncated`` (the caller decides whether to split —
splitting changes token counts, which is tokenizer policy, not engine
policy).

Packing quality and integrity invariants (every doc exactly once; no
sequence over budget except flagged singletons; utilization floor;
bit-identical layout across reruns) are pinned in
tests/test_pipeline.py — FFD itself is not SQL-expressible, so like
the other iterative/greedy ops this is pytest-verified rather than
DuckDB-twinned.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

PACK_BUDGET = 512       # tokens per training sequence
PACK_BUCKETS = 64       # deterministic parallelism unit


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    *,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """-> ``(seq_id, doc_id, n_tokens, seq_tokens, truncated)``: one row
    per packed document; ``seq_tokens`` is its sequence's total."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_doc_frame(docs, budget=budget, n_buckets=n_buckets)


def pack_doc_frame(
    docs: DataFrame,
    *,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Frame-level packing API: any ``(doc_id, text, ...)`` DataFrame
    (e.g. the survivor set of a dedup/quality/sampling chain —
    ``corpus.build_training_corpus``) -> packed sequences, with
    whitespace token counts."""
    n_tokens = (
        F.length("text")
        - F.length(F.regexp_replace("text", " ", ""))
        + F.lit(1)
    ).cast("long")
    return pack_counted_frame(
        docs.select("doc_id", n_tokens.alias("n_tokens")),
        budget=budget,
        n_buckets=n_buckets,
    )


def pack_counted_frame(
    counted: DataFrame,
    *,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Core packing kernel over precomputed counts ``(doc_id,
    n_tokens)`` — lets callers pack by REAL tokenizer counts
    (``corpus.build_tokenized_corpus``) instead of the whitespace
    proxy.  FFD inside md5 hash buckets, deterministic, no global
    sort, no driver collect."""
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )
    keyed = counted.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        seq_of = []
        fills: list[int] = []      # fills[s] = tokens already in seq s
        for t in pdf["n_tokens"]:
            t = int(t)
            placed = -1
            for s, f in enumerate(fills):      # first fit
                if f + t <= budget:
                    placed = s
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += t
            seq_of.append(placed)
        out = pdf.assign(
            seq_id=[(b << 32) | s for s in seq_of],
            seq_tokens=[fills[s] for s in seq_of],
        )
        out["truncated"] = out["n_tokens"] > budget
        return out[["seq_id", "doc_id", "n_tokens", "seq_tokens", "truncated"]]

    return keyed.groupBy("bucket").applyInPandas(
        pack,
        "seq_id long, doc_id long, n_tokens long, seq_tokens long, "
        "truncated boolean",
    )
