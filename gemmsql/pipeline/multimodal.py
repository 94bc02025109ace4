"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (:func:`decode_image_stub` raises
``NotImplementedError``; :func:`fake_decode_features` is the
deterministic test double).  The Spark-side plumbing — schema, batch
iteration, partition-preserving maps — is real and tested; swapping the
stub for PIL/ffmpeg is a kernel-local change.

At 100 TB binary payloads dominate I/O: these maps are narrow (no
shuffle), so throughput is bounded by scan + Python/Arrow transfer;
metadata-only queries must select projected columns so Parquet never
reads the blob (column pruning — verified in tests via the scan schema).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a synthetic binary column (utf-8 text bytes standing in for
    an image payload) + media metadata columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
    )


def payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over the binary column (hash + size) — the
    query pattern for corpus stats that must NOT decode payloads."""
    b = with_binary_payload(spark, sf_dir)
    return b.select(
        "doc_id",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


PAYLOAD_META_SQL = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  sha256(text) AS sha256
FROM documents
"""


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Real decoder hook — not available in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv) not present "
        "in this environment; use fake_decode_features for tests"
    )


def fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: bytes ->
    fixed-dim float vector via digest chunks."""
    d = hashlib.sha256(payload).digest()
    raw = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    return (raw / np.float64(2**32)).astype(np.float64)


def extract_features(
    df: DataFrame, *, dim: int = 16, decoder=fake_decode_features
) -> DataFrame:
    """payload binary -> feature vector, Arrow-batched; narrow map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decoder(bytes(p), dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, features array<double>"
    )
