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


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Real resize hook — needs a codec library, absent here."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; use fake_resize for tests"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: re-digest the payload to a
    pseudo-bitmap of exactly width*height bytes (correct output SIZE
    contract without a codec)."""
    d = hashlib.sha256(payload).digest()
    need = width * height
    return (d * (need // len(d) + 1))[:need]


def resize_images(
    df: DataFrame, *, width: int = 8, height: int = 8, resizer=fake_resize
) -> DataFrame:
    """payload -> resized payload + output dims.  Narrow Arrow-batched
    map; at 100 TB the input column stays in the scan's Arrow batches
    end-to-end (never collected, never shuffled)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = [resizer(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, resized binary, width int, height int"
    )


def sample_frames(
    df: DataFrame, *, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Treat the payload as a fake video: cut ``n_frames`` evenly-spaced
    fixed-size byte windows ("frames") and EXPLODE to one row per
    frame — the schema/fan-out shape of real video frame sampling
    (ffmpeg would replace the slicer, nothing else changes).

    Output rows = n_frames x input rows; the explode happens inside the
    same narrow map, so no shuffle is introduced."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if len(b) < frame_bytes:
                    b = b + b"\0" * (frame_bytes - len(b))
                span = max(len(b) - frame_bytes, 0)
                for f in range(n_frames):
                    off = (span * f) // max(n_frames - 1, 1)
                    ids.append(doc_id)
                    fidx.append(f)
                    frames.append(b[off : off + frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "frame": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, frame binary"
    )
