"""Perceptual image near-duplicates — dHash + banded Hamming LSH.

The multimodal half of the dedup story: text near-dup rides
MinHash/SimHash/embedding-cosine (`dedup.py`, `similarity.py`); image
near-dup in production corpus pipelines (the LAION-style dedup pass)
rides a tiny PERCEPTUAL hash — here the difference hash (public
technique): nearest-neighbor resize to 9x8, integer luma, compare
horizontally adjacent samples -> 64 bits.  A re-encode, tiny crop, or
single-pixel change moves at most a couple of bits, so near-dups are
pairs within a small Hamming radius.

Scale shape — the SimHash/LSH discipline, never all-pairs: the 64
bits split into 4 x 16-bit BANDS; by pigeonhole, any pair within
Hamming radius 3 of each other shares at least one exact band (and
the gate's planted pairs differ by <= 2 bits, so banding is a
complete candidate generator for them); candidates come from a
band-equality equi-join (shuffle keyed on (band_idx, band_val)), and
only candidates pay the exact 64-bit Hamming check (4 x
``bit_count(xor)``).  At 10^9 images that is a hash-partitioned join
on 4B tiny rows, not a 10^18-pair product — and a band bucket hotter
than ``MAX_BAND_DF`` (constant-color letterboxing collapses many
images to identical bands) is dropped from candidate generation
before the join, so no single bucket can go quadratic.

Gate (`image_near_dups`): the REAL decode path — the staged QOI
corpus through :func:`decode_qoi` — hashed per image; every 17th doc
also contributes a PLANTED variant (one sampled pixel bumped +80 mod
256, which can flip at most the two comparison bits that touch it),
so the output pairs are (original, variant) at Hamming <= 2.  The
DuckDB twin re-derives every sampled pixel from the md5 delta chain
(the qoi twin's windowed-cumsum reconstruction), recomputes the same
bits, bands, join, and distances — so the resize index map, luma
weights, bit packing, banding, and radius are all hash-load-bearing.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's dedup tier to the
image modality.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.pipeline.multimodal import (
    _MD5_LEN,
    PPM_H_BASE,
    PPM_H_MOD,
    PPM_W,
)

#: dHash grid: 9 sample columns x 8 sample rows -> 8x8 comparisons
_GX, _GY = 9, 8
#: planted-variant knobs: every 17th doc, bump the (x=4, y=3) sample
_VARIANT_MOD = 17
_BUMP_X, _BUMP_Y, _BUMP = 4, 3, 80
#: near-dup radius (the planted pairs sit at <= 2).  3 is the exact
#: completeness radius of the 4 x 16-bit banding: pigeonhole
#: guarantees a shared band only for pairs differing in <= 3 bits, so
#: a larger radius would silently miss pairs with one differing bit
#: per band (ADVICE r13 #2 — was 4, a best-effort tail the docstring
#: contradicted)
MAX_HAMMING = 3
#: hot-band cap (the `max_df` discipline from dedup.py): a
#: (band_idx, band_val) bucket seen in more than this many images is
#: excluded from candidate generation — a production corpus is full
#: of constant-color regions (letterboxing, white product shots)
#: whose identical bands would otherwise go quadratic in one bucket.
#: Pairs that ONLY share hot bands are dropped (the standard LSH
#: recall trade, exactly like text max_df); the fixture corpora sit
#: far below the cap, so gate hashes are unaffected
MAX_BAND_DF = 64


def dhash_bits(img: np.ndarray) -> np.ndarray:
    """(8, 8) 0/1 bits: integer-luma difference hash of an (h, w, 3)
    uint8 image — nearest-neighbor 9x8 sample, luma =
    ``(299 r + 587 g + 114 b) div 1000``, bit = right sample brighter."""
    h, w, _ = img.shape
    xs = [x * w // _GX for x in range(_GX)]
    ys = [y * h // _GY for y in range(_GY)]
    px = img[np.ix_(ys, xs)].astype(np.int64)          # (8, 9, 3)
    luma = (
        299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    ) // 1000
    return (luma[:, 1:] > luma[:, :-1]).astype(np.int64)


def dhash_bands(img: np.ndarray) -> list[int]:
    """Four 16-bit band values (bit k = y*8+x, MSB-first per band)."""
    bits = dhash_bits(img).reshape(-1)                  # k = y*8 + x
    bands = []
    for b in range(4):
        v = 0
        for j in range(16):
            v = (v << 1) | int(bits[b * 16 + j])
        bands.append(v)
    return bands


def _bands_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form band rows (id, band_idx, band_val) carrying the FULL
    hash (h0..h3) alongside, so the pair join resolves Hamming
    distances inline without a second join back to the hash frame."""
    from gemmsql.pipeline.qoi import decode_qoi, with_qoi_payload
    from gemmsql.pipeline.staging import stage_payload_table

    corpus = stage_payload_table(spark, sf_dir, "qoi", with_qoi_payload)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict[str, list] = {
                "id": [], "band_idx": [], "band_val": [],
                "h0": [], "h1": [], "h2": [], "h3": [],
            }

            def emit(image_id: int, img: np.ndarray) -> None:
                hs = dhash_bands(img)
                for i, v in enumerate(hs):
                    out["id"].append(image_id)
                    out["band_idx"].append(i)
                    out["band_val"].append(v)
                    for j in range(4):
                        out[f"h{j}"].append(hs[j])

            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_qoi(bytes(p))
                emit(int(doc_id) * 2, img)
                if int(doc_id) % _VARIANT_MOD == 0:
                    h, w, _ = img.shape
                    var = img.copy()
                    sy = _BUMP_Y * h // _GY
                    sx = _BUMP_X * w // _GX
                    var[sy, sx] = var[sy, sx] + np.uint8(_BUMP)  # mod 256
                    emit(int(doc_id) * 2 + 1, var)
            yield pd.DataFrame(out)

    return corpus.mapInPandas(
        hash_batch,
        schema=(
            "id long, band_idx int, band_val long, "
            "h0 long, h1 long, h2 long, h3 long"
        ),
    )


def near_dup_pairs(bands: DataFrame) -> DataFrame:
    """The band-join LSH plan over a long-form band frame
    (id, band_idx, band_val, h0..h3): hot-band skew guard, band
    equi-join, inline exact Hamming.  Factored out of
    :func:`image_near_dups` so the cap's behavior is testable on a
    synthetic skew fixture without staging a corpus."""
    from pyspark.sql import Window

    # hot-band skew guard: attach each band bucket's document
    # frequency via a window keyed on the SAME columns the self-join
    # shuffles on (no driver-side hot list — at 10^9 images the hot
    # set itself is unbounded), and drop over-cap buckets from
    # candidate generation
    cold = bands.withColumn(
        "_df",
        F.count("*").over(Window.partitionBy("band_idx", "band_val")),
    ).filter(F.col("_df") <= MAX_BAND_DF).drop("_df")
    a, b = cold.alias("a"), cold.alias("b")
    dist = sum(
        F.bit_count(
            F.col(f"a.h{j}").bitwiseXOR(F.col(f"b.h{j}"))
        )
        for j in range(4)
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= MAX_HAMMING)
    )


def image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, hamming): near-duplicate image pairs within
    ``MAX_HAMMING`` of each other, via the band-join LSH plan.  Image
    id = doc_id * 2 (+1 for the planted variant).  The hash frame is
    STAGED once per sf tier (it is ~5 tiny rows per image), so the
    pair self-join scans parquet twice instead of decoding every
    image once per plan reference."""
    from gemmsql.pipeline.staging import stage_payload_table

    bands = stage_payload_table(spark, sf_dir, "dhash_bands", _bands_builder)
    return near_dup_pairs(bands)


_H_EXPR = f"{PPM_H_BASE} + doc_id % {PPM_H_MOD}"

IMAGE_NEAR_DUPS_SQL = f"""
WITH d AS (SELECT doc_id, {_H_EXPR} AS h FROM documents),
raw AS (
  SELECT d.doc_id, s.i % 3 AS channel, s.i // 3 AS px,
         CASE WHEN CAST('0x' || substr(
           md5('qi:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.i // {_MD5_LEN} AS VARCHAR)),
           2 * (s.i % {_MD5_LEN}) + 1, 2) AS BIGINT) = 255 THEN 101
         ELSE CAST('0x' || substr(
           md5('qi:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.i // {_MD5_LEN} AS VARCHAR)),
           2 * (s.i % {_MD5_LEN}) + 1, 2) AS BIGINT) % 4 - 1
         END AS delta
  FROM d JOIN generate_series(0,
         {PPM_W * 3 * (PPM_H_BASE + PPM_H_MOD - 1) - 1}) s(i)
    ON s.i < {PPM_W} * 3 * d.h
),
pxv AS (
  SELECT doc_id, channel, px,
         ((SUM(delta) OVER (PARTITION BY doc_id, channel
                            ORDER BY px) % 256) + 256) % 256 AS v
  FROM raw
),
ids AS (
  SELECT doc_id, h, doc_id * 2 AS id, 0 AS is_v FROM d
  UNION ALL
  SELECT doc_id, h, doc_id * 2 + 1, 1 FROM d
  WHERE doc_id % {_VARIANT_MOD} = 0
),
coords AS (
  SELECT i.doc_id, i.h, i.id, i.is_v, gx.x, gy.y,
         (gy.y * i.h // {_GY}) * {PPM_W} + (gx.x * {PPM_W} // {_GX}) AS p
  FROM ids i, generate_series(0, {_GX - 1}) gx(x),
       generate_series(0, {_GY - 1}) gy(y)
),
samp AS (
  SELECT c.id, c.x, c.y, pxv.channel,
         (CASE WHEN c.is_v = 1
                AND c.p = ({_BUMP_Y} * c.h // {_GY}) * {PPM_W}
                          + ({_BUMP_X} * {PPM_W} // {_GX})
               THEN pxv.v + {_BUMP} ELSE pxv.v END) % 256 AS v
  FROM coords c
  JOIN pxv ON pxv.doc_id = c.doc_id AND pxv.px = c.p
),
luma AS (
  SELECT id, x, y,
         (299 * MAX(CASE WHEN channel = 0 THEN v END)
        + 587 * MAX(CASE WHEN channel = 1 THEN v END)
        + 114 * MAX(CASE WHEN channel = 2 THEN v END)) // 1000 AS l
  FROM samp GROUP BY id, x, y
),
bits AS (
  SELECT a.id, a.y, a.x, CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
  FROM luma a
  JOIN luma b ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < {_GX - 1}
),
bands AS (
  SELECT id, (y * 8 + x) // 16 AS band_idx,
         CAST(SUM(bit << (15 - (y * 8 + x) % 16)) AS BIGINT) AS band_val
  FROM bits GROUP BY 1, 2
),
cold AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS df
    FROM bands)
  WHERE df <= {MAX_BAND_DF}
),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM cold a
  JOIN cold b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(SUM(bit_count(xor(ha.band_val, hb.band_val))) AS BIGINT)
         AS hamming
FROM cand c
JOIN bands ha ON ha.id = c.id_a
JOIN bands hb ON hb.id = c.id_b AND hb.band_idx = ha.band_idx
GROUP BY 1, 2
HAVING CAST(SUM(bit_count(xor(ha.band_val, hb.band_val))) AS BIGINT)
       <= {MAX_HAMMING}
"""
