"""End-to-end training-corpus assembly — the composition the individual
pipeline operators exist for:

    exact dedup -> quality filter -> hash-stratified sampling
    -> sequence packing

Each stage is the already-tested operator (``dedup.dedup_exact``'s
keep-set, ``text.quality_score``, ``text.stratified_sample``'s hash
gate, ``packing.pack_doc_frame``'s FFD buckets), chained as one lazy
plan.  Everything is deterministic (md5 gates, FFD order), so the
corpus build is reproducible bit-for-bit — the property that makes a
100 TB data recipe auditable.

Scale shape: dedup is one hash groupBy; the quality join is doc_id to
doc_id (co-partitioned); sampling is a stateless narrow filter; packing
shuffles once on the hash bucket.  No stage collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table
from gemmsql.pipeline.packing import PACK_BUCKETS, PACK_BUDGET, pack_doc_frame
from gemmsql.pipeline.text import SAMPLE_RATES, quality_score

QUALITY_FLOOR = 0.35


def corpus_survivors(
    spark: SparkSession,
    sf_dir: str,
    *,
    quality_floor: float = QUALITY_FLOOR,
) -> DataFrame:
    """The deduped, quality-floored, hash-sampled document set
    ``(doc_id, text, lang)`` — stages 1-3 of the corpus build."""
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: exact dedup — keep the min doc_id per content hash
    keep = (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    # stage 2: quality floor (doc_id-keyed join, co-partitioned)
    good = (
        quality_score(spark, sf_dir)
        .where(F.col("quality") >= quality_floor)
        .select("doc_id")
    )

    # stage 3: per-language hash-gated downsampling (stateless filter,
    # same gate as text.stratified_sample)
    gate = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in SAMPLE_RATES.items()
        ],
        F.lit(50),
    )
    return (
        docs.join(keep, "doc_id")
        .join(good, "doc_id")
        .where(gate < rate)
        .select("doc_id", "text", "lang")
    )


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    *,
    quality_floor: float = QUALITY_FLOOR,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """-> packed sequences ``(seq_id, doc_id, n_tokens, seq_tokens,
    truncated)`` over the deduped, quality-filtered, sampled corpus."""
    survivors = corpus_survivors(
        spark, sf_dir, quality_floor=quality_floor
    )
    return pack_doc_frame(survivors, budget=budget, n_buckets=n_buckets)


def build_tokenized_corpus(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_merges: int = 8,
    quality_floor: float = QUALITY_FLOOR,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """The fully tokenized corpus build -> ``(seq_id, doc_id, n_tokens,
    seq_tokens, truncated, tokens)``:

        dedup -> quality filter -> sample        (corpus_survivors)
        -> BPE tokenize                          (bpe.bpe_encode, with
           merges learned on the full corpus by bpe.bpe_learn)
        -> pack by REAL token counts             (pack_counted_frame)

    vs :func:`build_training_corpus`, sequences are budgeted in actual
    tokenizer tokens instead of the whitespace proxy — the number a
    training loop bills against.  Still deterministic end to end: the
    merge list is a pure function of the corpus, the encoder is
    rank-priority, the pack buckets are md5 gates.

    Scale note: merges are learned from the word-frequency table
    (Heaps-sublinear) and the encode is a zero-shuffle narrow map, so
    the tokenize stage adds no corpus-scale shuffle to the recipe."""
    from gemmsql.pipeline.bpe import bpe_encode, bpe_learn
    from gemmsql.pipeline.packing import pack_counted_frame

    survivors = corpus_survivors(
        spark, sf_dir, quality_floor=quality_floor
    )
    merges = bpe_learn(spark, sf_dir, n_merges=n_merges)
    toks = bpe_encode(survivors, merges)
    packed = pack_counted_frame(
        toks.select("doc_id", "n_tokens"),
        budget=budget,
        n_buckets=n_buckets,
    )
    return packed.join(toks.select("doc_id", "tokens"), "doc_id").select(
        "seq_id", "doc_id", "n_tokens", "seq_tokens", "truncated", "tokens"
    )
