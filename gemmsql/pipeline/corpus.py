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


# ---- corpus snapshot diff (round 5 north-star widening) --------------
#
# Dataset versioning: every managed training corpus needs "what changed
# between snapshot v1 and v2" — additions, removals, and in-place
# edits — both for audit and for incremental reprocessing (only the
# added/changed set re-enters the pipeline).  Content identity is
# md5(text), so a renamed/moved doc with identical bytes is `changed`
# only if the text changed.  The v2 snapshot here is DERIVED from v1
# by deterministic md5 rules (drop h%7=0, clone-with-offset h%13=5,
# append an edit marker to h%11=0) so the op runs corpus-scale with a
# full DuckDB twin; diffing two real directories is the same
# full-outer join.

DIFF_CLONE_OFFSET = 20_000_000


def _h60_str(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def corpus_v2(docs: DataFrame) -> DataFrame:
    """The derived second snapshot: drops, edits, and additions."""
    h = _h60_str(F.col("doc_id").cast("string"))
    kept = docs.where(F.pmod(h, F.lit(7)) != 0)
    edited = kept.select(
        "doc_id",
        F.when(
            F.pmod(h, F.lit(11)) == 0, F.concat(F.col("text"), F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.where(F.pmod(h, F.lit(13)) == 5).select(
        (F.col("doc_id") + DIFF_CLONE_OFFSET).alias("doc_id"), "text"
    )
    return edited.unionByName(added)


def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-> ``(doc_id, change)`` with change in {added, removed, changed}
    between corpus v1 (the documents table) and the derived v2.

    One full-outer join on doc_id comparing content hashes — a single
    co-partitioned shuffle; unchanged docs (the overwhelming bulk at
    100 TB) are filtered before anything else touches them."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h1"))
    v2 = corpus_v2(docs.select("doc_id", "text")).select(
        "doc_id", F.md5("text").alias("h2")
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .withColumn(
            "change",
            F.when(F.col("h1").isNull(), "added")
            .when(F.col("h2").isNull(), "removed")
            .when(F.col("h1") != F.col("h2"), "changed"),
        )
        .where(F.col("change").isNotNull())
        .select("doc_id", "change")
    )


CORPUS_DIFF_SQL = f"""
WITH h AS (
  SELECT doc_id, text,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hh
  FROM documents
),
v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN hh % 11 = 0 THEN text || ' rev2' ELSE text END) AS h2
  FROM h WHERE hh % 7 <> 0
  UNION ALL
  SELECT doc_id + {DIFF_CLONE_OFFSET}, md5(text) FROM h WHERE hh % 13 = 5
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.h1 <> v2.h2 THEN 'changed' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE (v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h1 <> v2.h2)
"""


def corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style snapshot update -> the next corpus version
    ``(doc_id, content_hash, version)``: apply the derived v2 delta to
    v1 with upsert semantics — updated docs take the new content
    (version=2), unchanged keep version=1, new docs insert (version=2),
    and docs absent from v2 are deleted (anti-join).

    This is Delta/Iceberg ``MERGE INTO`` expressed as one full-outer
    join — the co-partitioned single-shuffle shape a 100 TB snapshot
    update needs (content hashes compare in place; text bytes move
    only for inserted/updated rows in a real writer)."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h1"))
    v2 = corpus_v2(docs.select("doc_id", "text")).select(
        "doc_id", F.md5("text").alias("h2")
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .where(F.col("h2").isNotNull())  # deletes drop out
        .select(
            "doc_id",
            F.col("h2").alias("content_hash"),
            F.when(
                F.col("h1").isNull() | (F.col("h1") != F.col("h2")), 2
            )
            .otherwise(1)
            .cast("long")
            .alias("version"),
        )
    )


CORPUS_UPSERT_SQL = f"""
WITH h AS (
  SELECT doc_id, text,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hh
  FROM documents
),
v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN hh % 11 = 0 THEN text || ' rev2' ELSE text END) AS h2
  FROM h WHERE hh % 7 <> 0
  UNION ALL
  SELECT doc_id + {DIFF_CLONE_OFFSET}, md5(text) FROM h WHERE hh % 13 = 5
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, v2.h2 AS content_hash,
       CAST(CASE WHEN v1.h1 IS NULL OR v1.h1 <> v2.h2 THEN 2 ELSE 1 END
            AS BIGINT) AS version
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v2.h2 IS NOT NULL
"""


def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic interleaved training order -> ``(slot, doc_id,
    lang)``: document k of each domain lands at slot
    ``(k-1) * n_domains + domain_index``, with the within-domain order
    an md5 shuffle — consecutive slots cycle through domains, so no
    training batch is a long same-domain run (correlated-batch
    mitigation), and the whole ordering is reproducible bit-for-bit.

    Scale shape: NO global sort and NO global window — the
    within-domain rank is a window partitioned by lang (distributed);
    the domain index comes from a BOUNDED driver collect of the
    distinct domains (O(D) rows — hundreds of languages at 100 TB,
    the same bounded-broadcast pattern as the k-means centroids),
    sorted driver-side and rejoined as a broadcast D-row table; the
    slot is a closed-form expression.  A writer would range-partition
    on slot; the slots are unique by construction ((k, domain) is)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ranked = docs.withColumn(
        "k",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
        ),
    )
    langs = sorted(
        r[0] for r in docs.select("lang").distinct().collect()
    )  # bounded: one row per domain
    doms = docs.sparkSession.createDataFrame(
        [(lang, idx) for idx, lang in enumerate(langs)],
        "lang string, dom_idx int",
    )
    n_dom = len(langs)
    return (
        ranked.join(F.broadcast(doms), "lang")
        .select(
            ((F.col("k") - 1) * F.lit(n_dom) + F.col("dom_idx"))
            .cast("long")
            .alias("slot"),
            "doc_id",
            "lang",
        )
    )


TRAINING_ORDER_SQL = """
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 15) AS BIGINT), doc_id
         ) AS k
  FROM documents
),
doms AS (
  SELECT lang, ROW_NUMBER() OVER (ORDER BY lang) - 1 AS dom_idx
  FROM (SELECT DISTINCT lang FROM documents)
),
n AS (SELECT COUNT(*) AS n_dom FROM doms)
SELECT CAST((r.k - 1) * n.n_dom + d.dom_idx AS BIGINT) AS slot,
       r.doc_id, r.lang
FROM ranked r JOIN doms d ON d.lang = r.lang CROSS JOIN n
"""


def corpus_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history merge -> the full
    versioned table ``(doc_id, content_hash, valid_from, valid_to,
    is_current)``: v1 rows of changed/removed docs are CLOSED
    (valid_to = 2, not current), their replacements and brand-new
    docs open at generation 2, unchanged docs keep their open v1 row.
    The lakehouse ``MERGE ... WHEN MATCHED THEN close + insert``
    pattern (corpus_upsert is the SCD1 sibling that overwrites).

    Scale shape: ONE co-partitioned full-outer join on doc_id; both
    potential history rows are built as an in-row struct array and
    exploded, so the join output is derived once — no unionAll
    re-deriving the join per branch (the Catalyst multi-reference
    trap), no second shuffle, no driver state.  Generations are
    logical longs (1, 2), not wall-clock timestamps — deterministic
    and replayable."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("h1"))
    v2 = corpus_v2(docs.select("doc_id", "text")).select(
        "doc_id", F.md5("text").alias("h2")
    )
    h1, h2 = F.col("h1"), F.col("h2")
    changed = h1.isNotNull() & h2.isNotNull() & (h1 != h2)
    unchanged = h1.isNotNull() & h2.isNotNull() & (h1 == h2)
    rows = (
        v1.join(v2, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.explode(
                F.array(
                    F.when(
                        h1.isNotNull(),
                        F.struct(
                            h1.alias("content_hash"),
                            F.lit(1).cast("long").alias("valid_from"),
                            F.when(~unchanged, F.lit(2)).cast("long")
                            .alias("valid_to"),
                            F.when(unchanged, 1).otherwise(0).cast("long")
                            .alias("is_current"),
                        ),
                    ),
                    F.when(
                        h2.isNotNull() & (h1.isNull() | changed),
                        F.struct(
                            h2.alias("content_hash"),
                            F.lit(2).cast("long").alias("valid_from"),
                            F.lit(None).cast("long").alias("valid_to"),
                            F.lit(1).cast("long").alias("is_current"),
                        ),
                    ),
                )
            ).alias("r"),
        )
        .where(F.col("r").isNotNull())
        .select("doc_id", "r.*")
    )
    return rows


CORPUS_SCD2_SQL = f"""
WITH h AS (
  SELECT doc_id, text,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hh
  FROM documents
),
v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN hh % 11 = 0 THEN text || ' rev2' ELSE text END) AS h2
  FROM h WHERE hh % 7 <> 0
  UNION ALL
  SELECT doc_id + {DIFF_CLONE_OFFSET}, md5(text) FROM h WHERE hh % 13 = 5
),
j AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, v1.h1, v2.h2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT doc_id, h1 AS content_hash,
       CAST(1 AS BIGINT) AS valid_from,
       CAST(CASE WHEN h2 IS NULL OR h1 <> h2 THEN 2 END AS BIGINT)
         AS valid_to,
       CAST(CASE WHEN h2 IS NOT NULL AND h1 = h2 THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM j WHERE h1 IS NOT NULL
UNION ALL
SELECT doc_id, h2,
       CAST(2 AS BIGINT),
       CAST(NULL AS BIGINT),
       CAST(1 AS BIGINT)
FROM j WHERE h2 IS NOT NULL AND (h1 IS NULL OR h1 <> h2)
"""


# ------------------------------------------- end-to-end curation gate

#: quality floor for the composite pipeline — low enough that most
#: docs survive, high enough that the filter REMOVES real rows (the
#: hash must witness both outcomes)
CURATION_MIN_WORDS = 8


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation chain as ONE composed plan (the
    round-11 composition witness: profile -> quality-filter -> exact
    dedup -> deterministic training order, each stage an operator
    this engine gates separately) -> ``(slot, doc_id, lang,
    n_words)``.

    Stage shapes, all scale-honest: the word count is a narrow map
    fused into the scan; the quality filter is a pushed predicate on
    it; exact dedup is one window over md5(text) keeping the smallest
    doc_id (one shuffle); the training order reuses
    :func:`training_order`'s design — within-domain md5 rank
    (window partitioned by lang) + a BOUNDED driver collect of the
    surviving domains rejoined as a broadcast table + the closed-form
    interleave slot.  No global sort, no global window anywhere.

    The DuckDB twin recomputes the whole chain independently
    (QUALIFY dedup, dense-rank domain index), so the hash pins every
    stage AND their composition — drop one duplicate too many, or
    filter at the wrong boundary, and every slot downstream moves."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    profiled = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).cast("long").alias("n_words"),
    )
    kept = profiled.where(F.col("n_words") >= CURATION_MIN_WORDS)
    dedup_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    unique = (
        kept.withColumn("_rn", F.row_number().over(dedup_w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "text")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ranked = unique.withColumn(
        "k",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
        ),
    )
    langs = sorted(
        r[0] for r in unique.select("lang").distinct().collect()
    )  # bounded: one row per surviving domain
    doms = spark.createDataFrame(
        [(lang, idx) for idx, lang in enumerate(langs)],
        "lang string, dom_idx int",
    )
    n_dom = len(langs)
    return (
        ranked.join(F.broadcast(doms), "lang")
        .select(
            ((F.col("k") - 1) * F.lit(n_dom) + F.col("dom_idx"))
            .cast("long").alias("slot"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            "n_words",
        )
    )


CURATION_PIPELINE_SQL = f"""
WITH profiled AS (
  SELECT doc_id, lang, text,
         CAST(length(list_filter(string_split(text, ' '),
                                 x -> x <> '')) AS BIGINT) AS n_words
  FROM documents
),
kept AS (
  SELECT * FROM profiled WHERE n_words >= {CURATION_MIN_WORDS}
),
unique_docs AS (
  SELECT doc_id, lang, n_words FROM kept
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                             ORDER BY doc_id) = 1
),
ranked AS (
  SELECT doc_id, lang, n_words,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substring(
             md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id
         ) AS k,
         DENSE_RANK() OVER (ORDER BY lang) - 1 AS dom_idx
  FROM unique_docs
),
n AS (SELECT COUNT(DISTINCT lang) AS n_dom FROM unique_docs)
SELECT CAST((k - 1) * n.n_dom + dom_idx AS BIGINT) AS slot,
       CAST(doc_id AS BIGINT) AS doc_id, lang, n_words
FROM ranked CROSS JOIN n
"""
