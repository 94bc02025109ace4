"""Distributed byte-pair-encoding vocabulary induction over
``documents`` — the tokenizer-training step of an LLM data pipeline
(Sennrich et al. 2016; the counting kernel behind GPT-2/SentencePiece
BPE trainers).

Two tiers, mirroring the kmeans/pca split:

- :func:`bpe_pair_counts` — the distributed per-iteration kernel
  (adjacent symbol-pair counts over word TYPES weighted by word
  frequency), driver-gated with a DuckDB twin.  Exact integer counts,
  no floats anywhere.
- :func:`bpe_learn` — the iterative merge loop (count -> argmax pair ->
  greedy in-row merge), library tier: per-iteration work is one
  vocab-sized aggregation plus a narrow JVM-side fold over symbol
  arrays; the only driver traffic is the single argmax row per
  iteration.  Pure-Python differential tested (``tests/test_bpe.py``).

Scale shape (100 TB corpus): the corpus is touched ONCE to build the
word-frequency table (explode + hash agg on word — the same shuffle
``vocab_build`` already pays); every BPE iteration after that runs on
the |V|-row word-type table, which is Heaps'-law sublinear in corpus
size and stays cached.  Pair counting is in-row (``transform`` over the
symbol array — no positional self-join), the per-iteration shuffle is
the tiny pair-count aggregation, and the merge application is a
whole-stage-codegen ``aggregate`` fold — no Python UDF in the loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table


def word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-type frequency table ``(word, f)`` — the one corpus-scale
    pass; everything BPE does afterwards is vocab-sized."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("f"))
    )


def _pair_counts_of(syms_words: DataFrame) -> DataFrame:
    """Adjacent-pair counts ``(a, b, cnt)`` over ``(syms, f)`` rows.

    In-row pair construction (transform over the symbol array), one
    hash-agg shuffle on the pair key; every occurrence counts, weighted
    by the word-type frequency ``f``.
    """
    pairs = syms_words.where(F.size("syms") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(syms) - 2),"
                " i -> struct(syms[i] AS a, syms[i + 1] AS b))"
            )
        ).alias("p"),
        "f",
    )
    return pairs.groupBy("p.a", "p.b").agg(
        F.sum("f").cast("long").alias("cnt")
    )


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iteration-1 BPE pair counts -> ``(a, b, cnt)``: adjacent
    CHARACTER pairs over word types, weighted by word frequency — the
    distributed kernel :func:`bpe_learn` re-runs per merge.

    Symbols are built positionally (``substring(word, i, 1)``) so the
    DuckDB twin (:data:`BPE_PAIR_COUNTS_SQL`) replays the construction
    verbatim; counts are exact int64 — full hash parity.
    """
    wf = word_freqs(spark, sf_dir)
    syms = wf.select(
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
        "f",
    )
    return _pair_counts_of(syms)


BPE_PAIR_COUNTS_SQL = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wf AS (
  SELECT word, COUNT(*) AS f FROM words
  WHERE length(word) >= 1 GROUP BY word
),
pairs AS (
  SELECT substring(word, CAST(i AS INT), 1) AS a,
         substring(word, CAST(i AS INT) + 1, 1) AS b,
         f
  FROM wf, UNNEST(range(1, length(word))) AS t(i)
  WHERE length(word) >= 2
)
SELECT a, b, CAST(SUM(f) AS BIGINT) AS cnt FROM pairs GROUP BY a, b
"""


def _sql_quote(sym: str) -> str:
    return sym.replace("\\", "\\\\").replace("'", "\\'")


def merge_pair_expr(a: str, b: str) -> str:
    """Greedy left-to-right merge of the adjacent pair ``(a, b)`` into
    ``a || b`` as a whole-stage-codegen ``aggregate`` fold — no Python
    in the loop.

    The fold keeps BPE's non-overlapping greedy semantics for free:
    after a merge the accumulator's last element is ``a || b``, which
    can never equal ``a`` (``b`` is non-empty), so ``aaa`` under merge
    ``(a, a)`` becomes ``[aa, a]``, exactly like the sequential
    algorithm.
    """
    qa, qb = _sql_quote(a), _sql_quote(b)
    qab = _sql_quote(a + b)
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) ->"
        " CASE WHEN size(acc) > 0"
        f" AND element_at(acc, -1) = '{qa}' AND x = '{qb}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{qab}'))"
        " ELSE concat(acc, array(x)) END)"
    )


def bpe_learn(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_merges: int = 8,
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges -> ``[(iteration, a, b, cnt)]``.

    Deterministic argmax: highest count, ties broken lexicographically
    on ``(a, b)`` — the same rule as the reference Python trainer in
    ``tests/test_bpe.py``.  Stops early when no pair reaches
    ``min_count``.

    Driver traffic is ONE row per iteration (the argmax); the symbol
    table is re-persisted per merge so the lineage stays one fold deep
    instead of accumulating ``n_merges`` nested expressions.
    """
    wf = word_freqs(spark, sf_dir)
    syms = wf.select(
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
        "f",
    ).persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for it in range(1, n_merges + 1):
            best = (
                _pair_counts_of(syms)
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((it, a, b, cnt))
            nxt = syms.select(
                F.expr(merge_pair_expr(a, b)).alias("syms"), "f"
            ).persist()
            nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


# ------------------------------------------------------------- encoding

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential-reference BPE encode of one word: repeatedly merge
    the LOWEST-RANK adjacent pair present (ties leftmost) until no
    learned pair remains — the standard tokenizer inference rule,
    equivalent to applying the merge list in learned order."""
    s = list(word)
    while len(s) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Tokenize ``documents`` rows with a learned merge list ->
    ``(doc_id, tokens, n_tokens)``.

    Scale shape: a NARROW Arrow-batched map — no shuffle, no join, no
    vocabulary table to distribute; words repeat heavily inside a
    batch, so a per-batch memo dict amortizes the merge loop to ~one
    encode per word type per batch.  (For merge lists beyond closure
    size, ship ``ranks`` with ``SparkContext.broadcast`` — the shape is
    unchanged.)
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): it for it, a, b, _ in merges}

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t: str) -> list[str]:
            out: list[str] = []
            for w in t.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc_text)

    return docs.select(
        "doc_id", enc(F.col("text")).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens").cast("long"))


def apply_merges_expr(merges: list[tuple[int, str, str, int]]) -> str:
    """JVM-only encode: the learned merges as a CHAIN of codegen
    ``aggregate`` folds applied in learned order — equivalent to
    :func:`encode_word`'s rank-priority rule for TRAINING-PRODUCED
    merge lists (a pair involving a merged symbol always ranks after
    the merge that created the symbol, so exhausting merge k before
    k+1 is lowest-rank-first).  Practical for small merge lists; the
    Pandas path is the production encoder."""
    expr = (
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    for _, a, b, _ in merges:
        expr = merge_pair_expr(a, b).replace("aggregate(syms,", f"aggregate({expr},", 1)
    return expr
