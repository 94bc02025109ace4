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


# ----------------------------------------------- gated tokenizer apply

#: the gate's fixed merge list — creation-ordered (every pair's parts
#: exist before the pair is used: t+h before th+e, a+n before an+d),
#: which is the property making rank-priority inference
#: (:func:`encode_word`) equivalent to in-order merge application —
#: the equivalence the oracle replays and therefore hash-pins
BPE_GATE_PAIRS: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"), ("e", "n"),
    ("a", "t"), ("o", "r"),
]
BPE_GATE_MERGES = [(i, a, b, 0) for i, (a, b) in enumerate(BPE_GATE_PAIRS)]
#: token joiner for the value hash — a control char the ASCII corpus
#: never contains, so joined-token md5 uniquely encodes the token list
BPE_TOKEN_SEP = "\x1f"


def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-APPLY half of the BPE tier (the training kernel
    ``bpe_pair_counts`` has been gated since r4): every document
    encoded by the PRODUCTION encoder (:func:`bpe_encode` — the
    Arrow-batched, per-batch-memoized rank-priority path) under the
    fixed :data:`BPE_GATE_MERGES` -> ``(doc_id, n_tokens,
    tokens_md5)``.  ``tokens_md5`` hashes the full separator-joined
    token sequence, so token IDENTITY and ORDER — not just counts —
    are load-bearing: a wrong merge order, a missed chain (t+h then
    th+e), or a tie broken on the wrong side changes the hash.

    The DuckDB twin re-encodes every word with a chain of scalar
    string folds (``list_reduce`` per merge, applied in learned
    order) — an independent implementation of greedy BPE whose
    agreement with the rank-priority encoder is exactly the
    equivalence :func:`apply_merges_expr` documents."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # single-file source tables scan as ONE partition — spread before
    # the Arrow-batched encode (the repo-wide mapInPandas discipline)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    enc = bpe_encode(docs, BPE_GATE_MERGES)
    return enc.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens"),
        F.md5(F.concat_ws(BPE_TOKEN_SEP, F.col("tokens"))).alias(
            "tokens_md5"
        ),
    )


def bpe_tokenize_sql() -> str:
    """DuckDB twin: per word, characters -> one scalar string fold
    per merge in learned order (the accumulator is the sep-joined
    symbol sequence; merging appends WITHOUT the separator, fusing
    the tail symbol) -> per-doc ordered token join -> count + md5."""
    sep = BPE_TOKEN_SEP

    def q(s: str) -> str:
        return s.replace("'", "''")

    chars = "list_transform(range(1, length(word) + 1), i -> word[i])"
    s = f"array_to_string({chars}, '{sep}')"
    for a, b in BPE_GATE_PAIRS:
        s = (
            f"list_reduce(string_split({s}, '{sep}'), (acc, x) ->"
            f" CASE WHEN x = '{q(b)}' AND (acc = '{q(a)}'"
            f" OR ends_with(acc, '{sep}' || '{q(a)}'))"
            f" THEN acc || x ELSE acc || '{sep}' || x END)"
        )
    return f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS words
  FROM documents
),
w AS (
  SELECT doc_id, unnest(words) AS word,
         generate_subscripts(words, 1) AS ord
  FROM wl
),
enc AS (SELECT doc_id, ord, {s} AS toks FROM w),
agg AS (
  SELECT doc_id, string_agg(toks, '{sep}' ORDER BY ord) AS all_toks
  FROM enc GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(all_toks) - length(replace(all_toks, '{sep}', '')) + 1
            AS BIGINT) AS n_tokens,
       md5(all_toks) AS tokens_md5
FROM agg
"""
