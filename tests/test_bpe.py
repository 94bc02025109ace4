"""BPE vocabulary induction: pure-Python differential test for the
iterative trainer, plus kernel edge cases.

``bpe_pair_counts`` (the per-iteration distributed kernel) is
driver-gated with a DuckDB twin; here the full iterative
:func:`gemmsql.pipeline.bpe.bpe_learn` loop is checked merge-for-merge
against a sequential reference implementation of the Sennrich et al.
2016 algorithm (greedy non-overlapping left-to-right merge, argmax by
count with lexicographic tie-break).
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _ref_learn(word_freqs: Counter, n_merges: int, min_count: int = 2):
    syms = {w: list(w) for w in word_freqs}
    out = []
    for it in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        mx = max(pc.values())
        if mx < min_count:
            break
        a, b = sorted(k for k, v in pc.items() if v == mx)[0]
        out.append((it, a, b, mx))
        ab = a + b
        for w in syms:
            ns: list[str] = []
            for x in syms[w]:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = ab
                else:
                    ns.append(x)
            syms[w] = ns
    return out


def test_bpe_learn_matches_sequential_reference(spark):
    from gemmsql.pipeline import bpe

    merges = bpe.bpe_learn(spark, SF_SMOKE, n_merges=6)
    docs = [
        r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ]
    wf = Counter(w for d in docs for w in d.split(" ") if len(w) >= 1)
    assert merges == _ref_learn(wf, 6)
    assert len(merges) == 6


@pytest.mark.parametrize(
    "word,pair,expected",
    [
        # greedy non-overlap: 'aaa' under (a,a) -> [aa, a]
        ("aaa", ("a", "a"), ["aa", "a"]),
        ("aaaa", ("a", "a"), ["aa", "aa"]),
        ("abab", ("a", "b"), ["ab", "ab"]),
        # merged symbol must not cascade within the same iteration
        ("abb", ("a", "b"), ["ab", "b"]),
        ("xy", ("y", "x"), ["x", "y"]),
    ],
    ids=["aaa", "aaaa", "abab", "abb", "no-pair"],
)
def test_merge_fold_greedy_semantics(spark, word, pair, expected):
    from gemmsql.pipeline.bpe import merge_pair_expr

    df = spark.createDataFrame([(list(word),)], "syms array<string>")
    out = df.select(
        F.expr(merge_pair_expr(*pair)).alias("m")
    ).first()["m"]
    assert out == expected


def test_pair_counts_weighted_by_word_frequency(spark):
    """'aa' appearing 3 times contributes 3 to the (a,a) count."""
    from gemmsql.pipeline.bpe import _pair_counts_of

    df = spark.createDataFrame(
        [(["a", "a"], 3), (["a", "b"], 2)], "syms array<string>, f long"
    )
    rows = {
        (r["a"], r["b"]): r["cnt"]
        for r in _pair_counts_of(df).collect()
    }
    assert rows == {("a", "a"): 3, ("a", "b"): 2}


def test_bpe_encode_three_ways_agree(spark):
    """The Arrow-batched rank-priority encoder, the JVM fold-chain
    encoder, and the sequential Python reference must tokenize the
    corpus identically for a learned (rank-consistent) merge list."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline import bpe

    merges = bpe.bpe_learn(spark, SF_SMOKE, n_merges=5)
    docs = load_table(spark, SF_SMOKE, "documents")

    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe.bpe_encode(docs, merges).collect()
    }

    ranks = {(a, b): it for it, a, b, _ in merges}
    for r in docs.select("doc_id", "text").collect():
        want = [
            t
            for w in r["text"].split(" ")
            if w
            for t in bpe.encode_word(w, ranks)
        ]
        assert got[r["doc_id"]] == want, f"doc {r['doc_id']}"

    # JVM fold-chain on word types agrees with encode_word
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 1)
        .distinct()
    )
    jvm = {
        r["word"]: r["toks"]
        for r in words.select(
            "word", F.expr(bpe.apply_merges_expr(merges)).alias("toks")
        ).collect()
    }
    for w, toks in jvm.items():
        assert toks == bpe.encode_word(w, ranks), w


def test_bpe_encode_is_narrow(spark):
    """Tokenization must be a zero-shuffle narrow map."""
    from gemmsql.datamodel import load_table
    from gemmsql.pipeline import bpe

    merges = [(1, "e", "r", 0), (2, "o", "r", 0)]
    df = bpe.bpe_encode(load_table(spark, SF_SMOKE, "documents"), merges)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "tokenization must not shuffle"


def test_merge_fold_matches_python_on_adversarial_symbols(spark):
    """Property check across adversarial words (repeats, overlaps,
    quote/backslash symbols exercising the expr escaping): the JVM
    fold merge must equal the sequential greedy merge."""
    from gemmsql.pipeline.bpe import merge_pair_expr

    words = [
        "aaaa", "aabaa", "ababa", "bbb", "a", "",
        "a'b", "''", "\\a", "a\\'b", "ab'ab",
    ]
    pairs = [("a", "a"), ("a", "b"), ("'", "b"), ("\\", "a"), ("'", "'")]

    def ref_merge(s, a, b):
        ns = []
        for x in s:
            if ns and ns[-1] == a and x == b:
                ns[-1] = a + b
            else:
                ns.append(x)
        return ns

    rows = [(list(w),) for w in words]
    df = spark.createDataFrame(rows, "syms array<string>")
    for a, b in pairs:
        got = [
            r["m"]
            for r in df.select(
                F.expr(merge_pair_expr(a, b)).alias("m")
            ).collect()
        ]
        want = [ref_merge(list(w), a, b) for w in words]
        assert got == want, (a, b)


def test_tokenized_corpus_budget_and_coverage(spark):
    """build_tokenized_corpus: every survivor packed exactly once,
    n_tokens == len(tokens) (real tokenizer counts), seq_tokens is the
    exact per-sequence sum, and the budget binds except for oversized
    single docs (flagged truncated)."""
    from gemmsql.pipeline.corpus import build_tokenized_corpus, corpus_survivors

    out = build_tokenized_corpus(spark, SF_SMOKE, n_merges=4).toPandas()
    n_surv = corpus_survivors(spark, SF_SMOKE).count()
    assert len(out) == n_surv
    assert out["doc_id"].is_unique
    assert (out["n_tokens"] == out["tokens"].map(len)).all()
    sums = out.groupby("seq_id")["n_tokens"].sum()
    got = out.set_index("seq_id")["seq_tokens"]
    assert all(sums[s] == v for s, v in got.items())
    from gemmsql.pipeline.packing import PACK_BUDGET
    over = out[out["seq_tokens"] > PACK_BUDGET]
    assert (over["truncated"]).all() or len(over) == 0
