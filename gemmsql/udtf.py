"""Python UDTF surface (Spark 4 table functions).

The reference has no UDTF concept (SURVEY.md §2.9); this registers the
engine's lateral-expansion primitives as SQL-callable table functions so
``LATERAL``-style queries work textually.  UDTFs run row-at-a-time in
Python — the SLOW path by design; every UDTF here has a vectorized
built-in twin (split/explode, transform) that hot paths use instead.
The value is API completeness + a migration surface for logic that
arrives as Python generators.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="word string, pos int")
class SplitWords:
    """LATERAL word expansion: one row per (word, position)."""

    def eval(self, text: str):
        if text is None:
            return
        for pos, word in enumerate(text.split(" ")):
            yield word, pos


@udtf(returnType="shingle string")
class Shingles3:
    """LATERAL word-3-gram expansion (distinct per row) — the UDTF twin
    of pipeline.dedup.doc_shingles' transform() formulation."""

    def eval(self, text: str):
        if text is None:
            return
        w = text.split(" ")
        seen = set()
        for i in range(len(w) - 2):
            s = " ".join(w[i : i + 3])
            if s not in seen:
                seen.add(s)
                yield (s,)


def register_udtfs(spark) -> None:
    spark.udtf.register("split_words", SplitWords)
    spark.udtf.register("shingles3", Shingles3)
