"""Text analysis over ``documents``: quality stats, token counting,
language scoring, fingerprinting.

Everything is built from engine-portable primitives (length arithmetic,
split/explode, md5, regex counts) so the DuckDB oracle reproduces the
results exactly.  At 100 TB these are narrow per-row maps (no shuffle)
except the stopword scoring, which is one explode + groupBy on doc_id —
co-partitioned with the source read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.caching import scoped_cache
from gemmsql.datamodel import load_table

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "los", "y"),
}

TOKEN_RE = "[a-z]+|[0-9]+"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats from pure length arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_spaces = n_chars - F.length(F.regexp_replace("text", " ", ""))
    n_tokens = n_spaces + 1
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round((n_chars - n_spaces) / n_tokens, 6).alias("avg_token_len"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias("n_alpha"),
    )


TEXT_STATS_SQL = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / (length(text) - length(replace(text, ' ', '')) + 1), 6) AS avg_token_len,
  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha
FROM documents
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (BPE-ish split into alpha runs and digit runs)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("long").alias("n_re_tokens"),
        F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("long").alias(
            "n_distinct_words"
        ),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
  CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_re_tokens,
  CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words
FROM documents
"""


def language_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-list language scoring: per doc, hit counts per language
    list + the argmax guess (deterministic tie-break by language code).

    A real pipeline would use char-n-gram models; the *shape* (token
    explode -> conditional aggregation -> argmax) is identical."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    aggs = [
        F.sum(F.when(F.col("word").isin(*words), 1).otherwise(0))
        .cast("long")
        .alias(f"score_{lang}")
        for lang, words in STOPWORDS.items()
    ]
    scored = w.groupBy("doc_id").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    # argmax with deterministic tie-break: highest score, then first
    # language alphabetically -> array_max over (s, reversed-lang) is
    # wrong for ties; use sort and take last of (s asc, l desc)
    best = F.element_at(F.array_sort(pairs), -1)
    return scored.select(
        "doc_id",
        *[F.col(f"score_{lang}") for lang in sorted(STOPWORDS)],
        best["l"].alias("lang_guess"),
    )


def language_scores_sql() -> str:
    score_cols = ", ".join(
        "CAST(SUM(CASE WHEN word IN ({}) THEN 1 ELSE 0 END) AS BIGINT) AS score_{}".format(
            ", ".join(f"'{w}'" for w in words), lang
        )
        for lang, words in STOPWORDS.items()
    )
    langs = sorted(STOPWORDS)
    # same tie-break as the engine: max score, then lexicographically
    # last language among ties (array_sort on (s, l) then take last)
    pairs = ", ".join(f"(score_{lang}, '{lang}')" for lang in langs)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
scored AS (SELECT doc_id, {score_cols} FROM words GROUP BY 1)
SELECT doc_id, {", ".join("score_" + lang for lang in langs)},
  (list_sort([{pairs}])[{len(langs)}])[2] AS lang_guess
FROM scored
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k tf-idf terms per document (tf = in-doc count, idf =
    ln(N/df)); ranked with deterministic ties (score desc, term asc).

    Two shuffles: term frequencies (doc_id x word) and document
    frequencies (word); the df table is broadcast back — at 100 TB the
    vocabulary is millions of rows, still broadcastable."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("word").alias("term"),
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


TFIDF_TOP_TERMS_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, word, tf * LN(CAST(n.n AS DOUBLE) / df.df) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, tfidf, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
  FROM scored
)
SELECT doc_id, word AS term, ROUND(CAST(tfidf AS DOUBLE), 6) AS tfidf,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


QS_STOPWORDS = tuple(w for ws in STOPWORDS.values() for w in ws)


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score, the filter stage of a training
    corpus pipeline (Gopher/C4-style heuristics re-expressed portably):

    - len_score: 1 if 20 <= n_tokens <= 600 else 0
    - stop_ratio: stopword tokens / tokens (any language list)
    - digit_ratio: digit chars / chars
    - mean token length in [3, 10] -> word_score
    - score = 0.4*len_score + 0.4*min(stop_ratio*5, 1) +
              0.2*word_score - digit_ratio  (clamped to [0,1])

    One explode + groupBy per doc (co-partitioned with the scan) plus a
    narrow per-row map; no joins.  At 100 TB the explode is the only
    shuffle and keys are doc_ids — uniform, no skew."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tok = w.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("word").isin(*QS_STOPWORDS), 1).otherwise(0))
        .cast("long")
        .alias("n_stop"),
        F.round(F.avg(F.length("word")), 6).alias("mean_word_len"),
    )
    chars = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_"),
        F.length(F.regexp_replace("text", "[^0-9]", ""))
        .cast("long")
        .alias("n_digit"),
    )
    j = tok.join(chars, "doc_id")
    len_score = F.when(
        (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 600), 1.0
    ).otherwise(0.0)
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    digit_ratio = F.col("n_digit") / F.col("n_chars_")
    word_score = F.when(
        (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0), 1.0
    ).otherwise(0.0)
    raw = (
        0.4 * len_score
        + 0.4 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.2 * word_score
        - digit_ratio
    )
    return j.select(
        "doc_id",
        "n_tokens",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        "mean_word_len",
        F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 6).alias(
            "quality"
        ),
    )


def quality_score_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in QS_STOPWORDS)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tok AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN word IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         ROUND(CAST(AVG(length(word)) AS DOUBLE), 6) AS mean_word_len
  FROM words GROUP BY 1
),
chars AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit
  FROM documents
),
j AS (SELECT * FROM tok JOIN chars USING (doc_id)),
scored AS (
  SELECT doc_id, n_tokens,
    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
    CAST(n_digit AS DOUBLE) / n_chars_ AS digit_ratio,
    mean_word_len,
    0.4 * (CASE WHEN n_tokens BETWEEN 20 AND 600 THEN 1.0 ELSE 0.0 END)
    + 0.4 * LEAST(CAST(n_stop AS DOUBLE) / n_tokens * 5.0, 1.0)
    + 0.2 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
    - CAST(n_digit AS DOUBLE) / n_chars_ AS raw
  FROM j
)
SELECT doc_id, n_tokens, ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(digit_ratio, 6) AS digit_ratio, mean_word_len,
       ROUND(GREATEST(LEAST(raw, 1.0), 0.0), 6) AS quality
FROM scored
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: full-content md5 + a
    word-order-insensitive bag fingerprint (md5 of sorted words)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_fp"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.split(F.lower(F.col("text")), " ")))
        ).alias("bag_fp"),
    )


FINGERPRINTS_SQL = """
SELECT doc_id, md5(lower(text)) AS content_fp,
  md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS bag_fp
FROM documents
"""


SAMPLE_RATES = {"en": 40, "de": 70, "fr": 70, "es": 70}  # percent kept


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling via hash thresholds:
    keep a doc when md5(doc_id) mod 100 < rate(lang).

    Hash-gating is the 100 TB sampling method: a stateless narrow map —
    no RNG state, no shuffle, stable across reruns and retries (a task
    re-execution keeps the same rows, which seeded rand() does NOT
    guarantee under different partition layouts), and exactly
    reproducible by any other engine, which is what makes this
    oracle-checkable where sample()/sampleBy() are not."""
    docs = load_table(spark, sf_dir, "documents")
    gate = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in SAMPLE_RATES.items()
        ],
        F.lit(50),
    )
    return docs.where(gate < rate).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


def stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in SAMPLE_RATES.items()
    )
    return f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
      < (CASE {cases} ELSE 50 END)
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document — the standard
    pre-training quality gate the reference pipeline lacks:

    - ``dup_word_frac``  = 1 - distinct_words / total_words
    - ``top_word_frac``  = count(most frequent word) / total_words
    - ``top_bigram_frac``= count(most frequent word 2-gram) / total 2-grams
      (0.0 for single-word docs)

    Scale shape: one explode + groupBy(doc_id, token) per signal —
    shuffles keyed by (doc_id, token), uniform, co-partitioned with the
    read; counts are exact integers so the ratio is drift-free."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    ws = wc.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top"),
    )
    # bigrams built in-row (narrow), like dedup.doc_shingles with n=2
    wsplit = docs.select("doc_id", F.split(F.col("text"), " ").alias("ww"))
    w = F.col("ww")
    starts = F.when(
        F.size(w) >= 2, F.sequence(F.lit(0), F.size(w) - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    bigrams = wsplit.select("doc_id", F.explode(grams).alias("bg"))
    bc = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bs = bc.groupBy("doc_id").agg(
        F.sum("c").alias("btotal"), F.max("c").alias("btop")
    )
    return (
        ws.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            F.round(1 - F.col("n_distinct") / F.col("total"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top") / F.col("total"), 6).alias("top_word_frac"),
            F.round(
                F.coalesce(F.col("btop") / F.col("btotal"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


REPETITION_STATS_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
ws AS (SELECT doc_id, SUM(c) AS total, COUNT(*) AS n_distinct, MAX(c) AS top
       FROM wc GROUP BY 1),
pw AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
big AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS bg
  FROM pw a JOIN pw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
bs AS (SELECT doc_id, SUM(c) AS btotal, MAX(c) AS btop FROM bc GROUP BY 1)
SELECT ws.doc_id,
  ROUND(1 - CAST(ws.n_distinct AS DOUBLE) / ws.total, 6) AS dup_word_frac,
  ROUND(CAST(ws.top AS DOUBLE) / ws.total, 6) AS top_word_frac,
  ROUND(COALESCE(CAST(bs.btop AS DOUBLE) / bs.btotal, 0.0), 6)
    AS top_bigram_frac
FROM ws LEFT JOIN bs ON bs.doc_id = ws.doc_id
"""


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per (lang, source): the first thing a
    training-data pipeline reports — doc counts, volume, and length
    distribution anchors (exact integers end-to-end)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.sum("n_chars") / F.count("*"), 6).alias("avg_chars"),
        )
    )


CORPUS_PROFILE_SQL = """
SELECT lang, source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  MIN(n_chars) AS min_chars,
  MAX(n_chars) AS max_chars,
  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
FROM documents GROUP BY 1, 2
"""


def word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — the
    perplexity-proxy quality signal (low entropy = repetitive/template
    text): ``H = ln(T) - (sum_w c_w ln c_w) / T`` over word counts.

    Drift discipline: ``c ln c`` terms are snapped to a 1e-9 integer
    grid before the sum (floor(c*ln(c)*1e9 + .5) as long), so the only
    order-sensitive float reduction becomes an exact integer sum and
    the oracle comparison is stable (same trick as gemmsql/ops/gate.py,
    here expressed entirely in SQL on both sides)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    tq = F.floor(
        F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        * F.lit(1e9) + F.lit(0.5)
    ).alias("tq")
    per_doc = wc.select("doc_id", F.col("c"), tq).groupBy("doc_id").agg(
        F.sum("c").alias("t"), F.sum("tq").alias("tsum")
    )
    h = (
        F.log(F.col("t").cast("double"))
        - (F.col("tsum").cast("double") / F.lit(1e9)) / F.col("t")
    )
    return per_doc.select("doc_id", F.round(h, 6).alias("word_entropy"))


WORD_ENTROPY_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t,
         CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tsum
  FROM wc GROUP BY 1
)
SELECT doc_id,
  ROUND(LN(CAST(t AS DOUBLE)) - (CAST(tsum AS DOUBLE) / 1000000000.0) / t, 6)
    AS word_entropy
FROM per_doc
"""


def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused text_stats + token_counts: ONE narrow per-row map computes
    all seven columns — no join, no shuffle (the registry's merged
    `text_stats` query; the separate functions remain the modular API).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_spaces = n_chars - F.length(F.regexp_replace("text", " ", ""))
    n_tokens = n_spaces + 1
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round((n_chars - n_spaces) / n_tokens, 6).alias("avg_token_len"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias("n_alpha"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("long").alias("n_re_tokens"),
        F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("long").alias(
            "n_distinct_words"
        ),
    )


TEXT_PROFILE_SQL = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / (length(text) - length(replace(text, ' ', '')) + 1), 6) AS avg_token_len,
  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
  CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_re_tokens,
  CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words
FROM documents
"""


def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused repetition_stats + word_entropy: the (doc_id, word) count
    table is built ONCE and feeds both the repetition fractions and the
    entropy fold — one explode and two doc-keyed aggregations instead
    of the join-of-two-queries' four (the registry's merged
    `repetition_stats` query)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    tq = F.floor(
        F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        * F.lit(1e9) + F.lit(0.5)
    )
    ws = wc.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top"),
        F.sum(tq).alias("tsum"),
    )
    wsplit = docs.select("doc_id", F.split(F.col("text"), " ").alias("ww"))
    w = F.col("ww")
    starts = F.when(
        F.size(w) >= 2, F.sequence(F.lit(0), F.size(w) - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    bigrams = wsplit.select("doc_id", F.explode(grams).alias("bg"))
    bc = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bs = bc.groupBy("doc_id").agg(
        F.sum("c").alias("btotal"), F.max("c").alias("btop")
    )
    h = (
        F.log(F.col("total").cast("double"))
        - (F.col("tsum").cast("double") / F.lit(1e9)) / F.col("total")
    )
    return (
        ws.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            F.round(1 - F.col("n_distinct") / F.col("total"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top") / F.col("total"), 6).alias("top_word_frac"),
            F.round(
                F.coalesce(F.col("btop") / F.col("btotal"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.round(h, 6).alias("word_entropy"),
        )
    )


REPETITION_PROFILE_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
ws AS (SELECT doc_id, SUM(c) AS total, COUNT(*) AS n_distinct, MAX(c) AS top,
         CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tsum
       FROM wc GROUP BY 1),
pw AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
big AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS bg
  FROM pw a JOIN pw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
bs AS (SELECT doc_id, SUM(c) AS btotal, MAX(c) AS btop FROM bc GROUP BY 1)
SELECT ws.doc_id,
  ROUND(1 - CAST(ws.n_distinct AS DOUBLE) / ws.total, 6) AS dup_word_frac,
  ROUND(CAST(ws.top AS DOUBLE) / ws.total, 6) AS top_word_frac,
  ROUND(COALESCE(CAST(bs.btop AS DOUBLE) / bs.btotal, 0.0), 6)
    AS top_bigram_frac,
  ROUND(LN(CAST(ws.total AS DOUBLE))
        - (CAST(ws.tsum AS DOUBLE) / 1000000000.0) / ws.total, 6)
    AS word_entropy
FROM ws LEFT JOIN bs ON bs.doc_id = ws.doc_id
"""


def vocab_build(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_tf: int = 1,
) -> DataFrame:
    """Ranked token vocabulary -> ``(word, token_id, tf, df, cum_frac)``
    — the corpus-statistics step of tokenizer training (frequency
    cutoffs, coverage curves).

    ``token_id`` ranks by (tf desc, word asc) — a total, deterministic
    order; ``cum_frac`` is the cumulative corpus-token coverage of the
    vocabulary up to that rank (the "top K tokens cover X%" curve).

    Spark shape: explode + one hash-agg shuffle builds the |V|-row count
    table; the global rank / prefix sum is then a RANGE-PARTITIONED
    two-pass scheme, never a single-partition window.  Under Heaps' law
    |V| ∝ N^β (β≈0.4–0.6), so a 100 TB corpus carries hundreds of
    millions to billions of vocabulary types — a global unpartitioned
    ``row_number`` window would put all of them in one task.  Instead:

    1. ``repartitionByRange`` on the sort key (tf desc, word) — range
       partition p holds keys strictly before partition p+1's;
    2. per-partition local rank + local cumulative tf (window
       PARTITIONED by the range-partition id — parallel);
    3. per-partition row/tf totals (one tiny P-row aggregate) turned
       into exclusive prefix offsets with a P×P self-join (P = shuffle
       parallelism, so ~10³ rows even on a large cluster — no global
       window here either), broadcast back, and added to the local
       values.

    The |V|-row ranked table is cached (vocabulary-sized, orders of
    magnitude below corpus size) so the totals pass and the final join
    read it instead of re-running the corpus explode+aggregate.

    Global values are exactly local + offset because word keys are
    unique and range partitions are ordered, so hash parity with the
    single-window oracle is unchanged.  cum/tot are exact integer sums
    on both engines, so the rounded ratio is bit-identical."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
        .where(F.col("tf") >= min_tf)
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = counts.repartitionByRange(
        n_parts, F.desc("tf"), F.asc("word")
    ).withColumn("pid", F.spark_partition_id())
    wloc = W.partitionBy("pid").orderBy(F.desc("tf"), "word")
    wcum = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = scoped_cache(
        ranged.select(
            "word",
            "tf",
            "df",
            "pid",
            F.row_number().over(wloc).cast("long").alias("lrank"),
            F.sum("tf").over(wcum).cast("long").alias("lcum"),
        ),
        fresh_scope=True,
    )
    ptot = local.groupBy("pid").agg(
        F.count("*").cast("long").alias("n"), F.sum("tf").cast("long").alias("s")
    )
    a, b = ptot.alias("a"), ptot.alias("b")
    offs = (
        a.join(b, F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(
            F.coalesce(F.sum("b.n"), F.lit(0)).cast("long").alias("rank_off"),
            F.coalesce(F.sum("b.s"), F.lit(0)).cast("long").alias("cum_off"),
        )
    )
    tot = ptot.agg(F.sum("s").cast("long").alias("tot"))
    return (
        local.join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(tot))
        .select(
            "word",
            (F.col("lrank") + F.col("rank_off") - 1)
            .cast("long")
            .alias("token_id"),
            "tf",
            "df",
            F.round(
                (F.col("lcum") + F.col("cum_off")).cast("double")
                / F.col("tot").cast("double"),
                6,
            ).alias("cum_frac"),
        )
    )


VOCAB_BUILD_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (
  SELECT word, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM w GROUP BY word HAVING COUNT(*) >= 1
)
SELECT word,
  CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, word) - 1 AS BIGINT) AS token_id,
  CAST(tf AS BIGINT) AS tf,
  CAST(df AS BIGINT) AS df,
  ROUND(CAST(SUM(tf) OVER (ORDER BY tf DESC, word
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        / CAST(SUM(tf) OVER () AS DOUBLE), 6) AS cum_frac
FROM c
"""


def bigram_pmi(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_count: int = 5,
) -> DataFrame:
    """Bigram collocation scoring -> ``(a, b, c_ab, pmi)`` — the
    pointwise-mutual-information signal tokenizer merge rules and
    phrase-mining pipelines rank candidate pairs by.

    ``pmi = ln p(a,b) − ln p(a) − ln p(b)`` with unigram/bigram
    probabilities from exact corpus counts.  Each ``ln`` is quantized
    to the 1e-9 integer grid before the exact integer combination (the
    ``word_entropy`` discipline), so engine and oracle agree to the
    rounded digit.

    Spark shape: bigrams are built IN-ROW (transform over the token
    array — no positional self-join, no shuffle to form pairs); one
    hash-agg shuffle counts them; the two unigram lookups join against
    the |V|-row count table, explicitly broadcast.  Corpus-scale cost
    is the same one explode+agg pass as ``token_counts``."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.split("text", " ").alias("w")).where(
        F.size("w") >= 2
    )
    bg_all = words.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> struct(w[i] AS a, w[i + 1] AS b))"
            )
        ).alias("bg")
    ).select("bg.a", "bg.b")
    bigrams = (
        bg_all.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = (
        uni.agg(F.sum("c").cast("long").alias("n"))
        .withColumn("k", F.lit(1))
        .join(
            bg_all.agg(F.count("*").cast("long").alias("m")).withColumn(
                "k", F.lit(1)
            ),
            "k",
        )
    )

    def qln(col):
        return F.floor(F.log(col.cast("double")) * 1e9 + 0.5).cast("long")

    ua = uni.select(F.col("word").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("word").alias("b"), F.col("c").alias("c_b"))
    pmi_int = (
        qln(F.col("c_ab"))
        - qln(F.col("c_a"))
        - qln(F.col("c_b"))
        + F.lit(2) * qln(F.col("n"))
        - qln(F.col("m"))
    )
    return (
        bigrams.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(totals), "k")
        .select(
            "a",
            "b",
            "c_ab",
            F.round(pmi_int.cast("double") / 1e9, 6).alias("pmi"),
        )
    )


BIGRAM_PMI_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT w[i] AS a, w[i + 1] AS b
  FROM t, UNNEST(range(1, len(w))) AS r(i)
),
bc AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b
       HAVING COUNT(*) >= 5),
uni AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
uc AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY word),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS n,
               (SELECT COUNT(*) FROM bg) AS m)
SELECT bc.a, bc.b, CAST(bc.c_ab AS BIGINT) AS c_ab,
  ROUND(CAST(
      CAST(FLOOR(LN(CAST(bc.c_ab AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
    - CAST(FLOOR(LN(CAST(ca.c AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
    - CAST(FLOOR(LN(CAST(cb.c AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
    + 2 * CAST(FLOOR(LN(CAST(tot.n AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
    - CAST(FLOOR(LN(CAST(tot.m AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)
  AS DOUBLE) / 1000000000.0, 6) AS pmi
FROM bc
JOIN uc ca ON ca.word = bc.a
JOIN uc cb ON cb.word = bc.b
CROSS JOIN tot
"""


def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring -> ``(doc_id, n_bigrams, xent)`` —
    the CCNet/Gopher-style quality signal: documents whose token
    transitions are improbable under a corpus language model score a
    high cross-entropy and get filtered or down-weighted.

    Model: add-one-smoothed bigram MLE over the corpus itself,
    ``P(b|a) = (c(a,b) + 1) / (c(a) + V)``; per-document
    ``xent = mean over positions of -ln P``.  Every ``ln`` is
    quantized to the 1e-9 integer grid (the ``bigram_pmi`` /
    ``word_entropy`` discipline) and the per-document sum is an exact
    int64, so the DuckDB twin replays it to the rounded digit.

    Spark shape (two corpus passes + one keyed join):

    - pass 1 builds the bigram/unigram count tables (in-row bigram
      construction — no positional self-join) with one hash-agg each;
    - pass 2 re-explodes per-document bigrams and joins the count
      tables: the bigram join keys on (a, b) — a co-partitioned
      fact-fact shuffle, the honest corpus-scale cost of LM scoring —
      while the unigram+V lookup broadcasts;
    - one final doc_id aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).where(F.size("w") >= 2)
    doc_bg = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> struct(w[i] AS a, w[i + 1] AS b))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.a", "bg.b")
    bigrams = doc_bg.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("c_ab")
    )
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    vocab = uni.agg(
        F.count("*").cast("long").alias("v")
    ).withColumn("k", F.lit(1))

    def qln(col):
        return F.floor(F.log(col.cast("double")) * 1e9 + 0.5).cast("long")

    ua = uni.select(F.col("word").alias("a"), F.col("c").alias("c_a"))
    term = qln(F.col("c_a") + F.col("v")) - qln(F.col("c_ab") + F.lit(1))
    scored = (
        doc_bg.join(bigrams, ["a", "b"])
        .join(F.broadcast(ua), "a")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(vocab), "k")
        .select("doc_id", term.alias("t"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum("t").cast("double")
            / F.count("*").cast("double")
            / F.lit(1e9),
            6,
        ).alias("xent"),
    )


DOC_PERPLEXITY_SQL = """
WITH wpos AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents
),
doc_bg AS (
  SELECT w1.doc_id, w1.word AS a, w2.word AS b
  FROM wpos w1 JOIN wpos w2
    ON w2.doc_id = w1.doc_id AND w2.pos = w1.pos + 1
),
bigrams AS (
  SELECT a, b, COUNT(*) AS c_ab FROM doc_bg GROUP BY 1, 2
),
uni AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
unic AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY 1),
vt AS (SELECT COUNT(*) AS v FROM unic),
scored AS (
  SELECT d.doc_id,
         CAST(FLOOR(LN(CAST(u.c + vt.v AS DOUBLE)) * 1000000000.0 + 0.5)
              AS BIGINT)
         - CAST(FLOOR(LN(CAST(bg.c_ab + 1 AS DOUBLE)) * 1000000000.0 + 0.5)
                AS BIGINT) AS t
  FROM doc_bg d
  JOIN bigrams bg ON bg.a = d.a AND bg.b = d.b
  JOIN unic u ON u.word = d.a
  CROSS JOIN vt
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000000.0, 6) AS xent
FROM scored GROUP BY doc_id
"""


def mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing -> the kept rows ``(doc_id, lang,
    n_lang, n_min)`` of a deterministic uniform-target downsample:
    every language is cut to ~the size of the rarest one (the static
    domain-reweighting step of mixture tuning — a DoReMi-style target
    of uniform domain shares, applied by subsampling).

    Exact integer gate, no float rates: keep a doc when
    ``md5(doc_id) mod n(lang) < n_min`` — expected kept per language is
    n_min, the decision replays bit-for-bit on any engine, and task
    retries keep the same rows (hash gate, not RNG).

    Spark shape: one tiny language-count aggregate broadcast back onto
    a narrow filter map — no corpus shuffle at all beyond the K-row
    count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_lang"))
    nmin = counts.agg(F.min("n_lang").alias("n_min")).withColumn(
        "k", F.lit(1)
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(counts), "lang")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(nmin), "k")
        .where(F.pmod(h, F.col("n_lang")) < F.col("n_min"))
        .select("doc_id", "lang", "n_lang", "n_min")
    )


MIXTURE_BALANCE_SQL = """
WITH counts AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
nmin AS (SELECT MIN(n_lang) AS n_min FROM counts)
SELECT d.doc_id, d.lang, c.n_lang, nmin.n_min
FROM documents d
JOIN counts c ON c.lang = d.lang
CROSS JOIN nmin
WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % c.n_lang < nmin.n_min
"""


# PII patterns in the regex subset Java (Spark) and RE2 (DuckDB)
# evaluate identically: literal classes, bounded ?/+ quantifiers, no
# lookaround, no backreferences.  Leftmost-longest vs leftmost-greedy
# divergence is avoided by anchoring each pattern's tail (the email
# TLD, the full IP octets, the fixed phone shape).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<EMAIL>"),
    (
        "ip",
        r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?"
        r"\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?",
        "<IP>",
    ),
    (
        "phone",
        r"[0-9][0-9][0-9][- ][0-9][0-9][0-9][- ][0-9][0-9][0-9][0-9]",
        "<PHONE>",
    ),
]


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction -> ``(doc_id, redacted, n_email, n_ip, n_phone)``
    — the privacy-hygiene stage of a pretraining pipeline: mask
    emails, IPv4 addresses, and phone-shaped numbers with typed
    placeholder tokens and count what was removed (the count feeds
    doc-level drop rules, e.g. "drop docs with > N PII hits").

    A pure narrow map (regexp_extract_all + chained regexp_replace) —
    zero shuffle at any scale.  Patterns are deliberately restricted to
    the Java/RE2-common subset so the same rule set replays on any
    engine (``PII_SCRUB_SQL`` is the DuckDB twin over a ``docs`` view;
    the synthetic corpus contains no PII, so parity is pinned on a
    fixture table in ``tests/test_pipeline.py``).

    Order matters and is fixed: emails first (an address can embed
    digit runs), then IPs (dotted octets), then phones — each later
    pattern sees the earlier placeholders, exactly as in the twin.
    """
    red = F.col("text")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, token)
    return docs.select("doc_id", red.alias("redacted"), *counts)


def _pii_scrub_sql_steps() -> tuple[str, list[str]]:
    red = "text"
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({red}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return red, counts


PII_SCRUB_SQL = (
    "SELECT doc_id, {red} AS redacted, {counts} FROM docs".format(
        red=_pii_scrub_sql_steps()[0],
        counts=", ".join(_pii_scrub_sql_steps()[1]),
    )
)


# ---- corpus-scale PII gate (VERDICT r4 next #5) ----------------------
#
# The synthetic corpus contains no real PII, so round-4's parity signal
# for pii_scrub was a 6-row fixture.  Here a deterministic PII-bearing
# text is DERIVED from the corpus itself — emails/IPs/phones
# synthesized from md5(doc_id) and spliced around the real text — so
# the scrub runs corpus-scale with a full DuckDB twin: the derivation,
# the regex subset, and the replacement order all replay exactly.
# Membership bits make coverage uneven (~50% email, ~33% IP, ~20%
# phone, some docs clean) so the redaction counts actually vary.

def _hex_int(h, start: int, length: int):
    """Integer value of ``length`` hex chars of ``h`` at 1-based
    ``start`` (Spark side; DuckDB twin: CAST('0x' || substring(...)
    AS BIGINT))."""
    return F.conv(F.substring(h, start, length), 16, 10).cast("long")


def pii_dirty_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) with synthesized PII spliced in: a leading email
    for doc_ids with bit%2=0, a trailing IP for bit%3=0, a trailing
    phone for bit%5=0 — all derived from md5(doc_id), a pure narrow
    map."""
    h = F.md5(F.col("doc_id").cast("string"))
    bit = _hex_int(h, 16, 2)
    email = F.concat(
        F.lit("u"), F.substring(h, 1, 6), F.lit("@"),
        F.substring(h, 7, 5), F.lit(".com"),
    )
    ip = F.concat_ws(
        ".",
        *[
            (_hex_int(h, 2 * k + 1, 2)).cast("string")
            for k in range(4)
        ],
    )
    phone = F.concat_ws(
        "-",
        (F.lit(100) + _hex_int(h, 1, 4) % 900).cast("string"),
        (F.lit(100) + _hex_int(h, 5, 4) % 900).cast("string"),
        (F.lit(1000) + _hex_int(h, 9, 4) % 9000).cast("string"),
    )
    dirty = F.concat(
        F.when(bit % 2 == 0, F.concat(F.lit("contact "), email, F.lit(" ")))
        .otherwise(F.lit("")),
        F.col("text"),
        F.when(bit % 3 == 0, F.concat(F.lit(" from "), ip)).otherwise(F.lit("")),
        F.when(bit % 5 == 0, F.concat(F.lit(" tel "), phone)).otherwise(F.lit("")),
    )
    return docs.select("doc_id", dirty.alias("text"))


def pii_scrub_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form: scrub the PII-injected corpus.  Still a pure
    narrow map end to end (derive + redact in one projection)."""
    return pii_scrub(pii_dirty_docs(load_table(spark, sf_dir, "documents")))


def _pii_dirty_cte() -> str:
    def hx(start: int, length: int) -> str:
        return (
            f"CAST('0x' || substring(h, {start}, {length}) AS BIGINT)"
        )

    email = (
        "'u' || substring(h, 1, 6) || '@' || substring(h, 7, 5) || '.com'"
    )
    ip = " || '.' || ".join(
        f"CAST({hx(2 * k + 1, 2)} AS VARCHAR)" for k in range(4)
    )
    phone = (
        f"CAST(100 + {hx(1, 4)} % 900 AS VARCHAR) || '-' || "
        f"CAST(100 + {hx(5, 4)} % 900 AS VARCHAR) || '-' || "
        f"CAST(1000 + {hx(9, 4)} % 9000 AS VARCHAR)"
    )
    return f"""
hashed AS (
  SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
dirty AS (
  SELECT doc_id,
         CASE WHEN {hx(16, 2)} % 2 = 0
              THEN 'contact ' || {email} || ' ' ELSE '' END
         || text
         || CASE WHEN {hx(16, 2)} % 3 = 0
                 THEN ' from ' || {ip} ELSE '' END
         || CASE WHEN {hx(16, 2)} % 5 = 0
                 THEN ' tel ' || {phone} ELSE '' END AS text
  FROM hashed
)"""


PII_SCRUB_CORPUS_SQL = (
    "WITH {cte} SELECT doc_id, {red} AS redacted, {counts} FROM dirty"
).format(
    cte=_pii_dirty_cte(),
    red=_pii_scrub_sql_steps()[0],
    counts=", ".join(_pii_scrub_sql_steps()[1]),
)


# ---- context-window chunking (round 5 north-star widening) -----------

CHUNK_WORDS = 64   # window size (words)
CHUNK_STRIDE = 48  # window stride -> 16-word overlap between chunks


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking -> ``(doc_id, chunk_idx,
    n_words, chunk)``: overlapping ``CHUNK_WORDS``-word windows every
    ``CHUNK_STRIDE`` words — how long documents become training-context
    rows (the overlap preserves cross-boundary continuations).

    A pure narrow map: split once, ``sequence`` over window starts,
    in-row ``slice`` per start, one explode.  No shuffle at any scale —
    chunking pipelines into the parquet scan exactly like shingling
    (``dedup.frame_shingles``)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    w = F.col("w")
    starts = F.sequence(F.lit(0), F.size(w) - 1, F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.slice(w, s + 1, CHUNK_WORDS).alias("cw"),
        ),
    )
    return (
        ws.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.cw").cast("long").alias("n_words"),
            F.concat_ws(" ", F.col("c.cw")).alias("chunk"),
        )
    )


DOC_CHUNKS_SQL = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
starts AS (
  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, {CHUNK_STRIDE})) AS s
  FROM ws
)
SELECT doc_id, CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(w, s + 1, s + {CHUNK_WORDS})) AS BIGINT) AS n_words,
       array_to_string(list_slice(w, s + 1, s + {CHUNK_WORDS}), ' ') AS chunk
FROM starts
"""


# ---- hashed linear quality classifier (round 5 north-star widening) --
#
# The model-based quality-filter tier of a modern pretraining pipeline
# (fastText-style classifiers in DCLM / FineWeb) in deterministic,
# engine-portable form: the hashing trick (token -> bucket) with a
# fixed md5-derived weight table, mean-pooled and thresholded.  No
# learned weights ship in this sandbox, so the table is a deterministic
# function of the bucket id — the Spark-side plumbing (in-row hashing,
# zero-shuffle pooling, integer exactness) is exactly what a real
# weight table needs (broadcast the table instead of deriving it).

QC_BUCKETS = 4096
QC_WEIGHT_SPAN = 2001  # integer weights in [-1000, 1000] micro-units


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-> ``(doc_id, n_tokens, score, keep)``: mean hashed-bucket
    weight per document (micro-unit integers, exact), keep = score>0.

    Fully in-row: ``transform`` maps every token to its integer weight
    (md5 of the bucket id), ``aggregate`` sums them — no explode, no
    shuffle; the only wide op is... nothing.  At 100 TB this is a
    narrow map pipelined into the scan, the same shape as the real
    classifier (dot product against a broadcast weight table)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))

    def weight(tok):
        bucket = F.pmod(
            F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long"),
            F.lit(QC_BUCKETS),
        )
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("qw"), bucket)), 1, 15),
                16, 10,
            ).cast("long")
            % QC_WEIGHT_SPAN
            - (QC_WEIGHT_SPAN - 1) // 2
        )

    total = F.aggregate(
        F.transform(F.col("w"), weight), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n = F.size("w").cast("long")
    # score = total / (n * 1000) rounded 6, in EXACT integer arithmetic
    # (half away from zero, the gate's _MICRO_RATIO discipline): the
    # ratio of two integers lands exactly on x.xxxxxx5 often enough
    # (e.g. total/80000 at sf0.1) that ROUND-of-double diverges between
    # engines — Spark rounds the decimal string, DuckDB the binary.
    t = total.alias("t")
    pooled = ws.select("doc_id", n.alias("n_tokens"), t)
    micro = F.expr(
        "CASE WHEN t < 0 THEN -((-t * 2000 + n_tokens) DIV (2 * n_tokens))"
        " ELSE (t * 2000 + n_tokens) DIV (2 * n_tokens) END"
    )
    score = micro.cast("double") / 1e6
    return pooled.select(
        "doc_id",
        "n_tokens",
        score.alias("score"),
        (score > 0).alias("keep"),
    )


QUALITY_CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
wts AS (
  SELECT doc_id,
         CAST('0x' || substring(md5('qw' || CAST(
             CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) % {QC_BUCKETS}
           AS VARCHAR)), 1, 15) AS BIGINT) % {QC_WEIGHT_SPAN}
         - {(QC_WEIGHT_SPAN - 1) // 2} AS wt
  FROM toks
),
pooled AS (
  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS total, COUNT(*) AS n_tokens
  FROM wts GROUP BY 1
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN total < 0
            THEN -((-total * 2000 + n_tokens) // (2 * n_tokens))
            ELSE (total * 2000 + n_tokens) // (2 * n_tokens)
       END AS DOUBLE) / 1000000.0 AS score,
       CAST(CASE WHEN total < 0
            THEN -((-total * 2000 + n_tokens) // (2 * n_tokens))
            ELSE (total * 2000 + n_tokens) // (2 * n_tokens)
       END AS DOUBLE) / 1000000.0 > 0 AS keep
FROM pooled
"""


# ---- temperature-smoothed mixture sampling (round 5 widening) --------
#
# mixture_balance (uniform target) has a sibling every multilingual /
# multi-domain pretraining mix uses: alpha-smoothed sampling
# (p_d^alpha / sum p^alpha, alpha=0.5 here) — upsample rare domains,
# downsample dominant ones, without flattening to uniform.  All
# arithmetic after one SQRT is integer-exact so the md5 keep-gate
# replays bit-for-bit: s_d = floor(sqrt(n_d)*SCALE) (IEEE sqrt is
# correctly rounded on both engines), keep iff
# h60(doc_id) mod (S*n_d) < min(s_d*T, S*n_d) where S = sum s_d and
# T is the target sample size — P(keep) = (s_d/S)*(T/n_d), i.e.
# domain share s_d/S spread over n_d docs.
#
# Overflow envelope (r5 review): the gate's products S*n_d and s_d*T
# must stay below 2^63 for the Spark long multiply to be exact (Spark
# wraps silently in non-ANSI mode; DuckDB raises).  With SCALE=1e3,
# S <= 1e3 * D * sqrt(n_max), so S*n_max < 2^62 whenever
# D * n_max^1.5 < 4.6e15 — e.g. 100 domains of up to ~1.2e9 docs each
# (>1e11 docs total), comfortably past the ~1e10-doc / 100 TB regime.
# (SCALE=1e6, the original choice, hit the wall at n_max ~ 2e7.)  The
# share quantization error is <= SCALE^-1/sqrt(n_d) <= 0.1% relative —
# invisible against the sampling noise.  Rather than trust the
# envelope, the tiny D-row domain frame carries an assert_true guard:
# an out-of-envelope corpus fails loudly in BOTH engines instead of
# silently sampling a wrong subset.

MIX_TEMP_SHARE = 2  # T = N // 2: sample half the corpus
MIX_TEMP_SCALE = 1_000  # share fixed-point; see envelope note above
_MIX_TEMP_BOUND = 1 << 62


def _guarded_long(cond, col, msg):
    """``col`` if ``cond`` else raise — an executable assertion.

    Catalyst prunes a projected-then-dropped ``assert_true`` column
    (it is never consumed), so data-envelope guards must live inside
    a column the query actually reads.  ``raise_error`` is NullType;
    the CASE coerces to ``col``'s type.
    """
    return F.when(cond, col).otherwise(F.raise_error(F.lit(msg)))


def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-> kept ``(doc_id, lang)`` rows of the alpha=0.5 smoothed mix.

    One tiny domain-count aggregate (broadcast back), then a narrow
    md5 keep-gate — two corpus passes, the same shape as
    :func:`mixture_balance` and DSIR."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_d"))
    counts = counts.withColumn(
        "s_d",
        F.floor(
            F.sqrt(F.col("n_d").cast("double")) * MIX_TEMP_SCALE
        ).cast("long"),
    )
    tot = counts.agg(
        F.sum("s_d").alias("s_sum"), F.sum("n_d").alias("n_tot")
    )
    dom = counts.crossJoin(F.broadcast(tot)).select(
        "lang", "n_d", "s_d", "s_sum",
        (F.col("n_tot") / MIX_TEMP_SHARE).cast("long").alias("t"),
    )
    # loud failure outside the int64-exact envelope (D rows — free).
    # The guard rides INSIDE the consumed `t` column: a bare
    # assert_true projected-then-dropped is pruned by Catalyst and
    # never runs (r5 advisor finding), but `t` feeds the keep-gate's
    # LEAST(s_d*t, ...) so this branch cannot be eliminated.
    in_envelope = (
        (F.col("s_sum") <= _MIX_TEMP_BOUND / F.col("n_d"))
        & (F.col("s_d") <= _MIX_TEMP_BOUND / F.greatest(F.col("t"), F.lit(1)))
    )
    dom = dom.select(
        "lang", "n_d", "s_d", "s_sum",
        _guarded_long(
            in_envelope, F.col("t"),
            "mixture_temperature: int64 gate overflow",
        ).alias("t"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(dom), "lang")
        .where(
            F.pmod(h, F.col("s_sum") * F.col("n_d"))
            < F.least(
                F.col("s_d") * F.col("t"), F.col("s_sum") * F.col("n_d")
            )
        )
        .select("doc_id", "lang")
    )


MIXTURE_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_d,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * {MIX_TEMP_SCALE}) AS BIGINT) AS s_d
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(SUM(s_d) AS BIGINT) AS s_sum,
               CAST(SUM(n_d) AS BIGINT) AS n_tot FROM counts)
SELECT d.doc_id, d.lang
FROM documents d JOIN counts c ON c.lang = d.lang CROSS JOIN tot
WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % (tot.s_sum * c.n_d)
      < LEAST(c.s_d * (tot.n_tot // {MIX_TEMP_SHARE}), tot.s_sum * c.n_d)
"""
