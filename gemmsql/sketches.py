"""Sketch aggregates — the sub-linear-memory path for distinct counts
and quantiles at 100 TB.

Exact distinct over a 100 TB key column shuffles every distinct key;
the sketches here keep fixed-size state per group and merge
associatively (they ARE monoids — HyperLogLog register-max and
quantile summaries — the same partial+final contract as every engine
aggregate, reference core.py:15-64).

Two tiers:

- :func:`user_reach_approx` — the production API: Spark's built-in
  HLL++ (``approx_count_distinct``) + KLL (``percentile_approx``).
  Fastest, but its register internals are not replayable by another
  engine, so it can only be rows-checked.
- :func:`user_reach_sketch` — the gated twin: an EXPLICIT md5-register
  HyperLogLog (4096 registers, register-max monoid over deterministic
  md5 hashes) plus exact percentiles.  Every intermediate is either an
  exact integer or an identically-associated scalar expression, so the
  DuckDB oracle (``USER_REACH_SKETCH_SQL``) reproduces it bit-for-bit
  — the same trick that made ``sampling`` and ``lsh_topk`` exact
  (VERDICT r2 next #5).  Accuracy bounds vs exact answers are asserted
  in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

HLL_M = 4096            # registers (b = 12 index bits; rel. err ~1.04/sqrt(m))
HLL_WBITS = 48          # 60-bit md5 hash minus 12 index bits
_TWO_W = 1 << (HLL_WBITS + 1)          # 2^49: the "rho = 49" empty-register unit
_ALPHA_NUM = 0.7213     # alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128
_M_SQ = float(HLL_M * HLL_M)           # 16777216.0


def user_reach_approx(
    spark: SparkSession, sf_dir: str, *, rsd: float = 0.02
) -> DataFrame:
    """Per event_type: built-in HLL++ distinct users + approximate value
    quantiles — fixed state per group regardless of cardinality."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("q"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.col("approx_users").cast("long").alias("approx_users"),
            F.round(F.col("q")[0], 6).alias("p50"),
            F.round(F.col("q")[1], 6).alias("p90"),
            F.round(F.col("q")[2], 6).alias("p99"),
            "n",
        )
    )


def hll_registers(
    ev: DataFrame,
    *,
    key: str | list[str] = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """md5-register HLL state per key -> (*keys, reg, rho) with
    register-max aggregation (``key`` may be one column or several —
    e.g. ``["day", "event_type"]`` for the persisted sketch store).

    Register-max is a monoid, so this SAME function works on a
    STREAMING DataFrame unchanged: ``groupBy(key, reg).max(rho)`` in
    complete/update mode maintains the sketch as streaming state —
    4096 longs per key regardless of user cardinality, the property
    that makes distinct-count viable on an unbounded stream (parity
    with the batch registers is asserted in tests/test_streaming.py)."""
    keys = [key] if isinstance(key, str) else list(key)
    h60 = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    return (
        ev.select(*keys, h60.alias("h60"))
        .withColumn("reg", F.expr(f"h60 % {HLL_M}"))
        .withColumn("wbits", F.expr(f"h60 div {HLL_M}"))
        .withColumn(
            "rho",
            F.when(F.col("wbits") == 0, F.lit(HLL_WBITS + 1)).otherwise(
                F.lit(HLL_WBITS + 1) - F.length(F.bin("wbits"))
            ),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, keys: list[str]) -> DataFrame:
    """The shared HLL estimator over a register frame: Flajolet's
    ``alpha_m * m^2 / sum 2^-M_j`` with the harmonic sum carried as
    the EXACT integer ``sum 2^(49 - rho)`` (empty registers
    contribute 2^49) and the small-range linear-counting branch.
    Token-identical to the oracle SQL's expression so merges of
    persisted register states stay hash-reproducible."""
    est = regs.groupBy(*keys).agg(
        (
            F.sum(
                F.pow(F.lit(2.0), F.lit(HLL_WBITS + 1) - F.col("rho"))
                .cast("long")
            )
            + (F.lit(HLL_M) - F.count("*")) * F.lit(_TWO_W)
        ).alias("s_total"),
        (F.lit(HLL_M) - F.count("*")).alias("v"),
    )
    raw = (
        F.lit(_ALPHA_NUM)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
        * F.lit(_M_SQ)
        * F.lit(float(_TWO_W))
        / F.col("s_total").cast("double")
    )
    e = F.when(
        (F.col("v") > 0) & (raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    return est.select(
        *keys, F.floor(e + F.lit(0.5)).cast("long").alias("approx_users")
    )


def user_reach_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: explicit-register HLL distinct users + exact
    value percentiles -> (event_type, approx_users, p50, p90, p99, n).

    HLL construction (identical in ``USER_REACH_SKETCH_SQL``):

    - ``h60``: first 60 bits of md5(user_id) — deterministic, so both
      engines hash every user to the same register/rank and duplicate
      users collapse under max for free (no DISTINCT pass needed);
    - register ``h60 % 4096``; rank ``rho = 49 - bitlen(h60 div 4096)``
      (49 when the 48 remaining bits are all zero);
    - register-max is the HLL merge monoid — on a cluster this is one
      partial+final hash aggregate over (group, register), 4096 longs
      of state per group, regardless of key cardinality;
    - estimator: ``E = alpha_m * m^2 / sum_j 2^-M_j`` with the harmonic
      sum carried as the EXACT integer ``sum_j 2^(49 - M_j)`` (empty
      registers contribute 2^49; total < 2^62 — associative, order
      independent), and Flajolet's small-range linear-counting branch
      ``m * ln(m / V)`` when zero registers remain.  The only floats
      are one identically-associated scalar expression per group.
    """
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev)
    # exact integer harmonic numerator: present registers contribute
    # 2^(49-rho) (pow is exact for exponents <= 48), absent ones 2^49;
    # the scalar association is mirrored token-for-token in the oracle
    # SQL (shared with the sketch-store rollup via hll_estimate)
    hll = hll_estimate(regs, ["event_type"])
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
        F.count("*").alias("n"),
    )
    return q.join(hll, "event_type").select(
        "event_type", "approx_users", "p50", "p90", "p99", "n"
    )


USER_REACH_SKETCH_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h60
  FROM events
),
regs AS (
  SELECT event_type, h60 % {HLL_M} AS reg,
         MAX(CASE WHEN h60 // {HLL_M} = 0 THEN {HLL_WBITS + 1}
                  ELSE {HLL_WBITS + 1} - length(bin(h60 // {HLL_M})) END) AS rho
  FROM h GROUP BY 1, 2
),
est AS (
  SELECT event_type,
         CAST(SUM(CAST(POWER(2.0, {HLL_WBITS + 1} - rho) AS BIGINT)) AS BIGINT)
           + ({HLL_M} - COUNT(*)) * {_TWO_W} AS s_total,
         {HLL_M} - COUNT(*) AS v
  FROM regs GROUP BY event_type
),
hll AS (
  SELECT event_type,
         CASE WHEN v > 0 AND
                   {_ALPHA_NUM} / (1.0 + 1.079 / {float(HLL_M)})
                   * {_M_SQ} * {float(_TWO_W)} / CAST(s_total AS DOUBLE)
                   <= {2.5 * HLL_M}
              THEN {float(HLL_M)} * LN({float(HLL_M)} / v)
              ELSE {_ALPHA_NUM} / (1.0 + 1.079 / {float(HLL_M)})
                   * {_M_SQ} * {float(_TWO_W)} / CAST(s_total AS DOUBLE)
         END AS e
  FROM est
),
q AS (
  SELECT event_type,
         ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
         ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS p90,
         ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) AS p99,
         COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT q.event_type, CAST(FLOOR(hll.e + 0.5) AS BIGINT) AS approx_users,
       q.p50, q.p90, q.p99, q.n
FROM q JOIN hll ON hll.event_type = q.event_type
"""


# ------------------------------------------------------- Bloom filter

BLOOM_WORDS = 512       # 512 x 32 bits = 16384-bit filter (~10+ bits
                        # per benchmark shingle at sf0.01 -> <1% doc FP)
BLOOM_BPW = 32          # bits per word, < 63 so masks stay positive
BLOOM_K = 3             # hash functions


def _bloom_positions_expr(col: str, k: int = BLOOM_K) -> str:
    """SQL array<struct<word, mask>> of the K md5-derived bit positions
    of ``col`` — one expression shared by build and probe so both sides
    (and the DuckDB twin) replay the filter exactly."""
    bits = BLOOM_WORDS * BLOOM_BPW
    parts = []
    for i in range(k):
        h = (
            f"pmod(CAST(conv(substring(md5(concat({col}, '#{i}')),"
            f" 1, 15), 16, 10) AS BIGINT), {bits})"
        )
        parts.append(
            f"struct(CAST(({h}) DIV {BLOOM_BPW} AS BIGINT) AS word,"
            f" shiftleft(CAST(1 AS BIGINT),"
            f" CAST(({h}) % {BLOOM_BPW} AS INT)) AS mask)"
        )
    return "array(" + ", ".join(parts) + ")"


def _bloom_probe_expr(col: str, bits: list[int], k: int = BLOOM_K) -> str:
    """SQL int (0/1): all K md5-derived bit positions of ``col`` set in
    the collected filter ``bits`` (inlined as an array literal) — the
    in-row probe twin of :func:`_bloom_positions_expr`."""
    nbits = BLOOM_WORDS * BLOOM_BPW
    arr = "array(" + ", ".join(f"{b}L" for b in bits) + ")"
    checks = []
    for i in range(k):
        h = (
            f"pmod(CAST(conv(substring(md5(concat({col}, '#{i}')),"
            f" 1, 15), 16, 10) AS BIGINT), {nbits})"
        )
        mask = (
            f"shiftleft(CAST(1 AS BIGINT), CAST(({h}) % {BLOOM_BPW} AS INT))"
        )
        # the array literal is foldable: ConstantFolding collapses it
        # to one Literal per check at plan time, no per-row rebuild
        checks.append(
            f"((element_at({arr}, CAST(({h}) DIV {BLOOM_BPW} AS INT)"
            f" + 1) & {mask}) = {mask})"
        )
    body = " AND ".join(checks)
    return f"CAST(({body}) AS INT)"


def bloom_decontaminate(spark, sf_dir: str):
    """Bloom-filter benchmark decontamination ->
    ``(doc_id, n_shingles, n_flagged, flagged_frac)`` — the SCALE path
    of ``dedup.decontaminate``: instead of broadcasting the benchmark's
    raw distinct-shingle set (fine for MB-scale eval suites, not for a
    multi-GB held-out corpus), compress it into a
    ``BLOOM_WORDS * BLOOM_BPW``-bit Bloom filter (512 x 32 = 16384
    bits, ``BLOOM_K`` = 3 md5-derived hashes) and broadcast THAT.
    Probing is a map-side join against a <= ``BLOOM_WORDS``-row table.

    Approximate by design (Bloom false positives can over-flag), but
    deterministic about its own construction: every bit position is an
    md5 gate, so the DuckDB twin (:data:`BLOOM_DECONTAMINATE_SQL`)
    replays the filter and the verdicts bit-for-bit — the same
    discipline as the md5-register HLL above.

    Scale shape: benchmark shingles -> K (word, mask) pairs -> one
    tiny bit_or aggregation, COLLECTED to the driver (<= 512 longs,
    O(const) like the IVF centroid collect) and re-broadcast as an
    array LITERAL; every corpus shingle then probes all K bits IN ROW
    (element_at + bitwise AND), so the only shuffle in the whole query
    is the final doc_id aggregation.  Round-5 rewrite: the earlier
    formulation exploded every corpus shingle xK and shuffled a
    (doc_id, shingle) key to AND the probes back together — ~3x the
    rows through the exchange for the same verdicts (2.35 s -> ~1.1 s
    at sf0.1).  No pairwise join anywhere.
    """
    from pyspark.sql import functions as F

    from gemmsql.pipeline.dedup import BENCH_MOD, doc_shingles

    sh = doc_shingles(spark, sf_dir)
    is_bench = (F.col("doc_id") % BENCH_MOD) == 0

    bench_pos = (
        sh.where(is_bench)
        .select("shingle")
        .distinct()
        .select(
            F.explode(F.expr(_bloom_positions_expr("shingle"))).alias("p")
        )
        .select("p.word", "p.mask")
    )
    filt = bench_pos.groupBy("word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    bits = [0] * BLOOM_WORDS
    for r in filt.collect():  # <= BLOOM_WORDS rows: O(const)
        bits[int(r["word"])] = int(r["bits"])

    flagged = (
        sh.where(~is_bench)
        .select(
            "doc_id",
            F.expr(_bloom_probe_expr("shingle", bits)).alias("flagged"),
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("flagged").cast("long").alias("n_flagged"),
        )
        .where(F.col("n_flagged") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_shingles"), 6).alias(
                "flagged_frac"
            ),
        )
    )


def bloom_decontaminate_sql() -> str:
    from gemmsql.pipeline.dedup import BENCH_MOD, SHINGLES_CTE

    bits = BLOOM_WORDS * BLOOM_BPW
    ks = ", ".join(str(i) for i in range(BLOOM_K))
    pos = (
        f"CAST('0x' || substring(md5(shingle || '#' || i), 1, 15)"
        f" AS BIGINT) % {bits}"
    )
    return f"""
WITH {SHINGLES_CTE},
bench AS (
  SELECT DISTINCT shingle FROM shingles WHERE doc_id % {BENCH_MOD} = 0
),
bpos AS (
  SELECT ({pos}) // {BLOOM_BPW} AS word,
         CAST(1 AS BIGINT) << CAST(({pos}) % {BLOOM_BPW} AS INT) AS mask
  FROM bench, UNNEST([{ks}]) AS t(i)
),
filt AS (SELECT word, BIT_OR(mask) AS bits FROM bpos GROUP BY word),
probe AS (
  SELECT doc_id, shingle,
         ({pos}) // {BLOOM_BPW} AS word,
         CAST(1 AS BIGINT) << CAST(({pos}) % {BLOOM_BPW} AS INT) AS mask
  FROM shingles, UNNEST([{ks}]) AS t(i)
  WHERE doc_id % {BENCH_MOD} <> 0
),
checked AS (
  SELECT p.doc_id, p.shingle,
         CASE WHEN f.bits IS NOT NULL AND (f.bits & p.mask) = p.mask
              THEN 1 ELSE 0 END AS is_set
  FROM probe p LEFT JOIN filt f ON f.word = p.word
),
per_shingle AS (
  SELECT doc_id, shingle,
         CASE WHEN SUM(is_set) = {BLOOM_K} THEN 1 ELSE 0 END AS flagged
  FROM checked GROUP BY doc_id, shingle
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(flagged) AS BIGINT) AS n_flagged,
       ROUND(CAST(SUM(flagged) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS flagged_frac
FROM per_shingle GROUP BY doc_id
HAVING SUM(flagged) > 0
"""


# ------------------------------------------------- count-min sketch

CM_D = 4                # hash rows
CM_W = 1024             # counters per row; eps ~ e/W, delta ~ e^-D
CM_PANEL_MOD = 101      # candidate panel: words of every 101st doc


def _cm_pos_expr(col: str, k: int) -> str:
    """SQL bigint: md5-derived counter index of ``col`` in hash row
    ``k`` — shared by build and probe (and mirrored in the DuckDB
    twin) so the sketch replays exactly."""
    return (
        f"pmod(CAST(conv(substring(md5(concat({col}, '#{k}')),"
        f" 1, 15), 16, 10) AS BIGINT), {CM_W})"
    )


def _cm_pos_structs(col: str = "word") -> str:
    return ", ".join(
        f"struct(CAST({k} AS BIGINT) AS k,"
        f" {_cm_pos_expr(col, k)} AS pos)"
        for k in range(CM_D)
    )


def cm_sketch(tokens: DataFrame, col: str = "word") -> DataFrame:
    """Count-min sketch state of a token stream -> (k, pos, c) with
    per-counter SUM aggregation.

    Per-(row, counter) SUM is a monoid, so this SAME function works on
    a STREAMING DataFrame unchanged: ``groupBy(k, pos).count()`` in
    complete/update mode maintains the sketch as streaming state —
    D * W longs total regardless of token cardinality (parity with the
    batch sketch is asserted in tests/test_streaming.py, the same
    discipline as :func:`hll_registers`)."""
    return (
        tokens.select(
            F.explode(F.expr(f"array({_cm_pos_structs(col)})")).alias("p")
        )
        .groupBy("p.k", "p.pos")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the corpus token stream ->
    top-20 ``(word, est_count, exact_count)`` — the third sketch
    family (HLL: distinct counts; Bloom: membership; count-min:
    frequencies), i.e. the sub-linear path to "which tokens dominate
    100 TB" without a vocabulary-sized exact count.

    Construction (identical in :func:`cm_heavy_hitters_sql`):

    - every corpus token increments ``CM_D`` = 4 md5-derived counters
      (one per hash row) in a 4 x 1024 table — per-(row, counter) SUM
      is a monoid, so Spark runs it as one partial+final aggregate
      whose exchange carries at most D*W = 4096 keys no matter how
      many tokens stream through (and the SAME groupBy would maintain
      the sketch as streaming state, like the HLL registers);
    - the probe panel is the distinct words of every
      ``CM_PANEL_MOD``-th document (deterministic md5-free doc_id
      gate) — the "candidate set" a production pipeline tracks
      alongside the sketch;
    - ``est_count`` = min over the D counters each panel word hashes
      to (classic count-min upper bound: est >= exact always, with
      overestimate ~ eps * stream length);
    - ``exact_count`` rides along for the panel only (a panel-bounded
      broadcast semi-join + count — cheap because the panel is small,
      and it makes the sketch's guarantee auditable in the output);
    - top-20 by (est_count DESC, word ASC) — a TakeOrderedAndProject,
      never a global sort.

    Scale shape: one corpus token pass into the 4096-key sketch agg,
    one panel-filtered token pass for the exact counts; the sketch
    (4096 rows) and the panel BROADCAST onto their joins.  No
    vocabulary-sized shuffle anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )

    pos_structs = _cm_pos_structs()
    sketch = cm_sketch(words)

    panel = (
        words.where(F.col("doc_id") % CM_PANEL_MOD == 0)
        .select("word")
        .distinct()
    )
    est = (
        panel.select(
            "word", F.explode(F.expr(f"array({pos_structs})")).alias("p")
        )
        .select("word", F.col("p.k").alias("k"), F.col("p.pos").alias("pos"))
        .join(F.broadcast(sketch), ["k", "pos"])
        .groupBy("word")
        .agg(F.min("c").alias("est_count"))
    )
    exact = (
        words.join(F.broadcast(panel), "word")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    return (
        est.join(exact, "word")
        .orderBy(F.col("est_count").desc(), F.col("word"))
        .limit(20)
    )


def cm_heavy_hitters_sql() -> str:
    ks = ", ".join(str(k) for k in range(CM_D))
    pos = (
        f"CAST('0x' || substring(md5(word || '#' || k), 1, 15)"
        f" AS BIGINT) % {CM_W}"
    )
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
sketch AS (
  SELECT t.k AS k, {pos.replace('|| k', '|| t.k')} AS pos, COUNT(*) AS c
  FROM words, UNNEST([{ks}]) AS t(k)
  GROUP BY 1, 2
),
panel AS (
  SELECT DISTINCT word FROM words WHERE doc_id % {CM_PANEL_MOD} = 0
),
est AS (
  SELECT panel.word, MIN(sketch.c) AS est_count
  FROM panel, UNNEST([{ks}]) AS t(k)
  JOIN sketch ON sketch.k = t.k
    AND sketch.pos = ({pos.replace('word || ', 'panel.word || ').replace("|| k", "|| t.k")})
  GROUP BY 1
),
exact AS (
  SELECT words.word, COUNT(*) AS exact_count
  FROM words JOIN panel ON words.word = panel.word
  GROUP BY 1
)
SELECT est.word, est.est_count, exact.exact_count
FROM est JOIN exact ON est.word = exact.word
ORDER BY est.est_count DESC, est.word
LIMIT 20
"""


# ---------------------------------------------------------------------------
# histogram quantile sketch — the fourth sketch family (HLL: distinct
# counts; Bloom: membership; count-min: frequency; histogram: rank /
# quantiles)

#: equi-width bin size for the order-price histogram (prices span
#: ~1e3..5e5, so ~500 bins per group).
HIST_BIN_W = 1_000
#: percentile ranks the gated query reports.
HIST_QS = (50, 90, 99)


def value_histogram(
    df: DataFrame, group_col: str, value_col: str, *, bin_w: int = HIST_BIN_W
) -> DataFrame:
    """Equi-width histogram state ``(g, bin, c)`` of ``value_col`` per
    ``group_col`` — the mergeable monoid under per-bin SUM.

    Like :func:`cm_sketch` and :func:`hll_registers`, this SAME plan
    runs on a STREAMING DataFrame unchanged: ``groupBy(g, bin)`` in
    complete/update mode maintains the histogram as bounded streaming
    state (groups x bins rows, independent of stream length); batch
    parity is asserted in tests/test_streaming.py."""
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.floor(F.col(value_col) / bin_w).cast("long").alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )


def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-priority price quantiles from a mergeable
    equi-width histogram -> ``(o_orderpriority, n_orders, p50, p90,
    p99)`` where each ``pXX`` is the lower edge of the bin holding
    rank ``ceil(n * XX / 100)``.

    Scale shape: the histogram ``groupBy(group, bin)`` is a mergeable
    monoid — Spark's map-side partial aggregation compresses every
    partition to at most ``n_bins`` rows before the shuffle, so the
    exchanged volume is O(groups x bins) regardless of corpus size:
    the classic way to get quantiles without a global sort (exact
    distributed quantiles need one; cf. the rotation-tier
    ``segment_quantiles``, which pays it).  The cumulative window runs
    per group over <= n_bins rows — driver-free and skew-free.

    Determinism: bin ids, counts and rank thresholds are integers
    (``ceil`` via ``(n*q + 99) div 100``); the only float op is the
    IEEE divide in ``floor(price / bin_w)``, identical on both
    engines — so the sketch replays bit-for-bit in DuckDB."""
    hist = value_histogram(
        load_table(spark, sf_dir, "orders"), "o_orderpriority",
        "o_totalprice",
    ).withColumnRenamed("g", "o_orderpriority")
    return quantiles_from_histogram(
        hist, ["o_orderpriority"], n_alias="n_orders"
    )


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    *,
    bin_w: int = HIST_BIN_W,
    qs: tuple[int, ...] = HIST_QS,
    n_alias: str = "n",
) -> DataFrame:
    """Rank-extraction over mergeable histogram state ``(*group_cols,
    bin, c)`` -> ``(*group_cols, n_alias, p{q}...)``: each ``pXX`` is
    the lower edge of the bin holding rank ``ceil(n * XX / 100)``.

    Shared by the batch gate (:func:`hist_quantiles`) and the
    streaming gate (``streaming.windows.streaming_hist_gate``), whose
    state frames differ only in grouping columns.  The cumulative
    window runs per group over <= n_bins rows — driver-free,
    skew-free, integer-exact (``ceil`` as ``(n*q + 99) div 100``)."""
    from pyspark.sql import Window as W

    wcum = (
        W.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    qcols = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {q} + 99) div 100"),
                F.col("bin") * bin_w,
            )
        )
        .cast("long")
        .alias(f"p{q}")
        for q in qs
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("n").cast("long").alias(n_alias), *qcols
    )


_HIST_Q_COLS = ",\n".join(
    f"       CAST(MIN(CASE WHEN cum >= (n * {q} + 99) // 100 "
    f"THEN bin * {HIST_BIN_W} END) AS BIGINT) AS p{q}"
    for q in HIST_QS
)

HIST_QUANTILES_SQL = f"""
WITH hist AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice / {HIST_BIN_W}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, bin,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM hist
)
SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_orders,
{_HIST_Q_COLS}
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the fifth sketch family,
# and the only one with SET OPERATIONS: union, Jaccard, and
# intersection estimates between groups from fixed-size state
# (Bar-Yossef et al. 2002; Beyer et al. 2007 unbiased estimator).
# HLL registers union-merge but cannot intersect; KMV's state — the k
# smallest distinct hash values — is a uniform bottom-k sample of the
# key's hash space, so any set algebra that works on samples works on
# sketches.

KMV_K = 256                      # rel. std err ~ 1/sqrt(k-2) ~ 6.3%
_KMV_SPACE = float(1 << 60)      # md5-derived h60 is uniform on [0, 2^60)


def _h60_expr(id_col: str):
    """First 60 bits of md5(id) — the same deterministic hash the HLL
    sketch rides (:func:`hll_registers`), so both engines place every
    id at the same point of the hash space and duplicates collapse
    under set-union for free."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def kmv_sketch(
    df: DataFrame,
    *,
    key: str = "event_type",
    id_col: str = "user_id",
    k: int = KMV_K,
    strategy: str = "pandas",
) -> DataFrame:
    """``(key, s)`` with ``s`` = the ``k`` smallest DISTINCT 60-bit
    hashes of ``id_col`` per key, ascending — built as a
    ``make_monoid_op`` instance (the reference ``mk_GeMMMapReduce``
    contract, ref core.py:15-64): ``zero`` = empty set, ``proj_fold``
    = per-tile bottom-k, ``binary_reduce`` = union-then-cut (closed,
    associative, commutative — a true monoid, so the result is
    IDENTICAL under any partitioning / merge order, which is what lets
    the DuckDB twin replay it with a window rank).

    Scale shape: the Arrow path computes one bottom-k per (key, input
    partition) — state k longs per group per tile, NEVER the distinct
    key set — and the final merge shuffles only those partials:
    exchanged volume is O(groups x partitions x k), independent of id
    cardinality.  ``strategy="rows"`` runs the row-at-a-time
    ``aggregateByKey`` twin (compatibility path; equality of the two
    is pinned in tests/test_sketch_kmv.py).
    """
    from gemmsql.monoid import make_monoid_op

    key_t = dict(zip(df.schema.names, df.schema))[key].dataType.simpleString()
    out_schema = f"{key} {key_t}, s array<long>"
    hashed = df.select(key, _h60_expr(id_col).alias("h60"))

    if strategy == "rows":
        op = make_monoid_op(
            zero=tuple,
            lift=lambda row, acc: tuple(sorted(set(acc) | {row["h60"]})[:k]),
            merge=lambda a, b: tuple(sorted(set(a) | set(b))[:k]),
            finish=lambda acc: {"s": list(acc)},
            schema=out_schema,
        )
        return op(hashed, [key])

    def partials(sdf: DataFrame, keys):
        import numpy as np
        import pandas as pd

        def cut(pdf: "pd.DataFrame") -> "pd.DataFrame":
            u = np.unique(pdf["h60"].to_numpy())[:k]
            return pd.DataFrame({key: [pdf[key].iloc[0]], "s": [u]})

        return (
            sdf.withColumn("_pid", F.spark_partition_id())
            .groupBy(key, "_pid")
            .applyInPandas(cut, f"{key} {key_t}, s array<long>")
        )

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        u = np.unique(np.concatenate(list(pdf["s"])))[:k]
        return pd.DataFrame({key: [pdf[key].iloc[0]], "s": [u]})

    op = make_monoid_op(
        zero=tuple,
        lift=lambda row, acc: acc,
        merge=lambda a, b: a,
        pandas_partials=partials,
        pandas_merge=merge,
        pandas_merge_schema=out_schema,
    )
    return op(hashed, [key])


def _kmv_est(s, k: int = KMV_K):
    """Cardinality estimate from an ascending KMV array: exact size
    below saturation, else the Beyer et al. unbiased ``(k-1) * space /
    h_(k)`` — one float division, identical tokens in the twin."""
    return F.when(F.size(s) < k, F.size(s).cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE)
        / F.element_at(s, k).cast("double")
    )


def kmv_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct USER-DAY cardinality (reach in user-day units — the
    id cardinality that actually grows with corpus size, so the
    saturated estimator branch is live at the gate tier while the
    exact small-set branch is live at the pytest tier) AND set
    algebra per event_type, from KMV sketches -> tagged union
    ``(which, a, b, est)``:

    - ``card``: per-type distinct user-day estimate;
    - ``union`` / ``jaccard`` / ``inter``: for every type pair a < b,
      the union estimate, the Jaccard estimate ``rho`` (= overlap of
      the combined bottom-k with both sketches / k), and the
      intersection estimate ``rho * union_est`` — the queries HLL
      cannot answer (its registers destroy membership).

    Scale shape: sketches are built once (bounded monoid state, see
    :func:`kmv_sketch`); the pair stage is a self-join of GROUPS (a
    handful of rows x k-long arrays), broadcast-trivial at any corpus
    size — set algebra cost is O(groups^2 * k), corpus-independent.
    All set ops are JVM array functions on sorted arrays; the DuckDB
    twin replays them with list lambdas over the identical md5-derived
    hash space, so even the approximate answers hash-match.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.concat_ws(
            "/",
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("uid"),
    )
    sk = kmv_sketch(ev, id_col="uid")
    k = KMV_K
    card = sk.select(
        F.lit("card").alias("which"),
        F.col("event_type").alias("a"),
        F.lit("").alias("b"),
        F.round(_kmv_est(F.col("s")), 6).alias("est"),
    )
    x, y = sk.alias("x"), sk.alias("y")
    pairs = x.join(y, F.col("x.event_type") < F.col("y.event_type")).select(
        F.col("x.event_type").alias("a"),
        F.col("y.event_type").alias("b"),
        F.col("x.s").alias("sa"),
        F.col("y.s").alias("sb"),
    )
    uf = F.array_sort(F.array_union(F.col("sa"), F.col("sb")))
    p = pairs.select(
        "a",
        "b",
        "sa",
        "sb",
        uf.alias("uf"),
        F.slice(uf, 1, k).alias("ucut"),
        F.least(F.lit(k), F.size(uf)).alias("ku"),
    )
    ue = _kmv_est(F.col("uf"))
    n_common = F.size(
        F.array_intersect(F.col("ucut"), F.array_intersect("sa", "sb"))
    )
    rho = n_common.cast("double") / F.col("ku").cast("double")
    stats = p.select(
        "a", "b",
        F.round(ue, 6).alias("u_est"),
        F.round(rho, 6).alias("j_est"),
        F.round(rho * ue, 6).alias("i_est"),
    )

    def leg(which: str, col: str) -> DataFrame:
        return stats.select(
            F.lit(which).alias("which"), "a", "b", F.col(col).alias("est")
        )

    return card.unionByName(leg("union", "u_est")).unionByName(
        leg("jaccard", "j_est")
    ).unionByName(leg("inter", "i_est"))


_KMV_UE = (
    f"CASE WHEN len(uf) < {KMV_K} THEN CAST(len(uf) AS DOUBLE) "
    f"ELSE {float(KMV_K - 1)} * {_KMV_SPACE} / CAST(uf[{KMV_K}] AS DOUBLE) END"
)

KMV_REACH_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(
              CAST(user_id AS VARCHAR) || '/' || strftime(ts, '%Y-%m-%d')
         ), 1, 15) AS BIGINT) AS h60
  FROM events
),
r AS (
  SELECT event_type, h60,
         row_number() OVER (PARTITION BY event_type ORDER BY h60) AS rk
  FROM h
),
sk AS (
  SELECT event_type, list(h60 ORDER BY h60) AS s
  FROM r WHERE rk <= {KMV_K} GROUP BY 1
),
card AS (
  SELECT 'card' AS which, event_type AS a, '' AS b,
         ROUND(CASE WHEN len(s) < {KMV_K} THEN CAST(len(s) AS DOUBLE)
                    ELSE {float(KMV_K - 1)} * {_KMV_SPACE}
                         / CAST(s[{KMV_K}] AS DOUBLE) END, 6) AS est
  FROM sk
),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b, x.s AS sa, y.s AS sb,
         list_sort(list_distinct(list_concat(x.s, y.s))) AS uf
  FROM sk x JOIN sk y ON x.event_type < y.event_type
),
p AS (
  SELECT a, b, sa, sb, uf, uf[1:{KMV_K}] AS ucut,
         LEAST({KMV_K}, len(uf)) AS ku
  FROM pairs
),
stats AS (
  SELECT a, b,
         ROUND({_KMV_UE}, 6) AS u_est,
         ROUND(CAST(len(list_filter(ucut,
                    z -> list_contains(sa, z) AND list_contains(sb, z)))
                    AS DOUBLE) / CAST(ku AS DOUBLE), 6) AS j_est,
         ROUND(CAST(len(list_filter(ucut,
                    z -> list_contains(sa, z) AND list_contains(sb, z)))
                    AS DOUBLE) / CAST(ku AS DOUBLE) * ({_KMV_UE}), 6) AS i_est
  FROM p
)
SELECT 'card' AS which, a, b, est FROM card
UNION ALL SELECT 'union', a, b, u_est FROM stats
UNION ALL SELECT 'jaccard', a, b, j_est FROM stats
UNION ALL SELECT 'inter', a, b, i_est FROM stats
"""


# --------------------------------------------- persisted sketch store

def _store_dir(sf_dir: str) -> str:
    import os
    import tempfile

    from gemmsql.pipeline.staging import staged_dir_tag

    return os.path.join(
        tempfile.gettempdir(), f"gemmsql_hllstore_{staged_dir_tag(sf_dir)}"
    )


def stage_sketch_store(spark: SparkSession, sf_dir: str) -> str:
    """Persist DAILY HLL register states for the events table — the
    'sketch once, merge forever' half of incremental analytics.  In
    production each day's ingest job appends its own (day, group,
    reg, rho) partition; here all days are built in one pass and
    published atomically (the staging discipline of
    `pipeline/staging.py`).  The store is tiny by construction:
    <= 4096 rows per (day, group) no matter how many events the day
    held."""
    import os
    import shutil

    target = _store_dir(sf_dir)
    if os.path.exists(os.path.join(target, "_SUCCESS")):
        return target
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    regs = hll_registers(ev, key=["day", "event_type"])
    tmp = f"{target}.tmp{os.getpid()}"
    regs.repartition(1, "day").write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, target)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return target


def sketch_store_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reach rollups computed ONLY from persisted daily register
    states — the raw events are never rescanned.  Because
    register-max is the HLL merge monoid, merging stored day sketches
    gives BIT-IDENTICAL estimates to sketching the raw union (the
    direct-vs-incremental equality is pinned in
    tests/test_sketch_store.py): per event_type this emits one row
    per month-relative week ('2024-01-w2') plus an 'all' row.

    At 100 TB this is the whole point of the store: a weekly or
    lifetime reach query aggregates kilobytes of register state
    instead of re-shuffling the event log; the merge is one
    partial+final hash aggregate over (scope, group, reg).

    Oracle (``SKETCH_STORE_ROLLUP_SQL``): DuckDB rebuilds the day
    registers from raw events with the same md5 discipline and merges
    them identically — if persistence dropped, duplicated, or mangled
    one register, every downstream scope hash moves."""
    store = spark.read.parquet(stage_sketch_store(spark, sf_dir))
    week = F.expr(
        "concat(substring(day, 1, 7), '-w', "
        "cast((cast(substring(day, 9, 2) as int) - 1) div 7 + 1 as string))"
    )
    scoped = store.select(
        week.alias("scope"), "event_type", "reg", "rho"
    ).unionByName(
        store.select(
            F.lit("all").alias("scope"), "event_type", "reg", "rho"
        )
    )
    merged = scoped.groupBy("scope", "event_type", "reg").agg(
        F.max("rho").alias("rho")
    )
    return hll_estimate(merged, ["scope", "event_type"])


SKETCH_STORE_ROLLUP_SQL = f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h60
  FROM events
),
day_regs AS (
  SELECT day, event_type, h60 % {HLL_M} AS reg,
         MAX(CASE WHEN h60 // {HLL_M} = 0 THEN {HLL_WBITS + 1}
                  ELSE {HLL_WBITS + 1} - length(bin(h60 // {HLL_M})) END)
           AS rho
  FROM h GROUP BY 1, 2, 3
),
scoped AS (
  SELECT substring(day, 1, 7) || '-w' ||
         CAST((CAST(substring(day, 9, 2) AS INT) - 1) // 7 + 1 AS VARCHAR)
           AS scope,
         event_type, reg, rho
  FROM day_regs
  UNION ALL
  SELECT 'all' AS scope, event_type, reg, rho FROM day_regs
),
merged AS (
  SELECT scope, event_type, reg, MAX(rho) AS rho
  FROM scoped GROUP BY 1, 2, 3
),
est AS (
  SELECT scope, event_type,
         CAST(SUM(CAST(POWER(2.0, {HLL_WBITS + 1} - rho) AS BIGINT)) AS BIGINT)
           + ({HLL_M} - COUNT(*)) * {_TWO_W} AS s_total,
         {HLL_M} - COUNT(*) AS v
  FROM merged GROUP BY 1, 2
)
SELECT scope, event_type,
       CAST(FLOOR(
         CASE WHEN v > 0 AND
                   {_ALPHA_NUM} / (1.0 + 1.079 / {float(HLL_M)})
                   * {_M_SQ} * {float(_TWO_W)} / CAST(s_total AS DOUBLE)
                   <= {2.5 * HLL_M}
              THEN {float(HLL_M)} * LN({float(HLL_M)} / v)
              ELSE {_ALPHA_NUM} / (1.0 + 1.079 / {float(HLL_M)})
                   * {_M_SQ} * {float(_TWO_W)} / CAST(s_total AS DOUBLE)
         END + 0.5) AS BIGINT) AS approx_users
FROM est
"""


# ------------------------------------- bottom-k sample quantile sketch

SQK_K = 256                     # rank error ~ 1/sqrt(k) ~ 6%


def sample_quantile_sketch(
    df: DataFrame,
    *,
    key: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = SQK_K,
) -> DataFrame:
    """``(key, hs, vs)``: the ``k`` hash-smallest ROWS per key as a
    paired (hash, value-micros) sample — the sixth sketch family.
    ``md5(id)`` puts every row at a fixed point of the hash space, so
    keeping the bottom-k rows by hash is a deterministic UNIFORM row
    sample AND a monoid (merge = concatenate, re-sort by hash, cut to
    k — closed, associative, commutative), which is what KMV proved
    for distinct counting and this extends to order statistics:
    quantiles of the sample estimate quantiles of the group with
    ~1/sqrt(k) rank error (asserted in tests), and two sketches built
    on disjoint halves merge into EXACTLY the whole's sketch
    (test-pinned).

    Scale shape (the KMV discipline, `kmv_sketch`): one bottom-k per
    (key, input partition) — state is 2k longs per group per tile,
    never the group's rows — and the final merge shuffles only those
    partials: O(groups x partitions x k), independent of group size.
    Values ride as exact micros so the estimator is integer-exact
    until the final /1e6."""
    from gemmsql.monoid import make_monoid_op

    key_t = dict(zip(df.schema.names, df.schema))[key].dataType.simpleString()
    out_schema = f"{key} {key_t}, hs array<long>, vs array<long>"
    hashed = df.select(
        key,
        _h60_expr(id_col).alias("h60"),
        F.floor(F.col(value_col) * 1e6 + F.lit(0.5))
        .cast("long").alias("vm"),
    )

    def _cut(h, v):
        import numpy as np

        order = np.argsort(h, kind="stable")[:k]
        return h[order], v[order]

    def partials(sdf: DataFrame, keys):
        import numpy as np
        import pandas as pd

        def cut(pdf: "pd.DataFrame") -> "pd.DataFrame":
            h, v = _cut(pdf["h60"].to_numpy(), pdf["vm"].to_numpy())
            return pd.DataFrame(
                {key: [pdf[key].iloc[0]], "hs": [h], "vs": [v]}
            )

        return (
            sdf.withColumn("_pid", F.spark_partition_id())
            .groupBy(key, "_pid")
            .applyInPandas(cut, out_schema)
        )

    def merge(pdf: "pd.DataFrame"):
        import numpy as np
        import pandas as pd

        h = np.concatenate(list(pdf["hs"]))
        v = np.concatenate(list(pdf["vs"]))
        h, v = _cut(h, v)
        return pd.DataFrame({key: [pdf[key].iloc[0]], "hs": [h], "vs": [v]})

    op = make_monoid_op(
        zero=tuple,
        lift=lambda row, acc: acc,
        merge=lambda a, b: a,
        pandas_partials=partials,
        pandas_merge=merge,
        pandas_merge_schema=out_schema,
    )
    return op(hashed, [key])


#: quantile fractions as exact integer (numerator, denominator) pairs
#: so the order-statistic index floor(q * (n-1)) is computed with
#: integer div on BOTH engines — no float q, no cross-engine ulp risk
SQK_QUANTILES = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
                 ("p95", 19, 20))


def _sqk_quantiles_frame(sk: DataFrame, key: str) -> DataFrame:
    """The integer order-statistic picks over a paired bottom-k
    sketch -> (key, n_sample, p25, p50, p75, p95)."""
    cols = [
        F.round(
            F.element_at(
                F.array_sort("vs"),
                F.expr(
                    f"cast(({num} * (size(vs) - 1)) div {den} as int) + 1"
                ),
            ).cast("double") / F.lit(1e6),
            6,
        ).alias(name)
        for name, num, den in SQK_QUANTILES
    ]
    return sk.select(
        key, F.size("vs").cast("long").alias("n_sample"), *cols
    )


def sample_quantiles(
    spark: SparkSession, sf_dir: str, *, k: int = 64
) -> DataFrame:
    """Per event_type: value quantiles estimated from the bottom-k
    row sample -> (event_type, n_sample, p25, p50, p75, p95).  The
    estimator is the plain order statistic at integer index
    ``(num * (n-1)) div den`` over the sorted sample — exact integer
    picks on exact integer micros, so the DuckDB twin
    (``SAMPLE_QUANTILES_SQL``) reproduces it bit-for-bit via a window
    rank over the SAME md5 bottom-k sample.  ``k=64`` at gate scale
    so the cut genuinely discards rows."""
    sk = sample_quantile_sketch(
        load_table(spark, sf_dir, "events"), k=k
    )
    return _sqk_quantiles_frame(sk, "event_type")


def segment_value_quantiles(
    spark: SparkSession, sf_dir: str, *, k: int = 64
) -> DataFrame:
    """The sketch family's production call site (VERDICT r12 next
    #10, the segment_quantiles shape retired in r3): event-value
    quantiles PER CUSTOMER MARKET SEGMENT — events enrich against the
    broadcast customer dim, then the bottom-k paired sample folds per
    segment.  At 100 TB the difference from the exact formulation is
    the whole point: state per (segment, partition) is 2k longs, the
    final shuffle moves only sketch partials, and no segment's rows
    are ever collected or globally sorted.  The twin replays the SAME
    md5 bottom-k sample bit-for-bit; the ~1/sqrt(k) rank-error bound
    against EXACT quantiles is pinned in tests/test_sketch_store.py."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        load_table(spark, sf_dir, "events")
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"), "event_id", "value"
        )
    )
    sk = sample_quantile_sketch(enriched, key="segment", k=k)
    return _sqk_quantiles_frame(sk, "segment")


def _sqk_quantiles_sql(key: str, src_rel: str, k: int) -> str:
    """Shared DuckDB twin: the same md5 bottom-k sample via window
    rank, the same integer order-statistic picks, over any
    ``(key, event_id, value)`` relation."""
    picks = ",\n       ".join(
        f"ROUND(CAST(MAX(CASE WHEN vr = ({num} * (n - 1)) // {den} + 1 "
        f"THEN vm END) AS DOUBLE) / 1000000.0, 6) AS {name}"
        for name, num, den in SQK_QUANTILES
    )
    return f"""
WITH h AS (
  SELECT {key},
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h60,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vm
  FROM {src_rel}
),
r AS (
  SELECT {key}, vm,
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY h60) AS rn
  FROM h
),
s AS (SELECT {key}, vm FROM r WHERE rn <= {k}),
o AS (
  SELECT {key}, vm,
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY vm) AS vr,
         COUNT(*) OVER (PARTITION BY {key}) AS n
  FROM s
)
SELECT {key}, CAST(MAX(n) AS BIGINT) AS n_sample,
       {picks}
FROM o GROUP BY {key}
"""


def sample_quantiles_sql(k: int = 64) -> str:
    return _sqk_quantiles_sql("event_type", "events", k)


def segment_value_quantiles_sql(k: int = 64) -> str:
    return _sqk_quantiles_sql(
        "segment",
        "(SELECT c_mktsegment AS segment, event_id, value"
        " FROM events JOIN customer ON user_id = c_custkey)",
        k,
    )
