"""Data-quality expectation engine: declarative rules evaluated in
as few Spark jobs as the rule mix allows, plus the gated report
query.

The Great-Expectations-shaped primitive every production pipeline
runs before (and after) itself: declare what must hold — not null,
unique, in range, in set, matches regex, foreign key — and get back
one row per rule with checked/violation counts.  At 100 TB the
evaluation PLAN is what matters:

- all ROW-LEVEL rules (not_null / in_range / in_set / regex) fuse
  into ONE aggregate pass over the table — a single scan computing
  ``SUM(CASE WHEN violated)`` per rule, however many rules there are;
- each UNIQUE rule is one hash aggregation on its key columns
  (``COUNT(*) - COUNT(DISTINCT ...)`` violations);
- each FOREIGN-KEY rule is one left-anti-join count against the
  referenced key set (broadcast when the dimension is small).

Nothing is per-rule-per-scan, nothing collects rows to the driver —
violation COUNTS are the report; violating-row extraction is a
follow-up filter the caller runs on the one rule they care about.

Regex rules use the portable subset (explicit character classes, no
``\\s``-style aliases) so Spark's Java regex and the oracle's RE2
agree — the repo-wide cross-engine regex discipline.

(No analog in the reference, ref:gemm_map_reduce.py:1;
training-data-pipeline tier.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind`` in {not_null, in_range, in_set,
    regex, unique, foreign_key}; row-level kinds use ``column`` +
    ``params``; ``unique`` uses ``columns``; ``foreign_key`` uses
    ``column`` and params ``ref`` (DataFrame) + ``ref_column``."""

    name: str
    kind: str
    column: str | None = None
    columns: tuple[str, ...] = ()
    params: dict = field(default_factory=dict)


#: kinds whose predicate is a pure per-row expression — these fuse
#: into one scan in both validate() and quarantine()
ROW_KINDS = ("not_null", "in_range", "in_set", "regex")


def _violation_expr(rule: Rule):
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return c.isNull() | (c < lo) | (c > hi)
    if rule.kind == "in_set":
        return c.isNull() | ~c.isin(list(rule.params["values"]))
    if rule.kind == "regex":
        return c.isNull() | ~c.rlike(rule.params["pattern"])
    raise ValueError(f"not a row-level rule: {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` -> one row per rule:
    ``(rule, kind, n_checked, n_violations, passed)``.  Row-level
    rules share one aggregate pass; see the module docstring for the
    per-kind plan shapes."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind in ROW_KINDS]
    out: DataFrame | None = None
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            aggs.append(
                F.sum(
                    F.when(_violation_expr(r), 1).otherwise(0)
                ).alias(f"__v{i}")
            )
        wide = df.agg(*aggs)
        # one wide row -> one narrow row per rule, still JVM-side
        stacked = wide.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.lit(r.kind).alias("kind"),
                        F.col("__n").cast("long").alias("n_checked"),
                        F.col(f"__v{i}").cast("long").alias("n_violations"),
                    )
                    for i, r in enumerate(row_rules)
                ])
            ).alias("r")
        ).select("r.*")
        out = stacked
    for r in rules:
        if r.kind == "unique":
            cols = [F.col(c) for c in r.columns]
            one = df.agg(
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*cols)
                ).cast("long").alias("n_violations"),
            ).select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                "n_checked",
                "n_violations",
            )
            out = one if out is None else out.unionByName(one)
        elif r.kind == "foreign_key":
            ref = r.params["ref"].select(
                F.col(r.params["ref_column"]).alias(r.column)
            ).distinct()
            # default NOT broadcast (ADVICE r9 #4): the referenced key
            # set is often fact-scale (orders for a lineitem FK), and a
            # forced broadcast of it OOMs at large sf.  Small-dimension
            # suites opt in with params={"broadcast": True}; otherwise
            # AQE picks the strategy from runtime sizes.
            orphans = df.select(r.column).join(
                F.broadcast(ref) if r.params.get("broadcast", False) else ref,
                r.column,
                "left_anti",
            )
            one = df.agg(
                F.count(F.lit(1)).cast("long").alias("n_checked")
            ).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_violations")
                )
            ).select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                "n_checked",
                "n_violations",
            )
            out = one if out is None else out.unionByName(one)
        elif r.kind not in ROW_KINDS:
            raise ValueError(f"unknown rule kind {r.kind}")
    assert out is not None, "no rules given"
    return out.select(
        "rule",
        "kind",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).cast("long").alias("passed"),
    )


# ---------------------------------------------------- gated corpus query

def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectation suite over orders/lineitem — a mix chosen so
    several rules FAIL with nonzero counts (counting is what the hash
    gates, not just pass flags): a deliberately tight price range, a
    status set missing 'P', plus structurally-true not-null / unique /
    regex / FK rules."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rules = [
        Rule("custkey_not_null", "not_null", column="o_custkey"),
        Rule("price_band", "in_range", column="o_totalprice",
             params={"lo": 1000.0, "hi": 300000.0}),
        Rule("status_known", "in_set", column="o_orderstatus",
             params={"values": ("O", "F")}),
        Rule("priority_format", "regex", column="o_orderpriority",
             params={"pattern": "^[1-5]-[A-Z]+$"}),
        Rule("orderkey_unique", "unique", columns=("o_orderkey",)),
        Rule("custkey_date_unique", "unique",
             columns=("o_custkey", "o_orderdate")),
    ]
    report = validate(orders, rules)
    fk = validate(
        lineitem,
        [Rule("lineitem_fk_orders", "foreign_key", column="l_orderkey",
              params={"ref": orders, "ref_column": "o_orderkey"})],
    )
    return report.unionByName(fk)


DQ_ORDERS_REPORT_SQL = """
SELECT 'custkey_not_null' AS rule, 'not_null' AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'price_band', 'in_range', COUNT(*),
       SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 1000.0
                     OR o_totalprice > 300000.0 THEN 1 ELSE 0 END)
FROM orders
UNION ALL
SELECT 'status_known', 'in_set', COUNT(*),
       SUM(CASE WHEN o_orderstatus IS NULL
                     OR o_orderstatus NOT IN ('O', 'F')
                THEN 1 ELSE 0 END)
FROM orders
UNION ALL
SELECT 'priority_format', 'regex', COUNT(*),
       SUM(CASE WHEN o_orderpriority IS NULL
                     OR NOT regexp_matches(o_orderpriority,
                                           '^[1-5]-[A-Z]+$')
                THEN 1 ELSE 0 END)
FROM orders
UNION ALL
SELECT 'orderkey_unique', 'unique', COUNT(*),
       COUNT(*) - COUNT(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'custkey_date_unique', 'unique', COUNT(*),
       COUNT(*) - COUNT(DISTINCT (CAST(o_custkey AS VARCHAR) || '|'
                                  || CAST(o_orderdate AS VARCHAR)))
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders', 'foreign_key',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
"""

_DQ_WRAP = f"""
SELECT rule, kind,
       CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS passed
FROM ({DQ_ORDERS_REPORT_SQL.strip()})
"""
DQ_ORDERS_REPORT_SQL = _DQ_WRAP


def quarantine(
    df: DataFrame, rules: list[Rule], id_cols: list[str]
) -> DataFrame:
    """The expectations pattern's other half (VERDICT r9 next #5, all
    four kinds since r11 — VERDICT r10 next #3): the violating ROWS of
    every rule, routed out as ``(rule, *id_cols)``.

    Plan shape per kind, mirroring :func:`validate`:

    - **row-level** (not_null / in_range / in_set / regex): each row
      evaluates the SAME per-rule predicates the fused report uses
      (``_violation_expr``), collected into an array of failing rule
      names; ``array_compact`` drops the passes and ``explode`` drops
      clean rows entirely — a row violating k rules yields k
      quarantine rows, a clean row costs nothing downstream, and ALL
      row rules share ONE pruned scan however many there are.
    - **unique**: every member of a duplicated key group via one
      window count over the rule's columns (the projection of the
      report's ``COUNT(*) - COUNT(DISTINCT)`` check).
    - **foreign_key**: the left-anti join the report counts, keeping
      the orphaned rows instead (broadcast of the referenced key set
      stays opt-in — ADVICE r9 #4).

    Unique/FK are irreducibly more than a row predicate (a shuffle on
    the key), so they union onto the row-rule scan as their own
    branches — nothing is per-rule-per-scan beyond that."""
    from pyspark.sql import Window as W

    row_rules = [r for r in rules if r.kind in ROW_KINDS]
    ids = [F.col(c) for c in id_cols]
    out: DataFrame | None = None
    if row_rules:
        tags = F.array(*[
            F.when(_violation_expr(r), F.lit(r.name)) for r in row_rules
        ])
        out = df.select(
            F.explode(F.array_compact(tags)).alias("rule"), *ids
        )
    for r in rules:
        if r.kind == "unique":
            w = W.partitionBy(*[F.col(c) for c in r.columns])
            one = (
                df.withColumn("__n", F.count(F.lit(1)).over(w))
                .where(F.col("__n") > 1)
                .select(F.lit(r.name).alias("rule"), *ids)
            )
            out = one if out is None else out.unionByName(one)
        elif r.kind == "foreign_key":
            ref = r.params["ref"].select(
                F.col(r.params["ref_column"]).alias(r.column)
            ).distinct()
            one = df.join(
                F.broadcast(ref) if r.params.get("broadcast", False) else ref,
                r.column,
                "left_anti",
            ).select(F.lit(r.name).alias("rule"), *ids)
            out = one if out is None else out.unionByName(one)
        elif r.kind not in ROW_KINDS:
            raise ValueError(f"unknown rule kind {r.kind}")
    if out is None:
        raise ValueError("quarantine needs at least one rule")
    return out


def dq_orders_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated quarantine twin of :func:`dq_orders_report`: the
    violating ROWS ``(rule, o_orderkey)`` of the same row-level suite
    — the three deliberately failing rules contribute every row, the
    structurally-true one contributes none, and the DuckDB oracle is
    one WHERE-clause twin per rule, so row membership (not just the
    counts) is hash-load-bearing."""
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        Rule("custkey_not_null", "not_null", column="o_custkey"),
        Rule("price_band", "in_range", column="o_totalprice",
             params={"lo": 1000.0, "hi": 300000.0}),
        Rule("status_known", "in_set", column="o_orderstatus",
             params={"values": ("O", "F")}),
        Rule("priority_format", "regex", column="o_orderpriority",
             params={"pattern": "^[1-5]-[A-Z]+$"}),
    ]
    return quarantine(orders, rules, ["o_orderkey"]).select(
        "rule", F.col("o_orderkey").cast("long").alias("o_orderkey")
    )


DQ_ORDERS_QUARANTINE_SQL = """
SELECT 'custkey_not_null' AS rule, CAST(o_orderkey AS BIGINT) AS o_orderkey
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'price_band', o_orderkey FROM orders
WHERE o_totalprice IS NULL OR o_totalprice < 1000.0
      OR o_totalprice > 300000.0
UNION ALL
SELECT 'status_known', o_orderkey FROM orders
WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F')
UNION ALL
SELECT 'priority_format', o_orderkey FROM orders
WHERE o_orderpriority IS NULL
      OR NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
"""


def dq_orders_quarantine_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quarantine across ALL FOUR rule kinds (VERDICT r10 next #3)
    -> ``(rule, o_orderkey)``: the three deliberately failing row
    rules plus a structurally-true one, a unique rule with real
    duplicate groups ((o_custkey, o_orderdate) pairs repeat), and a
    foreign-key rule against a RESTRICTED customer set (non-BUILDING
    segments) so the anti-join keeps real orphans.  Row membership of
    every branch — the single-scan row explode, the window dup
    projection, and the anti-join survivors — is hash-load-bearing."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        Rule("custkey_not_null", "not_null", column="o_custkey"),
        Rule("price_band", "in_range", column="o_totalprice",
             params={"lo": 1000.0, "hi": 300000.0}),
        Rule("status_known", "in_set", column="o_orderstatus",
             params={"values": ("O", "F")}),
        Rule("priority_format", "regex", column="o_orderpriority",
             params={"pattern": "^[1-5]-[A-Z]+$"}),
        Rule("custkey_date_unique", "unique",
             columns=("o_custkey", "o_orderdate")),
        Rule("custkey_nonbuilding_fk", "foreign_key", column="o_custkey",
             params={
                 "ref": customer.where(
                     F.col("c_mktsegment") != "BUILDING"
                 ),
                 "ref_column": "c_custkey",
                 # the referenced key set is customer-dimension sized
                 "broadcast": True,
             }),
    ]
    return quarantine(orders, rules, ["o_orderkey"]).select(
        "rule", F.col("o_orderkey").cast("long").alias("o_orderkey")
    )


DQ_ORDERS_QUARANTINE_FULL_SQL = """
SELECT 'custkey_not_null' AS rule, CAST(o_orderkey AS BIGINT) AS o_orderkey
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'price_band', o_orderkey FROM orders
WHERE o_totalprice IS NULL OR o_totalprice < 1000.0
      OR o_totalprice > 300000.0
UNION ALL
SELECT 'status_known', o_orderkey FROM orders
WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F')
UNION ALL
SELECT 'priority_format', o_orderkey FROM orders
WHERE o_orderpriority IS NULL
      OR NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
UNION ALL
SELECT 'custkey_date_unique', o_orderkey FROM (
  SELECT o_orderkey,
         COUNT(*) OVER (PARTITION BY o_custkey, o_orderdate) AS n
  FROM orders
) WHERE n > 1
UNION ALL
SELECT 'custkey_nonbuilding_fk', o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment <> 'BUILDING')
"""


def violations(df: DataFrame, rule: Rule) -> DataFrame:
    """The drill-down half of the report: the rows that violate ONE
    rule.  Row-level kinds are a plain filter (predicate pushdown
    applies — at 100 TB this is a pruned scan, not a second pass over
    the report); ``unique`` returns every row of a duplicated key
    group via a window count; ``foreign_key`` is the anti-join
    itself."""
    if rule.kind in ROW_KINDS:
        return df.where(_violation_expr(rule))
    if rule.kind == "unique":
        from pyspark.sql import Window as W

        w = W.partitionBy(*[F.col(c) for c in rule.columns])
        return (
            df.withColumn("__n", F.count(F.lit(1)).over(w))
            .where(F.col("__n") > 1)
            .drop("__n")
        )
    if rule.kind == "foreign_key":
        ref = rule.params["ref"].select(
            F.col(rule.params["ref_column"]).alias(rule.column)
        ).distinct()
        if rule.params.get("broadcast", False):
            ref = F.broadcast(ref)
        return df.join(ref, rule.column, "left_anti")
    raise ValueError(f"unknown rule kind {rule.kind}")
