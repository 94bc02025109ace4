"""DQ expectation engine: known-violation unit fixtures and the
one-scan plan pin for fused row-level rules."""

from __future__ import annotations

import pytest

from gemmsql.pipeline.dq import Rule, validate


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "O", "1-URGENT"),
        (2, None, "F", "5-LOW"),        # null price
        (2, 999.0, "X", "9-BAD"),       # dup key, bad status, bad regex
        (3, 50.0, "O", None),           # null priority
    ]
    return spark.createDataFrame(
        rows, "k long, price double, status string, prio string"
    )


def test_known_violation_counts(spark, frame):
    ref = spark.createDataFrame([(1,), (3,)], "rk long")
    out = {
        r["rule"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in validate(frame, [
            Rule("k_not_null", "not_null", column="k"),
            Rule("price_ok", "in_range", column="price",
                 params={"lo": 0.0, "hi": 100.0}),
            Rule("status_ok", "in_set", column="status",
                 params={"values": ("O", "F")}),
            Rule("prio_ok", "regex", column="prio",
                 params={"pattern": "^[1-5]-[A-Z]+$"}),
            Rule("k_unique", "unique", columns=("k",)),
            Rule("k_fk", "foreign_key", column="k",
                 params={"ref": ref, "ref_column": "rk"}),
        ]).collect()
    }
    assert out["k_not_null"] == (4, 0, 1)
    assert out["price_ok"] == (4, 2, 0)      # null + 999.0
    assert out["status_ok"] == (4, 1, 0)     # 'X'
    assert out["prio_ok"] == (4, 2, 0)       # '9-BAD' + null
    assert out["k_unique"] == (4, 1, 0)      # k=2 twice
    assert out["k_fk"] == (4, 2, 0)          # both k=2 rows orphaned


def test_row_level_rules_fuse_into_one_scan(spark, frame):
    """However many row-level rules, the plan must contain exactly
    ONE scan of the input — the fused-aggregate contract that makes
    a 50-rule suite affordable at 100 TB."""
    plan = validate(frame, [
        Rule("a", "not_null", column="k"),
        Rule("b", "in_range", column="price", params={"lo": 0, "hi": 1}),
        Rule("c", "in_set", column="status", params={"values": ("O",)}),
        Rule("d", "regex", column="prio", params={"pattern": "^x$"}),
    ])._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("LocalTableScan") + plan.count("Scan ")
    assert scans == 1, plan


def test_unknown_rule_kind_rejected(frame):
    with pytest.raises(ValueError):
        validate(frame, [Rule("zz", "between", column="k")])


def test_violations_extraction(spark, frame):
    from gemmsql.pipeline.dq import violations

    bad_range = violations(
        frame,
        Rule("r", "in_range", column="price", params={"lo": 0.0, "hi": 100.0}),
    ).collect()
    assert sorted(r["price"] for r in bad_range if r["price"] is not None) == [999.0]
    assert len(bad_range) == 2  # the null price row too

    dupes = violations(frame, Rule("u", "unique", columns=("k",))).collect()
    assert sorted(r["k"] for r in dupes) == [2, 2]

    ref = spark.createDataFrame([(1,), (3,)], "rk long")
    orphans = violations(
        frame,
        Rule("f", "foreign_key", column="k",
             params={"ref": ref, "ref_column": "rk"}),
    ).collect()
    assert sorted(r["k"] for r in orphans) == [2, 2]


def test_quarantine_rows(spark, frame):
    """Quarantine returns (rule, id) for every row-level violation —
    a row violating k rules yields k rows; clean rows vanish."""
    from gemmsql.pipeline.dq import quarantine

    rules = [
        Rule("k_not_null", "not_null", column="k"),
        Rule("price_ok", "in_range", column="price",
             params={"lo": 0.0, "hi": 100.0}),
        Rule("status_ok", "in_set", column="status",
             params={"values": ("O", "F")}),
        Rule("prio_ok", "regex", column="prio",
             params={"pattern": "^[1-5]-[A-Z]+$"}),
    ]
    got = sorted(
        (r["rule"], r["k"])
        for r in quarantine(frame, rules, ["k"]).collect()
    )
    assert got == [
        ("price_ok", 2), ("price_ok", 2),     # null price + 999.0
        ("prio_ok", 2), ("prio_ok", 3),       # '9-BAD' + null prio
        ("status_ok", 2),                     # 'X'
    ]
    with pytest.raises(ValueError):
        quarantine(frame, [], ["k"])


def test_quarantine_unique_and_fk_rows(spark, frame):
    """All-kinds quarantine (r11): unique routes EVERY member of a
    duplicated key group; foreign_key routes the anti-join survivors
    — row membership, not counts."""
    from gemmsql.pipeline.dq import quarantine

    ref = spark.createDataFrame([(1,), (3,)], "rk long")
    got = sorted(
        (r["rule"], r["k"])
        for r in quarantine(frame, [
            Rule("price_ok", "in_range", column="price",
                 params={"lo": 0.0, "hi": 100.0}),
            Rule("k_unique", "unique", columns=("k",)),
            Rule("k_fk", "foreign_key", column="k",
                 params={"ref": ref, "ref_column": "rk"}),
        ], ["k"]).collect()
    )
    assert got == [
        ("k_fk", 2), ("k_fk", 2),             # both k=2 rows orphaned
        ("k_unique", 2), ("k_unique", 2),     # both members of the group
        ("price_ok", 2), ("price_ok", 2),     # null price + 999.0
    ]


def test_quarantine_is_one_scan(spark, frame):
    """The quarantine projection must stay a single scan of the input
    — the fused report's per-row verdicts reused as a filter, not a
    per-rule pass."""
    from gemmsql.pipeline.dq import quarantine

    plan = quarantine(frame, [
        Rule("a", "not_null", column="k"),
        Rule("b", "in_range", column="price", params={"lo": 0, "hi": 1}),
        Rule("c", "in_set", column="status", params={"values": ("O",)}),
        Rule("d", "regex", column="prio", params={"pattern": "^x$"}),
    ], ["k"])._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("LocalTableScan") + plan.count("Scan ")
    assert scans == 1, plan


def test_quarantine_counts_match_report(spark):
    """Invariant tying the two halves together: per-rule quarantine
    row counts == the fused report's n_violations, on the gate suite
    itself."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from gemmsql.pipeline.dq import dq_orders_quarantine, dq_orders_report

    q = {
        r["rule"]: r["cnt"]
        for r in dq_orders_quarantine(spark, SF_SMOKE)
        .groupBy("rule").agg(F.count("*").alias("cnt")).collect()
    }
    rep = {
        r["rule"]: r["n_violations"]
        for r in dq_orders_report(spark, SF_SMOKE).collect()
        if r["kind"] in ("not_null", "in_range", "in_set", "regex")
    }
    for rule, n in rep.items():
        assert q.get(rule, 0) == n, rule
    assert sum(rep.values()) > 0  # the suite's failing rules fail
