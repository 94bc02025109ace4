"""Driver-contract tests for __spark_entry__."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["which", "j1", "j2", "val"]


def test_registry_fits_driver_gate():
    """The driver's correctness gate checks the FIRST 50 queries()
    entries; the registry must never exceed that (VERDICT r2 #1)."""
    assert len(entrymod.queries()) <= 50


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"
    # round 3: the md5-register HLL gave the sketch a replayable twin —
    # every registered query now has a full-parity oracle
    no_oracle = set(qs) - set(os_)
    assert no_oracle == set()


def test_package_root_exports_resolve():
    """Every name in gemmsql.__all__ must import from the package root
    (VERDICT r10 next #8 — the reference's empty __init__.py is a
    defect SURVEY.md §2 flags; ours stays current as ops are born)."""
    import gemmsql

    for name in gemmsql.__all__:
        assert callable(getattr(gemmsql, name)) or name == "Rule" or \
            getattr(gemmsql, name) is not None, name
    # the rule dataclass and a sample of each tier resolve to the
    # same objects as their home modules
    from gemmsql.pipeline.dq import quarantine
    from gemmsql.pipeline.media_split import split_mp3
    from gemmsql.streaming.windows import streaming_dq_gate

    assert gemmsql.quarantine is quarantine
    assert gemmsql.split_mp3 is split_mp3
    assert gemmsql.streaming_dq_gate is streaming_dq_gate


def test_queries_run_at_smoke_tier(spark):
    from tests.conftest import SF_SMOKE

    qs = entrymod.queries()
    for name in ["gram", "qoi_features", "zip_split_ingest",
                 "tfrecord_ingest"]:
        df = qs[name](spark, SF_SMOKE)
        assert df.count() > 0, name


def test_promotion_queue_names_real_surfaces():
    """The COVERAGE.md promotion queue (VERDICT r12 next #2) must
    stay auditable: every queued surface is a live rotation entry,
    and no queued surface is already in the driver gate."""
    import re

    from tests.test_rotation import _rotated

    text = open("/root/repo/COVERAGE.md").read()
    start = text.rindex("### Promotion queue")
    nxt = text.find("\n### ", start + 10)
    block = text[start:nxt if nxt != -1 else len(text)]
    if re.search(r"queue is EMPTY", block):
        # the target state (VERDICT r15 next #1: births <= promotions,
        # queue drained) — declared explicitly, not by a missing table
        return
    queued = re.findall(r"^\| `([a-z0-9_]+)` \|", block, re.M)
    assert queued, "promotion queue table is empty or unparseable"
    rotation = {r[0] for r in _rotated()}
    gated = set(entrymod.queries())
    for name in queued:
        assert name in rotation, f"queued {name} has no rotation gate"
        assert name not in gated, f"queued {name} is already gated"


def test_driver_ledger_matches_registry():
    """The generated driver-verification ledger (VERDICT r13 next #9)
    must track the registry exactly: every live query and every
    rotation surface appears with the right tier, and the last-round
    cells agree with a fresh parse of CORRECTNESS_r*.json — so a
    registry swap that forgets `python tools/gen_ledger.py` fails
    here instead of silently shipping a stale trust table.

    The parse is bounded by the ledger's own recorded AS-OF round
    (VERDICT r15 wrong #1, the structural fix): the driver writes
    CORRECTNESS_r{N}.json AFTER the round's final commit, so a frozen
    table compared against the moving disk went red by construction
    every round — now a strictly-newer file is simply outside the
    window the committed table claims to describe."""
    import re

    from tests.test_rotation import _rotated
    from tools.gen_ledger import BEGIN, END, last_driver_rounds

    text = open("/root/repo/COVERAGE.md").read()
    sec = text[text.index(BEGIN):text.index(END)]
    stamp = re.search(r"<!-- ledger-as-of: r(\d+) -->", sec)
    assert stamp, "ledger missing its as-of stamp — regenerate " \
        "(python tools/gen_ledger.py)"
    as_of = int(stamp.group(1))
    rows = dict(re.findall(r"^\| `([a-z0-9_]+)` \| (driver gate|rotation) \|",
                           sec, re.M))
    live = set(entrymod.queries())
    rotation = {r[0] for r in _rotated()}
    assert {n for n, t in rows.items() if t == "driver gate"} == live
    assert {n for n, t in rows.items() if t == "rotation"} == rotation
    # the last-round cells match a fresh mechanical parse, bounded
    # by the round the committed ledger was generated against
    last = last_driver_rounds(up_to=as_of)
    cells = {
        n: c.strip()
        for n, c in re.findall(
            r"^\| `([a-z0-9_]+)` \| (?:driver gate|rotation) \| ([^|]+) \|",
            sec, re.M)
    }
    for name in live | rotation:
        seen = last.get(name)
        want = f"r{seen}" if seen else None
        got = cells[name]
        if want is None:
            assert got in ("never",) or "pending" in got, (name, got)
        else:
            assert got == want, (name, got, want)
