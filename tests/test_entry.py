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
    for name in ["gram", "quality_classifier", "zip_shard_ingest",
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
    block = text[start:text.index("### Round-14 births")]
    queued = re.findall(r"^\| `([a-z0-9_]+)` \|", block, re.M)
    assert queued, "promotion queue table is empty or unparseable"
    rotation = {r[0] for r in _rotated()}
    gated = set(entrymod.queries())
    for name in queued:
        assert name in rotation, f"queued {name} has no rotation gate"
        assert name not in gated, f"queued {name} is already gated"
