#!/usr/bin/env python
"""Per-micro-batch profile of the streaming gates (guide §1: measure
first).  Monkeypatches ``_await_gate`` to capture each stream's
``recentProgress`` before stop, then prints a per-gate, per-batch
breakdown of ``durationMs`` (addBatch / walCommit / stateCommit /
queryPlanning / ...) so the drain floor is attributed, not guessed.

Usage: python tools/profile_gates.py [sf_dir] [gate ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPTURED: list[tuple[str, list[dict]]] = []


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gemmsql import get_spark
    from gemmsql.streaming import windows as W

    orig = W._await_gate

    def patched(q, timeout: int = 300) -> None:
        try:
            orig(q, timeout)
        finally:
            try:
                CAPTURED.append((q.name or "?", [
                    json.loads(p.json) for p in q.recentProgress
                ]))
            except Exception as e:  # noqa: BLE001
                print(f"# capture failed: {e}", file=sys.stderr)

    W._await_gate = patched

    spark = get_spark("gemmsql-gate-profile")
    qs = entrymod.queries()
    # warm the JVM + stage the shared stream dir outside any timing
    import tempfile
    from gemmsql.streaming.windows import stage_stream_dir
    tag = os.path.basename(sf_dir.rstrip("/"))
    stage_stream_dir(spark, sf_dir, os.path.join(
        tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}"))

    for name, fn in qs.items():
        if not name.startswith("streaming_"):
            continue
        if only and name not in only:
            continue
        fn(spark, sf_dir).count()  # warm: JIT + staging outside timing
        CAPTURED.clear()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        print(f"\n=== {name}: {wall:.3f}s, out_rows={n}")
        for qname, progresses in CAPTURED:
            tot_batches = len(progresses)
            print(f"  stream {qname}: {tot_batches} batches")
            for p in progresses:
                d = p.get("durationMs", {})
                rows = p.get("numInputRows", 0)
                so = p.get("stateOperators", [])
                st = sum(s.get("commitTimeMs", 0) for s in so)
                mem = sum(s.get("memoryUsedBytes", 0) for s in so)
                print(
                    f"    batch {p.get('batchId')}: rows={rows} "
                    f"trigger={d.get('triggerExecution')} "
                    f"addBatch={d.get('addBatch')} "
                    f"getBatch={d.get('getBatch')} "
                    f"latestOffset={d.get('latestOffset')} "
                    f"plan={d.get('queryPlanning')} "
                    f"wal={d.get('walCommit')} "
                    f"commitOff={d.get('commitOffsets')} "
                    f"stateCommit={st} stateMem={mem}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
