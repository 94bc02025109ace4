#!/usr/bin/env python
"""Larger-SF scaling spot-check (VERDICT r17 #6).

sf0.1 no longer exercises parallelism — after the r17/r18 overhead
work nearly every query sits at a scheduling/metadata floor where 8
cores match 32.  This tool builds a deterministic 10x tier (sfbig ~
"sf1") from sf0.1 by key-shifted row duplication, then times the top
wall queries at SPARK_GRAFT_CPUS 8 vs 32 in fresh sessions, so the
BASELINE.md scaling claim rests on measured data-bound ratios instead
of plan shape alone.

Usage:
  python tools/scale_spotcheck.py build          # materialize sfbig
  python tools/scale_spotcheck.py run [q ...]    # time 8 vs 32 cores
  python tools/scale_spotcheck.py child <cpus> <q>   (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SRC = "/root/testdata/sf0.1"
SF_BIG = "/tmp/gemmsql_sfbig"
COPIES = 10

#: (table, key column to shift) — only tables the spot-check queries
#: read are scaled; key shift keeps ids collision-free and preserves
#: modular predicates (shift = (max+1) rounded up to a multiple of 840
#: = lcm(2,3,4,5,6,7,8,10), so %k bucket predicates keep their classes)
TABLES = {
    "embeddings": "vec_id",
    "documents": "doc_id",
    "orders": "o_orderkey",
    "events": "event_id",
    "customer": None,
    "lineitem": None,
    "nation": None,
    "region": None,
    "part": None,
    "supplier": None,
}

QUERIES = [
    "ml_grads",
    "bm25_topk",
    "avi_frame_stats",
    "streaming_shard_ingest_gate",
    "streaming_partition_ivm_gate",
]


def build() -> None:
    from pyspark.sql import functions as F

    from gemmsql import get_spark

    spark = get_spark("sfbig-build")
    os.makedirs(SF_BIG, exist_ok=True)
    for name, key in TABLES.items():
        dest = os.path.join(SF_BIG, f"{name}.parquet")
        if os.path.exists(dest):
            continue
        df = spark.read.parquet(os.path.join(SF_SRC, f"{name}.parquet"))
        if key is None:
            df.write.mode("overwrite").parquet(dest)
            continue
        mx = df.agg(F.max(key)).collect()[0][0]
        shift = ((int(mx) // 840) + 1) * 840
        legs = [
            df.withColumn(key, (F.col(key) + F.lit(k * shift)).cast("long"))
            for k in range(COPIES)
        ]
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        out.write.mode("overwrite").parquet(dest)
        print(f"built {name}: {COPIES}x, shift {shift}")
    spark.stop()


def child(cpus: str, qname: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    import __spark_entry__ as entrymod

    from gemmsql import get_spark

    spark = get_spark("sfbig-spot")
    fn = entrymod.queries()[qname]

    def act():
        df = fn(spark, SF_BIG)
        if qname.startswith("streaming_"):
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()

    act()  # warm: JIT + one-time staging outside the timed window
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        act()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"q": qname, "cpus": int(cpus), "sec": min(times)}))
    spark.stop()


def run(only: list[str]) -> None:
    qs = only or QUERIES
    results: dict[str, dict[int, float]] = {}
    for q in qs:
        for cpus in ("32", "8"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "child", cpus, q],
                capture_output=True, text=True,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if not line:
                print(f"# {q}@{cpus}: FAILED\n{out.stderr[-1500:]}")
                continue
            r = json.loads(line[-1])
            results.setdefault(q, {})[r["cpus"]] = r["sec"]
            print(f"{q} @ {cpus} cores: {r['sec']:.3f}s")
    print("\nquery, sec@8, sec@32, ratio(8/32)")
    for q, r in results.items():
        if 8 in r and 32 in r:
            print(f"{q}: {r[8]:.3f} / {r[32]:.3f} = {r[8] / r[32]:.2f}x")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "build":
        build()
    elif mode == "child":
        child(sys.argv[2], sys.argv[3])
    else:
        run(sys.argv[2:])
