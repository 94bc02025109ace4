#!/usr/bin/env python
"""Benchmark runner for the gemmsql engine.

Runs every ``__spark_entry__.queries()`` entry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, using the reference's measurement shape
(warmup + timed runs — reference core.py:118-131) with a noop-sink
action so results are computed but never collected.

Round-6 protocol (VERDICT r5 next #2): this box has a documented
session-level JVM/GC mode — a whole SparkSession occasionally runs
2x slower (BASELINE.md: five identical runs totalled 68.9/35.0/33.5/
34.0/33.0 s), so any single-session statistic is variance-limited no
matter how many in-session repeats it takes.  The driver-visible
number is therefore the PER-QUERY MEDIAN ACROSS ``$BENCH_SESSIONS``
(default 3) FRESH SESSIONS, each a subprocess with its own JVM: one
slow session out of three cannot move any median.  Set
``BENCH_SESSIONS=1`` for the old single-session behavior (used for
quick iteration and by the child processes themselves).

Round-13 protocol amendment (VERDICT r12 next #3): each fresh session
runs ONE untimed throwaway query before any timed run.  The r12
drifter profile isolated a cold-JIT confound — the first query
executed in a fresh JVM pays ~1.2-2x for whole-stage-codegen /
JIT compilation that every later query gets for free, and with
1-warmup+1-timed per query that cost still lands inside the first
query's measured window often enough to swing its cross-round series
(entropy: 0.39x-2.78x across six rounds on an identical plan).  The
session warmer runs the entropy gate itself (the shared score-join +
two-agg logsumexp shape) plus a trivial parquet scan, untimed, so
every timed query — including the first — starts against a warmed
JVM.  Anchors from round 13 on are recorded under this protocol
(BASELINE.md round-13 section).

Prints ONE JSON line:
  {"metric": ..., "value": <total of per-query medians>, "unit": "sec",
   "queries": {name: median_sec}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

# no sys.path mutation: python adds the script dir (repo root) itself,
# and `gemmsql` is a real installable package (pyproject.toml)

WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))
RUNS = int(os.environ.get("BENCH_RUNS", "1"))
SESSIONS = int(os.environ.get("BENCH_SESSIONS", "3"))
# wall budget for the whole multi-session run: stop launching sessions
# when the elapsed time plus one more session (estimated from the
# slowest so far) would exceed it, and hard-kill a hung session — the
# driver must always get its one JSON line
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def run_action(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_session(sf_dir: str):
    """One fresh-session bench pass: per-query mean of RUNS timed runs
    after WARMUP warmups, plus one streaming drain per gate."""
    import __spark_entry__ as entrymod
    from gemmsql import get_spark

    spark = get_spark("gemmsql-bench")
    results: dict[str, float] = {}
    streaming: dict[str, dict[str, float]] = {}

    # session-level throwaway warm (round-13 protocol, VERDICT r12
    # next #3): absorb fresh-JVM JIT/codegen compilation outside any
    # timed window so the first timed query isn't the one paying it
    try:
        qs = entrymod.queries()
        warm = qs.get("entropy") or next(iter(qs.values()))
        run_action(warm(spark, sf_dir))
    except Exception as e:
        print(f"# bench warm error: {e}", file=sys.stderr)

    for name, fn in entrymod.queries().items():
        if name.startswith("streaming_"):
            # measured separately below: an availableNow replay is a
            # one-shot micro-batch drain, so it gets ONE timed run and
            # a rows/sec figure instead of the warmup+mean protocol;
            # excluded from the headline batch total
            continue
        try:
            for _ in range(WARMUP):
                run_action(fn(spark, sf_dir))
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                run_action(fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            results[name] = round(sum(times) / len(times), 3)
        except Exception as e:  # record failures, keep benching
            print(f"# bench error {name}: {e}", file=sys.stderr)
            results[name] = -1.0

    # streaming tier (VERDICT r3 next #5): end-to-end availableNow wall
    # time (stage + replay + sink) and source-rows/sec throughput
    try:
        from gemmsql.stats import table_rows

        ev_rows = table_rows(sf_dir, "events")
        # stage the shared stream-source dir ONCE before timing so each
        # gate's wall/rows-per-sec measures replay, not the one-time
        # staging write the first gate used to absorb (~6 s at sf0.1)
        import tempfile

        from gemmsql.streaming.windows import stage_stream_dir

        tag = os.path.basename(sf_dir.rstrip("/"))
        stage_stream_dir(
            spark,
            sf_dir,
            os.path.join(tempfile.gettempdir(), f"gemmsql_stream_gate_{tag}"),
        )
        for name, fn in entrymod.queries().items():
            if not name.startswith("streaming_"):
                continue
            t0 = time.perf_counter()
            n_out = fn(spark, sf_dir).count()  # gate drains the stream
            wall = time.perf_counter() - t0
            streaming[name] = {
                "sec": round(wall, 3),
                "rows_per_sec": round(ev_rows / wall),
                "out_rows": n_out,
            }
    except Exception as e:
        print(f"# streaming bench error: {e}", file=sys.stderr)
    spark.stop()
    return results, streaming


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if SESSIONS <= 1 or os.environ.get("BENCH_CHILD"):
        per_q = [{}]
        per_s = [{}]
        per_q[0], per_s[0] = run_session(sf_dir)
        protocol = (
            f"single-session mean-of-{RUNS} after {WARMUP} warmup, "
            "noop sink"
        )
    else:
        per_q, per_s = [], []
        env = dict(os.environ, BENCH_CHILD="1")
        t_start = time.perf_counter()
        slowest = 0.0
        for r in range(SESSIONS):
            elapsed = time.perf_counter() - t_start
            if per_q and elapsed + slowest > BUDGET_S:
                print(
                    f"# budget: {elapsed:.0f}s elapsed, skipping "
                    f"session {r + 1} (medians over {len(per_q)})",
                    file=sys.stderr,
                )
                break
            t_sess = time.perf_counter()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    capture_output=True, text=True, env=env,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    timeout=max(BUDGET_S - elapsed, 120.0),
                )
            except subprocess.TimeoutExpired:
                print(f"# session {r + 1} hit the wall budget, killed",
                      file=sys.stderr)
                continue
            slowest = max(slowest, time.perf_counter() - t_sess)
            lines = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if not lines:
                print(
                    f"# session {r + 1} produced no result:\n{out.stderr[-2000:]}",
                    file=sys.stderr,
                )
                continue
            res = json.loads(lines[-1])
            per_q.append(res["queries"])
            per_s.append(res.get("streaming", {}))
            print(
                f"# session {r + 1}/{SESSIONS}: total {res['value']}s",
                file=sys.stderr,
            )
        protocol = (
            f"per-query median across {len(per_q)} fresh sessions, each "
            f"mean-of-{RUNS} after {WARMUP} warmup, noop sink"
        )

    def med(vals):
        ok = [v for v in vals if v is not None and v >= 0]
        return round(statistics.median(ok), 3) if ok else -1.0

    names = [n for qs in per_q for n in qs]
    results = {
        n: med([qs.get(n) for qs in per_q])
        for n in dict.fromkeys(names)
    }
    streaming: dict[str, dict[str, float]] = {}
    for n in dict.fromkeys(k for ss in per_s for k in ss):
        runs = [ss[n] for ss in per_s if n in ss]
        streaming[n] = {
            "sec": med([r["sec"] for r in runs]),
            "rows_per_sec": round(
                statistics.median([r["rows_per_sec"] for r in runs])
            ),
            "out_rows": runs[-1]["out_rows"],
        }

    total = round(sum(v for v in results.values() if v >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "gemmsql total median sec across queries",
        "value": total,
        "unit": "sec",
        "queries": results,
        "streaming": streaming,
        "sf": sf_val,
        "warmup": WARMUP,
        "runs": RUNS,
        "sessions": len(per_q),
        "protocol": protocol,
    }
    # Round-15 protocol (VERDICT r14 missing #3): the driver's capture
    # window keeps only the LAST ~2000 chars of output, and the full
    # verbose line (~3 KB) starts mid-stream in BENCH_r*.json, losing
    # the first ~11 queries' timings every round.  Emit the verbose
    # line FIRST (tools/bench_median.py selects it by its "protocol"
    # key), persist it as a sidecar next to this script, and END with
    # a compact line — batch AND streaming seconds folded into one
    # "queries" map, minimal separators — sized to fit the capture
    # window whole, so every registered query's driver timing survives
    # into the round artifact.
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(sidecar, "w") as f:
            json.dump(full, f, indent=1)
    except OSError as e:
        print(f"# sidecar write failed: {e}", file=sys.stderr)
    print(json.dumps(full))
    if os.environ.get("BENCH_CHILD"):
        # a child's LAST line must stay the verbose result — the
        # parent parses lines[-1] for the batch/streaming split
        return
    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": {
            **results,
            **{n: s["sec"] for n, s in streaming.items()},
        },
        "sf": sf_val,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
