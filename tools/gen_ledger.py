#!/usr/bin/env python
"""Generate the driver-verification ledger (VERDICT r13 next #9).

With 160+ registered queries across the driver gate and the rotation
tier, per-surface trust decays silently: a rotation gate runs in
pytest every round, but the DRIVER's independent oracle may not have
checked a surface for many rounds.  This tool makes that visible:

- For every surface in the live registry (``__spark_entry__.queries``)
  and the rotation tier (``tests.test_rotation._rotated``), find the
  LAST round the driver recorded a CORRECTNESS row for it — parsed
  mechanically from the ``CORRECTNESS_r*.json`` files the driver
  writes, not from hand-maintained history.
- Emit one markdown table into COVERAGE.md between the
  ``<!-- driver-ledger:begin -->`` / ``<!-- driver-ledger:end -->``
  markers (idempotent regeneration).

``tests/test_entry.py::test_driver_ledger_matches_registry`` fails if
the committed table drifts from the registry, so registry swaps must
regenerate it (``python tools/gen_ledger.py``).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BEGIN = "<!-- driver-ledger:begin -->"
END = "<!-- driver-ledger:end -->"


def latest_round_on_disk() -> int:
    """The newest CORRECTNESS_r*.json round present (0 if none)."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def last_driver_rounds(up_to: int | None = None) -> dict[str, int]:
    """name -> last round with a green driver CORRECTNESS row.

    ``up_to`` bounds the parse to rounds <= it — the committed ledger
    records the as-of round it was generated against, so a CORRECTNESS
    file the driver writes AFTER the round closes can never make the
    drift test fail (VERDICT r15 wrong #1: two consecutive by-design
    reds because the test compared a frozen table to a moving disk)."""
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        if up_to is not None and rnd > up_to:
            continue
        with open(p) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = isinstance(row, dict) and row.get("rows_match") and \
                row.get("schema_match") and not row.get("err")
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def build_table(pending_round: int) -> str:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO))
    import __spark_entry__ as entrymod
    from tests.test_rotation import _rotated

    live = list(entrymod.queries())
    rotation = [r[0] for r in _rotated()]
    as_of = latest_round_on_disk()
    last = last_driver_rounds(up_to=as_of)

    lines = [
        BEGIN,
        "",
        f"<!-- ledger-as-of: r{as_of} -->",
        "",
        "| surface | tier | last driver round |",
        "|---|---|---|",
    ]
    for name in live:
        seen = last.get(name)
        cell = f"r{seen}" if seen else f"r{pending_round} (pending)"
        lines.append(f"| `{name}` | driver gate | {cell} |")
    for name in rotation:
        seen = last.get(name)
        lines.append(
            f"| `{name}` | rotation | {f'r{seen}' if seen else 'never'} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    pending = int(os.environ.get("GEMMSQL_ROUND", "14"))
    table = build_table(pending)
    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + table + post
    else:
        text = text.rstrip() + (
            "\n\n## Driver-verification ledger (generated — "
            "`python tools/gen_ledger.py`)\n\n"
            "Last round each surface had an independent DRIVER "
            "correctness row (parsed from `CORRECTNESS_r*.json`; "
            "rotation surfaces are pytest-hash-gated every round "
            "regardless).  `never` marks a rotation-born surface the "
            "driver's oracle has not yet checked — exactly the trust "
            "decay this table exists to make visible.\n\n"
        ) + table + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"ledger regenerated into {path}")


if __name__ == "__main__":
    main()
