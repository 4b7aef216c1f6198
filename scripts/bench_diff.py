#!/usr/bin/env python
"""Judge-style bench regression scan between two bench_r{N}.json files.

Flags every common query slower by BOTH >30% and >0.5 s (the
threshold the round verdicts apply), lists new/removed queries with
their cost, and prints the suite totals. Exit 1 on any flagged
regression so the end-of-round checklist can gate on it.

Usage::

    python scripts/bench_diff.py bench_r7.json bench_r8.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    qo, qn = old["queries"], new["queries"]

    print(
        f"suite: {old['value']:.1f}s/{len(qo)}q -> "
        f"{new['value']:.1f}s/{len(qn)}q"
    )
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        cost = sum(qn[k] for k in added)
        print(f"added ({len(added)}, {cost:.1f}s): "
              + ", ".join(f"{k}={qn[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    regs = [
        (qn[k] - qo[k], k)
        for k in qn
        if k in qo and qn[k] > qo[k] * 1.3 and qn[k] - qo[k] > 0.5
    ]
    for delta, k in sorted(regs, reverse=True):
        print(f"REGRESSION {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s (+{delta:.2f}s)")
    improved = [
        (qo[k] - qn[k], k)
        for k in qn
        if k in qo and qo[k] > qn[k] * 1.3 and qo[k] - qn[k] > 0.5
    ]
    for delta, k in sorted(improved, reverse=True)[:5]:
        print(f"improved {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s (-{delta:.2f}s)")
    # Index builds are timed outside the per-query region (r9+); list
    # them so build-cost moves stay visible without polluting the
    # regression scan.
    ib = new.get("index_builds") or {}
    if ib:
        print(
            f"index builds ({len(ib)}, {sum(ib.values()):.1f}s): "
            + ", ".join(f"{k}={v:.2f}s" for k, v in sorted(ib.items()))
        )
    print(f"regressions: {len(regs)}")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
