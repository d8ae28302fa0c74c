#!/usr/bin/env python
"""Interleaved worktree A/B of bench.py between two git revisions (the
repo's bench-noise protocol for CODE changes: scripts/ab_bench.py handles
env-only changes; this one alternates full bench invocations between a
baseline worktree and HEAD, reporting per-query MIN per side).

Usage: python scripts/wt_ab.py BASE_REV ROUNDS [query ...]
Creates/reuses a worktree at /tmp/wt_<BASE_REV>; runs bench.py there and in
the repo root alternately ROUNDS times.  Extra env (SPARK_GRAFT_*) passes
through.  Optional query list filters the report (all queries still run —
the bench protocol is fixed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_bench(cwd: Path) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, str(cwd / "bench.py")],
        capture_output=True, text=True, cwd=cwd,
    )
    cands = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not cands:
        sys.stderr.write(proc.stderr)
        sys.exit(f"bench.py failed (rc={proc.returncode}) in {cwd}")
    return json.loads(cands[-1])["queries"]


def main() -> None:
    base_rev = sys.argv[1]
    rounds = int(sys.argv[2])
    only = sys.argv[3:]
    wt = Path(f"/tmp/wt_{base_rev}")
    if not wt.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), base_rev],
            cwd=REPO, check=True,
        )
    best: dict[str, dict[str, float]] = {"base": {}, "head": {}}
    for r in range(rounds):
        # ABBA: alternate which side runs first each round, so a load ramp
        # during the run cannot systematically penalize one side (observed:
        # a monotone load rise made the always-second side uniformly slower
        # on every query, including untouched ones).
        order = (("base", wt), ("head", REPO))
        if r % 2:
            order = order[::-1]
        for name, cwd in order:
            q = run_bench(cwd)
            for k, v in q.items():
                cur = best[name].get(k)
                best[name][k] = v if cur is None else min(cur, v)
            print(
                f"# round {r + 1} {name}: total={sum(q.values()):.3f}",
                file=sys.stderr, flush=True,
            )
    qnames = [k for k in best["head"] if not only or k in only]
    print(f"{'query':26s} {'base':>9s} {'head':>9s} {'delta':>9s}")
    for qn in qnames:
        b, h = best["base"].get(qn, float('nan')), best["head"][qn]
        print(f"{qn:26s} {b:9.3f} {h:9.3f} {h - b:+9.3f}")
    tb = sum(best["base"].values())
    th = sum(best["head"].values())
    print(f"{'TOTAL':26s} {tb:9.3f} {th:9.3f} {th - tb:+9.3f}")


if __name__ == "__main__":
    main()
