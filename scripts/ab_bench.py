#!/usr/bin/env python
"""Interleaved A/B of bench.py under different env configs (guide §1).

Usage: python scripts/ab_bench.py ROUNDS 'NAME1:K=V,K=V' 'NAME2:K=V,...' ...
Runs bench.py as a subprocess per config, alternating ROUNDS times, and
reports per-query MIN over all invocations of each config plus totals.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    rounds = int(sys.argv[1])
    configs: dict[str, dict[str, str]] = {}
    for spec in sys.argv[2:]:
        name, _, kvs = spec.partition(":")
        env = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, v = kv.partition("=")
                env[k] = v
        configs[name] = env

    best: dict[str, dict[str, float]] = {n: {} for n in configs}
    for r in range(rounds):
        for name, envextra in configs.items():
            env = dict(os.environ, **envextra)
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py")],
                capture_output=True, text=True, env=env,
            )
            cands = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode != 0 or not cands:
                sys.stderr.write(proc.stderr)
                sys.exit(f"bench.py failed (rc={proc.returncode}) for config {name!r}")
            line = cands[-1]
            q = json.loads(line)["queries"]
            for k, v in q.items():
                cur = best[name].get(k)
                best[name][k] = v if cur is None else min(cur, v)
            print(f"# round {r+1} {name}: total={sum(q.values()):.3f}", file=sys.stderr, flush=True)

    names = list(configs)
    qnames = list(best[names[0]])
    print(f"{'query':26s} " + " ".join(f"{n:>12s}" for n in names))
    for qn in qnames:
        print(f"{qn:26s} " + " ".join(f"{best[n][qn]:12.3f}" for n in names))
    print(f"{'TOTAL':26s} " + " ".join(f"{sum(best[n].values()):12.3f}" for n in names))


if __name__ == "__main__":
    main()
