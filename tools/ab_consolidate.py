"""Interleaved A/B: eager spill-run consolidation ON vs OFF — 1M-doc build.

Decides whether FLATNAV_CONSOLIDATE should stay default-on: consolidation
moves merge-type DRAM work into the map window (overlap), but also touches
every posting one extra time (total work up). Same methodology as
BENCH/AB_r1_vs_r3.md: arms strictly interleaved, fresh process + fresh Ray
session per leg, same on-disk corpus, taskset-pinned.

Usage: python tools/ab_consolidate.py [cpus] [pairs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

PAGES_N = 1_000_000


def leg(cpus: int, consolidate: bool) -> dict:
    env = dict(os.environ)
    env.update(
        RAY_GRAFT_CPUS=str(cpus),
        GRAFT_SF_DIR=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        GRAFT_BENCH_PAGES=str(PAGES_N),
        GRAFT_BUILD_REPS="1",
        GRAFT_PHASE="build",
        FLATNAV_CONSOLIDATE="1" if consolidate else "0",
    )
    cmd = [sys.executable, "bench.py", "--json-only"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600, cwd="/root/repo")
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rows = []
    for i in range(pairs):
        r = {}
        for name, flag in (("off", False), ("on", True)):
            d = leg(cpus, flag)
            r[name] = d["build_docs_per_sec"]
            r[f"bw_{name}"] = d.get("bandwidth_probe_gbs")
            print(f"pair {i} {name}: {r[name]:.0f} docs/s "
                  f"(bw probe {r[f'bw_{name}']} GB/s)", flush=True)
        rows.append(r)
    print(json.dumps({"cpus": cpus, "pairs": rows}))


if __name__ == "__main__":
    main()
