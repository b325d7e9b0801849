"""Interleaved A/B for the term-layout serving path (VERDICT.md round-3 #5).

BENCH_r03 recorded query_qps_termlayout 2,247 vs BENCH_r02's 3,621 on the
same corpus — host noise or a code regression?  Same methodology as
BENCH/AB_r1_vs_r3.md: two arms (the round-2 snapshot commit in a worktree vs
HEAD), each arm a fresh process building its OWN term index from the SAME
on-disk corpus, warm-serving 4000 queries; arms strictly interleaved so a
noise window lands on both.

Usage:
  python tools/ab_termlayout.py --arm <repo_dir> <index_dir>   # one arm leg
  python tools/ab_termlayout.py                                 # full A/B
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PAGES_DIR = "/tmp/flatnav_bench/pages_96000"
R2_TREE = "/tmp/flatnav_r2"
HEAD_TREE = "/root/repo"
CPUS = 32


def run_arm(repo_dir: str, index_dir: str) -> None:
    os.environ.setdefault("ARROW_CPU_COUNT", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    sys.path.insert(0, repo_dir)
    import ray
    import ray.data

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
             logging_level="ERROR")
    from flatnav_ray.config import IndexConfig
    from flatnav_ray.sources.synth import queries_table
    from flatnav_ray.stages.termbuild import TermSearchSession, build_term_index

    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        build_term_index(
            ray.data.read_parquet(PAGES_DIR), index_dir,
            IndexConfig(num_partitions=32, layout="term"),
        )
    queries = queries_table(4000, seed=43)
    tsess = TermSearchSession(index_dir, num_actors=CPUS)
    tsess.search(queries.slice(0, 32))  # warm actor load
    tsess.search(queries)  # cold pass fills fetch caches
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        tsess.search(queries)
        best = max(best, len(queries) / (time.perf_counter() - t0))
    tsess.shutdown()
    ray.shutdown()
    print(json.dumps({"qps": round(best, 1)}))


def run_ab(pairs: int = 3) -> None:
    from flatnav_ray.sources.synth import pages_dataset  # noqa: F401 (HEAD gen)

    if not os.path.isdir(PAGES_DIR):
        import ray
        import ray.data

        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
        pages_dataset(96000, seed=42, chunk_rows=1000).write_parquet(PAGES_DIR)
        ray.shutdown()
    arms = [("r2", R2_TREE, "/tmp/flatnav_bench/ixterm_ab_r2"),
            ("HEAD", HEAD_TREE, "/tmp/flatnav_bench/ixterm_ab_head")]
    rows = []
    for i in range(pairs):
        pair = {}
        for name, tree, ix in arms:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", tree, ix],
                capture_output=True, text=True, timeout=1800,
                cwd=tree,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(f"arm {name} pair {i} FAILED:\n{out.stderr[-2000:]}")
                return
            pair[name] = json.loads(lines[-1])["qps"]
            print(f"pair {i} {name}: {pair[name]} qps", flush=True)
        rows.append(pair)
    print(json.dumps(rows))


if __name__ == "__main__":
    if "--arm" in sys.argv:
        i = sys.argv.index("--arm")
        run_arm(sys.argv[i + 1], sys.argv[i + 2])
    else:
        sys.path.insert(0, HEAD_TREE)
        run_ab()
