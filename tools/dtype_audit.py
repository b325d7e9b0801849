"""Audit every SQL-checked entry for engine-vs-oracle dtype divergence.

The driver's correctness gate hashes VALUES exactly; a column that is
int64 on the engine side but HUGEINT->float64 on the DuckDB side (e.g.
`sum(BIGINT)` or `list_sum`) stringifies as `123.0` vs `123` and
hash-fails even when numerically identical. This tool compares the
pandas dtypes of both sides per column at a small sf and flags:
  - any dtype mismatch between engine and oracle
  - any float column at all (candidates for integer quantization)

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = e.queries()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = e.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            got = to_df(fn(sf_dir))
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"ERR   {name}: {type(ex).__name__}: {ex}")
            bad += 1
            continue
        g = {c: str(t) for c, t in got.dtypes.items()}
        w = {c: str(t) for c, t in want.dtypes.items()}
        issues = []
        for c in sorted(set(g) | set(w)):
            gt, wt = g.get(c, "MISSING"), w.get(c, "MISSING")
            if gt != wt:
                issues.append(f"{c}: engine={gt} oracle={wt}")
            elif gt.startswith("float"):
                issues.append(f"{c}: float ({gt}) — quantize?")
        if issues:
            bad += 1
            print(f"FLAG  {name}: " + "; ".join(issues))
        else:
            print(f"ok    {name}")
    ray.shutdown()
    print(f"\n{bad} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
