"""Local replica of the driver's correctness gate: run each __ray_entry__
queries() entry at a given sf and compare with oracle_sql() via DuckDB
(row count + column names + order-insensitive value comparison).

Usage: python tools/check_driver.py [sf_dir] [only_name ...]
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
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
    failures = 0
    for name, fn in qs.items():
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        # the driver hashes VALUES exactly and a float64 oracle column vs an
        # int64 engine column stringifies differently — treat dtype kind
        # divergence and any value difference as failures (strictly harder
        # than the driver's gate)
        ok_dtypes = ok_cols and all(
            got[c].dtype.kind == want[c].dtype.kind for c in got.columns
        )
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[0]
        if ok_vals and not ok_dtypes:
            kinds = [
                f"{c}: {got[c].dtype}!={want[c].dtype}"
                for c in got.columns
                if got[c].dtype.kind != want[c].dtype.kind
            ]
            ok_vals = False
            detail = "dtype kind mismatch — " + "; ".join(kinds)
        if ok_rows and ok_cols and ok_vals:
            print(f"OK    {name}: {len(got)} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(got)} vs {len(want)}, cols {list(got.columns)} vs {list(want.columns)}"
            )
            if ok_rows and ok_cols:
                print(f"      value mismatch: {detail}")
    ray.shutdown()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
