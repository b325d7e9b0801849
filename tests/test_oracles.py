"""Exact-hash DuckDB oracle parity for the near-dup family.

The driver gate compares queries() vs oracle_sql() at sf0.01; these tests pin
the same equivalence at sf0.001 so a tokenizer/hash/banding change that breaks
the SQL replication fails fast in pytest (reference model: the C++ tests
verify serialization round-trips bit-exactly,
/root/reference/python-bindings/unit_tests/test_serialization.cpp:64-75).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="driver testdata absent"
)


def _oracle(sql: str):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.sql(sql).arrow()


@pytest.mark.parametrize("name", ["fingerprints", "minhash_clusters", "simhash_dups"])
def test_hash_oracle_parity(ray_session, name):
    import __ray_entry__ as e

    mine = e.queries()[name](SF_DIR)
    orc = _oracle(e.oracle_sql()[name])
    assert mine.column_names == orc.column_names
    assert mine.num_rows == orc.num_rows > 0
    a, b = mine.to_pydict(), orc.to_pydict()
    for col in mine.column_names:
        assert a[col] == b[col], f"{name}: column {col} differs"


def test_sql_hash64_matches_spec():
    """The DuckDB word-wise FNV+splitmix expression == hashes.hash64_str."""
    import pyarrow as pa

    import __ray_entry__ as e
    from flatnav_ray.functions.hashes import hash64_str

    toks = ["a", "hello", "exactly8", "morethaneightchars", "0" * 17, "z" * 40]
    con = duckdb.connect()
    tbl = pa.table({"t": toks})  # noqa: F841 — registered by name below
    con.register("toks", tbl)
    got = con.sql(f"SELECT t, {e._hash64_sql()} AS h FROM toks").fetchall()
    for t, h in got:
        assert h == hash64_str(t), t
