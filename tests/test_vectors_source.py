"""S2/S3 packed-vector reader tests (reference: experiments/data_loader.py).

Files are written by an independent spec writer here (byte-level, straight
from the format description) — the datasource must reproduce them exactly,
including range splits.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from flatnav_ray.sources.vectors import (
    PackedVectorDatasource,
    read_vectors,
    vectors_to_parquet,
)


def _write_xvecs(path, mat, elem):
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", mat.shape[1]))
            f.write(np.ascontiguousarray(row, dtype=elem).tobytes())


def _write_bin(path, mat, elem):
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", mat.shape[0], mat.shape[1]))
        f.write(np.ascontiguousarray(mat, dtype=elem).tobytes())


def _mat(n, d, dtype, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    if np.issubdtype(dtype, np.floating):
        return rng.normal(size=(n, d)).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=(n, d)).astype(dtype)


CASES = [
    ("bvecs", np.uint8, _write_xvecs),
    ("ivecs", np.int32, _write_xvecs),
    ("fvecs", np.float32, _write_xvecs),
    ("fbin", np.float32, _write_bin),
    ("u8bin", np.uint8, _write_bin),
    ("i8bin", np.int8, _write_bin),
]


@pytest.mark.parametrize("kind,elem,writer", CASES)
def test_roundtrip_exact(ray_session, tmp_path, kind, elem, writer):
    mat = _mat(777, 24, elem)
    path = str(tmp_path / f"v.{kind}")
    writer(path, mat, elem)
    src = PackedVectorDatasource(path)
    assert src.num_rows == 777 and src.dim == 24
    ds = read_vectors(path)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("vec_id")
    assert tbl.num_rows == 777
    np.testing.assert_array_equal(
        tbl.column("vec_id").to_numpy(), np.arange(777, dtype=np.int64)
    )
    got = np.asarray(tbl.column("embedding").combine_chunks().values).reshape(777, 24)
    np.testing.assert_array_equal(got.astype(elem), mat)


def test_range_splits_compose(ray_session, tmp_path):
    mat = _mat(1000, 8, np.float32)
    path = str(tmp_path / "v.fbin")
    _write_bin(path, mat, np.float32)
    tasks = PackedVectorDatasource(path).get_read_tasks(7)
    assert len(tasks) >= 7
    rows = sum(t.metadata.num_rows for t in tasks)
    assert rows == 1000
    # split boundaries must tile [0, n) exactly
    ds = read_vectors(path, override_num_blocks=7)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("vec_id")
    got = np.asarray(tbl.column("embedding").combine_chunks().values).reshape(1000, 8)
    np.testing.assert_array_equal(got, mat)


def test_corrupt_xvecs_dim_raises(ray_session, tmp_path):
    mat = _mat(10, 4, np.float32)
    path = str(tmp_path / "v.fvecs")
    _write_xvecs(path, mat, np.float32)
    with open(path, "r+b") as f:
        f.seek((4 + 16) * 3)  # record 3's dim prefix
        f.write(struct.pack("<i", 99))
    with pytest.raises(Exception, match="corrupt record dim|ValueError"):
        read_vectors(path).materialize()


def test_converter_feeds_knn(ray_session, tmp_path):
    from flatnav_ray.stages.knn import brute_force_knn

    mat = _mat(300, 16, np.float32, seed=9)
    path = str(tmp_path / "v.fbin")
    _write_bin(path, mat, np.float32)
    ds = vectors_to_parquet(path, str(tmp_path / "pq"))
    out = brute_force_knn(ds, mat[:3], k=5, query_ids=np.arange(3))
    assert out.num_rows == 15
    # rank-0 neighbor of query i is vector i itself (cosine similarity 1)
    top = out.to_pandas().sort_values(["query_id", "rank"]).groupby("query_id").first()
    assert top["vec_id"].tolist() == [0, 1, 2]


def test_ann_cli_lifecycle(ray_session, tmp_path):
    """construct_npy -> query_npy lifecycle parity (SURVEY §3.2,
    tools/construct_npy.cpp:90-135, query_npy.cpp:71-160): packed base file
    -> CLI ann-build -> CLI ann-query with an .ivecs gtruth -> recall
    reported and high."""
    import json

    from flatnav_ray.cli import main

    rng = np.random.Generator(np.random.PCG64(12))
    base = rng.normal(size=(300, 12)).astype(np.float32)
    qs = base[:6] + rng.normal(scale=0.01, size=(6, 12)).astype(np.float32)
    _write_xvecs(str(tmp_path / "base.fvecs"), base, np.float32)
    _write_xvecs(str(tmp_path / "q.fvecs"), qs, np.float32)
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    gt = np.argsort(-(qn @ bn.T), axis=1, kind="stable")[:, :10].astype(np.int32)
    _write_xvecs(str(tmp_path / "gt.ivecs"), gt, np.int32)
    ix = str(tmp_path / "ix")
    out = str(tmp_path / "res.parquet")
    assert main(["ann-build", "--vectors", str(tmp_path / "base.fvecs"),
                 "--out", ix, "--shards", "2", "--m", "12"]) == 0
    assert main(["ann-query", "--index", ix, "--queries", str(tmp_path / "q.fvecs"),
                 "--out", out, "--k", "10", "--ef-search", "96",
                 "--gtruth", str(tmp_path / "gt.ivecs")]) == 0
    import pyarrow.parquet as pq

    res = pq.read_table(out)
    assert res.schema.names == ["query_id", "rank", "vec_id", "cosine"]
    assert len(res) == 60
    # recompute recall the way the CLI does; high ef on 300 vecs -> >= 0.9
    got = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = np.mean([len(got[i] & set(gt[i].tolist())) / 10 for i in range(6)])
    assert rec >= 0.9
