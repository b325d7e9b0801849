"""Federated multi-index search (pipelines/query.federated_search): two
physical indexes with merged global stats must be rank- AND score-identical
to the single union index (Lucene MultiReader composite-stats semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import federated_search, search_to_table
from flatnav_ray.sources.synth import pages_table, queries_table


@pytest.fixture(scope="module")
def fed_indexes(ray_session, tmp_path_factory):
    import ray.data

    pages = pages_table(600, seed=17, vocab_size=500, mean_len=40)
    pdir = tmp_path_factory.mktemp("fed_pages")
    pq.write_table(pages, str(pdir / "p0.parquet"))
    root = tmp_path_factory.mktemp("fed_ix")

    full = str(root / "full")
    build_index(ray.data.read_parquet(str(pdir)), full, IndexConfig(num_partitions=6))

    # split by url hash parity; DIFFERENT partition counts per half on
    # purpose — federation must not care about physical layout
    halves = []
    for r, np_ in ((0, 3), (1, 5)):
        def _half(b: pa.Table, _r=r) -> pa.Table:
            import zlib

            import numpy as _np
            import pyarrow as _pa

            keep = _np.asarray(
                [zlib.crc32(u.encode()) % 2 == _r for u in b.column("url").to_pylist()]
            )
            return b.filter(_pa.array(keep))

        ix = str(root / f"half{r}")
        build_index(
            ray.data.read_parquet(str(pdir)).map_batches(
                _half, batch_format="pyarrow"
            ),
            ix, IndexConfig(num_partitions=np_),
        )
        halves.append(ix)
    return full, halves


def test_federated_identical_to_union_index(fed_indexes):
    full, halves = fed_indexes
    queries = queries_table(12, seed=4, vocab_size=500)
    cfg = QueryConfig(k=8)
    single = search_to_table(full, queries, cfg)
    fed = federated_search(halves, queries, cfg)
    key = [("query_id", "ascending"), ("rank", "ascending")]
    s, f = single.sort_by(key), fed.sort_by(key)
    assert f.column("doc_id").to_pylist() == s.column("doc_id").to_pylist()
    assert f.column("url").to_pylist() == s.column("url").to_pylist()
    # scores bit-identical: BM25 inputs (tf, dl, df, n, avgdl) all agree
    assert np.array_equal(
        np.array(f.column("score").to_pylist()),
        np.array(s.column("score").to_pylist()),
    )


def test_federated_rejects_unsupported_features(fed_indexes):
    _, halves = fed_indexes
    queries = queries_table(3, seed=4, vocab_size=500)
    with pytest.raises(ValueError, match="unsupported here: offset"):
        federated_search(halves, queries, QueryConfig(k=3, offset=5))
    with pytest.raises(ValueError, match="fuzzy_max_edits"):
        federated_search(halves, queries, QueryConfig(k=3, fuzzy_max_edits=1))
    with pytest.raises(ValueError, match="needs cf"):
        federated_search(halves, queries, QueryConfig(k=3, scorer="lmd"))
    bad_q = queries.append_column(
        "must_text", pa.array(["x"] * len(queries), type=pa.string())
    )
    with pytest.raises(ValueError, match="query columns"):
        federated_search(halves, bad_q, QueryConfig(k=3))


def test_federated_rejects_mixed_analyzers(fed_indexes, tmp_path):
    full, halves = fed_indexes
    import json
    import os
    import shutil

    bad = str(tmp_path / "bad")
    shutil.copytree(halves[0], bad)
    sp = os.path.join(bad, "stats.json")
    st = json.load(open(sp))
    st["analyzer"] = "other"
    json.dump(st, open(sp, "w"))
    queries = queries_table(3, seed=4, vocab_size=500)
    with pytest.raises(ValueError, match="different analyzers"):
        federated_search([halves[1], bad], queries, QueryConfig(k=3))
