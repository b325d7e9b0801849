"""Two-pass rescore window (pipelines/query.rescore_topk — the Lucene/ES
`rescore` surface). Oracle: recombine two independent full searches
(primary + secondary scorer) driver-side over the primary's top-window and
check rank AND exact-float score identity — valid because the second pass
re-accumulates in lexicographic term order, the same float op order as a
full search under the secondary scorer.
"""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import rescore_topk, search_to_table


@pytest.fixture(scope="module")
def rescore_index(ray_session, small_corpus, tmp_path_factory):
    import ray.data

    pages, queries = small_corpus
    ix = str(tmp_path_factory.mktemp("rsix") / "main")
    shutil.rmtree(ix, ignore_errors=True)
    build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=5))
    return ix, queries


def _oracle(ix, queries, k, window, qw, rw):
    prim = search_to_table(ix, queries, QueryConfig(k=window, scorer="bm25"))
    # secondary scores for ALL docs under tfidf, deep enough to cover the
    # window members (k = a big number: the corpus is tiny)
    sec = search_to_table(ix, queries, QueryConfig(k=100_000, scorer="tfidf"))
    s2 = {
        (q, d): s
        for q, d, s in zip(
            sec.column("query_id").to_pylist(),
            sec.column("doc_id").to_pylist(),
            sec.column("score").to_pylist(),
        )
    }
    per_q: dict[int, list[tuple[float, int]]] = {}
    for q, d, s in zip(
        prim.column("query_id").to_pylist(),
        prim.column("doc_id").to_pylist(),
        prim.column("score").to_pylist(),
    ):
        per_q.setdefault(q, []).append((qw * s + rw * s2[(q, d)], d))
    rows = []
    for q in sorted(per_q):
        cand = sorted(per_q[q], key=lambda t: (-t[0], t[1]))[:k]
        for r, (fs, d) in enumerate(cand):
            rows.append((q, r, d, fs))
    return rows


def test_rescore_matches_recombination(rescore_index):
    ix, queries = rescore_index
    out = rescore_topk(
        ix, queries, k=6, window=15, scorer="bm25", rescore_scorer="tfidf",
        query_weight=1.0, rescore_weight=2.0,
    )
    got = sorted(
        zip(
            out.column("query_id").to_pylist(),
            out.column("rank").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("score").to_pylist(),
        )
    )
    want = sorted(_oracle(ix, queries, k=6, window=15, qw=1.0, rw=2.0))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == w[3]  # exact float64


def test_rescore_window_is_exclusive(rescore_index):
    """A doc outside the primary top-window never enters, even if its
    combined score would beat window members (ES rescore semantics)."""
    ix, queries = rescore_index
    out = rescore_topk(ix, queries, k=8, window=8)
    prim = search_to_table(ix, queries, QueryConfig(k=8))
    win = set(zip(prim.column("query_id").to_pylist(), prim.column("doc_id").to_pylist()))
    for q, d in zip(out.column("query_id").to_pylist(), out.column("doc_id").to_pylist()):
        assert (q, d) in win


def test_rescore_zero_weight_keeps_primary_order(rescore_index):
    ix, queries = rescore_index
    out = rescore_topk(ix, queries, k=10, window=20, rescore_weight=0.0)
    prim = search_to_table(ix, queries, QueryConfig(k=10))
    assert out.column("doc_id").to_pylist() == prim.column("doc_id").to_pylist()
    assert np.allclose(
        out.column("score").to_numpy(), prim.column("score").to_numpy()
    )
