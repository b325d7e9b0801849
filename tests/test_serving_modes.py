"""Serving-surface modes added in round 3: pagination (offset), negation
(exclude terms), infix wildcard scans, fuzzy (edit-distance-1) matching and
more-like-this — each checked against a brute-force / sliced oracle.

Reference bar: exact-equality result checks across query matrices
(/root/reference/python-bindings/unit_tests/test_serialization.cpp:64-75).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import search_to_table


@pytest.fixture(scope="module")
def built_index(ray_session, small_corpus, tmp_path_factory):
    import ray.data

    pages, queries = small_corpus
    ix = str(tmp_path_factory.mktemp("ix") / "serving")
    build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=8))
    return ix, pages, queries


class TestPagination:
    def test_page_equals_sliced_deep_search(self, built_index):
        """offset=10,k=10 returns EXACTLY ranks 10..19 of a deeper search —
        same global rank numbers, rows bit-identical."""
        ix, _, queries = built_index
        deep = search_to_table(ix, queries, QueryConfig(k=25))
        page = search_to_table(ix, queries, QueryConfig(k=10, offset=10))
        want = deep.filter(
            pc.and_(
                pc.greater_equal(deep.column("rank"), 10),
                pc.less(deep.column("rank"), 20),
            )
        )
        assert page.equals(want)

    def test_offset_zero_is_identity(self, built_index):
        ix, _, queries = built_index
        a = search_to_table(ix, queries, QueryConfig(k=10))
        b = search_to_table(ix, queries, QueryConfig(k=10, offset=0))
        assert a.equals(b)

    def test_session_pagination_equals_dataset_path(self, built_index):
        from flatnav_ray.stages.search import SearchSession

        ix, _, queries = built_index
        want = search_to_table(ix, queries, QueryConfig(k=10, offset=10))
        sess = SearchSession(ix, num_actors=2)
        try:
            got = sess.search(queries, QueryConfig(k=10, offset=10))
        finally:
            sess.shutdown()
        assert got.column("query_id").to_pylist() == want.column("query_id").to_pylist()
        assert got.column("rank").to_pylist() == want.column("rank").to_pylist()
        assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
        np.testing.assert_array_equal(
            got.column("score").to_numpy(), want.column("score").to_numpy()
        )

    def test_offset_past_match_set_yields_empty(self, built_index):
        """A page beyond the last match returns no rows for that query (the
        SQL `rank >= offset` semantics), never an error."""
        ix, _, queries = built_index
        out = search_to_table(ix, queries, QueryConfig(k=10, offset=100_000))
        assert len(out) == 0
