"""Term-partitioned build: groupby(term) shuffle + heavy-hitter salting +
hierarchical sub-list merge (north_rule checklist; SURVEY.md §4 skew table).

The canonical postings of the term layout must equal the doc layout's —
the two layouts are reorderings of the same index (graft of the reference's
reorder capability, Index.h:412-427), and the term-index search must be
rank-identical to the shard search."""

import numpy as np
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import search_to_table
from flatnav_ray.stages.introspect import canonical_postings
from flatnav_ray.stages.termbuild import (
    TermIndexSearcher,
    build_term_index,
    canonical_term_postings,
)


@pytest.fixture(scope="module")
def both_indexes(ray_session, small_corpus, tmp_path_factory):
    import ray.data

    pages, queries = small_corpus
    base = tmp_path_factory.mktemp("term_ix")
    doc_ix = str(base / "doc")
    term_ix = str(base / "term")
    build_index(ray.data.from_arrow(pages), doc_ix, IndexConfig(num_partitions=8))
    # salt threshold low enough that Zipf-head terms actually get salted
    stats = build_term_index(
        ray.data.from_arrow(pages), term_ix,
        IndexConfig(num_partitions=8, layout="term"), salt_threshold=100,
    )
    return doc_ix, term_ix, stats, pages, queries


class TestTermLayout:
    def test_salting_engaged(self, both_indexes):
        _, _, stats, _, _ = both_indexes
        assert stats["n_heavy_terms"] > 0  # Zipf head got salted

    def test_canonical_postings_equal_doc_layout(self, both_indexes):
        doc_ix, term_ix, *_ = both_indexes
        a = canonical_postings(doc_ix)
        b = canonical_term_postings(term_ix)
        assert a.equals(b)

    def test_term_search_rank_identical(self, both_indexes):
        doc_ix, term_ix, _, _, queries = both_indexes
        a = search_to_table(doc_ix, queries, QueryConfig(k=10))
        b = TermIndexSearcher(term_ix).search(queries, k=10)
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
        np.testing.assert_allclose(
            a.column("score").to_numpy(), b.column("score").to_numpy(), rtol=0, atol=1e-9
        )

    def test_term_session_fetch_mode_bit_identical_to_searcher(self, both_indexes):
        """Actor-pool term serving (posting-fetch mode) must return
        byte-identical results to the single-process term searcher — same
        float fold order."""
        from flatnav_ray.stages.termbuild import TermSearchSession

        _, term_ix, _, _, queries = both_indexes
        import pyarrow as pa

        sess = TermSearchSession(term_ix, num_actors=3, mode="fetch")
        try:
            a = sess.search(queries, k=10)
            b = TermIndexSearcher(term_ix).search(queries, k=10)
            assert a.equals(b)
            # warm path (coordinator + actor caches) stays identical
            assert sess.search(queries, k=10).equals(b)
            # large batch takes the fan-out (raw-task) scoring path — results
            # must still be bit-identical per query
            reps = 1 + (70 // max(1, len(queries)))
            big = pa.concat_tables(
                [
                    pa.table(
                        {
                            "query_id": pa.array(
                                [q + 1000 * r for q in queries.column("query_id").to_pylist()],
                                type=pa.int64(),
                            ),
                            "text": queries.column("text"),
                        }
                    )
                    for r in range(reps)
                ]
            )
            assert len(big) > 64
            big_out = sess.search(big, k=10)
            first = big_out.filter(
                pa.compute.less(big_out.column("query_id"), 1000)
            )
            assert first.equals(b)
        finally:
            sess.shutdown()

    def test_term_session_auto_mode_cutover(self, both_indexes, monkeypatch):
        """mode='auto' (the default) resolves by corpus size: fetch below
        EXCHANGE_MIN_DOCS (posting lists cheaply shippable to the
        coordinator), exchange at/above it (a head term's posting list
        cannot live in one process) — the planner-cutoff shape shared with
        the dedup semi-join's broadcast-vs-hash switch."""
        from flatnav_ray.stages.termbuild import TermSearchSession

        _, term_ix, _, _, _ = both_indexes
        sess = TermSearchSession(term_ix, num_actors=2)
        try:
            assert sess.mode == "fetch"  # tiny corpus resolves below cutoff
        finally:
            sess.shutdown()
        monkeypatch.setattr(TermSearchSession, "EXCHANGE_MIN_DOCS", 1)
        sess = TermSearchSession(term_ix, num_actors=2)
        try:
            assert sess.mode == "exchange"
        finally:
            sess.shutdown()

    def test_term_session_exchange_mode_bit_identical_to_searcher(self, both_indexes):
        """The doc-range-exchange scoring (the at-scale serving mode —
        each distinct term's postings ship once, range-partitioned straight
        to range reducers; the coordinator sees only k-bounded candidates)
        must be bit-identical to the single-process term searcher, including
        repeat batches (actor contribution caches) and duplicate queries."""
        import pyarrow as pa

        from flatnav_ray.stages.termbuild import TermSearchSession

        _, term_ix, _, _, queries = both_indexes
        sess = TermSearchSession(term_ix, num_actors=3, mode="exchange")
        try:
            b = TermIndexSearcher(term_ix).search(queries, k=10)
            a = sess.search(queries, k=10)
            assert a.equals(b)
            assert sess.search(queries, k=10).equals(b)  # warm actor caches
            # duplicate query texts collapse then re-expand identically
            dup = pa.concat_tables([queries, queries.set_column(
                0, "query_id",
                pa.array([q + 500 for q in queries.column("query_id").to_pylist()],
                         type=pa.int64()),
            )])
            d = sess.search(dup, k=10)
            first = d.filter(pa.compute.less(d.column("query_id"), 500))
            assert first.equals(b)
        finally:
            sess.shutdown()


class TestTermBuildResume:
    def test_completed_build_skipped(self, both_indexes, small_corpus):
        import ray.data

        _, term_ix, stats, pages, _ = both_indexes
        again = build_term_index(
            ray.data.from_arrow(pages), term_ix,
            IndexConfig(num_partitions=8, layout="term"), salt_threshold=100,
        )
        assert again.get("resumed") is True
        assert again["n_docs"] == stats["n_docs"]
        assert canonical_term_postings(term_ix).num_rows > 0

    def test_config_change_rebuilds(self, both_indexes, small_corpus):
        import ray.data

        _, term_ix, _, pages, _ = both_indexes
        # different salt threshold -> fingerprint context differs -> rebuild
        again = build_term_index(
            ray.data.from_arrow(pages), term_ix,
            IndexConfig(num_partitions=8, layout="term"), salt_threshold=101,
        )
        assert "resumed" not in again
