"""E2E build + query tests — the grafted integration layer (SURVEY.md §5):

* rank identity vs brute-force oracle (the gtruth conformance of
  /root/reference/tools/query_npy.cpp:52-66, but exact: floor = 1.0)
* build determinism across partition counts (graft of
  /root/reference/python-bindings/unit_tests/test_parallel_insertions.py)
* serialization round trip: fresh searcher over on-disk segments returns
  identical results (graft of test_serialization.cpp:64-75)
* taat == maxscore (pruned search is exact)
* checkpoint-resume skips completed partitions
"""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index, prepare_batch
from flatnav_ray.pipelines.oracle import brute_force_topk, recall_at_k
from flatnav_ray.pipelines.query import search_to_table
from flatnav_ray.stages.build import dedup_latest
from flatnav_ray.stages.introspect import canonical_postings


@pytest.fixture(scope="module")
def built_index(ray_session, small_corpus, tmp_path_factory):
    import ray.data

    pages, queries = small_corpus
    ix = str(tmp_path_factory.mktemp("ix") / "main")
    res = build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=8))
    return ix, res, pages, queries


def _oracle(pages, queries, k=10):
    deduped = dedup_latest(prepare_batch(pages, 8, None))
    return brute_force_topk(deduped.select(["doc_id", "text"]), queries, k=k)


class TestRankIdentity:
    def test_taat_rank_identical_to_oracle(self, built_index):
        ix, res, pages, queries = built_index
        out = search_to_table(ix, queries, QueryConfig(k=10, method="taat"))
        gt = _oracle(pages, queries)
        assert len(out) == len(gt)
        assert out.column("doc_id").to_pylist() == gt.column("doc_id").to_pylist()
        np.testing.assert_allclose(
            out.column("score").to_numpy(), gt.column("score").to_numpy(), rtol=0, atol=1e-9
        )
        # recall floor 1.0 — stronger than the reference's 0.97
        assert recall_at_k(out, gt) == 1.0

    def test_maxscore_equals_taat(self, built_index):
        ix, _, _, queries = built_index
        a = search_to_table(ix, queries, QueryConfig(k=10, method="taat"))
        b = search_to_table(ix, queries, QueryConfig(k=10, method="maxscore"))
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
        np.testing.assert_array_equal(
            a.column("score").to_numpy(), b.column("score").to_numpy()
        )

    def test_wand_pruned_equals_taat(self, built_index):
        """Block-max pruned evaluation is exact: identical docs AND scores."""
        ix, _, _, queries = built_index
        a = search_to_table(ix, queries, QueryConfig(k=10, method="taat"))
        b = search_to_table(ix, queries, QueryConfig(k=10, method="wand"))
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
        np.testing.assert_array_equal(
            a.column("score").to_numpy(), b.column("score").to_numpy()
        )

    def test_approx_factor_trades_recall(self, built_index):
        """The ef_search-analog knob: approx_factor=1 is exact (recall 1.0);
        large factors may prune real results but recall stays high and never
        exceeds the exact result's quality."""
        from flatnav_ray.pipelines.oracle import recall_at_k

        ix, _, pages, queries = built_index
        exact = search_to_table(ix, queries, QueryConfig(k=10, method="wand"))
        approx = search_to_table(
            ix, queries, QueryConfig(k=10, method="wand", approx_factor=4.0)
        )
        r = recall_at_k(approx, exact)
        assert 0.8 <= r <= 1.0
        exact2 = search_to_table(
            ix, queries, QueryConfig(k=10, method="wand", approx_factor=1.0)
        )
        assert exact.equals(exact2)

    def test_and_conjunctive_matches_oracle(self, built_index):
        """method='and' (posting-list intersection): rank-identical to the
        conjunctive brute-force oracle over the full 1-5-term query matrix
        (single-term, multi-term, and corpus-absent-term queries), and every
        surviving doc keeps its EXACT disjunctive score (the intersection
        filters candidates, never perturbs accumulation order)."""
        ix, _, pages, queries = built_index
        out = search_to_table(ix, queries, QueryConfig(k=10, method="and"))
        deduped = dedup_latest(prepare_batch(pages, 8, None))
        gt = brute_force_topk(
            deduped.select(["doc_id", "text"]), queries, k=10, conjunctive=True
        )
        assert out.column("query_id").to_pylist() == gt.column("query_id").to_pylist()
        assert out.column("doc_id").to_pylist() == gt.column("doc_id").to_pylist()
        np.testing.assert_allclose(
            out.column("score").to_numpy(), gt.column("score").to_numpy(), rtol=0, atol=1e-9
        )
        # conjunctive ⊆ disjunctive with identical per-doc scores (bit-exact)
        taat = search_to_table(ix, queries, QueryConfig(k=10, method="taat"))
        full = {
            (q, d): s
            for q, d, s in zip(
                taat.column("query_id").to_pylist(),
                taat.column("doc_id").to_pylist(),
                taat.column("score").to_pylist(),
            )
        }
        for q, d, s in zip(
            out.column("query_id").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("score").to_pylist(),
        ):
            if (q, d) in full:  # doc also in the disjunctive top-k
                assert s == full[(q, d)]

    def test_min_should_match_matches_oracle(self, built_index):
        """min_should_match=2 (threshold disjunction): rank-identical to the
        msm brute-force oracle; msm=1 degenerates to the plain disjunction."""
        ix, _, pages, queries = built_index
        deduped = dedup_latest(prepare_batch(pages, 8, None))
        out = search_to_table(ix, queries, QueryConfig(k=10, min_should_match=2))
        gt = brute_force_topk(
            deduped.select(["doc_id", "text"]), queries, k=10, min_should_match=2
        )
        assert out.column("query_id").to_pylist() == gt.column("query_id").to_pylist()
        assert out.column("doc_id").to_pylist() == gt.column("doc_id").to_pylist()
        np.testing.assert_allclose(
            out.column("score").to_numpy(), gt.column("score").to_numpy(), rtol=0, atol=1e-9
        )
        taat = search_to_table(ix, queries, QueryConfig(k=10, method="taat"))
        msm1 = search_to_table(ix, queries, QueryConfig(k=10, min_should_match=1))
        assert taat.equals(msm1)

    def test_search_session_equals_dataset_path(self, built_index):
        """Server mode (persistent shard actors) returns identical results to
        the Dataset pipeline — the serialization/load-once round-trip."""
        from flatnav_ray.stages.search import SearchSession

        ix, _, _, queries = built_index
        a = search_to_table(ix, queries, QueryConfig(k=10))
        sess = SearchSession(ix, num_actors=3)
        try:
            b = sess.search(queries, QueryConfig(k=10))
        finally:
            sess.shutdown()
        assert a.equals(b)

    def test_inline_and_packed_url_paths_identical(self, built_index, monkeypatch):
        """The session's two serving shapes — small-batch inline urls vs the
        packed urlless shuffle + winner-url resolution — must return
        byte-identical tables (incl. the url column) for the same queries."""
        import flatnav_ray.stages.search as S

        ix, _, _, queries = built_index
        sess = S.SearchSession(ix, num_actors=3)
        try:
            monkeypatch.setattr(S, "_INLINE_URL_ROWS", 10**9)
            inline = sess.search(queries, QueryConfig(k=10))
            monkeypatch.setattr(S, "_INLINE_URL_ROWS", 0)
            packed = sess.search(queries, QueryConfig(k=10))
        finally:
            sess.shutdown()
        assert inline.equals(packed)
        assert inline.column("url").null_count == 0

    def test_empty_and_absent_queries(self, built_index):
        ix, *_ = built_index
        q = pa.table(
            {
                "query_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["zzznotinvocab qqqmissing", ""], type=pa.string()),
            }
        )
        out = search_to_table(ix, q, QueryConfig(k=10))
        assert len(out) == 0


class TestDeterminism:
    def test_partition_count_invariance(self, ray_session, small_corpus, tmp_path):
        """Graft of parallel==serial build equivalence: canonical postings are
        identical for num_partitions 4 vs 8 (doc_ids are stable url hashes,
        independent of the shuffle)."""
        import ray.data

        pages, _ = small_corpus
        ix4, ix8 = str(tmp_path / "p4"), str(tmp_path / "p8")
        build_index(ray.data.from_arrow(pages), ix4, IndexConfig(num_partitions=4))
        build_index(ray.data.from_arrow(pages), ix8, IndexConfig(num_partitions=8))
        c4, c8 = canonical_postings(ix4), canonical_postings(ix8)
        assert c4.equals(c8)

    def test_twophase_equals_onephase(self, ray_session, small_corpus, tmp_path):
        """Map-side-partial build (scale path) yields the identical index to
        the one-shot reducer build."""
        import ray.data

        pages, _ = small_corpus
        ix1, ix2 = str(tmp_path / "one"), str(tmp_path / "two")
        build_index(ray.data.from_arrow(pages), ix1, IndexConfig(num_partitions=6), mode="onephase")
        build_index(ray.data.from_arrow(pages), ix2, IndexConfig(num_partitions=6), mode="twophase")
        assert canonical_postings(ix1).equals(canonical_postings(ix2))

    def test_serialization_round_trip(self, built_index):
        """Fresh searcher processes (new actor pool) over the same on-disk
        segments return identical results — segments ARE the serialized index."""
        ix, _, _, queries = built_index
        a = search_to_table(ix, queries, QueryConfig(k=10))
        b = search_to_table(ix, queries, QueryConfig(k=10))
        assert a.equals(b)


class TestResume:
    def test_resume_skips_completed_partitions(self, ray_session, small_corpus, tmp_path):
        import ray.data

        pages, _ = small_corpus
        ix = str(tmp_path / "rix")
        r1 = build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6))
        assert r1.n_partitions_built == 6 and r1.n_partitions_skipped == 0
        r2 = build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6))
        assert r2.n_partitions_built == 0 and r2.n_partitions_skipped == 6
        assert r2.n_docs == r1.n_docs  # stats survive the resume

    def test_partial_failure_recovery(self, ray_session, small_corpus, tmp_path):
        """Simulated mid-build crash: wipe two partitions' artifacts; the
        resumed build rebuilds ONLY those and the index is byte-identical."""
        import os

        import ray.data

        from flatnav_ray.state.manifest import manifest_path
        from flatnav_ray.stages.build import docmap_path, segment_path

        pages, queries = small_corpus
        ix = str(tmp_path / "pfr")
        build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6))
        before = canonical_postings(ix)
        # crash aftermath: two partitions lost
        for p in (1, 4):
            os.remove(segment_path(ix, p))
            os.remove(manifest_path(ix, p))
        r = build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6))
        assert r.n_partitions_skipped == 4
        assert r.n_partitions_built == 2
        assert canonical_postings(ix).equals(before)
        out = search_to_table(ix, queries, QueryConfig(k=10))
        assert len(out) > 0

    def test_config_change_invalidates_manifests(self, ray_session, small_corpus, tmp_path):
        import ray.data

        pages, _ = small_corpus
        ix = str(tmp_path / "cix")
        build_index(ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6))
        r = build_index(
            ray.data.from_arrow(pages), ix, IndexConfig(num_partitions=6, block_size=64)
        )
        assert r.n_partitions_skipped == 0  # fingerprint changed -> full rebuild


class TestDedup:
    def test_dedup_keeps_latest(self, small_corpus):
        pages, _ = small_corpus
        prep = prepare_batch(pages, 8, None)
        dd = dedup_latest(prep)
        urls = dd.column("url").to_pylist()
        assert len(urls) == len(set(urls))
        # recrawls exist in the fixture and were removed
        assert len(dd) < len(prep)
        # kept row per duplicated url is the max warc_ts one
        t = prep.to_pandas()
        kept = dd.to_pandas().set_index("url")["warc_ts"]
        for url, grp in t.groupby("url"):
            assert kept[url] == grp["warc_ts"].max()


class TestSpillRouting:
    """Multi-node safety of the two-phase build's shuffle spill (node-local
    tmpfs is only a valid spill when there is exactly one node — nothing
    fetches partials across nodes, unlike a Spark shuffle service)."""

    def test_single_node_prefers_tmpfs_or_local(self, tmp_path, monkeypatch):
        from flatnav_ray.pipelines import build as bmod

        monkeypatch.delenv("FLATNAV_SPILL_ROOT", raising=False)
        monkeypatch.setattr(bmod, "_is_multi_node", lambda: False)
        d = bmod._pick_spill_dir(str(tmp_path / "ix"))
        assert d.startswith("/dev/shm") or d.endswith("_partials")

    def test_multi_node_routes_to_shared_index_dir(self, tmp_path, monkeypatch):
        from flatnav_ray.pipelines import build as bmod

        monkeypatch.delenv("FLATNAV_SPILL_ROOT", raising=False)
        monkeypatch.setattr(bmod, "_is_multi_node", lambda: True)
        ix = str(tmp_path / "ix")
        assert bmod._pick_spill_dir(ix) == f"{ix}/_partials"

    def test_explicit_spill_root_always_wins(self, tmp_path, monkeypatch):
        from flatnav_ray.pipelines import build as bmod

        monkeypatch.setenv("FLATNAV_SPILL_ROOT", str(tmp_path / "shared"))
        for multi in (False, True):
            monkeypatch.setattr(bmod, "_is_multi_node", lambda m=multi: m)
            assert bmod._pick_spill_dir(str(tmp_path / "ix")).startswith(
                str(tmp_path / "shared")
            )

    def test_build_identical_across_spill_locations(
        self, ray_session, small_corpus, tmp_path, monkeypatch
    ):
        """Same corpus through the tmpfs spill and the shared-dir spill (the
        multi-node route) -> byte-identical canonical postings."""
        import ray.data

        pages, _ = small_corpus
        monkeypatch.delenv("FLATNAV_SPILL_ROOT", raising=False)
        ix1 = str(tmp_path / "ix_default")
        build_index(ray.data.from_arrow(pages), ix1, IndexConfig(num_partitions=6))
        from flatnav_ray.pipelines import build as bmod

        monkeypatch.setattr(bmod, "_is_multi_node", lambda: True)
        ix2 = str(tmp_path / "ix_shared")
        build_index(ray.data.from_arrow(pages), ix2, IndexConfig(num_partitions=6))
        assert canonical_postings(ix1).equals(canonical_postings(ix2))


class TestMergeFanout:
    def test_fanout_merge_identical_to_driver_merge(self, built_index, monkeypatch):
        """The query-range fan-out merge (big batches) must return exactly
        what the driver-side lexsort merge returns."""
        from flatnav_ray.stages import search as smod
        from flatnav_ray.stages.search import SearchSession

        ix, _, _, queries = built_index
        sess = SearchSession(ix, num_actors=4)
        try:
            base = sess.search(queries, QueryConfig(k=10))
            monkeypatch.setattr(smod, "_MERGE_FANOUT_ROWS", 1)
            fanned = sess.search(queries, QueryConfig(k=10))
            assert fanned.equals(base)
        finally:
            sess.shutdown()
