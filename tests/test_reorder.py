"""O5 Gorder docid ordering (stages/reorder.py — the graft of the reference's
gOrder sliding-window priority ordering, Reordering.h:27-117): kernel behavior
plus the end-to-end contract — ranking identical to the hash layout modulo
exact-score ties, and better posting compression on a topic-clustered corpus
(the reference's analogous claim: reordering changes node ids, not results,
Index.h:412-427)."""

import numpy as np
import pyarrow as pa
import pytest

from flatnav_ray.stages.reorder import (
    GORDER_MAX_DEGREE,
    doc_similarity_graph,
    gorder_rank,
    gorder_rank_of,
)


def _clustered_postings(n_clusters=5, docs_per=6, terms_per=4, interleave=True):
    """Postings where cluster c's docs all share terms {c*100..}; doc positions
    interleaved across clusters so the input order has no locality."""
    pos, codes = [], []
    for c in range(n_clusters):
        docs = [c + n_clusters * i for i in range(docs_per)] if interleave else [
            c * docs_per + i for i in range(docs_per)
        ]
        for t in range(terms_per):
            for d in docs:
                pos.append(d)
                codes.append(c * 100 + t)
    return (
        np.array(pos, dtype=np.int64),
        np.array(codes, dtype=np.int64),
        n_clusters * docs_per,
    )


class TestGorderKernels:
    def test_clusters_get_contiguous_ranks(self):
        pos, codes, n = _clustered_postings()
        rank = gorder_rank_of(pos, codes, n)
        assert sorted(rank.tolist()) == list(range(n))
        for c in range(5):
            docs = [c + 5 * i for i in range(6)]
            rs = sorted(int(rank[d]) for d in docs)
            assert rs == list(range(rs[0], rs[0] + 6)), (c, rs)

    def test_deterministic(self):
        pos, codes, n = _clustered_postings()
        a = gorder_rank_of(pos, codes, n)
        b = gorder_rank_of(pos, codes, n)
        np.testing.assert_array_equal(a, b)

    def test_degree_cap(self):
        # one giant shared-low-df clique family: degree must cap at M analog
        rng = np.random.Generator(np.random.PCG64(7))
        n = 200
        pos, codes = [], []
        for t in range(400):
            docs = rng.choice(n, size=10, replace=False)
            pos.extend(docs.tolist())
            codes.extend([t] * 10)
        indptr, idx = doc_similarity_graph(
            np.array(pos, dtype=np.int64), np.array(codes, dtype=np.int64), n
        )
        assert np.diff(indptr).max() <= GORDER_MAX_DEGREE

    def test_hot_terms_excluded(self):
        # a term touching every doc (df > max_df) contributes no edges
        n = 50
        pos = np.arange(n, dtype=np.int64)
        codes = np.zeros(n, dtype=np.int64)
        indptr, idx = doc_similarity_graph(pos, codes, n)
        assert idx.size == 0

    def test_empty_and_identity(self):
        r = gorder_rank_of(np.empty(0, np.int64), np.empty(0, np.int64), 4)
        np.testing.assert_array_equal(r, np.arange(4))

    def test_chunked_covers_all_ranks(self):
        pos, codes, n = _clustered_postings(n_clusters=20, docs_per=10)
        rank = gorder_rank(*doc_similarity_graph(pos, codes, n), n, chunk=32)
        assert sorted(rank.tolist()) == list(range(n))


class TestRcmKernels:
    def test_clusters_get_contiguous_ranks(self):
        # each cluster is one BFS component -> its docs occupy a contiguous
        # rank range (reversal preserves per-component contiguity)
        from flatnav_ray.stages.reorder import rank_of_for

        pos, codes, n = _clustered_postings()
        rank = rank_of_for("rcm", pos, codes, n)
        assert sorted(rank.tolist()) == list(range(n))
        for c in range(5):
            docs = [c + 5 * i for i in range(6)]
            rs = sorted(int(rank[d]) for d in docs)
            assert rs == list(range(rs[0], rs[0] + 6)), (c, rs)

    def test_deterministic_and_permutation(self):
        from flatnav_ray.stages.reorder import rcm_rank

        pos, codes, n = _clustered_postings(n_clusters=8, docs_per=9)
        indptr, idx = doc_similarity_graph(pos, codes, n)
        a = rcm_rank(indptr, idx, n)
        b = rcm_rank(indptr, idx, n)
        np.testing.assert_array_equal(a, b)
        assert sorted(a.tolist()) == list(range(n))

    def test_reverse_property(self):
        # a path graph 0-1-2-3 seeded at a degree-1 end: BFS discovers the
        # path in order, RCM REVERSES it (the defining Cuthill-McKee flip)
        from flatnav_ray.stages.reorder import rcm_rank

        indptr = np.array([0, 1, 3, 5, 6], dtype=np.int64)
        indices = np.array([1, 0, 2, 1, 3, 2], dtype=np.int64)
        rank = rcm_rank(indptr, indices, 4)
        np.testing.assert_array_equal(rank, [3, 2, 1, 0])

    def test_isolated_docs_covered(self):
        from flatnav_ray.stages.reorder import rank_of_for

        # doc 7 has no postings at all; still gets a unique rank
        pos = np.array([0, 1, 0, 1], dtype=np.int64)
        codes = np.array([5, 5, 6, 6], dtype=np.int64)
        rank = rank_of_for("rcm", pos, codes, 8)
        assert sorted(rank.tolist()) == list(range(8))


class TestStrategySequencing:
    def test_composition_matches_manual_two_pass(self):
        """rank_of_for('gorder+rcm') must equal running gorder, relabeling
        the postings, then running rcm — r2[r1[p]] (the reference applies
        reorder(strategies=[...]) as successive permutations)."""
        from flatnav_ray.stages.reorder import gorder_rank_of, rank_of_for, rcm_rank

        pos, codes, n = _clustered_postings(n_clusters=7, docs_per=8)
        r1 = gorder_rank_of(pos, codes, n)
        indptr, idx = doc_similarity_graph(r1[pos], codes, n)
        r2 = rcm_rank(indptr, idx, n)
        np.testing.assert_array_equal(rank_of_for("gorder+rcm", pos, codes, n), r2[r1])

    def test_unknown_strategy_rejected(self):
        from flatnav_ray.stages.reorder import is_graph_strategy

        assert is_graph_strategy("gorder+rcm")
        assert is_graph_strategy("rcm")
        assert not is_graph_strategy("bogus")
        assert not is_graph_strategy("gorder+bogus")
        assert not is_graph_strategy("dense_url+gorder")


def _topic_corpus(n_docs=4000, n_topics=200, seed=11):
    """Pages whose text = hot filler (high df, no graph signal) + rare
    topic-specific words; doc order carries no topic locality (that is the
    point — gorder must recover it)."""
    from flatnav_ray.sources.synth import PagesGenerator

    rng = np.random.Generator(np.random.PCG64(seed))
    filler = [f"the{i}" for i in range(20)]
    topic_words = [
        [f"topic{t}word{w}" for w in range(30)] for t in range(n_topics)
    ]
    urls, texts = [], []
    for i in range(n_docs):
        t = i % n_topics  # consecutive docs -> different topics
        words = [filler[int(x)] for x in rng.integers(0, 20, size=40)]
        words += [topic_words[t][int(x)] for x in rng.integers(0, 30, size=15)]
        urls.append(f"https://t{t:03d}.example.com/{i}")
        texts.append(" ".join(words))
    htmls = [PagesGenerator.render_html(u, t) for u, t in zip(urls, texts)]
    ts = np.full(n_docs, 1735689600_000000, dtype=np.int64)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def gorder_vs_hash(ray_session, tmp_path_factory):
    import ray.data

    from flatnav_ray.config import IndexConfig
    from flatnav_ray.pipelines.build import build_index

    pages = _topic_corpus()
    base = tmp_path_factory.mktemp("gorder")
    dirs = {}
    for strat in ("hash", "gorder", "rcm", "gorder+rcm"):
        d = str(base / strat.replace("+", "_"))
        build_index(
            ray.data.from_arrow(pages), d,
            IndexConfig(num_partitions=2, docid_strategy=strat), resume=False,
        )
        dirs[strat] = d
    return dirs


class TestGorderEndToEnd:
    @pytest.mark.parametrize("strat", ["gorder", "rcm", "gorder+rcm"])
    def test_rank_identical_modulo_ties(self, gorder_vs_hash, strat):
        from flatnav_ray.config import QueryConfig
        from flatnav_ray.pipelines.query import search_to_table

        queries = pa.table(
            {
                "query_id": pa.array(list(range(20)), type=pa.int64()),
                "text": pa.array([f"topic{t}word0 topic{t}word1" for t in range(20)]),
            }
        )
        a = search_to_table(gorder_vs_hash["hash"], queries, QueryConfig(k=10))
        b = search_to_table(gorder_vs_hash[strat], queries, QueryConfig(k=10))
        assert len(a) == len(b) > 0
        sa = a.column("score").to_numpy()
        sb = b.column("score").to_numpy()
        np.testing.assert_allclose(sa, sb, rtol=0, atol=1e-9)
        ua, ub = a.column("url").to_pylist(), b.column("url").to_pylist()
        for i in range(len(ua)):
            if ua[i] != ub[i]:
                # legal only on an exact score tie (tie-break is the doc id,
                # which the reordering intentionally changes)
                assert abs(sa[i] - sb[i]) < 1e-12

    def test_better_compression_on_clustered_corpus(self, gorder_vs_hash):
        """Topic docs are spread ~evenly through the hash-ordered docmap
        (positions ~n_topics apart -> 2-byte varint deltas); gorder makes them
        adjacent (delta ~1 -> 1 byte). The doc blobs must shrink measurably."""
        from flatnav_ray.stages.introspect import index_size_bytes

        s_hash = index_size_bytes(gorder_vs_hash["hash"])["segments"]
        s_gord = index_size_bytes(gorder_vs_hash["gorder"])["segments"]
        assert s_gord < s_hash * 0.97, (s_gord, s_hash)
        # rcm clusters the same graph (O(V+E) BFS instead of greedy argmax)
        s_rcm = index_size_bytes(gorder_vs_hash["rcm"])["segments"]
        assert s_rcm < s_hash * 0.97, (s_rcm, s_hash)


class TestGreedyEngineEquivalence:
    def test_heap_matches_argmax(self):
        # the two greedy engines (argmax scan vs lazy heap) must produce the
        # SAME permutation — the crossover dispatch must be invisible
        from flatnav_ray.stages.reorder import _greedy_argmax, _greedy_heap

        rng = np.random.Generator(np.random.PCG64(11))
        for n, nterm, df in [(257, 400, 5), (1500, 2500, 7)]:
            pos, codes = [], []
            for t in range(nterm):
                docs = rng.choice(n, size=df, replace=False)
                pos.extend(docs.tolist())
                codes.extend([t] * df)
            indptr, idx = doc_similarity_graph(
                np.array(pos, dtype=np.int64), np.array(codes, dtype=np.int64), n
            )
            a = _greedy_argmax(indptr, idx, 0, n, 8)
            b = _greedy_heap(indptr, idx, 0, n, 8)
            np.testing.assert_array_equal(a, b)
