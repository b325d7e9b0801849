"""O4 docid reordering (flatnav reorder() graft): dense url-sorted ids must
shrink posting blobs and leave ranking identical (compared by url — ids are
an internal layout choice, like the reference's gorder/rcm orderings which
change node ids but not search results, Index.h:412-427)."""

import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import search_to_table
from flatnav_ray.stages.introspect import index_size_bytes


@pytest.fixture(scope="module")
def two_orderings(ray_session, small_corpus, tmp_path_factory):
    import ray.data

    pages, queries = small_corpus
    base = tmp_path_factory.mktemp("reorder")
    ix_hash = str(base / "hash")
    ix_dense = str(base / "dense")
    build_index(ray.data.from_arrow(pages), ix_hash, IndexConfig(num_partitions=8))
    build_index(
        ray.data.from_arrow(pages), ix_dense,
        IndexConfig(num_partitions=8, docid_strategy="dense_url"),
    )
    return ix_hash, ix_dense, queries


class TestDocidReorder:
    def test_rank_identical_by_url(self, two_orderings):
        """Scores identical rank-for-rank; urls identical except where exact
        score ties allow either order (tie-break is by doc_id, which the
        reordering intentionally changes — exactly like the reference's
        reorder() changing node ids but not result quality)."""
        import numpy as np

        ix_hash, ix_dense, queries = two_orderings
        a = search_to_table(ix_hash, queries, QueryConfig(k=10))
        b = search_to_table(ix_dense, queries, QueryConfig(k=10))
        assert len(a) == len(b)
        sa = a.column("score").to_numpy()
        sb = b.column("score").to_numpy()
        np.testing.assert_allclose(sa, sb, rtol=0, atol=1e-9)
        ua, ub = a.column("url").to_pylist(), b.column("url").to_pylist()
        mismatches = [i for i in range(len(ua)) if ua[i] != ub[i]]
        for i in mismatches:
            # a url mismatch is only legal when both docs score EXACTLY equal
            # (tie-break is by doc_id, which the reorder changes — including
            # ties at the top-k boundary where the partner fell outside k)
            assert abs(sa[i] - sb[i]) < 1e-12, (i, ua[i], ub[i], sa[i], sb[i])
        # and most ranks agree outright
        assert len(mismatches) < len(ua) * 0.1

    def test_position_blobs_compact(self, two_orderings):
        """Posting blobs store partition-local docmap POSITIONS (delta+varint)
        — under both orderings the doc component must stay near 1-2 bytes per
        posting. (The dense_url ordering used to cut raw-hash-id blobs >20%;
        position encoding gives that compression to every ordering, so the
        assertion is absolute now, and dense must not regress vs hash.)"""
        import os

        import numpy as np
        import pyarrow.parquet as pq

        ix_hash, ix_dense, _ = two_orderings
        for ix in (ix_hash, ix_dense):
            seg_dir = os.path.join(ix, "segments")
            blob = post = 0
            for f in sorted(os.listdir(seg_dir)):
                t = pq.read_table(os.path.join(seg_dir, f), columns=["df", "doc_blob"])
                post += int(t.column("df").to_numpy(zero_copy_only=False).astype(np.int64).sum())
                blob += sum(len(x.as_py()) for x in t.column("doc_blob"))
            assert post > 0 and blob / post < 2.5, (ix, blob, post)
        s_hash = index_size_bytes(ix_hash)["segments"]
        s_dense = index_size_bytes(ix_dense)["segments"]
        assert s_dense < s_hash * 1.1, (s_dense, s_hash)

    def test_partition_derivable_from_id(self, two_orderings):
        import pyarrow.parquet as pq
        import os

        _, ix_dense, _ = two_orderings
        dm_dir = os.path.join(ix_dense, "docmap")
        for f in sorted(os.listdir(dm_dir)):
            p = int(f.split("-")[1].split(".")[0])
            ids = pq.read_table(os.path.join(dm_dir, f)).column("doc_id").to_numpy(zero_copy_only=False)
            assert (ids % 8 == p).all()
