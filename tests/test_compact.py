"""Index merge/compaction (S8 graft): merging two disjoint-corpus indexes
must equal one index built over the union corpus."""

import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import search_to_table
from flatnav_ray.stages.compact import merge_indexes
from flatnav_ray.stages.introspect import canonical_postings


def test_merge_two_indexes_equals_union_build(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from flatnav_ray.sources.synth import PagesGenerator, queries_table

    gen = PagesGenerator(seed=7, vocab_size=2000, mean_len=50, dup_rate=0.0)
    a = gen.chunk(0, 400)
    b = gen.chunk(1, 400)
    cfg = IndexConfig(num_partitions=6)
    ix_a, ix_b = str(tmp_path / "a"), str(tmp_path / "b")
    ix_m, ix_u = str(tmp_path / "m"), str(tmp_path / "u")
    build_index(ray.data.from_arrow(a), ix_a, cfg)
    build_index(ray.data.from_arrow(b), ix_b, cfg)
    stats = merge_indexes([ix_a, ix_b], ix_m)
    build_index(ray.data.from_arrow(pa.concat_tables([a, b])), ix_u, cfg)
    assert canonical_postings(ix_m).equals(canonical_postings(ix_u))
    # merged index serves identical results
    q = queries_table(15, seed=3, vocab_size=2000)
    ra = search_to_table(ix_m, q, QueryConfig(k=10))
    rb = search_to_table(ix_u, q, QueryConfig(k=10))
    assert ra.equals(rb)
    assert stats["n_docs"] == 800


def test_add_documents_equals_union_build_and_upserts(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from flatnav_ray.pipelines.ingest import add_documents
    from flatnav_ray.sources.synth import PagesGenerator, queries_table

    gen = PagesGenerator(seed=11, vocab_size=2000, mean_len=50, dup_rate=0.0)
    a = gen.chunk(0, 300)
    b = gen.chunk(1, 300)
    cfg = IndexConfig(num_partitions=6)
    ix, ix_u = str(tmp_path / "incr"), str(tmp_path / "union")
    build_index(ray.data.from_arrow(a), ix, cfg)
    stats = add_documents(ix, ray.data.from_arrow(b))  # in-place generation swap
    build_index(ray.data.from_arrow(pa.concat_tables([a, b])), ix_u, cfg)
    assert canonical_postings(ix).equals(canonical_postings(ix_u))
    q = queries_table(15, seed=5, vocab_size=2000)
    assert search_to_table(ix, q, QueryConfig(k=10)).equals(
        search_to_table(ix_u, q, QueryConfig(k=10))
    )
    assert stats["n_docs"] == 600

    # upsert: re-adding an existing url with new text replaces its postings
    import pyarrow.compute as pc

    row = a.slice(0, 1)
    url = row.column("url")[0].as_py()
    updated = row.set_column(
        row.schema.get_field_index("html"),
        "html",
        pa.array([b"<html><body><p>zzzreplacementterm only</p></body></html>"], pa.binary()),
    )
    add_documents(ix, ray.data.from_arrow(updated))
    qq = pa.table({"query_id": pa.array([0], pa.int64()), "text": pa.array(["zzzreplacementterm"])})
    hit = search_to_table(ix, qq, QueryConfig(k=5))
    assert len(hit) == 1 and hit.column("url")[0].as_py() == url


def test_block_size_mismatch_rejected(ray_session, tmp_path):
    """Merging indexes built with different block_size would silently corrupt
    postings (positions are block-absolute) — must be rejected up front."""
    import ray.data

    from flatnav_ray.sources.synth import PagesGenerator

    a = PagesGenerator(seed=1).chunk(0, 200)
    ix_a = str(tmp_path / "a")
    ix_b = str(tmp_path / "b")
    build_index(ray.data.from_arrow(a), ix_a, IndexConfig(num_partitions=2, block_size=128))
    build_index(ray.data.from_arrow(a), ix_b, IndexConfig(num_partitions=2, block_size=64))
    with pytest.raises(AssertionError, match="block_size"):
        merge_indexes([ix_a, ix_b], str(tmp_path / "m"), IndexConfig(num_partitions=2, block_size=128))


def test_recover_generation_rolls_forward_and_back(ray_session, tmp_path):
    """Crash between the two swap renames leaves index_dir missing with
    .old-<tag> (and maybe a complete .gen-<tag>) beside it; opening the index
    must repair the state (ADVICE r2)."""
    import os
    import shutil

    import ray.data

    from flatnav_ray.pipelines.ingest import recover_generation
    from flatnav_ray.sources.synth import PagesGenerator
    from flatnav_ray.state.stats import load_stats

    a = PagesGenerator(seed=2).chunk(0, 150)
    ix = str(tmp_path / "ix")
    build_index(ray.data.from_arrow(a), ix, IndexConfig(num_partitions=2))

    # forward: complete .gen exists (stats.json present)
    gen = f"{ix}.gen-deadbeef"
    shutil.copytree(ix, gen)
    os.rename(ix, f"{ix}.old-deadbeef")
    assert recover_generation(ix) == "forward"
    assert os.path.exists(os.path.join(ix, "stats.json"))
    assert not os.path.exists(gen) and not os.path.exists(f"{ix}.old-deadbeef")
    n_docs = load_stats(ix)["n_docs"]

    # back: .gen is torn (no stats.json) -> old generation restored
    gen = f"{ix}.gen-cafe0001"
    shutil.copytree(ix, gen)
    os.remove(os.path.join(gen, "stats.json"))
    os.rename(ix, f"{ix}.old-cafe0001")
    assert recover_generation(ix) == "back"
    assert load_stats(ix)["n_docs"] == n_docs
    assert not os.path.exists(gen)

    # intact index: no-op
    assert recover_generation(ix) is None
