"""BM25F weighted-field indexing via the weighted-pseudo-document
equivalence (Robertson CIKM'04): integer-weight BM25F(title 2x, body 1x)
== BM25 over `title_tokens + all_tokens`. Oracle: brute_force_topk over the
python-transformed corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.functions.tokenize import tokenize_py
from flatnav_ray.pipelines.build import build_index, prepare_batch
from flatnav_ray.pipelines.oracle import brute_force_topk
from flatnav_ray.pipelines.query import search_to_table
from flatnav_ray.stages.build import dedup_latest

TITLE_LEN = 8


def _weight(text: str) -> str:
    toks = tokenize_py(text)
    return " ".join(toks[:TITLE_LEN] + toks)


def test_fielded_equals_bm25_over_weighted_pseudodoc(
    ray_session, small_corpus, tmp_path_factory
):
    import ray.data

    from flatnav_ray.pipelines.documents import bm25_topk_fielded  # noqa: F401 (entry exists)

    pages, queries = small_corpus
    # null out html so prepare_batch keeps our transformed text (M1 extract
    # overwrites text from html when non-null — the fixture carries both)
    pages = pages.set_column(
        pages.schema.get_field_index("html"),
        "html",
        pa.nulls(len(pages), pages.schema.field("html").type),
    )
    weighted = pages.set_column(
        pages.schema.get_field_index("text"),
        "text",
        pa.array([_weight(t) for t in pages.column("text").to_pylist()]),
    )
    ix = str(tmp_path_factory.mktemp("fieldix") / "main")
    build_index(ray.data.from_arrow(weighted), ix, IndexConfig(num_partitions=5))
    out = search_to_table(ix, queries, QueryConfig(k=8))

    docs = dedup_latest(prepare_batch(weighted, 5, None))
    want = brute_force_topk(docs.select(["doc_id", "text"]), queries, k=8)
    assert out.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert np.allclose(
        out.column("score").to_numpy(), want.column("score").to_numpy()
    )
    # the weighting actually changes some ranking vs the unweighted corpus
    # (title terms gain tf), so this is not vacuously the plain bm25 test
    plain = dedup_latest(prepare_batch(pages, 5, None))
    base = brute_force_topk(plain.select(["doc_id", "text"]), queries, k=8)
    assert (
        base.column("doc_id").to_pylist() != want.column("doc_id").to_pylist()
        or base.column("score").to_pylist() != want.column("score").to_pylist()
    )


def test_fielded_transform_matches_python(ray_session):
    """The vectorized Arrow reassembly in bm25_topk_fielded's _fielded
    transform tokenizes to exactly title_toks + full_toks."""
    from flatnav_ray.functions.tokenize import token_positions

    texts = pa.array(
        [
            "The quick brown fox jumps over the lazy dog again and again",
            "short",
            "",
            "  Punct!! heavy,text;with??separators  and   runs ",
        ]
    )
    parents, flat, pos = token_positions(texts)
    n = len(texts)
    sel = pos < TITLE_LEN
    tp, tflat = parents[sel], flat.filter(pa.array(sel))
    import pyarrow.compute as pc

    t_counts = np.zeros(n, dtype=np.int64)
    np.add.at(t_counts, tp, 1)
    t_offsets = np.r_[0, np.cumsum(t_counts)]
    title_list = pa.ListArray.from_arrays(pa.array(t_offsets, type=pa.int32()), tflat)
    title_str = pc.binary_join(title_list, " ")
    weighted = pc.binary_join_element_wise(title_str, texts, " ")
    for i, t in enumerate(texts.to_pylist()):
        toks = tokenize_py(t)
        assert tokenize_py(weighted[i].as_py()) == toks[:TITLE_LEN] + toks
