"""Highlight/snippet surface (pipelines/documents.bm25_topk_highlight's
assembly semantics, tested at the library level): earliest-occurrence term,
1-based position, ctx/width window, (pos, term) tie order."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.config import IndexConfig, QueryConfig
from flatnav_ray.pipelines.build import build_index
from flatnav_ray.pipelines.query import search_to_table


@pytest.fixture(scope="module")
def hl_index(ray_session, tmp_path_factory):
    import ray.data

    texts = [
        "zebra apple banana cherry",          # apple at pos 7
        "apple zebra zebra zebra",            # apple at pos 1
        "banana banana apple end",            # banana at 1, apple at 15
        "plain words only here nothing",      # no query terms
    ]
    from flatnav_ray.sources.synth import PagesGenerator

    urls = [f"u{i}" for i in range(len(texts))]
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
            "html": pa.array(
                [PagesGenerator.render_html(u, t) for u, t in zip(urls, texts)],
                type=pa.binary(),
            ),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
        }
    )
    pdir = tmp_path_factory.mktemp("hl_pages")
    pq.write_table(pages, str(pdir / "p0.parquet"))
    ix = str(tmp_path_factory.mktemp("hl_ix") / "ix")
    build_index(ray.data.read_parquet(str(pdir)), ix, IndexConfig(num_partitions=2))
    return ix, texts, pages


def _assemble(texts_by_doc, results, qterms, ctx=20, width=60):
    rows = []
    for qid, did in results:
        text = texts_by_doc[did]
        best = None
        for term in sorted(qterms):
            p = text.find(term)
            if p >= 0 and (best is None or (p + 1, term) < best):
                best = (p + 1, term)
        assert best is not None
        pos1, term = best
        start = max(1, pos1 - ctx)
        rows.append((qid, did, term, pos1, text[start - 1 : start - 1 + width]))
    return rows


def test_earliest_occurrence_and_window(hl_index):
    ix, texts, pages = hl_index
    queries = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "text": pa.array(["apple banana"], type=pa.string()),
        }
    )
    out = search_to_table(ix, queries, QueryConfig(k=5, method="maxscore"))
    got = list(
        zip(out.column("query_id").to_pylist(), out.column("doc_id").to_pylist())
    )
    assert len(got) == 3  # doc with no query terms not retrieved

    # map result doc ids back to texts via the retrieved urls
    url_by_doc = dict(
        zip(out.column("doc_id").to_pylist(), out.column("url").to_pylist())
    )
    text_by_url = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    texts_by_doc = {d: text_by_url[u] for d, u in url_by_doc.items()}
    rows = _assemble(texts_by_doc, got, {"apple", "banana"})
    by_text = {texts_by_doc[r[1]]: r for r in rows}

    t, pos = by_text[texts[0]][2], by_text[texts[0]][3]
    assert (t, pos) == ("apple", 7)
    assert by_text[texts[1]][2:4] == ("apple", 1)
    # doc 2: banana at pos 1 beats apple at 15
    assert by_text[texts[2]][2:4] == ("banana", 1)
    # window: hit at pos 7, ctx 20 -> snippet starts at char 1
    assert by_text[texts[0]][4] == texts[0][:60]
