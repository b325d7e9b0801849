"""Facet / total-hit counting over the match set vs a Python-counted oracle."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.config import IndexConfig
from flatnav_ray.functions.tokenize import tokenize_py
from flatnav_ray.pipelines.build import build_index, prepare_batch
from flatnav_ray.pipelines.query import facet_counts
from flatnav_ray.sources.synth import pages_table, queries_table
from flatnav_ray.stages.build import dedup_latest


@pytest.fixture(scope="module")
def facet_index(ray_session, tmp_path_factory):
    import ray.data

    pages = pages_table(500, seed=21, vocab_size=800, mean_len=40)
    pdir = tmp_path_factory.mktemp("facet_pages")
    pq.write_table(pages, str(pdir / "p0.parquet"))
    ix = str(tmp_path_factory.mktemp("facet_ix") / "ix")
    build_index(ray.data.read_parquet(str(pdir)), ix, IndexConfig(num_partitions=4))
    return ix, pages


def test_facet_counts_match_oracle(facet_index):
    ix, pages = facet_index
    queries = queries_table(15, seed=5, vocab_size=800)
    got = facet_counts(ix, queries, facet="lang")

    docs = dedup_latest(prepare_batch(pages, 4, None))
    seqs = [set(tokenize_py(t)) for t in docs.column("text").to_pylist()]
    langs = docs.column("lang").to_pylist()
    want: Counter = Counter()
    totals: Counter = Counter()
    for qid, qtext in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        qterms = set(tokenize_py(qtext))
        for toks, lang in zip(seqs, langs):
            if qterms & toks:
                want[(qid, lang)] += 1
                totals[qid] += 1
    got_map = {
        (q, l): n
        for q, l, n in zip(
            got.column("query_id").to_pylist(),
            got.column("lang").to_pylist(),
            got.column("n_docs").to_pylist(),
        )
    }
    assert got_map == dict(want)
    # per-query totals (the total_hits surface) = sum over facets
    by_q: Counter = Counter()
    for (q, _l), n in got_map.items():
        by_q[q] += n
    assert by_q == totals
    assert len(got) > 0


def test_prefix_counts_match_oracle(facet_index):
    """Wildcard term* dictionary scan: per-prefix doc counts equal a
    python-counted oracle; a prefix matching nothing yields no row."""
    from flatnav_ray.pipelines.query import prefix_doc_counts

    ix, pages = facet_index
    docs = dedup_latest(prepare_batch(pages, 4, None))
    toksets = [set(tokenize_py(t)) for t in docs.column("text").to_pylist()]
    vocab = sorted({t for s in toksets for t in s})
    prefixes = [vocab[0][:2], vocab[len(vocab) // 2][:3], "zzzzzqx", vocab[-1][:1]]
    got = prefix_doc_counts(ix, prefixes)
    want = {}
    for qi, pre in enumerate(prefixes):
        n = sum(1 for s in toksets if any(t.startswith(pre) for t in s))
        if n:
            want[qi] = n
    got_map = dict(
        zip(got.column("query_id").to_pylist(), got.column("n_docs").to_pylist())
    )
    assert got_map == want
    assert 2 not in got_map  # the impossible prefix produced no row


def test_filtered_search_matches_filtered_oracle(facet_index):
    """filter_lang: results equal the unfiltered oracle restricted to that
    lang and re-ranked (idf/avgdl stay corpus-wide); unknown lang -> empty."""
    from flatnav_ray.config import QueryConfig
    from flatnav_ray.pipelines.oracle import brute_force_topk
    from flatnav_ray.pipelines.query import search_to_table

    ix, pages = facet_index
    docs = dedup_latest(prepare_batch(pages, 4, None))
    queries = queries_table(12, seed=9, vocab_size=800)
    lang = sorted(set(docs.column("lang").to_pylist()))[0]
    out = search_to_table(ix, queries, QueryConfig(k=10, filter_lang=lang))
    # oracle: full-corpus scores (corpus-wide stats), filter rows by lang,
    # re-rank per query, truncate
    full = brute_force_topk(docs.select(["doc_id", "text"]), queries, k=100_000)
    lang_of = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("lang").to_pylist())
    )
    rows = [
        (q, d, s)
        for q, d, s in zip(
            full.column("query_id").to_pylist(),
            full.column("doc_id").to_pylist(),
            full.column("score").to_pylist(),
        )
        if lang_of[d] == lang
    ]
    want: list[tuple[int, int]] = []
    for qid in queries.column("query_id").to_pylist():
        qrows = sorted(
            ((d, s) for q, d, s in rows if q == qid), key=lambda t: (-t[1], t[0])
        )[:10]
        want.extend((qid, d) for d, _s in qrows)
    got = list(
        zip(out.column("query_id").to_pylist(), out.column("doc_id").to_pylist())
    )
    assert got == want
    assert len(got) > 0
    none = search_to_table(ix, queries, QueryConfig(k=10, filter_lang="xx-none"))
    assert len(none) == 0


def test_facet_empty_query_and_absent_terms(facet_index):
    ix, _ = facet_index
    queries = pa.table(
        {
            "query_id": pa.array(np.arange(2, dtype=np.int64)),
            "text": pa.array(["zzqqxxjjkk1 zzqqxxjjkk2", ""], type=pa.string()),
        }
    )
    got = facet_counts(ix, queries, facet="lang")
    assert len(got) == 0


def test_len_histogram_matches_oracle(facet_index):
    """Numeric range facet (len:<width>): bucket = doc_len // width over the
    full match set, exact integer counts."""
    ix, pages = facet_index
    queries = queries_table(15, seed=5, vocab_size=800)
    got = facet_counts(ix, queries, facet="len:16")

    docs = dedup_latest(prepare_batch(pages, 4, None))
    toks_per_doc = [tokenize_py(t) for t in docs.column("text").to_pylist()]
    want: Counter = Counter()
    for qid, qtext in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        qterms = set(tokenize_py(qtext))
        for toks in toks_per_doc:
            if qterms & set(toks):
                want[(qid, len(toks) // 16)] += 1
    got_map = {
        (q, b): n
        for q, b, n in zip(
            got.column("query_id").to_pylist(),
            got.column("bucket").to_pylist(),
            got.column("n_docs").to_pylist(),
        )
    }
    assert got_map == dict(want)
    assert len(got) > 0
    assert got.schema.field("bucket").type == pa.int64()


def test_match_percentiles_match_numpy(facet_index):
    """Exact percentiles agg: per-shard histograms must reproduce numpy's
    type-7 quantiles (the same linear interpolation) bit-for-bit."""
    import numpy as np

    from flatnav_ray.pipelines.query import match_percentiles

    ix, pages = facet_index
    queries = queries_table(15, seed=5, vocab_size=800)
    got = match_percentiles(ix, queries)

    docs = dedup_latest(prepare_batch(pages, 4, None))
    toks_per_doc = [tokenize_py(t) for t in docs.column("text").to_pylist()]
    want = {}
    for qid, qtext in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        qterms = set(tokenize_py(qtext))
        dls = np.array(
            [len(t) for t in toks_per_doc if qterms & set(t)], dtype=np.float64
        )
        if dls.size:
            want[qid] = (
                dls.size,
                float(np.percentile(dls, 25)),
                float(np.percentile(dls, 50)),
                float(np.percentile(dls, 75)),
            )
    got_map = {
        q: (n, p25, p50, p75)
        for q, n, p25, p50, p75 in zip(
            got.column("query_id").to_pylist(),
            got.column("n_docs").to_pylist(),
            got.column("p25").to_pylist(),
            got.column("p50").to_pylist(),
            got.column("p75").to_pylist(),
        )
    }
    assert got_map == want  # exact float equality: same type-7 arithmetic
