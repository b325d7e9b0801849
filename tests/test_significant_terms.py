"""Significant-terms aggregation (pipelines/query.significant_terms) vs a
brute-force Python replica: exact foreground counts, background lift, and
the (lift desc, term asc) top-n cut."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.config import IndexConfig
from flatnav_ray.functions.tokenize import tokenize_py
from flatnav_ray.pipelines.build import build_index, prepare_batch
from flatnav_ray.pipelines.query import significant_terms
from flatnav_ray.sources.synth import pages_table, queries_table
from flatnav_ray.stages.build import dedup_latest


@pytest.fixture(scope="module")
def sig_index(ray_session, tmp_path_factory):
    import ray.data

    pages = pages_table(400, seed=33, vocab_size=300, mean_len=30)
    pdir = tmp_path_factory.mktemp("sig_pages")
    pq.write_table(pages, str(pdir / "p0.parquet"))
    ix = str(tmp_path_factory.mktemp("sig_ix") / "ix")
    build_index(ray.data.read_parquet(str(pdir)), ix, IndexConfig(num_partitions=4))
    return ix, pages


def test_significant_terms_match_oracle(sig_index):
    ix, pages = sig_index
    queries = queries_table(8, seed=11, vocab_size=300)
    top_n = 5
    got = significant_terms(ix, queries, top_n=top_n)

    docs = dedup_latest(prepare_batch(pages, 4, None))
    tok_sets = [set(tokenize_py(t)) for t in docs.column("text").to_pylist()]
    n_docs = len(tok_sets)
    df: Counter = Counter()
    for toks in tok_sets:
        df.update(toks)

    want_rows = []
    for qid, qtext in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        qterms = {t for t in set(tokenize_py(qtext)) if df[t] > 0}
        match = [toks for toks in tok_sets if qterms & toks]
        if not match:
            continue
        mn = len(match)
        fg: Counter = Counter()
        for toks in match:
            fg.update(toks)
        scored = [
            (t, c, (float(c) * float(n_docs)) / (float(mn) * float(df[t])))
            for t, c in fg.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for t, c, lift in scored[:top_n]:
            want_rows.append((qid, t, c, mn, df[t], lift))

    got_rows = list(
        zip(
            got.column("query_id").to_pylist(),
            got.column("term").to_pylist(),
            got.column("match_df").to_pylist(),
            got.column("match_n").to_pylist(),
            got.column("df").to_pylist(),
            got.column("lift").to_pylist(),
        )
    )
    assert sorted(got_rows) == sorted(want_rows)
    # lifts must be bit-identical (same float association), not just close
    for (_, _, _, _, _, gl), (_, _, _, _, _, wl) in zip(
        sorted(got_rows), sorted(want_rows)
    ):
        assert np.float64(gl) == np.float64(wl)
