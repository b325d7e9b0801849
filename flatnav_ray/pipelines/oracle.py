"""Brute-force BM25 oracle — the ground-truth generator (FIXTURES.md §3).

The analog of ann-benchmarks' exact-kNN gtruth files the reference verifies
against (/root/reference/experiments/README.md:203-211,
tools/query_npy.cpp:52-66): an independent naive full-scan scorer sharing NO
code with the engine's codec/segment/actor path (only the tokenizer+formula
definition, which IS the spec). Pure Python dict accumulation, deliberately
simple.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize_py


def brute_force_topk(
    docs: pa.Table,
    queries: pa.Table,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    conjunctive: bool = False,
    min_should_match: int = 0,
    phrase: bool = False,
    phrase_slop: int = 0,
) -> pa.Table:
    """docs: (doc_id, text[, url]); queries: (query_id, text) ->
    (query_id, rank, doc_id, score) with ties (score desc, doc_id asc).

    conjunctive=True: only documents containing EVERY distinct query term
    qualify (a query with a corpus-absent term matches nothing) — the
    ground truth for the engine's method="and" intersection path.

    min_should_match=m (>0): only documents containing at least m distinct
    query terms qualify (corpus-absent terms can never match) — the ground
    truth for QueryConfig.min_should_match.

    phrase=True: only documents containing the query's token sequence as a
    CONTIGUOUS subsequence qualify — the ground truth for method="phrase".
    With phrase_slop=s, consecutive phrase tokens may be up to 1+s positions
    apart, in order (the engine's per-gap proximity semantics)."""
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    tfs: dict[int, Counter] = {}
    dls: dict[int, int] = {}
    dseqs: dict[int, list[str]] = {}
    df: Counter = Counter()
    for d, t in zip(doc_ids, texts):
        toks = tokenize_py(t)
        c = Counter(toks)
        tfs[d] = c
        dls[d] = len(toks)
        if phrase:
            dseqs[d] = toks
        df.update(c.keys())
    n = len(doc_ids)
    avgdl = sum(dls.values()) / n if n else 0.0

    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, qtext in zip(queries.column("query_id").to_pylist(), queries.column("text").to_pylist()):
        qc = Counter(tokenize_py(qtext))
        scores: dict[int, float] = {}
        for term in sorted(qc):  # fixed accumulation order — same as engine
            dft = df.get(term, 0)
            if dft == 0:
                continue
            w = math.log1p((n - dft + 0.5) / (dft + 0.5))  # same libm call as the engine's idf
            qtf = qc[term]
            for d in doc_ids:
                tf = tfs[d].get(term, 0)
                if tf:
                    s = w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
                    scores[d] = scores.get(d, 0.0) + qtf * s
        if conjunctive:
            if any(df.get(t, 0) == 0 for t in qc):
                scores = {}
            else:
                scores = {
                    d: s for d, s in scores.items()
                    if all(tfs[d].get(t, 0) > 0 for t in qc)
                }
        elif min_should_match > 0:
            scores = {
                d: s for d, s in scores.items()
                if sum(1 for t in qc if tfs[d].get(t, 0) > 0) >= min_should_match
            }
        elif phrase:
            seq = tokenize_py(qtext)
            if not seq:
                scores = {}
                seq = ["\0"]  # unreachable below; keeps _slop_match well-formed

            def _slop_match(toks: list[str]) -> bool:
                cur = {i for i, t in enumerate(toks) if t == seq[0]}
                for term in seq[1:]:
                    ps = [i for i, t in enumerate(toks) if t == term]
                    cur = {
                        p for c in cur for p in ps if c < p <= c + 1 + phrase_slop
                    }
                    if not cur:
                        return False
                return bool(cur)

            scores = {d: s for d, s in scores.items() if _slop_match(dseqs[d])}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (d, s) in enumerate(ranked):
            out_q.append(qid)
            out_r.append(r)
            out_d.append(d)
            out_s.append(s)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int32()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


def recall_at_k(results: pa.Table, gtruth: pa.Table, k: int = 10) -> float:
    """|topk ∩ gtruth| / k averaged over queries — the reference's recall
    metric (/root/reference/python-bindings/unit_tests/test_utils.py:57-91)."""
    from collections import defaultdict

    got = defaultdict(set)
    for q, d in zip(results.column("query_id").to_pylist(), results.column("doc_id").to_pylist()):
        got[q].add(d)
    want = defaultdict(set)
    for q, d in zip(gtruth.column("query_id").to_pylist(), gtruth.column("doc_id").to_pylist()):
        want[q].add(d)
    if not want:
        return 1.0
    accs = []
    for q, w in want.items():
        if not w:
            continue
        accs.append(len(got[q] & w) / len(w))
    return float(np.mean(accs)) if accs else 1.0
