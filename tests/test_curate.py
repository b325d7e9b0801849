"""End-to-end curation chain (pipelines/documents.curate_pipeline) on a
planted corpus written to parquet: the dedup leg must actually collapse
duplicate texts, the decontam leg must drop benchmark-overlapping docs, and
the final manifest must satisfy every stage's invariant."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flatnav_ray.functions.hashes import splitmix64
from flatnav_ray.functions.textstats import STOPWORDS_EN


def _gopher_ok(text: str) -> bool:
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    n = len(toks)
    if not n:
        return False
    nd, sl = len(set(toks)), sum(len(w) for w in toks)
    ns = sum(1 for w in toks if w in STOPWORDS_EN)
    maxc = max(Counter(zip(toks, toks[1:])).values()) if n >= 2 else 0
    return (
        20 <= n <= 90
        and 3 * n <= sl <= 5 * n
        and 5 * (n - nd) <= 3 * n
        and 50 * maxc <= 3 * n
        and ns >= 1
    )


def _grams(text: str, n: int = 4):
    w = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    rng = np.random.RandomState(5)
    words = ["the", "a", "cat", "dog", "run", "fast", "big", "red", "sun", "sky",
             "mud", "fog", "ice", "oak", "elm", "fox", "owl", "bee", "ant", "cow"]
    texts = []
    for i in range(120):
        n = rng.randint(25, 60)
        texts.append(" ".join(rng.choice(words, size=n)))
    # planted: ids 120/121 duplicate id 0's text exactly (dedup leg)
    texts += [texts[0], texts[0]]
    n_docs = len(texts)  # 122; benchmark slice = doc_id % 31 == 0 (0,31,62,93)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
            "source": pa.array([f"s{i % 3}" for i in range(n_docs)], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("curate_sf")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d), texts


def test_curate_pipeline_invariants(corpus_dir):
    sf_dir, texts = corpus_dir
    from flatnav_ray.pipelines.documents import curate_pipeline

    out = curate_pipeline(sf_dir, budget=400)
    kept = out.column("doc_id").to_pylist()
    ntok = dict(zip(kept, out.column("n_tokens").to_pylist()))
    src = dict(zip(kept, out.column("source").to_pylist()))

    bench_ids = {i for i in range(len(texts)) if i % 31 == 0}
    bench_grams = set().union(*(_grams(texts[i]) for i in bench_ids))
    first_by_text = {}
    for i, t in enumerate(texts):
        first_by_text.setdefault(t, i)

    assert kept, "pipeline must keep something"
    for d in kept:
        t = texts[d]
        assert _gopher_ok(t), d                       # quality gate
        assert first_by_text[t] == d, d               # dedup winner
        assert d not in bench_ids, d                  # benchmark excluded
        assert not (_grams(t) & bench_grams), d       # decontaminated
        assert ntok[d] == len(t.split()), d

    # duplicate clones can never be kept (their original has the lower id)
    assert 120 not in kept and 121 not in kept

    # mixture budget: per source, kept docs are the hash-order prefix <= 400
    for s in set(src.values()):
        tot = sum(ntok[d] for d in kept if src[d] == s)
        assert tot <= 400, (s, tot)

    # prefix property: any eligible doc hashed BEFORE a kept doc of the same
    # source must itself be kept or be ineligible
    elig = [
        i
        for i, t in enumerate(texts)
        if _gopher_ok(t)
        and first_by_text[t] == i
        and i not in bench_ids
        and not (_grams(t) & bench_grams)
    ]
    h = {i: int(splitmix64(np.array([i], dtype=np.uint64))[0]) for i in elig}
    for s in set(src.values()):
        chain = sorted(
            (i for i in elig if f"s{i % 3}" == s), key=lambda i: (h[i], i)
        )
        cum, want = 0, []
        for i in chain:
            w = len(texts[i].split())
            cum += w
            if cum <= 400:
                want.append(i)
        assert sorted(d for d in kept if src[d] == s) == sorted(want), s
