"""DSIR importance weighting (pipelines/documents.dsir_logratio) vs a pure
Python replica on a planted corpus written to parquet: target-domain docs
must score higher than background-only docs, values bit-exact."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


@pytest.fixture(scope="module")
def dsir_dir(ray_session, tmp_path_factory):
    texts = [
        ("the neural model trains fast on data", "en"),
        ("neural data model training loop", "en"),
        ("der schnelle braune fuchs springt", "de"),
        ("le renard brun saute vite", "fr"),
        ("model data pipeline with neural nets", "en"),
        ("fuchs springt der braune", "de"),
        ("", "en"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array([t for t, _ in texts], type=pa.string()),
            "lang": pa.array([l for _, l in texts], type=pa.string()),
            "source": pa.array(["s0"] * len(texts), type=pa.string()),
            "n_chars": pa.array([len(t) for t, _ in texts], type=pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("dsir_sf")
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d), texts


def test_dsir_matches_python_replica(dsir_dir):
    sf_dir, texts = dsir_dir
    from flatnav_ray.pipelines.documents import dsir_logratio

    out = dsir_logratio(sf_dir, target_lang="en")

    cft, cfb = Counter(), Counter()
    for t, l in texts:
        for w in _toks(t):
            cfb[w] += 1
            if l == "en":
                cft[w] += 1
    v = float(len(cfb))
    nt, nb = float(sum(cft.values())), float(sum(cfb.values()))
    wmap = {
        t: math.log((cft[t] + 1.0) / (nt + v)) - math.log((cfb[t] + 1.0) / (nb + v))
        for t in cfb
    }
    want = []
    for t, _ in texts:
        tf = Counter(_toks(t))
        want.append(sum(tf[term] * wmap[term] for term in sorted(tf)))

    got = out.column("logratio_e6").to_pylist()
    assert len(got) == len(texts)
    for g, w in zip(got, want):
        # engine output is the 1e-6-quantized BIGINT (driver hash contract)
        s = np.float64(w) * 1e6
        expect = int(np.floor(s + 0.5) if s >= 0 else np.ceil(s - 0.5))
        assert g == expect
    # discrimination: every en doc with text outscores every non-en doc
    langs = [l for _, l in texts]
    en = [g for g, (t, l) in zip(got, texts) if l == "en" and t]
    other = [g for g, (t, l) in zip(got, texts) if l != "en"]
    assert min(en) > max(other)
    # empty doc: zero tokens, zero score
    assert got[6] == 0 and out.column("n_tokens")[6].as_py() == 0
