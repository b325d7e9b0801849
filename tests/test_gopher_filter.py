"""Composite Gopher-style quality gate (functions/textstats.gopher_keep):
integer signals + keep decision vs a per-rule Python replica."""

import re
from collections import Counter

import pyarrow as pa

from flatnav_ray.functions.textstats import STOPWORDS_EN, gopher_keep


def _py_signals(text: str):
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    n = len(toks)
    nd = len(set(toks))
    sl = sum(len(w) for w in toks)
    ns = sum(1 for w in toks if w in STOPWORDS_EN)
    bigrams = Counter(zip(toks, toks[1:]))
    maxc = max(bigrams.values()) if bigrams else 0
    keep = (
        20 <= n <= 90
        and 3 * n <= sl <= 5 * n
        and 5 * (n - nd) <= 3 * n
        and 50 * maxc <= 3 * n
        and ns >= 1
    )
    return n, nd, sl, maxc, ns, keep


class TestGopherKeep:
    def test_matches_python_replica(self):
        texts = [
            # kept: 34 varied short tokens incl. stopwords, low repetition
            "the cat and dog ran to a big red barn near the old mill "
            "then four kids ate ripe figs by the cool pond as two birds "
            "flew over tall green trees at dusk",
            # too short
            "the tiny doc",
            # repetitive bigram: 'spam ham' dominates
            "the " + "spam ham " * 30,
            # no stopwords at all
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
            # empty
            "",
        ]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        out = gopher_keep(batch)
        for i, text in enumerate(texts):
            n, nd, sl, maxc, ns, keep = _py_signals(text)
            row = {c: out.column(c)[i].as_py() for c in out.column_names}
            assert row == {
                "doc_id": i,
                "n_tokens": n,
                "n_distinct": nd,
                "sum_tok_len": sl,
                "max_bigram_c": maxc,
                "n_stop": ns,
                "keep": keep,
            }, (i, text[:40])
        keeps = out.column("keep").to_pylist()
        assert keeps == [True, False, False, False, False]
