"""Property-based tests (hypothesis) for the pure kernels the whole engine
rests on: the varint/delta posting codec, the tokenizer batch/scalar parity,
the hash spec equivalence, and bounded top-k selection. No Ray needed."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from flatnav_ray.functions.bm25 import topk_select
from flatnav_ray.functions.codec import (
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)
from flatnav_ray.functions.hashes import hash64_str, splitmix64, stable_hash64
from flatnav_ray.functions.tokenize import explode_tokens, tokenize_py


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True
    ),
    st.data(),
    st.sampled_from([4, 32, 128]),
)
def test_postings_roundtrip_any_block_size(ids, data, block_size):
    doc_ids = np.sort(np.asarray(ids, dtype=np.int64))
    tfs = np.asarray(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=1000),
                min_size=len(ids), max_size=len(ids),
            )
        ),
        dtype=np.int64,
    )
    dls = np.maximum(tfs, 1)
    enc = encode_postings(doc_ids, tfs, dls, block_size=block_size)
    assert enc.df == doc_ids.size
    pos, tf = decode_postings(
        enc.doc_blob, enc.tf_blob, enc.block_last_doc, block_size=block_size
    )
    assert np.array_equal(pos, doc_ids)
    assert np.array_equal(tf, tfs)
    # block metadata invariants
    assert enc.block_last_doc[-1] == doc_ids[-1]
    assert np.all(np.diff(enc.block_last_doc) > 0)
    assert int(enc.block_max_tf.max()) == int(tfs.max())


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=20))
def test_tokenizer_batch_equals_scalar(texts):
    parents, toks = explode_tokens(pa.array(texts, type=pa.string()))
    got: dict[int, list[str]] = {}
    for p, t in zip(parents.tolist(), toks.to_pylist()):
        got.setdefault(p, []).append(t)
    for i, text in enumerate(texts):
        assert got.get(i, []) == tokenize_py(text), text


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=30), max_size=30))
def test_stable_hash64_matches_scalar_spec(strings):
    vec = stable_hash64(pa.array(strings, type=pa.string()))
    for s, h in zip(strings, vec.tolist()):
        assert np.uint64(h) == np.uint64(hash64_str(s)), repr(s)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_splitmix64_is_a_bijection_sample(xs):
    arr = np.asarray(xs, dtype=np.uint64)
    out = splitmix64(arr)
    # distinct inputs -> distinct outputs (bijectivity spot check)
    assert len(set(out.tolist())) == len(set(arr.tolist()))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64), min_size=0, max_size=200),
    st.integers(min_value=1, max_value=20),
)
def test_topk_select_matches_lexsort(scores, k):
    sc = np.asarray(scores, dtype=np.float64)
    ids = np.arange(sc.size, dtype=np.int64) * 3 + 1
    docs, ssc = topk_select(sc, ids, k)
    order = np.lexsort((ids, -sc))[: min(k, sc.size)]
    assert np.array_equal(docs, ids[order])
    assert np.array_equal(ssc, sc[order])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abc012 ", max_size=30), max_size=10))
def test_char_pair_counts_match_python(texts):
    from collections import Counter

    from flatnav_ray.functions.textstats import char_pair_counts
    from flatnav_ray.functions.tokenize import tokenize_py

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = char_pair_counts(batch)
    got = dict(zip(out.column("pair").to_pylist(), out.column("cnt").to_pylist()))
    want: Counter = Counter()
    for t in texts:
        for w in tokenize_py(t):
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    assert got == dict(want)
