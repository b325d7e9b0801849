"""Tokenizer / normalizer — the analog of the reference's ingest transform +
dataset normalization (/root/reference/include/flatnav/distances/DistanceInterface.h:45-52
`transformData`; `--normalize` in /root/reference/experiments/README.md:223).

Canonical analyzer (versioned; rank-identity depends on it):
    lower-case -> split on runs of [^a-z0-9] -> drop empty tokens.

Exactly expressible in DuckDB as
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
which is what the oracle SQL in __ray_entry__.py uses — tokenizer parity is a
tested invariant (tests/test_tokenize.py).

All kernels are Arrow-native (pyarrow.compute) and operate on whole batches —
no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_REGEX = "[^a-z0-9]+"
_PY_SPLIT = re.compile(TOKEN_SPLIT_REGEX)

ANALYZER_VERSION = "v1-lower-alnum"


def tokenize_py(text: str) -> list[str]:
    """Scalar reference tokenizer (oracle for the vectorized kernel)."""
    return [t for t in _PY_SPLIT.split(text.lower()) if t]


def explode_tokens(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
    """Vectorized tokenize+explode: texts -> (row_index per token, token).

    Returns (parents int64 ndarray, flat tokens StringArray), empties removed.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(low, TOKEN_SPLIT_REGEX)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.invert(pc.equal(flat, ""))
    flat = pc.filter(flat, mask)
    parents = pc.filter(parents, mask)
    return parents.to_numpy(zero_copy_only=False).astype(np.int64), flat


def token_positions(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized tokenize+explode WITH token positions:
    texts -> (row_index per token, token, position-within-row per token).

    Position = index in the row's post-filter token sequence (0-based) — the
    coordinate system of phrase adjacency (`positions.py` sidecar). Same
    analyzer as explode_tokens; positions are what DuckDB's
    array_to_string-join adjacency check observes.
    """
    parents, flat = explode_tokens(texts)
    if parents.size == 0:
        return parents, flat, np.empty(0, dtype=np.int64)
    # parents are non-decreasing (list_parent_indices order): position =
    # global token index minus the first global index of the parent row
    starts = np.empty(parents.size, dtype=bool)
    starts[0] = True
    starts[1:] = parents[1:] != parents[:-1]
    first_idx = np.maximum.accumulate(
        np.where(starts, np.arange(parents.size, dtype=np.int64), np.int64(0))
    )
    pos = np.arange(parents.size, dtype=np.int64) - first_idx
    return parents, flat, pos


def strip_stopwords(
    texts: pa.Array | pa.ChunkedArray, stopwords: frozenset[str] | set[str]
) -> pa.Array:
    """Analyzer variant as a text pre-filter: tokenize, drop stopwords,
    re-join with single spaces. Composing this ahead of the standard build
    is EXACTLY a stopword analyzer (same tf/df/doc_len as filtering inside
    the tokenizer), expressed as an ordinary map stage — and exactly
    mirrorable in SQL (list_filter ... NOT list_contains). Vectorized:
    explode -> is_in mask -> rebuilt ListArray -> binary_join."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    parents, flat = explode_tokens(texts)
    keep = pc.invert(pc.is_in(flat, value_set=pa.array(sorted(stopwords))))
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept = flat.filter(keep)
    counts = np.bincount(parents[keep_np], minlength=n)
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offs[1:])
    lists = pa.ListArray.from_arrays(pa.array(offs), kept.combine_chunks() if isinstance(kept, pa.ChunkedArray) else kept)
    return pc.binary_join(lists, " ")


def doc_token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row token count (doc length in tokens), vectorized."""
    n = len(texts)
    parents, _ = explode_tokens(texts)
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, parents, 1)
    return out


def term_frequencies_encoded(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Batch kernel: texts -> dictionary-encoded (code, row, tf) postings.

    ONE string-hash pass (dictionary_encode); the (term, doc) grouping is a
    single integer np.unique over packed keys — ~3x cheaper than a hash
    group-by on token strings, and callers that want per-partition
    dictionaries (the two-phase build map side) consume the codes directly
    with no second encode pass.

    Returns (codes int64, row_idx int64, tf int64, dictionary StringArray),
    sorted by (code, row_idx). Empty texts yield no rows.
    """
    parents, terms = explode_tokens(texts)
    if len(terms) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, pa.array([], type=pa.string())
    enc = pc.dictionary_encode(terms)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = np.int64(len(texts))
    uk, tf = np.unique(codes * n_rows + parents, return_counts=True)
    return uk // n_rows, uk % n_rows, tf.astype(np.int64), enc.dictionary


def term_frequencies(
    doc_ids: np.ndarray, texts: pa.Array | pa.ChunkedArray
) -> pa.Table:
    """Batch kernel: (doc_id, text) rows -> exploded (term, doc_id, tf) postings.

    The flat-postings producer feeding the index build (SURVEY.md §2.2 M4).
    Built on the encoded kernel; rows come out grouped by first-seen term
    code then row index (callers aggregate or sort downstream — none depend
    on this order).
    """
    codes, rows, tf, d = term_frequencies_encoded(texts)
    if codes.size == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "term": d.take(pa.array(codes)),
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)[rows], type=pa.int64()),
            "tf": pa.array(tf, type=pa.int64()),
        }
    )
