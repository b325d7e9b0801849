"""Stable 64-bit hashing + MinHash / SimHash signature kernels.

All hashes here are deterministic across processes, sessions AND library
versions (no PYTHONHASHSEED dependence, no third-party hash implementation) —
the analog of the reference's deterministic node-id assignment
(/root/reference/include/flatnav/index/Index.h:262-272 assigns dense ids in
insertion order; we assign by stable content hash so ids are independent of
parallelism and partition count, which the determinism tests require).

The string hash is a word-wise FNV-1a variant: fold 8-byte little-endian
words (zero-padded tail) with h = (h ^ word) * FNV_PRIME, then finish with a
splitmix64 mix of the length (disambiguates trailing NULs) — one definition,
implemented twice: a scalar spec (`hash64_bytes`) and a vectorized numpy
kernel (`stable_hash64`) asserted equal in tests. Every worker of a job
computes the same hash by construction; there is no optional fast path that
could diverge across the cluster (doc_ids, dedup keys and shuffle partitions
all derive from this).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# splitmix64 constants — public-domain PRNG finalizer, used as a cheap strong
# 64-bit mixer for integer inputs.
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

_U64 = np.uint64
_MASK63 = np.uint64((1 << 63) - 1)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def hash64_bytes(data: bytes, seed: int = 0) -> int:
    """Scalar spec of the string hash: word-wise FNV-1a + splitmix64(length)
    finisher. `stable_hash64` must match this exactly (tested)."""
    h = int(_FNV_OFFSET)
    for j in range(0, len(data), 8):
        w = int.from_bytes(data[j : j + 8], "little")  # implicit zero pad
        h = ((h ^ w) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    h = int(splitmix64(np.array([h ^ len(data)], dtype=np.uint64))[0])
    if seed:
        h = int(splitmix64(np.array([h ^ seed], dtype=np.uint64))[0])
    return h


def hash64_str(s: str, seed: int = 0) -> int:
    return hash64_bytes(s.encode("utf-8"), seed)


# max padded-matrix words per chunk (~16 MB) — bounds the temporary the
# vectorized kernel allocates regardless of how long the longest string is
_CHUNK_WORDS = 1 << 21


def stable_hash64(strings, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit hash of strings -> uint64 array.

    Accepts a pyarrow String/LargeString (Chunked)Array (zero-copy over its
    offsets/data buffers — preferred in batch kernels) or any sequence of str.
    Rows are processed in length-sorted chunks so the padded word matrix stays
    ~16 MB whatever the length skew; each chunk folds 8-byte words in lockstep
    (vectorized across rows). Matches `hash64_bytes` bit-for-bit.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), type=pa.string())
    n = len(strings)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    if pa.types.is_large_string(strings.type) or pa.types.is_large_binary(strings.type):
        offs = np.frombuffer(strings.buffers()[1], dtype=np.int64)[
            strings.offset : strings.offset + n + 1
        ]
    else:
        offs = np.frombuffer(strings.buffers()[1], dtype=np.int32)[
            strings.offset : strings.offset + n + 1
        ].astype(np.int64)
    valbuf = strings.buffers()[2]
    vals = np.frombuffer(valbuf, dtype=np.uint8) if valbuf is not None else np.empty(0, np.uint8)
    starts = offs[:-1]
    lens = offs[1:] - starts
    order = np.argsort(lens, kind="stable")

    i = 0
    with np.errstate(over="ignore"):
        while i < n:
            j = min(n, i + 4096)
            maxw = max(1, int(lens[order[j - 1]] + 7) // 8)
            j = min(j, i + max(1, _CHUNK_WORDS // maxw))
            sel = order[i:j]
            sl = lens[sel]
            maxw = max(1, int(sl[-1] + 7) // 8)
            rows = sel.size
            # padded byte matrix via per-row slice copies (O(total bytes);
            # a vectorized gather would build index matrices 8x the text size)
            bmat = np.zeros((rows, maxw * 8), dtype=np.uint8)
            st = starts[sel]
            for r in range(rows):
                ln = sl[r]
                if ln:
                    bmat[r, :ln] = vals[st[r] : st[r] + ln]
            words = bmat.view("<u8")
            wn = (sl + 7) // 8  # ascending (rows are length-sorted)
            h = np.full(rows, _FNV_OFFSET, dtype=np.uint64)
            for wj in range(maxw):
                # active rows (wn > wj) are a contiguous SUFFIX of the
                # length-sorted chunk: fold in place on a slice — no masks,
                # no temporaries, total work == total words
                a = int(np.searchsorted(wn, wj + 1, side="left"))
                hw = h[a:]
                hw ^= words[a:, wj]
                hw *= _FNV_PRIME
            h = splitmix64(h ^ sl.astype(np.uint64))
            if seed:
                h = splitmix64(h ^ np.uint64(seed))
            out[sel] = h
            i = j
    return out


def doc_ids_for_urls(urls) -> np.ndarray:
    """Deterministic doc_id assignment: stable 63-bit hash of the url.

    Independent of partition count and parallelism (unlike the reference's
    insertion-order node ids, Index.h:40) so that rebuilding with different
    num_cpus / num_partitions yields byte-identical canonical segments.
    Top bit cleared so doc_ids round-trip through signed int64 columns.
    """
    return stable_hash64(urls) & _MASK63


def minhash_signature(token_hashes: np.ndarray, num_perm: int, seed: int = 1) -> np.ndarray:
    """MinHash signature (num_perm,) uint64 from a set of token hashes.

    Permutations are implemented as splitmix64 re-mixes with distinct seeds —
    a standard 'one hash function + k mixers' construction.
    """
    if token_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    th = token_hashes.astype(np.uint64)
    sig = np.empty(num_perm, dtype=np.uint64)
    for p in range(num_perm):
        sig[p] = splitmix64(th ^ np.uint64(seed + p * 0x9E3779B9)).min()
    return sig


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (optionally tf-weighted)."""
    if token_hashes.size == 0:
        return 0
    th = token_hashes.astype(np.uint64)
    if weights is None:
        weights = np.ones(th.size, dtype=np.int64)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = ((bits * 2 - 1) * weights[:, None].astype(np.int64)).sum(axis=0)
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out
