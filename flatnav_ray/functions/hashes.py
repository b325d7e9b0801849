"""Stable 64-bit hashing + MinHash / SimHash signature kernels.

All hashes here are deterministic across processes and sessions (no PYTHONHASHSEED
dependence) — the analog of the reference's deterministic node-id assignment
(/root/reference/include/flatnav/index/Index.h:262-272 assigns dense ids in
insertion order; we assign by stable content hash so ids are independent of
parallelism and partition count, which the determinism tests require).
"""

from __future__ import annotations

import numpy as np

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
    """FNV-1a 64-bit over bytes, then splitmix64-mixed with the seed."""
    h = int(_FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    if seed:
        h = int(splitmix64(np.array([h ^ seed], dtype=np.uint64))[0])
    return h


def hash64_str(s: str, seed: int = 0) -> int:
    return hash64_bytes(s.encode("utf-8"), seed)


import os as _os

# polars spawns an all-core rayon pool per process; our hash calls run inside
# 1-CPU Ray tasks, so a single thread is right (and avoids oversubscription)
_os.environ.setdefault("POLARS_MAX_THREADS", "1")
try:
    import polars as _pl
except Exception:  # pragma: no cover
    _pl = None


def stable_hash64(strings, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit hash of a sequence of strings -> uint64 array.

    Fast path: polars' vectorized string hash (deterministic for a fixed
    seed within an installation — sufficient for doc-id stability across
    processes/partitionings, which is what the determinism tests require).
    Fallback: the pure-numpy FNV-1a below (byte-column lockstep)."""
    if _pl is not None:
        if not isinstance(strings, (list, tuple)):
            strings = list(strings)
        h = _pl.Series(strings, dtype=_pl.Utf8).hash(seed=seed & 0xFFFFFFFFFFFFFFFF)
        return h.to_numpy().astype(np.uint64)
    return _stable_hash64_numpy(strings, seed)


def _stable_hash64_numpy(strings, seed: int = 0) -> np.ndarray:
    """Pure-numpy FNV-1a (matches hash64_str exactly); the portable fallback.
    """
    enc = [s.encode("utf-8") for s in strings]
    n = len(enc)
    out = np.full(n, int(_FNV_OFFSET), dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen:
        # Build a padded (n, maxlen) byte matrix once; columns are hashed in
        # lockstep (vectorized across the n strings).
        buf = np.zeros((n, maxlen), dtype=np.uint8)
        for i, e in enumerate(enc):
            buf[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                active = lens > j
                col = buf[:, j].astype(np.uint64)
                nxt = (out ^ col) * _FNV_PRIME
                out = np.where(active, nxt, out)
    if seed:
        out = splitmix64(out ^ np.uint64(seed))
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
