"""Fuzzy term expansion: all dictionary terms within Levenshtein distance 1
of a query term (the Lucene `term~1` operator).

Distance <= 1 has a closed form that needs no DP matrix:
  * |a| == |b|:      d(a,b) <= 1  iff  lcp(a,b) + lcs(a,b) >= |a| - 1
  * ||a| - |b|| == 1: d(a,b) == 1  iff  lcp(a,b) + lcs(a,b) >= min(|a|,|b|)
(lcp/lcs = longest common prefix/suffix). Proof sketch: two mismatches at
positions i < j cap lcp + lcs at L - 1 - (j - i) <= L - 2; one deletion at
position lcp always reconciles the length-difference-1 case.

Both reduce to vectorized byte compares over length-bucketed padded
matrices — the SIMD equivalent of walking a Levenshtein automaton over the
dictionary (what Lucene's FST intersection does). Cost is O(bytes in the
L-1/L/L+1 length buckets) per query term and embarrassingly parallel across
dictionary slices, which is how `fuzzy_expand_terms` distributes it.

Only the engine's ASCII analyzer alphabet ([a-z0-9]+) is supported: byte
length == char length, so byte-wise distance equals DuckDB's character-wise
`levenshtein` (the oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Edit1Matcher:
    """Length-bucketed vectorized edit-distance-1 scan over a term list."""

    def __init__(self, terms: list[str]):
        groups: dict[int, list[str]] = {}
        for t in terms:
            groups.setdefault(len(t), []).append(t)
        self._bylen: dict[int, tuple[np.ndarray, list[str]]] = {}
        for length, ts in groups.items():
            if length == 0:
                continue
            mat = np.frombuffer("".join(ts).encode("ascii"), dtype=np.uint8)
            self._bylen[length] = (mat.reshape(len(ts), length), ts)

    def candidates(self, q: str) -> list[str]:
        """Sorted dictionary terms with levenshtein(q, t) <= 1 (q included
        when it is itself a dictionary term)."""
        qb = np.frombuffer(q.encode("ascii"), dtype=np.uint8)
        L = qb.size
        out: list[str] = []
        for M in (L - 1, L, L + 1):
            hit = self._bylen.get(M)
            if hit is None:
                continue
            mat, ts = hit
            w = min(L, M)
            if w == 0:
                if abs(L - M) <= 1:  # "" vs 1-char terms
                    out.extend(ts)
                continue
            lcp = (mat[:, :w] == qb[:w]).cumprod(axis=1).sum(axis=1)
            lcs = (mat[:, ::-1][:, :w] == qb[::-1][:w]).cumprod(axis=1).sum(axis=1)
            need = (L - 1) if M == L else w
            for i in np.nonzero(lcp + lcs >= need)[0]:
                out.append(ts[int(i)])
        return sorted(out)


def fuzzy_expand_terms(
    index_dir: str, terms: list[str], max_edits: int = 1
) -> dict[str, set[str]]:
    """Expand query terms against an index's GLOBAL vocabulary: a Ray
    Dataset scan over the term_stats Parquet (term column only — pruned
    read), each batch scanning its dictionary slice with the vectorized
    matcher. The match union is tiny (expansions of a handful of query
    terms); the dictionary itself never concentrates anywhere."""
    if max_edits != 1:
        raise ValueError("fuzzy matching supports max_edits=1")
    if not terms:
        return {}
    import ray.data

    from ..state.stats import term_stats_dir

    qs = sorted(set(terms))

    def _scan(batch: pa.Table) -> pa.Table:
        m = Edit1Matcher(batch.column("term").to_pylist())
        src: list[str] = []
        dst: list[str] = []
        for q in qs:
            for c in m.candidates(q):
                src.append(q)
                dst.append(c)
        return pa.table(
            {
                "q": pa.array(src, type=pa.string()),
                "t": pa.array(dst, type=pa.string()),
            }
        )

    ds = ray.data.read_parquet(term_stats_dir(index_dir), columns=["term"]).map_batches(
        _scan, batch_format="pyarrow"
    )
    out: dict[str, set[str]] = {q: set() for q in qs}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for q, t in zip(b.column("q").to_pylist(), b.column("t").to_pylist()):
            out[q].add(t)
    return out
