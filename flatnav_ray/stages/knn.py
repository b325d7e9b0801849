"""Similarity search over embedding columns — the direct capability graft of
the reference (flatnav IS an ANN index): brute-force cosine top-k as the exact
baseline (the reference's gtruth generator role) and an IVF-partitioned
variant as the scale path (the reference's graph-index role: trade exactness
for probe locality, tunable like ef_search via nprobe).

Both are Ray-Data-first: queries are a small broadcast matrix (ray.put once);
the corpus streams through map_batches; per-batch partial top-k bounds the
shuffle (partial -> final aggregation, SURVEY.md A1/A2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> / fixed_size_list<float> column -> (n, d) float64
    matrix via the flat values buffer (one vectorized astype; no per-row
    Python objects — this runs in the inner loop of every ANN/dedup/PQ/NSW
    batch). Ragged lists or nulls fall back to the row-wise path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count:
        return np.stack(col.to_pylist()).astype(np.float64)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = np.asarray(col.flatten())
        return flat.reshape(n, d).astype(np.float64)
    offs = np.asarray(col.offsets, dtype=np.int64)
    widths = np.diff(offs)
    d = int(widths[0]) if widths.size else 0
    if not (widths == d).all():
        return np.stack(col.to_pylist()).astype(np.float64)  # ragged
    flat = np.asarray(col.values)
    return flat[offs[0] : offs[-1]].reshape(n, d).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _to_int_matrix(col, dtype: np.dtype) -> np.ndarray:
    """Arrow list<int8|uint8|...> column -> (n, d) integer matrix in `dtype`
    via the flat values buffer — the quantized twin of _to_matrix: integer
    vectors NEVER pass through float (the reference's int8/uint8 index
    instantiations, include/flatnav/util/Datatype.h:126-137, do exact
    integer distance arithmetic; so do we)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        return np.asarray(col.to_pylist(), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return np.asarray(col.flatten()).reshape(n, d).astype(dtype, copy=False)
    offs = np.asarray(col.offsets, dtype=np.int64)
    widths = np.diff(offs)
    d = int(widths[0]) if widths.size else 0
    if not (widths == d).all():
        return np.asarray(col.to_pylist(), dtype=dtype)  # ragged
    flat = np.asarray(col.values)
    return flat[offs[0] : offs[-1]].reshape(n, d).astype(dtype, copy=False)


def quantize_vectors(m: np.ndarray, dtype: str = "uint8") -> np.ndarray:
    """Deterministic scalar quantization of float vectors to int8/uint8:
    s = floor(clip(x, -1, 1) * 127 + 0.5)   (int8: s in [-127, 127];
    uint8: s + 127 in [0, 254]). floor(x + 0.5) instead of round() so the
    DuckDB oracle (`CAST(floor(least(greatest(x,-1),1)*127 + 0.5) AS BIGINT)`)
    is bit-identical — IEEE double ops on both sides, no bankers'-rounding
    divergence."""
    if dtype not in ("uint8", "int8"):
        raise ValueError(f"unknown quantized dtype {dtype!r}; uint8|int8")
    s = np.floor(np.clip(m.astype(np.float64), -1.0, 1.0) * 127.0 + 0.5)
    if dtype == "uint8":
        return (s + 127.0).astype(np.uint8)
    return s.astype(np.int8)


def quantize_batch(
    batch: pa.Table, dtype: str = "uint8", vec_col: str = "embedding"
) -> pa.Table:
    """map_batches stage: float embedding column -> fixed_size_list<u8|i8>
    (the storage form the .u8bin/.i8bin reader produces), other columns
    pass through."""
    m = quantize_vectors(_to_matrix(batch.column(vec_col)), dtype)
    pa_type = pa.uint8() if dtype == "uint8" else pa.int8()
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(m.reshape(-1), type=pa_type), m.shape[1] if m.size else 0
    )
    idx = batch.schema.get_field_index(vec_col)
    return batch.set_column(idx, vec_col, arr)


def _batch_topk_partial(
    sims: np.ndarray, ids: np.ndarray, qids: np.ndarray, k: int, id_col: str,
    score_col: str = "cosine", score_type: pa.DataType | None = None,
) -> pa.Table:
    """Per-batch partial top-k over a (Q, B) similarity matrix (bigger =
    better; metrics where smaller is better are negated by the caller);
    -inf entries (masked out, e.g. unprobed IVF lists) never emit. Ties
    (score desc, vec_id asc)."""
    if score_type is None:
        score_type = (
            pa.int64() if np.issubdtype(sims.dtype, np.integer) else pa.float64()
        )
    int_scores = np.issubdtype(sims.dtype, np.integer)
    out_q, out_id, out_s = [], [], []
    for qi in range(sims.shape[0]):
        row = sims[qi]
        # integer scores are always live; float uses -inf/nan masking
        cand = (
            np.arange(row.size) if int_scores else np.flatnonzero(np.isfinite(row))
        )
        if cand.size == 0:
            continue
        kk = min(k, cand.size)
        if cand.size > kk:
            kth = np.partition(-row[cand], kk - 1)[kk - 1]
            cand = cand[-row[cand] <= kth]
        order = np.lexsort((ids[cand], -row[cand]))[:kk]
        sel = cand[order]
        out_q.append(np.full(sel.size, qids[qi], dtype=np.int64))
        out_id.append(ids[sel])
        out_s.append(row[sel])
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                score_col: pa.array([], type=score_type),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
            score_col: pa.array(np.concatenate(out_s), type=score_type),
        }
    )


def _merge_query_topk(group: pa.Table, k: int, id_col: str,
                      score_col: str = "cosine") -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group, sort_keys=[(score_col, "descending"), (id_col, "ascending")]
    )
    top = group.take(order[:k])
    return pa.table(
        {
            "query_id": top.column("query_id"),
            "rank": pa.array(np.arange(len(top), dtype=np.int32)),
            id_col: top.column(id_col),
            score_col: top.column(score_col),
        }
    )


def _merge_partials(partials: ray.data.Dataset, k: int, id_col: str,
                    score_col: str = "cosine",
                    score_type: pa.DataType | None = None) -> pa.Table:
    merged = partials.groupby("query_id").map_groups(
        _merge_query_topk, batch_format="pyarrow",
        fn_kwargs={"k": k, "id_col": id_col, "score_col": score_col},
    )
    batches = [b for b in merged.iter_batches(batch_format="pyarrow") if b.num_rows]
    t = (
        pa.concat_tables(batches)
        if batches
        else pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int32()),
                id_col: pa.array([], type=pa.int64()),
                score_col: pa.array([], type=score_type or pa.float64()),
            }
        )
    )
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]))


def brute_force_knn(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    metric: str = "cosine",
) -> pa.Table:
    """Exact top-k under a pluggable metric — the graft of the reference's
    distance_type surface (`flatnav.index.create(distance_type='angular'|
    'l2'|...)`, python-bindings/src/flatnav/bindings.cpp:430-460 and
    include/flatnav/distances/): metric='cosine' (angular), 'ip' (raw inner
    product) or 'l2' (Euclidean, smaller is better).

    Per-batch matmul against the broadcast query matrix (the L2 expansion
    ||q-x||^2 = ||q||^2 - 2 q.x + ||x||^2 keeps it one GEMM), per-batch
    top-k partials, per-query merge. Deterministic ties: (score best-first,
    vec_id asc) where best = highest cosine/ip, lowest l2. Returns
    (query_id, rank, vec_id, <metric>) — the score column carries the
    metric's natural value (l2 = the Euclidean distance)."""
    if metric not in ("cosine", "ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}; one of cosine|ip|l2")
    q = np.asarray(query_vectors, dtype=np.float64)
    if metric == "cosine":
        q = _normalize(q)
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(q.shape[0], dtype=np.int64)
    )
    q_ref = ray.put((qids, q))

    def _partial(batch: pa.Table) -> pa.Table:
        qids_, q_ = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(batch.column(vec_col))
        if metric == "cosine":
            m = _normalize(m)
        sims = q_ @ m.T
        if metric == "l2":  # similarity = -squared distance (bigger = nearer)
            sims = 2.0 * sims
            sims -= (q_ * q_).sum(axis=1)[:, None]
            sims -= (m * m).sum(axis=1)[None, :]
        return _batch_topk_partial(sims, ids, qids_, k, id_col, score_col=metric)

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    out = _merge_partials(partials, k, id_col, score_col=metric)
    if metric == "l2":  # internal -dist^2 -> the actual Euclidean distance
        d = np.sqrt(np.maximum(-out.column("l2").to_numpy(zero_copy_only=False), 0.0))
        out = out.set_column(out.schema.get_field_index("l2"), "l2", pa.array(d))
    return out


def brute_force_knn_int(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    metric: str = "l2",
    dtype: str = "uint8",
) -> pa.Table:
    """Exact top-k over int8/uint8 vectors with PURE INTEGER distance
    arithmetic — the quantized-dtype instantiation of the reference
    (include/flatnav/util/Datatype.h:126-137 int8_t/uint8_t index templates,
    python-bindings/src/flatnav/bindings.cpp:488-497): nothing is promoted
    to float anywhere, so scores are exact int64 and SQL-hash-checkable.

    metric='l2' returns the SQUARED Euclidean distance (`l2sq`, int64,
    smaller = nearer — the reference's SquaredL2Distance never takes the
    root either); metric='ip' returns the raw integer inner product (`ip`,
    int64, bigger = better). The corpus column may be int8/uint8 lists (the
    .u8bin/.i8bin reader output) — floats are rejected, quantize explicitly
    with quantize_batch first. Same broadcast/partial-topk/merge shape as
    brute_force_knn. Ties (score best-first, vec_id asc)."""
    if metric not in ("l2", "ip"):
        raise ValueError(f"unknown int metric {metric!r}; one of l2|ip")
    np_dtype = np.uint8 if dtype == "uint8" else np.int8
    q = np.asarray(query_vectors)
    if not np.issubdtype(q.dtype, np.integer):
        raise TypeError(
            f"integer query vectors required (got {q.dtype}); quantize first"
        )
    q = q.astype(np.int64)
    score_col = "l2sq" if metric == "l2" else "ip"
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(q.shape[0], dtype=np.int64)
    )
    qq = (q * q).sum(axis=1)  # ||q||^2, int64
    q_ref = ray.put((qids, q, qq))

    def _partial(batch: pa.Table) -> pa.Table:
        qids_, q_, qq_ = ray.get(q_ref)
        col = batch.column(vec_col)
        vt = col.type.value_type if isinstance(col, pa.ChunkedArray) else col.type.value_type
        if not (pa.types.is_integer(vt)):
            raise TypeError(
                f"brute_force_knn_int needs an integer vector column (got {vt}); "
                "apply quantize_batch upstream"
            )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_int_matrix(col, np_dtype).astype(np.int64)
        qv = q_ @ m.T  # integer matmul: exact, no float path
        if metric == "l2":
            # -l2sq so bigger = better for the shared partial top-k
            sims = 2 * qv
            sims -= qq_[:, None]
            sims -= (m * m).sum(axis=1)[None, :]
        else:
            sims = qv
        return _batch_topk_partial(sims, ids, qids_, k, id_col, score_col=score_col)

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    out = _merge_partials(partials, k, id_col, score_col=score_col,
                          score_type=pa.int64())
    if metric == "l2":  # internal -l2sq -> the actual squared distance
        v = -out.column("l2sq").to_numpy(zero_copy_only=False)
        out = out.set_column(
            out.schema.get_field_index("l2sq"), "l2sq", pa.array(v, type=pa.int64())
        )
    return out


class IvfIndex:
    """IVF (inverted-file) coarse quantizer: k-means centroids trained on a
    deterministic sample; vectors assigned to nearest centroid at build; query
    probes `nprobe` nearest lists. The scale path: at 100 TB the per-centroid
    lists are parquet partitions and only nprobe/ncentroids of the corpus is
    read per query (same role as flatnav's graph: restrict the scan)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @staticmethod
    def train(ds: ray.data.Dataset, n_centroids: int, vec_col: str = "embedding",
              iters: int = 10, sample: int = 2048, seed: int = 0,
              id_col: str = "vec_id") -> "IvfIndex":
        """k-means on a deterministic UNBIASED sample: the `sample` rows with
        the smallest splitmix64(vec_id ^ seed) rank — a seeded random
        permutation rank computed distributed; each batch pre-prunes to its
        own smallest `sample` (partial top-k), so the driver sees at most
        sample × num_batches rows, never first-N / storage-order bias."""
        from ..functions.hashes import splitmix64

        def _ranked(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            r = splitmix64(ids ^ np.uint64(seed)).astype(np.int64) & np.int64(2**62 - 1)
            if r.size > sample:
                keep = np.argpartition(r, sample - 1)[:sample]
                batch = batch.take(pa.array(np.sort(keep)))
                r = r[np.sort(keep)]
            return pa.table(
                {"rank_": pa.array(r, type=pa.int64()), vec_col: batch.column(vec_col)}
            )

        parts = pa.concat_tables(
            ds.map_batches(_ranked, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")
        )
        order = np.argsort(parts.column("rank_").to_numpy(zero_copy_only=False))[:sample]
        m = _normalize(_to_matrix(parts.column(vec_col).take(pa.array(order))))
        rng = np.random.Generator(np.random.PCG64(seed))
        cent = m[rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]), replace=False)]
        for _ in range(iters):
            assign = np.argmax(m @ cent.T, axis=1)
            for c in range(cent.shape[0]):
                mask = assign == c
                if mask.any():
                    cent[c] = m[mask].mean(axis=0)
            cent = _normalize(cent)
        return IvfIndex(cent)

    def assign(self, ds: ray.data.Dataset, id_col: str = "vec_id", vec_col: str = "embedding") -> ray.data.Dataset:
        cent_ref = ray.put(self.centroids)

        def _assign(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            m = _normalize(_to_matrix(batch.column(vec_col)))
            a = np.argmax(m @ cent.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(a, type=pa.int32()))

        return ds.map_batches(_assign, batch_format="pyarrow")

    def search(
        self,
        assigned: ray.data.Dataset,
        query_vectors: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> pa.Table:
        """Probe the nprobe nearest centroid lists per query; exact rerank
        within probed lists (recall < 1 like the reference's ANN search;
        nprobe is the ef_search-style knob).

        Fully distributed — the same partial-top-k/merge shape as
        brute_force_knn: the corpus (pre-filtered to the union of probed
        lists, so only nprobe/ncentroids of it is read) streams through
        map_batches; each batch computes the (Q, B) similarity matrix once
        and masks entries whose centroid the query did not probe; partials
        merge per query. Nothing corpus-sized ever reaches the driver."""
        q = _normalize(np.asarray(query_vectors, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probes for c in row})
        sub = assigned.filter(
            expr=f"centroid in {wanted}" if len(wanted) > 1 else f"centroid == {wanted[0]}"
        )
        qids = np.arange(q.shape[0], dtype=np.int64)
        # (Q, n_centroids) probe-membership matrix, broadcast once
        probed = np.zeros((q.shape[0], self.centroids.shape[0]), dtype=bool)
        probed[np.repeat(qids, probes.shape[1]), probes.ravel()] = True
        bref = ray.put((qids, q, probed))

        def _partial(batch: pa.Table) -> pa.Table:
            qids_, q_, probed_ = ray.get(bref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            cents = batch.column("centroid").to_numpy(zero_copy_only=False)
            m = _normalize(_to_matrix(batch.column(vec_col)))
            sims = q_ @ m.T
            sims[~probed_[:, cents]] = -np.inf  # unprobed lists never rank
            return _batch_topk_partial(sims, ids, qids_, k, id_col)

        partials = sub.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        return _merge_partials(partials, k, id_col)
