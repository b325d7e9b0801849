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
    return np.stack(col.to_pylist()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_knn(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> pa.Table:
    """Exact cosine top-k: per-batch matmul against the broadcast query matrix,
    emit per-batch top-k partials, merge per query. Deterministic ties:
    (cosine desc, vec_id asc). Returns (query_id, rank, vec_id, cosine)."""
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(q.shape[0], dtype=np.int64)
    )
    q_ref = ray.put((qids, q))

    def _partial(batch: pa.Table) -> pa.Table:
        qids_, q_ = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        sims = q_ @ m.T  # (Q, B)
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if row.size > kk:
                kth = np.partition(-row, kk - 1)[kk - 1]
                cand = np.flatnonzero(-row <= kth)
            else:
                cand = np.arange(row.size)
            order = np.lexsort((ids[cand], -row[cand]))[:kk]
            sel = cand[order]
            out_q.extend([int(qids_[qi])] * sel.size)
            out_id.extend(ids[sel].tolist())
            out_s.extend(row[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    def _merge(group: pa.Table, k: int) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("cosine", "descending"), (id_col, "ascending")]
        )
        top = group.take(order[:k])
        return pa.table(
            {
                "query_id": top.column("query_id"),
                "rank": pa.array(np.arange(len(top), dtype=np.int32)),
                id_col: top.column(id_col),
                "cosine": top.column("cosine"),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("query_id").map_groups(
        _merge, batch_format="pyarrow", fn_kwargs={"k": k}
    )
    t = pa.concat_tables(merged.iter_batches(batch_format="pyarrow"))
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]))


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
              iters: int = 10, sample: int = 2048, seed: int = 0) -> "IvfIndex":
        sample_t = pa.concat_tables(
            ds.limit(sample).iter_batches(batch_format="pyarrow")
        )
        m = _normalize(_to_matrix(sample_t.column(vec_col)))
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
        nprobe is the ef_search-style knob)."""
        q = _normalize(np.asarray(query_vectors, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probes for c in row})
        sub = assigned.filter(
            expr=f"centroid in {wanted}" if len(wanted) > 1 else f"centroid == {wanted[0]}"
        )
        probe_ref = ray.put(probes)

        # reuse brute-force machinery per query over probed subset, masking
        # out queries that did not probe a batch's centroid
        full = pa.concat_tables(sub.iter_batches(batch_format="pyarrow"))
        ids = full.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = full.column("centroid").to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(full.column(vec_col)))
        out_q, out_r, out_id, out_s = [], [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(cents, probes[qi])
            if not mask.any():
                continue
            row = q[qi] @ m[mask].T
            sel_ids = ids[mask]
            kk = min(k, row.size)
            order = np.lexsort((sel_ids, -row))[:kk]
            out_q.extend([qi] * kk)
            out_r.extend(range(kk))
            out_id.extend(sel_ids[order].tolist())
            out_s.extend(row[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "rank": pa.array(out_r, type=pa.int32()),
                id_col: pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )
