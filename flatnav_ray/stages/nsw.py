"""Graph ANN — the direct graft of the reference's core data structure: a
flat navigable-small-world graph (flatnav `Index`, /root/reference/include/
flatnav/index/Index.h): fixed max out-degree M (Index.h:58), beam-search
insert with an ef_construction-wide frontier (Index.h:300-329 addBatch ->
beamSearch), diversification pruning of candidate neighbors — keep a
candidate only if it is closer to the new node than to any already-kept
neighbor (selectNeighbors, Index.h:714-763), query beam search with
ef_search and a visited set (Index.h:387-409, util/VisitedSetPool.h), and
entry-point selection by strided sampling (num_initializations,
Index.h:845-870).

Ray-Data shape (original design, not a port — the reference is a
single-arena shared-memory C++ engine):

- **build**: embeddings shard by hash(vec_id) % n_shards; each shard builds
  an independent NSW graph inside ONE `groupby(shard).map_groups` task (the
  graph is mutable shared state across inserts, which the Dataset API cannot
  express across tasks — so it lives within a task, per shard) and persists
  as a parquet file of (vec_id, vector, neighbor list) rows. Shards build in
  parallel across the cluster; the 100 TB path is MORE shards (bounded build
  state per task), not bigger graphs.
- **search**: the query matrix broadcasts once (ray.put); one task per shard
  beam-searches its graph and emits a k×Q partial; partials merge with the
  same deterministic (cosine desc, vec_id asc) reduce as brute_force_knn.
  Per-shard recall is tuned by ef_search, exactly flatnav's knob.

Deviation, documented: flatnav searches ONE graph over all N vectors;
sharding trades a single entry point for S independent searches (each over
N/S vectors) — per-query work rises S×, but every shard search is exact
top-k-merging-compatible and build parallelism is unbounded. This is the
standard distributed serving layout for graph ANN.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .knn import _merge_partials, _normalize, _to_matrix

NSW_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("vector", pa.list_(pa.float32())),
        ("neighbors", pa.list_(pa.int32())),
    ]
)


def _select_neighbors(
    cand: np.ndarray, cand_sims: np.ndarray, simfn, m: int
) -> np.ndarray:
    """Diversification prune (selectNeighbors semantics, Index.h:714-763):
    scanning candidates best-first, keep c only if sim(c, new) >= sim(c, kept)
    for every already-kept neighbor — i.e. c is closer to the new node than to
    the kept set, so the kept edges spread over distinct directions. `simfn`
    is the graph's metric surrogate (bigger = nearer) between STORED nodes —
    the prune rule is metric-generic, exactly as the reference's templated
    DistanceInterface makes it."""
    order = np.argsort(-cand_sims, kind="stable")
    kept: list[int] = []
    for idx in order:
        c = int(cand[idx])
        if len(kept) >= m:
            break
        if kept:
            to_kept = simfn(np.asarray(kept, dtype=np.int64), c)
            if (to_kept > cand_sims[idx]).any():
                continue
        kept.append(c)
    if len(kept) < m:
        # backfill with nearest pruned candidates (flatnav keeps pruned
        # candidates as fallback so degree stays near M)
        kset = set(kept)
        for idx in order:
            c = int(cand[idx])
            if c not in kset:
                kept.append(c)
                kset.add(c)
                if len(kept) >= m:
                    break
    return np.asarray(kept, dtype=np.int32)


class _ShardGraph:
    """One shard's NSW graph: numpy adjacency [n, 2M] (insert allows degree
    overflow up to 2M before re-pruning to M, flatnav's connectNeighbors
    behavior), beam-search insert and query."""

    def __init__(self, vecs: np.ndarray, m: int = 16, ef_construction: int = 64,
                 num_initializations: int = 32, metric: str = "cosine"):
        self.vecs = vecs  # float32 (n, d), pre-normalized iff metric=cosine;
        # OR int16 (n, d) for the quantized instantiation (uint8/int8 values
        # widened so dot products against an int64 query are EXACT int64 —
        # the reference's int8_t/uint8_t index templates,
        # include/flatnav/util/Datatype.h:126-137; metric must be ip|l2)
        self.int_space = np.issubdtype(vecs.dtype, np.integer)
        if self.int_space and metric not in ("ip", "l2"):
            raise ValueError(
                f"integer vectors support metric ip|l2 (got {metric!r}); "
                "cosine needs float norms — use the float32 graph"
            )
        self.m = m
        self.efc = ef_construction
        self.num_init = num_initializations
        self.metric = metric
        # similarity surrogate, bigger = nearer (the reference's templated
        # DistanceInterface role): cosine/ip = dot; l2 = -squared distance
        # via the norm expansion (one GEMV + precomputed row norms)
        if metric != "l2":
            self._norms2 = None
        elif self.int_space:
            v64 = vecs.astype(np.int64)
            self._norms2 = (v64 * v64).sum(axis=1)  # exact int64
        else:
            self._norms2 = (vecs.astype(np.float64) ** 2).sum(axis=1)
        n = vecs.shape[0]
        self.adj = np.full((n, 2 * m), -1, dtype=np.int32)
        self.deg = np.zeros(n, dtype=np.int32)
        self._visited = np.zeros(n, dtype=np.int64)  # epoch-marked visited set
        self._epoch = 0

    def _sims_q(self, idx: np.ndarray, q: np.ndarray, q2) -> np.ndarray:
        """Similarity of stored nodes `idx` to an external query vector.
        int16 vecs × int64 q -> exact int64 dots (no float anywhere on the
        quantized path; the `2 *` is exact for floats too)."""
        dots = self.vecs[idx] @ q
        if self.metric == "l2":
            return 2 * dots - self._norms2[idx] - q2
        return dots

    def _sims_node(self, idx: np.ndarray, node: int) -> np.ndarray:
        """Similarity of stored nodes `idx` to stored node `node`."""
        qv = self.vecs[node]
        if self.int_space:  # int16 @ int16 would overflow; widen the q side
            qv = qv.astype(np.int64)
        return self._sims_q(
            idx, qv,
            self._norms2[node] if self._norms2 is not None else 0.0,
        )

    # -- construction ------------------------------------------------------
    def build(self) -> None:
        for i in range(1, self.vecs.shape[0]):
            qv = (
                self.vecs[i].astype(np.int64) if self.int_space else self.vecs[i]
            )
            cand, sims = self._beam(qv, self.efc, limit=i)
            nbrs = _select_neighbors(cand, sims, self._sims_node, self.m)
            self.adj[i, : nbrs.size] = nbrs
            self.deg[i] = nbrs.size
            for nb in nbrs:
                d = self.deg[nb]
                if d < self.adj.shape[1]:
                    self.adj[nb, d] = i
                    self.deg[nb] = d + 1
                if self.deg[nb] >= self.adj.shape[1]:
                    self._reprune(int(nb))

    def _reprune(self, node: int) -> None:
        nbrs = self.adj[node, : self.deg[node]]
        sims = self._sims_node(nbrs.astype(np.int64), node)
        kept = _select_neighbors(nbrs.astype(np.int64), sims, self._sims_node, self.m)
        self.adj[node, :] = -1
        self.adj[node, : kept.size] = kept
        self.deg[node] = kept.size

    # -- search ------------------------------------------------------------
    def _entry(self, q: np.ndarray, q2: float, limit: int) -> int:
        """Strided entry-point sampling (initializeSearch, Index.h:845-870):
        probe every limit/num_initializations-th node, start from the best
        (the reference exposes num_initializations as a search knob,
        bindings.cpp:484-504)."""
        step = max(1, limit // self.num_init)
        probes = np.arange(0, limit, step)
        return int(probes[np.argmax(self._sims_q(probes, q, q2))])

    def _beam(
        self, q: np.ndarray, ef: int, limit: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Best-first beam search; returns (ids, sims) of up to ef nearest,
        unsorted. `limit` restricts to nodes < limit (insert-time: only
        already-inserted nodes exist, flatnav's single-pass addBatch)."""
        n = limit if limit is not None else self.vecs.shape[0]
        if n <= 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        self._epoch += 1
        vis = self._visited
        if self.metric != "l2":
            q2 = 0.0
        elif self.int_space:  # exact int64 norm, no float on the quantized path
            q64 = q.astype(np.int64)
            q2 = int((q64 * q64).sum())
        else:
            q2 = float((q.astype(np.float64) ** 2).sum())
        ep = self._entry(q, q2, n)
        s0 = float(self._sims_q(np.asarray([ep]), q, q2)[0])
        vis[ep] = self._epoch
        # frontier: max-heap by sim (python heapq is a min-heap -> negate);
        # result: min-heap of (sim, -id) keeping the ef best
        frontier = [(-s0, ep)]
        result: list[tuple[float, int]] = [(s0, ep)]
        while frontier:
            neg, node = heapq.heappop(frontier)
            if len(result) >= ef and -neg < result[0][0]:
                break
            nbrs = self.adj[node, : self.deg[node]]
            nbrs = nbrs[nbrs < n]
            if nbrs.size == 0:
                continue
            fresh = nbrs[vis[nbrs] != self._epoch]
            if fresh.size == 0:
                continue
            vis[fresh] = self._epoch
            sims = self._sims_q(fresh, q, q2)
            worst = result[0][0] if len(result) >= ef else -np.inf
            for s, nb in zip(sims.tolist(), fresh.tolist()):
                if len(result) < ef:
                    heapq.heappush(result, (s, nb))
                    heapq.heappush(frontier, (-s, nb))
                elif s > worst:
                    heapq.heapreplace(result, (s, nb))
                    heapq.heappush(frontier, (-s, nb))
                    worst = result[0][0]
        ids = np.fromiter((r[1] for r in result), dtype=np.int64, count=len(result))
        sims = np.fromiter((r[0] for r in result), dtype=np.float64, count=len(result))
        return ids, sims


def _shard_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard-{shard:05d}.parquet")


def _nsw_stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "nsw_stats.json")


def load_nsw_stats(index_dir: str) -> dict | None:
    """Completion marker + build params (m, ef_construction, shard list).
    Written LAST by build_nsw_index: its presence (with every listed shard
    file on disk) is the proof the build finished — a crashed build (subset
    of shards, leftover .tmp files) has no marker and must be rebuilt."""
    import json

    p = _nsw_stats_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def nsw_index_complete(index_dir: str) -> bool:
    st = load_nsw_stats(index_dir)
    if st is None:
        return False
    return all(
        os.path.exists(_shard_path(index_dir, int(s))) for s in st["shards"]
    )


def build_nsw_index(
    ds: ray.data.Dataset,
    index_dir: str,
    n_shards: int = 4,
    m: int = 16,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_initializations: int = 32,
    metric: str = "cosine",
    dtype: str = "float32",
) -> int:
    """Shard-parallel NSW build: hash-shard the embeddings, build one graph
    per shard inside its map_groups task, persist (vec_id, vector, neighbors)
    parquet per shard plus an nsw_stats.json completion marker (written last;
    records m/ef_construction/metric/dtype so search reconstructs graphs
    with the right adjacency width and distance). metric='cosine'|'ip'|'l2'
    — the reference's distance_type build knob (bindings.cpp create()).

    dtype='uint8'|'int8' is the quantized instantiation (the reference's
    int8_t/uint8_t index templates, Datatype.h:126-137): the vector column
    must already be integer (quantize_batch / the .u8bin/.i8bin readers),
    vectors persist in their original integer type, and ALL similarity
    arithmetic is exact int64 (metric ip|l2 only) — so scores agree
    bit-for-bit with brute_force_knn_int for the ids both return. Returns
    total vectors indexed."""
    if metric not in ("cosine", "ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}; one of cosine|ip|l2")
    if dtype not in ("float32", "uint8", "int8"):
        raise ValueError(f"unknown dtype {dtype!r}; one of float32|uint8|int8")
    int_space = dtype != "float32"
    if int_space and metric == "cosine":
        raise ValueError("quantized NSW supports metric ip|l2 (no float norms)")
    os.makedirs(index_dir, exist_ok=True)

    def _with_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..functions.hashes import splitmix64

        shard = (splitmix64(ids) % np.uint64(n_shards)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    def _build_shard(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"shard": pa.array([], type=pa.int32()),
                             "n": pa.array([], type=pa.int64())})
        shard = int(group.column("shard")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)  # deterministic insert order
        ids = ids[order]
        if int_space:
            from .knn import _to_int_matrix

            np_dt = np.uint8 if dtype == "uint8" else np.int8
            stored = _to_int_matrix(group.column(vec_col), np_dt)[order]
            vecs = stored.astype(np.int16)  # widened compute view (exact dots)
            vec_pa_type = pa.uint8() if dtype == "uint8" else pa.int8()
        else:
            vecs = _to_matrix(group.column(vec_col))
            if metric == "cosine":
                vecs = _normalize(vecs)
            stored = vecs = vecs[order].astype(np.float32)
            vec_pa_type = pa.float32()
        g = _ShardGraph(vecs, m=m, ef_construction=ef_construction,
                        num_initializations=num_initializations, metric=metric)
        g.build()
        nbr_ids = [g.adj[i, : g.deg[i]].tolist() for i in range(len(ids))]
        t = pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "vector": pa.array([v.tolist() for v in stored], type=pa.list_(vec_pa_type)),
                "neighbors": pa.array(nbr_ids, type=pa.list_(pa.int32())),
            }
        )
        import pyarrow.parquet as pq

        tmp = _shard_path(index_dir, shard) + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, _shard_path(index_dir, shard))
        return pa.table({"shard": pa.array([shard], type=pa.int32()),
                         "n": pa.array([len(ids)], type=pa.int64())})

    rows = (
        ds.map_batches(_with_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(_build_shard, batch_format="pyarrow")
    )
    total = 0
    shards_built: list[int] = []
    for b in rows.iter_batches(batch_format="pyarrow"):
        if len(b):
            total += int(b.column("n").to_numpy(zero_copy_only=False).sum())
            shards_built.extend(int(s) for s in b.column("shard").to_pylist())
    import json

    tmp = _nsw_stats_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "n_vectors": total,
                "n_shards": n_shards,
                "shards": sorted(shards_built),
                "m": m,
                "ef_construction": ef_construction,
                "num_initializations": num_initializations,
                "metric": metric,
                "dtype": dtype,
            },
            f,
        )
    os.replace(tmp, _nsw_stats_path(index_dir))
    return total


def search_nsw_index(
    index_dir: str,
    query_vectors: np.ndarray,
    k: int = 10,
    ef_search: int = 64,
    query_ids: np.ndarray | None = None,
    num_initializations: int | None = None,
) -> pa.Table:
    """Distributed query: broadcast queries once, one beam-search task per
    shard, deterministic (score best-first, vec_id asc) merge. Returns
    (query_id, rank, vec_id, <metric>) like brute_force_knn — the score
    column carries the metric's natural value (l2 = Euclidean distance).

    Graph params (m — hence adjacency width — the metric, and the
    num_initializations default) come from the index's nsw_stats.json
    marker, so an index built with m != 16 or a non-cosine distance
    reconstructs correctly."""
    st = load_nsw_stats(index_dir) or {}
    m = int(st.get("m", 16))
    metric = str(st.get("metric", "cosine"))
    dtype = str(st.get("dtype", "float32"))
    int_space = dtype != "float32"
    if int_space:
        q = np.asarray(query_vectors)
        if not np.issubdtype(q.dtype, np.integer):
            raise TypeError(
                f"index dtype is {dtype}: integer query vectors required "
                f"(got {q.dtype}); quantize first"
            )
        q = q.astype(np.int64)
        score_col = "l2sq" if metric == "l2" else "ip"
    else:
        q = np.asarray(query_vectors, dtype=np.float64)
        if metric == "cosine":
            q = _normalize(q)
        q = q.astype(np.float32)
        score_col = metric
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(q.shape[0], dtype=np.int64)
    )
    bref = ray.put((qids, q))
    num_init = int(
        num_initializations
        if num_initializations is not None
        else st.get("num_initializations", 32)
    )
    shards = sorted(
        os.path.join(index_dir, f)
        for f in os.listdir(index_dir)
        if f.startswith("shard-") and f.endswith(".parquet")
    )

    @ray.remote(num_cpus=1)
    def _shard_search(path: str) -> pa.Table:
        import pyarrow.parquet as pq

        qids_, q_ = ray.get(bref)
        t = pq.read_table(path)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if int_space:
            from .knn import _to_int_matrix

            np_dt = np.uint8 if dtype == "uint8" else np.int8
            vecs = _to_int_matrix(t.column("vector"), np_dt).astype(np.int16)
        else:
            vecs = _to_matrix(t.column("vector")).astype(np.float32)
        # rebuild adjacency in one shot from the ListArray's offsets/values
        # buffers (a per-row as_py() loop copied every neighbor list)
        nb = t.column("neighbors")
        nb = nb.combine_chunks() if isinstance(nb, pa.ChunkedArray) else nb
        offs = np.asarray(nb.offsets, dtype=np.int64)
        vals = np.asarray(nb.values, dtype=np.int32)
        widths = np.diff(offs)
        # adjacency width: persisted 2m, grown if any row overflowed it
        width = max(2 * m, int(widths.max()) if widths.size else 0)
        g = _ShardGraph(vecs, m=max(1, (width + 1) // 2),
                        num_initializations=num_init, metric=metric)
        if widths.size and widths.sum():
            rows_idx = np.repeat(np.arange(len(ids)), widths)
            cols_idx = np.arange(offs[0], offs[-1]) - np.repeat(offs[:-1], widths)
            g.adj[rows_idx, cols_idx] = vals[offs[0] : offs[-1]]
        g.deg = widths.astype(np.int32)
        out_q, out_id, out_s = [], [], []
        ef = max(ef_search, k)
        for qi in range(q_.shape[0]):
            cand, sims = g._beam(q_[qi], ef)
            if cand.size == 0:
                continue
            kk = min(k, cand.size)
            order = np.lexsort((ids[cand], -sims))[:kk]
            out_q.append(np.full(kk, qids_[qi], dtype=np.int64))
            out_id.append(ids[cand[order]])
            out_s.append(sims[order])
        s_type = pa.int64() if int_space else pa.float64()
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    score_col: pa.array([], type=s_type),
                }
            )
        s_all = np.concatenate(out_s)
        if int_space:  # beam sims ride float64 but are exact ints (bounded)
            s_all = s_all.astype(np.int64)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                score_col: pa.array(s_all, type=s_type),
            }
        )

    partials = pa.concat_tables(ray.get([_shard_search.remote(p) for p in shards]))
    # float path: scores recomputed in float32 graph space; ties resolve by
    # (score, vec_id). int path: scores are exact int64 end-to-end.
    out = _merge_partials(
        ray.data.from_arrow(partials), k, "vec_id", score_col=score_col,
        score_type=pa.int64() if int_space else pa.float64(),
    )
    if metric == "l2" and int_space:
        # internal -l2sq surrogate -> the actual squared distance (exact
        # int64, brute_force_knn_int's l2sq convention — no square root)
        v = -out.column("l2sq").to_numpy(zero_copy_only=False)
        out = out.set_column(
            out.schema.get_field_index("l2sq"), "l2sq", pa.array(v, type=pa.int64())
        )
    elif metric == "l2":  # internal -dist^2 surrogate -> Euclidean distance
        d = np.sqrt(np.maximum(-out.column("l2").to_numpy(zero_copy_only=False), 0.0))
        out = out.set_column(out.schema.get_field_index("l2"), "l2", pa.array(d))
    return out
