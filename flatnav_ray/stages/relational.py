"""Relational operators the reference lacks but a log/training-data pipeline
needs: as-of join (most recent prior event) and grouped top-k.

The reference is a single-table ANN engine (SURVEY.md §2.4 — its only joins
are label lookups); these extend the join/aggregation families J1-J3 / A1-A2
to event-time and per-group semantics.

Ray-Data-first shapes and their partitioning assumptions:

- asof_join_prior: ONE shuffle, keyed by the entity column (user_id) via
  ``groupby(user).map_groups``; rows are pre-filtered and pre-projected in
  ``map_batches`` BEFORE the shuffle, so only the two event types' (id, ts,
  type) triples move. Inside a group the match is a vectorized
  forward-fill (lexsort + np.maximum.accumulate), never a row loop.
  Assumption: one user's history fits in a task (same as sessionize —
  user_id is the shard key; a hot user is bounded by its own event count).

- grouped_topk: the A1/A2 bounded top-k pattern applied per group. Each
  input batch emits AT MOST k rows per group present in the batch (map-side
  combine), so the shuffle moves O(groups_per_batch * k) rows no matter how
  large the corpus; a final ``groupby(group).map_groups`` re-selects the
  global k. Deterministic ties: (value DESC, id ASC).

- range_join_window: band/interval join — (left, right) pairs of the same
  user with right.ts in [left.ts, left.ts + window). Same single
  groupby(user) shuffle as asof_join_prior; inside a group both sides are
  ts-sorted and the per-left match range is two np.searchsorted calls, pair
  emission is the repeat/offset gather (no per-row loop, no cross product).
  Output size is bounded by window density (pairs per left row = right
  events inside one window), not by group size squared.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def asof_join_prior(
    ds: ray.data.Dataset,
    left_type: str,
    right_type: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> pa.Table:
    """For each event of ``left_type``, the user's most recent PRIOR event of
    ``right_type`` (strictly earlier in (ts, event_id) lexicographic order —
    exact ts ties break by event_id, so the result is deterministic).
    Returns (event_id, user_id, matched_event_id) sorted by event_id, with
    matched_event_id = -1 when the user has no prior right-type event.
    """

    def _project(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column(type_col), value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        return pa.table(
            {
                id_col: b.column(id_col),
                user_col: b.column(user_col),
                "ts_us": b.column(ts_col).cast(pa.int64()),
                "is_left": pc.equal(b.column(type_col), left_type),
            }
        )

    def _per_user(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        is_left = group.column("is_left").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ids_s, left_s = ids[order], is_left[order]
        n = ids_s.size
        # forward-fill the index of the last right-type row, then shift by
        # one position so "prior" is strict in the (ts, id) order
        idx = np.where(~left_s, np.arange(n), -1)
        ff = np.maximum.accumulate(idx)
        prior = np.empty(n, dtype=np.int64)
        prior[0] = -1
        prior[1:] = ff[:-1]
        sel = np.flatnonzero(left_s)
        p = prior[sel]
        matched = np.where(p >= 0, ids_s[np.maximum(p, 0)], -1)
        return pa.table(
            {
                id_col: pa.array(ids_s[sel], type=pa.int64()),
                user_col: pa.array(
                    np.full(sel.size, group.column(user_col)[0].as_py(), dtype=np.int64)
                ),
                "matched_event_id": pa.array(matched, type=pa.int64()),
            }
        )

    slim = ds.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)
    out = pa.concat_tables(
        slim.groupby(user_col)
        .map_groups(_per_user, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return out.sort_by([(id_col, "ascending")])


def strided_sample(
    ds: ray.data.Dataset,
    modulus: int,
    residue: int = 0,
    key_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic systematic sample: keep rows with
    ``key % modulus == residue`` (O3 — the reference samples every k-th
    vector, `tools/construct_npy.cpp`-style strided reads). Pure
    ``map_batches`` filter: embarrassingly parallel, no shuffle, stable
    under any partitioning, and unbiased for hash-assigned or sequential
    keys — unlike ``ds.limit(n)``'s first-N storage-order bias. Returns a
    Dataset (stays lazy; compose with downstream stages)."""
    if not 0 <= residue < modulus:
        raise ValueError(f"residue {residue} not in [0, {modulus})")

    def _keep(batch: pa.Table) -> pa.Table:
        # numpy int64 %: exact for full-width 63-bit hash keys, and
        # python-style sign (non-negative result) for negative keys
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(k % modulus == residue))

    return ds.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: ray.data.Dataset,
    test_pct: int = 10,
    key_col: str = "doc_id",
    out_col: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/test split for training-data pipelines: bucket =
    splitmix64(key) % 100 (the same bit-exact splitmix the MinHash oracle
    replicates in DuckDB); rows with bucket < test_pct get 'test', the rest
    'train'. Pure map_batches — no shuffle, no RNG state, stable under any
    partitioning and across reruns/resumes (the property a 100-TB split
    needs: a re-executed task assigns identical splits). Appends
    (bucket int64, split string)."""
    if not 0 <= test_pct <= 100:
        raise ValueError(f"test_pct {test_pct} not in [0, 100]")
    from ..functions.hashes import splitmix64

    def _assign(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (splitmix64(k.view(np.uint64)) % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < test_pct, "test", "train")
        return batch.append_column(
            "bucket", pa.array(bucket, type=pa.int64())
        ).append_column(out_col, pa.array(split, type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def range_join_window(
    ds: ray.data.Dataset,
    left_type: str,
    right_type: str,
    window_us: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> pa.Table:
    """All (left, right) event pairs of the same user with
    ``right.ts in [left.ts, left.ts + window_us)`` (left-inclusive band
    join, e.g. purchases within 30 min after a click). Returns
    (left_event_id, right_event_id, user_id, gap_us) sorted by
    (left_event_id, right_event_id). Self-pairs cannot occur because the
    two type filters are disjoint; exact-ts ties ARE matched (gap 0).
    """

    def _project(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column(type_col), value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        return pa.table(
            {
                id_col: b.column(id_col),
                user_col: b.column(user_col),
                "ts_us": b.column(ts_col).cast(pa.int64()),
                "is_left": pc.equal(b.column(type_col), left_type),
            }
        )

    def _per_user(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        is_left = group.column("is_left").to_numpy(zero_copy_only=False)
        l_ids, l_ts = ids[is_left], ts[is_left]
        r_ids, r_ts = ids[~is_left], ts[~is_left]
        empty = pa.table(
            {
                "left_event_id": pa.array([], type=pa.int64()),
                "right_event_id": pa.array([], type=pa.int64()),
                user_col: pa.array([], type=pa.int64()),
                "gap_us": pa.array([], type=pa.int64()),
            }
        )
        if l_ids.size == 0 or r_ids.size == 0:
            return empty
        r_order = np.argsort(r_ts, kind="stable")
        r_ids, r_ts = r_ids[r_order], r_ts[r_order]
        lo = np.searchsorted(r_ts, l_ts, side="left")
        hi = np.searchsorted(r_ts, l_ts + window_us, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        # variable-length slice gather: right index = slice start + offset
        left_rep = np.repeat(np.arange(l_ids.size), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        ridx = np.repeat(lo, counts) + offs
        return pa.table(
            {
                "left_event_id": pa.array(l_ids[left_rep], type=pa.int64()),
                "right_event_id": pa.array(r_ids[ridx], type=pa.int64()),
                user_col: pa.array(
                    np.full(total, group.column(user_col)[0].as_py(), dtype=np.int64)
                ),
                "gap_us": pa.array(r_ts[ridx] - l_ts[left_rep], type=pa.int64()),
            }
        )

    slim = ds.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)
    out = pa.concat_tables(
        slim.groupby(user_col)
        .map_groups(_per_user, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return out.sort_by(
        [("left_event_id", "ascending"), ("right_event_id", "ascending")]
    )


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> pa.Table:
    """Top-k rows per group by (value DESC, id ASC). Returns
    (group, rank, id, value) sorted by (group, rank); rank is 0-based."""

    def _batch_topk(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        i = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g)
        gidx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # (group ASC, value DESC, id ASC) then first-k-per-group by position
        order = np.lexsort((i, -v, gidx))
        gs = gidx[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        pos = np.arange(gs.size) - np.repeat(starts, np.diff(np.r_[starts, gs.size]))
        keep = order[pos < k]
        return batch.select([group_col, id_col, value_col]).take(pa.array(keep))

    def _final(group: pa.Table) -> pa.Table:
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        i = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -v))[:k]
        t = group.take(pa.array(order))
        return pa.table(
            {
                group_col: t.column(group_col),
                "rank": pa.array(np.arange(order.size), type=pa.int64()),
                id_col: t.column(id_col),
                value_col: t.column(value_col),
            }
        )

    partials = ds.map_batches(_batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    out = pa.concat_tables(
        partials.groupby(group_col)
        .map_groups(_final, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return out.sort_by([(group_col, "ascending"), ("rank", "ascending")])
