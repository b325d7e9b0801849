"""Token-budget mixture sampling: deterministic per-source document
selection under a token budget — the data-mixture composition step of a
training-data pipeline (Pile / Dolma / DoReMi-style static source weights:
"take at most B tokens from each source").

Semantics (exact, resumable): within each group (source), order docs by
(splitmix64(doc_id), doc_id) — a deterministic uniform shuffle — and keep a
doc iff the running token total INCLUSIVE of it is <= the group's budget.
The prefix rule (not a knapsack fit) makes the kept set a pure function of
(corpus, budget): stable under reruns, re-executed tasks, and any
parallelism, like `hash_split` (stages/relational.py).

100-TB shape — the naive plan is `groupby(source).map_groups(sort+cumsum)`,
which drags an entire source (possibly most of the corpus) into one task.
Instead this runs an exact two-pass histogram cut, the distributed-quantile
pattern:

    pass 1  map_batches: per-batch token-sum histogram over the top
            HIST_BITS bits of the doc hash -> (source, bucket, tok_sum)
            partials; driver folds #sources x 2^HIST_BITS rows (tiny).
    driver  per source: bucket cumsum -> boundary bucket b* (the first
            bucket whose cumulative total exceeds the budget) + the exact
            remaining budget entering b*.
    pass 2  only rows in their source's boundary bucket ship to the driver
            (expected group_size / 2^HIST_BITS rows; recurse with a finer
            histogram if a bucket is still too fat — not needed here),
            sorted + cumsum'd exactly; kept boundary ids broadcast via
            ray.put.
    pass 3  map_batches filter: bucket < b*  OR  doc_id in boundary-keep.
            Output streams; the corpus text never shuffles and nothing
            group-sized ever lands on the driver.

The per-doc weight is the whitespace token count (functions/textstats
WS_TOKEN_RE — RE2-exact in DuckDB, so the oracle replicates the cut
bit-for-bit via a window cumsum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashes import splitmix64
from ..functions.textstats import WS_TOKEN_RE

HIST_BITS = 12  # 4096 buckets: boundary bucket ~ group_size/4096 rows


def _weights_batch(
    batch: pa.Table, id_col: str, group_col: str, text_col: str,
    weight: str = "tokens",
) -> pa.Table:
    """(doc_id, group, n_tokens, h64, bucket) — the small projection every
    pass runs over; text is dropped here and never moves again.
    weight="tokens": whitespace token count; "ones": 1 per doc (turns the
    budget into a row quota — the stratified-split reuse)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h64 = splitmix64(ids.astype(np.uint64))
    if weight == "ones":
        ntok = pa.array(np.ones(len(batch), dtype=np.int64), type=pa.int64())
    else:
        ntok = pc.cast(
            pc.count_substring_regex(batch.column(text_col), WS_TOKEN_RE), pa.int64()
        )
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            group_col: batch.column(group_col),
            "n_tokens": ntok,
            # int64 view of the uint64 hash: order-preserving is NOT needed
            # globally, only per-comparison consistency — we sort on the
            # uint64 value, carried losslessly through the signed view
            "h64": pa.array(h64.view(np.int64), type=pa.int64()),
            "bucket": pa.array(
                (h64 >> np.uint64(64 - HIST_BITS)).astype(np.int64), type=pa.int64()
            ),
        }
    )


def _hist_batch(batch: pa.Table, group_col: str) -> pa.Table:
    """Per-batch (group, bucket, tok_sum) partial histogram."""
    return (
        batch.select([group_col, "bucket", "n_tokens"])
        .group_by([group_col, "bucket"])
        .aggregate([("n_tokens", "sum")])
        .rename_columns([group_col, "bucket", "tok_sum"])
    )


def token_budget_sample(
    ds: ray.data.Dataset,
    budget: int | dict,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    weight: str = "tokens",
) -> ray.data.Dataset:
    """Keep, per group, the prefix of the (splitmix64(doc_id), doc_id)-ordered
    docs whose inclusive token cumsum fits `budget` (an int for every group,
    or a per-group dict — groups absent from the dict get budget 0, under
    which only ZERO-weight docs can fit: the prefix-cumsum rule `cum <= B`
    keeps a weight-0 doc even at B=0, exactly as the SQL window-cumsum
    oracle does). Returns a Dataset of (doc_id, group, n_tokens) — the
    sampled mixture manifest."""

    def _budget(g) -> int:
        return int(budget.get(g, 0)) if isinstance(budget, dict) else int(budget)

    base = ds.map_batches(
        _weights_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col, "group_col": group_col, "text_col": text_col,
                   "weight": weight},
    ).materialize()  # 4 small columns; reused by all three passes

    # ---- pass 1: fold the per-batch histograms on the driver (tiny) ----
    parts = list(
        base.map_batches(
            _hist_batch, batch_format="pyarrow", fn_kwargs={"group_col": group_col}
        ).iter_batches(batch_format="pyarrow")
    )
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            group_col: pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
        }
    )
    if not parts:
        return ray.data.from_arrow(empty)
    hist = (
        pa.concat_tables(parts)
        .group_by([group_col, "bucket"])
        .aggregate([("tok_sum", "sum")])
    )
    groups = hist.column(group_col).to_pylist()
    buckets = hist.column("bucket").to_numpy(zero_copy_only=False)
    sums = hist.column("tok_sum_sum").to_numpy(zero_copy_only=False)

    # per group: boundary bucket + exact budget remaining entering it
    bstar: dict[str, int] = {}  # groups absent => everything kept
    remaining: dict[str, int] = {}
    for g in sorted(set(groups)):
        sel = [i for i, gg in enumerate(groups) if gg == g]
        order = np.argsort(buckets[sel], kind="stable")
        bs = buckets[sel][order]
        ts = sums[sel][order]
        cum = np.cumsum(ts)
        bg = _budget(g)
        over = np.nonzero(cum > bg)[0]
        if over.size == 0:
            continue
        j = int(over[0])
        bstar[g] = int(bs[j])
        remaining[g] = int(bg - (cum[j - 1] if j > 0 else 0))

    if not bstar:  # every group fits entirely
        return base.map_batches(
            lambda b: b.select([id_col, group_col, "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    bstar_ref = ray.put(bstar)

    # ---- pass 2: exact cut inside each boundary bucket (driver-small) ----
    def _boundary(b: pa.Table) -> pa.Table:
        bst = ray.get(bstar_ref)
        gs = np.asarray(b.column(group_col).to_pylist(), dtype=object)
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        # vectorized: python only over the DISTINCT groups of the batch
        ug, inv = np.unique(gs, return_inverse=True)
        thr = np.fromiter((bst.get(g, -1) for g in ug), dtype=np.int64, count=ug.size)
        return b.filter(pa.array(bk == thr[inv]))

    btbl = pa.concat_tables(
        base.map_batches(
            _boundary, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    )
    boundary_keep: set[int] = set()
    if len(btbl):
        bg = btbl.column(group_col).to_pylist()
        bid = btbl.column(id_col).to_numpy(zero_copy_only=False)
        bh = btbl.column("h64").to_numpy(zero_copy_only=False).view(np.uint64)
        bt = btbl.column("n_tokens").to_numpy(zero_copy_only=False)
        for g in remaining:
            sel = np.fromiter((gg == g for gg in bg), dtype=bool, count=len(bg))
            if not sel.any():
                continue
            ids_g, h_g, t_g = bid[sel], bh[sel], bt[sel]
            order = np.lexsort((ids_g, h_g))  # (h64 asc, doc_id asc)
            cum = np.cumsum(t_g[order])
            kept = ids_g[order][cum <= remaining[g]]
            boundary_keep.update(int(x) for x in kept)

    keep_ref = ray.put(np.sort(np.fromiter(boundary_keep, dtype=np.int64, count=len(boundary_keep))))

    # ---- pass 3: streaming filter ----
    def _final(b: pa.Table) -> pa.Table:
        bst = ray.get(bstar_ref)
        kp = ray.get(keep_ref)
        gs = np.asarray(b.column(group_col).to_pylist(), dtype=object)
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        ug, inv = np.unique(gs, return_inverse=True)
        thr = np.fromiter(
            (bst.get(g, 1 << HIST_BITS) for g in ug), dtype=np.int64, count=ug.size
        )
        under = bk < thr[inv]
        if kp.size:
            pos = np.searchsorted(kp, ids)
            hit = pos < kp.size
            hit[hit] = kp[pos[hit]] == ids[hit]
            under |= hit
        return b.filter(pa.array(under)).select([id_col, group_col, "n_tokens"])

    return base.map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)
