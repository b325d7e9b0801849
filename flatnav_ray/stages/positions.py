"""Positional sidecar — token positions per (term, doc), enabling exact
phrase retrieval (`QueryConfig.method="phrase"`).

The reference has no phrase capability (its payload is opaque vectors), but a
full-text serving engine's users expect it; this is the positional-postings
extension of the same index design (SURVEY.md §2.10 layout-strategy slot).
Like Lucene's .pos files the sidecar is a SEPARATE per-partition artifact so
the main (doc_id, tf) segments — and the two-phase build's shuffle — stay
position-free; workloads that never issue phrase queries never pay for
positions.

Build: the same `groupby(partition)` shuffle as the one-phase index build,
one `map_groups` reducer per partition:

    pages -> prepare_batch (same analyzer/langs as the index)
          -> groupby(partition)
          -> winner dedup (the SAME rule as the two-phase build, so the doc
             set and per-(term, doc) token counts match the segments exactly)
          -> token_positions -> per-term (doc-major) position lists
          -> possegment-P.parquet (atomic tmp+rename, resumable)

Alignment invariant (asserted by tests): row j of a term's position lists
corresponds to the j-th posting of that term in the MAIN segment (both are
docmap-position ascending over the identical winner set). Doc rows are
matched to docmap rows by URL, so the sidecar works under every
docid_strategy (hash / dense_url / graph reorders).

Layout: one row per term — `pos_offs` (df+1 offsets) slicing `pos_flat`
(token positions, doc-major). Plain Arrow list<int32> columns: positions are
small ints and Parquet's own encodings compress them; at 100 TB the flat
stream would get the same delta+varint treatment as the doc blobs
(functions/codec.py), which is an internal-format change only.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import IndexConfig
from ..functions.hashes import stable_hash64
from ..functions.tokenize import token_positions
from .build import _atomic_write_parquet, _clamp_worker_threads, docmap_path


def _dedup_winners(group: pa.Table) -> pa.Table:
    """The two-phase build's winner rule (twophase.map_partial): per doc_id
    keep max (warc_ts, text_hash) — positions must come from the text the
    index actually indexed, bit-for-bit."""
    th = (stable_hash64(group.column("text")) & np.uint64(2**63 - 1)).astype(np.int64)
    g = group.append_column("text_hash", pa.array(th, type=pa.int64()))
    order = pc.sort_indices(
        g,
        sort_keys=[
            ("doc_id", "ascending"),
            ("warc_ts", "descending"),
            ("text_hash", "descending"),
        ],
    )
    srt = g.take(order)
    ids = srt.column("doc_id").to_numpy(zero_copy_only=False)
    first = np.ones(ids.size, dtype=bool)
    if ids.size > 1:
        first[1:] = ids[1:] != ids[:-1]
    return srt.filter(pa.array(first))

POS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("pos_offs", pa.list_(pa.int32())),  # df+1 offsets into pos_flat
        ("pos_flat", pa.list_(pa.int32())),  # token positions, doc-major
    ]
)

POS_MANIFEST_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("n_terms", pa.int64()),
        ("n_positions", pa.int64()),
        ("skipped", pa.bool_()),
    ]
)


def positions_path(index_dir: str, partition: int) -> str:
    return os.path.join(index_dir, "positions", f"possegment-{partition:05d}.parquet")


def build_positions_group(group: pa.Table, index_dir: str) -> pa.Table:
    """One partition's sidecar: dedup winners, tokenize with positions,
    emit per-term doc-major position lists aligned to the segment's posting
    order."""
    _clamp_worker_threads()
    if len(group) == 0:
        return POS_MANIFEST_SCHEMA.empty_table()
    partition = int(group.column("partition")[0].as_py())
    out_path = positions_path(index_dir, partition)
    if os.path.exists(out_path):  # resume: sidecar files are atomic
        return pa.table([[partition], [0], [0], [True]], schema=POS_MANIFEST_SCHEMA)

    deduped = _dedup_winners(group)
    dm_urls = pq.read_table(docmap_path(index_dir, partition), columns=["url"]).column(
        "url"
    ).combine_chunks()
    rows = pc.index_in(deduped.column("url"), value_set=dm_urls)
    assert rows.null_count == 0, (
        "positional sidecar input does not match the index docmap "
        "(build the sidecar from the SAME corpus the index was built from)"
    )
    rows_np = rows.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rows_np)  # docmap rows are unique per winner
    texts = deduped.column("text").take(pa.array(order))
    rows_sorted = rows_np[order]

    parents, toks, tpos = token_positions(texts)
    if len(toks) == 0:
        _atomic_write_parquet(POS_SCHEMA.empty_table(), out_path)
        return pa.table([[partition], [0], [0], [False]], schema=POS_MANIFEST_SCHEMA)

    enc = pc.dictionary_encode(toks)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = enc.dictionary
    # remap first-appearance codes -> lexicographic ranks, then ONE stable
    # integer argsort: within each term the (docmap row, token position)
    # order is preserved (rows arrive doc-major already)
    sort_idx = pc.sort_indices(dic)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[sort_idx.to_numpy(zero_copy_only=False).astype(np.int64)] = np.arange(len(dic))
    rcodes = rank[codes]
    ord2 = np.argsort(rcodes, kind="stable")
    rc = rcodes[ord2]
    dp = rows_sorted[parents[ord2]]
    tp = tpos[ord2]

    t_new = np.empty(rc.size, dtype=bool)
    t_new[0] = True
    t_new[1:] = rc[1:] != rc[:-1]
    term_starts = np.flatnonzero(t_new)
    term_ends = np.append(term_starts[1:], rc.size)
    d_new = t_new.copy()
    d_new[1:] |= dp[1:] != dp[:-1]
    ds_global = np.flatnonzero(d_new)  # first token of each (term, doc) run
    term_of_ds = np.searchsorted(term_starts, ds_global, side="right") - 1
    n_terms = term_starts.size
    df_t = np.bincount(term_of_ds, minlength=n_terms)

    # pos_offs per term: doc-run starts relative to the term start, plus the
    # term's total position count as the final offset
    out_offs = np.zeros(n_terms + 1, dtype=np.int64)
    out_offs[1:] = np.cumsum(df_t + 1)
    vals = np.empty(out_offs[-1], dtype=np.int64)
    end_slots = out_offs[1:] - 1
    non_end = np.ones(vals.size, dtype=bool)
    non_end[end_slots] = False
    vals[non_end] = ds_global - term_starts[term_of_ds]
    vals[end_slots] = term_ends - term_starts

    pos_offs_col = pa.ListArray.from_arrays(
        pa.array(out_offs, type=pa.int32()), pa.array(vals, type=pa.int32())
    )
    flat_offs = np.append(term_starts, rc.size)
    pos_flat_col = pa.ListArray.from_arrays(
        pa.array(flat_offs, type=pa.int32()), pa.array(tp, type=pa.int32())
    )
    table = pa.table(
        [dic.take(sort_idx), pos_offs_col, pos_flat_col], schema=POS_SCHEMA
    )
    _atomic_write_parquet(table, out_path)
    return pa.table(
        [[partition], [int(n_terms)], [int(rc.size)], [False]],
        schema=POS_MANIFEST_SCHEMA,
    )


def build_position_sidecar(ds, index_dir: str, cfg: IndexConfig) -> pa.Table:
    """Build the positional sidecar over the SAME corpus (and the same
    IndexConfig analyzer/partitioning) the index at `index_dir` was built
    from. Ray-Data-first: one groupby(partition) shuffle, one reducer per
    partition, atomic per-partition outputs (resumable — existing
    possegments are skipped)."""
    from ..pipelines.build import prepare_batch

    prepped = ds.map_batches(
        lambda b: prepare_batch(b, cfg.num_partitions, cfg.langs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    res = prepped.groupby("partition").map_groups(
        lambda g: build_positions_group(g, index_dir), batch_format="pyarrow"
    )
    batches = list(res.iter_batches(batch_format="pyarrow"))
    return (
        pa.concat_tables(batches).sort_by("partition")
        if batches
        else POS_MANIFEST_SCHEMA.empty_table()
    )
