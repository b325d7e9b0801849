"""Benchmark decontamination: flag training docs sharing word n-grams with
an evaluation/benchmark set (the GPT-3 appendix-C / Gopher / LLaMA
decontamination pattern — 8-to-13-gram overlap against held-out benchmarks).

Ray-Data-first shape:

    benchmark -> map_batches: distinct hashed word n-grams per doc
              -> tiny side: np.unique on the driver, ray.put ONCE
                 large side: stays a Dataset of distinct shingle hashes
    corpus    -> map_batches: per-doc distinct shingles, membership test
                 (sorted-array searchsorted against the broadcast set), a
                 bincount per doc -> (doc_id, n_overlap) rows
                 -- or, above the broadcast cutover, a hash-partitioned
                 left_semi join on the shingle hash + groupby(doc_id).count()

The corpus text NEVER shuffles: only (doc_id, shingle_hash) rows move, and
only on the join path. Benchmarks are small in practice (MMLU+ARC+... is
megabytes against a 100 TB corpus), so the broadcast path is the default;
the cutover mirrors `semi_join_keep` (stages/dedup.py:64).

Shingles reuse `token_shingles` (functions/textstats.py:160): the same
analyzer as the index/dedup family, order-sensitive splitmix64 rolling
hashes, distinct-per-doc semantics — so the DuckDB oracle is the same
string-shingle construction as `jaccard_pairs`, modulo 64-bit hash
collisions (negligible at any realistic shingle count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.textstats import token_shingles
from .dedup import BROADCAST_MAX_KEEP


def _distinct_doc_shingles(
    batch: pa.Table, id_col: str, text_col: str, n: int
) -> pa.Table:
    """(doc_id, shingle) distinct rows for one batch — docs are whole within
    a batch, so per-batch distinct == global distinct."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    parents, sh = token_shingles(batch.column(text_col), n=n)
    t = pa.table(
        {
            id_col: pa.array(ids[parents], type=pa.int64()),
            "shingle": pa.array(sh.astype(np.int64), type=pa.int64()),
        }
    )
    return t.group_by([id_col, "shingle"]).aggregate([])


def benchmark_overlap(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    mode: str = "auto",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per corpus doc, the number of DISTINCT word n-grams it shares with
    the benchmark's pooled n-gram set. Returns a Dataset of
    (doc_id:int64, n_overlap:int64), contaminated docs only (n_overlap >= 1).

    mode="broadcast": the benchmark's distinct shingle hashes ship once via
    ray.put (sorted int64 array; plasma shares one copy per node) and each
    corpus batch runs a vectorized searchsorted membership + per-doc
    bincount. mode="shuffle": both sides exchange (shingle-hash-partitioned
    left_semi join), then groupby(doc_id).count() — nothing benchmark-sized
    on the driver. mode="auto" cuts over at BROADCAST_MAX_KEEP distinct
    benchmark shingles."""
    bench_sh = (
        benchmark.map_batches(
            _distinct_doc_shingles,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
        )
        .select_columns(["shingle"])
        .groupby("shingle")
        .count()
        .select_columns(["shingle"])
    ).materialize()  # small side; reused by count() + whichever path runs
    if mode == "auto":
        mode = "broadcast" if bench_sh.count() <= BROADCAST_MAX_KEEP else "shuffle"

    if mode == "shuffle":
        from .dedup import drop_empty_blocks

        corpus_sh = corpus.map_batches(
            _distinct_doc_shingles,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
        )
        # hash-shuffle join aggregators each hold a scheduling slot: more
        # partitions than CPUs deadlocks on a small cluster (cf. the
        # num_partitions=4 discipline in tests/test_ops.py::semi_join_keep)
        ncpu = int(ray.cluster_resources().get("CPU", num_partitions))
        nparts = max(2, min(num_partitions, ncpu))
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_overlap": pa.array([], type=pa.int64()),
            }
        )
        left = drop_empty_blocks(corpus_sh)
        right = drop_empty_blocks(bench_sh)
        if left is None or right is None:
            return ray.data.from_arrow(empty)
        hits = left.join(right, "left_semi", num_partitions=nparts, on=("shingle",))
        counts = hits.groupby(id_col).count()

        def _rename(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: b.column(id_col).cast(pa.int64()),
                    "n_overlap": b.column("count()").cast(pa.int64()),
                }
            )

        return counts.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)

    batches = list(bench_sh.iter_batches(batch_format="pyarrow"))
    if not batches:  # empty benchmark / all items shorter than n tokens
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_overlap": pa.array([], type=pa.int64()),
                }
            )
        )
    bench_tbl = pa.concat_tables(batches)
    bset = np.sort(bench_tbl.column("shingle").to_numpy(zero_copy_only=False).astype(np.int64))
    bref = ray.put(bset)

    def _overlap(batch: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parents, sh = token_shingles(batch.column(text_col), n=n)
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_overlap": pa.array([], type=pa.int64()),
            }
        )
        if sh.size == 0:
            return empty
        # distinct (doc, shingle): docs are whole within a batch
        key = np.stack([parents, sh.astype(np.int64)], axis=1)
        key = np.unique(key, axis=0)
        p, s = key[:, 0], key[:, 1]
        pos = np.searchsorted(bs, s)
        hit = pos < bs.size
        hit[hit] = bs[pos[hit]] == s[hit]
        if not hit.any():
            return empty
        cnt = np.bincount(p[hit], minlength=len(batch))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                id_col: pa.array(ids[nz], type=pa.int64()),
                "n_overlap": pa.array(cnt[nz].astype(np.int64), type=pa.int64()),
            }
        )

    return corpus.map_batches(_overlap, batch_format="pyarrow", zero_copy_batch=True)
