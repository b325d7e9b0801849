"""Sharded shuffled export: the FINAL step of a training-data pipeline —
a deterministic global shuffle of the kept corpus into S equal-ish shards,
written as one Parquet directory per shard so a trainer streams shards in
order and a failed export resumes per shard.

Determinism (the property SGD-shuffle exports need for reproducibility +
resume): shard(doc) = splitmix64(doc_id ^ seed) % S and the within-shard
order is (splitmix64(doc_id ^ seed), doc_id) ascending — a pure function of
(corpus, seed, S), independent of task order, batch boundaries or
parallelism. Re-running the export reproduces every shard byte-identically,
so a partial run can skip finished shard directories (the manifest pattern
of stages/build.py).

100-TB shape: the assignment pass is a streaming map_batches (text never
leaves its block until the one shuffle); the shuffle is groupby(shard) —
S × shard_size bounded by design (S is chosen so a shard fits a reducer);
the per-shard sort is within-group only. Nothing corpus-sized touches the
driver: writers emit (shard, rows, bytes) manifest rows only.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashes import splitmix64


def shuffle_plan_batch(
    batch: pa.Table, id_col: str, num_shards: int, seed: int
) -> pa.Table:
    """Append (shard, h64) to a batch — the assignment half of the export."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    out = batch.append_column(
        "shard", pa.array((h % np.uint64(num_shards)).astype(np.int64), type=pa.int64())
    )
    return out.append_column("h64", pa.array(h.view(np.int64), type=pa.int64()))


def export_shuffled(
    ds: ray.data.Dataset,
    out_dir: str | None,
    num_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 0,
) -> pa.Table:
    """Shuffle `ds` into `num_shards` deterministic shards. When `out_dir`
    is set, write each shard to `<out_dir>/shard=K/part.parquet` (skipping
    shards whose file already exists — the resume path) and return the
    manifest (shard, rows, bytes); when None, return the full plan
    (doc_id, shard, pos) instead — pos is the within-shard rank."""
    assigned = ds.map_batches(
        shuffle_plan_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col, "num_shards": num_shards, "seed": seed},
    )

    def _finish(group: pa.Table) -> pa.Table:
        sh = int(group.column("shard")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = group.column("h64").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, h))
        group = group.take(pa.array(order)).drop_columns(["h64"])
        if out_dir is None:
            return pa.table(
                {
                    id_col: group.column(id_col),
                    "shard": group.column("shard"),
                    "pos": pa.array(np.arange(len(group), dtype=np.int64), type=pa.int64()),
                }
            )
        d = os.path.join(out_dir, f"shard={sh:05d}")
        path = os.path.join(d, "part.parquet")
        if os.path.exists(path):  # resume: finished shards skipped — but a
            # stale file from a DIFFERENT corpus must not be silently served
            existing = pq.read_metadata(path).num_rows
            if existing != len(group):
                raise ValueError(
                    f"export resume mismatch: {path} holds {existing} rows, "
                    f"current corpus produces {len(group)} for shard {sh} — "
                    "the upstream pipeline changed; remove the directory to re-export"
                )
        else:
            os.makedirs(d, exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(group.drop_columns(["shard"]), tmp)
            os.replace(tmp, path)  # atomic per shard
        return pa.table(
            {
                "shard": pa.array([sh], type=pa.int64()),
                "rows": pa.array([len(group)], type=pa.int64()),
                "bytes": pa.array([os.path.getsize(path)], type=pa.int64()),
            }
        )

    out = assigned.groupby("shard").map_groups(_finish, batch_format="pyarrow")
    batches = list(out.iter_batches(batch_format="pyarrow"))
    if not batches:
        cols = (
            {id_col: pa.array([], pa.int64()), "shard": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64())}
            if out_dir is None
            else {"shard": pa.array([], pa.int64()), "rows": pa.array([], pa.int64()),
                  "bytes": pa.array([], pa.int64())}
        )
        return pa.table(cols)
    t = pa.concat_tables(batches)
    return t.sort_by(id_col if out_dir is None else "shard")
