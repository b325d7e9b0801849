"""End-to-end index build pipeline (SURVEY.md §3.1 flagship trace, build side).

    read_parquet(pages)
      -> map_batches(extract + doc_id + partition)   [stateless, Arrow]
      -> groupby(partition).map_groups(build_partition)  [the ONE wide shuffle]
      -> per-partition segment/docmap files + manifests  [atomic, resumable]
      -> term_stats: column-pruned read over segments -> groupby(term).sum(df)
      -> stats.json (n_docs, avgdl, fingerprint)

Design note vs SURVEY.md A8: postings are built PARTITION-LOCAL — the heavy
(term, doc_id, tf) stream never crosses the network. Only the tiny (term, df)
pairs shuffle globally for BM25's idf (classic partial-aggregation/combiner).
The groupby(term) full-posting shuffle with heavy-hitter salting + hierarchical
merge exists as the alternative "term" layout in stages/termbuild.py.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from ..config import IndexConfig
from ..functions.extract import extract_text_batch
from ..functions.hashes import doc_ids_for_urls
from ..stages.build import build_partitions_block
from ..state.manifest import completed_partitions, manifest_dir, read_manifest
from ..state.stats import save_stats, term_stats_dir


def prepare_batch(batch: pa.Table, num_partitions: int, langs: tuple[str, ...] | None) -> pa.Table:
    """Stateless prep: extract text (M1), assign doc_id (M3: stable url hash —
    or the carried ext_doc_id on the adapter path), derive partition, drop the
    heavy html column immediately (SURVEY.md §7 'wide rows')."""
    from ..stages.build import _clamp_worker_threads

    _clamp_worker_threads()
    batch = extract_text_batch(batch)
    if "ext_doc_id" in batch.column_names:
        doc_id = batch.column("ext_doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.drop_columns(["ext_doc_id"])
    else:
        doc_id = doc_ids_for_urls(batch.column("url").to_pylist()).astype(np.int64)
    part = (doc_id % np.int64(num_partitions)).astype(np.int32)
    batch = batch.append_column("doc_id", pa.array(doc_id, type=pa.int64()))
    batch = batch.append_column("partition", pa.array(part, type=pa.int32()))
    if langs is not None:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch.column("lang"), value_set=pa.array(langs)))
    keep = ["url", "warc_ts", "text", "lang", "doc_id", "partition"]
    return batch.select(keep)


def _is_multi_node() -> bool:
    """True when the connected Ray cluster has more than one alive node."""
    try:
        import ray as _ray

        if not _ray.is_initialized():
            return False
        return sum(1 for n in _ray.nodes() if n.get("Alive")) > 1
    except Exception:  # pragma: no cover - defensive (no cluster info)
        return False


def _pick_spill_dir(index_dir: str) -> str:
    """Shuffle-spill location for the two-phase build.

    SINGLE NODE: $FLATNAV_SPILL_ROOT > /dev/shm (tmpfs: no disk writeback
    competing with the merge's reads + segment writes) > index_dir/_partials.

    MULTI NODE: node-local tmpfs is NOT a shuffle — map tasks would write
    partials to each node's own /dev/shm and a merge task scheduled on one
    node would silently read only that node's files (Spark-style shuffle
    files work only because reducers FETCH from every mapper; nothing here
    fetches). So with >1 alive node the spill defaults to
    index_dir/_partials: the index dir must be on shared storage for a
    multi-node build to be readable at all, and spilling beside it keeps
    every partial visible to every merge task. $FLATNAV_SPILL_ROOT still
    overrides — it must then point at shared storage (NFS/FSx/object mount).
    """
    root = os.environ.get("FLATNAV_SPILL_ROOT")
    if not root and _is_multi_node():
        return os.path.join(index_dir, "_partials")
    if not root and os.path.isdir("/dev/shm"):
        try:
            import shutil as _sh

            if _sh.disk_usage("/dev/shm").free > 16 * 1024**3:
                root = "/dev/shm/flatnav_spill"
        except OSError:
            root = None
    if root:
        key = hashlib.blake2b(os.path.abspath(index_dir).encode(), digest_size=6).hexdigest()
        return os.path.join(root, key)
    return os.path.join(index_dir, "_partials")


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    sum_doc_len: int
    avgdl: float
    num_partitions: int
    n_partitions_built: int
    n_partitions_skipped: int
    bytes: int


def build_index(
    pages: ray.data.Dataset,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
    mode: str = "twophase",
) -> BuildResult:
    """Build (or resume) the partitioned inverted index from a pages Dataset.

    mode="twophase" (default): map-side partial segments pipelined with the
    read, compact blobs shuffle, cheap per-partition merge (stages/twophase.py)
    — the scale path. mode="onephase": raw pages shuffle then full build in
    the reducer — simpler, kept for comparison/tests."""
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    fingerprint = cfg.fingerprint()
    done = completed_partitions(index_dir, fingerprint) if resume else set()

    # key-based repartition needs the hash shuffle strategy (no global sort);
    # the planner reads the context snapshot captured by the dataset, so set
    # it there (scoped to this pipeline — other datasets are unaffected).
    # Aggregator actors would otherwise RESERVE 0.5 CPU × num_partitions for
    # the whole pipeline (half the cluster, mostly idle) — their combining
    # work is light, so shrink the reservation and let map tasks have the cores
    pages.context.shuffle_strategy = ray.data.context.ShuffleStrategy.HASH_SHUFFLE
    pages.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    pages.context.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05

    if mode == "twophase":
        import shutil as _shutil
        import sys as _sys
        import time as _time

        import ray as _ray

        from ..stages.twophase import map_partial_spill, merge_spilled_partition

        _timing = os.environ.get("FLATNAV_BUILD_TIMING")
        spill_dir = _pick_spill_dir(index_dir)
        _shutil.rmtree(spill_dir, ignore_errors=True)
        _t0 = _time.perf_counter()
        mapped = pages.map_batches(
            map_partial_spill,
            batch_format="pyarrow",
            zero_copy_batch=True,
            # big enough that each partial row covers many docs per partition
            # (tiny batches would fragment dictionaries and bloat the merge)
            batch_size=4096,
            fn_kwargs={
                "num_partitions": cfg.num_partitions,
                "langs": cfg.langs,
                "spill_dir": spill_dir,
            },
        )
        # Drive the map phase. With FLATNAV_CONSOLIDATE=1, merge-type work
        # OVERLAPS the map phase: partition P's final merge legally needs
        # every map task's spill, but consolidating P's already-landed runs
        # into one bigger pre-sorted run (combine_partials is associative)
        # is valid at any time — background bandwidth-slot tasks fold
        # batches of raw partials into consolidated runs while the map is
        # still producing, so the post-barrier merge sees a few big runs
        # instead of hundreds of small ones. Default OFF on this single-bus
        # box: the interleaved A/B (tools/ab_consolidate.py, recorded in
        # BENCH/metrics.json) measured it neutral at 8 cpus and ~9% net
        # SLOWER at 32 — the extra read+write pass over every posting costs
        # more than the overlap buys when map and consolidation share one
        # memory controller. On a real multi-node cluster each node folds
        # its own spill against its own bus, which is the case the knob is
        # kept for. iter_batches() is the streaming driver loop (one tiny
        # partition-ids table per map task); count() is the plain barrier
        # when consolidation is off.
        consolidate = os.environ.get("FLATNAV_CONSOLIDATE", "0") == "1"
        if consolidate:
            from ..stages.twophase import consolidate_spilled_runs

            min_run = int(os.environ.get("FLATNAV_CONSOLIDATE_MIN_FILES", "48"))
            cons_remote = _ray.remote(num_cpus=2)(consolidate_spilled_runs)
            # each task holds a ~2-core bandwidth slot (same sizing rationale
            # as the merge); cap the pool so map tasks keep most of the node
            max_inflight = max(1, int(_ray.cluster_resources().get("CPU", 8)) // 8)
            inflight: dict = {}   # ObjectRef -> partition
            skip: set[int] = set()  # partitions whose pack widths overflowed

            def _harvest(block: bool = False) -> None:
                while inflight:
                    ready, _ = _ray.wait(
                        list(inflight), num_returns=1, timeout=None if block else 0
                    )
                    if not ready:
                        return
                    p = inflight.pop(ready[0])
                    try:
                        if _ray.get(ready[0]) < 0:  # -1 = width overflow
                            skip.add(p)
                    except Exception:
                        skip.add(p)  # originals remain; the merge reads them

            def _kick() -> None:
                busy = set(inflight.values())
                for p in range(cfg.num_partitions):
                    if len(inflight) >= max_inflight:
                        return
                    if p in busy or p in skip:
                        continue
                    d = os.path.join(spill_dir, f"part={p:05d}")
                    if not os.path.isdir(d):
                        continue
                    # meta files only — the commit markers of completed
                    # spill pairs; consolidate derives the post- paths.
                    # meta-cons- pairs (prior fold outputs) never re-enter
                    # a snapshot: re-folding the ever-growing consolidated
                    # run each round is O(N^2) posting I/O; the final merge
                    # k-ways raw and cons pairs alike.
                    fs = sorted(
                        os.path.join(d, f)
                        for f in os.listdir(d)
                        if f.startswith("meta-")
                        and not f.startswith("meta-cons-")
                        and f.endswith(".arrows")
                    )
                    if len(fs) >= min_run:
                        inflight[cons_remote.remote(p, spill_dir, fs)] = p

            for _ in mapped.iter_batches(batch_size=None, batch_format="pyarrow"):
                _harvest()
                _kick()
            _harvest(block=True)
        else:
            mapped.count()  # drives the map phase; partials land on disk
        _t1 = _time.perf_counter()

        # merge tasks are DRAM-bandwidth-bound, not core-bound: running one
        # per core queues the memory controller superlinearly (measured on
        # the 1M-doc spill: 32 concurrent merges 65-82s, 16 concurrent
        # 24-25s, 8 concurrent 32s — cores/2 is the saturation point).
        # num_cpus=2 reserves a bandwidth slot of ~2 cores per merge on any
        # node size, which also holds per-node on a real multi-node cluster
        # (each node schedules its own merges against its own memory bus).
        merge_cpus = int(os.environ.get("FLATNAV_MERGE_NUM_CPUS", "2"))
        merge_cpus = max(1, min(merge_cpus, int(_ray.cluster_resources().get("CPU", 1))))
        merge_task = _ray.remote(num_cpus=merge_cpus)(merge_spilled_partition)
        futs = [
            merge_task.remote(p, spill_dir, index_dir, cfg, done)
            for p in range(cfg.num_partitions)
        ]
        mt = pa.concat_tables(_ray.get(futs))
        _shutil.rmtree(spill_dir, ignore_errors=True)
        if _timing:
            print(
                f"[build timing] map={_t1 - _t0:.1f}s merge={_time.perf_counter() - _t1:.1f}s",
                file=_sys.stderr,
            )
    elif mode == "exchange":
        from ..stages.twophase import map_partial, merge_partials_block

        partials = pages.map_batches(
            map_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            fn_kwargs={"num_partitions": cfg.num_partitions, "langs": cfg.langs},
        )
        manifest_rows = partials.repartition(
            num_blocks=cfg.num_partitions, keys=["partition"], sort=False
        ).map_batches(
            merge_partials_block,
            batch_format="pyarrow",
            batch_size=None,
            # zero-copy matters for scheduling too: the batch copy would be
            # charged to the executor's heap budget and throttle concurrency
            zero_copy_batch=True,
            fn_kwargs={"index_dir": index_dir, "cfg": cfg, "resume": done},
        )
    else:
        prepared = pages.map_batches(
            prepare_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"num_partitions": cfg.num_partitions, "langs": cfg.langs},
        )
        manifest_rows = prepared.repartition(
            num_blocks=cfg.num_partitions, keys=["partition"], sort=False
        ).map_batches(
            build_partitions_block,
            batch_format="pyarrow",
            batch_size=None,  # one batch per hash-partitioned block
            zero_copy_batch=True,
            fn_kwargs={"index_dir": index_dir, "cfg": cfg, "resume": done},
        )
    if mode != "twophase":
        # tiny (num_partitions rows): safe to materialize; drives execution
        mt = pa.concat_tables(manifest_rows.iter_batches(batch_format="pyarrow"))
    built = mt.filter(pa.compute.equal(mt.column("skipped_resume"), False)) if len(mt) else mt

    # authoritative stats come from the on-disk manifests (includes resumed parts)
    n_docs = 0
    sum_dl = 0
    nbytes = 0
    n_built = 0
    mdir = manifest_dir(index_dir)
    parts_on_disk = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("part-") and name.endswith(".json"):
                p = int(name[5:-5])
                m = read_manifest(index_dir, p)
                if m and m.config_fingerprint == fingerprint:
                    parts_on_disk.append(p)
                    n_docs += m.n_docs
                    sum_dl += m.sum_doc_len
                    nbytes += m.bytes
                    n_built += 1
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    _build_term_stats(index_dir)

    save_stats(
        index_dir,
        {
            "n_docs": n_docs,
            "sum_doc_len": sum_dl,
            "avgdl": avgdl,
            "num_partitions": cfg.num_partitions,
            "partitions": parts_on_disk,
            "config_fingerprint": fingerprint,
            "block_size": cfg.block_size,
            "k1": cfg.k1,
            "b": cfg.b,
            "scorer": cfg.scorer,
            "analyzer": cfg.analyzer,
            "layout": cfg.layout,
            "docid_strategy": cfg.docid_strategy,
        },
    )
    return BuildResult(
        index_dir=index_dir,
        n_docs=n_docs,
        sum_doc_len=sum_dl,
        avgdl=avgdl,
        num_partitions=cfg.num_partitions,
        n_partitions_built=len(built),
        n_partitions_skipped=len(done),
        bytes=nbytes,
    )


DRIVER_SIDE_TERMSTATS_ROWS = 20_000_000


def _build_term_stats(index_dir: str) -> None:
    """Global (term, df): column-pruned read of segment files (only term+df
    leave disk), partial dfs combine in a small groupby — the combiner-style
    aggregation SURVEY.md §4 prescribes instead of shuffling postings.

    Small/medium vocabularies aggregate driver-side in Arrow C++ (a Ray
    groupby+sort costs seconds of fixed overhead); huge ones fall back to the
    distributed path."""
    import shutil

    seg_dir = os.path.join(index_dir, "segments")
    files = (
        [os.path.join(seg_dir, f) for f in sorted(os.listdir(seg_dir)) if f.endswith(".parquet")]
        if os.path.isdir(seg_dir)
        else []
    )
    out_dir = term_stats_dir(index_dir)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    if not files:  # empty index (e.g. empty input): typed empty term_stats
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}),
            os.path.join(out_dir, "term_stats.parquet"),
        )
        return

    total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    if total_rows <= DRIVER_SIDE_TERMSTATS_ROWS:
        t = pads.dataset(files, format="parquet").to_table(columns=["term", "df"])
        agg = t.group_by("term").aggregate([("df", "sum")])
        # select by generated name (key-vs-aggregate column order varies
        # across pyarrow releases; a positional rename would mislabel)
        agg = pa.table({"term": agg.column("term"), "df": agg.column("df_sum")})
        agg = agg.sort_by("term")
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            agg.cast(pa.schema([("term", pa.string()), ("df", pa.int64())])),
            os.path.join(out_dir, "term_stats.parquet"),
            row_group_size=65536,
        )
        return

    ts = (
        ray.data.read_parquet(files, columns=["term", "df"])
        .groupby("term")
        .sum("df")
        .map_batches(
            lambda b: pa.table({"term": b.column("term"), "df": b.column("sum(df)")}),
            batch_format="pyarrow",
        )
        .sort("term")
    )
    ts.write_parquet(out_dir)
