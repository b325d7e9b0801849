"""Incremental ingest: delta-segment build + compaction + generation swap.

The graft of the reference's single-point `add` surface
(/root/reference/include/flatnav/index/Index.h:298-336 `add` /
python-bindings/src/flatnav/bindings.cpp:216-259 batched `add`) re-expressed
for a batch engine: new documents build a DELTA index with the base's exact
config, then `merge_indexes([delta, base])` compacts them into a new
generation (delta listed first, so a re-crawled url's new version wins —
upsert semantics, matching the build's max-(warc_ts, text_hash) dedup
direction). This is the Lucene soft-commit/merge design on Ray Data: ingest
cost scales with the delta, not the corpus, and the base generation stays
queryable until the atomic swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

import ray.data

from ..config import IndexConfig
from ..state.stats import load_stats
from .build import build_index


def _cfg_from_stats(stats: dict) -> IndexConfig:
    return IndexConfig(
        num_partitions=int(stats["num_partitions"]),
        block_size=int(stats["block_size"]),
        k1=float(stats["k1"]),
        b=float(stats["b"]),
        scorer=stats["scorer"],
        analyzer=stats["analyzer"],
        layout=stats.get("layout", "doc"),
    )


def recover_generation(index_dir: str) -> str | None:
    """Roll a crashed generation swap forward (or back).

    The swap is two renames — `index_dir -> .old-<tag>` then
    `.gen-<tag> -> index_dir` — and cannot be fully atomic without
    renameat2(RENAME_EXCHANGE): a crash in the window between them leaves
    index_dir missing with the `.old-<tag>` (and possibly a complete
    `.gen-<tag>`) beside it. This detects that state and repairs it:
    roll FORWARD to the new generation when a complete `.gen-<tag>` exists
    (stats.json is written last by merge_indexes, so its presence proves
    completeness), else roll BACK to `.old-<tag>`. Returns "forward",
    "back", or None when index_dir is intact."""
    if os.path.exists(os.path.join(index_dir, "stats.json")):
        return None
    parent = os.path.dirname(os.path.abspath(index_dir)) or "."
    base = os.path.basename(os.path.abspath(index_dir))
    olds = sorted(n for n in os.listdir(parent) if n.startswith(f"{base}.old-"))
    if not olds:
        return None
    tag = olds[-1].rsplit("-", 1)[1]
    gen = os.path.join(parent, f"{base}.gen-{tag}")
    shutil.rmtree(index_dir, ignore_errors=True)  # at most a torn partial
    if os.path.exists(os.path.join(gen, "stats.json")):
        os.rename(gen, index_dir)
        for n in olds:
            shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
        return "forward"
    os.rename(os.path.join(parent, olds[-1]), index_dir)
    shutil.rmtree(gen, ignore_errors=True)
    return "back"


def add_documents(
    index_dir: str,
    pages: ray.data.Dataset,
    out_dir: str | None = None,
) -> dict:
    """Add `pages` to an existing doc-layout index.

    Builds a delta index (same config fingerprint as the base), compacts
    [delta, base] into a new generation, and either writes it to `out_dir`
    or swaps it into `index_dir`. The swap is two renames; a crash between
    them leaves index_dir missing with the `.old-<tag>` dir beside it —
    `recover_generation` (called here on open) detects that and rolls
    forward/back, so the observable states are: old generation, new
    generation, or recoverable-by-open. Returns the merged stats dict.
    """
    from ..stages.compact import merge_indexes

    recover_generation(index_dir)
    stats = load_stats(index_dir)
    assert stats.get("layout", "doc") == "doc", "incremental add requires the doc layout"
    # dense_url / gorder assign per-partition DENSE ids: two independently
    # built generations would collide on id 0,1,2,... — only the stable
    # hash(url) id space merges safely
    assert stats.get("docid_strategy", "hash") == "hash", (
        "incremental add requires docid_strategy='hash' (dense/gorder ids "
        "collide across generations; compact with a full rebuild instead)"
    )
    cfg = _cfg_from_stats(stats)

    tag = uuid.uuid4().hex[:8]
    delta_dir = f"{index_dir}.delta-{tag}"
    gen_dir = out_dir or f"{index_dir}.gen-{tag}"
    try:
        build_index(pages, delta_dir, cfg, resume=False)
        # delta FIRST: on doc_id collision the freshly added version wins
        merged = merge_indexes([delta_dir, index_dir], gen_dir, cfg)
    except BaseException:
        shutil.rmtree(delta_dir, ignore_errors=True)
        if out_dir is None:
            shutil.rmtree(gen_dir, ignore_errors=True)
        raise
    shutil.rmtree(delta_dir, ignore_errors=True)
    if out_dir is None:
        old = f"{index_dir}.old-{tag}"
        os.rename(index_dir, old)
        os.rename(gen_dir, index_dir)
        shutil.rmtree(old, ignore_errors=True)
    return merged
