"""Incremental ingest: delta-segment build, generation stacking, compaction.

The graft of the reference's single-point `add` surface
(/root/reference/include/flatnav/index/Index.h:298-336 `add` /
python-bindings/src/flatnav/bindings.cpp:216-259 batched `add`) re-expressed
for a batch engine, in two tiers (the Lucene soft-commit/merge design on
Ray Data):

* STACK (default): new documents build only a DELTA index (cost O(delta),
  the reference's O(insert) analog) registered in `generations.json`;
  `StackedSearchSession` serves [base, deltas...] with upsert resolution at
  serve time, bit-identical to the compacted index. Compaction triggers when
  the stack exceeds `compact_threshold`.
* COMPACT: `merge_indexes([deltas newest-first..., base])` folds everything
  into a new generation (newest listed first, so a re-crawled url's new
  version wins — upsert semantics, matching the build's
  max-(warc_ts, text_hash) dedup direction) and atomically swaps it in.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import ray.data

from ..config import IndexConfig
from ..state.stats import load_stats
from .build import build_index

GENERATIONS_FILE = "generations.json"


def list_generations(index_dir: str) -> list[str]:
    """Generation directories oldest-first: the base index itself plus any
    stacked deltas registered in generations.json."""
    path = os.path.join(index_dir, GENERATIONS_FILE)
    if not os.path.exists(path):
        return [index_dir]
    with open(path) as f:
        stack = json.load(f)["stack"]
    return [index_dir] + [os.path.join(index_dir, d) for d in stack]


def _write_generations(index_dir: str, stack: list[str]) -> None:
    """Atomic single-file manifest update (write-temp + rename)."""
    path = os.path.join(index_dir, GENERATIONS_FILE)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"stack": stack}, f)
    os.rename(tmp, path)


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


def stack_size_bytes(index_dir: str) -> tuple[int, int]:
    """(base_bytes, delta_bytes): on-disk index bytes of the base generation
    vs the sum of all stacked deltas — the tiered-compaction policy input."""
    from ..stages.introspect import index_size_bytes

    gens = list_generations(index_dir)
    base = sum(index_size_bytes(gens[0]).values())
    deltas = sum(sum(index_size_bytes(g).values()) for g in gens[1:])
    return base, deltas


def add_documents(
    index_dir: str,
    pages: ray.data.Dataset,
    out_dir: str | None = None,
    mode: str = "compact",
    compact_threshold: int = 4,
    compact_ratio: float | None = None,
) -> dict:
    """Add `pages` to an existing doc-layout index.

    mode="stack": build ONLY the delta index (cost scales with the
    delta, not the corpus — the reference's O(insert) `add`, Index.h:298-336)
    as `_delta-<seq>-<tag>/` inside index_dir and register it atomically in
    generations.json; serve with `StackedSearchSession(list_generations(d))`.
    When the stack (base + deltas) would exceed `compact_threshold`
    generations — or, with `compact_ratio` set, when the deltas' combined
    on-disk bytes reach `compact_ratio` × the base's (the Lucene tiered-merge
    analog: many small deltas accumulate cheaply; compaction amortizes
    against a base at least 1/ratio their size) — everything compacts into a
    fresh single-generation index first. Returns the newest generation's
    stats dict.

    mode="compact" (default): fold [delta, base] into a new generation and
    either write it to `out_dir` or swap it into `index_dir`. The swap is
    two renames; a crash between them leaves index_dir missing with the
    `.old-<tag>` dir beside it — `recover_generation` (called here on open)
    detects that and rolls forward/back, so the observable states are: old
    generation, new generation, or recoverable-by-open.
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

    if mode == "stack" and out_dir is None:
        gens = list_generations(index_dir)
        stack = [os.path.basename(g) for g in gens[1:]]
        # crashed delta builds leave unregistered _delta-* dirs: sweep them
        for n in os.listdir(index_dir):
            if n.startswith("_delta-") and n not in stack:
                shutil.rmtree(os.path.join(index_dir, n), ignore_errors=True)
        over_count = len(gens) + 1 > compact_threshold
        over_ratio = False
        if compact_ratio is not None and len(gens) > 1:
            base_b, delta_b = stack_size_bytes(index_dir)
            over_ratio = delta_b >= compact_ratio * base_b
        if over_count or over_ratio:
            _compact_stack(index_dir, cfg)
            gens = [index_dir]
            stack = []
        name = f"_delta-{len(gens):04d}-{tag}"
        delta_dir = os.path.join(index_dir, name)
        try:
            build_index(pages, delta_dir, cfg, resume=False)
        except BaseException:
            shutil.rmtree(delta_dir, ignore_errors=True)
            raise
        _write_generations(index_dir, stack + [name])
        return load_stats(delta_dir)

    delta_dir = f"{index_dir}.delta-{tag}"
    gen_dir = out_dir or f"{index_dir}.gen-{tag}"
    srcs_newest_first = list(reversed(list_generations(index_dir)))
    try:
        build_index(pages, delta_dir, cfg, resume=False)
        # delta FIRST: on doc_id collision the freshly added version wins
        merged = merge_indexes([delta_dir] + srcs_newest_first, gen_dir, cfg)
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


def _compact_stack(index_dir: str, cfg: IndexConfig) -> dict:
    """Fold the whole generation stack into a fresh single-generation index
    and swap it in (newest generation listed first so its documents win)."""
    from ..stages.compact import merge_indexes

    tag = uuid.uuid4().hex[:8]
    gen_dir = f"{index_dir}.gen-{tag}"
    srcs = list(reversed(list_generations(index_dir)))
    try:
        merged = merge_indexes(srcs, gen_dir, cfg)
    except BaseException:
        shutil.rmtree(gen_dir, ignore_errors=True)
        raise
    old = f"{index_dir}.old-{tag}"
    os.rename(index_dir, old)
    os.rename(gen_dir, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    return merged
