"""Per-partition lineage manifests — checkpoint-resumable builds (north_rule).

The reference persists one monolithic index image
(/root/reference/include/flatnav/index/Index.h:481-490 `saveIndex`, 442-479
`loadIndex`); a crash loses everything. Here every partition's segment +
docmap files are written atomically (tmp + os.replace) together with a
manifest JSON row carrying lineage (input fingerprint, row counts, bytes,
checksum, config version). A resumed build skips partitions whose manifest is
already present and consistent.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionManifest:
    partition: int
    n_docs: int
    sum_doc_len: int
    n_terms: int
    bytes: int
    checksum: str
    segment_path: str
    docmap_path: str
    config_fingerprint: str
    stage: str = "segments"
    input_files: list[str] = field(default_factory=list)


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def manifest_path(index_dir: str, partition: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"part-{partition:05d}.json")


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def write_manifest(index_dir: str, m: PartitionManifest) -> None:
    atomic_write_bytes(
        manifest_path(index_dir, m.partition),
        json.dumps(asdict(m), sort_keys=True).encode(),
    )


def read_manifest(index_dir: str, partition: int) -> PartitionManifest | None:
    p = manifest_path(index_dir, partition)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return PartitionManifest(**json.load(f))


def completed_partitions(index_dir: str, config_fingerprint: str) -> set[int]:
    """Partitions safe to skip on resume: manifest exists, fingerprint matches,
    and the referenced files are still on disk."""
    out: set[int] = set()
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            m = PartitionManifest(**json.load(f))
        if (
            m.config_fingerprint == config_fingerprint
            and os.path.exists(m.segment_path)
            and os.path.exists(m.docmap_path)
        ):
            out.add(m.partition)
    return out
