"""Multimodal (image/audio/video) column plumbing — actor-pool feature stages.

Media payloads are opaque `binary` columns with typed metadata, processed by
stateful actor-pool `map_batches` stages (model load once per actor in
__init__ — the reference's load-once/serve-many lifecycle, Index.h:442-479).

The image/audio decode libraries are NOT in this container, so the decoders
are STUBBED (BASELINE instructions): `decoder="real"` raises
NotImplementedError at the exact integration point; `decoder="fake"` derives
a deterministic feature vector from the payload bytes so the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashes import splitmix64, stable_hash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_features(payloads: list[bytes], dim: int) -> np.ndarray:
    """Deterministic stand-in features: splitmix64 stream seeded by payload
    hash -> unit-norm float32 vector. Stable across processes."""
    seeds = stable_hash64([p.hex() for p in payloads])
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, s in enumerate(seeds):
        vals = splitmix64(np.uint64(s) + np.arange(dim, dtype=np.uint64))
        out[i] = (vals.astype(np.float64) / 2**64 - 0.5).astype(np.float32)
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return out


class MediaFeatureExtractor:
    """Actor-pool stage: media batches -> feature vectors.

    Use: ds.map_batches(MediaFeatureExtractor, concurrency=N, batch_size=B,
                        num_cpus=1, fn_constructor_kwargs={...})
    Small batch_size matters here: payloads are wide (SURVEY.md §7 #4)."""

    def __init__(self, decoder: str = "fake", dim: int = 64):
        self.decoder = decoder
        self.dim = dim
        if decoder == "fake":
            # "model load" — done once per actor; deterministic weights
            self.proj = (
                splitmix64(np.arange(dim, dtype=np.uint64) + np.uint64(99)).astype(np.float64)
                / 2**64
            )
        elif decoder == "real":
            # integration point for PIL / torchvision / ffmpeg etc.
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this environment; use decoder='fake' for plumbing tests"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = _fake_features(payloads, self.dim)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "embedding": pa.array(
                    [row.tolist() for row in feats], type=pa.list_(pa.float32())
                ),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage: 'video' payloads -> deterministic frame-sample rows
    (media_id, frame_idx, frame_payload). Frame extraction itself is stubbed:
    frames are byte slices — the output LAYOUT (one row per sampled frame,
    flat_map-shaped) is the real, tested part."""

    def __init__(self, fps_divisor: int = 10, max_frames: int = 8):
        self.fps_divisor = fps_divisor
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            n = min(self.max_frames, max(1, (dur or 1000) // (1000 * self.fps_divisor) + 1))
            step = max(1, len(payload) // n)
            for f in range(n):
                ids.append(mid)
                fidx.append(f)
                frames.append(payload[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "frame_payload": pa.array(frames, type=pa.binary()),
            }
        )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    types = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.bytes(int(rng.integers(200, 2000))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(1000, 60000, n).astype(np.int32)),
        }
    )
