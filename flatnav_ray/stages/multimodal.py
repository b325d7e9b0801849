"""Multimodal (image/audio/video) column plumbing — actor-pool feature stages.

Media payloads are opaque `binary` columns with typed metadata, processed by
stateful actor-pool `map_batches` stages (model load once per actor in
__init__ — the reference's load-once/serve-many lifecycle, Index.h:442-479).

Decoders (functions/media.py): `decoder="real"` ACTUALLY decodes — PNG/BMP/
PNM images and WAV audio via stdlib+numpy (PIL / soundfile are preferred when
importable, giving JPEG etc. on a real cluster image), then extracts real
pixel-grid / FFT-spectrum features. `decoder="fake"` derives a deterministic
vector from payload bytes only — the zero-dependency plumbing mode.
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
            # once-per-actor setup: resolve decoders (PIL/soundfile when
            # importable, stdlib PNG/BMP/PNM/WAV otherwise) and the feature
            # kernels — nothing re-imports per batch
            from ..functions import media as _media

            self._media = _media
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _real_features(self, payloads: list[bytes], types: list[str]) -> np.ndarray:
        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, (p, t) in enumerate(zip(payloads, types)):
            if t == "image":
                out[i] = self._media.image_grid_features(
                    self._media.decode_image(p), self.dim
                )
            elif t == "audio":
                samples, _rate = self._media.decode_audio(p)
                out[i] = self._media.audio_spectrum_features(samples, self.dim)
            else:  # video container parsing needs ffmpeg — not in scope
                raise NotImplementedError(
                    f"real decode for media_type={t!r} requires ffmpeg-class "
                    "tooling; sample frames with FrameSampler and decode those"
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "real":
            feats = self._real_features(
                payloads, batch.column("media_type").to_pylist()
            )
        else:
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


def synth_decodable_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic media corpus with REAL decodable payloads: even ids get
    an 8x8 RGB PNG whose pixels derive from splitmix64(media_id), odd ids a
    0.25 s WAV tone whose frequency derives from the id. Drives the real
    decoder end-to-end with zero external data."""
    import io
    import struct as st
    import wave
    import zlib

    ids = np.arange(n, dtype=np.int64)
    types, payloads, widths, heights, durs = [], [], [], [], []
    for mid in ids:
        if mid % 2 == 0:
            px = (
                splitmix64(np.uint64(seed * 7919 + mid) + np.arange(8 * 8 * 3, dtype=np.uint64))
                & np.uint64(0xFF)
            ).astype(np.uint8).reshape(8, 8, 3)
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(8))

            def chunk(t, b):
                return st.pack(">I", len(b)) + t + b + st.pack(">I", zlib.crc32(t + b))

            payloads.append(
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", st.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )
            types.append("image")
            widths.append(8); heights.append(8); durs.append(0)
        else:
            freq = 200.0 + float(int(mid) % 37) * 50.0
            t = np.arange(2000, dtype=np.float64) / 8000.0
            sig = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(8000)
                wf.writeframes(sig.tobytes())
            payloads.append(buf.getvalue())
            types.append("audio")
            widths.append(0); heights.append(0); durs.append(250)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array(durs, type=pa.int32()),
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
