"""Real media decoders for the multimodal stages (stages/multimodal.py).

The sandbox has no PIL/soundfile/cv2, but "real decode" does not require
them for the common interchange formats:

* images — PNG (zlib inflate + scanline unfilter, pure numpy/stdlib),
  BMP (24/32-bit uncompressed), PPM/PGM (binary P6/P5). If PIL IS importable
  (a real cluster image), it is preferred and handles everything else.
* audio — WAV via the stdlib `wave` module (PCM 8/16/32-bit, any channel
  count). If soundfile is importable it is preferred.

Decoders return numpy arrays; feature extraction on top stays deterministic
(no model weights): images -> mean-pooled grayscale grid, audio -> averaged
FFT magnitude spectrum. Both are REAL computations over real samples —
the stages' schema/actor plumbing upstream is identical whether the features
come from these or from a learned encoder.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:  # import-guarded upgrade path: use PIL when the image has it
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - sandbox has no PIL
    _PILImage = None

try:
    import soundfile as _soundfile  # type: ignore
except ImportError:  # pragma: no cover - sandbox has no soundfile
    _soundfile = None


# ---------------------------------------------------------------- images

def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filtering. `raw` is the inflated byte stream
    (height * (1 + stride) bytes); returns (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)
    return out


def _decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit depth, color types 0 (gray), 2 (RGB),
    3 (palette), 6 (RGBA), no interlacing. Returns (H, W, C) uint8."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, colortype={ct}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ct)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {ct}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG: IDAT size mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ct == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3|4) uint8 (top-down order)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP: unsupported header")
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"BMP: unsupported (bpp={bpp}, compression={compression})")
    nch = bpp // 8
    flip = h > 0
    h = abs(h)
    row_bytes = (w * nch + 3) & ~3
    px = np.zeros((h, w, nch), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=w * nch, offset=off + y * row_bytes)
        px[h - 1 - y if flip else y] = row.reshape(w, nch)
    # BGR(A) -> RGB(A)
    px[:, :, :3] = px[:, :, 2::-1]
    return px


def _decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> (H, W, 3|1) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    nch = 3 if data[:2] == b"P6" else 1
    # header: magic, width, height, maxval separated by whitespace/comments
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("PNM: 16-bit not supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * nch, offset=i)
    return px.reshape(h, w, nch)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to (H, W, C) uint8. Prefers PIL when
    importable; falls back to the stdlib PNG/BMP/PNM decoders."""
    if _PILImage is not None:  # pragma: no cover - sandbox has no PIL
        img = _PILImage.open(io.BytesIO(payload))
        arr = np.asarray(img)
        return arr[:, :, None] if arr.ndim == 2 else arr
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    raise ValueError(
        "unsupported image format (stdlib decoders handle PNG/BMP/PNM; "
        "install PIL for JPEG and the rest)"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio payload to (mono float32 samples in [-1, 1],
    sample_rate). Prefers soundfile; falls back to stdlib WAV."""
    if _soundfile is not None:  # pragma: no cover - sandbox has no soundfile
        samples, rate = _soundfile.read(io.BytesIO(payload), dtype="float32")
        if samples.ndim == 2:
            samples = samples.mean(axis=1)
        return samples.astype(np.float32), int(rate)
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"WAV: unsupported sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32), rate


# ------------------------------------------------------- feature kernels

def image_grid_features(px: np.ndarray, dim: int = 64) -> np.ndarray:
    """(H, W, C) uint8 -> unit-norm float32 feature vector: mean-pooled
    grayscale grid of sqrt(dim) x sqrt(dim) cells (a deterministic, real
    pixel-statistics embedding — swap in a learned encoder on a real
    cluster, the stage contract is identical)."""
    g = int(np.sqrt(dim))
    if g * g != dim:
        raise ValueError(f"dim must be a perfect square (got {dim})")
    f = px.astype(np.float32)
    gray = f.mean(axis=2) if f.shape[2] > 1 else f[:, :, 0]
    h, w = gray.shape
    ys = (np.arange(h) * g // max(h, 1)).clip(max=g - 1)
    xs = (np.arange(w) * g // max(w, 1)).clip(max=g - 1)
    cell = np.zeros((g, g), dtype=np.float64)
    cnt = np.zeros((g, g), dtype=np.float64)
    np.add.at(cell, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), gray)
    np.add.at(cnt, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), 1.0)
    out = (cell / np.maximum(cnt, 1.0)).reshape(-1).astype(np.float32) / 255.0
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def audio_spectrum_features(x: np.ndarray, dim: int = 64) -> np.ndarray:
    """Mono samples -> unit-norm float32 averaged |FFT| spectrum in `dim`
    bands (frame 1024 / hop 512; real spectral content, no fake hashing)."""
    frame, hop = 1024, 512
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    n_frames = 1 + (x.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame)[None, :], axis=1))
    avg = spec.mean(axis=0)  # (513,)
    bands = np.array_split(avg, dim)
    out = np.array([b.mean() for b in bands], dtype=np.float32)
    n = np.linalg.norm(out)
    return out / n if n > 0 else out
