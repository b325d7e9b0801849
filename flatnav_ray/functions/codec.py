"""Posting-list codec: delta + varint in 128-doc blocks with per-block maxima.

The analog of the reference's packed node-record layout
(/root/reference/include/flatnav/index/Index.h:61-63, 555-573: hand-packed
`[data | M links | label]` byte records addressed by offset): posting lists are
opaque binary blobs we encode/decode ourselves, with block metadata
(last doc id, max tf, min doc len) enabling block-max skipping — the grafted
form of flatnav's candidate pruning (`Index.h:714-763`) per SURVEY.md §2.7 D3.

All encode/decode paths are vectorized numpy (no per-value Python loops): the
role the SIMD distance kernels play in the reference
(/root/reference/include/flatnav/util/SquaredL2SimdExtensions.h).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128

_U64 = np.uint64
_SEVEN = np.uint64(7)
_LOW7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)




def varint_byte_lens(values: np.ndarray) -> np.ndarray:
    """Bytes needed per value (uint8 array) — branch-free comparison adds,
    one pass per byte level actually present (searchsorted's per-element
    binary search was ~10x slower on the posting streams, 1-3 bytes wide).
    Values must be non-negative. uint8 return: the merge is DRAM-bound, the
    lens array is pure intermediate traffic (cumsum callers pass an output
    dtype)."""
    v = np.asarray(values)
    nb = np.ones(v.size, dtype=np.uint8)
    if v.size == 0:
        return nb
    mx = int(v.max())
    for k in range(1, 10):
        thr = 1 << (7 * k)
        if mx < thr:
            break
        nb += v >= v.dtype.type(thr)
    return nb


def encode_varint_with_lens(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-style varint encoding of a non-negative int array, vectorized.

    Returns (blob, per-value byte lengths as uint8) — callers that need
    offsets (segment encoding) reuse the lengths instead of recomputing them.
    The whole pipeline stays in the narrowest width that fits (uint32 for
    position-encoded doc streams and tf streams): the merge phase is
    DRAM-bandwidth-bound, so every avoided 8-byte intermediate is wall time
    (BASELINE.md scaling notes)."""
    v0 = np.asarray(values)
    n = v0.size
    if n == 0:
        return b"", np.empty(0, dtype=np.uint8)
    mx = int(v0.max())
    if mx < 0x80:  # all 1-byte (most tf streams, dense-position deltas)
        return v0.astype(np.uint8).tobytes(), np.ones(n, dtype=np.uint8)
    maxb = 1
    while mx >= (1 << (7 * maxb)):
        maxb += 1
    if maxb <= 4:  # maxb <= 4 implies v < 2^28 < 2^32
        v = v0.astype(np.uint32, copy=False)
        dt = np.uint32
    else:
        v = v0.astype(np.uint64, copy=False)
        dt = np.uint64
    nbytes = np.ones(n, dtype=np.uint8)
    for k in range(1, maxb):
        nbytes += v >= dt(1 << (7 * k))
    # Subset-split scatter: 1-byte values (the vast majority of delta/tf
    # streams) store directly at their (monotone -> effectively sequential)
    # output offsets; only the multi-byte minority walks the per-byte-level
    # loop. ~3x faster than the dense (n, maxb) byte-matrix + boolean
    # compress this replaces, and it never materializes the n*maxb
    # intermediates — the merge phase is DRAM-bound, so the saved traffic is
    # wall time under concurrent merges (BASELINE.md scaling notes).
    offs = np.empty(n, dtype=np.int64)
    np.cumsum(nbytes, out=offs)
    total = int(offs[-1])
    offs -= nbytes
    out = np.empty(total, dtype=np.uint8)
    one = nbytes == 1
    out[offs[one]] = v[one]
    rest = np.flatnonzero(~one)
    if rest.size:
        vr = v[rest]
        nbr = nbytes[rest]
        offr = offs[rest]
        for k in range(maxb):
            if k:  # drop values fully emitted in earlier byte levels
                act = nbr > k
                vr, nbr, offr = vr[act], nbr[act], offr[act]
            cont = nbr > k + 1
            out[offr + k] = (vr & dt(0x7F)).astype(np.uint8) | (
                cont.view(np.uint8) << np.uint8(7)
            )
            vr = vr >> dt(7)
    return out.tobytes(), nbytes


def encode_varint(values: np.ndarray) -> bytes:
    return encode_varint_with_lens(values)[0]


def decode_varint(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varint byte buffer -> uint64 array, vectorized.

    Per-byte-position gather (sequential reads, bounded passes) — ~3x faster
    than the scatter-add formulation on multi-byte values."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & _CONT) == 0
    if is_last.all():  # single-byte fast path (e.g. most tf streams)
        return b.astype(np.uint64)
    ends = np.flatnonzero(is_last)
    nvals = ends.size
    starts = np.empty(nvals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    maxb = int(lens.max())
    out = np.zeros(nvals, dtype=np.uint64)
    for k in range(maxb):
        active = lens > k
        idx = starts[active] + k
        out[active] |= (b[idx] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


@dataclass
class EncodedPostings:
    """One term's posting list for one partition (one `segments` row)."""

    df: int
    doc_blob: bytes            # delta+varint doc ids; block-start deltas are absolute
    tf_blob: bytes             # varint term frequencies, same order
    block_last_doc: np.ndarray  # int64 (n_blocks,) last doc id per block
    block_max_tf: np.ndarray    # int32 (n_blocks,)
    block_min_dl: np.ndarray    # int32 (n_blocks,) min doc length per block
    block_doc_offs: np.ndarray  # int32 (n_blocks,) byte offset of block start in doc_blob
    block_tf_offs: np.ndarray   # int32 (n_blocks,) byte offset of block start in tf_blob


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> EncodedPostings:
    """Encode a sorted (by doc_id) posting list into delta+varint blocks.

    Each block's first delta is absolute (delta from 0) so blocks decode
    independently — required for block-max skipping.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    doc_lens = np.ascontiguousarray(doc_lens, dtype=np.int64)
    n = doc_ids.size
    assert n > 0
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    block_starts = np.arange(0, n, block_size, dtype=np.int64)
    # block-start deltas absolute for independent decode
    deltas[block_starts] = doc_ids[block_starts].astype(np.uint64)
    nb = block_starts.size
    block_ends = np.minimum(block_starts + block_size, n)

    # per-value byte length to derive per-block byte offsets
    def _byte_offs(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        blob = encode_varint(vals)
        lens = np.ones(n, dtype=np.int64)
        tmp = vals.copy()
        tmp >>= _SEVEN
        while np.any(tmp):
            lens[tmp > 0] += 1
            tmp >>= _SEVEN
        ends = np.cumsum(lens)
        starts_b = ends - lens
        return blob, starts_b[block_starts].astype(np.int32)

    doc_blob, doc_offs = _byte_offs(deltas)
    tf_blob, tf_offs = _byte_offs(tfs.astype(np.uint64))

    max_tf = np.maximum.reduceat(tfs, block_starts).astype(np.int32)
    min_dl = np.minimum.reduceat(doc_lens, block_starts).astype(np.int32)
    last_doc = doc_ids[block_ends - 1].astype(np.int64)
    return EncodedPostings(
        df=n,
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        block_last_doc=last_doc,
        block_max_tf=max_tf,
        block_min_dl=min_dl,
        block_doc_offs=doc_offs.astype(np.int32),
        block_tf_offs=tf_offs.astype(np.int32),
    )


def _varint_byte_lens(vals: np.ndarray) -> np.ndarray:
    return varint_byte_lens(vals)


def encode_segment_table(
    p_terms: np.ndarray,
    p_docs: np.ndarray,
    p_tfs: np.ndarray,
    p_dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
):
    """Vectorized whole-partition segment encode: postings sorted by
    (term, doc_id) -> per-term segment-row arrays with NO per-term Python
    loop. One varint pass over the concatenated delta stream; per-term blobs
    are offset slices of the shared buffer (Arrow BinaryArray from offsets).

    Returns a dict of pyarrow arrays matching stages.build.SEGMENT_SCHEMA
    (minus 'term', returned separately as the unique term array).
    """
    import pyarrow as pa

    n = p_docs.size
    assert n > 0
    # term boundaries (p_terms sorted)
    tb = np.flatnonzero(np.concatenate(([True], p_terms[1:] != p_terms[:-1])))
    te = np.append(tb[1:], n)
    nterms = tb.size
    # block structure derived from per-term dfs on nblocks-sized arrays
    # (~n/block_size elements) — no n-sized arange/cumsum/repeat passes
    df = te - tb
    nb_t = -(-df // block_size)                        # ceil(df / block_size)
    cum_nb = np.zeros(nterms + 1, dtype=np.int64)
    np.cumsum(nb_t, out=cum_nb[1:])
    nblocks = int(cum_nb[-1])
    term_of_block = np.repeat(np.arange(nterms, dtype=np.int64), nb_t)
    within = np.arange(nblocks, dtype=np.int64) - cum_nb[term_of_block]
    block_starts = tb[term_of_block] + within * block_size
    block_ends = np.minimum(block_starts + block_size, te[term_of_block])

    # deltas: doc - prev doc within term; absolute at block starts. Narrowest
    # width that fits (uint32 for docmap-position streams — the merge is
    # DRAM-bound, 8-byte intermediates for 4-byte data were ~half its traffic)
    ddt = np.uint32 if p_docs.dtype.itemsize <= 4 or int(p_docs.max()) < (1 << 31) else np.uint64
    deltas = np.empty(n, dtype=ddt)
    # cross-term diffs may be negative: every term start is a block start, so
    # they are overwritten by the absolute value before encoding (the wrap in
    # the narrow dtype is never observed)
    deltas[1:] = (p_docs[1:] - p_docs[:-1]).astype(ddt)
    deltas[block_starts] = p_docs[block_starts].astype(ddt)

    doc_blob_all, doc_lens_b = encode_varint_with_lens(deltas)
    assert int(doc_lens_b.sum(dtype=np.int64)) < 2**31, (
        "partition blob exceeds 2GB — lower docs per partition"
    )
    doc_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(doc_lens_b, out=doc_off[1:])

    tf_blob_all, tf_lens_b = encode_varint_with_lens(p_tfs)
    assert int(tf_lens_b.sum(dtype=np.int64)) < 2**31, (
        "partition blob exceeds 2GB — lower docs per partition"
    )
    tf_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(tf_lens_b, out=tf_off[1:])

    # per-term binary slices as Arrow BinaryArray built from offset buffers
    def _bin_from_offsets(blob: bytes, global_off: np.ndarray) -> pa.Array:
        offs = global_off[np.append(tb, n)]
        off_buf = pa.py_buffer(np.ascontiguousarray(offs, dtype=np.int32).tobytes())
        return pa.BinaryArray.from_buffers(
            pa.binary(), nterms, [None, off_buf, pa.py_buffer(blob)]
        )

    doc_blob_arr = _bin_from_offsets(doc_blob_all, doc_off)
    tf_blob_arr = _bin_from_offsets(tf_blob_all, tf_off)

    # per-block metadata (vectorized reduceat over global block starts)
    bl_last = p_docs[block_ends - 1].astype(np.int64)
    bl_maxtf = np.maximum.reduceat(p_tfs, block_starts).astype(np.int32)
    bl_mindl = np.minimum.reduceat(p_dls, block_starts).astype(np.int32)
    bl_doffs = (doc_off[block_starts] - doc_off[tb][term_of_block]).astype(np.int32)
    bl_toffs = (tf_off[block_starts] - tf_off[tb][term_of_block]).astype(np.int32)

    # per-term list offsets into the block arrays = the block-count cumsum
    list_off = cum_nb.astype(np.int32)

    def _list_arr(values: np.ndarray, typ) -> pa.Array:
        return pa.ListArray.from_arrays(pa.array(list_off), pa.array(values, type=typ))

    return {
        "df": pa.array((te - tb).astype(np.int32), type=pa.int32()),
        "doc_blob": doc_blob_arr,
        "tf_blob": tf_blob_arr,
        "block_last_doc": _list_arr(bl_last, pa.int64()),
        "block_max_tf": _list_arr(bl_maxtf, pa.int32()),
        "block_min_dl": _list_arr(bl_mindl, pa.int32()),
        "block_doc_offs": _list_arr(bl_doffs, pa.int32()),
        "block_tf_offs": _list_arr(bl_toffs, pa.int32()),
    }, tb, te


def decode_segment_postings(
    doc_blob_col, tf_blob_col, df_col, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode EVERY term of a segment at once — the bulk-decode dual of
    encode_segment_table (one varint pass over the column's shared values
    buffer, block-absolute reconstruction via cumsum; no per-term Python).

    Returns (term_row int64 per posting, doc positions int64, tfs int64),
    postings in segment row order (term-major, position-ascending within
    term). Used by compaction/merge paths that re-encode whole segments.
    """
    import pyarrow as pa

    dfs = np.asarray(df_col.to_numpy(zero_copy_only=False), dtype=np.int64)
    n = int(dfs.sum())
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    term_of = np.repeat(np.arange(dfs.size, dtype=np.int64), dfs)

    def _col_bytes(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        vals = arr.buffers()[2]
        buf = np.frombuffer(vals, dtype=np.uint8) if vals is not None else np.empty(0, np.uint8)
        return buf[offs[0]: offs[-1]]

    deltas = decode_varint(_col_bytes(doc_blob_col))
    tfs = decode_varint(_col_bytes(tf_blob_col))
    assert deltas.size == n and tfs.size == n, "blob/df mismatch"

    # block structure from dfs (same derivation as encode_segment_table)
    tb = np.zeros(dfs.size, dtype=np.int64)
    np.cumsum(dfs[:-1], out=tb[1:])
    te = tb + dfs
    nb_t = -(-dfs // block_size)
    cum_nb = np.zeros(dfs.size + 1, dtype=np.int64)
    np.cumsum(nb_t, out=cum_nb[1:])
    term_of_block = np.repeat(np.arange(dfs.size, dtype=np.int64), nb_t)
    within = np.arange(int(cum_nb[-1]), dtype=np.int64) - cum_nb[term_of_block]
    block_starts = tb[term_of_block] + within * block_size
    block_ends = np.minimum(block_starts + block_size, te[term_of_block])

    # positions: deltas[block_start] is absolute; cumsum with per-block rebase
    C = np.cumsum(deltas.astype(np.int64))
    base = C[block_starts] - deltas[block_starts].astype(np.int64)
    vals = C - np.repeat(base, block_ends - block_starts)
    return term_of, vals, tfs.astype(np.int64)


def decode_postings(
    doc_blob: bytes,
    tf_blob: bytes,
    block_last_doc: np.ndarray,
    block_doc_offs: np.ndarray | None = None,
    block_tf_offs: np.ndarray | None = None,
    block_mask: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (optionally a subset of blocks of) a posting list.

    Returns (doc_ids int64, tfs int64). With `block_mask` (bool per block),
    only selected blocks' byte ranges are decoded — block-max skipping.
    """
    if block_mask is not None and not block_mask.all():
        assert block_doc_offs is not None and block_tf_offs is not None
        sel = np.flatnonzero(block_mask)
        if sel.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        doc_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []
        nb = len(block_last_doc)
        d_ends = np.append(block_doc_offs[1:], len(doc_blob))
        t_ends = np.append(block_tf_offs[1:], len(tf_blob))
        for bidx in sel:
            deltas = decode_varint(doc_blob[block_doc_offs[bidx]: d_ends[bidx]])
            doc_parts.append(np.cumsum(deltas.astype(np.int64)))
            tf_parts.append(
                decode_varint(tf_blob[block_tf_offs[bidx]: t_ends[bidx]]).astype(np.int64)
            )
        return np.concatenate(doc_parts), np.concatenate(tf_parts)

    deltas = decode_varint(doc_blob).astype(np.int64)
    n = deltas.size
    tfs = decode_varint(tf_blob).astype(np.int64)
    # fix up block-start absolutes: convert back to true deltas, then cumsum
    nb = len(block_last_doc)
    if nb > 1:
        starts = np.arange(0, n, block_size, dtype=np.int64)[1:nb]
        prev_last = np.asarray(block_last_doc, dtype=np.int64)[: starts.size]
        deltas[starts] = deltas[starts] - prev_last
    doc_ids = np.cumsum(deltas)
    return doc_ids, tfs
