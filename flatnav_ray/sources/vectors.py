"""S2/S3 — packed dense-vector readers (.bvecs/.ivecs/.fvecs, .fbin/.u8bin/
.i8bin) as a range-splitting Ray Data datasource.

Graft of the reference's numpy loaders
(/root/reference/experiments/data_loader.py:7-47 xvecs,
data_loader.py:128-219 BinaryDatasetLoader): same byte layouts, same
range-sliced access — but instead of one driver-side memmap, the file is
split into row ranges and each Ray read task `np.fromfile`s only its byte
range, so a 1-billion-vector SIFT1B/BigANN file streams through the object
store block by block (the capability S2/S3 exist for).

Layouts:
  xvecs  — repeated records [int32 dim][dim x elem]; elem = uint8 (.bvecs),
           int32 (.ivecs), float32 (.fvecs). dim is validated per task.
  bin    — header [int32 num][int32 dim], then packed rows; elem = float32
           (.fbin), uint8 (.u8bin), int8 (.i8bin).

Output schema: (vec_id: int64, embedding: fixed_size_list<elem, dim>) —
vec_id is the global row index (the reference's implicit iota label,
bindings.cpp:86-99), and the fixed-size list is zero-copy into numpy for the
downstream ANN/dedup stages (stages/knn._to_matrix).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

_XVECS_ELEM = {"bvecs": np.uint8, "ivecs": np.int32, "fvecs": np.float32}
_BIN_ELEM = {"fbin": np.float32, "u8bin": np.uint8, "i8bin": np.int8}
_PA_TYPE = {
    np.uint8: pa.uint8(),
    np.int8: pa.int8(),
    np.int32: pa.int32(),
    np.float32: pa.float32(),
}
# ~target rows per read task so one block stays well under the object-store
# block budget even at SIFT1B dims (128 x 4B x 256k = 128 MiB ceiling)
_DEFAULT_ROWS_PER_TASK = 1 << 18


def _kind_of(path: str) -> str:
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    if ext not in _XVECS_ELEM and ext not in _BIN_ELEM:
        raise ValueError(f"unsupported packed-vector extension: {path}")
    return ext


class PackedVectorDatasource(Datasource):
    """Row-range-splitting datasource over one packed vector file."""

    def __init__(self, path: str, kind: str | None = None):
        self._path = path
        kind = kind or _kind_of(path)
        file_bytes = os.path.getsize(path)
        if kind in _XVECS_ELEM:
            elem = _XVECS_ELEM[kind]
            with open(path, "rb") as f:
                head = np.fromfile(f, dtype=np.int32, count=1)
            dim = int(head[0]) if head.size else 0
            rec_bytes = 4 + dim * np.dtype(elem).itemsize
            n = file_bytes // rec_bytes if rec_bytes else 0
            data_offset = 0
            stride_elems = None  # records carry their own dim prefix
        else:
            elem = _BIN_ELEM[kind]
            with open(path, "rb") as f:
                head = np.fromfile(f, dtype=np.int32, count=2)
            n, dim = (int(head[0]), int(head[1])) if head.size == 2 else (0, 0)
            rec_bytes = dim * np.dtype(elem).itemsize
            data_offset = 8
            stride_elems = dim
        self._kind, self._elem, self._dim, self._n = kind, elem, dim, n
        self._rec_bytes, self._data_offset = rec_bytes, data_offset
        self._stride_elems = stride_elems

    @property
    def num_rows(self) -> int:
        return self._n

    @property
    def dim(self) -> int:
        return self._dim

    def schema(self) -> pa.Schema:
        return pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(_PA_TYPE[self._elem], self._dim)),
            ]
        )

    def estimate_inmemory_data_size(self) -> int:
        return self._n * (8 + self._dim * np.dtype(self._elem).itemsize)

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        n, dim = self._n, self._dim
        rows_per = max(1, min(_DEFAULT_ROWS_PER_TASK, -(-n // max(1, parallelism))))
        path, elem, kind = self._path, self._elem, self._kind
        rec_bytes, data_offset = self._rec_bytes, self._data_offset
        schema = self.schema()
        tasks: list[ReadTask] = []
        for start in range(0, n, rows_per):
            end = min(start + rows_per, n)

            def _read(start=start, end=end):
                m = end - start
                with open(path, "rb") as f:
                    f.seek(data_offset + start * rec_bytes)
                    if kind in _XVECS_ELEM:
                        raw = np.fromfile(f, dtype=np.uint8, count=m * rec_bytes)
                        raw = raw.reshape(m, rec_bytes)
                        dims = raw[:, :4].copy().view(np.int32).ravel()
                        if not (dims == dim).all():
                            raise ValueError(
                                f"{path}: corrupt record dim at rows "
                                f"[{start},{end}) — expected {dim}"
                            )
                        mat = np.ascontiguousarray(raw[:, 4:]).view(elem)
                    else:
                        mat = np.fromfile(f, dtype=elem, count=m * dim).reshape(m, dim)
                vals = pa.array(mat.reshape(-1))
                emb = pa.FixedSizeListArray.from_arrays(vals, dim)
                yield pa.table(
                    {
                        "vec_id": pa.array(
                            np.arange(start, end, dtype=np.int64), type=pa.int64()
                        ),
                        "embedding": emb,
                    }
                )

            meta = BlockMetadata(
                num_rows=end - start,
                size_bytes=(end - start) * rec_bytes,
                input_files=[path],
                exec_stats=None,
            )
            tasks.append(ReadTask(_read, meta, schema=schema))
        return tasks


def read_vectors(
    path: str, kind: str | None = None, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Packed vector file -> Dataset(vec_id, embedding). `kind` defaults to
    the file extension (bvecs/ivecs/fvecs/fbin/u8bin/i8bin)."""
    src = PackedVectorDatasource(path, kind)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_datasource(src, **kwargs)


def vectors_to_parquet(
    path: str, out_dir: str, kind: str | None = None
) -> ray.data.Dataset:
    """S5 converter analog (convert_bigann_datasets.py): packed file ->
    partitioned Parquet in the embeddings-table layout (embedding cast to
    list<float32> so every downstream stage reads one schema)."""
    ds = read_vectors(path, kind)

    def _cast(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        target = pa.list_(pa.float32(), emb.type.list_size)
        return batch.set_column(
            batch.schema.get_field_index("embedding"), "embedding", emb.cast(target)
        )

    ds = ds.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(out_dir)
    return ray.data.read_parquet(out_dir)
