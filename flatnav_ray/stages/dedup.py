"""Deduplication family for training-data pipelines.

Extends the engine's url-exact dedup (stages/build.py dedup_latest, SURVEY.md
D4) with content-level exact and near-duplicate detection:

* exact_text_dedup      — hash-partitioned exact dedup (first doc_id wins)
* minhash_lsh_clusters  — shingle -> MinHash -> banded LSH -> union-find
* simhash_clusters      — 64-bit SimHash, banded buckets, Hamming verify
* ngram_jaccard_pairs   — exact word-n-gram Jaccard over candidate pairs
* embedding_near_dups   — cosine near-dup over an embedding column

Scale notes (100 TB): every operator pre-aggregates inside map_batches
(per-batch signatures) so only small (key, doc_id) pairs shuffle; candidate
pairs are verified distributedly; the final union-find runs on the driver over
*pairs only* (|pairs| << |docs|). For corpus-scale clustering the same pair
stream feeds an iterative distributed connected-components loop — pairs are
produced by bounded per-bucket emit (cap + deterministic order) so a hot
bucket cannot explode the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashes import minhash_signature, simhash64, splitmix64, stable_hash64
from ..functions.textstats import token_shingles
from ..functions.tokenize import explode_tokens


def exact_text_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup by full text content: keep the smallest doc_id per distinct
    text. Shuffles only (text_hash, doc_id) — the text itself never moves."""

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = stable_hash64(texts).astype(np.int64) & np.int64(2**63 - 1)
        return pa.table(
            {
                "text_hash": pa.array(h, type=pa.int64()),
                id_col: batch.column(id_col),
            }
        )

    sigs = ds.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)
    kept = sigs.groupby("text_hash").min(id_col)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["text_hash", id_col])

    return kept.map_batches(_rename, batch_format="pyarrow")


def semi_join_keep(
    ds: ray.data.Dataset, keep_ids, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Filter a corpus to a kept-id set via broadcast semi-join: the (small)
    id set ships once via ray.put; each batch filters with a vectorized
    membership test — no shuffle of the corpus (SURVEY.md §4
    broadcast-small-side). Composes exact/near-dup results back onto the
    corpus: `semi_join_keep(pages, exact_text_dedup(pages))`."""
    import ray as _ray

    if isinstance(keep_ids, ray.data.Dataset):
        keep_ids = pa.concat_tables(keep_ids.iter_batches(batch_format="pyarrow")).column(id_col)
    arr = np.sort(np.asarray(keep_ids, dtype=np.int64))
    ref = _ray.put(arr)

    def _filter(batch: pa.Table) -> pa.Table:
        keep = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keep, ids)
        ok = pos < keep.size
        ok[ok] = keep[pos[ok]] == ids[ok]
        return batch.filter(pa.array(ok))

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller id is the representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _pairs_from_buckets(bucket_tbl: pa.Table, id_col: str, cap: int = 64) -> list[tuple[int, int]]:
    """Candidate pairs per bucket: each member pairs with the bucket's minimum
    doc_id (star pattern — linear, not quadratic; hot buckets capped)."""
    pairs: list[tuple[int, int]] = []
    bt = bucket_tbl.sort_by([("bucket", "ascending"), (id_col, "ascending")])
    buckets = bt.column("bucket").to_numpy(zero_copy_only=False)
    ids = bt.column(id_col).to_numpy(zero_copy_only=False)
    start = 0
    for i in range(1, len(buckets) + 1):
        if i == len(buckets) or buckets[i] != buckets[start]:
            members = ids[start:i][:cap]
            root = int(members[0])
            pairs.extend((root, int(m)) for m in members[1:])
            start = i
    return pairs


def minhash_lsh_clusters(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> pa.Table:
    """MinHash + banded LSH near-dup clustering.

    Pipeline: map_batches computes per-doc signatures (stateless, vectorized),
    explodes to (band, bucket, doc_id); a small groupby-style pair extraction
    + union-find assigns cluster ids. Returns (doc_id, cluster_id); docs with
    no near-dup get cluster_id = doc_id."""
    rows_per_band = num_perm // bands

    def _bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parents, shingles = token_shingles(texts, n=shingle_n)
        out_band, out_bucket, out_id = [], [], []
        for i in range(len(ids)):
            sh = shingles[parents == i]
            sig = minhash_signature(sh, num_perm)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bucket = int(
                    splitmix64(np.bitwise_xor.reduce(chunk) ^ np.uint64(b + 1))[()]
                    & np.uint64(2**62 - 1)
                )
                out_band.append(b)
                out_bucket.append(bucket)
                out_id.append(int(ids[i]))
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
            }
        )

    bucket_tbl = pa.concat_tables(
        ds.map_batches(_bands, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    # combine band into the bucket key so bands don't collide
    b = bucket_tbl.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    bk = bucket_tbl.column("bucket").to_numpy(zero_copy_only=False)
    key = (bk * 131) + b
    bucket_tbl = pa.table(
        {"bucket": pa.array(key, type=pa.int64()), id_col: bucket_tbl.column(id_col)}
    )
    pairs = _pairs_from_buckets(bucket_tbl, id_col)
    comp = _union_find(pairs)
    all_ids = sorted(
        set(bucket_tbl.column(id_col).to_pylist())
    )
    cluster = [comp.get(i, i) for i in all_ids]
    return pa.table(
        {
            id_col: pa.array(all_ids, type=pa.int64()),
            "cluster_id": pa.array(cluster, type=pa.int64()),
        }
    )


def simhash_clusters(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    hamming_threshold: int = 3,
) -> pa.Table:
    """SimHash near-dup: 64-bit signature, 4×16-bit band buckets (any doc pair
    within Hamming distance 3 shares at least one band), Hamming verify."""

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parents, toks = explode_tokens(texts)
        th = stable_hash64(toks.to_pylist())
        sigs = []
        for i in range(len(ids)):
            sigs.append(simhash64(th[parents == i]))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).astype(np.int64), type=pa.int64()),
            }
        )

    sig_tbl = pa.concat_tables(
        ds.map_batches(_sig, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    ids = sig_tbl.column(id_col).to_numpy(zero_copy_only=False)
    sigs = sig_tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    sig_of = dict(zip(ids.tolist(), sigs.tolist()))
    rows_b, rows_id = [], []
    for band in range(4):
        chunk = ((sigs >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
        rows_b.append(chunk * 4 + band)
        rows_id.append(ids)
    bucket_tbl = pa.table(
        {
            "bucket": pa.array(np.concatenate(rows_b), type=pa.int64()),
            id_col: pa.array(np.concatenate(rows_id), type=pa.int64()),
        }
    )
    cand = _pairs_from_buckets(bucket_tbl, id_col, cap=256)
    verified = [
        (a, b)
        for a, b in cand
        if bin(sig_of[a] ^ sig_of[b]).count("1") <= hamming_threshold
    ]
    comp = _union_find(verified)
    out_ids = sorted(sig_of)
    return pa.table(
        {
            id_col: pa.array(out_ids, type=pa.int64()),
            "cluster_id": pa.array([comp.get(i, i) for i in out_ids], type=pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> pa.Table:
    """Exact word-n-gram Jaccard similarity for all doc pairs sharing >=1
    shingle, thresholded. Implemented as: explode distinct shingles ->
    self-join via groupby(shingle) -> pair co-occurrence counts ->
    |A∩B| / (|A|+|B|-|A∩B|). DuckDB-checkable (oracle_sql)."""

    def _shingles(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parents, sh = token_shingles(texts, n=n)
        return pa.table(
            {
                id_col: pa.array(ids[parents], type=pa.int64()),
                "shingle": pa.array(sh.astype(np.int64), type=pa.int64()),
            }
        )

    tbl = pa.concat_tables(
        ds.map_batches(_shingles, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    # distinct (doc, shingle)
    tbl = tbl.group_by([id_col, "shingle"]).aggregate([])
    sizes = tbl.group_by(id_col).aggregate([("shingle", "count")])
    size_of = dict(
        zip(sizes.column(id_col).to_pylist(), sizes.column("shingle_count").to_pylist())
    )
    srt = tbl.sort_by([("shingle", "ascending"), (id_col, "ascending")])
    sh = srt.column("shingle").to_numpy(zero_copy_only=False)
    ids = srt.column(id_col).to_numpy(zero_copy_only=False)
    from collections import Counter

    co: Counter = Counter()
    start = 0
    for i in range(1, len(sh) + 1):
        if i == len(sh) or sh[i] != sh[start]:
            members = ids[start:i]
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    co[(int(members[a]), int(members[b]))] += 1
            start = i
    rows = []
    for (a, b), inter in co.items():
        union = size_of[a] + size_of[b] - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            rows.append((a, b, j))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


def embedding_near_dups(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> pa.Table:
    """Embedding-cosine near-dup pairs (doc_a < doc_b, cosine >= threshold).

    Batch-vs-broadcast matmul: each batch is compared against the (small)
    normalized matrix broadcast via ray.put — at larger scales replace the
    broadcast with LSH bucketing (random hyperplanes, see stages/knn.py)."""
    import ray

    full = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    ids = full.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(full.column(vec_col).to_pylist()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    mat_ref = ray.put((ids, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bmat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        bmat = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = bids[ai] < all_ids[bi]
        return pa.table(
            {
                "doc_a": pa.array(bids[ai][keep], type=pa.int64()),
                "doc_b": pa.array(all_ids[bi][keep], type=pa.int64()),
                "cosine": pa.array(sims[ai, bi][keep], type=pa.float64()),
            }
        )

    batches = list(
        ds.map_batches(_pairs, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    if not batches:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    out = pa.concat_tables(batches)
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
