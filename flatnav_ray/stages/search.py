"""Query serving — shard searcher actor pool + top-k merge.

Graft of the reference's search path
(/root/reference/python-bindings/src/flatnav/bindings.cpp:161-228 `searchImpl`,
/root/reference/include/flatnav/index/Index.h:387-409 `search`, 606-659
`beamSearch`): a loaded, read-mostly index served by a pool of workers.

* `ShardSearcher` is a callable CLASS used with
  `map_batches(cls, concurrency=N)` — segments load once per (actor,
  partition) in a cache (`Index.h:442-479` loadIndex -> warm actors, S7) and
  are reused across query batches.
* Exact scoring (`method="taat"`) is the brute-force term-at-a-time baseline.
* `method="maxscore"` adds block-max pruning: terms are split into
  essential / non-essential by score upper bound against the running top-k
  threshold, and non-essential posting blocks that cannot contain a candidate
  are never decoded — the grafted form of flatnav's pruning + visited-set
  machinery (`Index.h:714-763` selectNeighbors, VisitedSetPool.h). Both
  methods return identical (rank-identity) results; tests assert it.
* Per-query instrumentation (docs_scored, blocks_decoded) grafts the
  reference's distance-computation counters (`Index.h:83-84,689-691`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import QueryConfig
from ..functions.bm25 import SCORERS, idf as idf_fn, topk_select
from ..functions.codec import decode_postings
from ..functions.tokenize import tokenize_py
from .build import docmap_path, segment_path


@dataclass
class QueryPlan:
    """Tokenized queries + global stats, broadcast (ray.put) to every shard —
    the small side never reshuffles (SURVEY.md §2.4 J3 broadcast pattern)."""

    query_ids: np.ndarray          # (Q,) int64
    query_terms: list[list[tuple[str, int]]]  # per query: [(term, qtf)]
    term_idf: dict[str, float]     # global idf per distinct query term
    term_df: dict[str, int]
    n_docs: int
    avgdl: float
    k: int


def make_query_plan(
    queries: pa.Table, term_df: dict[str, int], n_docs: int, avgdl: float, k: int
) -> QueryPlan:
    """Tokenize the query table (same analyzer as build — SURVEY.md M5) and
    pre-compute idf. Terms within a query are sorted lexicographically: the
    fixed accumulation order that pins float summation (§7 'hard parts' #1)."""
    qids = queries.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = queries.column("text").to_pylist()
    qterms: list[list[tuple[str, int]]] = []
    distinct: set[str] = set()
    for t in texts:
        toks = tokenize_py(t)
        counts: dict[str, int] = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        terms = sorted(counts.items())
        qterms.append(terms)
        distinct.update(counts)
    tdf = {t: int(term_df.get(t, 0)) for t in distinct}
    tidf = {t: float(idf_fn(df, n_docs)) if df > 0 else 0.0 for t, df in tdf.items()}
    return QueryPlan(
        query_ids=qids,
        query_terms=qterms,
        term_idf=tidf,
        term_df=tdf,
        n_docs=n_docs,
        avgdl=avgdl,
        k=k,
    )


class _Segment:
    """Decoded-on-demand view of one partition's posting lists."""

    __slots__ = ("term_row", "table", "docmap_ids", "docmap_lens", "docmap_urls")

    def __init__(self, index_dir: str, partition: int, terms_filter: list[str] | None = None):
        seg_file = segment_path(index_dir, partition)
        filters = None
        if terms_filter is not None:
            filters = [("term", "in", terms_filter)]
        self.table = pq.read_table(seg_file, filters=filters)
        self.term_row = {
            t: i for i, t in enumerate(self.table.column("term").to_pylist())
        }
        dm = pq.read_table(docmap_path(index_dir, partition))
        self.docmap_ids = dm.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self.docmap_lens = dm.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
        self.docmap_urls = dm.column("url")

    def postings(self, term: str):
        i = self.term_row.get(term)
        if i is None:
            return None
        row = self.table.slice(i, 1)
        return {
            "df": int(row.column("df")[0].as_py()),
            "doc_blob": row.column("doc_blob")[0].as_py(),
            "tf_blob": row.column("tf_blob")[0].as_py(),
            "block_last_doc": np.asarray(row.column("block_last_doc")[0].as_py(), dtype=np.int64),
            "block_max_tf": np.asarray(row.column("block_max_tf")[0].as_py(), dtype=np.int64),
            "block_min_dl": np.asarray(row.column("block_min_dl")[0].as_py(), dtype=np.int64),
            "block_doc_offs": np.asarray(row.column("block_doc_offs")[0].as_py(), dtype=np.int32),
            "block_tf_offs": np.asarray(row.column("block_tf_offs")[0].as_py(), dtype=np.int32),
        }


class ShardSearcher:
    """Actor-pool stage: batches of {partition} rows -> partial top-k rows.

    Constructor args arrive via fn_constructor_kwargs; the query plan is an
    object-store ref (`ray.put` once, zero-copy read in every actor)."""

    def __init__(self, index_dir: str, plan_ref, query_cfg: QueryConfig, block_size: int):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        self.cfg = query_cfg
        self.block_size = block_size
        self.scorer = SCORERS[query_cfg.scorer]
        self._seg_cache: dict[int, _Segment] = {}
        # every distinct term any query needs — segment reads filter to these
        self._needed_terms = sorted(self.plan.term_idf.keys())

    def _segment(self, partition: int) -> _Segment:
        seg = self._seg_cache.get(partition)
        if seg is None:
            seg = _Segment(self.index_dir, partition, self._needed_terms)
            if len(self._seg_cache) >= 64:  # bounded actor memory (arena-sizing analog)
                self._seg_cache.pop(next(iter(self._seg_cache)))
            self._seg_cache[partition] = seg
        return seg

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_qid, out_doc, out_url, out_score = [], [], [], []
        out_scored, out_blocks = [], []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            seg = self._segment(part)
            for qi in range(len(self.plan.query_ids)):
                qid = int(self.plan.query_ids[qi])
                if self.cfg.method == "maxscore":
                    docs, scores, n_scored, n_blocks = self._score_maxscore(seg, qi)
                else:
                    docs, scores, n_scored, n_blocks = self._score_taat(seg, qi)
                for d, s in zip(docs, scores):
                    pos = np.searchsorted(seg.docmap_ids, d)
                    out_qid.append(qid)
                    out_doc.append(int(d))
                    out_url.append(seg.docmap_urls[pos].as_py())
                    out_score.append(float(s))
                    out_scored.append(n_scored)
                    out_blocks.append(n_blocks)
        return pa.table(
            {
                "query_id": pa.array(out_qid, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "url": pa.array(out_url, type=pa.string()),
                "score": pa.array(out_score, type=pa.float64()),
                "docs_scored": pa.array(out_scored, type=pa.int64()),
                "blocks_decoded": pa.array(out_blocks, type=pa.int64()),
            }
        )

    # ---- scoring methods (both exact; tests assert identical output) ----

    def _term_postings(self, seg: _Segment, terms):
        out = []
        for term, qtf in terms:
            w = self.plan.term_idf.get(term, 0.0)
            if w <= 0.0:
                continue
            p = seg.postings(term)
            if p is None:
                continue
            out.append((term, qtf, p))
        return out

    def _score_taat(self, seg: _Segment, qi: int):
        """Exact term-at-a-time: decode every posting of every query term,
        accumulate per doc in fixed (lexicographic term) order."""
        plan = self.plan
        tps = self._term_postings(seg, plan.query_terms[qi])
        if not tps:
            e = np.empty(0)
            return e.astype(np.int64), e, 0, 0
        acc: dict[int, float] = {}
        n_blocks = 0
        all_docs = {}
        # accumulate via local dense index over this partition's docmap
        scores = np.zeros(seg.docmap_ids.size, dtype=np.float64)
        touched = np.zeros(seg.docmap_ids.size, dtype=bool)
        for term, qtf, p in tps:
            doc_ids, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], p["block_last_doc"],
                block_size=self.block_size,
            )
            n_blocks += len(p["block_last_doc"])
            pos = np.searchsorted(seg.docmap_ids, doc_ids)
            dls = seg.docmap_lens[pos]
            df = self.plan.term_df[term]
            contrib = qtf * self.scorer.term_scores(tfs, dls, df, plan.n_docs, plan.avgdl)
            scores[pos] += contrib
            touched[pos] = True
        cand = np.flatnonzero(touched)
        docs, sc = topk_select(scores[cand], seg.docmap_ids[cand], plan.k)
        return docs, sc, int(cand.size), n_blocks

    def _score_maxscore(self, seg: _Segment, qi: int):
        """Exact top-k with MaxScore term partitioning + block-max skipping.

        1. Order terms by score upper bound (desc). Bootstrap a threshold by
           fully scoring the highest-bound term.
        2. Essential prefix = smallest prefix whose suffix-bound-sum clears the
           threshold; candidates = union of essential terms' postings (docs
           appearing only in non-essential terms are provably below threshold).
        3. For non-essential terms decode ONLY blocks containing a candidate
           (block_last_doc intersect) — block-max skipping.
        """
        plan = self.plan
        tps = self._term_postings(seg, plan.query_terms[qi])
        if not tps:
            e = np.empty(0)
            return e.astype(np.int64), e, 0, 0
        n_blocks = 0
        bounds = []
        for term, qtf, p in tps:
            df = plan.term_df[term]
            ub = qtf * float(
                self.scorer.block_bound(
                    p["block_max_tf"], p["block_min_dl"], df, plan.n_docs, plan.avgdl
                ).max()
            )
            bounds.append(ub)
        order = sorted(range(len(tps)), key=lambda i: (-bounds[i], tps[i][0]))
        tps = [tps[i] for i in order]
        bounds = [bounds[i] for i in order]
        suffix = np.cumsum(np.array(bounds, dtype=np.float64)[::-1])[::-1]

        k = plan.k
        # decode + score term by term, tracking which are fully decoded
        decoded: list[tuple[np.ndarray, np.ndarray]] = []
        # bootstrap: first term fully decoded
        scores = np.zeros(seg.docmap_ids.size, dtype=np.float64)
        touched = np.zeros(seg.docmap_ids.size, dtype=bool)
        threshold = -np.inf
        essential_end = len(tps)
        for i, (term, qtf, p) in enumerate(tps):
            # can we stop treating remaining terms as essential?
            if i > 0 and threshold > -np.inf and suffix[i] <= threshold:
                essential_end = i
                break
            doc_ids, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], p["block_last_doc"], block_size=self.block_size
            )
            n_blocks += len(p["block_last_doc"])
            pos = np.searchsorted(seg.docmap_ids, doc_ids)
            dls = seg.docmap_lens[pos]
            df = plan.term_df[term]
            scores[pos] += qtf * self.scorer.term_scores(tfs, dls, df, plan.n_docs, plan.avgdl)
            touched[pos] = True
            decoded.append((pos, tfs))
            # partial scores are lower bounds on final scores -> valid threshold
            part_scores = scores[touched]
            if part_scores.size >= k:
                threshold = np.partition(part_scores, part_scores.size - k)[part_scores.size - k]

        cand = np.flatnonzero(touched)
        # non-essential terms: score only candidate docs, skipping blocks
        for term, qtf, p in tps[essential_end:]:
            cand_ids = seg.docmap_ids[cand]
            last = p["block_last_doc"]
            # block b covers (block_last_doc[b-1], block_last_doc[b]]
            bidx = np.searchsorted(last, cand_ids)
            bidx = bidx[bidx < last.size]
            mask = np.zeros(last.size, dtype=bool)
            mask[np.unique(bidx)] = True
            doc_ids, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], last,
                p["block_doc_offs"], p["block_tf_offs"], mask,
                block_size=self.block_size,
            )
            n_blocks += int(mask.sum())
            if doc_ids.size == 0:
                continue
            # keep only postings for candidate docs
            pos_in_cand = np.searchsorted(cand_ids, doc_ids)
            valid = (pos_in_cand < cand_ids.size)
            valid[valid] = cand_ids[pos_in_cand[valid]] == doc_ids[valid]
            doc_ids, tfs = doc_ids[valid], tfs[valid]
            pos = np.searchsorted(seg.docmap_ids, doc_ids)
            dls = seg.docmap_lens[pos]
            df = plan.term_df[term]
            scores[pos] += qtf * self.scorer.term_scores(tfs, dls, df, plan.n_docs, plan.avgdl)

        docs, sc = topk_select(scores[cand], seg.docmap_ids[cand], k)
        # recompute exact scores for winners in fixed term order to pin float
        # accumulation identically to TAAT (rank-identity contract)
        if docs.size:
            sc = self._rescore_exact(seg, qi, docs)
            docs2, sc = topk_select(sc, docs, k)
            docs = docs2
        return docs, sc, int(cand.size), n_blocks

    def _rescore_exact(self, seg: _Segment, qi: int, docs: np.ndarray) -> np.ndarray:
        """Re-accumulate scores for a small doc set in lexicographic term order
        (identical float op order as TAAT)."""
        plan = self.plan
        out = np.zeros(docs.size, dtype=np.float64)
        for term, qtf, p in self._term_postings(seg, plan.query_terms[qi]):
            last = p["block_last_doc"]
            bidx = np.searchsorted(last, docs)
            bidx = bidx[bidx < last.size]
            mask = np.zeros(last.size, dtype=bool)
            mask[np.unique(bidx)] = True
            doc_ids, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], last,
                p["block_doc_offs"], p["block_tf_offs"], mask,
                block_size=self.block_size,
            )
            if doc_ids.size == 0:
                continue
            pos_in = np.searchsorted(doc_ids, docs)
            valid = pos_in < doc_ids.size
            valid[valid] = doc_ids[pos_in[valid]] == docs[valid]
            pos = np.searchsorted(seg.docmap_ids, docs[valid])
            dls = seg.docmap_lens[pos]
            df = plan.term_df[term]
            out[valid] += qtf * self.scorer.term_scores(
                tfs[pos_in[valid]], dls, df, plan.n_docs, plan.avgdl
            )
        return out


def merge_topk(group: pa.Table, k: int) -> pa.Table:
    """Final per-query merge of shard partials (SURVEY.md A2): sort
    (score desc, doc_id asc), truncate to k, assign ranks. The partial/final
    aggregation graft of the reference's heap drain (Index.h:393-408)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    top = group.take(order[:k])
    n = len(top)
    return pa.table(
        {
            "query_id": top.column("query_id"),
            "rank": pa.array(np.arange(n, dtype=np.int32)),
            "doc_id": top.column("doc_id"),
            "url": top.column("url"),
            "score": top.column("score"),
        }
    )
