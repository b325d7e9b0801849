"""Query serving — shard searcher state, actor pool, and top-k merge.

Graft of the reference's search path
(/root/reference/python-bindings/src/flatnav/bindings.cpp:161-228 `searchImpl`,
/root/reference/include/flatnav/index/Index.h:387-409 `search`, 606-659
`beamSearch`): a loaded, read-mostly index served by a pool of workers.

Two serving modes share one scoring core (`_ShardState`):

* Dataset mode: `map_batches(ShardSearcher, concurrency=N)` over a Dataset of
  partition ids — one-shot pipelines, fits Ray Data streaming execution.
* Server mode: `SearchSession` — persistent `@ray.remote` shard actors that
  load segments once and serve many query batches (the reference's
  load-once/serve-many lifecycle, Index.h:442-479 loadIndex; bench + any
  interactive use). Queries broadcast via ray.put; partials merge driver-side
  when small, via groupby(query_id) when not.

Scoring: per-term BM25 contributions are query-independent (idf, tf, doc_len
are all fixed at index time), so each decoded term is scored ONCE and cached;
a query batch then costs one fused multiply-add per (query, term) —
the vectorized-kernel analog of the reference's SIMD distance dispatch.
`method="maxscore"` adds block-max pruning for long posting lists; both
methods are exact and return identical results (tests assert it).

Per-query instrumentation (docs_scored, blocks_decoded) grafts the reference's
distance-computation counters (`Index.h:83-84,689-691`).
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
    query_terms: list[list[tuple[str, int]]]  # per query: [(term, qtf)] sorted
    term_idf: dict[str, float]     # global idf per distinct query term
    term_df: dict[str, int]
    n_docs: int
    avgdl: float
    k: int
    # ordered token sequence per query (duplicates kept) — what phrase
    # adjacency matches against (method="phrase"); None on old pickles
    query_seqs: list[list[str]] | None = None
    # negation (Lucene NOT / -term): per query, terms whose matching docs are
    # EXCLUDED from the candidate set (scores of survivors unchanged). Built
    # from an optional `neg_text` queries column; None = no negation.
    query_neg_terms: list[list[str]] | None = None
    # boolean MUST (Lucene +term): per query, terms a doc MUST contain to
    # qualify; must terms also score (they are folded into query_terms).
    # Built from an optional `must_text` queries column.
    query_must_terms: list[list[str]] | None = None
    # cursor pagination (search_after): per query, an optional
    # (after_score, after_doc) cursor — only results strictly AFTER it in
    # (score desc, doc_id asc) order qualify. Shards filter BEFORE their
    # top-k, so a deep page ships O(k) rows per shard (offset ships
    # O(offset+k) — the cursor is the 100-TB deep-paging path). Built from
    # optional `after_score`/`after_doc` queries columns.
    query_after: list[tuple[float, int] | None] | None = None
    # synonym groups (Lucene SynonymQuery semantics): per query, a sorted
    # list of (members, qtf) scoring UNITS. A group scores as ONE pseudo-term
    # over the UNION of its members' postings: per-doc tf = sum of member
    # tfs, df = max of member global dfs — BM25's tf saturation applies once
    # to the pooled tf, which is what distinguishes a synonym group from a
    # plain disjunction (bm25_topk_multi). None = no synonym mode.
    query_syn_groups: list[list[tuple[tuple[str, ...], int]]] | None = None
    # per-term boosts (Lucene term^boost): multiplies that term's score
    # contribution AFTER tf saturation, exactly Lucene's query-time boost.
    # Keyed on literal index terms (under fuzzy, on the EXPANDED term).
    # None/missing term = 1.0. Default scoring methods only.
    query_boosts: dict[str, float] | None = None
    # collection frequency per distinct query term + total corpus token count
    # — populated ONLY for scorers with needs_cf (LM Dirichlet): cf is loaded
    # lazily for the plan's terms via a pruned per-partition read
    # (load_term_cf), never by a full-vocabulary scan.
    term_cf: dict[str, int] | None = None
    total_len: int | None = None


def load_term_cf(
    index_dir: str, partitions: list[int], terms: list[str], block_size: int
) -> dict[str, int]:
    """Global collection frequency for a SMALL term set (the query plan's
    distinct terms): one Ray task per partition reads only those terms'
    segment rows (parquet row filter), decodes their tf blobs, and returns
    per-term sums; the driver adds the dicts. O(|terms| × partitions), never
    O(vocabulary)."""
    import ray

    terms = sorted(set(terms))
    if not terms:
        return {}

    def _one(index_dir: str, p: int, block_size: int, terms: list[str]) -> dict:
        st = _ShardState(index_dir, p, block_size, terms)
        out: dict[str, int] = {}
        for t in terms:
            row = st._postings_row(t)
            if row is None:
                continue
            _, tfs = decode_postings(
                row["doc_blob"], row["tf_blob"], row["block_last_doc"],
                block_size=block_size,
            )
            out[t] = int(tfs.sum())
        return out

    task = ray.remote(num_cpus=1)(_one)
    parts = ray.get(
        [task.remote(index_dir, int(p), block_size, terms) for p in partitions]
    )
    cf: dict[str, int] = {t: 0 for t in terms}
    for d in parts:
        for t, v in d.items():
            cf[t] += v
    return cf


def make_query_plan(
    queries: pa.Table, term_df: dict[str, int], n_docs: int, avgdl: float, k: int,
    expansions: dict[str, set[str]] | None = None,
    synonyms: dict[str, tuple[str, ...]] | None = None,
    boosts: dict[str, float] | None = None,
    pre_tokens: list[list[str]] | None = None,
) -> QueryPlan:
    """Tokenize the query table (same analyzer as build — SURVEY.md M5) and
    pre-compute idf. Terms within a query are sorted lexicographically: the
    fixed accumulation order that pins float summation (§7 'hard parts' #1).

    `expansions` (fuzzy matching): maps each query token to the dictionary
    terms it matches (levenshtein <= 1, functions/fuzzy.py); each match
    scores with its OWN df/idf and the doc's score is the ordered sum over
    matched terms — Lucene's fuzzy-as-disjunction rewrite. A token with no
    dictionary neighbour contributes nothing.

    `synonyms` (SynonymQuery): maps a query token to its synonym terms; the
    token and its synonyms form ONE scoring group (see QueryPlan
    .query_syn_groups). Each token's group is {token} | synonyms[token] —
    the analyzer's synonym-graph analog, applied query-side only (the index
    stays literal). Mutually exclusive with fuzzy expansions."""
    qids = queries.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = queries.column("text").to_pylist()
    # boolean MUST: required terms score like should terms but also gate the
    # candidate set (Lucene BooleanQuery MUST + SHOULD)
    must_texts = (
        queries.column("must_text").to_pylist()
        if "must_text" in queries.column_names
        else None
    )
    if synonyms is not None and expansions is not None:
        raise ValueError("synonyms cannot combine with fuzzy expansions")
    if boosts is not None and synonyms is not None:
        # a boost keyed on one member of a pooled group is ambiguous
        raise ValueError("boosts cannot combine with synonyms")
    if synonyms is not None and must_texts is not None:
        # must terms score through the PLAIN term path (folded into
        # query_terms), which the group scorer replaces — combining would
        # silently drop their score contribution
        raise ValueError("synonyms cannot combine with must_text queries")
    qmusts: list[list[str]] | None = [] if must_texts is not None else None
    qterms: list[list[tuple[str, int]]] = []
    qgroups: list[list[tuple[tuple[str, ...], int]]] | None = (
        [] if synonyms is not None else None
    )
    qseqs: list[list[str]] = []
    distinct: set[str] = set()
    for i, t in enumerate(texts):
        # pre_tokens: the session already tokenized every text once to
        # collect df-lookup terms — reuse instead of re-running the
        # analyzer over the whole batch on the serial driver path
        toks = pre_tokens[i] if pre_tokens is not None else tokenize_py(t)
        counts: dict[str, int] = {}
        if qgroups is not None:
            # each token expands to one GROUP {token} | synonyms[token];
            # duplicate tokens raise the group's qtf, not its tf pooling
            gcounts: dict[tuple[str, ...], int] = {}
            for tok in toks:
                grp = tuple(sorted({tok, *synonyms.get(tok, ())}))
                gcounts[grp] = gcounts.get(grp, 0) + 1
            qgroups.append(sorted(gcounts.items()))
            for grp, c in gcounts.items():
                for m in grp:  # flattened members: df loading + introspection
                    counts[m] = counts.get(m, 0) + c
        else:
            for tok in toks:
                if expansions is not None:
                    for e in expansions.get(tok, ()):
                        counts[e] = counts.get(e, 0) + 1
                else:
                    counts[tok] = counts.get(tok, 0) + 1
        if must_texts is not None:
            mtoks = tokenize_py(must_texts[i] or "")
            for tok in mtoks:  # must terms score too (no fuzzy on must)
                counts[tok] = counts.get(tok, 0) + 1
            qmusts.append(sorted(set(mtoks)))
        qterms.append(sorted(counts.items()))
        qseqs.append(toks)
        distinct.update(counts)
    # negation: tokenize the optional neg_text column with the SAME analyzer;
    # neg terms join the distinct set so shard states load their postings
    # (the exclusion needs positions, and a term that is positive in one
    # query and negative in another must score with its true df)
    qnegs: list[list[str]] | None = None
    if "neg_text" in queries.column_names:
        qnegs = []
        for t in queries.column("neg_text").to_pylist():
            toks = sorted(set(tokenize_py(t or "")))
            qnegs.append(toks)
            distinct.update(toks)
    # cursor pagination: optional per-query (after_score, after_doc) columns
    qafter: list[tuple[float, int] | None] | None = None
    if "after_score" in queries.column_names or "after_doc" in queries.column_names:
        if not (
            "after_score" in queries.column_names
            and "after_doc" in queries.column_names
        ):
            raise ValueError(
                "search_after needs BOTH after_score and after_doc columns"
            )
        sc = queries.column("after_score").to_pylist()
        dc = queries.column("after_doc").to_pylist()
        qafter = []
        for s, d in zip(sc, dc):
            if s is None and d is None:
                qafter.append(None)  # no cursor: page 1 for this query
            elif s is None or d is None:
                raise ValueError(
                    "search_after cursor needs BOTH after_score and "
                    "after_doc set (or both null)"
                )
            else:
                qafter.append((float(s), int(d)))
    tdf = {t: int(term_df.get(t, 0)) for t in distinct}
    tidf = {t: float(idf_fn(df, n_docs)) if df > 0 else 0.0 for t, df in tdf.items()}
    return QueryPlan(
        query_ids=qids, query_terms=qterms, term_idf=tidf, term_df=tdf,
        n_docs=n_docs, avgdl=avgdl, k=k, query_seqs=qseqs, query_neg_terms=qnegs,
        query_after=qafter, query_must_terms=qmusts, query_syn_groups=qgroups,
        query_boosts=(dict(boosts) if boosts else None),
    )


class _ShardState:
    """One partition's loaded segment + docmap + per-term score cache.

    `dead_ids` (sorted int64) marks documents shadowed by a NEWER generation
    in stacked serving (StackedSearchSession): their postings are dropped at
    decode time, so scores, candidate sets and live-df counts see only live
    documents — bit-identical to serving the fully compacted index."""

    def __init__(self, index_dir: str, partition: int, block_size: int,
                 terms_filter: list[str] | None = None,
                 dead_ids: np.ndarray | None = None):
        self.block_size = block_size
        self.index_dir = index_dir
        self.partition = partition
        self._terms_filter = terms_filter
        # positional sidecar (phrase path) — loaded lazily on first phrase query
        self._pos_row: dict[str, int] | None = None
        filters = [("term", "in", terms_filter)] if terms_filter is not None else None
        t = pq.read_table(segment_path(index_dir, partition), filters=filters).combine_chunks()
        self._terms_list = t.column("term").to_pylist()  # sorted (merge writes
        # segment rows in sorted global-vocab order) — bisect range scans
        self.term_row = {term: i for i, term in enumerate(self._terms_list)}
        # decode the columnar layout into flat numpy views ONCE at load — the
        # per-term hot path then does O(1) slicing, no Arrow scalar conversion
        self._df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)

        def _bin_views(col):
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            vals = arr.buffers()[2]
            return offs, (np.frombuffer(vals, dtype=np.uint8) if vals is not None else np.empty(0, np.uint8))

        self._doc_offs, self._doc_vals = _bin_views(t.column("doc_blob"))
        self._tf_offs, self._tf_vals = _bin_views(t.column("tf_blob"))

        def _list_views(col, dtype):
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            return (
                np.asarray(arr.offsets),
                np.asarray(arr.values).astype(dtype),
            )

        self._bl_off, self._bl_last = _list_views(t.column("block_last_doc"), np.int64)
        _, self._bl_maxtf = _list_views(t.column("block_max_tf"), np.int64)
        _, self._bl_mindl = _list_views(t.column("block_min_dl"), np.int64)
        _, self._bl_doffs = _list_views(t.column("block_doc_offs"), np.int32)
        _, self._bl_toffs = _list_views(t.column("block_tf_offs"), np.int32)

        dm = pq.read_table(docmap_path(index_dir, partition))
        self.docmap_ids = dm.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self.docmap_lens = dm.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
        self.docmap_urls = dm.column("url")
        self.docmap_langs = dm.column("lang")
        self._facet_cache: dict[str, tuple[np.ndarray, list]] = {}
        # stacked-serving shadow mask over docmap positions (None = all live)
        self._dead_pos: np.ndarray | None = None
        if dead_ids is not None and dead_ids.size:
            pos = np.searchsorted(self.docmap_ids, dead_ids)
            valid = pos < self.docmap_ids.size
            valid[valid] = self.docmap_ids[pos[valid]] == dead_ids[valid]
            if valid.any():
                dead = np.zeros(self.docmap_ids.size, dtype=bool)
                dead[pos[valid]] = True
                self._dead_pos = dead
        # caches (query-independent once (scorer, stats) fixed)
        self._contrib: dict[str, tuple[np.ndarray, np.ndarray, int] | None] = {}
        # synonym-group cache: members tuple -> (positions, contrib, blocks)
        self._gcontrib: dict[tuple[str, ...], tuple[np.ndarray, np.ndarray, int] | None] = {}
        self._live_df: dict[str, int] = {}
        self._stats_key: tuple | None = None
        # reusable scratch (the VisitedSetPool analog, SURVEY.md T3)
        self._scores = np.zeros(self.docmap_ids.size, dtype=np.float64)
        self._touched = np.zeros(self.docmap_ids.size, dtype=bool)
        # candidate-union scratch, SEPARATE from _touched (which marks
        # negation exclusions within the same query body)
        self._cand_mask = np.zeros(self.docmap_ids.size, dtype=bool)

    def _union_positions(self, pos_lists: list[np.ndarray]) -> np.ndarray:
        """Ascending union of docmap-position lists via the candidate
        scratch mask: O(total + n_docs) scatter+scan instead of
        np.unique's O(total log total) sort — the sort was 40%+ of batched
        shard scoring. Output values/order identical to
        np.unique(np.concatenate(pos_lists))."""
        if len(pos_lists) == 1:
            return pos_lists[0]
        total = sum(p.size for p in pos_lists)
        if total < (self.docmap_ids.size >> 6):
            # sparse regime: sorting a handful of positions beats paying the
            # O(n_docs) mask scan+reset per call (per-query loops on a large
            # shard would otherwise scan the whole docmap-sized mask for a
            # union of a few dozen rows)
            return np.unique(np.concatenate(pos_lists))
        mask = self._cand_mask
        for p in pos_lists:
            mask[p] = True
        cand = np.flatnonzero(mask)
        mask[cand] = False
        return cand

    def _postings_row(self, term: str):
        i = self.term_row.get(term)
        if i is None:
            return None
        s, e = self._bl_off[i], self._bl_off[i + 1]
        return {
            "df": int(self._df[i]),
            "doc_blob": self._doc_vals[self._doc_offs[i]: self._doc_offs[i + 1]],
            "tf_blob": self._tf_vals[self._tf_offs[i]: self._tf_offs[i + 1]],
            "block_last_doc": self._bl_last[s:e],
            "block_max_tf": self._bl_maxtf[s:e],
            "block_min_dl": self._bl_mindl[s:e],
            "block_doc_offs": self._bl_doffs[s:e],
            "block_tf_offs": self._bl_toffs[s:e],
        }

    def term_contrib(self, term: str, plan: QueryPlan, scorer):
        """(local_positions, per-posting score contribution, n_blocks) for one
        term — decoded and scored once, reused by every query in every batch."""
        key = (plan.n_docs, plan.avgdl, scorer.name)
        if key != self._stats_key:
            self._contrib.clear()
            self._stats_key = key
        hit = self._contrib.get(term)
        if hit is not None:
            return hit
        p = self._postings_row(term)
        if p is None:
            self._contrib[term] = None
            return None
        # blobs store docmap positions: direct indexing, no searchsorted
        pos, tfs = decode_postings(
            p["doc_blob"], p["tf_blob"], p["block_last_doc"], block_size=self.block_size
        )
        if self._dead_pos is not None:
            keep = ~self._dead_pos[pos]
            pos, tfs = pos[keep], tfs[keep]
        dls = self.docmap_lens[pos]
        contrib = scorer.term_scores(
            tfs, dls, plan.term_df[term], plan.n_docs, plan.avgdl,
            term=term, plan=plan,
        )
        out = (pos, contrib, len(p["block_last_doc"]))
        if len(self._contrib) > 100_000:  # bounded actor memory (arena-sizing analog)
            self._contrib.clear()
        self._contrib[term] = out
        return out

    def group_contrib(self, members: tuple[str, ...], plan: QueryPlan, scorer):
        """(local_positions, contribution, n_blocks) for ONE synonym group
        (Lucene SynonymQuery): union of member postings, per-doc tf = sum of
        member tfs, df = max of member GLOBAL dfs — BM25 saturation applies
        once to the pooled tf. Decoded + scored once, cached per group."""
        if getattr(scorer, "needs_cf", False):
            # pooled-group cf semantics are ambiguous (sum vs max of member
            # cfs); keep the cf-based similarity on the plain term path
            raise ValueError(f"synonyms are unsupported with scorer {scorer.name!r}")
        key = (plan.n_docs, plan.avgdl, scorer.name)
        if key != self._stats_key:
            self._contrib.clear()
            self._gcontrib.clear()
            self._stats_key = key
        hit = self._gcontrib.get(members)
        if hit is not None or members in self._gcontrib:
            return hit
        df_g = max((plan.term_df.get(m, 0) for m in members), default=0)
        parts: list[tuple[np.ndarray, np.ndarray]] = []
        n_blocks = 0
        if df_g > 0:
            for m in members:
                p = self._postings_row(m)
                if p is None:
                    continue
                pos, tfs = decode_postings(
                    p["doc_blob"], p["tf_blob"], p["block_last_doc"],
                    block_size=self.block_size,
                )
                if self._dead_pos is not None:
                    keep = ~self._dead_pos[pos]
                    pos, tfs = pos[keep], tfs[keep]
                if pos.size:
                    parts.append((pos, tfs))
                n_blocks += len(p["block_last_doc"])
        if not parts:
            out = None
        else:
            if len(parts) == 1:
                upos, utf = parts[0]
            else:
                allpos = np.concatenate([p for p, _ in parts])
                alltf = np.concatenate([t for _, t in parts])
                upos, inv = np.unique(allpos, return_inverse=True)
                # tf sums are small ints: float64 bincount is exact
                utf = np.bincount(inv, weights=alltf).astype(np.int64)
            dls = self.docmap_lens[upos]
            contrib = scorer.term_scores(utf, dls, df_g, plan.n_docs, plan.avgdl)
            out = (upos, contrib, n_blocks)
        if len(self._gcontrib) > 100_000:
            self._gcontrib.clear()
        self._gcontrib[members] = out
        return out

    def live_counts(self) -> tuple[int, int]:
        """(n_live_docs, sum_live_doc_len) — the shard's contribution to the
        stacked session's global n_docs / avgdl."""
        if self._dead_pos is None:
            return int(self.docmap_ids.size), int(self.docmap_lens.sum())
        live = ~self._dead_pos
        return int(live.sum()), int(self.docmap_lens[live].sum())

    def live_term_df(self, term: str) -> int:
        """Live-document df for one term (postings minus shadowed docs) —
        exact global df across a generation stack sums these. Decoded once
        per term and cached; no mask -> the stored df, no decode."""
        i = self.term_row.get(term)
        if i is None:
            return 0
        if self._dead_pos is None:
            return int(self._df[i])
        hit = self._live_df.get(term)
        if hit is not None:
            return hit
        p = self._postings_row(term)
        pos, _ = decode_postings(
            p["doc_blob"], p["tf_blob"], p["block_last_doc"], block_size=self.block_size
        )
        n = int((~self._dead_pos[pos]).sum())
        self._live_df[term] = n
        return n

    def live_term_doc_ids(self, term: str) -> np.ndarray:
        """Sorted doc_ids of LIVE documents containing `term` — the match
        set primitive behind delete_by_query (pipelines/ingest.py): postings
        decoded once, shadow/tombstone mask applied, ids resolved through
        the docmap."""
        p = self._postings_row(term)
        if p is None:
            return np.empty(0, dtype=np.int64)
        pos, _ = decode_postings(
            p["doc_blob"], p["tf_blob"], p["block_last_doc"], block_size=self.block_size
        )
        if self._dead_pos is not None:
            pos = pos[~self._dead_pos[pos]]
        return self.docmap_ids[pos]

    def _lang_mask(self, lang: str) -> np.ndarray:
        """Boolean docmap-row mask for one lang (filtered search) — computed
        once per shard per lang, cached in the facet cache's sibling slot."""
        hit = self._facet_cache.get(f"__mask:{lang}")
        if hit is not None:
            return hit[0]
        import pyarrow.compute as pc

        col = self.docmap_langs
        mask = pc.equal(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, lang
        ).to_numpy(zero_copy_only=False)
        self._facet_cache[f"__mask:{lang}"] = (mask, [])
        return mask

    def _len_mask(self, lo: int | None, hi: int | None) -> np.ndarray:
        """Boolean docmap-row mask for a doc_len range (numeric filtered
        search) — computed once per shard per (lo, hi), cached."""
        key = f"__lenmask:{lo}:{hi}"
        hit = self._facet_cache.get(key)
        if hit is not None:
            return hit[0]
        mask = np.ones(self.docmap_lens.size, dtype=bool)
        if lo is not None:
            mask &= self.docmap_lens >= lo
        if hi is not None:
            mask &= self.docmap_lens <= hi
        # bound the cache: unlike lang masks (#langs keys) the (lo, hi)
        # key space is caller-controlled — evict oldest range masks so a
        # long-lived serving actor can't grow without limit
        lenkeys = [k for k in self._facet_cache if k.startswith("__lenmask:")]
        if len(lenkeys) >= 32:
            del self._facet_cache[lenkeys[0]]
        self._facet_cache[key] = (mask, [])
        return mask

    def search_batch(self, plan: QueryPlan, scorer, method: str = "maxscore",
                     approx_factor: float = 1.0, msm: int = 0,
                     slop: int = 0, flt: str | None = None,
                     sort_by: str | None = None,
                     flt_len: tuple[int | None, int | None] | None = None) -> pa.Table:
        """Score every query in the plan against this shard; return partial
        top-k rows. Accumulation order per query: lexicographic terms (pinned
        float order).

        method="taat"/"maxscore": cached term-at-a-time (contributions decoded
        + scored once per term, reused across the whole batch) — optimal for
        batched serving. method="wand": block-max pruned evaluation that
        decodes only blocks that can affect the top-k (no cache) — the scale
        path for long posting lists / ad-hoc queries. method="and":
        conjunctive posting-list intersection (docs must match EVERY query
        term; SURVEY.md §2.7 — the grafted set-intersect). All exact."""
        q_out: list[np.ndarray] = []
        d_out: list[np.ndarray] = []
        s_out: list[np.ndarray] = []
        n_out: list[tuple[int, int, int]] = []  # (n_results, n_cand, n_blocks)
        scores = self._scores
        # self-heal shared scratch: if a previous query on this long-lived
        # actor raised mid-body (after neg-marking / score accumulation but
        # before its reset), restore the all-False / all-zeros invariant so
        # THIS query doesn't silently exclude or double-count docs
        dirty_neg = getattr(self, "_neg_dirty", None)
        if dirty_neg:
            for np_ in dirty_neg:
                self._touched[np_] = False
            self._neg_dirty = None
        dirty_sc = getattr(self, "_scores_dirty", None)
        if dirty_sc is not None:
            scores[dirty_sc] = 0.0
            self._scores_dirty = None
        if flt is not None and method not in ("taat", "maxscore"):
            raise ValueError(
                f"filter_lang is supported on the default scoring methods "
                f"(taat/maxscore), not method={method!r}"
            )
        if flt_len is not None and method not in ("taat", "maxscore"):
            raise ValueError(
                f"filter_len is supported on the default scoring methods "
                f"(taat/maxscore), not method={method!r}"
            )
        neg_lists = getattr(plan, "query_neg_terms", None)
        if (
            neg_lists is not None
            and any(neg_lists)
            and (method not in ("taat", "maxscore") or msm > 0)
        ):
            raise ValueError(
                "exclude terms (neg_text) are supported on the default "
                f"scoring methods (taat/maxscore), not method={method!r}/msm={msm}"
            )
        after_list = getattr(plan, "query_after", None)
        if (
            after_list is not None
            and any(a is not None for a in after_list)
            and (method not in ("taat", "maxscore") or msm > 0)
        ):
            raise ValueError(
                "search_after cursors are supported on the default scoring "
                f"methods (taat/maxscore), not method={method!r}/msm={msm}"
            )
        must_lists = getattr(plan, "query_must_terms", None)
        if (
            must_lists is not None
            and any(must_lists)
            and (method not in ("taat", "maxscore") or msm > 0)
        ):
            raise ValueError(
                "must terms (must_text) are supported on the default scoring "
                f"methods (taat/maxscore), not method={method!r}/msm={msm}"
            )
        syn_lists = getattr(plan, "query_syn_groups", None)
        if (
            syn_lists is not None
            and (method not in ("taat", "maxscore") or msm > 0 or sort_by is not None)
        ):
            raise ValueError(
                "synonym groups are supported on the default scoring methods "
                f"(taat/maxscore), not method={method!r}/msm={msm}/sort_by={sort_by!r}"
            )
        boosts = getattr(plan, "query_boosts", None)
        if boosts and (method not in ("taat", "maxscore") or msm > 0):
            raise ValueError(
                "term boosts are supported on the default scoring methods "
                f"(taat/maxscore), not method={method!r}/msm={msm}"
            )
        sort_vals: np.ndarray | None = None
        if sort_by is not None:
            if method not in ("taat", "maxscore") or msm > 0:
                raise ValueError(
                    "sort_by is supported on the default scoring methods "
                    f"(taat/maxscore), not method={method!r}/msm={msm}"
                )
            if sort_by != "doc_len":
                raise ValueError(f"unsupported sort_by attribute {sort_by!r}")
            sort_vals = getattr(self, "_len_f", None)
            if sort_vals is None:  # ints <= 2^53: exact as doubles
                sort_vals = self._len_f = self.docmap_lens.astype(np.float64)
        fmask = self._lang_mask(flt) if flt is not None else None
        if flt_len is not None:  # numeric range filter composes by AND
            lm = self._len_mask(flt_len[0], flt_len[1])
            fmask = lm if fmask is None else (fmask & lm)
        for qi in range(len(plan.query_ids)):
            qid = int(plan.query_ids[qi])
            if method == "wand":
                docs, ssc, n_cand, n_blocks = self.search_one_pruned(
                    plan, qi, scorer, approx_factor
                )
            elif method == "and":
                docs, ssc, n_cand, n_blocks = self.search_one_and(plan, qi, scorer)
            elif method == "phrase":
                docs, ssc, n_cand, n_blocks = self.search_one_phrase(plan, qi, scorer, slop)
            elif msm > 0:
                docs, ssc, n_cand, n_blocks = self.search_one_msm(plan, qi, scorer, msm)
            else:
                entries = []
                n_blocks = 0
                if syn_lists is not None:
                    # synonym mode: one entry per GROUP (pooled tf, max df);
                    # group order is the sorted members tuple — the pinned
                    # accumulation order, same discipline as plain terms
                    for members, qtf in syn_lists[qi]:
                        hit = self.group_contrib(tuple(members), plan, scorer)
                        if hit is None:
                            continue
                        entries.append((qtf, hit[0], hit[1]))
                        n_blocks += hit[2]
                else:
                    for term, qtf in plan.query_terms[qi]:
                        if plan.term_idf.get(term, 0.0) <= 0.0:
                            continue
                        hit = self.term_contrib(term, plan, scorer)
                        if hit is None:
                            continue
                        # Lucene term^boost: scales the term's contribution
                        # after tf saturation (weight rides the existing
                        # qtf multiply — float-exact, one multiply per term)
                        w = qtf * boosts[term] if boosts and term in boosts else qtf
                        entries.append((w, hit[0], hit[1]))
                        n_blocks += hit[2]
                if not entries:
                    continue
                # negation: mark excluded docmap rows in the shared touched
                # scratch (O(df_neg) set + reset); survivors' scores are
                # untouched — the NOT operator filters candidates only
                nparts: list[np.ndarray] = []
                for nt in (neg_lists[qi] if neg_lists is not None else ()):
                    nhit = self.term_contrib(nt, plan, scorer)
                    if nhit is not None and nhit[0].size:
                        nparts.append(nhit[0])
                        self._touched[nhit[0]] = True
                if nparts:
                    self._neg_dirty = nparts
                excl = self._touched if nparts else None
                aft = after_list[qi] if after_list is not None else None
                musts = must_lists[qi] if must_lists is not None else ()
                if len(entries) == 1 and not musts:
                    qtf, pos, contrib = entries[0]
                    if fmask is not None:  # slices: the cached arrays stay intact
                        sel = fmask[pos]
                        pos, contrib = pos[sel], contrib[sel]
                    if excl is not None:
                        sel = ~excl[pos]
                        pos, contrib = pos[sel], contrib[sel]
                    sc = contrib if qtf == 1 else qtf * contrib
                    if sort_vals is not None:  # rank by attribute, not score
                        sc = sort_vals[pos]
                    ids = self.docmap_ids[pos]
                    if aft is not None:  # strictly after the cursor in
                        # (score desc, doc_id asc) — exact float compare is
                        # safe: scores are a pure function of (term, tf, dl)
                        av, ad = aft
                        m = (sc < av) | ((sc == av) & (ids > ad))
                        sc, ids = sc[m], ids[m]
                    docs, ssc = topk_select(sc, ids, plan.k)
                    n_cand = pos.size
                else:
                    cand = self._union_positions([e[1] for e in entries])
                    scores[cand] = 0.0
                    self._scores_dirty = cand
                    for qtf, pos, contrib in entries:
                        if qtf == 1:
                            scores[pos] += contrib
                        else:
                            scores[pos] += qtf * contrib
                    # boolean MUST: candidates restrict to docs containing
                    # EVERY must term (searchsorted intersection sweep, the
                    # method="and" machinery); must terms already scored above
                    if musts:
                        mpos: np.ndarray | None = None
                        ok = True
                        for mt in musts:
                            mhit = self.term_contrib(mt, plan, scorer)
                            if mhit is None:
                                ok = False
                                break
                            p = mhit[0]
                            if mpos is None:
                                mpos = p
                            elif mpos.size:
                                j = np.searchsorted(p, mpos)
                                v = j < p.size
                                v[v] = p[j[v]] == mpos[v]
                                mpos = mpos[v]
                        cand_sel = mpos if (ok and mpos is not None) else cand[:0]
                    else:
                        cand_sel = cand
                    # filtered search selects from masked candidates; the
                    # scratch reset below still covers EVERY touched row
                    if fmask is not None:
                        cand_sel = cand_sel[fmask[cand_sel]]
                    if excl is not None:
                        cand_sel = cand_sel[~excl[cand_sel]]
                    csc = (
                        sort_vals[cand_sel] if sort_vals is not None
                        else scores[cand_sel]
                    )
                    cids = self.docmap_ids[cand_sel]
                    if aft is not None:
                        av, ad = aft
                        m = (csc < av) | ((csc == av) & (cids > ad))
                        csc, cids = csc[m], cids[m]
                    docs, ssc = topk_select(csc, cids, plan.k)
                    scores[cand] = 0.0  # keep the shared scratch all-zeros
                    self._scores_dirty = None
                    n_cand = cand_sel.size
                for np_ in nparts:  # keep the shared scratch all-False
                    self._touched[np_] = False
                self._neg_dirty = None
            if not isinstance(docs, np.ndarray) or docs.size == 0:
                continue
            q_out.append(np.full(docs.size, qid, dtype=np.int64))
            d_out.append(docs)
            s_out.append(ssc)
            n_out.append((docs.size, n_cand, n_blocks))
        if not d_out:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.float64()),
                    "docs_scored": pa.array([], type=pa.int64()),
                    "blocks_decoded": pa.array([], type=pa.int64()),
                }
            )
        all_docs = np.concatenate(d_out)
        url_pos = np.searchsorted(self.docmap_ids, all_docs)
        sizes = np.array([x[0] for x in n_out], dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(q_out), type=pa.int64()),
                "doc_id": pa.array(all_docs, type=pa.int64()),
                "url": self.docmap_urls.take(pa.array(url_pos)),
                "score": pa.array(np.concatenate(s_out), type=pa.float64()),
                "docs_scored": pa.array(
                    np.repeat(np.array([x[1] for x in n_out], dtype=np.int64), sizes)
                ),
                "blocks_decoded": pa.array(
                    np.repeat(np.array([x[2] for x in n_out], dtype=np.int64), sizes)
                ),
            }
        )


    # ---- conjunctive intersection path (method="and") ----

    def search_one_and(self, plan: QueryPlan, qi: int, scorer):
        """Conjunctive top-k: only documents containing EVERY query term
        qualify — the grafted posting-list intersection (SURVEY.md §2.7; the
        reference's only set op is the per-search visited set,
        VisitedSetPool.h:16-89, but an FT engine's AND mode is the classic
        sorted-list intersect).

        Postings are sorted docmap positions, so the intersection is a
        smallest-first searchsorted sweep (the vectorized form of a galloping
        merge: every probe of the larger list is a binary search). Scores for
        surviving docs re-accumulate in lexicographic term order — the exact
        float-op order of the TAAT path, so conjunctive scores are
        bit-identical to the same doc's disjunctive score."""
        empty = np.empty(0, dtype=np.int64)
        entries: list[tuple[int, np.ndarray, np.ndarray]] = []
        n_blocks = 0
        for term, qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                # a term absent from the whole corpus: no doc can match ALL
                return empty, empty.astype(np.float64), 0, 0
            hit = self.term_contrib(term, plan, scorer)
            if hit is None:
                # term absent from THIS shard: no conjunctive match here
                return empty, empty.astype(np.float64), 0, n_blocks
            entries.append((qtf, hit[0], hit[1]))
            n_blocks += hit[2]
        if not entries:
            return empty, empty.astype(np.float64), 0, 0
        # intersect smallest list first: each pass costs O(|isect| log df)
        order = sorted(range(len(entries)), key=lambda i: entries[i][1].size)
        isect = entries[order[0]][1]
        for i in order[1:]:
            if isect.size == 0:
                break
            pos = entries[i][1]
            j = np.searchsorted(pos, isect)
            valid = j < pos.size
            valid[valid] = pos[j[valid]] == isect[valid]
            isect = isect[valid]
        if isect.size == 0:
            return empty, empty.astype(np.float64), 0, n_blocks
        out = np.zeros(isect.size, dtype=np.float64)
        for qtf, pos, contrib in entries:  # lexicographic (plan order kept)
            idx = np.searchsorted(pos, isect)
            out += contrib[idx] if qtf == 1 else qtf * contrib[idx]
        docs, ssc = topk_select(out, self.docmap_ids[isect], plan.k)
        return docs, ssc, int(isect.size), n_blocks

    # ---- minimum_should_match path (msm > 0) ----

    def search_one_msm(self, plan: QueryPlan, qi: int, scorer, msm: int):
        """Threshold disjunction (Lucene minimum_should_match analog): a doc
        qualifies iff it contains >= msm DISTINCT query terms. msm == n_terms
        degenerates to conjunctive AND, msm == 1 to plain disjunction.

        Per-shard counting is exact because documents are hash-partitioned
        disjointly across shards: a doc's full term-match count is visible to
        exactly one shard. Candidate counts come from one np.unique over the
        concatenated per-term position lists (each term's postings hold a doc
        at most once, so multiplicity == matched-term count); survivors
        re-accumulate in the pinned lexicographic term order, so msm scores
        are bit-identical to the same doc's TAAT score."""
        empty = np.empty(0, dtype=np.int64)
        entries: list[tuple[int, np.ndarray, np.ndarray]] = []
        n_blocks = 0
        for term, qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                continue  # corpus-absent term can never match (lowers the
                # achievable count; it still counts toward n_terms semantics)
            hit = self.term_contrib(term, plan, scorer)
            if hit is None:
                continue  # absent from this shard: no local doc matches it
            entries.append((qtf, hit[0], hit[1]))
            n_blocks += hit[2]
        if len(entries) < msm:
            return empty, empty.astype(np.float64), 0, n_blocks
        cand, counts = np.unique(
            np.concatenate([e[1] for e in entries]), return_counts=True
        )
        keep = cand[counts >= msm]
        if keep.size == 0:
            return empty, empty.astype(np.float64), 0, n_blocks
        out = np.zeros(keep.size, dtype=np.float64)
        for qtf, pos, contrib in entries:  # lexicographic (plan order kept)
            j = np.searchsorted(pos, keep)
            valid = j < pos.size
            valid[valid] = pos[j[valid]] == keep[valid]
            sel = contrib[j[valid]]
            out[valid] += sel if qtf == 1 else qtf * sel
        docs, ssc = topk_select(out, self.docmap_ids[keep], plan.k)
        return docs, ssc, int(keep.size), n_blocks

    # ---- facet / hit counting over the match set (serving aggregations) ----

    def _facet_codes(self, facet: str) -> tuple[np.ndarray, list]:
        """(code per docmap row, dictionary values) for a docmap attribute —
        encoded once per shard, cached."""
        hit = self._facet_cache.get(facet)
        if hit is not None:
            return hit
        import pyarrow.compute as pc

        if facet.startswith("len:"):
            # numeric range facet (Lucene RangeFacetCounts / ES histogram
            # aggregation): bucket = doc_len // width, exact integers
            width = int(facet.split(":", 1)[1])
            if width <= 0:
                raise ValueError(f"invalid bucket width in facet {facet!r}")
            buckets = self.docmap_lens.astype(np.int64) // width
            vals_arr, codes = np.unique(buckets, return_inverse=True)
            out = (codes.astype(np.int64), [int(v) for v in vals_arr])
            self._facet_cache[facet] = out
            return out
        col = {"lang": self.docmap_langs}.get(facet)
        if col is None:
            raise ValueError(f"unknown facet {facet!r} (supported: lang, len:<width>)")
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = enc.dictionary.to_pylist()
        self._facet_cache[facet] = (codes, vals)
        return codes, vals

    def facet_counts(self, plan: QueryPlan, facet: str = "lang") -> pa.Table:
        """Per query: count MATCHING docs (union of the query terms' posting
        lists — the full disjunctive match set, not top-k) grouped by a
        docmap attribute. Exact across the cluster because shards partition
        documents disjointly: per-shard counts sum with no overlap.
        The faceted-search / aggregations surface of a fulltext engine."""
        scorer = SCORERS["bm25"]  # contrib cache reused; scores ignored
        codes, vals = self._facet_codes(facet)
        q_out: list[int] = []
        f_out: list[str] = []
        n_out: list[int] = []
        for qi in range(plan.query_ids.size):
            pos_lists = []
            for term, _qtf in plan.query_terms[qi]:
                if plan.term_idf.get(term, 0.0) <= 0.0:
                    continue
                hit = self.term_contrib(term, plan, scorer)
                if hit is not None:
                    pos_lists.append(hit[0])
            if not pos_lists:
                continue
            cand = self._union_positions(pos_lists)
            cnt = np.bincount(codes[cand], minlength=len(vals))
            for j in np.flatnonzero(cnt):
                q_out.append(int(plan.query_ids[qi]))
                f_out.append(vals[j])
                n_out.append(int(cnt[j]))
        numeric = facet.startswith("len:")
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                ("bucket" if numeric else facet): pa.array(
                    f_out, type=pa.int64() if numeric else pa.string()
                ),
                "n_docs": pa.array(n_out, type=pa.int64()),
            }
        )

    def match_stats(self, plan: QueryPlan) -> pa.Table:
        """Per query, exact INTEGER doc_len statistics over the FULL match
        set (the ES `stats` aggregation surface): (n_docs, dl_min, dl_max,
        dl_sum). Shards partition docs disjointly, so the cross-shard merge
        is sum / min / max / sum — all int64-exact, hash-checkable; the
        derived mean divides once at the very end (one IEEE division on
        exact integers, identical on both engines)."""
        scorer = SCORERS["bm25"]  # contrib cache reused; scores ignored
        q_out: list[int] = []
        n_out: list[int] = []
        mn_out: list[int] = []
        mx_out: list[int] = []
        sm_out: list[int] = []
        for qi in range(plan.query_ids.size):
            pos_lists = []
            for term, _qtf in plan.query_terms[qi]:
                if plan.term_idf.get(term, 0.0) <= 0.0:
                    continue
                hit = self.term_contrib(term, plan, scorer)
                if hit is not None:
                    pos_lists.append(hit[0])
            if not pos_lists:
                continue
            cand = self._union_positions(pos_lists)
            if cand.size == 0:
                continue
            dls = self.docmap_lens[cand]
            q_out.append(int(plan.query_ids[qi]))
            n_out.append(int(cand.size))
            mn_out.append(int(dls.min()))
            mx_out.append(int(dls.max()))
            sm_out.append(int(dls.sum()))
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                "n_docs": pa.array(n_out, type=pa.int64()),
                "dl_min": pa.array(mn_out, type=pa.int64()),
                "dl_max": pa.array(mx_out, type=pa.int64()),
                "dl_sum": pa.array(sm_out, type=pa.int64()),
            }
        )

    def match_dl_hist(self, plan: QueryPlan) -> pa.Table:
        """Per query, the (dl, count) histogram of the match set's doc
        lengths — integer partials that merge by SUM across shards and
        support EXACT quantiles at any scale (doc lengths are a small
        integer domain, so the histogram stays tiny no matter the corpus —
        the exact alternative to ES's t-digest percentiles)."""
        scorer = SCORERS["bm25"]
        q_out: list[np.ndarray] = []
        d_out: list[np.ndarray] = []
        n_out: list[np.ndarray] = []
        for qi in range(plan.query_ids.size):
            pos_lists = []
            for term, _qtf in plan.query_terms[qi]:
                if plan.term_idf.get(term, 0.0) <= 0.0:
                    continue
                hit = self.term_contrib(term, plan, scorer)
                if hit is not None:
                    pos_lists.append(hit[0])
            if not pos_lists:
                continue
            cand = self._union_positions(pos_lists)
            if cand.size == 0:
                continue
            vals, cnts = np.unique(self.docmap_lens[cand], return_counts=True)
            q_out.append(np.full(vals.size, int(plan.query_ids[qi]), dtype=np.int64))
            d_out.append(vals.astype(np.int64))
            n_out.append(cnts.astype(np.int64))
        if not q_out:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(q_out), type=pa.int64()),
                "dl": pa.array(np.concatenate(d_out), type=pa.int64()),
                "n": pa.array(np.concatenate(n_out), type=pa.int64()),
            }
        )

    def sig_term_counts(self, plan: QueryPlan) -> pa.Table:
        """Per query, for EVERY dictionary term of this shard: the number of
        match-set docs containing it (the ES `significant_terms` foreground
        counts). Integer partials; shards partition docs disjointly so the
        cross-shard merge is a plain sum. Requires the state loaded WITHOUT
        a terms filter (full dictionary). The full-dictionary scan per shard
        is the documented cost of exact significant_terms — ES bounds it by
        sampling instead; exactness is what makes this SQL-checkable."""
        from ..functions.codec import decode_postings

        dec: dict[str, np.ndarray] = {}

        def _pos(term: str) -> np.ndarray:
            p = dec.get(term)
            if p is None:
                row = self._postings_row(term)
                if row is None:
                    p = np.empty(0, dtype=np.int64)
                else:
                    p, _ = decode_postings(
                        row["doc_blob"], row["tf_blob"],
                        np.asarray(row["block_last_doc"], dtype=np.int64),
                        block_size=self.block_size,
                    )
                    if self._dead_pos is not None:  # tombstone/shadow mask,
                        # same live-doc discipline as live_term_doc_ids
                        p = p[~self._dead_pos[p]]
                dec[term] = p
            return p

        q_out: list[int] = []
        t_out: list[str] = []
        m_out: list[int] = []
        for qi in range(plan.query_ids.size):
            pos_lists = [
                _pos(term)
                for term, _qtf in plan.query_terms[qi]
                if plan.term_idf.get(term, 0.0) > 0.0
            ]
            pos_lists = [p for p in pos_lists if p.size]
            if not pos_lists:
                continue
            cand = self._union_positions(pos_lists)
            qid = int(plan.query_ids[qi])
            # marker row (term "" is never a real token — the analyzer
            # strips empties): this shard's match-set size, summable to the
            # global match_n with no second actor-pool pass
            q_out.append(qid)
            t_out.append("")
            m_out.append(int(cand.size))
            for term in self._terms_list:
                p = _pos(term)
                if p.size == 0:
                    continue
                j = np.searchsorted(p, cand)
                v = j < p.size
                v[v] = p[j[v]] == cand[v]
                m = int(v.sum())
                if m:
                    q_out.append(qid)
                    t_out.append(term)
                    m_out.append(m)
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                "term": pa.array(t_out, type=pa.string()),
                "match_df": pa.array(m_out, type=pa.int64()),
            }
        )

    def collapse_best(self, plan: QueryPlan, scorer, facet: str = "lang") -> pa.Table:
        """Field collapsing (the ES `collapse` surface): per query and facet
        value, the single BEST-scoring matching doc (score desc, doc_id-asc
        ties) over the FULL match set. A shard emits at most |facet dict|
        rows per query — bounded partials, no matter the match set — and the
        cross-shard merge picks the best per (query, facet) again, so the
        collapsed list is exact. Scores use the pinned lexicographic fold
        (bit-identical to search_batch)."""
        codes, vals = self._facet_codes(facet)
        scores = self._scores
        q_out: list[int] = []
        f_out: list[str] = []
        d_out: list[int] = []
        s_out: list[float] = []
        for qi in range(plan.query_ids.size):
            entries = []
            for term, qtf in plan.query_terms[qi]:
                if plan.term_idf.get(term, 0.0) <= 0.0:
                    continue
                hit = self.term_contrib(term, plan, scorer)
                if hit is not None:
                    entries.append((qtf, hit[0], hit[1]))
            if not entries:
                continue
            if len(entries) == 1:
                qtf, pos, contrib = entries[0]
                cand = pos
                csc = contrib if qtf == 1 else qtf * contrib
            else:
                cand = self._union_positions([e[1] for e in entries])
                scores[cand] = 0.0
                for qtf, pos, contrib in entries:
                    if qtf == 1:
                        scores[pos] += contrib
                    else:
                        scores[pos] += qtf * contrib
                csc = scores[cand].copy()
                scores[cand] = 0.0  # keep the shared scratch all-zeros
            ids = self.docmap_ids[cand]
            lab = codes[cand]
            order = np.lexsort((ids, -csc))
            # first occurrence per label in score order == best per group
            _, first = np.unique(lab[order], return_index=True)
            for i in order[np.sort(first)]:
                q_out.append(int(plan.query_ids[qi]))
                f_out.append(vals[int(lab[i])])
                d_out.append(int(ids[i]))
                s_out.append(float(csc[i]))
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                facet: pa.array(f_out, type=pa.string()),
                "doc_id": pa.array(d_out, type=pa.int64()),
                "score": pa.array(s_out, type=pa.float64()),
            }
        )

    # ---- snippet extraction (positions-based highlight) ----

    def snippet_window(self, plan: QueryPlan, qi: int, doc_id: int) -> tuple[int, int]:
        """Best snippet window for one RESULT doc: the smallest token window
        [start, start+len) containing >= 1 occurrence of EVERY query term
        that occurs in the doc (ties: smallest start). Runs on final top-k
        rows only — k x Q docs, each with a handful of short position lists,
        so the classic merge + two-pointer sweep is result-side work, not a
        posting-stream loop. Requires the positional sidecar."""
        self._load_positions()
        scorer = SCORERS["bm25"]
        dpos = int(np.searchsorted(self.docmap_ids, doc_id))
        if dpos >= self.docmap_ids.size or self.docmap_ids[dpos] != doc_id:
            return (-1, 0)
        lists: list[np.ndarray] = []
        for term, _qtf in plan.query_terms[qi]:
            hit = self.term_contrib(term, plan, scorer)
            if hit is None:
                continue
            j = int(np.searchsorted(hit[0], dpos))
            if j >= hit[0].size or hit[0][j] != dpos:
                continue  # term not in this doc: not required for coverage
            tp = self._term_positions(term)
            if tp is None:
                continue
            offs, flat = tp
            lists.append(flat[offs[j]: offs[j + 1]])
        if not lists:
            return (-1, 0)
        if len(lists) == 1:
            return (int(lists[0][0]), 1)
        merged = np.concatenate(lists)
        labels = np.concatenate(
            [np.full(ls.size, i, dtype=np.int32) for i, ls in enumerate(lists)]
        )
        order = np.argsort(merged, kind="stable")
        mpos, mlab = merged[order], labels[order]
        need = len(lists)
        count = np.zeros(need, dtype=np.int64)
        covered = 0
        best = (-1, 1 << 30)
        lo = 0
        for hi in range(mpos.size):
            c = mlab[hi]
            count[c] += 1
            if count[c] == 1:
                covered += 1
            while covered == need:
                width = int(mpos[hi] - mpos[lo]) + 1
                if width < best[1] or (width == best[1] and int(mpos[lo]) < best[0]):
                    best = (int(mpos[lo]), width)
                cl = mlab[lo]
                count[cl] -= 1
                if count[cl] == 0:
                    covered -= 1
                lo += 1
        return best if best[0] >= 0 else (int(mpos[0]), 1)

    # ---- prefix (wildcard term*) dictionary range scan ----

    def prefix_doc_count(self, prefix: str) -> int:
        """Count docs containing ANY term with the given prefix: bisect the
        sorted term dictionary for the prefix range (the wildcard/multi-term
        expansion of a fulltext engine), decode the range's postings, count
        the union. Exact across the cluster: shards hold disjoint docs."""
        import bisect

        if not prefix:
            return 0
        lo = bisect.bisect_left(self._terms_list, prefix)
        hi = bisect.bisect_left(self._terms_list, prefix[:-1] + chr(ord(prefix[-1]) + 1))
        if lo >= hi:
            return 0
        return self._postings_union_count(range(lo, hi))

    def substr_doc_count(self, infix: str) -> int:
        """Count docs containing ANY term that contains `infix` (the *term*
        wildcard). No sorted-range shortcut exists for infixes — real engines
        burn a permuterm/n-gram auxiliary index; the honest baseline is a
        VECTORIZED substring scan of the dictionary (O(|dict|) bytes per
        query, embarrassingly parallel across shards), then the same
        postings-union count as the prefix path. Empty infix matches every
        term (SQL contains(s, '') semantics)."""
        import pyarrow.compute as pc

        arr = getattr(self, "_terms_arr", None)
        if arr is None:
            arr = self._terms_arr = pa.array(self._terms_list, type=pa.string())
        mask = pc.match_substring(arr, infix).to_numpy(zero_copy_only=False)
        return self._postings_union_count(np.nonzero(mask)[0])

    def prefix_terms(self, prefix: str) -> tuple[list[str], np.ndarray]:
        """(terms, local df) for the dictionary range matching a prefix —
        the suggester's shard partial. Dictionary rows only (no postings
        decode); global df = sum of shard partials per term."""
        import bisect

        if not prefix:
            return [], np.empty(0, dtype=np.int64)
        lo = bisect.bisect_left(self._terms_list, prefix)
        hi = bisect.bisect_left(
            self._terms_list, prefix[:-1] + chr(ord(prefix[-1]) + 1)
        )
        if lo >= hi:
            return [], np.empty(0, dtype=np.int64)
        if self._dead_pos is None:
            return self._terms_list[lo:hi], self._df[lo:hi].copy()
        dfs = np.array(
            [self.live_term_df(t) for t in self._terms_list[lo:hi]], dtype=np.int64
        )
        return self._terms_list[lo:hi], dfs

    def regex_doc_count(self, pattern: str) -> int:
        """Count docs containing ANY term matching an (unanchored, RE2)
        regex — the third wildcard mode after prefix and infix: a vectorized
        `match_substring_regex` scan of the dictionary, then the shared
        postings-union count. Oracle parity: DuckDB regexp_matches is the
        same unanchored-RE2 semantics."""
        import pyarrow.compute as pc

        arr = getattr(self, "_terms_arr", None)
        if arr is None:
            arr = self._terms_arr = pa.array(self._terms_list, type=pa.string())
        mask = pc.match_substring_regex(arr, pattern).to_numpy(zero_copy_only=False)
        return self._postings_union_count(np.nonzero(mask)[0])

    def _postings_union_count(self, term_indices) -> int:
        """|union of postings| over dictionary rows — shared by the prefix
        and infix wildcard scans (shards hold disjoint docs, so counts sum
        exactly across the cluster)."""
        pos_lists = []
        for i in term_indices:
            p = self._postings_row(self._terms_list[int(i)])
            pos, _tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], p["block_last_doc"],
                block_size=self.block_size,
            )
            if self._dead_pos is not None:
                pos = pos[~self._dead_pos[pos]]
            if pos.size:
                pos_lists.append(pos)
        if not pos_lists:
            return 0
        return int(self._union_positions(pos_lists).size)

    # ---- exact phrase path (method="phrase") ----

    def _load_positions(self) -> None:
        """Lazy-load the positional sidecar (stages/positions.py) — phrase
        queries only; workloads without phrases never read it."""
        if self._pos_row is not None:
            return
        from .positions import positions_path

        p = positions_path(self.index_dir, self.partition)
        if not os.path.exists(p):
            raise FileNotFoundError(
                "phrase search needs the positional sidecar; run "
                f"build_position_sidecar over the build corpus (missing {p})"
            )
        filters = (
            [("term", "in", self._terms_filter)]
            if self._terms_filter is not None
            else None
        )
        t = pq.read_table(p, filters=filters).combine_chunks()
        self._pos_row = {term: i for i, term in enumerate(t.column("term").to_pylist())}

        def _lv(col):
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            return np.asarray(arr.offsets), np.asarray(arr.values).astype(np.int64)

        self._poffs_off, self._poffs_vals = _lv(t.column("pos_offs"))
        self._pflat_off, self._pflat_vals = _lv(t.column("pos_flat"))

    def _term_positions(self, term: str):
        """(pos_offs df+1, pos_flat) views for one term, aligned row-for-row
        with the term's posting order in the main segment (docmap-position
        ascending over the identical winner set — positions.py invariant)."""
        i = self._pos_row.get(term)
        if i is None:
            return None
        return (
            self._poffs_vals[self._poffs_off[i]: self._poffs_off[i + 1]],
            self._pflat_vals[self._pflat_off[i]: self._pflat_off[i + 1]],
        )

    def search_one_phrase(self, plan: QueryPlan, qi: int, scorer, slop: int = 0):
        """Exact phrase retrieval: conjunctive posting-list intersection over
        the phrase's distinct terms, then positional adjacency verification
        against the sidecar, fully vectorized — candidate position sets are
        packed (candidate_rank << 32 | token_position) and each phrase step
        is one searchsorted membership probe per allowed gap (slop=0: exactly
        one probe at +1; slop=s: ordered per-gap proximity, probes +1..+1+s —
        the Lucene slop analog).

        Survivor docs score exactly like the disjunctive path (pinned
        lexicographic accumulation over the phrase's distinct terms with
        phrase term counts as qtf), so phrase scores are bit-identical to the
        same doc's TAAT score for the bag-of-words query."""
        if self._dead_pos is not None:
            raise NotImplementedError(
                "phrase search over a generation stack is not supported; "
                "compact the stack first"
            )
        empty = np.empty(0, dtype=np.int64)
        seq = plan.query_seqs[qi] if plan.query_seqs else []
        if not seq:
            return empty, empty.astype(np.float64), 0, 0
        entries: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
        n_blocks = 0
        for term, _qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                return empty, empty.astype(np.float64), 0, 0
            hit = self.term_contrib(term, plan, scorer)
            if hit is None:
                return empty, empty.astype(np.float64), 0, n_blocks
            entries[term] = hit
            n_blocks += hit[2]
        # conjunctive intersect, smallest list first (as search_one_and)
        by_size = sorted(entries, key=lambda t: entries[t][0].size)
        isect = entries[by_size[0]][0]
        for t in by_size[1:]:
            if isect.size == 0:
                break
            pos = entries[t][0]
            j = np.searchsorted(pos, isect)
            valid = j < pos.size
            valid[valid] = pos[j[valid]] == isect[valid]
            isect = isect[valid]
        if isect.size == 0:
            return empty, empty.astype(np.float64), 0, n_blocks
        self._load_positions()

        def packed(term: str) -> np.ndarray:
            tp = self._term_positions(term)
            if tp is None:
                return np.empty(0, dtype=np.int64)
            offs, flat = tp
            j = np.searchsorted(entries[term][0], isect)  # candidate -> row
            starts, ends = offs[j], offs[j + 1]
            lens = (ends - starts).astype(np.int64)
            tot = int(lens.sum())
            if tot == 0:
                return np.empty(0, dtype=np.int64)
            doc_rep = np.repeat(np.arange(isect.size, dtype=np.int64), lens)
            base = np.repeat(starts, lens)
            run = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            return (doc_rep << np.int64(32)) | flat[base + run]

        # `cur` tracks the packed position of the LAST matched token per
        # surviving chain; positions fit 31 bits so +g never carries into
        # the rank bits
        cur = packed(seq[0])
        for s in range(1, len(seq)):
            if cur.size == 0:
                break
            step = packed(seq[s])
            hits = []
            for g in range(1, slop + 2):
                probe = cur + np.int64(g)
                j = np.searchsorted(step, probe)
                valid = j < step.size
                valid[valid] = step[j[valid]] == probe[valid]
                hits.append(probe[valid])
            cur = hits[0] if len(hits) == 1 else np.unique(np.concatenate(hits))
        if cur.size == 0:
            return empty, empty.astype(np.float64), 0, n_blocks
        keep = isect[np.unique(cur >> np.int64(32))]
        out = np.zeros(keep.size, dtype=np.float64)
        for term, qtf in plan.query_terms[qi]:  # lexicographic (pinned order)
            pos, contrib = entries[term][0], entries[term][1]
            idx = np.searchsorted(pos, keep)
            out += contrib[idx] if qtf == 1 else qtf * contrib[idx]
        docs, ssc = topk_select(out, self.docmap_ids[keep], plan.k)
        return docs, ssc, int(keep.size), n_blocks

    # ---- block-max pruned path (method="wand") ----

    def search_one_pruned(self, plan: QueryPlan, qi: int, scorer, approx_factor: float = 1.0):
        """Exact top-k with MaxScore term partitioning + block-max skipping
        (the grafted form of flatnav's candidate pruning, Index.h:714-763,
        via the codec's independently-decodable blocks).

        1. Order terms by score upper bound (desc); fully score them in that
           order, maintaining the running k-th-best threshold (partial scores
           are valid lower bounds).
        2. Once the remaining terms' summed bounds fall below the threshold,
           stop expanding candidates: docs appearing ONLY in those terms are
           provably below threshold.
        3. For non-essential terms decode ONLY blocks containing a candidate.
        4. Re-accumulate winners in lexicographic term order so the float sum
           is bit-identical to TAAT (rank-identity contract)."""
        tps = []
        for term, qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                continue
            p = self._postings_row(term)
            if p is None:
                continue
            ub = qtf * float(
                scorer.block_bound(
                    p["block_max_tf"], p["block_min_dl"], plan.term_df[term],
                    plan.n_docs, plan.avgdl, term=term, plan=plan,
                ).max()
            )
            tps.append((term, qtf, p, ub))
        if not tps:
            e = np.empty(0)
            return e.astype(np.int64), e, 0, 0
        tps.sort(key=lambda x: (-x[3], x[0]))
        suffix = np.cumsum(np.array([x[3] for x in tps], dtype=np.float64)[::-1])[::-1]

        k = plan.k
        n_blocks = 0
        # actor-held scratch (VisitedSetPool analog) — zeroed on the touched
        # set at the end, never reallocated per query
        scores = self._scores
        threshold = -np.inf
        essential_end = len(tps)
        pos_parts: list[np.ndarray] = []
        cand: np.ndarray = np.empty(0, dtype=np.int64)
        for i, (term, qtf, p, _ub) in enumerate(tps):
            # STRICT <: a doc reachable only through the remaining terms whose
            # total score exactly EQUALS the threshold can still enter the
            # top-k on the (score desc, doc_id asc) tie-break, so it must not
            # be pruned at approx_factor=1.0 (rank-identity contract)
            if i > 0 and threshold > -np.inf and suffix[i] < threshold * approx_factor:
                essential_end = i
                break
            pos, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], p["block_last_doc"], block_size=self.block_size
            )
            if self._dead_pos is not None:
                keep = ~self._dead_pos[pos]
                pos, tfs = pos[keep], tfs[keep]
            n_blocks += len(p["block_last_doc"])
            dls = self.docmap_lens[pos]
            scores[pos] += qtf * scorer.term_scores(
                tfs, dls, plan.term_df[term], plan.n_docs, plan.avgdl,
                term=term, plan=plan,
            )
            pos_parts.append(pos)
            # candidate set tracked incrementally (O(postings-so-far), not an
            # O(n_docs) boolean rescan per term)
            cand = pos_parts[0] if len(pos_parts) == 1 else np.unique(
                np.concatenate(pos_parts)
            )
            if cand.size >= k:
                part = scores[cand]
                threshold = np.partition(part, part.size - k)[part.size - k]

        cand_ids = self.docmap_ids[cand]
        for term, qtf, p, _ub in tps[essential_end:]:
            # block metadata and decoded postings are docmap POSITIONS —
            # candidate matching stays in position space throughout
            last = p["block_last_doc"]
            bidx = np.searchsorted(last, cand)
            bidx = bidx[bidx < last.size]
            mask = np.zeros(last.size, dtype=bool)
            mask[np.unique(bidx)] = True
            pos_d, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], last,
                p["block_doc_offs"], p["block_tf_offs"], mask,
                block_size=self.block_size,
            )
            n_blocks += int(mask.sum())
            if pos_d.size == 0:
                continue
            pin = np.searchsorted(cand, pos_d)
            valid = pin < cand.size
            valid[valid] = cand[pin[valid]] == pos_d[valid]
            pos_d, tfs = pos_d[valid], tfs[valid]
            dls = self.docmap_lens[pos_d]
            scores[pos_d] += qtf * scorer.term_scores(
                tfs, dls, plan.term_df[term], plan.n_docs, plan.avgdl,
                term=term, plan=plan,
            )

        docs, ssc = topk_select(scores[cand], cand_ids, k)
        scores[cand] = 0.0  # restore the shared scratch for the next query
        if docs.size:
            ssc = self._rescore_exact(plan, qi, docs, scorer)
            docs, ssc = topk_select(ssc, docs, k)
        return docs, ssc, int(cand.size), n_blocks

    def _rescore_exact(self, plan: QueryPlan, qi: int, docs: np.ndarray, scorer) -> np.ndarray:
        """Re-accumulate scores for a small doc set in lexicographic term
        order (identical float op order as the cached TAAT path)."""
        out = np.zeros(docs.size, dtype=np.float64)
        # docs are real ids (the result surface); work in position space
        dpos = np.searchsorted(self.docmap_ids, docs)
        for term, qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                continue
            p = self._postings_row(term)
            if p is None:
                continue
            last = p["block_last_doc"]
            bidx = np.searchsorted(last, dpos)
            bidx = bidx[bidx < last.size]
            mask = np.zeros(last.size, dtype=bool)
            mask[np.unique(bidx)] = True
            pos_d, tfs = decode_postings(
                p["doc_blob"], p["tf_blob"], last,
                p["block_doc_offs"], p["block_tf_offs"], mask,
                block_size=self.block_size,
            )
            if pos_d.size == 0:
                continue
            pin = np.searchsorted(pos_d, dpos)
            valid = pin < pos_d.size
            valid[valid] = pos_d[pin[valid]] == dpos[valid]
            dls = self.docmap_lens[dpos[valid]]
            out[valid] += qtf * scorer.term_scores(
                tfs[pin[valid]], dls, plan.term_df[term], plan.n_docs, plan.avgdl,
                term=term, plan=plan,
            )
        return out


def score_docs_rows(
    index_dir: str, partition: int, block_size: int, plan: QueryPlan,
    scorer_name: str, qids: np.ndarray, docs: np.ndarray,
) -> pa.Table:
    """Exact full-query scores for given (query, doc) pairs in ONE partition
    — the second pass of the rescore pipeline (pipelines/query.rescore_topk):
    per query, `_rescore_exact` re-accumulates the doc set in lexicographic
    term order, so the secondary score is bit-identical to what a full
    search under that scorer would produce. O(pairs), never the corpus.
    Docs must belong to this partition (doc_id % P routing — the hash
    docid_strategy invariant)."""
    st = _ShardState(index_dir, partition, block_size, sorted(plan.term_idf.keys()))
    scorer = SCORERS[scorer_name]
    qi_of = {int(q): i for i, q in enumerate(plan.query_ids)}
    by_q: dict[int, list[int]] = {}
    for q, d in zip(qids, docs):
        by_q.setdefault(int(q), []).append(int(d))
    out_q: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for q, ds in by_q.items():
        arr = np.asarray(sorted(ds), dtype=np.int64)
        sc = st._rescore_exact(plan, qi_of[q], arr, scorer)
        out_q.append(np.full(arr.size, q, dtype=np.int64))
        out_d.append(arr)
        out_s.append(sc)
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score2": pa.array([], type=pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "doc_id": pa.array(np.concatenate(out_d)),
            "score2": pa.array(np.concatenate(out_s)),
        }
    )


def explain_rows(
    index_dir: str, partition: int, block_size: int, plan: QueryPlan,
    scorer_name: str, qids: np.ndarray, docs: np.ndarray,
) -> pa.Table:
    """Lucene `explain` analog for one partition: per (query, result doc,
    term) score-contribution rows. A row's `contribution` is EXACTLY the
    addend the search accumulated (qtf/boost multiplied), so summing a
    doc's rows in lexicographic term order reproduces its search score
    bit-for-bit. Runs over top-k result rows only — O(k) per query, never
    the corpus."""
    st = _ShardState(index_dir, partition, block_size, sorted(plan.term_idf.keys()))
    scorer = SCORERS[scorer_name]
    boosts = getattr(plan, "query_boosts", None) or {}
    dpos = np.searchsorted(st.docmap_ids, np.asarray(docs, dtype=np.int64))
    by_q: dict[int, list[tuple[int, int]]] = {}
    for q, d, dp in zip(qids, docs, dpos):
        by_q.setdefault(int(q), []).append((int(d), int(dp)))
    qi_of = {int(q): i for i, q in enumerate(plan.query_ids)}
    out_q: list[int] = []
    out_d: list[int] = []
    out_t: list[str] = []
    out_df: list[int] = []
    out_c: list[float] = []
    for q, pairs in by_q.items():
        qi = qi_of[q]
        for term, qtf in plan.query_terms[qi]:
            if plan.term_idf.get(term, 0.0) <= 0.0:
                continue
            hit = st.term_contrib(term, plan, scorer)
            if hit is None:
                continue
            pos, contrib = hit[0], hit[1]
            w = qtf * boosts[term] if term in boosts else qtf
            for d, dp in pairs:
                j = int(np.searchsorted(pos, dp))
                if j < pos.size and pos[j] == dp:
                    out_q.append(q)
                    out_d.append(d)
                    out_t.append(term)
                    out_df.append(plan.term_df[term])
                    out_c.append(float(contrib[j]) if w == 1 else float(w * contrib[j]))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "term": pa.array(out_t, type=pa.string()),
            "df": pa.array(out_df, type=pa.int64()),
            "contribution": pa.array(out_c, type=pa.float64()),
        }
    )


class ShardSearcher:
    """Dataset-mode actor stage: batches of {partition} rows -> partial top-k.

    Constructor args arrive via fn_constructor_kwargs; the query plan is an
    object-store ref (`ray.put` once, zero-copy read in every actor)."""

    def __init__(self, index_dir: str, plan_ref, query_cfg: QueryConfig, block_size: int):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        self.cfg = query_cfg
        self.block_size = block_size
        self.scorer = SCORERS[query_cfg.scorer]
        self._states: dict[int, _ShardState] = {}
        self._needed_terms = sorted(self.plan.term_idf.keys())

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size, self._needed_terms)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            outs.append(
                self._state(part).search_batch(
                    self.plan, self.scorer, self.cfg.method,
                    getattr(self.cfg, "approx_factor", 1.0),
                    getattr(self.cfg, "min_should_match", 0),
                    getattr(self.cfg, "phrase_slop", 0),
                    getattr(self.cfg, "filter_lang", None),
                    getattr(self.cfg, "sort_by", None),
                    _len_bounds(self.cfg),
                )
            )
        if not outs:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.float64()),
                    "docs_scored": pa.array([], type=pa.int64()),
                    "blocks_decoded": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)


class ShardFacets:
    """Dataset-mode facet counter (actor pool over partition ids, like
    ShardSearcher): per-shard `_ShardState.facet_counts` partials; callers
    sum per (query_id, facet) across shards — exact under disjoint doc
    partitioning."""

    def __init__(self, index_dir: str, plan_ref, block_size: int, facet: str = "lang"):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = (
            ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        )
        self.block_size = block_size
        self.facet = facet
        self._states: dict[int, _ShardState] = {}
        self._needed_terms = sorted(self.plan.term_idf.keys())

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size, self._needed_terms)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            outs.append(self._state(part).facet_counts(self.plan, self.facet))
        if not outs:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    self.facet: pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)


class _ShardPartialStage:
    """Base for Dataset-mode per-shard partial-aggregation stages (actor
    pool over partition-id rows): shared plan_ref unwrap, a 64-entry FIFO
    _ShardState cache, and the segment-exists skip loop. Subclasses define
    `_empty()` (the stage's empty output schema) and `_compute(state)`
    (the per-shard partial); `_terms_filter()` controls segment-read
    pruning (None = load the full dictionary)."""

    def __init__(self, index_dir: str, plan_ref, block_size: int):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = (
            ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        )
        self.block_size = block_size
        self._states: dict[int, _ShardState] = {}

    def _terms_filter(self):
        return sorted(self.plan.term_idf.keys())

    def _empty(self) -> pa.Table:
        raise NotImplementedError

    def _compute(self, st: _ShardState) -> pa.Table:
        raise NotImplementedError

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(
                self.index_dir, partition, self.block_size, self._terms_filter()
            )
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            outs.append(self._compute(self._state(part)))
        return pa.concat_tables(outs) if outs else self._empty()


class ShardMatchStats(_ShardPartialStage):
    """Per-shard `_ShardState.match_stats` partials; callers merge per
    query with sum/min/max/sum — exact under disjoint doc partitioning."""

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "dl_min": pa.array([], type=pa.int64()),
                "dl_max": pa.array([], type=pa.int64()),
                "dl_sum": pa.array([], type=pa.int64()),
            }
        )

    def _compute(self, st: _ShardState) -> pa.Table:
        return st.match_stats(self.plan)


class ShardMatchHist(_ShardPartialStage):
    """Per-shard `_ShardState.match_dl_hist` partials; callers merge per
    (query, dl) with a sum, then take exact quantiles."""

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "dl": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )

    def _compute(self, st: _ShardState) -> pa.Table:
        return st.match_dl_hist(self.plan)


class ShardSigTerms(_ShardPartialStage):
    """Per-shard `_ShardState.sig_term_counts` partials — state loaded with
    NO terms filter (the dictionary scan needs the full vocabulary);
    callers merge per (query, term) with a sum."""

    def _terms_filter(self):
        return None

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "match_df": pa.array([], type=pa.int64()),
            }
        )

    def _compute(self, st: _ShardState) -> pa.Table:
        return st.sig_term_counts(self.plan)


class ShardCollapse:
    """Dataset-mode field-collapse stage (like ShardFacets): per shard,
    `_ShardState.collapse_best` partials; callers re-collapse per
    (query_id, facet) across shards — exact under disjoint doc partitioning."""

    def __init__(self, index_dir: str, plan_ref, block_size: int,
                 facet: str = "lang", scorer: str = "bm25"):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = (
            ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        )
        self.block_size = block_size
        self.facet = facet
        self.scorer = SCORERS[scorer]
        self._states: dict[int, _ShardState] = {}
        self._needed_terms = sorted(self.plan.term_idf.keys())

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size, self._needed_terms)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            outs.append(self._state(part).collapse_best(self.plan, self.scorer, self.facet))
        if not outs:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    self.facet: pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(outs)


class SnippetExtractor:
    """Dataset-mode snippet stage: maps final result rows (query_id, doc_id)
    to their best highlight window via the owning shard's positional sidecar
    (doc_id % num_partitions locates the shard under every docid strategy —
    reordered ids are constructed to preserve it)."""

    def __init__(self, index_dir: str, plan_ref, block_size: int, num_partitions: int):
        import ray

        self.index_dir = index_dir
        self.plan: QueryPlan = (
            ray.get(plan_ref) if not isinstance(plan_ref, QueryPlan) else plan_ref
        )
        self.block_size = block_size
        self.num_partitions = num_partitions
        self._qi_of = {int(q): i for i, q in enumerate(self.plan.query_ids)}
        self._states: dict[int, _ShardState] = {}
        self._needed_terms = sorted(self.plan.term_idf.keys())

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size, self._needed_terms)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        dids = batch.column("doc_id").to_pylist()
        starts: list[int] = []
        lens: list[int] = []
        for q, d in zip(qids, dids):
            st = self._state(int(d) % self.num_partitions)
            s, w = st.snippet_window(self.plan, self._qi_of[int(q)], int(d))
            starts.append(s)
            lens.append(w)
        return batch.append_column(
            "snippet_start", pa.array(starts, type=pa.int64())
        ).append_column("snippet_len", pa.array(lens, type=pa.int64()))


class ShardPrefixCounts:
    """Dataset-mode wildcard-count stage: per shard, `prefix_doc_count`
    (mode="prefix", sorted-dictionary bisect) or `substr_doc_count`
    (mode="infix", vectorized substring scan) for each pattern query (loads
    the FULL term dictionary — no terms_filter: the expansion set is unknown
    until the scan). Partials sum exactly across shards (disjoint docs)."""

    def __init__(self, index_dir: str, prefixes: list[str], block_size: int,
                 mode: str = "prefix"):
        self.index_dir = index_dir
        self.prefixes = prefixes
        self.block_size = block_size
        self.mode = mode
        self._states: dict[int, _ShardState] = {}

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_out: list[int] = []
        n_out: list[int] = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            st = self._state(part)
            count = {
                "prefix": st.prefix_doc_count,
                "infix": st.substr_doc_count,
                "regex": st.regex_doc_count,
            }[self.mode]
            for qi, prefix in enumerate(self.prefixes):
                q_out.append(qi)
                n_out.append(count(prefix))
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                "n_docs": pa.array(n_out, type=pa.int64()),
            }
        )


class ShardSuggest:
    """Dataset-mode suggester stage: per shard and prefix query, the
    dictionary range's (term, local df) rows. Callers sum df per term
    across shards (each shard holds disjoint docs) and rank."""

    def __init__(self, index_dir: str, prefixes: list[str], block_size: int):
        self.index_dir = index_dir
        self.prefixes = prefixes
        self.block_size = block_size
        self._states: dict[int, _ShardState] = {}

    def _state(self, partition: int) -> _ShardState:
        st = self._states.get(partition)
        if st is None:
            st = _ShardState(self.index_dir, partition, self.block_size)
            if len(self._states) >= 64:
                self._states.pop(next(iter(self._states)))
            self._states[partition] = st
        return st

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_out: list[int] = []
        t_out: list[str] = []
        d_out: list[np.ndarray] = []
        for part in batch.column("partition").to_pylist():
            part = int(part)
            if not os.path.exists(segment_path(self.index_dir, part)):
                continue
            st = self._state(part)
            for qi, prefix in enumerate(self.prefixes):
                terms, dfs = st.prefix_terms(prefix)
                q_out.extend([qi] * len(terms))
                t_out.extend(terms)
                d_out.append(dfs)
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                "term": pa.array(t_out, type=pa.string()),
                "df": pa.array(
                    np.concatenate(d_out) if d_out else np.empty(0, dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        )


def _len_bounds(cfg: QueryConfig) -> tuple[int | None, int | None] | None:
    """(filter_len_min, filter_len_max) from a QueryConfig, or None when the
    numeric range filter is off."""
    lo = getattr(cfg, "filter_len_min", None)
    hi = getattr(cfg, "filter_len_max", None)
    return None if lo is None and hi is None else (lo, hi)


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


def merge_topk_table(partials: pa.Table, k: int) -> pa.Table:
    """Vectorized driver-side merge of ALL queries' partials at once:
    lexsort (query_id, -score, doc_id) then per-group head-k. Used when the
    partial set is small (k × partitions × queries); the distributed
    groupby(query_id) path handles the rest.

    The url column is OPTIONAL: the packed serving path (search_packed)
    ships partials without urls — 8 B x 3 columns per row instead of the
    ~80 B/row the string column made them — and the session resolves urls
    for the final winners only (lookup_urls)."""
    has_url = "url" in partials.column_names
    if len(partials) == 0:
        cols = {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int32()),
            "doc_id": pa.array([], type=pa.int64()),
        }
        if has_url:
            cols["url"] = pa.array([], type=pa.string())
        cols["score"] = pa.array([], type=pa.float64())
        return pa.table(cols)
    qid = partials.column("query_id").to_numpy(zero_copy_only=False)
    score = partials.column("score").to_numpy(zero_copy_only=False)
    doc = partials.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, -score, qid))
    qs = qid[order]
    new_q = np.concatenate(([True], qs[1:] != qs[:-1]))
    grp_start = np.maximum.accumulate(np.where(new_q, np.arange(qs.size), 0))
    rank = np.arange(qs.size) - grp_start
    keep = rank < k
    sel = order[keep]
    cols = {
        "query_id": pa.array(qid[sel], type=pa.int64()),
        "rank": pa.array(rank[keep].astype(np.int32), type=pa.int32()),
        "doc_id": pa.array(doc[sel], type=pa.int64()),
    }
    if has_url:
        cols["url"] = partials.column("url").take(pa.array(sel))
    cols["score"] = pa.array(score[sel], type=pa.float64())
    return pa.table(cols)


def _expand_dedup_results(
    res: pa.Table, orig_qids: np.ndarray, rep: np.ndarray, n_distinct: int
) -> pa.Table:
    """Replicate per-distinct-query result rows back onto the original query
    ids (res is sorted by (query_id, rank) with distinct ids 0..n_distinct-1)."""
    import pyarrow.compute as pc

    rq = res.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(rq, minlength=n_distinct)
    offs = np.concatenate(([0], np.cumsum(counts)))
    sizes = counts[rep]
    total = int(sizes.sum())
    if total == 0:
        return res.slice(0, 0)
    starts = np.repeat(offs[rep], sizes)
    within = np.arange(total) - np.repeat(np.cumsum(sizes) - sizes, sizes)
    out = res.take(pa.array(starts + within))
    out = out.set_column(
        out.schema.get_field_index("query_id"),
        "query_id",
        pa.array(np.repeat(orig_qids, sizes), type=pa.int64()),
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("query_id", "ascending"), ("rank", "ascending")])
    )


def _merge_partial_range(refs, lo, hi, k: int) -> pa.Table:
    """Raw-task merge worker: fetch every shard's partial table (zero-copy
    from the object store), keep only queries in [lo, hi), run the vectorized
    top-k merge on that slice. Fanning the merge out by query range removes
    the driver's single-core lexsort bottleneck on k x P x Q partial rows."""
    import ray

    import pyarrow.compute as pc

    tabs = [t for t in ray.get(list(refs)) if t is not None and len(t)]
    kept = []
    for t in tabs:
        m = pc.greater_equal(t.column("query_id"), lo)
        if hi is not None:
            m = pc.and_(m, pc.less(t.column("query_id"), hi))
        ft = t.filter(m)
        if len(ft):
            kept.append(ft)
    if not kept:
        return None
    return merge_topk_table(pa.concat_tables(kept), k)


# partial-row count above which SearchSession fans the final merge out to
# raw Ray tasks instead of a driver-side lexsort
_MERGE_FANOUT_ROWS = 200_000

# query-batch size (rows = queries x k) at or below which shard actors keep
# urls inline in their partials — the extra winner-url round trip would
# dominate single-query latency; above it the packed urlless shuffle wins
_INLINE_URL_ROWS = 4096

# empty packed-partial table (the urlless serving shuffle schema)
_EMPTY_PACKED_PARTIALS = pa.table(
    {
        "query_id": pa.array([], type=pa.int64()),
        "doc_id": pa.array([], type=pa.int64()),
        "score": pa.array([], type=pa.float64()),
    }
)


def _shard_actor_cls():
    import ray

    @ray.remote
    class ShardActor:
        """Server-mode shard: loads its partitions' FULL segments once,
        serves many query batches (the persistent query server, SURVEY.md T2).

        `index_dirs` may be a single directory or a generation stack
        (oldest-first): with a stack, each partition loads one _ShardState
        per generation, and older generations mask documents shadowed by a
        newer one (both generations hash doc_id with the same
        num_partitions, so a collision always lands in the SAME partition —
        the mask is computable shard-locally)."""

        def __init__(self, index_dirs, partitions: list[int], block_size: int,
                     tombstones=None):
            dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
            # tombstones: per-generation sorted int64 arrays (aligned with
            # dirs, oldest-first) of doc_ids DELETED from that generation —
            # delete_documents records which generations each tombstone file
            # covers, so a doc re-added by a LATER delta stays live. Masked
            # exactly like newer-generation shadows (dead_ids).
            self.states: dict[tuple[int, int], _ShardState] = {}
            for p in partitions:
                seen: np.ndarray | None = None
                for g in range(len(dirs) - 1, -1, -1):  # newest first
                    if not os.path.exists(segment_path(dirs[g], p)):
                        continue
                    dead = seen
                    tomb = tombstones[g] if tombstones is not None else None
                    if tomb is not None and len(tomb):
                        tomb = np.asarray(tomb, dtype=np.int64)
                        dead = tomb if dead is None else np.union1d(dead, tomb)
                    st = _ShardState(dirs[g], p, block_size, dead_ids=dead)
                    self.states[(g, p)] = st
                    if len(dirs) > 1:
                        seen = (
                            st.docmap_ids
                            if seen is None
                            else np.union1d(seen, st.docmap_ids)
                        )

        def live_counts(self) -> tuple[int, int]:
            n, s = 0, 0
            for st in self.states.values():
                a, b = st.live_counts()
                n += a
                s += b
            return n, s

        def live_df(self, terms: list[str]) -> dict[str, int]:
            return {t: sum(st.live_term_df(t) for st in self.states.values()) for t in terms}

        def search(self, plan: QueryPlan, scorer_name: str, method: str,
                   approx_factor: float = 1.0, msm: int = 0,
                   slop: int = 0, flt: str | None = None,
                   sort_by: str | None = None,
                   flt_len: tuple[int | None, int | None] | None = None) -> pa.Table:
            scorer = SCORERS[scorer_name]
            outs = [
                st.search_batch(
                    plan, scorer, method, approx_factor, msm, slop, flt,
                    sort_by, flt_len,
                )
                for st in self.states.values()
            ]
            return pa.concat_tables(outs) if outs else None

        def search_packed(self, plan: QueryPlan, scorer_name: str, method: str,
                          approx_factor: float = 1.0, msm: int = 0,
                          slop: int = 0, flt: str | None = None,
                          sort_by: str | None = None,
                          flt_len: tuple[int | None, int | None] | None = None,
                          k: int = 10, with_urls: bool = False) -> pa.Table | None:
            """search(), packed for the serving shuffle: drops the url and
            per-query stats columns (~80 B/row -> 24 B/row of fixed-width
            arrays) and pre-merges this ACTOR's partitions to top-k per
            query, so an actor owning P/N partitions ships one bounded
            partial instead of P/N. For LARGE batches urls resolve
            post-merge for the final winners only (lookup_urls) — the
            k x P x Q string traffic was the serving shuffle's dominant
            byte cost; for SMALL batches (with_urls=True) the partial keeps
            its url column so the session skips the extra lookup round trip
            that would dominate single-query latency."""
            t = self.search(plan, scorer_name, method, approx_factor, msm,
                            slop, flt, sort_by, flt_len)
            if t is None or len(t) == 0:
                return None
            cols = ["query_id", "doc_id", "url", "score"] if with_urls else [
                "query_id", "doc_id", "score"]
            t = t.select(cols)
            if len(self.states) > 1:
                t = merge_topk_table(t, k).select(cols)
            return t

        def lookup_urls(self, doc_ids: np.ndarray) -> pa.Table | None:
            """Resolve urls for the doc_ids this actor owns (co-resident
            docmap, SURVEY.md J1). Ids owned by other actors are ignored;
            in a generation stack any generation's copy resolves the same
            url (doc_id <-> url is 1:1 by construction)."""
            ids = np.asarray(doc_ids, dtype=np.int64)
            outs = []
            for st in self.states.values():
                dm = st.docmap_ids
                if dm.size == 0:
                    continue
                pos = np.clip(np.searchsorted(dm, ids), 0, dm.size - 1)
                hit = dm[pos] == ids
                if hit.any():
                    outs.append(
                        pa.table(
                            {
                                "doc_id": pa.array(ids[hit], type=pa.int64()),
                                "url": st.docmap_urls.take(pa.array(pos[hit])),
                            }
                        )
                    )
            return pa.concat_tables(outs) if outs else None

    return ShardActor


class SearchSession:
    """Persistent shard-actor pool over one index — create once, search many.

    The graft of the reference's loadIndex -> repeated search lifecycle
    (Index.h:442-479, bindings.cpp:161-228). Partitions are assigned
    round-robin to `num_actors` actors; each query batch is broadcast and
    partials are merged driver-side (k×P×Q rows is small by construction)."""

    def __init__(self, index_dir: str, num_actors: int | None = None):
        import ray

        from ..state.stats import load_stats

        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        parts = [int(p) for p in self.stats["partitions"]]
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n = max(1, min(num_actors or ncpu, len(parts)))
        cls = _shard_actor_cls()
        assign: list[list[int]] = [[] for _ in range(n)]
        for i, p in enumerate(parts):
            assign[i % n].append(p)
        self.actors = [
            cls.remote(index_dir, a, int(self.stats["block_size"])) for a in assign
        ]
        self._n_docs = int(self.stats["n_docs"])
        self._avgdl = float(self.stats["avgdl"])
        # per-session term->df cache: a serving process would otherwise re-read
        # the term_stats parquet on EVERY search call (dominates single-query
        # latency); misses are looked up per batch, absent terms cached as 0
        self._df_cache: dict[str, int] = {}

    def _lookup_missing_df(self, missing: list[str]) -> dict[str, int]:
        from ..state.stats import lookup_term_df

        return lookup_term_df(self.index_dir, missing)

    def _fuzzy_expand(self, terms: list[str], max_edits: int) -> dict[str, set[str]]:
        """Per-session expansion cache (the df-cache pattern): hot query
        terms repeat across serving calls, so only UNSEEN terms pay the
        vocabulary scan — one batched scan per call covers all misses.
        Subclasses override `_fuzzy_scan` (the miss path) only, keeping the
        cache; the generation set is fixed at session construction, so
        cached expansions never go stale within a session."""
        cache = getattr(self, "_fuzzy_cache", None)
        if cache is None:
            cache = self._fuzzy_cache = {}
        missing = [t for t in terms if t not in cache]
        if missing:
            cache.update(self._fuzzy_scan(missing, max_edits))
        return {t: cache[t] for t in terms}

    def _fuzzy_scan(self, terms: list[str], max_edits: int) -> dict[str, set[str]]:
        from ..functions.fuzzy import fuzzy_expand_terms

        return fuzzy_expand_terms(self.index_dir, terms, max_edits)

    # queries per broadcast plan: bounds the ray.put object and per-actor
    # accumulation for very large batches; chunks stream through the pool
    MAX_PLAN_QUERIES = 16_384

    def search(self, queries: pa.Table, query_cfg: QueryConfig | None = None) -> pa.Table:
        import ray

        query_cfg = query_cfg or QueryConfig()
        # pagination: fetch top-(offset+k) and slice — the rank column keeps
        # GLOBAL rank numbers (offset..offset+k-1), exactly SQL's
        # `WHERE rank >= offset AND rank < offset+k`
        if getattr(query_cfg, "offset", 0) > 0:
            import dataclasses

            import pyarrow.compute as pc

            deep = dataclasses.replace(
                query_cfg, k=query_cfg.k + query_cfg.offset, offset=0
            )
            res = self.search(queries, deep)
            return res.filter(
                pc.greater_equal(res.column("rank"), query_cfg.offset)
            )
        # collapse duplicate query texts: plan, broadcast, per-shard scoring
        # and merge all scale with DISTINCT queries; results are replicated
        # per original query_id afterwards (bit-identical — scoring is a pure
        # function of the text)
        has_neg = "neg_text" in queries.column_names
        has_must = "must_text" in queries.column_names
        # either half of the cursor pair disables the collapse so a malformed
        # half-cursor batch always reaches make_query_plan's BOTH-columns check
        has_after = (
            "after_score" in queries.column_names
            or "after_doc" in queries.column_names
        )
        texts_all = queries.column("text").to_pylist()
        uniq: dict[str, int] = {}
        rep = np.fromiter(
            (uniq.setdefault(t, len(uniq)) for t in texts_all),
            dtype=np.int64, count=len(texts_all),
        )
        # negated / must / cursored queries skip the text-keyed collapse (the
        # dedup key would need the extra columns; such batches are small)
        if len(uniq) < len(texts_all) and not (has_neg or has_must or has_after):
            dq = pa.table(
                {
                    "query_id": pa.array(np.arange(len(uniq), dtype=np.int64)),
                    "text": pa.array(list(uniq.keys()), type=pa.string()),
                }
            )
            res = self.search(dq, query_cfg)
            return _expand_dedup_results(
                res,
                queries.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64),
                rep, len(uniq),
            )
        if len(queries) > self.MAX_PLAN_QUERIES:
            parts = [
                self.search(queries.slice(i, self.MAX_PLAN_QUERIES), query_cfg)
                for i in range(0, len(queries), self.MAX_PLAN_QUERIES)
            ]
            return pa.concat_tables(parts)
        text_terms: set[str] = set()
        toks_per_query = [tokenize_py(t) for t in queries.column("text").to_pylist()]
        for toks in toks_per_query:
            text_terms.update(toks)
        distinct = set(text_terms)
        if has_neg:  # negation terms need their true df in the plan too
            for t in queries.column("neg_text").to_pylist():
                distinct.update(tokenize_py(t or ""))
        if has_must:  # must terms score, so their df must be real too
            for t in queries.column("must_text").to_pylist():
                distinct.update(tokenize_py(t or ""))
        expansions = None
        fz = getattr(query_cfg, "fuzzy_max_edits", 0)
        if fz:
            if query_cfg.method not in ("taat", "maxscore"):
                raise ValueError(
                    "fuzzy matching is supported on the default scoring "
                    f"methods (taat/maxscore), not method={query_cfg.method!r}"
                )
            expansions = self._fuzzy_expand(sorted(text_terms), fz)
            for s in expansions.values():
                distinct.update(s)
        syn = getattr(query_cfg, "synonyms", None) or None
        if syn:
            if query_cfg.method not in ("taat", "maxscore"):
                raise ValueError(
                    "synonyms are supported on the default scoring methods "
                    f"(taat/maxscore), not method={query_cfg.method!r}"
                )
            if fz:
                raise ValueError("synonyms cannot combine with fuzzy_max_edits")
            if getattr(SCORERS[query_cfg.scorer], "needs_cf", False):
                raise ValueError(
                    f"synonyms are unsupported with scorer {query_cfg.scorer!r} "
                    "(pooled-group cf semantics are ambiguous)"
                )
            for tok in text_terms:
                distinct.update(syn.get(tok, ()))
        boosts = getattr(query_cfg, "boosts", None) or None
        if boosts and query_cfg.method not in ("taat", "maxscore"):
            raise ValueError(
                "term boosts are supported on the default scoring methods "
                f"(taat/maxscore), not method={query_cfg.method!r}"
            )
        missing = sorted(distinct - self._df_cache.keys())
        if missing:
            self._df_cache.update(self._lookup_missing_df(missing))
            for t in missing:  # absent terms -> df 0, cached too
                self._df_cache.setdefault(t, 0)
        term_df = {t: self._df_cache[t] for t in distinct}
        plan = make_query_plan(
            queries, term_df, self._n_docs, self._avgdl, query_cfg.k,
            expansions=expansions, synonyms=syn, boosts=boosts,
            pre_tokens=toks_per_query,
        )
        if getattr(SCORERS[query_cfg.scorer], "needs_cf", False):
            import dataclasses

            from ..state.stats import load_stats as _ls

            if len(getattr(self, "index_dirs", [self.index_dir])) > 1:
                # stacked stacks shadow upserts/tombstones per shard; a
                # driver-side cf sum over generations would double-count
                # shadowed docs — compact first to use a cf-based scorer
                raise ValueError(
                    f"scorer {query_cfg.scorer!r} is unsupported on a "
                    "generation stack; compact the index first"
                )
            st = _ls(self.index_dir)
            plan = dataclasses.replace(
                plan,
                term_cf=load_term_cf(
                    self.index_dir, st["partitions"],
                    sorted(plan.term_idf.keys()), int(st["block_size"]),
                ),
                total_len=int(st["sum_doc_len"]),
            )
        plan_ref = ray.put(plan)
        # small batches keep urls inline (one fewer actor round trip — it
        # would dominate single-query latency); large batches ship packed
        # urlless partials and resolve winner urls post-merge
        inline_urls = len(queries) * query_cfg.k <= _INLINE_URL_ROWS
        futs = [
            a.search_packed.remote(
                plan_ref, query_cfg.scorer, query_cfg.method,
                getattr(query_cfg, "approx_factor", 1.0),
                getattr(query_cfg, "min_should_match", 0),
                getattr(query_cfg, "phrase_slop", 0),
                getattr(query_cfg, "filter_lang", None),
                getattr(query_cfg, "sort_by", None),
                _len_bounds(query_cfg),
                query_cfg.k,
                inline_urls,
            )
            for a in self.actors
        ]
        import pyarrow.compute as pc

        # big batches: fan the k x P x Q merge out by query range — each raw
        # task reads the shard partials zero-copy and merges its slice
        est_rows = len(queries) * len(self.actors) * query_cfg.k
        if est_rows >= _MERGE_FANOUT_ROWS and len(plan.query_ids) > 1:
            n_slices = min(8, max(2, est_rows // _MERGE_FANOUT_ROWS + 1))
            qs_sorted = np.sort(plan.query_ids)
            cuts = [int(qs_sorted[(i * qs_sorted.size) // n_slices]) for i in range(n_slices)]
            # dedupe cut points (repeated qids) while keeping coverage
            bounds = sorted(set(cuts))
            task = ray.remote(num_cpus=1)(_merge_partial_range)
            outs = [
                t for t in ray.get(
                    [
                        task.remote(
                            futs, bounds[i],
                            bounds[i + 1] if i + 1 < len(bounds) else None,
                            query_cfg.k,
                        )
                        for i in range(len(bounds))
                    ]
                )
                if t is not None
            ]
            merged = (
                pa.concat_tables(outs) if outs
                else merge_topk_table(_EMPTY_PACKED_PARTIALS, query_cfg.k)
            )
        else:
            parts = [t for t in ray.get(futs) if t is not None and len(t)]
            merged = merge_topk_table(
                pa.concat_tables(parts) if parts else _EMPTY_PACKED_PARTIALS,
                query_cfg.k,
            )
        if "url" not in merged.column_names:
            merged = self._attach_urls(merged)
        else:  # inline-url path: column order must match the packed path
            merged = merged.select(["query_id", "rank", "doc_id", "url", "score"])
        return merged.take(
            pc.sort_indices(merged, sort_keys=[("query_id", "ascending"), ("rank", "ascending")])
        )

    def _attach_urls(self, merged: pa.Table) -> pa.Table:
        """Resolve the winners' urls from the shard actors' co-resident
        docmaps (one bounded broadcast of the distinct winner ids; each
        actor answers only for ids it owns). The packed serving shuffle
        ships no strings — this is the only url traffic, O(final winners)
        instead of O(k x partitions x queries)."""
        import ray

        doc = merged.column("doc_id").to_numpy(zero_copy_only=False)
        uniq = np.unique(doc)
        urls: pa.Array | pa.ChunkedArray
        if uniq.size:
            ids_ref = ray.put(uniq)
            tabs = [
                t
                for t in ray.get([a.lookup_urls.remote(ids_ref) for a in self.actors])
                if t is not None and len(t)
            ]
        else:
            tabs = []
        if tabs:
            # vectorized join: sort the (id, url) catalog once, dedupe ids
            # (a generation stack can answer the same id from two states),
            # then one searchsorted resolves every output row — no Python
            # dict/listcomp over k x Q rows on the serial driver path
            cat = pa.concat_tables(tabs)
            ids = cat.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids_s = ids[order]
            first = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
            ids_u, pos_u = ids_s[first], order[first]
            loc = np.clip(np.searchsorted(ids_u, doc), 0, max(ids_u.size - 1, 0))
            found = ids_u[loc] == doc
            take = pos_u[loc].astype(np.int64)
            url_col = cat.column("url").combine_chunks()
            urls = url_col.take(
                pa.array(take, type=pa.int64(), mask=~found)
            )
        else:
            urls = pa.array([None] * len(merged), type=pa.string())
        out = {
            "query_id": merged.column("query_id"),
            "rank": merged.column("rank"),
            "doc_id": merged.column("doc_id"),
            "url": urls,
            "score": merged.column("score"),
        }
        return pa.table(out)

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class StackedSearchSession(SearchSession):
    """Serve a GENERATION STACK — [base, delta1, delta2, ...] oldest-first —
    without compacting first, bit-identical to serving the compacted index.

    The Lucene point-in-time-segments analog of the reference's O(insert)
    `add` (Index.h:298-336): `add_documents(..., compact='stack')` only
    builds the delta, and this session resolves upserts at serve time. Three
    pieces make the results exactly equal the compacted index's:
      * shadow masks — older generations drop postings of any doc_id present
        in a newer generation (computed shard-locally; same num_partitions
        means collisions share a partition);
      * global stats — n_docs / avgdl sum the actors' live counts;
      * live df — per-term df is the sum of live posting counts across the
        stack (one RPC per cold term, cached per session).
    """

    def __init__(self, index_dirs: list[str], num_actors: int | None = None,
                 tombstones: list | None = None):
        import ray

        from ..state.stats import load_stats

        assert index_dirs, "empty generation stack"
        self.index_dir = index_dirs[-1]  # newest generation
        self.index_dirs = list(index_dirs)
        # per-generation deleted doc_ids (oldest-first, aligned with
        # index_dirs) from pipelines.ingest.load_tombstones — masked inside
        # the shard actors exactly like newer-generation shadows
        self._tombstones = tombstones
        all_stats = [load_stats(d) for d in index_dirs]
        self.stats = dict(all_stats[-1])
        for st in all_stats:  # same config contract as compact.merge_indexes
            for key in ("num_partitions", "block_size", "analyzer", "scorer", "k1", "b"):
                assert st[key] == self.stats[key], (
                    f"generation stack config mismatch on {key}"
                )
        parts = sorted({int(p) for st in all_stats for p in st["partitions"]})
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n = max(1, min(num_actors or ncpu, len(parts)))
        cls = _shard_actor_cls()
        assign: list[list[int]] = [[] for _ in range(n)]
        for i, p in enumerate(parts):
            assign[i % n].append(p)
        self.actors = [
            cls.remote(self.index_dirs, a, int(self.stats["block_size"]),
                       tombstones=self._tombstones)
            for a in assign
        ]
        counts = ray.get([a.live_counts.remote() for a in self.actors])
        self._n_docs = int(sum(c[0] for c in counts))
        sum_dl = sum(c[1] for c in counts)
        self._avgdl = (sum_dl / self._n_docs) if self._n_docs else 0.0
        self.stats["n_docs"] = self._n_docs
        self.stats["avgdl"] = self._avgdl
        self._df_cache: dict[str, int] = {}

    def _lookup_missing_df(self, missing: list[str]) -> dict[str, int]:
        import ray

        out = {t: 0 for t in missing}
        for part in ray.get([a.live_df.remote(missing) for a in self.actors]):
            for t, n in part.items():
                out[t] += int(n)
        return out

    def _fuzzy_scan(self, terms: list[str], max_edits: int) -> dict[str, set[str]]:
        """Union the expansion over every generation's vocabulary (a term
        first introduced by a delta must still match); the base class's
        per-session cache wraps this miss path."""
        from ..functions.fuzzy import fuzzy_expand_terms

        out: dict[str, set[str]] = {t: set() for t in terms}
        for d in self.index_dirs:
            for t, s in fuzzy_expand_terms(d, terms, max_edits).items():
                out[t] |= s
        return out
