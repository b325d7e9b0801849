"""Engine configuration — the tuning-knob surface (SURVEY.md §2.10).

Graft of the reference's knobs (M / ef_construction / ef_search /
num_initializations / num_threads, /root/reference/python-bindings/src/flatnav/
bindings.cpp:484-504): here the knobs are partition count, codec block size,
BM25 parameters, analyzer version and actor-pool sizing.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass

from .functions.codec import BLOCK_SIZE
from .functions.tokenize import ANALYZER_VERSION
from .functions.extract import EXTRACTOR_VERSION


@dataclass(frozen=True)
class IndexConfig:
    num_partitions: int = 16
    block_size: int = BLOCK_SIZE
    k1: float = 1.2
    b: float = 0.75
    scorer: str = "bm25"
    analyzer: str = ANALYZER_VERSION
    extractor: str = EXTRACTOR_VERSION
    langs: tuple[str, ...] | None = None  # optional lang filter at build
    layout: str = "doc"  # "doc" (shard-per-doc-partition) or "term"
    # docid assignment (SURVEY.md O4 — the graft of flatnav's reorder():
    # gorder/rcm cache-locality orderings, Reordering.h:27-200):
    #   "hash"      — stable hash(url): parallelism- and partition-count-
    #                 independent ids (determinism tests rely on this)
    #   "dense_url" — per-partition url-sorted dense ids interleaved by
    #                 partition (id % P == partition): posting deltas become
    #                 small constants -> much better varint compression
    #   "gorder"    — Gorder sliding-window ordering (Reordering.h:27-117
    #                 graft) over the shared-term doc-similarity graph:
    #                 docs sharing rare terms get adjacent ids, shrinking
    #                 per-term posting deltas (stages/reorder.py)
    #   "rcm"       — reverse Cuthill–McKee BFS ordering over the same graph
    #                 (Reordering.h:120-200 graft): O(V+E) locality pass
    #   "gorder+rcm" (etc.) — '+'-sequenced graph strategies, applied
    #                 successively on the relabeled graph — the reference's
    #                 reorder(strategies=[...]) list (bindings.cpp:285-295)
    docid_strategy: str = "hash"

    def fingerprint(self) -> str:
        """Stable hash of everything that affects index bytes — manifest rows
        carry it so a resume never mixes configs."""
        d = asdict(self)
        d["langs"] = list(self.langs) if self.langs else None
        return hashlib.blake2b(
            json.dumps(d, sort_keys=True).encode(), digest_size=8
        ).hexdigest()


@dataclass(frozen=True)
class QueryConfig:
    k: int = 10
    # pagination: skip the first `offset` ranked results and return the next
    # k (ranks offset..offset+k-1, GLOBAL rank numbers kept — page 2 of a
    # result list). Internally shards return top-(offset+k) partials and the
    # final merge slices, so deep pages cost O(offset+k) per shard, never a
    # full re-sort.
    offset: int = 0
    # "taat"/"maxscore": cached exact; "wand": block-max pruned exact;
    # "and": conjunctive posting-list intersection (match ALL terms);
    # "phrase": exact phrase (adjacent tokens, positional sidecar required —
    # stages/positions.py build_position_sidecar)
    method: str = "maxscore"
    # >0: a doc must match at least this many distinct query terms
    # (Lucene minimum_should_match analog; n_terms == conjunctive AND,
    # 1 == plain disjunction). Ignored by method="and"/"wand".
    min_should_match: int = 0
    # method="phrase" proximity: consecutive phrase tokens may be up to
    # 1+slop positions apart, in order (0 = exact adjacency). The per-gap
    # proximity analog of Lucene's slop knob.
    phrase_slop: int = 0
    # sort-by-field: rank MATCHING docs by a stored docmap attribute instead
    # of relevance (the ORDER BY serving surface). Supported: "doc_len"
    # (descending, doc_id-asc ties); the result's score column carries the
    # attribute value. Default scoring methods only (taat/maxscore).
    sort_by: str | None = None
    # fuzzy matching (Lucene term~1): 1 = expand every query token to all
    # dictionary terms within Levenshtein distance 1 (functions/fuzzy.py)
    # and score the disjunction, each match with its own idf. Default
    # scoring methods only (taat/maxscore). Only max_edits=1 is supported.
    fuzzy_max_edits: int = 0
    # filtered search: restrict candidates to docs with this docmap lang
    # (idf/avgdl stay corpus-wide — a filter, not a sub-corpus). Default
    # scoring methods only (taat/maxscore).
    filter_lang: str | None = None
    # numeric range filter: restrict candidates to docs whose doc_len
    # (token count) lies in [filter_len_min, filter_len_max], inclusive;
    # None = unbounded on that side. Composes with filter_lang (AND).
    filter_len_min: int | None = None
    filter_len_max: int | None = None
    concurrency: int = 8
    scorer: str = "bm25"
    # query-time synonym map (Lucene SynonymQuery): token -> synonym terms.
    # Each query token scores as ONE group over {token} | synonyms[token]:
    # per-doc tf = sum of member tfs, df = max of member global dfs — BM25
    # saturation applies once to the pooled tf (NOT a disjunction of
    # independently-scored terms; that is what fuzzy does). The index stays
    # literal; expansion is query-side only. Default scoring methods only
    # (taat/maxscore); mutually exclusive with fuzzy_max_edits / must_text.
    synonyms: dict[str, tuple[str, ...]] | None = None
    # per-term query boosts (Lucene term^boost): term -> multiplier applied
    # to that term's score contribution AFTER tf saturation. Keyed on
    # literal index terms (under fuzzy, the expanded term). Default scoring
    # methods only (taat/maxscore); mutually exclusive with synonyms.
    boosts: dict[str, float] | None = None
    # quality/speed knob — the ef_search graft (reference: bindings.cpp:432-473,
    # Index.h:387-409 `max(ef_search, K)` beam width). 1.0 = exact top-k.
    # >1.0 inflates the wand pruning threshold: more blocks skipped, recall
    # may drop below 1 (measure with pipelines.oracle.recall_at_k).
    approx_factor: float = 1.0
