"""flatnav-ft: a Ray-Data-native full-text (inverted index + BM25 top-k) engine.

Re-expresses the capability surface of the flatnav ANN index
(BlaiseMuhirwa/flatnav, /root/reference) — bulk ingest -> build a compressed
queryable index with explicit parallelism -> serve top-k queries -> persist /
load -> verify against ground truth -> benchmark — on Ray Data, with web pages
as the payload and a partitioned inverted index with BM25 scoring as the index
(see SURVEY.md for the full operator mapping).

Layout:
    functions/  pure vectorized kernels (tokenize, codec, bm25, hashes, text)
    sources/    synthetic corpus generator + table adapters
    stages/     Dataset-level transforms (dedup, build, search, knn, ...)
    pipelines/  end-to-end build / query pipelines + brute-force oracle
    state/      manifests, global stats, checkpoint-resume
"""

__version__ = "0.1.0"
