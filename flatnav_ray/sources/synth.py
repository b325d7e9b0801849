"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

The analog of the reference's fixed-parameter random test corpora
(/root/reference/include/flatnav/tests/test_serialization.cpp:19-34,
python-bindings/unit_tests/test_index.py:15-18) and of its dataset converter
scripts (convert_*_datasets.py -> SURVEY.md §2.1 S4/S5): all fixtures are
seeded, chunk-addressable (chunk i reproducible without generating chunks
0..i-1) and network-free.

html is generated FROM text via the same escape/template the extractor
inverts, so `extract(html) == text` byte-identically per url — the per-row
invariant the north rule requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import escape_text

# head of the vocabulary: stopword-like common terms (exercise Zipf head /
# heavy-hitter salting); tail: synthetic alnum terms.
_STOPWORDS = (
    "the of and to a in is it you that he was for on are with as i his they "
    "be at one have this from or had by hot word but what some we can out "
    "other were all there when up use your how said an each she"
).split()

VOCAB_SEED = 7
LANGS = ["en", "de", "fr", "es", "zh"]


def make_vocab(size: int = 50_000) -> list[str]:
    vocab = list(_STOPWORDS)
    i = 0
    while len(vocab) < size:
        vocab.append(f"w{i:06d}")
        i += 1
    return vocab[:size]


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


class PagesGenerator:
    """Seeded generator; `chunk(i, rows)` is pure in (seed, i, rows)."""

    def __init__(
        self,
        seed: int = 42,
        vocab_size: int = 50_000,
        n_domains: int = 1000,
        mean_len: float = 400.0,
        dup_rate: float = 0.03,
        zipf_s: float = 1.07,
    ):
        self.seed = seed
        self.vocab = np.array(make_vocab(vocab_size), dtype=object)
        self.term_p = _zipf_probs(vocab_size, zipf_s)
        self.domain_p = _zipf_probs(n_domains, 1.1)
        self.n_domains = n_domains
        self.mean_len = mean_len
        self.dup_rate = dup_rate
        # lognormal parameterized to hit mean_len on average
        self.sigma = 0.6
        self.mu = np.log(mean_len) - self.sigma**2 / 2

    def chunk(self, chunk_idx: int, rows: int) -> pa.Table:
        rng = np.random.Generator(np.random.PCG64(self.seed * 1_000_003 + chunk_idx))
        domains = rng.choice(self.n_domains, size=rows, p=self.domain_p)
        # unique path per (chunk, row) => unique url per logical page
        urls = [
            f"https://d{d:04d}.example.com/c{chunk_idx}/p{i}"
            for i, d in enumerate(domains)
        ]
        lens = np.maximum(1, rng.lognormal(self.mu, self.sigma, size=rows).astype(np.int64))
        langs = np.where(
            rng.random(rows) < 0.90,
            "en",
            np.array(LANGS[1:], dtype=object)[rng.integers(0, len(LANGS) - 1, size=rows)],
        )
        texts = []
        for i in range(rows):
            terms = rng.choice(self.vocab, size=int(lens[i]), p=self.term_p)
            # sentences of ~12 terms joined with '. ', paragraphs of ~5
            # sentences joined with '\n'
            words = terms.tolist()
            sents = [" ".join(words[j : j + 12]) for j in range(0, len(words), 12)]
            paras = [". ".join(sents[j : j + 5]) for j in range(0, len(sents), 5)]
            texts.append("\n".join(paras))
        # recrawl duplicates: re-emit some earlier urls with later timestamps
        # and different (superseded) text
        n_dup = int(rows * self.dup_rate)
        base_ts = np.int64(1735689600_000000)  # 2025-01-01T00:00:00Z in us
        ts = base_ts + rng.integers(0, 300 * 86400, size=rows).astype(np.int64) * 1_000_000
        if n_dup > 0 and rows > 1:
            dup_src = rng.integers(0, rows, size=n_dup)
            for j, src in enumerate(dup_src):
                tgt = (int(src) + 1 + j) % rows
                urls[tgt] = urls[int(src)]
                # ensure strict timestamp order so "keep latest" is well defined
                ts[tgt] = ts[int(src)] + 1 + j
        htmls = [self.render_html(u, t) for u, t in zip(urls, texts)]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs.tolist(), type=pa.string()),
            }
        )

    @staticmethod
    def render_html(url: str, text: str) -> bytes:
        """Template whose extraction (extract.py v1) returns `text` exactly."""
        paras = "".join(f"<p>{escape_text(p)}</p>\n" for p in text.split("\n"))
        doc = (
            "<html><head><title>"
            + escape_text(url)
            + '</title><meta charset="utf-8"><style>p{margin:0}</style></head>\n'
            + "<body>\n"
            + '<nav><a href="/">home</a> | <a href="/about">about</a></nav>\n'
            + "<header>site banner</header>\n"
            + paras
            + "<footer>&copy; 2025 example.com — all rights reserved</footer>\n"
            + "</body></html>"
        )
        return doc.encode("utf-8")


def pages_table(rows: int, seed: int = 42, chunk_rows: int = 2000, **kw) -> pa.Table:
    """Materialize a pages fixture table (driver-side, small scales)."""
    gen = PagesGenerator(seed=seed, **kw)
    chunks = []
    i = 0
    while rows > 0:
        c = min(chunk_rows, rows)
        chunks.append(gen.chunk(i, c))
        rows -= c
        i += 1
    return pa.concat_tables(chunks)


def pages_dataset(rows: int, seed: int = 42, chunk_rows: int = 2000, **kw):
    """Distributed generation: Dataset of chunk specs -> map_batches generate.

    Scales to arbitrary corpus size without materializing on the driver
    (each chunk is re-derivable from (seed, chunk_idx) alone — also how a
    failed generation task re-executes deterministically under Ray lineage)."""
    import ray.data

    n_chunks = (rows + chunk_rows - 1) // chunk_rows
    specs = [
        {"chunk_idx": i, "rows": min(chunk_rows, rows - i * chunk_rows)}
        for i in range(n_chunks)
    ]

    def _gen(batch: pa.Table) -> pa.Table:
        gen = PagesGenerator(seed=seed, **kw)
        outs = [
            gen.chunk(int(ci), int(r))
            for ci, r in zip(batch.column("chunk_idx").to_pylist(), batch.column("rows").to_pylist())
        ]
        return pa.concat_tables(outs)

    return (
        ray.data.from_items(specs)
        .map_batches(_gen, batch_format="pyarrow", batch_size=1)
    )


def queries_table(n_queries: int, seed: int = 43, vocab_size: int = 50_000) -> pa.Table:
    """Reference query set (FIXTURES.md §2): 1-5 terms; 60% head / 30% mixed /
    10% rare-or-absent terms."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array(make_vocab(vocab_size), dtype=object)
    texts = []
    for _ in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        bucket = rng.random()
        if bucket < 0.6:
            pool = np.arange(0, min(200, max(vocab_size // 10, 1)))
        elif bucket < 0.9:
            pool = np.arange(0, min(5000, max(vocab_size // 2, 1)))
        else:
            pool = np.arange(max(vocab_size - 2000, vocab_size * 4 // 5), vocab_size)
        idx = rng.choice(pool, size=n_terms, replace=True)
        texts.append(" ".join(vocab[idx].tolist()))
    return pa.table(
        {
            "query_id": pa.array(np.arange(n_queries, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
