"""HTML -> text extraction — the per-row ingest transform (SURVEY.md §2.2 M1).

The graft of the reference's `transformData` ingest normalizer
(/root/reference/include/flatnav/distances/DistanceInterface.h:45-52 — the one
transform applied to every record on its way into the index). The contract
from BASELINE.json input_hint: extracted text must be **byte-identical per
url** to the golden `text` column; the extractor is therefore a pure, versioned
function of `html` with no environment dependence.

Extraction rule (EXTRACTOR_VERSION v1):
  * consider only the <body>,
  * drop <nav>…</nav>, <header>…</header>, <footer>…</footer>, <script>,
    <style> subtrees (boilerplate),
  * the document text is the concatenation of <p>…</p> and <h1..h6>…</h6>
    contents in document order, joined by a single '\n',
  * HTML entities (&amp; &lt; &gt; &quot; &#39;) are unescaped.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

EXTRACTOR_VERSION = "v1"

_BODY = re.compile(rb"<body[^>]*>(.*?)</body>", re.DOTALL)
_BOILER = re.compile(
    rb"<(nav|header|footer|script|style)[^>]*>.*?</\1>", re.DOTALL
)
_CONTENT = re.compile(rb"<(p|h[1-6])[^>]*>(.*?)</\1>", re.DOTALL)

_UNESCAPES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # last, so '&amp;lt;' -> '&lt;' (standard order)
]


def escape_text(text: str) -> str:
    """The inverse used by the synthetic corpus generator."""
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def extract_text_bytes(html: bytes) -> str:
    """Pure extraction of one document. Deterministic; see module docstring."""
    m = _BODY.search(html)
    body = m.group(1) if m else html
    body = _BOILER.sub(b"", body)
    parts = [mm.group(2) for mm in _CONTENT.finditer(body)]
    out = b"\n".join(parts)
    for esc, raw in _UNESCAPES:
        out = out.replace(esc, raw)
    return out.decode("utf-8")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches(batch_format="pyarrow") stage: pages(html) -> + text column.

    Rows whose `html` is null keep their existing `text` (the already-extracted
    adapter path, FIXTURES.md §4). Drops the heavy `html` column immediately
    after extraction (SURVEY.md §7 'wide rows').

    The per-document work is `extract_text_bytes` (the byte-identity spec);
    the batch path feeds it zero-copy memoryview slices of the Arrow binary
    buffer — no `.to_pylist()` round-trip, so the only bytes materialized per
    document are the matched content spans (this is the heaviest per-byte
    stage of the build; tests assert the two paths are byte-identical)."""
    html = batch.column("html")
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    has_text = "text" in batch.column_names
    n = len(html)
    cols = {name: batch.column(name) for name in batch.column_names if name not in ("html", "text")}
    if html.null_count == n:  # pure adapter path: text already extracted
        cols["text"] = batch.column("text") if has_text else pa.nulls(n, pa.string())
        return pa.table(cols)
    if pa.types.is_large_binary(html.type):
        offs = np.frombuffer(html.buffers()[1], dtype=np.int64)[html.offset : html.offset + n + 1]
    else:
        offs = np.frombuffer(html.buffers()[1], dtype=np.int32)[html.offset : html.offset + n + 1]
    valbuf = html.buffers()[2]
    mv = memoryview(valbuf) if valbuf is not None else memoryview(b"")
    valid = np.asarray(html.is_valid()) if html.null_count else None
    old_text = batch.column("text").to_pylist() if has_text else [None] * n
    texts: list[str | None] = [
        extract_text_bytes(mv[offs[i] : offs[i + 1]])
        if (valid is None or valid[i])
        else old_text[i]
        for i in range(n)
    ]
    cols["text"] = pa.array(texts, type=pa.string())
    return pa.table(cols)
