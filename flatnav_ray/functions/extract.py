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
    after extraction (SURVEY.md §7 'wide rows')."""
    html = batch.column("html")
    has_text = "text" in batch.column_names
    texts: list[str | None] = []
    html_py = html.to_pylist()
    old_text = batch.column("text").to_pylist() if has_text else [None] * len(html_py)
    for h, t in zip(html_py, old_text):
        if h is None:
            texts.append(t)
        else:
            texts.append(extract_text_bytes(h))
    cols = {name: batch.column(name) for name in batch.column_names if name not in ("html", "text")}
    cols["text"] = pa.array(texts, type=pa.string())
    return pa.table(cols)
