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

# Batch variants of the same grammar as RE2 (pyarrow.compute) kernel passes —
# capture-free, so RE2 stays on its DFA (no NFA submatch pass): the body is
# isolated with an existence mask + anchored head/tail strips
# (max_replacements=1), boilerplate with one replace-all, and content spans
# are wrapped in \x01 sentinels via a whole-match (\0) rewrite, then selected
# and tag-stripped vectorized. RE2 has no backreferences, so the `</\1>`
# patterns are expanded per tag — each alternative pins its own closing tag,
# which is exactly the backreference semantics. Leftmost, first-alternative,
# non-overlapping scanning matches Python re's sub/finditer behavior; the
# fuzz pytest holds the two paths byte-identical.
_TAGS = ("p", "h1", "h2", "h3", "h4", "h5", "h6")
_BODY_FULL = r"(?s)<body[^>]*>.*?</body>"
_HEAD_STRIP = r"(?s)^.*?<body[^>]*>"
_TAIL_STRIP = r"(?s)</body>.*$"
_BOILER_ALL = "|".join(
    rf"(?s)<{t}[^>]*>.*?</{t}>" for t in ("nav", "header", "footer", "script", "style")
)
_CONTENT_ALL = "(?s)" + "|".join(rf"<{t}[^>]*>.*?</{t}>" for t in _TAGS)
_OPENER = r"^<(?:p|h[1-6])[^>]*>"
_CLOSER = r"</(?:p|h[1-6])>$"

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

    `extract_text_bytes` is the byte-identity SPEC (and the per-row fallback);
    the hot path is `_extract_re2` — capture-free RE2 kernel passes over the
    whole binary column, one C-level pass per grammar stage instead of one
    Python regex call per row (this is the heaviest per-byte stage of the
    build; tests assert the two paths are byte-identical)."""
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
    lo, hi = int(offs[0]), int(offs[-1])
    # a \x01 byte inside a document would collide with the content sentinel
    # the RE2 path wraps matches in — fall back to the scalar spec for such
    # (vanishingly rare) batches rather than risk byte divergence
    has_sentinel = hi > lo and (
        np.frombuffer(mv, dtype=np.uint8, count=hi - lo, offset=lo) == 1
    ).any()
    if has_sentinel:
        old_text = batch.column("text").to_pylist() if has_text else [None] * n
        texts: list[str | None] = [
            extract_text_bytes(mv[offs[i] : offs[i + 1]])
            if (valid is None or valid[i])
            else old_text[i]
            for i in range(n)
        ]
        cols["text"] = pa.array(texts, type=pa.string())
        return pa.table(cols)
    extracted = _extract_re2(html)
    if valid is not None and has_text:
        # null-html rows keep their already-extracted text (adapter path)
        cols["text"] = pa.compute.if_else(
            pa.array(valid), extracted, batch.column("text")
        )
    else:
        cols["text"] = extracted
    return pa.table(cols)


def _extract_re2(html: pa.Array) -> pa.Array:
    """Vectorized extraction: capture-free RE2 kernel passes over the whole
    binary column (see the _*_ALL pattern block for the construction)."""
    import pyarrow.compute as pc

    work = pc.fill_null(html, b"")  # nulls masked back to old text by caller
    mask = pc.match_substring_regex(work, _BODY_FULL)
    span = pc.replace_substring_regex(
        work, pattern=_HEAD_STRIP, replacement=b"", max_replacements=1
    )
    span = pc.replace_substring_regex(
        span, pattern=_TAIL_STRIP, replacement=b"", max_replacements=1
    )
    body = pc.if_else(mask, span, work)  # no <body> -> whole document
    body = pc.replace_substring_regex(body, pattern=_BOILER_ALL, replacement=b"")
    marked = pc.replace_substring_regex(
        body, pattern=_CONTENT_ALL, replacement=b"\x01\\0\x01"
    )
    lists = pc.split_pattern(marked, pattern=b"\x01")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    offs = np.asarray(lists.offsets, dtype=np.int64)
    counts = offs[1:] - offs[:-1]
    # within each split list, the odd positions are the wrapped content spans
    pos = np.arange(offs[-1] - offs[0], dtype=np.int64) - np.repeat(offs[:-1] - offs[0], counts)
    pieces = flat.filter(pa.array((pos % 2).astype(bool)))
    pieces = pc.replace_substring_regex(
        pieces, pattern=_OPENER, replacement=b"", max_replacements=1
    )
    pieces = pc.replace_substring_regex(
        pieces, pattern=_CLOSER, replacement=b"", max_replacements=1
    )
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()
    new_offs = np.concatenate(([0], np.cumsum(counts // 2)))
    out_lists = pa.ListArray.from_arrays(
        pa.array(new_offs, type=pa.int32()), pieces
    )
    joined = pc.binary_join(out_lists, b"\n")
    for esc, raw in _UNESCAPES:
        joined = pc.replace_substring(joined, pattern=esc, replacement=raw)
    return joined.cast(pa.string())
