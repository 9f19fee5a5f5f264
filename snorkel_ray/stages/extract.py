"""HTML → visible text extraction (the flagship per-row invariant).

Behavioral spec pinned per SURVEY.md §0/§7.6 — the reference mount was
empty, so the contract follows Snorkel's ``HTMLDocPreprocessor``
(``snorkel/parser/doc_preprocessors.py`` ≈L190–230): parse the HTML,
collect the text of paragraph-level (block) elements in document order,
drop ``<script>``/``<style>`` content and comments, skip
whitespace-only blocks, and join blocks with a single ``"\n"``.  Golden
outputs are frozen under ``tests/golden/extract/``; those goldens ARE
the reference for the north-rule byte-identity-per-url invariant.

Implementation notes (all stdlib, deterministic):
- ``html.parser.HTMLParser`` with ``convert_charrefs=True`` resolves
  entity/char references (``&amp;`` → ``&``) before we see the data.
- A block boundary (open OR close of a block-level tag, or ``<br>``)
  flushes the current inline text buffer as one block.
- Inline tags (``<b> <i> <a> <span> ...``) do not break text.
- Within a block, runs of whitespace collapse to one space and the
  block is stripped — HTML source indentation must not leak into text.
- Malformed nesting is tolerated: close tags without opens are treated
  as boundaries only if block-level; ``</script>`` always re-enables
  text collection (html.parser guarantees CDATA handling for
  script/style).

Distribution: pure stateless function → ``map_batches`` over zero-copy
Arrow batches.  Giant pages (row-size skew) are handled upstream by
block-size targeting, not here — the function is O(len(html)).
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

# Paragraph-level elements: opening or closing one of these ends the
# current text block. This is the frozen spec list — do not extend
# without re-freezing the goldens.
BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption center dd details dir div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li
    main menu nav ol option p pre section summary table tbody td tfoot th thead title
    tr ul""".split()
)

# Content inside these is dropped entirely.
SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})

VOID_BREAK_TAGS = frozenset({"br", "hr"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if self._buf:
            # collapse whitespace runs, strip block edges
            text = " ".join("".join(self._buf).split())
            self._buf.clear()
            if text:
                self.blocks.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            self._flush()
        elif tag in BLOCK_TAGS or tag in VOID_BREAK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            self._flush()
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in SKIP_TAGS:  # self-closed skip tag encloses nothing
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def html_to_text(html: bytes | str) -> str:
    """Extract visible text from one HTML document (bytes are utf-8,
    errors replaced). Pure and deterministic — the byte-identity unit."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is robust, but never let one malformed page kill a
        # 100 TB run: fall back to whatever was collected.
        p._flush()
    return "\n".join(p.blocks)


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` body: pages(url, warc_ts, html, lang) → docs.

    Python-loop over rows is unavoidable (HTML parsing is not
    vectorizable), but everything around it stays Arrow: input buffers
    are zero-copy and the output is built column-at-once.
    """
    from ..functions.ids import doc_id_of_url

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = [html_to_text(h) for h in htmls]
    doc_ids = np.fromiter((doc_id_of_url(u) for u in urls), dtype=np.uint64, count=len(urls))
    return pa.table(
        {
            "url": batch.column("url"),
            "doc_id": pa.array(doc_ids, type=pa.uint64()),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def extract_docs(pages, *, batch_size: int | None = None):
    """pages Dataset → docs Dataset.

    ``batch_size=None`` (default) processes whole blocks: forcing a
    fixed batch size makes Ray slice and re-concatenate blocks at every
    chained stage (copies of the html column, the widest data in the
    system).  Memory per task is bounded by the BLOCK size — tune
    ``DataContext.target_max_block_size`` / reader block count for
    giant-page corpora, not this parameter.
    """
    return pages.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
