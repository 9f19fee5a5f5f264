"""Document chunking for training-data pipelines: split each document
into fixed-size character windows with optional overlap — the step
between curation and sequence packing (``stages/sampling.py``) when
documents exceed the model context.

Reference analog: the per-document span windowing the snorkel contexts
layer performs when materializing candidate windows
(``snorkel/models/context.py`` ≈L200 — char-offset span arithmetic);
here it is a corpus-wide streaming transform.

Scale notes: pure ``map_batches`` flat-map — no shuffle, no state, rows
only ever expand locally (output ≈ input × len/stride), so the
streaming executor's backpressure handles 100 TB by construction.  The
kernel is vectorized PER CHUNK LEVEL (one ``utf8_slice_codeunits`` over
every doc long enough to have a k-th chunk), not per row; a single
giant document degenerates to 1-row levels but stays bounded by its
own length.  Pair with ``skew.py::route_giant_rows`` upstream if the
corpus has multi-GB outliers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_documents"]


def chunk_documents(ds, *, size: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text",
                    out_id: str = "chunk_id", out_text: str = "chunk_text"):
    """One row per (document, chunk): chunk k covers characters
    ``[k*stride, k*stride + size)`` with ``stride = size - overlap``;
    every character position below ``len(text)`` starts ≤1 chunk, the
    final chunk may be short, empty/null texts produce no rows — the
    exact semantics of the SQL mirror::

        SELECT doc_id, i AS chunk_id,
               substring(text, i*stride + 1, size) AS chunk_text
        FROM docs, generate_series(0, (length(text)-1)//stride) t(i)
        WHERE length(text) > 0

    Slicing is by code point on both sides (Arrow
    ``utf8_slice_codeunits`` ≡ SQL ``substring`` character offsets)."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    stride = size - overlap

    def _f(b: pa.Table) -> pa.Table:
        lens = np.asarray(
            pc.fill_null(pc.utf8_length(b.column(text_col)), 0),
            dtype=np.int64)
        schema = pa.schema([
            pa.field(id_col, b.schema.field(id_col).type),
            pa.field(out_id, pa.int64()),
            pa.field(out_text, pa.string()),
        ])
        if not len(b) or not lens.max():
            return schema.empty_table()
        # narrow progressively: docs with a (k+1)-th chunk are a subset
        # of docs with a k-th chunk, so each level filters the PREVIOUS
        # survivors — total work is output-sized, and one giant doc in
        # a batch of shorts costs O(its own chunks), not
        # O(chunks x batch rows) (review r5)
        pieces = []
        k = 0
        sub = b.select([id_col, text_col])
        sub_lens = lens
        mask = sub_lens > 0
        while mask.any():
            if not mask.all():
                keep = pa.array(mask)
                sub = sub.filter(keep)
                sub_lens = sub_lens[mask]
            start = k * stride
            chunk = pc.utf8_slice_codeunits(
                pc.cast(sub.column(text_col), pa.string()),
                start=start, stop=start + size)
            pieces.append(pa.table({
                id_col: sub.column(id_col),
                out_id: pa.array(np.full(len(sub), k, dtype=np.int64)),
                out_text: chunk,
            }, schema=schema))
            k += 1
            mask = sub_lens > k * stride
        return pa.concat_tables(pieces)

    return ds.map_batches(_f, batch_format="pyarrow")
