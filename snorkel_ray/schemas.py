"""Arrow schemas for every logical table in the engine (SURVEY.md §1.2).

The reference (fsonntag/snorkel, a fork of HazyResearch/snorkel v0.6–0.7)
keeps all inter-stage state in a SQLAlchemy RDBMS (``snorkel/models/``:
``Context``/``Document``/``Sentence``/``Span``/``Candidate`` plus EAV
annotation tables).  Here each logical table is a ``ray.data.Dataset``
whose blocks are ``pyarrow.Table``s with the schemas below; the
Sentence's parallel token arrays (``snorkel/models/context.py`` ≈L100–220)
map 1:1 onto Arrow ``list<...>`` columns, and the sparse EAV Label table
(``snorkel/models/annotation.py``) becomes a dense fixed-width
``list<int8>`` column (one slot per labeling function).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input (authoritative shape from BASELINE.json `input_hint`)
# ---------------------------------------------------------------------------

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Post-extraction documents.  `text` carries the byte-identity invariant
# (north rule): for a given url the extracted text must be byte-identical
# to the pinned golden extractor output (tests/golden/extract/).
DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.uint64()),  # stable content-free key: hash of url
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),
    ]
)

# One row per sentence; parallel token arrays exactly like the reference
# Sentence model (words / char_offsets / abs_char_offsets).
SENTENCES = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("sent_stable_id", pa.string()),  # "<url>::sentence:<abs_start>:<abs_end>"
        ("abs_char_start", pa.int32()),
        ("text", pa.string()),
        ("words", pa.list_(pa.string())),
        ("char_offsets", pa.list_(pa.int32())),
        ("abs_char_offsets", pa.list_(pa.int32())),
    ]
)

# Entity mentions = persisted Spans (reference `Span(Context)`), plus the
# linker's normalized key.
MENTIONS = pa.schema(
    [
        ("span_stable_id", pa.string()),  # "<url>::span:<abs_start>:<abs_end>"
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("char_start", pa.int32()),  # sentence-relative, inclusive
        ("char_end", pa.int32()),  # sentence-relative, exclusive
        ("word_start", pa.int32()),
        ("word_end", pa.int32()),  # inclusive token index (reference convention)
        ("text", pa.string()),
        ("mention_type", pa.string()),
        ("entity_key", pa.string()),  # normalize_entity_key(text)
    ]
)

_SPAN_STRUCT = pa.struct(
    [
        ("span_stable_id", pa.string()),
        ("char_start", pa.int32()),
        ("char_end", pa.int32()),
        ("word_start", pa.int32()),
        ("word_end", pa.int32()),
        ("text", pa.string()),
        ("entity_key", pa.string()),
    ]
)

# Binary-relation candidates; sentence context is denormalized in
# (SURVEY.md J1) so labeling functions never need a join.
CANDIDATES = pa.schema(
    [
        ("cand_stable_id", pa.string()),
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("pred", pa.string()),
        ("subj", _SPAN_STRUCT),
        ("obj", _SPAN_STRUCT),
        ("sent_text", pa.string()),
        ("sent_words", pa.list_(pa.string())),
        ("sent_char_offsets", pa.list_(pa.int32())),
    ]
)

# Dense label matrix: one list<int8> of length K (votes in {-1, 0, +1}).
LABEL_MATRIX = pa.schema(
    [
        ("cand_stable_id", pa.string()),
        ("L", pa.list_(pa.int8())),
    ]
)

MARGINALS = pa.schema(
    [
        ("cand_stable_id", pa.string()),
        ("p", pa.float32()),
    ]
)

ALIAS_DICT = pa.schema(
    [
        ("alias", pa.string()),
        ("entity_qid", pa.string()),
        ("prior", pa.float32()),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_qid", pa.string()),
        ("obj_qid", pa.string()),
        ("p", pa.float32()),
        ("url", pa.string()),
        ("sent_stable_id", pa.string()),
    ]
)
