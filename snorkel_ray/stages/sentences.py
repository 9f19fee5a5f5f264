"""Rule-based sentence splitting + tokenization (SURVEY.md M1/M4).

Reference: ``snorkel/parser/rule_parser.py`` ≈L1–120 (``RuleBasedParser``
+ ``RegexTokenizer``) — regex sentence split and regex word tokenize,
emitting the Sentence's parallel arrays ``words`` / ``char_offsets`` /
``abs_char_offsets`` (``snorkel/models/context.py`` ≈L100–220).  No
spaCy/CoreNLP in this environment (SURVEY.md §0), so this deterministic
rule path is the primary parser; a spaCy-style actor-pool parser can be
plugged in behind the same schema later.

Spec (frozen; offset-exact):
- Block boundaries (``\\n`` from the extractor) always end a sentence.
- Within a block, split after ``[.!?]+`` followed by whitespace, unless
  the previous token is a known abbreviation or a single initial
  ("J. Smith", "Corp."), or the next non-space char is lowercase.
- Tokens: ``\\w+([-']\\w+)*`` words or single non-space punctuation
  chars; ``char_offsets`` are sentence-relative, ``abs_char_offsets``
  document-absolute (both refer to the extracted ``text``).

Distribution: stateless ``map_batches`` (tasks); one input doc row
explodes to N sentence rows — done columnar, one output table per
batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.ids import construct_stable_id

_TOKEN_RE = re.compile(r"\w+(?:[-']\w+)*|[^\w\s]", re.UNICODE)
_BOUNDARY_RE = re.compile(r"[.!?]+(?=\s)")
# lowercase forms that do NOT end a sentence when followed by "."
ABBREVIATIONS = frozenset(
    "corp inds sys hldgs ltd inc co mr mrs ms dr prof st no vs etc eg ie jr sr".split()
)
_PREV_TOKEN_RE = re.compile(r"(\S+)$")


def split_sentences(text: str) -> list[tuple[int, str]]:
    """→ [(abs_char_start, sentence_text)]; deterministic, offset-exact."""
    out: list[tuple[int, str]] = []
    line_start = 0
    for line in text.split("\n"):
        bounds = [0]
        for m in _BOUNDARY_RE.finditer(line):
            end = m.end()
            prev = _PREV_TOKEN_RE.search(line, bounds[-1], m.start())
            if prev:
                tok = prev.group(1).rstrip(".").casefold()
                if tok in ABBREVIATIONS or (len(tok) == 1 and tok.isalpha()):
                    continue
            nxt = line[end:].lstrip()
            if nxt and (nxt[0].islower() or nxt[0] == ","):
                continue
            bounds.append(end)
        bounds.append(len(line))
        for a, b in zip(bounds, bounds[1:]):
            seg = line[a:b]
            sent = seg.strip()
            if sent:
                pad = len(seg) - len(seg.lstrip())
                out.append((line_start + a + pad, sent))
        line_start += len(line) + 1  # +1 for the "\n"
    return out


def tokenize(sent: str) -> tuple[list[str], list[int]]:
    """→ (words, sentence-relative char offsets)."""
    words: list[str] = []
    offs: list[int] = []
    for m in _TOKEN_RE.finditer(sent):
        words.append(m.group(0))
        offs.append(m.start())
    return words, offs


def sentences_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()

    o_doc, o_url, o_idx, o_sid, o_abs = [], [], [], [], []
    o_text, o_words, o_off, o_aoff = [], [], [], []
    for did, url, text in zip(doc_ids, urls, texts):
        for idx, (abs_start, sent) in enumerate(split_sentences(text)):
            words, offs = tokenize(sent)
            o_doc.append(did)
            o_url.append(url)
            o_idx.append(idx)
            o_sid.append(construct_stable_id(url, "sentence", abs_start, abs_start + len(sent)))
            o_abs.append(abs_start)
            o_text.append(sent)
            o_words.append(words)
            o_off.append(offs)
            o_aoff.append([abs_start + o for o in offs])

    return pa.table(
        {
            "doc_id": pa.array(np.asarray(o_doc, dtype=np.uint64), pa.uint64()),
            "url": pa.array(o_url, pa.string()),
            "sent_idx": pa.array(o_idx, pa.int32()),
            "sent_stable_id": pa.array(o_sid, pa.string()),
            "abs_char_start": pa.array(o_abs, pa.int32()),
            "text": pa.array(o_text, pa.string()),
            "words": pa.array(o_words, pa.list_(pa.string())),
            "char_offsets": pa.array(o_off, pa.list_(pa.int32())),
            "abs_char_offsets": pa.array(o_aoff, pa.list_(pa.int32())),
        }
    )


def split_docs_to_sentences(docs, *, batch_size: int | None = None):
    """docs Dataset → sentences Dataset (stateless tasks)."""
    return docs.map_batches(sentences_batch, batch_format="pyarrow", batch_size=batch_size)
