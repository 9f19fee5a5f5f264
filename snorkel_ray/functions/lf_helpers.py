"""LF helper library (SURVEY.md M14).

Reference: ``snorkel/lf_helpers.py`` ≈L1–150 — ``get_tagged_text``
("{{A}}…{{B}}" markers), ``get_text_between``, ``get_between_tokens``,
``get_left_tokens``, ``get_right_tokens``, ``contains_token``,
``get_text_splits``.  Here they operate on the denormalized candidate
row namespace (columns from ``stages/candidates.CANDIDATE_COLUMNS``)
instead of walking ORM foreign keys — usable inside ``row_lf``-wrapped
user LFs and in vectorized LFs via the ``*_cols`` variants.
"""

from __future__ import annotations

from typing import Sequence


def get_between_tokens(row) -> list[str]:
    """Tokens strictly between subj and obj (casefolded)."""
    return row.between_text.split() if row.between_text else []


def get_text_between(row) -> str:
    return row.between_text


def get_left_tokens(row, window: int = 3) -> list[str]:
    """Up to ``window`` tokens left of the subject span."""
    toks = row.pre_text.split() if row.pre_text else []
    return toks[-window:]


def get_right_tokens(row, window: int = 3) -> list[str]:
    """Up to ``window`` tokens right of the object span."""
    words = row.sent_text.split()
    # obj_word_end indexes the tokenizer's words; whitespace split is an
    # approximation only used for windowing, so recompute from offsets:
    return words[max(0, len(words) - window):] if not hasattr(row, "obj_word_end") \
        else _right_tokens_exact(row, window)


def _right_tokens_exact(row, window: int) -> list[str]:
    from ..stages.sentences import tokenize

    words, _ = tokenize(row.sent_text)
    start = int(row.obj_word_end) + 1
    return [w.casefold() for w in words[start : start + window]]


def contains_token(row, token: str) -> bool:
    token = token.casefold()
    from ..stages.sentences import tokenize

    words, _ = tokenize(row.sent_text)
    return token in (w.casefold() for w in words)


def get_tagged_text(row) -> str:
    """Sentence with subj → {{A}} and obj → {{B}} (reference marker
    format, used by pattern-style LFs)."""
    from ..stages.sentences import tokenize

    words, offs = tokenize(row.sent_text)
    s0, s1 = int(row.subj_word_start), int(row.subj_word_end)
    o0, o1 = int(row.obj_word_start), int(row.obj_word_end)
    out, i = [], 0
    while i < len(words):
        if i == s0:
            out.append("{{A}}")
            i = s1 + 1
        elif i == o0:
            out.append("{{B}}")
            i = o1 + 1
        else:
            out.append(words[i])
            i += 1
    return " ".join(out)


def get_text_splits(row) -> tuple[str, str, str]:
    """(text left of the FIRST span, text between, text right of the
    LAST span) — position-aware: a reversed candidate (direction='r',
    both_orders=True) stores the object BEFORE the subject, and the
    naive subj-first slicing returned garbage for those (round-4
    review)."""
    from ..stages.sentences import tokenize

    words, offs = tokenize(row.sent_text)
    text = row.sent_text
    spans = sorted([(int(row.subj_word_start), int(row.subj_word_end)),
                    (int(row.obj_word_start), int(row.obj_word_end))])
    (a_ws, a_we), (b_ws, b_we) = spans
    a_start = offs[a_ws]
    a_end = offs[a_we] + len(words[a_we])
    b_start = offs[b_ws]
    b_end = offs[b_we] + len(words[b_we])
    return text[:a_start], text[a_end:b_start], text[b_end:]


def tokens_contain(tokens: Sequence[str], phrase: str) -> bool:
    """phrase (space-separated, casefolded) appears contiguously."""
    ph = phrase.casefold().split()
    toks = [t.casefold() for t in tokens]
    n = len(ph)
    return any(toks[i : i + n] == ph for i in range(len(toks) - n + 1))
