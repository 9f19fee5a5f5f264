"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Brief-mandated family (no direct reference analog; nearest ancestry is
the LF helper string utilities, ``snorkel/lf_helpers.py`` ≈L1–150).
All are stateless vectorized ``map_batches`` stages; the language-ID
profile table and stopword sets are compiled once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish fallback tokenizer: words, numbers, or single non-space chars
_BPE_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]", re.UNICODE)

# tiny n-gram/stopword profiles for a deterministic heuristic lang-id —
# intentionally simple, vocabulary-level (public-knowledge stopwords)
_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is was for with that on as are at".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein eine".split()),
    "es": frozenset("el la los las de y en que un una es por con para".split()),
    "fr": frozenset("le la les de et un une est dans pour que des au".split()),
    "it": frozenset("il lo la gli le di e che un una per con del della".split()),
    "pt": frozenset("o os as de e que um uma não com para por mais".split()),
    "nl": frozenset("de het een en van dat is op te met voor zijn niet".split()),
    "sv": frozenset("och att det som en på är av för med den till inte".split()),
}

_STOPWORDS_EN = _LANG_MARKERS["en"] | frozenset("a an it this by be or".split())


def detect_lang(text: str) -> str:
    """Heuristic language-ID: stopword-marker voting, CJK codepoint
    check for zh; 'und' when nothing matches."""
    for ch in text[:200]:
        if "一" <= ch <= "鿿":
            return "zh"
    words = _WORD_RE.findall(text.lower()[:2000])
    if not words:
        return "und"
    best, best_n = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        n = sum(1 for w in words if w in markers)
        if n > best_n:
            best, best_n = lang, n
    return best if best_n >= max(1, len(words) // 50) else "und"


def quality_features(text: str) -> tuple[float, float, float, int, float]:
    """(stopword_ratio, punct_ratio, mean_word_len, n_words, score).
    Deterministic quality heuristic in [0,1]: rewards stopword presence
    and sane word lengths, penalizes punctuation soup."""
    return _quality_from_words(text, _WORD_RE.findall(text.lower()))


def _quality_from_words(text: str, words: list[str]):
    """quality_features over an already-tokenized (lowered) word list
    so the analyzer tokenizes each document once, not once per
    feature family."""
    n = len(words)
    if n == 0:
        return 0.0, 0.0, 0.0, 0, 0.0
    stop = sum(1 for w in words if w in _STOPWORDS_EN) / n
    punct = sum(1 for c in text if not c.isalnum() and not c.isspace()) / max(len(text), 1)
    mwl = sum(map(len, words)) / n
    score = max(0.0, min(1.0, 0.5 * min(stop / 0.3, 1.0)
                         + 0.3 * (1.0 - min(punct / 0.2, 1.0))
                         + 0.2 * (1.0 if 3.0 <= mwl <= 8.0 else 0.0)))
    return stop, punct, mwl, n, score


def count_tokens(text: str) -> tuple[int, int]:
    """(whitespace_tokens, bpe_ish_tokens)."""
    ws = len(text.split())
    bpe = len(_BPE_RE.findall(text))
    return ws, bpe


def _fingerprint_from_words(words: list[str], window: int) -> int:
    """min rolling-window hash over word n-grams, computed from an
    already-tokenized word list: one memoized blake2b per DISTINCT
    word + a vectorized position-mixed combine (dedup.py's shingle
    kernel) instead of one blake2b per n-gram — the n-gram hashing was
    the hot loop of the analyzer (n_words digests per document)."""
    if not words:
        return 0
    from .dedup import _combine_shingles, _word_hash

    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    return int(_combine_shingles(wh, window).min())


def fingerprint64(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min rolling-window hash of
    word 8-grams (robust to local edits; deterministic)."""
    return _fingerprint_from_words(_WORD_RE.findall(text.lower()), window)


class TextAnalyzer:
    """Actor-pool stage appending lang_pred / quality / token counts /
    fingerprint columns to any table with ``text``."""

    def __init__(self, column: str = "text"):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        langs, stops, puncts, mwls, n_words, scores, ws_toks, bpe_toks, fps = \
            [], [], [], [], [], [], [], [], []
        for t in texts:
            langs.append(detect_lang(t))
            words = _WORD_RE.findall(t.lower())  # shared tokenization:
            s, p, m, n, sc = _quality_from_words(t, words)  # quality +
            fps.append(_fingerprint_from_words(words, 8))   # fingerprint
            stops.append(s); puncts.append(p); mwls.append(m)
            n_words.append(n); scores.append(sc)
            w, b = count_tokens(t)
            ws_toks.append(w); bpe_toks.append(b)
        return (
            batch.append_column("lang_pred", pa.array(langs, pa.string()))
            .append_column("stopword_ratio", pa.array(stops, pa.float64()))
            .append_column("punct_ratio", pa.array(puncts, pa.float64()))
            .append_column("mean_word_len", pa.array(mwls, pa.float64()))
            .append_column("n_words", pa.array(n_words, pa.int64()))
            .append_column("quality", pa.array(scores, pa.float64()))
            .append_column("ws_tokens", pa.array(ws_toks, pa.int64()))
            .append_column("bpe_tokens", pa.array(bpe_toks, pa.int64()))
            .append_column("fingerprint", pa.array(np.asarray(fps, np.uint64), pa.uint64()))
        )


_ANALYZER_CACHE: dict = {}


def analyze_text(ds, *, column: str = "text", batch_size: int | None = None,
                 concurrency=None, as_tasks: bool = True):
    """Default: elastic tasks with a per-worker analyzer cache — the
    state (compiled regex profiles) is light, and an actor pool would
    cap whatever chain this fuses into (CLAUDE.md rule 2).  Pass
    ``as_tasks=False`` to pin an actor pool (e.g. if a model-backed
    analyzer replaces the heuristics)."""
    if as_tasks:
        def _analyze(batch: pa.Table) -> pa.Table:
            from ..state.resources import cache_get_or_build

            inst = cache_get_or_build(_ANALYZER_CACHE, column,
                                      lambda: TextAnalyzer(column))
            return inst(batch)

        return ds.map_batches(_analyze, batch_format="pyarrow",
                              batch_size=batch_size)
    if concurrency is None:
        from ..state.resources import pool_concurrency

        concurrency = pool_concurrency()
    return ds.map_batches(TextAnalyzer, fn_constructor_kwargs={"column": column},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
