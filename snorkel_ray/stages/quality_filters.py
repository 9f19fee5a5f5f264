"""Gopher-style document quality filters for LLM training corpora.

Public recipe (Gopher, Rae et al. 2021 §A1.1; C4, Raffel et al. 2020):
a battery of cheap per-document heuristics that remove boilerplate,
machine-generated soup and repetition before expensive downstream
stages. Two families:

* **Shape rules** — word count bounds, mean word length bounds,
  symbol-to-word ratio, fraction of words with an alphabetic
  character, minimum stop-word hits, bullet-/ellipsis-line fractions.
* **Repetition rules** — duplicate-line fraction, top n-gram
  character fraction, duplicate n-gram fraction.

Scale shape: every metric is computed in ONE streaming ``map_batches``
pass with no shuffle and no per-row Python in the shape rules — the
batch is split once with ``pyarrow.compute.split_pattern`` and every
per-word quantity is reduced back to rows via an offsets/cumsum trick
(`_row_sums`). Repetition metrics reuse dedup's batch-vectorized
shingle kernel (one blake2b per DISTINCT word per batch) and only the
final per-document ``np.unique`` runs per row.

No direct reference analog (nearest ancestry: LF helper string
utilities, ``snorkel/lf_helpers.py`` ≈L1–150); brief-mandated
training-data-pipeline family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "GOPHER_DEFAULTS",
    "gopher_metrics",
    "repetition_metrics",
    "gopher_filter",
]

# Gopher's stop-word requirement uses a small fixed English list
# (public: "the, be, to, of, and, that, have, with"); ours adds two
# common function words so word-soup synth corpora exercise both sides
# of the >= 2 threshold.
STOPWORDS = ("the", "and", "of", "to", "in", "is",
             "was", "for", "with", "that")

GOPHER_DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_ratio=0.1,
    min_alpha_frac=0.8,
    min_stop_hits=2,
    max_bullet_frac=0.9,
    max_ellipsis_frac=0.3,
    max_dup_line_frac=0.3,
    max_top_ngram_frac=0.2,   # top 2-gram char share
    max_dup_ngram_frac=0.1,   # duplicate 10-gram share
)


def _row_sums(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``vals`` per list row given ListArray offsets (cumsum
    difference — safe for empty rows, no reduceat repeated-index
    pitfall)."""
    cum = np.concatenate(([0.0], np.cumsum(vals, dtype=np.float64)))
    return cum[offsets[1:]] - cum[offsets[:-1]]


def _split_col(batch: pa.Table, column: str, sep: str):
    """(list_array, flat_words, offsets) for one batch column."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.split_pattern(col, pattern=sep)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    return lst, lst.values, np.asarray(lst.offsets)


class _GopherMetrics:
    """Vectorized shape metrics: one split + flat-array kernels."""

    def __init__(self, column: str = "text", sep: str = " "):
        self.column = column
        self.sep = sep
        self.stop_set = pa.array(STOPWORDS, pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, flat, off = _split_col(batch, self.column, self.sep)
        n_words = (off[1:] - off[:-1]).astype(np.int64)
        safe_n = np.maximum(n_words, 1).astype(np.float64)

        word_lens = np.asarray(pc.utf8_length(flat), dtype=np.float64)
        total_chars = _row_sums(word_lens, off)
        mwl = total_chars / safe_n

        alpha = np.asarray(
            pc.match_substring_regex(flat, "[A-Za-z]"), dtype=np.float64)
        alpha_words = _row_sums(alpha, off)
        alpha_frac = alpha_words / safe_n

        stop = np.asarray(pc.is_in(flat, value_set=self.stop_set),
                          dtype=np.float64)
        stop_hits = _row_sums(stop, off).astype(np.int64)

        col = batch.column(self.column)
        n_hash = np.asarray(pc.count_substring(col, "#"), dtype=np.float64)
        n_ell = (np.asarray(pc.count_substring(col, "..."), dtype=np.float64)
                 + np.asarray(pc.count_substring(col, "…"),
                              dtype=np.float64))
        symbol_ratio = (n_hash + n_ell) / safe_n

        _, lines, loff = _split_col(batch, self.column, "\n")
        n_lines = np.maximum(loff[1:] - loff[:-1], 1).astype(np.float64)
        stripped = pc.utf8_ltrim_whitespace(lines)
        bullet = np.zeros(len(lines), dtype=np.float64)
        for pfx in ("- ", "* ", "•"):
            bullet = np.maximum(
                bullet,
                np.asarray(pc.starts_with(stripped, pattern=pfx),
                           dtype=np.float64))
        bullet_frac = _row_sums(bullet, loff) / n_lines
        ell_end = np.asarray(
            pc.ends_with(pc.utf8_rtrim_whitespace(lines), pattern="..."),
            dtype=np.float64)
        ellipsis_frac = _row_sums(ell_end, loff) / n_lines

        return (batch
                .append_column("qf_n_words", pa.array(n_words, pa.int64()))
                .append_column("qf_mean_word_len", pa.array(mwl, pa.float64()))
                .append_column("qf_total_word_chars",
                               pa.array(total_chars.astype(np.int64),
                                        pa.int64()))
                .append_column("qf_alpha_frac",
                               pa.array(alpha_frac, pa.float64()))
                .append_column("qf_alpha_words",
                               pa.array(alpha_words.astype(np.int64),
                                        pa.int64()))
                .append_column("qf_stop_hits",
                               pa.array(stop_hits, pa.int64()))
                .append_column("qf_symbol_ratio",
                               pa.array(symbol_ratio, pa.float64()))
                .append_column("qf_bullet_frac",
                               pa.array(bullet_frac, pa.float64()))
                .append_column("qf_ellipsis_frac",
                               pa.array(ellipsis_frac, pa.float64())))


def gopher_metrics(ds, *, column: str = "text", sep: str = " "):
    """Append the Gopher shape-metric columns (``qf_*``) in one
    streaming vectorized pass."""
    return ds.map_batches(_GopherMetrics(column, sep),
                          batch_format="pyarrow")


class _RepetitionMetrics:
    """Per-document repetition: duplicate-line fraction, top-n-gram
    share, duplicate-n-gram share. Word hashing is batch-vectorized
    (dedup's shingle kernel); only the per-document ``np.unique``
    runs per row."""

    def __init__(self, column: str = "text", top_ngram: int = 2,
                 dup_ngram: int = 10):
        self.column = column
        self.top_n = top_ngram
        self.dup_n = dup_ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _shingle_hashes_batch

        texts = batch.column(self.column).to_pylist()

        dup_line = np.zeros(len(texts))
        for i, t in enumerate(texts):
            lines = [ln for ln in (t or "").split("\n") if ln.strip()]
            if len(lines) > 1:
                dup_line[i] = 1.0 - len(set(lines)) / len(lines)

        top_frac = np.zeros(len(texts))
        dup_frac = np.zeros(len(texts))
        # batch-vectorized shingling at each width (word blake2b is
        # memoized per worker, so the second pass re-hashes nothing)
        top_grams = _shingle_hashes_batch(texts, self.top_n)
        dup_grams = _shingle_hashes_batch(texts, self.dup_n)
        for i in range(len(texts)):
            tg, dg = top_grams[i], dup_grams[i]
            n_words = tg.size + self.top_n - 1
            if tg.size > 1:
                _, counts = np.unique(tg, return_counts=True)
                # char-weighted share approximated by gram share (our
                # grams hash fixed-width word windows)
                top_frac[i] = counts.max() * self.top_n / max(n_words, 1)
            if dg.size > 1:
                dup_frac[i] = 1.0 - np.unique(dg).size / dg.size

        return (batch
                .append_column("qf_dup_line_frac",
                               pa.array(dup_line, pa.float64()))
                .append_column("qf_top_ngram_frac",
                               pa.array(top_frac, pa.float64()))
                .append_column("qf_dup_ngram_frac",
                               pa.array(dup_frac, pa.float64())))


def repetition_metrics(ds, *, column: str = "text", top_ngram: int = 2,
                       dup_ngram: int = 10):
    """Append repetition-metric columns (``qf_dup_line_frac``,
    ``qf_top_ngram_frac``, ``qf_dup_ngram_frac``)."""
    return ds.map_batches(
        _RepetitionMetrics(column, top_ngram, dup_ngram),
        batch_format="pyarrow")


def gopher_filter(ds, *, column: str = "text", sep: str = " ",
                  with_repetition: bool = True, keep: bool = True,
                  flag_col: str = "passes_gopher", **thresholds):
    """Apply the Gopher battery. ``thresholds`` override
    :data:`GOPHER_DEFAULTS`. ``keep=True`` filters to passing docs and
    drops the metric columns; ``keep=False`` appends ``flag_col``
    (plus all ``qf_*`` metrics) instead.
    """
    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown thresholds: {sorted(unknown)}")
    th = {**GOPHER_DEFAULTS, **thresholds}

    out = gopher_metrics(ds, column=column, sep=sep)
    if with_repetition:
        out = repetition_metrics(out, column=column)

    def _flag(b: pa.Table) -> pa.Table:
        g = lambda name: np.asarray(b.column(name))  # noqa: E731
        ok = ((g("qf_n_words") >= th["min_words"])
              & (g("qf_n_words") <= th["max_words"])
              & (g("qf_mean_word_len") >= th["min_mean_word_len"])
              & (g("qf_mean_word_len") <= th["max_mean_word_len"])
              & (g("qf_symbol_ratio") <= th["max_symbol_ratio"])
              & (g("qf_alpha_frac") >= th["min_alpha_frac"])
              & (g("qf_stop_hits") >= th["min_stop_hits"])
              & (g("qf_bullet_frac") <= th["max_bullet_frac"])
              & (g("qf_ellipsis_frac") <= th["max_ellipsis_frac"]))
        if with_repetition:
            ok = (ok & (g("qf_dup_line_frac") <= th["max_dup_line_frac"])
                  & (g("qf_top_ngram_frac") <= th["max_top_ngram_frac"])
                  & (g("qf_dup_ngram_frac") <= th["max_dup_ngram_frac"]))
        if not keep:
            return b.append_column(flag_col, pa.array(ok))
        kept = b.filter(pa.array(ok))
        qf = [c for c in kept.column_names if c.startswith("qf_")]
        return kept.drop_columns(qf)

    return out.map_batches(_flag, batch_format="pyarrow")
