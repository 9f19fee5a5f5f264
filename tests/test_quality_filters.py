"""Gopher-style quality filters: vectorized metrics vs hand-computed
expectations, repetition metrics, end-to-end filter behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from snorkel_ray.stages.quality_filters import (
    GOPHER_DEFAULTS,
    gopher_filter,
    gopher_metrics,
    repetition_metrics,
)


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, pa.string())}))


def test_shape_metrics_match_python_reference():
    texts = [
        "the cat sat on the mat with that hat",
        "aaaa bbbb cccc",                      # no stopwords, no alpha issue
        "### ### ... ... #",                   # symbol soup
        "x",                                   # single short word
    ]
    out = gopher_metrics(_ds(texts)).to_pandas().sort_values("doc_id")

    for i, t in enumerate(texts):
        words = t.split(" ")
        row = out.iloc[i]
        assert row.qf_n_words == len(words)
        assert row.qf_mean_word_len == pytest.approx(
            sum(len(w) for w in words) / len(words))
        alpha = sum(1 for w in words if any(c.isalpha() and c.isascii()
                                            for c in w))
        assert row.qf_alpha_frac == pytest.approx(alpha / len(words))
        sym = t.count("#") + t.count("...") + t.count("…")
        assert row.qf_symbol_ratio == pytest.approx(sym / len(words))

    # stopword hits: doc 0 has the(x2) on? no 'on' not in list; with, that
    assert out.iloc[0].qf_stop_hits == 4  # the, the, with, that
    assert out.iloc[1].qf_stop_hits == 0


def test_line_metrics_bullets_and_ellipsis():
    texts = [
        "- one\n- two\n- three\nplain",          # 3/4 bullet lines
        "keep going...\nfine\nalso trailing...",  # 2/3 ellipsis lines
        "no lines here",
    ]
    out = gopher_metrics(_ds(texts)).to_pandas().sort_values("doc_id")
    assert out.iloc[0].qf_bullet_frac == pytest.approx(3 / 4)
    assert out.iloc[1].qf_ellipsis_frac == pytest.approx(2 / 3)
    assert out.iloc[2].qf_bullet_frac == 0.0
    assert out.iloc[2].qf_ellipsis_frac == 0.0


def test_repetition_metrics():
    texts = [
        "spam " * 50,                       # one 2-gram repeated
        " ".join(f"w{i}" for i in range(60)),   # all distinct
        "a b\na b\nc d",                    # duplicate line
    ]
    out = repetition_metrics(_ds(texts)).to_pandas().sort_values("doc_id")
    assert out.iloc[0].qf_top_ngram_frac > 0.9
    assert out.iloc[0].qf_dup_ngram_frac > 0.7
    assert out.iloc[1].qf_top_ngram_frac < 0.1
    assert out.iloc[1].qf_dup_ngram_frac == 0.0
    assert out.iloc[2].qf_dup_line_frac == pytest.approx(1 / 3)
    assert out.iloc[1].qf_dup_line_frac == 0.0


def test_filter_keep_and_flag_modes():
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "with that same pace for another stretch of field today "
            "while the sun is high and the wind was mild for hours "
            "so the outing went well and all of them were glad then") + \
        " more filler words arrive here steadily keeping things normal"
    bad_short = "too short"
    bad_symbols = ("### " * 60).strip()
    ds = _ds([good, bad_short, bad_symbols])

    kept = gopher_filter(ds, min_words=20).to_pandas()
    assert list(kept.doc_id) == [0]
    assert not any(c.startswith("qf_") for c in kept.columns)

    flagged = gopher_filter(ds, keep=False, min_words=20).to_pandas() \
        .sort_values("doc_id")
    assert list(flagged.passes_gopher) == [True, False, False]
    assert "qf_n_words" in flagged.columns


def test_filter_rejects_unknown_threshold():
    with pytest.raises(ValueError, match="unknown"):
        gopher_filter(_ds(["x"]), min_wordz=3)


def test_defaults_are_gopher_published_values():
    assert GOPHER_DEFAULTS["min_words"] == 50
    assert GOPHER_DEFAULTS["max_symbol_ratio"] == 0.1
    assert GOPHER_DEFAULTS["min_alpha_frac"] == 0.8
