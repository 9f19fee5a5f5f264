"""Property/randomized tests (SURVEY.md §5 — the reference's
test/learning synthetic-generator idea, extended with hypothesis)."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from snorkel_ray.functions.ids import (
    construct_stable_id,
    doc_id_of_url,
    normalize_entity_key,
    split_stable_id,
)
from snorkel_ray.stages.extract import html_to_text
from snorkel_ray.stages.sentences import split_sentences, tokenize

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_exact(s):
    words, offs = tokenize(s)
    for w, o in zip(words, offs):
        assert s[o : o + len(w)] == w


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_split_sentences_offsets_exact_and_lossless_words(s):
    sents = split_sentences(s)
    for start, sent in sents:
        assert s[start : start + len(sent)] == sent
    # no non-whitespace content is lost by splitting
    joined = "".join(sent for _, sent in sents)
    assert sorted("".join(joined.split())) == sorted("".join(s.split()))


@given(st.text(max_size=120), st.integers(0, 10**6), st.integers(0, 10**6))
@settings(max_examples=100, deadline=None)
def test_stable_id_roundtrip(url, a, b):
    # stable ids must round-trip for any url without newlines/"::" clash
    sid = construct_stable_id(url, "span", a, b)
    parent, typ, start, end = split_stable_id(sid)
    assert (typ, start, end) == ("span", a, b)
    assert parent == url or "::" in url  # ambiguity only if url contains '::'


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_normalize_entity_key_idempotent(s):
    once = normalize_entity_key(s)
    assert normalize_entity_key(once) == once


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_doc_id_deterministic_and_64bit(url):
    a, b = doc_id_of_url(url), doc_id_of_url(url)
    assert a == b and 0 <= a < 2**64


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_html_to_text_total_and_deterministic(s):
    # never raises, always a string, deterministic, no leading/trailing
    # whitespace per line
    out = html_to_text(s)
    assert out == html_to_text(s)
    for line in out.split("\n"):
        assert line == line.strip()


@given(st.lists(st.sampled_from(["a", "b", "see", "run"]), min_size=0, max_size=30),
       st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_ngram_enumeration_count(words, n_max):
    from snorkel_ray.functions.matchers import Ngrams

    sent = " ".join(words)
    toks, offs = tokenize(sent)
    spans = list(Ngrams(n_max)(toks, offs, sent))
    L = len(toks)
    expected = sum(min(n_max, L - i) for i in range(L))
    assert len(spans) == expected
    for s in spans:
        assert sent[s.char_start : s.char_end] == s.text


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll",)),
               min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_porter_lite_stem_properties(w):
    from snorkel_ray.functions.matchers import porter_lite_stem

    s = porter_lite_stem(w)
    # idempotent-ish: stemming a stem never grows and converges fast
    s2 = porter_lite_stem(s)
    assert len(s) <= len(w)
    assert len(s2) <= len(s)
    # inflections fold onto the base form's stem ('-u' excluded: the
    # stemmer deliberately keeps '-us' endings — virus, census)
    if len(w) > 3 and not w.endswith(("s", "e", "d", "g", "u")):
        assert porter_lite_stem(w + "s") == s


@given(st.lists(st.text(alphabet="abcdefg ", min_size=0, max_size=40),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_shingle_hash_deterministic_and_order_sensitive(texts, k):
    from snorkel_ray.stages.dedup import _shingle_hashes

    for t in texts:
        a = _shingle_hashes(t, k)
        b = _shingle_hashes(t, k)
        assert (a == b).all()  # deterministic across calls
    # order sensitivity: reversing word order changes the shingle set
    t = "alpha beta gamma delta epsilon"
    fwd = set(_shingle_hashes(t, 2).tolist())
    rev = set(_shingle_hashes(" ".join(reversed(t.split())), 2).tolist())
    assert fwd != rev


@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=0, max_size=500),
       st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_hll_merge_associative_and_bounded(xs, ys):
    from snorkel_ray.stages.sketches import HLL

    a = HLL(10)
    a.add_batch(xs)
    b = HLL(10)
    b.add_batch(ys)
    merged = a.merge(b)
    both = HLL(10)
    both.add_batch(xs + ys)
    # merge of partials == sketch of the union (register-wise identical)
    assert (merged.registers == both.registers).all()
    true = len(set(xs) | set(ys))
    if true >= 100:
        assert abs(merged.estimate() - true) / true < 0.15


@given(st.lists(st.one_of(st.none(), text_strategy), max_size=12))
@settings(max_examples=100, deadline=None)
def test_simhash_batch_parity_property(texts):
    from snorkel_ray.stages.dedup import simhash64, simhash64_batch

    got = simhash64_batch(texts)
    want = [0 if t is None else simhash64(t) for t in texts]
    assert got.tolist() == want


@given(st.lists(st.one_of(st.none(), text_strategy), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_analyze_batch_parity_property(texts):
    from snorkel_ray.stages.text_analysis import (
        analyze_batch,
        count_tokens,
        detect_lang,
        fingerprint64,
        quality_features,
    )

    got = analyze_batch(texts)
    for i, t in enumerate(texts):
        s = t or ""
        stop, punct, mwl, n, score = quality_features(s)
        assert got["lang_pred"][i] == detect_lang(s)
        assert got["stopword_ratio"][i] == stop
        assert got["punct_ratio"][i] == punct
        assert got["mean_word_len"][i] == mwl
        assert got["n_words"][i] == n
        assert got["quality"][i] == score
        assert (got["ws_tokens"][i], got["bpe_tokens"][i]) == count_tokens(s)
        assert int(got["fingerprint"][i]) == fingerprint64(s)
