"""Matcher algebra truth tables + ngram enumeration (SURVEY.md M5, M8–M13)."""

from snorkel_ray.functions.matchers import (
    CapitalizedMatcher,
    Concat,
    DictionaryMatch,
    Intersect,
    Inverse,
    LambdaFunctionMatcher,
    Ngrams,
    NumberMatcher,
    RegexMatchEach,
    RegexMatchSpan,
    Union,
)
from snorkel_ray.stages.sentences import tokenize


def spans_of(sent, n_max=3):
    words, offs = tokenize(sent)
    return list(Ngrams(n_max)(words, offs, sent))


def test_ngram_count():
    # L tokens, n_max=n: sum_{i} min(n, L-i) spans
    sent = "a b c d"
    spans = spans_of(sent, n_max=2)
    assert len(spans) == 4 + 3  # 4 unigrams + 3 bigrams
    spans = spans_of(sent, n_max=5)
    assert len(spans) == 4 + 3 + 2 + 1


def test_ngram_char_offsets():
    sent = "Acme Corp grew"
    for s in spans_of(sent):
        assert sent[s.char_start : s.char_end] == s.text


def test_dictionary_match_case_and_longest():
    spans = spans_of("Acme Corp grew fast")
    m = DictionaryMatch(["acme corp", "acme", "fast"])
    texts = sorted(s.text for s in m.apply(spans))
    # "Acme" is suppressed: contained in matched "Acme Corp"
    assert texts == ["Acme Corp", "fast"]
    m2 = DictionaryMatch(["acme corp", "acme", "fast"], longest_match_only=False)
    assert sorted(s.text for s in m2.apply(spans)) == ["Acme", "Acme Corp", "fast"]
    m3 = DictionaryMatch(["Acme"], ignore_case=False)
    assert [s.text for s in m3.apply(spans)] == ["Acme"]


def test_regex_matchers():
    spans = spans_of("version 12 beta 3")
    assert sorted(s.text for s in NumberMatcher().apply(spans)) == ["12", "3"]
    rs = RegexMatchSpan(r"version \d+")
    assert [s.text for s in rs.apply(spans)] == ["version 12"]
    re_each = RegexMatchEach(r"[a-z]+")
    got = {s.text for s in re_each.apply(spans)}
    assert "version" in got and "beta" in got and "12" not in got


def test_boolean_combinators():
    spans = spans_of("Acme Corp grew fast")
    a = DictionaryMatch(["acme corp"])
    b = DictionaryMatch(["fast", "acme corp"])
    assert {s.text for s in Union(a, b).apply(spans)} == {"Acme Corp", "fast"}
    assert {s.text for s in Intersect(a, b).apply(spans)} == {"Acme Corp"}
    inv = Intersect(Inverse(a), b)
    assert {s.text for s in inv.apply(spans)} == {"fast"}


def test_concat():
    spans = spans_of("Acme Corp", n_max=2)
    c = Concat(DictionaryMatch(["acme"]), DictionaryMatch(["corp"]))
    assert [s.text for s in c.apply(spans)] == ["Acme Corp"]


def test_lambda_and_capitalized():
    spans = spans_of("Robert Smith visited Acme Corp")
    lm = LambdaFunctionMatcher(lambda s: len(s.words) == 2 and s.text.istitle())
    assert {s.text for s in lm.apply(spans)} >= {"Robert Smith", "Acme Corp"}
    cm = CapitalizedMatcher()
    got = {s.text for s in cm.apply(spans)}
    assert "Robert Smith" in got and "visited" not in got


def test_ngram_split_tokens():
    sent = "the trade-off matters"
    spans = spans_of(sent, n_max=1)
    texts = {s.text for s in spans}
    assert {"trade-off", "trade", "off"} <= texts
    for s in spans:
        assert sent[s.char_start : s.char_end] == s.text
    # disabled when split_tokens=()
    from snorkel_ray.functions.matchers import Ngrams
    from snorkel_ray.stages.sentences import tokenize

    words, offs = tokenize(sent)
    plain = {s.text for s in Ngrams(1, split_tokens=())(words, offs, sent)}
    assert "trade" not in plain
