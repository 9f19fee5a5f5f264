"""Candidate spaces and matcher combinators (SURVEY.md M5, M8–M13).

Reference semantics: ``snorkel/candidates.py`` ≈L20–90 (``Ngrams``
enumerates every n-gram span of a sentence up to ``n_max``) and
``snorkel/matchers.py`` (combinator algebra over span generators with
``longest_match_only`` suppression of contained sub-spans;
``DictionaryMatch``, ``RegexMatchSpan``, ``RegexMatchEach``, ``Union``,
``Intersect``, ``Inverse``, ``Concat``, ``LambdaFunctionMatcher``).

These are plain-Python predicate objects applied *inside* a
``map_batches`` body — there is no distribution concern here; the
distributed fast path for dictionary mentions lives in
``stages/mentions.py``.

Deviation from reference, documented: spans here use an EXCLUSIVE
``char_end`` (Python slice convention); the reference's
``TemporarySpan.char_end`` is inclusive.  ``word_end`` stays inclusive
like the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator


@dataclass(frozen=True)
class Span:
    """In-memory span over one sentence (reference ``TemporarySpan``).

    ``pos_tags`` / ``ner_tags`` / ``lemmas`` are the token-aligned
    annotation arrays of the reference Sentence model
    (``snorkel/models/context.py`` ≈L100–220), present when a tagger /
    lemmatizer stage populated them (stages/pretagged.py::
    add_token_tags / add_lemmas); ``None`` otherwise."""

    words: tuple[str, ...]
    char_start: int  # sentence-relative, inclusive
    char_end: int  # sentence-relative, EXCLUSIVE
    word_start: int
    word_end: int  # inclusive
    text: str
    pos_tags: tuple[str, ...] | None = None
    ner_tags: tuple[str, ...] | None = None
    lemmas: tuple[str, ...] | None = None

    def get_span(self) -> str:
        return self.text

    def get_attrib_tokens(self, attrib: str = "words") -> tuple[str, ...]:
        if attrib == "words":
            return self.words
        if attrib in ("pos_tags", "ner_tags", "lemmas"):
            tags = getattr(self, attrib)
            if tags is None:
                raise KeyError(
                    f"attrib {attrib!r} not populated — run a tagger stage "
                    "(stages.pretagged.add_token_tags / add_lemmas) before "
                    "matching on it")
            return tags
        raise KeyError(f"unknown attrib {attrib!r}")

    def __len__(self) -> int:
        return self.word_end - self.word_start + 1


class Ngrams:
    """Enumerate all n-gram spans with 1 <= n <= n_max (reference
    default 5), plus sub-spans of unigrams split on ``split_tokens``
    (reference ``Ngrams(split_tokens=('-', '/'))``,
    ``snorkel/candidates.py`` ≈L40: "trade-off" also yields "trade" and
    "off")."""

    def __init__(self, n_max: int = 5, split_tokens: tuple[str, ...] = ("-", "/")):
        self.n_max = n_max
        self.split_tokens = split_tokens

    def __call__(self, words: list[str], offsets: list[int], sent_text: str,
                 pos_tags: list[str] | None = None,
                 ner_tags: list[str] | None = None,
                 lemmas: list[str] | None = None) -> Iterator[Span]:
        L = len(words)
        pt = tuple(pos_tags) if pos_tags is not None else None
        nt = tuple(ner_tags) if ner_tags is not None else None
        lm = tuple(lemmas) if lemmas is not None else None
        for i in range(L):
            for n in range(1, min(self.n_max, L - i) + 1):
                j = i + n - 1
                cs = offsets[i]
                ce = offsets[j] + len(words[j])
                yield Span(tuple(words[i : j + 1]), cs, ce, i, j, sent_text[cs:ce],
                           pt[i : j + 1] if pt else None,
                           nt[i : j + 1] if nt else None,
                           lm[i : j + 1] if lm else None)
            # split-token sub-spans of the unigram
            w = words[i]
            for st in self.split_tokens:
                if st in w:
                    pos = 0
                    for part in w.split(st):
                        if part:
                            cs = offsets[i] + pos
                            yield Span((part,), cs, cs + len(part), i, i, part,
                                       pt[i : i + 1] if pt else None,
                                       nt[i : i + 1] if nt else None,
                                       lm[i : i + 1] if lm else None)
                        pos += len(part) + len(st)


class Matcher:
    """Base combinator. Subclasses implement ``_f(span) -> bool``.

    ``apply`` filters a span iterable; with ``longest_match_only`` a
    matched span is suppressed when another matched span strictly
    contains it (reference ``matchers.py`` ≈L40–80).
    """

    def __init__(self, *children: "Matcher", longest_match_only: bool = True):
        self.children = children
        self.longest_match_only = longest_match_only

    def _f(self, span: Span) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def apply(self, spans: Iterable[Span]) -> list[Span]:
        matched = [s for s in spans if self._f(s)]
        if not self.longest_match_only or len(matched) <= 1:
            return matched
        out = []
        for s in matched:
            contained = any(
                (o is not s)
                and o.word_start <= s.word_start
                and s.word_end <= o.word_end
                and len(o) > len(s)
                for o in matched
            )
            if not contained:
                out.append(s)
        return out


def porter_lite_stem(word: str) -> str:
    """Deterministic suffix stemmer (Porter-style step-1 rules; no
    nltk in this env).  Enough for the DictionaryMatch stemmer option's
    purpose — folding inflected surface forms onto dictionary entries:
    cats→cat, stories→stori, running→run, caused→caus."""
    w = word
    if len(w) > 4 and w.endswith("sses"):
        w = w[:-2]
    elif len(w) > 3 and w.endswith("ies"):
        w = w[:-2]
    elif len(w) > 2 and w.endswith("s") and not w.endswith("ss") and not w.endswith("us"):
        w = w[:-1]
    for suf in ("ingly", "edly", "ing", "ed"):
        if len(w) > len(suf) + 2 and w.endswith(suf):
            w = w[: -len(suf)]
            if len(w) > 2 and w[-1] == w[-2] and w[-1] not in "lsz":
                w = w[:-1]  # running -> runn -> run
            break
    if len(w) > 3 and w.endswith("e"):
        w = w[:-1]  # cause -> caus (aligns with caused -> caus)
    return w


class DictionaryMatch(Matcher):
    """Span text ∈ dictionary (reference ≈L80–150, including its
    ``stemmer`` option: both the dictionary entries and the span text
    are stemmed before lookup).  The dict is expected to be a broadcast
    small side (``ray.put`` once; SURVEY.md J4/T2).

    ``stemmer``: None, "porter" (built-in suffix stemmer) or a callable
    ``str -> str``."""

    def __init__(self, d: Iterable[str], ignore_case: bool = True, inverse: bool = False,
                 longest_match_only: bool = True, stemmer=None):
        super().__init__(longest_match_only=longest_match_only)
        self.ignore_case = ignore_case
        self.inverse = inverse
        if stemmer == "porter":
            stemmer = porter_lite_stem
        self.stemmer = stemmer
        self.d = frozenset(self._norm(w) for w in d)

    def _norm(self, w: str) -> str:
        if self.ignore_case:
            w = w.casefold()
        if self.stemmer is not None:
            w = " ".join(self.stemmer(t) for t in w.split(" "))
        return w

    def _f(self, span: Span) -> bool:
        return (self._norm(span.text) in self.d) != self.inverse


class RegexMatchSpan(Matcher):
    def __init__(self, rgx: str, ignore_case: bool = True, full_match: bool = True,
                 longest_match_only: bool = True):
        super().__init__(longest_match_only=longest_match_only)
        flags = re.IGNORECASE if ignore_case else 0
        self.rgx = re.compile(rgx, flags | re.UNICODE)
        self.full_match = full_match

    def _f(self, span: Span) -> bool:
        m = self.rgx.fullmatch(span.text) if self.full_match else self.rgx.search(span.text)
        return m is not None


class RegexMatchEach(Matcher):
    """Every token of ``attrib`` matches the regex (reference
    ``snorkel/matchers.py`` ≈L150–230: ``attrib`` selects
    words/lemmas/pos_tags/ner_tags — the NER-sugar matchers are
    ``RegexMatchEach(attrib='ner_tags', rgx='PERSON')`` etc.)."""

    def __init__(self, rgx: str, ignore_case: bool = True, longest_match_only: bool = True,
                 attrib: str = "words"):
        super().__init__(longest_match_only=longest_match_only)
        self.rgx = re.compile(rgx, (re.IGNORECASE if ignore_case else 0) | re.UNICODE)
        self.attrib = attrib

    def _f(self, span: Span) -> bool:
        toks = span.get_attrib_tokens(self.attrib)
        return all(self.rgx.fullmatch(w) for w in toks) and len(toks) > 0


class Union(Matcher):
    def _f(self, span: Span) -> bool:
        return any(c._f(span) for c in self.children)


class Intersect(Matcher):
    def _f(self, span: Span) -> bool:
        return all(c._f(span) for c in self.children)


class Inverse(Matcher):
    def __init__(self, child: Matcher, longest_match_only: bool = True):
        super().__init__(child, longest_match_only=longest_match_only)

    def _f(self, span: Span) -> bool:
        return not self.children[0]._f(span)


class Concat(Matcher):
    """Span matches if it splits into a left part matching child 0 and a
    right part matching child 1 (reference ≈L230–350; token-boundary
    splits; ``permutations=True`` also accepts right+left order)."""

    def __init__(self, left: Matcher, right: Matcher, left_required: bool = True,
                 right_required: bool = True, permutations: bool = False,
                 longest_match_only: bool = True):
        super().__init__(left, right, longest_match_only=longest_match_only)
        self.left_required = left_required
        self.right_required = right_required
        self.permutations = permutations

    @staticmethod
    def _split(span: Span, k: int) -> tuple[Span, Span]:
        # children see REAL char offsets and the sliced tag/lemma
        # arrays (round-4 review: attrib-based child matchers crashed
        # on the missing arrays and the right child saw offsets (0,0))
        lw = span.words[:k]
        rw = span.words[k:]

        def _s(t, lo, hi):
            return None if t is None else t[lo:hi]

        l_end = span.char_start + sum(map(len, lw)) + k - 1
        left = Span(lw, span.char_start, l_end,
                    span.word_start, span.word_start + k - 1, " ".join(lw),
                    _s(span.pos_tags, 0, k), _s(span.ner_tags, 0, k),
                    _s(span.lemmas, 0, k))
        right = Span(rw, l_end + 1, span.char_end,
                     span.word_start + k, span.word_end, " ".join(rw),
                     _s(span.pos_tags, k, None), _s(span.ner_tags, k, None),
                     _s(span.lemmas, k, None))
        return left, right

    def _f(self, span: Span) -> bool:
        L, R = self.children
        n = len(span.words)
        if not self.left_required and R._f(span):
            return True
        if not self.right_required and L._f(span):
            return True
        for k in range(1, n):
            left, right = self._split(span, k)
            if L._f(left) and R._f(right):
                return True
            if self.permutations and R._f(left) and L._f(right):
                return True
        return False


class LambdaFunctionMatcher(Matcher):
    def __init__(self, func: Callable[[Span], bool], longest_match_only: bool = True):
        super().__init__(longest_match_only=longest_match_only)
        self.func = func

    def _f(self, span: Span) -> bool:
        return bool(self.func(span))


class NumberMatcher(RegexMatchEach):
    def __init__(self, **kw):
        super().__init__(r"[0-9][0-9,.]*", **kw)


class DateMatcher(RegexMatchSpan):
    def __init__(self, **kw):
        super().__init__(r"\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{2,4}", **kw)


class CapitalizedMatcher(RegexMatchEach):
    """Heuristic NER stand-in (no tagger in env): every token TitleCase."""

    def __init__(self, **kw):
        kw.setdefault("ignore_case", False)
        super().__init__(r"[A-Z][\w.'-]*", **kw)


class PersonMatcher(RegexMatchEach):
    """Reference NER sugar (``snorkel/matchers.py`` ≈L380–450): every
    token's ``ner_tags`` entry is PERSON.  Requires a tagger stage
    (stages/pretagged.py::add_token_tags) to have populated the array."""

    def __init__(self, **kw):
        kw.setdefault("attrib", "ner_tags")
        super().__init__(r"PERSON", **kw)


class LocationMatcher(RegexMatchEach):
    def __init__(self, **kw):
        kw.setdefault("attrib", "ner_tags")
        super().__init__(r"LOCATION|GPE|LOC", **kw)


class OrganizationMatcher(RegexMatchEach):
    def __init__(self, **kw):
        kw.setdefault("attrib", "ner_tags")
        super().__init__(r"ORGANIZATION|ORG", **kw)


class MiscMatcher(RegexMatchEach):
    def __init__(self, **kw):
        kw.setdefault("attrib", "ner_tags")
        super().__init__(r"MISC", **kw)
