"""Predicate trigger lexicon + negation cues for the KG pipeline.

These play the role of the reference tutorials' relation-specific
matchers/LF keyword lists (e.g. the spouse keywords in
``tutorials/intro`` LFs).  Triggers are matched over the lowercased
token text BETWEEN the subject and object spans; first match in
priority order wins.  Negation cues are evidence *against* a candidate
and are consumed by labeling functions, not by candidate generation —
"X never acquired Y" still yields a candidate, the LFs vote it down
(that is the weak-supervision contract).
"""

from __future__ import annotations

import re

# pred -> regex over the between-text (priority = insertion order)
TRIGGERS: dict[str, re.Pattern] = {
    "founded_by": re.compile(r"\bfounded by\b"),
    "born_in": re.compile(r"\bborn in\b"),
    "acquired": re.compile(r"\bacquired\b"),
    "headquartered_in": re.compile(r"\bheadquartered in\b|\bbased in\b"),
    "ceo_of": re.compile(r"\bceo of\b|\bchief executive of\b"),
    "works_for": re.compile(r"\bworks for\b|\bjoined the staff of\b"),
    "located_in": re.compile(r"\blocated in\b|\blies within\b"),
    "partnered_with": re.compile(r"\bpartnered with\b|\bpartnership with\b"),
}

NEGATION = re.compile(
    r"\b(never|not|no longer|denied|denies|false|stepped down|ended|rumors)\b"
)


def detect_predicate(between_lower: str) -> str:
    for pred, rgx in TRIGGERS.items():
        if rgx.search(between_lower):
            return pred
    return ""
