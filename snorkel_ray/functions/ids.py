"""Stable ids and entity-key normalization.

Reference: ``construct_stable_id`` / ``split_stable_id`` in
``snorkel/models/context.py`` ≈L400–440 build the deterministic global
keys ``"<docname>::<type>:<absstart>:<absend>"`` that make reruns
reproducible; the DB UNIQUE constraints over them absorb duplicates.
Here the same string keys are the hash-partition / dedup keys, and
``doc_id`` is a content-free 64-bit hash of the url (stable across runs
and partitionings — never a row index).
"""

from __future__ import annotations

import hashlib
import unicodedata


def doc_id_of_url(url: str) -> int:
    """Deterministic uint64 id for a url (blake2b-8; no PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")


def construct_stable_id(url: str, span_type: str, abs_start: int, abs_end: int) -> str:
    return f"{url}::{span_type}:{abs_start}:{abs_end}"


def split_stable_id(stable_id: str) -> tuple[str, str, int, int]:
    parent, rest = stable_id.rsplit("::", 1)
    span_type, start, end = rest.rsplit(":", 2)
    return parent, span_type, int(start), int(end)


def normalize_entity_key(text: str) -> str:
    """Canonicalization key (SURVEY.md M15): NFKC, casefold, strip
    punctuation at the edges, collapse internal whitespace, drop dots in
    abbreviations ("Acme Corp." == "acme corp")."""
    s = unicodedata.normalize("NFKC", text).casefold()
    s = s.replace(".", "")
    s = " ".join(s.split())
    return s.strip(" \t\n'\"`,;:!?()[]")


def hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
