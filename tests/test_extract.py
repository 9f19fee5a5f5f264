"""Byte-identity tests for the flagship extractor (FIXTURES.md F5).

The frozen goldens in tests/golden/extract_goldens.json ARE the
reference for the north-rule per-url byte-identity invariant
(SURVEY.md §0: the reference mount was empty; the pinned extractor
spec stands in)."""

import json
import os

from snorkel_ray.stages.extract import html_to_text
from snorkel_ray.synth import build_kb, expected_text, plan_page, render_html

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract_goldens.json")


def test_golden_corpus_byte_identity():
    with open(GOLDEN) as f:
        cases = json.load(f)
    assert len(cases) >= 30
    for name, case in cases.items():
        got = html_to_text(case["html"])
        assert got == case["text"], f"extractor drift on golden case {name!r}"


def test_synth_corpus_byte_identity():
    kb = build_kb(42)
    for i in range(300):
        plan = plan_page(i, kb, 42)
        assert html_to_text(render_html(plan)) == expected_text(plan), f"page {i}"


def test_bytes_input_utf8():
    assert html_to_text("<p>café</p>".encode()) == "café"
    # invalid utf-8 must not raise
    assert "caf" in html_to_text(b"<p>caf\xff\xe9</p>")


def test_giant_page():
    kb = build_kb(42)
    plan = plan_page(0, kb, 42)  # i % 997 == 0 -> giant
    assert plan["giant"]
    text = html_to_text(render_html(plan))
    assert text == expected_text(plan)
    assert text.count("\n") >= 100


def test_expected_triples_generator_frozen():
    """Drift guard: the planted-truth generator is part of the golden
    contract (SURVEY.md §0 — it IS the reference); any change to
    synth.py that alters the planted facts must consciously re-freeze
    this hash (and bump SYNTH_VERSION)."""
    import hashlib

    from snorkel_ray.synth import expected_triples

    g = expected_triples(1000, 42)
    canon = "\n".join(
        f"{a}|{b}|{c}"
        for a, b, c in zip(*[g.column(c).to_pylist()
                             for c in ("subj_qid", "pred", "obj_qid")])
    )
    assert hashlib.sha256(canon.encode()).hexdigest() == \
        "30e3e821591aac0ad65acb6c4546dea18610b5a60c8ebbb42c5ff374039881da"
