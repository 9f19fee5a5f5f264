"""Sentence splitter / tokenizer offset-exactness (SURVEY.md §5.1)."""

import pyarrow as pa

from snorkel_ray.stages.sentences import sentences_batch, split_sentences, tokenize


def test_split_basic():
    s = split_sentences("One here. Two there! Three? Done.")
    assert [t for _, t in s] == ["One here.", "Two there!", "Three?", "Done."]


def test_split_abbreviations_and_initials():
    s = split_sentences("Acme Corp. was founded by R. Smith. It grew.")
    assert [t for _, t in s] == ["Acme Corp. was founded by R. Smith.", "It grew."]


def test_split_newline_always_boundary():
    s = split_sentences("no terminator here\nsecond block")
    assert [t for _, t in s] == ["no terminator here", "second block"]


def test_split_offsets_exact():
    text = "First one. Second here.\n  padded sentence. And more!"
    for start, sent in split_sentences(text):
        assert text[start : start + len(sent)] == sent


def test_no_split_before_lowercase():
    s = split_sentences("It cost 3.5 approx. dollars and that was fine.")
    assert len(s) == 1


def test_tokenize_offsets():
    sent = "Acme Corp. was-founded by J. O'Neil, fast."
    words, offs = tokenize(sent)
    for w, o in zip(words, offs):
        assert sent[o : o + len(w)] == w
    assert "was-founded" in words and "O'Neil" in words


def test_sentences_batch_schema_and_abs_offsets():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.uint64()),
            "url": ["u1"],
            "text": ["First one. Second here.\nNew block."],
        }
    )
    out = sentences_batch(batch)
    assert out.num_rows == 3
    texts = out.column("text").to_pylist()
    abss = out.column("abs_char_start").to_pylist()
    aoffs = out.column("abs_char_offsets").to_pylist()
    words = out.column("words").to_pylist()
    full = "First one. Second here.\nNew block."
    for t, a in zip(texts, abss):
        assert full[a : a + len(t)] == t
    for ws, ao in zip(words, aoffs):
        for w, o in zip(ws, ao):
            assert full[o : o + len(w)] == w
    sids = out.column("sent_stable_id").to_pylist()
    assert sids[0].startswith("u1::sentence:0:")
    assert len(set(sids)) == 3
