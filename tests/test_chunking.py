import numpy as np
import pyarrow as pa
import pytest
import ray

from snorkel_ray.stages.chunking import chunk_documents


def _ref(texts, size, overlap):
    stride = size - overlap
    out = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        for k, start in enumerate(range(0, len(t), stride)):
            out.append((i, k, t[start:start + size]))
    return out


def test_chunking_matches_python_reference():
    rng = np.random.default_rng(7)
    texts = ["".join(rng.choice(list("abcde "), rng.integers(0, 40)))
             for _ in range(60)] + [None, ""]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ds = ray.data.from_arrow(t).repartition(4)
    got = (chunk_documents(ds, size=7, overlap=2).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    ref = _ref(texts, 7, 2)
    assert list(map(tuple, got.itertuples(index=False))) == ref


def test_chunking_no_overlap_covers_exactly():
    texts = ["x" * 10, "y" * 11, "z" * 1]
    t = pa.table({"doc_id": [0, 1, 2], "text": texts})
    got = (chunk_documents(ray.data.from_arrow(t), size=5).to_pandas()
           .sort_values(["doc_id", "chunk_id"]))
    # reassembling the chunks reproduces each document byte-for-byte
    for i, txt in enumerate(texts):
        assert "".join(got[got.doc_id == i].chunk_text) == txt


def test_chunking_unicode_codepoints():
    # slicing is by code point, not byte, on both engine and oracle
    t = pa.table({"doc_id": [0], "text": ["héllo wörld ünïcode"]})
    got = (chunk_documents(ray.data.from_arrow(t), size=5).to_pandas()
           .sort_values("chunk_id"))
    assert got.chunk_text.tolist() == ["héllo", " wörl", "d ünï", "code"]


def test_chunking_rejects_bad_params():
    ds = ray.data.from_items([{"doc_id": 0, "text": "abc"}])
    with pytest.raises(ValueError):
        chunk_documents(ds, size=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, size=4, overlap=4)


def test_chunking_all_empty_batch_keeps_schema():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, ""], pa.string())})
    out = chunk_documents(ray.data.from_arrow(t), size=4)
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == \
        ["doc_id", "chunk_id", "chunk_text"]
