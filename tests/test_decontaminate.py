"""Decontamination: Bloom filter guarantees, eval-side derivation,
train-side flagging in all three membership modes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from snorkel_ray.stages.decontaminate import (
    BloomFilter,
    build_eval_bloom,
    collect_eval_ngrams,
    decontaminate,
    eval_ngram_hashes,
    flag_contaminated,
)


def _docs(texts, start_id=0):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_bloom_no_false_negatives_and_bounded_fpp():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 63, 20_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    others = np.setdiff1d(others, members)
    bf = BloomFilter(len(members), fpp=1e-3)
    bf.add_hashes(members)
    assert bf.contains_hashes(members).all()  # zero false negatives
    fp_rate = bf.contains_hashes(others).mean()
    assert fp_rate < 5e-3  # within ~5x of the design point


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 63, 5_000, dtype=np.uint64)
    b = rng.integers(0, 1 << 63, 5_000, dtype=np.uint64)
    one = BloomFilter(10_000, 1e-3)
    one.add_hashes(np.concatenate([a, b]))
    m1, m2 = BloomFilter(10_000, 1e-3), BloomFilter(10_000, 1e-3)
    m1.add_hashes(a)
    m2.add_hashes(b)
    m1.merge(m2)
    assert np.array_equal(m1.bits, one.bits)


def test_bloom_merge_size_mismatch_raises():
    with pytest.raises(ValueError):
        BloomFilter(100, 1e-3).merge(BloomFilter(10_000, 1e-3))


def test_collect_eval_ngrams_and_cap():
    ev = _docs(["alpha beta gamma delta", "beta gamma delta epsilon"])
    ngs = collect_eval_ngrams(ev, "text", n=3)
    assert "alpha beta gamma" in ngs and "gamma delta epsilon" in ngs
    assert ngs == sorted(set(ngs))
    with pytest.raises(ValueError):
        collect_eval_ngrams(ev, "text", n=3, max_ngrams=2)


def test_collect_eval_ngrams_short_doc():
    ngs = collect_eval_ngrams(_docs(["one two"]), "text", n=8)
    assert ngs == ["one two"]


def test_flag_substring_mode():
    train = _docs([
        "the quick brown fox jumps over the lazy dog",   # contaminated
        "completely unrelated training document here",
        "prefix words then the quick brown fox appears",  # contaminated
    ])
    out = flag_contaminated(train, "text",
                            needles=["quick brown fox"]).to_pandas()
    assert out["contaminated"].tolist() == [True, False, True]


def test_hash_and_bloom_modes_match_planted_overlap():
    eval_ds = _docs(["held out benchmark question about rivers in egypt"])
    train = _docs([
        "totally clean doc with no overlap at all whatsoever honestly",
        "copied benchmark question about rivers in egypt plus padding",
        "another clean one speaking of mountains and valleys instead",
    ])
    hashes = eval_ngram_hashes(eval_ds, "text", n=4)
    assert hashes.size > 0
    out_h = flag_contaminated(train, "text", hash_set=hashes,
                              n=4, min_hits=1).to_pandas()
    assert out_h["contaminated"].tolist() == [False, True, False]

    bloom = build_eval_bloom(eval_ds, "text", n=4, n_items_hint=1_000)
    out_b = flag_contaminated(train, "text", bloom=bloom,
                              n=4, min_hits=1).to_pandas()
    # Bloom can only over-flag (no false negatives)
    assert out_b["contaminated"].tolist()[1] is True or \
        out_b["contaminated"].tolist()[1] == True  # noqa: E712
    assert (np.asarray(out_b["contaminated"])
            >= np.asarray(out_h["contaminated"])).all()


def test_min_hits_threshold():
    eval_ds = _docs(["aa bb cc dd ee ff gg"])
    # shares exactly ONE distinct 3-gram ("cc dd ee") with the eval doc
    train = _docs(["xx yy cc dd ee zz ww qq rr"])
    hashes = eval_ngram_hashes(eval_ds, "text", n=3)
    one = flag_contaminated(train, "text", hash_set=hashes,
                            n=3, min_hits=1).to_pandas()
    two = flag_contaminated(train, "text", hash_set=hashes,
                            n=3, min_hits=2).to_pandas()
    assert one["contaminated"].tolist() == [True]
    assert two["contaminated"].tolist() == [False]


def test_decontaminate_drops_flagged_rows():
    train = _docs(["keep me please today", "drop this secret phrase now",
                   "also keep this one"])
    out = decontaminate(train, "text",
                        needles=["secret phrase"]).to_pandas()
    assert out["doc_id"].tolist() == [0, 2]
    assert "contaminated" not in out.columns


def test_exactly_one_structure_required():
    with pytest.raises(ValueError):
        flag_contaminated(_docs(["x"]), "text")
    with pytest.raises(ValueError):
        flag_contaminated(_docs(["x"]), "text", needles=["a"],
                          hash_set=np.zeros(1, np.uint64))


def test_distributed_bloom_matches_local():
    texts = [f"shared prefix words number {i} alpha beta gamma delta"
             for i in range(50)]
    ds = _docs(texts)
    dist = build_eval_bloom(ds, "text", n=3, n_items_hint=10_000)
    local = BloomFilter(10_000, 1e-3)
    local.add_hashes(eval_ngram_hashes(ds, "text", n=3))
    # distributed partial-OR build sets exactly the same bits
    assert np.array_equal(dist.bits, local.bits)
