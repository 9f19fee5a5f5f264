"""Deterministic sampling: partition-invariance, SQL parity of the
Knuth hash, stratified exactness, split stability."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from snorkel_ray.stages.sampling import (
    KNUTH,
    bottom_k_sample,
    hash_sample,
    knuth_hash,
    split_by_hash,
    stratified_sample,
)


def _ds(n, blocks=1):
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "grp": pa.array([f"g{i % 4}" for i in range(n)])})
    return ray.data.from_arrow(t).repartition(blocks)


def test_knuth_hash_matches_sql_formula():
    ids = np.array([0, 1, 17, 12345, 2**31, 2**32 - 1], dtype=np.int64)
    h = knuth_hash(ids, seed=3)
    expected = [((int(i) + 3) * KNUTH) % (2**32) for i in ids]
    assert h.tolist() == expected


def test_hash_sample_partition_invariant_and_fractional():
    a = set(hash_sample(_ds(5000, 1), "id", 0.2).to_pandas()["id"])
    b = set(hash_sample(_ds(5000, 7), "id", 0.2).to_pandas()["id"])
    assert a == b
    assert 0.15 < len(a) / 5000 < 0.25
    # different seed -> different sample
    c = set(hash_sample(_ds(5000, 1), "id", 0.2, seed=9).to_pandas()["id"])
    assert c != a


def test_bottom_k_sample_exact_and_partition_invariant():
    k = 25
    out1 = bottom_k_sample(_ds(2000, 1), "id", k)
    out2 = bottom_k_sample(_ds(2000, 11), "id", k)
    ids = np.arange(2000)
    h = knuth_hash(ids)
    expect = set(ids[np.lexsort((ids, h))[:k]].tolist())
    assert set(out1.column("id").to_pylist()) == expect
    assert set(out2.column("id").to_pylist()) == expect
    assert out1.num_rows == k
    assert "_h" not in out1.column_names


def test_stratified_sample_exact_per_group():
    out = stratified_sample(_ds(400, 5), "grp", "id", 7).to_pandas()
    assert set(out.grp.value_counts()) == {7}
    # per-group winners are the bottom-7 by hash within the group
    ids = np.arange(400)
    h = knuth_hash(ids)
    for g in range(4):
        gids = ids[ids % 4 == g]
        gh = h[ids % 4 == g]
        expect = set(gids[np.lexsort((gids, gh))[:7]].tolist())
        assert set(out[out.grp == f"g{g}"].id) == expect
    # small groups keep all rows
    tiny = ray.data.from_arrow(pa.table({"id": [1, 2], "grp": ["a", "a"]}))
    assert len(stratified_sample(tiny, "grp", "id", 10).to_pandas()) == 2


def test_split_by_hash_total_stable_and_proportional():
    ds = _ds(5000, 3)
    out = split_by_hash(ds, "id",
                        {"train": 0.8, "valid": 0.1, "test": 0.1}).to_pandas()
    counts = out.split.value_counts()
    assert counts.sum() == 5000
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.05 < counts["valid"] / 5000 < 0.15
    # stable across repartitioning
    out2 = split_by_hash(_ds(5000, 17), "id",
                         {"train": 0.8, "valid": 0.1, "test": 0.1}).to_pandas()
    m1 = dict(zip(out.id, out.split))
    m2 = dict(zip(out2.id, out2.split))
    assert m1 == m2


def test_split_by_hash_validates_fractions():
    with pytest.raises(ValueError):
        split_by_hash(_ds(10), "id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        hash_sample(_ds(10), "id", 1.5)


def test_pack_documents_budget_and_determinism(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.sampling import pack_documents

    rng = np.random.default_rng(5)
    texts = [" ".join(["w"] * int(n))
             for n in rng.integers(10, 900, 200)]
    texts.append(" ".join(["w"] * 5000))  # over-budget singleton
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ds = rd.from_arrow(t).repartition(3)

    out = pack_documents(ds, token_budget=1024).to_pandas()
    assert len(out) == len(texts)
    sums = out.groupby("pack_id").n_tokens.sum()
    over = sums[sums > 1024]
    # only the oversized singleton's pack may exceed the budget
    assert len(over) == 1 and over.iloc[0] == 5000
    members = out.groupby("pack_id").size()
    big = out[out.n_tokens == 5000].pack_id.iloc[0]
    assert members[big] == 1
    # slots are 0..m-1 within each pack
    for _, g in out.groupby("pack_id"):
        assert sorted(g.pack_slot) == list(range(len(g)))
    # deterministic across runs
    out2 = pack_documents(ds, token_budget=1024).to_pandas()
    assert out.sort_values("doc_id").pack_id.tolist() == \
        out2.sort_values("doc_id").pack_id.tolist()


def test_proportional_sample_exact_counts(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.sampling import proportional_sample

    n = 600
    t = pa.table({
        "k": [("a", "b", "c")[i % 3] for i in range(n)],
        "id": pa.array(np.arange(n), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    targets = {"a": 50, "b": 120, "c": 10_000}  # c over-asks
    out = proportional_sample(ds, "k", "id", targets).to_pandas()
    got = out.groupby("k").size().to_dict()
    assert got == {"a": 50, "b": 120, "c": 200}
    # partition-invariant (deterministic selection)
    out2 = (proportional_sample(rd.from_arrow(t).repartition(9),
                                "k", "id", targets)
            .to_pandas())
    assert sorted(out.id) == sorted(out2.id)
